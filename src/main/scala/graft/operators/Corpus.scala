package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables

/**
 * Corpus-construction operators for training-data pipelines: the
 * steps between "deduped documents" and "training shards" that a
 * 100 TB run needs beyond the reference's own surface.
 *
 *  - `sampleStratified`: per-stratum sampling that is DETERMINISTIC
 *    (multiplicative hashing on the document id, not an RNG), so a
 *    re-run — or an incremental top-up over new data — selects the
 *    same documents. A pure pushdown-able filter: no shuffle, no
 *    state, trivially resumable. This is how language/quality mixes
 *    are rebalanced at corpus scale.
 *  - `shardPack`: assign documents to fixed-budget output shards by
 *    running size in a global order (sequential fill). A naive
 *    `sum() OVER (ORDER BY …)` collapses to ONE partition at scale;
 *    this runs the distributed two-pass scan instead (the
 *    fillOrdered/p08 pattern): range-sort by the order key,
 *    per-partition totals in one tiny job, prefix offsets carried on
 *    the driver (#partitions values, not data), then a parallel
 *    per-partition running sum.
 */
object Corpus {

  /**
   * Hash bucket in [0, m) that depends on ALL bits of the id, not
   * just its low decimal digits: xor-fold the high half into the low
   * (`id XOR (id >> 31)`), reduce mod the prime 1000000007 (< 2³⁰, so
   * the following multiply can never overflow 64 bits — Spark's
   * default ANSI mode makes overflow a runtime ERROR, and 100 TB
   * corpora have ids past 2³²), scramble with the Knuth constant
   * 2654435761, reduce mod the prime again, then take the final
   * residue mod m. Every step is plain integer arithmetic expressible
   * identically in DuckDB (`xor(id, id >> 31)` …), so oracles can
   * reproduce it verbatim. Unlike the previous `(id mod m)·c mod m`
   * permutation this is NOT blind to high bits: strided ids,
   * shard-suffixed ids, or ids all ≡ c (mod k) still spread across
   * buckets. Ids must be non-negative.
   */
  private[operators] def hashBucket(id: Column, m: Long): Column = {
    val p = lit(1000000007L)
    val folded = id.bitwiseXOR(shiftright(id, 31))
    pmod(pmod(pmod(folded, p) * lit(2654435761L), p), lit(m))
  }

  /** The `hashBucket` formula as DuckDB SQL, for oracle queries. */
  private def hashBucketSql(idCol: String, m: Long): String =
    s"((xor($idCol, $idCol >> 31) % 1000000007) * 2654435761) % 1000000007 % $m"

  /** Sortable 19-digit string key for a signed long id — biased by
    * 4.6e18 so negatives order numerically, padded to the biased
    * range's full width. Spark `lpad` TRUNCATES over-width strings
    * (the r18 c16 advice bug: a 12-wide pad silently misordered ids
    * ≥ 1e12), so ids outside ±4.6e18 — where the bias itself would
    * wrap or overflow the width — raise a LOUD per-row error instead
    * of silently misordering the prefix scan. Shared by every
    * `__ord` builder in this file. */
  private def idOrdKey(id: Column): Column = {
    val bias = 4600000000000000000L
    when(id < -bias || id > bias,
      raise_error(concat(lit("idOrdKey: id outside the ±4.6e18 sortable range: "),
        id.cast("string"))))
      .otherwise(lpad((id + lit(bias)).cast("string"), 19, "0"))
  }

  /**
   * Deterministic stratified sampling: keep a row iff
   * `hashBucket(id, 1000) < rate(stratum) · 1000` — a hash of the
   * document id, not an RNG, so a re-run (or an incremental top-up
   * over new data) selects the same documents. Rates are per mill;
   * strata not in `rates` use `defaultRate`.
   */
  def sampleStratified(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val bucket = hashBucket(col(idCol), 1000L)
    val rateCol = rates.foldLeft(lit(defaultRate * 1000)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v * 1000)).otherwise(acc)
    }
    df.filter(bucket < rateCol)
  }

  /**
   * Sequential-fill shard packing: in ascending `orderCol` order,
   * documents accumulate into a shard until its `target` size budget
   * (sum of `valueCol`, e.g. chars/tokens/bytes) is exhausted, then
   * the next shard opens. Adds a `shard` column
   * (= exclusivePrefixSum(valueCol) div target — one oversized doc
   * cannot starve a shard forever).
   */
  def shardPack(df: DataFrame, orderCol: String, valueCol: String,
      target: Long): DataFrame = {
    require(target > 0, s"shardPack: target must be positive, got $target")
    prefixScan(df, orderCol, valueCol, Seq("shard")) { (start, _) =>
      Seq(start / target)
    }
  }

  /**
   * Concat-and-chop sequence packing — the GPT-style pretraining
   * batch-prep step shardPack's whole-doc bin fill is NOT: documents
   * concatenate into one token stream in `orderCol` order and the
   * stream is chopped into fixed `seqLen`-token training sequences,
   * docs SPLITTING across sequence boundaries. Emits per doc the
   * first/last sequence it lands in and how many it spans (null for
   * empty docs). Same distributed two-pass prefix sum as shardPack —
   * no single-partition window at any corpus size.
   */
  def packSequences(df: DataFrame, orderCol: String, valueCol: String,
      seqLen: Long): DataFrame = {
    require(seqLen > 0, s"packSequences: seqLen must be positive, got $seqLen")
    prefixScan(df, orderCol, valueCol, Seq("seq_start", "seq_end", "n_seqs")) {
      (start, v) =>
        if (v == 0) Seq(null, null, null)
        else {
          val s = start / seqLen
          val e = (start + v - 1) / seqLen
          Seq(s, e, e - s + 1)
        }
    }
  }

  /** Shared distributed EXCLUSIVE prefix sum over `valueCol` in
    * ascending `orderCol` order: pass 1 reduces per-partition totals
    * (#partitions longs to the driver), pass 2 maps each row with its
    * carried running-sum start; `emit(start, value)` returns the
    * derived long columns appended under `outCols` (nullable). */
  private[graft] def prefixScan(df: DataFrame, orderCol: String, valueCol: String,
      outCols: Seq[String])(emit: (Long, Long) => Seq[Any]): DataFrame = {
    val spark = df.sparkSession
    // normalize up front so the RDD passes below can't hit a
    // mid-job ClassCastException (int value column) or NPE (null
    // value): widen INTEGRAL types to long and reject nulls with a
    // named error. Fractional/other types fail fast HERE — a blind
    // cast would silently floor-truncate double sizes and overshoot
    // every budget
    df.schema(valueCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType | _: org.apache.spark.sql.types.ShortType |
           _: org.apache.spark.sql.types.IntegerType | _: org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"prefixScan: value column '$valueCol' must be integral, got $other")
    }
    val src = df.withColumn(valueCol, col(valueCol).cast(LongType))
    val schema = src.schema
    val vIdx = schema.fieldIndex(valueCol)
    def getValue(r: Row): Long = {
      require(!r.isNullAt(vIdx),
        s"prefixScan: null in value column '$valueCol' (row $r)")
      r.getLong(vIdx)
    }
    val sorted = src.orderBy(col(orderCol).asc).rdd
    sorted.localCheckpoint() // two passes below; don't re-sort
    // pass 1: per-partition value totals — #partitions numbers, tiny
    val partTotals = sorted.mapPartitionsWithIndex { (pi, it) =>
      var s = 0L
      it.foreach(r => s += getValue(r))
      Iterator((pi, s))
    }.collect().toMap
    val nParts = sorted.getNumPartitions
    val offsets = new Array[Long](math.max(nParts, 1))
    var pi = 1
    while (pi < nParts) {
      offsets(pi) = offsets(pi - 1) + partTotals.getOrElse(pi - 1, 0L)
      pi += 1
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    // pass 2: parallel per-partition running sum from the carried offset
    val out = sorted.mapPartitionsWithIndex { (pi2, it) =>
      var run = bcOffsets.value(pi2)
      it.map { r =>
        val v = getValue(r)
        val extra = emit(run, v)
        run += v
        Row.fromSeq(r.toSeq ++ extra)
      }
    }
    spark.createDataFrame(out,
      outCols.foldLeft(schema)((s, c) => s.add(c, LongType, nullable = true)))
  }

  /**
   * Deterministic train/val/test assignment: the same xor-fold +
   * multiplicative `hashBucket` as `sampleStratified` (here mod 100)
   * maps each id to a percent bucket, and cut points turn buckets
   * into split labels. Adding data never moves an existing document
   * between splits (no RNG, no global state) — the property that
   * keeps eval sets uncontaminated across corpus versions. Pure
   * projection: no shuffle.
   */
  def splitAssign(df: DataFrame, idCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val bucket = hashBucket(col(idCol), 100L)
    df.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /**
   * Target-mixture sampling: hit a DESIRED source/language mix (the
   * data-mixing step before training) instead of c01's fixed
   * per-stratum rates. Given target weights and a total budget,
   * each stratum's keep-rate is min(1, weight·budget/stratumCount) —
   * counts come from ONE map-side-combined aggregate whose result
   * (|strata| rows) broadcasts back, then the same deterministic
   * `hashBucket` filter as c01 selects rows. Re-runs and incremental
   * top-ups select the same documents; strata below their target
   * keep everything (rate capped at 1). Two scans + a broadcast —
   * no data shuffle at any corpus size.
   *
   * Strata NOT listed in `weights` are DROPPED (rate 0) — the mix is
   * a whitelist: anything outside the target mixture is excluded,
   * the way a data-mix spec excludes unlisted sources. Weights must
   * sum to ≤ 1 so the budget cannot be silently overshot.
   */
  def mixtureSample(df: DataFrame, idCol: String, strataCol: String,
      weights: Map[String, Double], budget: Long): DataFrame = {
    require(weights.values.forall(w => w >= 0 && w <= 1),
      s"mixtureSample: weights must be in [0,1], got $weights")
    require(weights.values.sum <= 1.0 + 1e-9,
      s"mixtureSample: weights sum to ${weights.values.sum} > 1 — the budget would overshoot")
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("__n"))
    val w = weights.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.join(broadcast(counts), strataCol)
      .withColumn("__rate", least(lit(1.0), w * budget / col("__n")))
      .filter(hashBucket(col(idCol), 1000L) < col("__rate") * 1000.0)
      .drop("__n", "__rate")
  }

  /**
   * Per-source token-budget selection — the data-mix step where
   * budgets are DENOMINATED IN TOKENS and exact: each source
   * contributes documents in deterministic hash-priority order until
   * its token budget is exhausted (c04 hits a target mix only in
   * expectation; this hits it to the straddling document). The
   * priority hash makes the selection re-runnable and top-up-stable,
   * like every sampler here.
   *
   * Scale shape: a per-source `sum() OVER` would sort each source in
   * ONE task — a 20-source 100 TB corpus means 5 TB windows. Instead
   * the rows range-sort ONCE on the composite (source, priority, id)
   * key and the shared two-pass `prefixScan` carries partition
   * offsets; per-source running positions recover by subtracting the
   * source's global start (one |sources|-row aggregate, broadcast
   * back). A document is selected iff its source-local stream
   * position starts inside the budget.
   */
  def tokenBudget(df: DataFrame, idCol: String, strataCol: String,
      valueCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"tokenBudget: budget must be positive, got $budget")
    val prio = hashBucket(col(idCol), 1000003L)
    val ordered = df.withColumn("__ord", concat_ws("|",
      col(strataCol),
      lpad(prio.cast("string"), 7, "0"),
      idOrdKey(col(idCol))))
    val scanned = prefixScan(ordered, "__ord", valueCol, Seq("__gstart")) {
      (start, _) => Seq(start)
    }
    val bases = scanned.groupBy(strataCol).agg(min("__gstart").as("__base"))
    scanned.join(broadcast(bases), strataCol)
      .withColumn("tok_before", col("__gstart") - col("__base"))
      .filter(col("tok_before") < budget)
      .drop("__ord", "__gstart", "__base")
  }

  // ------------------------------------------------------------ queries

  /** c01: language-stratified deterministic document sample — English
    * downweighted vs the long tail the way a data-mix rebalance would.
    * Pure filter: the plan is a parquet scan with the predicate, no
    * shuffle. */
  def c01SampleStratified(spark: SparkSession, dir: String): DataFrame =
    sampleStratified(Tables.documents(spark, dir).select("doc_id", "lang"),
      "doc_id", "lang", Map("en" -> 0.5, "de" -> 0.3), defaultRate = 0.2)
      .orderBy("doc_id")

  /** c02: pack documents into ~10 kB shards by running char count in
    * doc_id order (distributed prefix sum — no single-partition
    * window). */
  def c02ShardPack(spark: SparkSession, dir: String): DataFrame =
    shardPack(Tables.documents(spark, dir).select("doc_id", "n_chars"),
      "doc_id", "n_chars", target = 10000L)
      .select("doc_id", "n_chars", "shard")
      .orderBy("doc_id")

  /** c06: concat-and-chop packing of the document token stream into
    * 512-token training sequences (whitespace tokens over normalized
    * text — swap in t13's BPE counts for a trained tokenizer). */
  def c06PackTokens(spark: SparkSession, dir: String): DataFrame =
    packSequences(
      Tables.documents(spark, dir).select(col("doc_id"),
        size(filter(split(Dedup.normText(col("text")), " "),
          w => length(w) > 0)).cast("long").as("n_tokens")),
      "doc_id", "n_tokens", seqLen = 512L)
      .orderBy("doc_id")

  /** c07: 800 whitespace-tokens-per-source selection over documents
    * (same token definition as c06, so the two budgets compose). */
  def c07TokenBudget(spark: SparkSession, dir: String): DataFrame =
    tokenBudget(
      Tables.documents(spark, dir).select(col("doc_id"), col("source"),
        size(filter(split(Dedup.normText(col("text")), " "),
          w => length(w) > 0)).cast("long").as("n_tokens")),
      "doc_id", "source", "n_tokens", budget = 800L)
      .select("doc_id", "source", "n_tokens", "tok_before")
      .orderBy("doc_id")

  /**
   * Temperature-scaled domain mixture weights (α = 0.5, the T5/GPT
   * data-recipe rule w_d ∝ tokens_d^α): upweights small domains so a
   * giant crawl can't drown the curated sources. One map-side-
   * combined per-source aggregate (|sources| groups at ANY corpus
   * size) → per-source sqrt on the 1e-6 grid — sqrt is IEEE-exact in
   * both engines and the grid point is an exact integer, so the
   * normalizing total is an ORDER-INDEPENDENT integer sum, not a
   * float reduction that could drift with partitioning.
   */
  def mixtureWeights(docs: DataFrame): DataFrame = {
    val per = docs.select(col("source"),
        size(filter(split(Dedup.normText(col("text")), " "),
          w => length(w) > 0)).cast("long").as("n_tokens"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .withColumn("w_micro",
        round(sqrt(col("n_tokens")) * lit(1000000.0)).cast("long"))
      // |sources| rows, but the subtree is the full-corpus
      // tokenization: materialize so the total doesn't re-tokenize
      .localCheckpoint(true)
    val tot = per.agg(sum("w_micro").as("w_total"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("w_micro") / col("w_total"), 6).as("weight"))
  }

  /** c08: α=0.5 mixture weights over the documents corpus by source. */
  def c08MixtureWeights(spark: SparkSession, dir: String): DataFrame =
    mixtureWeights(Tables.documents(spark, dir)).orderBy("source")

  /**
   * Materialize a token-budgeted training mixture with CAPPED EPOCH
   * repetition (the data-constrained-scaling recipe: when a domain's
   * target share exceeds its corpus, repeat it up to `maxEpochs`
   * rather than letting the mixture silently drift): per source,
   * target tokens t_s = ⌊budget · w_s⌋ under c08's α = 0.5 weights,
   * full epochs = min(maxEpochs, ⌊t_s / tokens_s⌋), and the token
   * remainder fills ONE fractional epoch by the c07 greedy
   * hash-priority rule (docs in hashBucket order until the remainder
   * is spent — overshoot allowed on the boundary doc, same
   * convention). Emits one row per (doc, epoch) — the replicated
   * corpus a shard-packer downstream consumes.
   *
   * Scale shapes: weights/targets are a |sources|-row broadcast; the
   * remainder fill is the c07 DISTRIBUTED prefix scan (range-sort +
   * per-partition offsets — never a one-partition window); epoch
   * replication is a per-row `explode` of an int sequence (pure
   * projection, output ∝ epochs × corpus, which is the product being
   * built). All epoch arithmetic is INTEGER (`div` on micro-grid
   * weights), so engine and oracle agree exactly at any partitioning.
   */
  def repeatEpochs(docs: DataFrame, budgetTokens: Long, maxEpochs: Int): DataFrame = {
    require(budgetTokens > 0, s"repeatEpochs: budget must be positive, got $budgetTokens")
    require(maxEpochs >= 1 && maxEpochs <= 64,
      s"repeatEpochs: maxEpochs in [1,64], got $maxEpochs")
    val toks = docs.select(col("doc_id"), col("source"),
      size(filter(split(Dedup.normText(col("text")), " "),
        w => length(w) > 0)).cast("long").as("n_tokens"))
    // tok = 0 guard: `div` by zero is null, and least() SKIPS nulls
    // (Postgres semantics) — an all-empty source would silently get
    // maxEpochs full epochs instead of none
    val per = toks.groupBy("source").agg(sum("n_tokens").as("tok"))
      .filter(col("tok") > 0)
      .withColumn("w_micro", round(sqrt(col("tok")) * lit(1000000.0)).cast("long"))
      // materialize the |sources|-row aggregate: its subtree is the
      // full-corpus tokenization and the total must not repeat it
      .localCheckpoint(true)
    val tot = per.agg(sum("w_micro").as("wtot"))
    val tgt = per.crossJoin(broadcast(tot))
      .withColumn("t_s", expr(s"(${budgetTokens}L * w_micro) div wtot"))
      .withColumn("efull",
        least(lit(maxEpochs), expr("t_s div tok")).cast("int"))
      .withColumn("rem", when(col("efull") < maxEpochs,
        col("t_s") - col("efull") * col("tok")).otherwise(lit(0L)))
      .select("source", "efull", "rem")
    val prio = hashBucket(col("doc_id"), 1000003L)
    val ordered = toks.withColumn("__ord", concat_ws("|",
      col("source"), lpad(prio.cast("string"), 7, "0"),
      idOrdKey(col("doc_id"))))
    val scanned = prefixScan(ordered, "__ord", "n_tokens", Seq("__gstart")) {
      (start, _) => Seq(start)
    }
    val bases = scanned.groupBy("source").agg(min("__gstart").as("__base"))
    scanned.join(broadcast(bases), Seq("source"))
      .join(broadcast(tgt), Seq("source"))
      .withColumn("extra",
        (col("__gstart") - col("__base") < col("rem")).cast("int"))
      .withColumn("n_epochs", col("efull") + col("extra"))
      .filter(col("n_epochs") >= 1)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        explode(sequence(lit(0), col("n_epochs") - 1)).as("epoch"))
  }

  /**
   * Per-source DATASET CARD — the profiling report a corpus release
   * ships with (and the first thing a mixture designer reads): doc
   * and token counts, mean and EXACT median tokens per doc, language
   * spread (distinct langs + modal lang, ties broken to the largest
   * code — pure ASCII compare), and the short-doc fraction (the
   * Gopher <50-word rule as a summary rate). Everything is one
   * map-side-combined per-source aggregate plus a bounded
   * (source, lang) count table for the mode — |sources| rows out at
   * any corpus size; the exact median uses Spark's exact `percentile`
   * aggregate (quantile_cont interpolation semantics, mirrored
   * verbatim), whose per-group state is bounded by docs-per-source.
   */
  def datasetCard(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"), col("lang"),
      size(filter(split(Dedup.normText(col("text")), " "),
        w => length(w) > 0)).cast("long").as("n_tokens"))
    val per = toks.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("n_tokens").as("n_tokens"),
      expr("percentile(n_tokens, 0.5)").as("med0"),
      countDistinct("lang").as("n_langs"),
      avg(when(col("n_tokens") < 50, 1.0).otherwise(0.0)).as("short0"))
    val lc = toks.groupBy("source", "lang").agg(count(lit(1)).as("c"))
    val mx = lc.groupBy("source").agg(max("c").as("mc"))
    val win = lc.join(mx, Seq("source")).filter(col("c") === col("mc"))
      .groupBy("source").agg(max("lang").as("top_lang"))
    per.join(win, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") / col("n_docs"), 4).as("mean_doc_tokens"),
        round(col("med0"), 4).as("median_doc_tokens"),
        col("n_langs"), col("top_lang"),
        round(col("short0"), 4).as("short_doc_frac"))
  }

  /** c10: the release card of the documents corpus. */
  def c10DatasetCard(spark: SparkSession, dir: String): DataFrame =
    datasetCard(Tables.documents(spark, dir)).orderBy("source")

  /**
   * c13: SHARD MANIFEST — the release artifact next to c02's packing:
   * per shard, the doc count, byte volume, id range, and a content
   * digest (md5 of the doc_id-ordered concatenation of per-doc text
   * md5s — the standard composable checksum: verifiable per shard
   * without re-reading neighbors, stable because the inner digests
   * order by the explicit key, not by arrival). One shard-keyed
   * aggregate over c02's assignment; the ordered digest concatenation
   * is a sort_array over the shard's (doc_id, md5) structs — state
   * bounded by docs-per-shard (the ~10 kB target), never the corpus.
   */
  def c13ShardManifest(spark: SparkSession, dir: String): DataFrame = {
    val assigned = shardPack(
      Tables.documents(spark, dir).select("doc_id", "n_chars", "text"),
      "doc_id", "n_chars", target = 10000L)
      .select(col("shard"), col("doc_id"), col("n_chars"),
        md5(encode(col("text"), "UTF-8")).as("h"))
    assigned.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("n_bytes"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"),
        md5(encode(concat_ws("",
          expr("transform(sort_array(collect_list(struct(doc_id, h))), s -> s.h)")),
          "UTF-8")).as("content_md5"))
      .orderBy("shard")
  }

  /**
   * c12: QUALITY-CURRICULUM PACKING — the three-stage ordering a
   * curriculum-training data pipeline materializes: each document's
   * quality score (t02's stopword density minus its duplicate-word
   * ratio — both on the 4-dp grid, so the difference is engine-
   * identical) buckets into global terciles (p15's exact type-7
   * quantile machinery; cut points are 2 collected doubles), and
   * WITHIN each phase documents are ordered best-first (score on the
   * 1e-4 integer grid descending — the grid, not the raw double, is
   * the sort key, so cross-engine ordering ties break identically by
   * doc_id) and admitted until the phase's token budget fills. The
   * cumulative token count is the two-pass per-partition-totals
   * prefix scan (c02/c07's pattern), never a 3-partition window —
   * the phase count is tiny but phase SIZE is corpus-scale, and the
   * scan parallelizes over range partitions regardless.
   */
  def c12Curriculum(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val q = TextOps.quality(docs).select(col("doc_id"),
      (col("stop_ratio") - col("dup_word_ratio")).as("score"))
    val toks = docs.select(col("doc_id"),
      size(filter(split(Dedup.normText(col("text")), " "),
        w => length(w) > 0)).cast("long").as("n_tokens"))
    val binned = Preprocess.quantileBin(q.join(toks, "doc_id"), "score", 3)
      .withColumnRenamed("score_bin", "phase")
    val inv = lit(20000L) - round(col("score") * 10000.0).cast("long")
    val ordered = binned.withColumn("__ord", concat_ws("|",
      col("phase").cast("string"),
      lpad(inv.cast("string"), 6, "0"),
      idOrdKey(col("doc_id"))))
    val scanned = prefixScan(ordered, "__ord", "n_tokens", Seq("__gstart")) {
      (start, _) => Seq(start)
    }
    val bases = scanned.groupBy("phase").agg(min("__gstart").as("__base"))
    scanned.join(broadcast(bases), "phase")
      .select(col("doc_id"), col("phase"),
        (round(col("score"), 4) + lit(0.0)).as("score"), col("n_tokens"),
        (col("__gstart") - col("__base")).as("tok_before"))
      .withColumn("included", col("tok_before") < 20000L)
      .orderBy("doc_id")
  }

  /**
   * c16: DETERMINISTIC WEIGHTED INTERLEAVE — the order a data loader
   * actually FEEDS a mixture to the trainer. c08 decides the weights
   * and c04/c09 decide the membership, but a trainer consumes ONE
   * stream, and "source s gets share w_s" must hold in every prefix
   * of it, not just in aggregate. This is weighted fair queuing's
   * virtual-time rule (deficit round-robin's continuous limit): doc i
   * of source s finishes at virtual time vt = cum_tokens_s(i) / w_s,
   * and the global feed is ascending vt — a source with twice the
   * weight lands twice the tokens in every window. All integer: vt is
   * cum_tokens · 10⁹ div w_micro with w_micro c08's α = 0.5 weight on
   * the 1e-6 grid, so ordering is engine- and partitioning-exact
   * (ties break by source, doc_id). Sound while cum_tokens < 9.2e9
   * per source (the i64 bound of the 10⁹ multiplier) — beyond that,
   * drop the multiplier a decade and the ORDER is unchanged.
   *
   * Scale shape: the per-source cumsum is the c02/c07 two-pass
   * prefix scan (range-partitioned, no single-partition window), the
   * weight/base joins broadcast |sources| rows, and the global
   * ascending-vt head is a TakeOrdered top-k, never a full sort.
   */
  def interleave(docs: DataFrame, take: Int = 200): DataFrame = {
    require(take >= 1, s"interleave: take must be positive, got $take")
    val toks = docs.select(col("doc_id"), col("source"),
      size(filter(split(Dedup.normText(col("text")), " "),
        w => length(w) > 0)).cast("long").as("n_tokens"))
    val ordered = toks.withColumn("__ord", concat_ws("|",
      col("source"), idOrdKey(col("doc_id"))))
    val scanned = prefixScan(ordered, "__ord", "n_tokens", Seq("__gstart")) {
      (start, _) => Seq(start)
    }
    val bases = scanned.groupBy("source").agg(min("__gstart").as("__base"))
    // weights aggregate reads the SCANNED table (prefixScan's
    // materialized RDD), not the raw corpus — re-tokenizing 100 TB a
    // second time for |sources| sums was a plan-audit finding
    val weights = scanned.groupBy("source").agg(sum("n_tokens").as("src_tokens"))
      .withColumn("w_micro",
        round(sqrt(col("src_tokens")) * lit(1000000.0)).cast("long"))
    val head = scanned.join(broadcast(bases), "source")
      .join(broadcast(weights), "source")
      .withColumn("cum_tokens", col("__gstart") - col("__base") + col("n_tokens"))
      .withColumn("vt", expr("cum_tokens * 1000000000L div w_micro"))
      .select("doc_id", "source", "n_tokens", "vt")
      .orderBy(col("vt"), col("source"), col("doc_id"))
      .limit(take)
    // rank assignment runs AFTER the top-k: the unpartitioned window
    // sees `take` rows, not the corpus
    head.withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("vt"), col("source"), col("doc_id"))).cast("int"))
      .select("pos", "doc_id", "source", "n_tokens", "vt")
      .orderBy("pos")
  }

  /** c16: the first 200 feed positions of the α = 0.5 weighted
    * interleave over documents by source. */
  def c16Interleave(spark: SparkSession, dir: String): DataFrame =
    interleave(Tables.documents(spark, dir))

  /** c09: the documents corpus materialized at a 100k-token budget,
    * α = 0.5 source weights, epochs capped at 4. */
  def c09RepeatEpochs(spark: SparkSession, dir: String): DataFrame =
    repeatEpochs(Tables.documents(spark, dir), budgetTokens = 100000L, maxEpochs = 4)
      .orderBy("doc_id", "epoch")

  /** c03: 80/10/10 train/val/test assignment over documents — stable
    * under corpus growth, no shuffle. */
  def c03Split(spark: SparkSession, dir: String): DataFrame =
    splitAssign(Tables.documents(spark, dir).select("doc_id", "lang"), "doc_id")
      .orderBy("doc_id")

  /** c04: rebalance documents toward a 40/20/20/15/5 en/de/es/fr/zh
    * target mix on a 300-doc budget — the over-represented languages
    * downsample, under-target ones keep everything (rate capped at 1). */
  def c04MixtureSample(spark: SparkSession, dir: String): DataFrame =
    mixtureSample(Tables.documents(spark, dir).select("doc_id", "lang"),
      "doc_id", "lang",
      Map("en" -> 0.4, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.15, "zh" -> 0.05),
      budget = 300L)
      .select("doc_id", "lang")
      .orderBy("doc_id")

  /**
   * Deterministic importance-weighted sampling WITHOUT replacement
   * (Efraimidis–Spirakis priority sampling): each row gets key =
   * ln(u)/w for u uniform in (0,1), and the k LARGEST keys win —
   * equivalent to ranking by u^(1/w), so selection probability is
   * proportional to weight, exactly the one-pass distributed
   * algorithm for "sample 10k docs, quality-weighted" at corpus
   * scale. u comes from the c01 `hashBucket` hash of the id (NOT an
   * RNG): re-runs and incremental top-ups select the same documents,
   * and the oracle replays the key verbatim. The plan is a pure
   * projection + TakeOrdered(k) — per-partition top-k, only
   * |partitions|·k rows meet the driver, no global sort, no shuffle.
   *
   * Keys of distinct docs are well-separated random values (ties on
   * the boundary would need two ln(u)/w within double ulp), and the
   * id breaks any exact tie identically in both engines.
   */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    require(k > 0, s"weightedSample: k must be positive, got $k")
    val m = 1000003L
    val u = (hashBucket(col(idCol), m) + lit(0.5)) / lit(m.toDouble)
    df.filter(col(weightCol) > 0)
      .withColumn("__key", log(u) / col(weightCol))
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
      .drop("__key")
  }

  /** c05: 100 length-weighted documents (longer docs proportionally
    * likelier — the "token-weighted" selection a data mix uses when
    * budgets are in tokens, not documents). */
  def c05WeightedSample(spark: SparkSession, dir: String): DataFrame =
    weightedSample(Tables.documents(spark, dir).select("doc_id", "lang", "n_chars"),
      "doc_id", "n_chars", k = 100)
      .orderBy("doc_id")

  // --------------------------------------------------------- oracle SQL

  val oracleSql: Map[String, String] = Map(
    // c12: t02's score arithmetic, quantile_cont terciles (type-7 ==
    // quantilesExact), per-phase cumulative tokens ordered by the
    // SAME 1e-4 integer score grid the engine sorts on
    "c12_curriculum" ->
      s"""WITH b AS (
         |  SELECT doc_id, text, ${TextOps.paddedSql} AS p,
         |    string_split(${TextOps.normSql}, ' ') AS w
         |  FROM documents
         |), s AS (
         |  SELECT doc_id,
         |    round((${TextOps.occSql("p", " the ")}) / len(w), 4)
         |      - round(1.0 - len(list_distinct(w)) * 1.0 / len(w), 4) AS score,
         |    CAST(len(list_filter(w, x -> length(x) > 0)) AS BIGINT) AS n_tokens
         |  FROM b
         |), cuts AS (
         |  SELECT quantile_cont(score, CAST(1 AS DOUBLE)/3) AS c1,
         |         quantile_cont(score, CAST(2 AS DOUBLE)/3) AS c2
         |  FROM s
         |), ph AS (
         |  SELECT doc_id, score, n_tokens,
         |    (CASE WHEN score >= c1 THEN 1 ELSE 0 END)
         |    + (CASE WHEN score >= c2 THEN 1 ELSE 0 END) AS phase
         |  FROM s, cuts
         |), cum AS (
         |  SELECT doc_id, phase, score, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY phase
         |      ORDER BY CAST(round(score * 10000.0) AS BIGINT) DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS tok_before
         |  FROM ph
         |)
         |SELECT doc_id, phase, round(score, 4) + 0 AS score, n_tokens,
         |  tok_before, tok_before < 20000 AS included
         |FROM cum ORDER BY doc_id""".stripMargin,
    // c13: same composable digest — md5 of the doc_id-ORDERED
    // per-doc md5 concatenation (string_agg ORDER BY)
    "c13_shard_manifest" ->
      """WITH a AS (
        |  SELECT doc_id, n_chars, md5(text) AS h,
        |    CAST(coalesce(sum(n_chars) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) // 10000 AS shard
        |  FROM documents
        |)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS n_bytes,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc,
        |  md5(string_agg(h, '' ORDER BY doc_id)) AS content_md5
        |FROM a GROUP BY shard ORDER BY shard""".stripMargin,
    // c10: same tokenization, quantile_cont == Spark exact percentile
    // interpolation, modal lang via the bounded count-table argmax
    "c10_dataset_card" ->
      """WITH t AS (
        |  SELECT doc_id, source, lang,
        |    CAST(len(list_filter(string_split(lower(regexp_replace(text, '\s+', ' ', 'g')), ' '),
        |      w -> length(w) > 0)) AS BIGINT) AS n_tokens
        |  FROM documents
        |), per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |    quantile_cont(n_tokens, 0.5) AS med0,
        |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |    avg(CASE WHEN n_tokens < 50 THEN 1.0 ELSE 0.0 END) AS short0
        |  FROM t GROUP BY 1
        |), lc AS (
        |  SELECT source, lang, count(*) AS c FROM t GROUP BY 1, 2
        |), mx AS (
        |  SELECT source, max(c) AS mc FROM lc GROUP BY 1
        |), win AS (
        |  SELECT l.source, max(l.lang) AS top_lang
        |  FROM lc l JOIN mx m ON l.source = m.source AND l.c = m.mc
        |  GROUP BY 1
        |)
        |SELECT p.source, p.n_docs, p.n_tokens,
        |  round(p.n_tokens * 1.0 / p.n_docs, 4) + 0 AS mean_doc_tokens,
        |  round(p.med0, 4) + 0 AS median_doc_tokens,
        |  p.n_langs, w.top_lang,
        |  round(p.short0, 4) + 0 AS short_doc_frac
        |FROM per p JOIN win w ON p.source = w.source
        |ORDER BY p.source""".stripMargin,
    // c09: same integer micro-grid weight/target/epoch arithmetic
    // (// is DuckDB integer div), same c07 hash-priority remainder
    // window, per-row range() unnest for the epoch replication
    "c09_repeat_epochs" ->
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    CAST(len(list_filter(string_split(lower(regexp_replace(text, '\\s+', ' ', 'g')), ' '),
         |      w -> length(w) > 0)) AS BIGINT) AS n_tokens
         |  FROM documents
         |), per AS (
         |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS tok,
         |    CAST(round(sqrt(CAST(sum(n_tokens) AS DOUBLE)) * 1000000.0) AS BIGINT) AS w_micro
         |  FROM t GROUP BY 1 HAVING sum(n_tokens) > 0
         |), tot AS (
         |  SELECT CAST(sum(w_micro) AS BIGINT) AS wtot FROM per
         |), tgt AS (
         |  SELECT source, tok, (100000 * w_micro) // wtot AS t_s FROM per, tot
         |), tg2 AS (
         |  SELECT source, CAST(least(4, t_s // tok) AS INT) AS efull,
         |    CASE WHEN least(4, t_s // tok) < 4
         |      THEN t_s - least(4, t_s // tok) * tok ELSE 0 END AS rem
         |  FROM tgt
         |), sc AS (
         |  SELECT doc_id, source, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
         |      ORDER BY ${hashBucketSql("doc_id", 1000003L)}, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS tok_before
         |  FROM t
         |), mk AS (
         |  SELECT s.doc_id, s.source, s.n_tokens,
         |    g.efull + (CASE WHEN s.tok_before < g.rem THEN 1 ELSE 0 END) AS n_epochs
         |  FROM sc s JOIN tg2 g ON s.source = g.source
         |)
         |SELECT doc_id, source, n_tokens,
         |  CAST(unnest(range(0, n_epochs)) AS INT) AS epoch
         |FROM mk ORDER BY doc_id, epoch""".stripMargin,
    "c08_mixture_weights" ->
      """WITH t AS (
        |  SELECT source,
        |    CAST(len(list_filter(string_split(lower(regexp_replace(text, '\s+', ' ', 'g')), ' '),
        |      w -> length(w) > 0)) AS BIGINT) AS n_tokens
        |  FROM documents
        |), per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |    CAST(round(sqrt(CAST(sum(n_tokens) AS DOUBLE)) * 1000000.0) AS BIGINT) AS w_micro
        |  FROM t GROUP BY source
        |)
        |SELECT source, n_docs, n_tokens,
        |  round(w_micro * 1.0 / (SELECT sum(w_micro) FROM per), 6) + 0 AS weight
        |FROM per ORDER BY source""".stripMargin,
    // c16: weighted-fair-queuing virtual time — per-source inclusive
    // token cumsum in doc_id order, vt = cum · 10⁹ // w_micro with
    // c08's α = 0.5 weight, global feed ascending (vt, source, doc_id)
    "c16_interleave" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(string_split(lower(regexp_replace(text, '\s+', ' ', 'g')), ' '),
        |      w -> length(w) > 0)) AS BIGINT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM t
        |), w AS (
        |  SELECT source,
        |    CAST(round(sqrt(CAST(sum(n_tokens) AS DOUBLE)) * 1000000.0) AS BIGINT) AS w_micro
        |  FROM t GROUP BY source
        |), v AS (
        |  SELECT c.doc_id, c.source, c.n_tokens,
        |    CAST(c.cum_tokens * 1000000000 // w.w_micro AS BIGINT) AS vt
        |  FROM c JOIN w ON c.source = w.source
        |), r AS (
        |  SELECT *, row_number() OVER (ORDER BY vt, source, doc_id) AS pos
        |  FROM v
        |)
        |SELECT CAST(pos AS INT) AS pos, doc_id, source, n_tokens, vt
        |FROM r WHERE pos <= 200 ORDER BY pos""".stripMargin,
    "c07_token_budget" ->
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    CAST(len(list_filter(string_split(lower(regexp_replace(text, '\\s+', ' ', 'g')), ' '),
         |      w -> length(w) > 0)) AS BIGINT) AS n_tokens,
         |    ${hashBucketSql("doc_id", 1000003L)} AS prio
         |  FROM documents
         |), p AS (
         |  SELECT doc_id, source, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
         |      ORDER BY prio, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS tok_before
         |  FROM t
         |)
         |SELECT doc_id, source, n_tokens, tok_before
         |FROM p WHERE tok_before < 800 ORDER BY doc_id""".stripMargin,
    "c05_weighted_sample" ->
      s"""WITH keyed AS (
         |  SELECT doc_id, lang, n_chars,
         |    ln((${hashBucketSql("doc_id", 1000003L)} + 0.5) / 1000003.0)
         |      / n_chars AS key
         |  FROM documents WHERE n_chars > 0
         |), topk AS (
         |  SELECT doc_id, lang, n_chars FROM keyed
         |  ORDER BY key DESC, doc_id LIMIT 100
         |)
         |SELECT doc_id, lang, n_chars FROM topk ORDER BY doc_id""".stripMargin,
    "c03_split" ->
      s"""SELECT doc_id, lang,
         |  CASE WHEN ${hashBucketSql("doc_id", 100L)} < 80 THEN 'train'
         |    WHEN ${hashBucketSql("doc_id", 100L)} < 90 THEN 'val'
         |    ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,
    "c01_sample_stratified" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${hashBucketSql("doc_id", 1000L)} <
         |  CASE WHEN lang = 'en' THEN 500 WHEN lang = 'de' THEN 300 ELSE 200 END
         |ORDER BY doc_id""".stripMargin,
    "c04_mixture_sample" ->
      s"""WITH n AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         |r AS (SELECT lang, least(CAST(1.0 AS DOUBLE),
         |        CAST(CASE lang WHEN 'en' THEN 0.4 WHEN 'de' THEN 0.2
         |             WHEN 'es' THEN 0.2 WHEN 'fr' THEN 0.15
         |             WHEN 'zh' THEN 0.05 ELSE 0.0 END AS DOUBLE)
         |        * 300 / n) AS rate FROM n)
         |SELECT d.doc_id, d.lang FROM documents d JOIN r ON d.lang = r.lang
         |WHERE ${hashBucketSql("doc_id", 1000L)} < rate * 1000.0
         |ORDER BY d.doc_id""".stripMargin,
    "c02_shard_pack" ->
      """SELECT doc_id, n_chars,
        |  CAST(coalesce(sum(n_chars) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) // 10000 AS shard
        |FROM documents ORDER BY doc_id""".stripMargin,
    "c06_pack_tokens" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(lower(regexp_replace(text, '\s+', ' ', 'g')), ' '),
        |      w -> length(w) > 0)) AS n_tokens
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS st
        |  FROM t
        |)
        |SELECT doc_id, n_tokens,
        |  CASE WHEN n_tokens = 0 THEN NULL
        |    ELSE CAST(st // 512 AS BIGINT) END AS seq_start,
        |  CASE WHEN n_tokens = 0 THEN NULL
        |    ELSE CAST((st + n_tokens - 1) // 512 AS BIGINT) END AS seq_end,
        |  CASE WHEN n_tokens = 0 THEN NULL
        |    ELSE CAST((st + n_tokens - 1) // 512 - st // 512 + 1 AS BIGINT) END AS n_seqs
        |FROM p ORDER BY doc_id""".stripMargin,
  )
}
