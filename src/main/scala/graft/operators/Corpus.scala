package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
   * Deterministic stratified sampling: keep a row iff
   * `(id · 2654435761) mod 1000 < rate(stratum) · 1000`. The multiply
   * is carried out in modular form — `((id mod 1000) · 761) mod 1000`,
   * with 761 = 2654435761 mod 1000 — which is the SAME value for every
   * id ((a·b) mod m = ((a mod m)(b mod m)) mod m) but can never
   * overflow the 64-bit multiply (Spark's default ANSI mode makes
   * overflow a runtime error, and 100 TB corpora have ids past 2³²).
   * Since gcd(761, 1000) = 1 the map is a fixed permutation of the id
   * residues: uniform bucket occupancy over any 1000 consecutive ids.
   * Rates are per mill; strata not in `rates` use `defaultRate`. Ids
   * must be non-negative.
   */
  def sampleStratified(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val bucket = pmod(pmod(col(idCol), lit(1000L)) * lit(761L), lit(1000L))
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
    val spark = df.sparkSession
    val schema = df.schema
    val vIdx = schema.fieldIndex(valueCol)
    val sorted = df.orderBy(col(orderCol).asc).rdd
    sorted.localCheckpoint() // two passes below; don't re-sort
    // pass 1: per-partition value totals — #partitions numbers, tiny
    val partTotals = sorted.mapPartitionsWithIndex { (pi, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(vIdx))
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
        val shard = run / target
        run += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ shard)
      }
    }
    spark.createDataFrame(out, schema.add("shard", LongType))
  }

  /**
   * Deterministic train/val/test assignment: the same modular
   * permutation as `sampleStratified` (here mod 100: ((id mod 100) ·
   * 61) mod 100, 61 = 2654435761 mod 100, overflow-free under ANSI)
   * maps each id to a percent bucket, and cut points turn buckets
   * into split labels. Adding data never moves an existing document
   * between splits (no RNG, no global state) — the property that
   * keeps eval sets uncontaminated across corpus versions. Pure
   * projection: no shuffle.
   */
  def splitAssign(df: DataFrame, idCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val bucket = pmod(pmod(col(idCol), lit(100L)) * lit(61L), lit(100L))
    df.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
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

  /** c03: 80/10/10 train/val/test assignment over documents — stable
    * under corpus growth, no shuffle. */
  def c03Split(spark: SparkSession, dir: String): DataFrame =
    splitAssign(Tables.documents(spark, dir).select("doc_id", "lang"), "doc_id")
      .orderBy("doc_id")

  // --------------------------------------------------------- oracle SQL

  val oracleSql: Map[String, String] = Map(
    "c03_split" ->
      """SELECT doc_id, lang,
        |  CASE WHEN ((doc_id % 100) * 61) % 100 < 80 THEN 'train'
        |    WHEN ((doc_id % 100) * 61) % 100 < 90 THEN 'val'
        |    ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "c01_sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ((doc_id % 1000) * 761) % 1000 <
        |  CASE WHEN lang = 'en' THEN 500 WHEN lang = 'de' THEN 300 ELSE 200 END
        |ORDER BY doc_id""".stripMargin,
    "c02_shard_pack" ->
      """SELECT doc_id, n_chars,
        |  CAST(coalesce(sum(n_chars) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) // 10000 AS shard
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
