package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, Similarity}
import graft.functions.{GraftFunctions, Numerics}

class LlmOpsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("2").appName("llm-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("rolling hash expression: codegen matches interpreted and the polynomial") {
    val sess = spark
    import sess.implicits._
    val df = Seq("abc", "", "hello world").toDF("t")
    val out = df.select(GraftFunctions.rollingHash(col("t")).as("h")).collect()
      .map(_.getLong(0))
    def poly(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 1000000007L)
    assert(out.toSeq == Seq(poly("abc"), poly(""), poly("hello world")))
  }

  test("featureHash: hand-computed buckets/signs, counts aggregate, zero rows dropped") {
    val sess = spark
    import sess.implicits._
    // "a" = 97: bucket 97 % 64 = 33; sign hash 97 % 2 = 1 -> -1
    // "b" = 98: bucket 34; 98 % 2 = 0 -> +1
    val df = Seq((1L, "a a b"), (2L, "b b b b")).toDF("doc_id", "text")
    val out = operators.TextOps.featureHash(df, 64).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((1L, 33L) -> -2L, (1L, 34L) -> 1L, (2L, 34L) -> 4L))
    // independent reference replay on mixed text (validates the
    // explode + normalize + aggregate plumbing end-to-end)
    def poly(s: String, base: Long, mod: Long): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * base + (b & 0xff)) % mod)
    val text = "The  quick brown fox the QUICK end"
    val toks = text.toLowerCase.replaceAll("\\s+", " ").split(" ").filter(_.nonEmpty)
    val want = toks.groupBy(t => poly(t, 31, 1000000007L) % 64)
      .map { case (b, ts) =>
        b -> ts.map(t => if (poly(t, 131, 998244353L) % 2 == 0) 1L else -1L).sum }
      .filter(_._2 != 0L)
    val got = operators.TextOps.featureHash(Seq((9L, text)).toDF("doc_id", "text"), 64)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("c12 curriculum: phases cover terciles, within-phase best-first budget, composition") {
    val dir = "/root/testdata/sf0.001"
    val out = operators.Corpus.c12Curriculum(spark, dir).collect()
    assert(out.nonEmpty)
    val byPhase = out.groupBy(_.getInt(1))
    assert(byPhase.keySet == Set(0, 1, 2))
    byPhase.foreach { case (_, rows) =>
      // included set is a prefix of the (score desc, doc_id) order and
      // tok_before is the running sum of earlier docs' tokens
      val ordered = rows.sortBy(r => (-math.round(r.getDouble(2) * 10000), r.getLong(0)))
      var run = 0L
      ordered.foreach { r =>
        assert(r.getLong(4) == run, s"tok_before mismatch at doc ${r.getLong(0)}")
        assert(r.getBoolean(5) == (run < 20000L))
        run += r.getLong(3)
      }
      // phase purity: every phase-2 score >= every phase-0 score
    }
    val maxP0 = byPhase(0).map(_.getDouble(2)).max
    val minP2 = byPhase(2).map(_.getDouble(2)).min
    assert(minP2 >= maxP0 - 1e-9)
  }

  test("qnorm expression matches Numerics.qnorm through codegen") {
    val sess = spark
    import sess.implicits._
    val ps = Seq(0.001, 0.025, 0.5, 0.975, 0.999)
    val out = ps.toDF("p").select(GraftFunctions.qnorm(col("p")).as("q")).collect()
      .map(_.getDouble(0))
    ps.zip(out).foreach { case (p, q) =>
      assert(math.abs(q - Numerics.qnorm(p)) < 1e-14, s"p=$p")
    }
    assert(math.abs(out(2)) < 1e-12) // qnorm(0.5) = 0
  }

  test("knnBrute admission guard rejects corpus-scale query sets") {
    val emb = Similarity.embeddings(spark, dir)
    spark.conf.set("spark.graft.ann.queryRowsMax", "10")
    try {
      val ex = intercept[IllegalArgumentException](
        Similarity.knnBrute(emb, col("vec_id") < 25, 5))
      assert(ex.getMessage.contains("queryRowsMax"))
      intercept[IllegalArgumentException](
        Similarity.radiusSearch(emb, col("vec_id") < 25, 0.3))
      // within the bound still runs; 0 disables
      assert(Similarity.knnBrute(emb, col("vec_id") < 10, 5).count() > 0)
      spark.conf.set("spark.graft.ann.queryRowsMax", "0")
      assert(Similarity.knnBrute(emb, col("vec_id") < 25, 5).count() > 0)
    } finally spark.conf.unset("spark.graft.ann.queryRowsMax")
  }

  test("ANN LSH achieves high recall of the exact top-5 neighbors") {
    val emb = Similarity.embeddings(spark, dir)
    val exact = Similarity.knnBrute(emb, col("vec_id") < 25, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annLsh(emb, col("vec_id") < 25, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(exact.size == 125)
    assert(recall >= 0.7, s"recall $recall")
  }

  test("radiusSearch returns exactly the above-threshold cosine pairs") {
    val sess = spark
    import sess.implicits._
    val emb = Seq(
      (0L, Seq(1.0, 0.0)),  // query
      (1L, Seq(2.0, 0.0)),  // cos 1.0
      (2L, Seq(0.0, 1.0)),  // cos 0.0
      (3L, Seq(1.0, 1.0)),  // cos ~0.7071
      (4L, Seq(0.0, 0.0))   // zero norm -> excluded
    ).toDF("vec_id", "e")
    val out = Similarity.radiusSearch(emb, col("vec_id") === 0, tau = 0.5)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(out.keySet == Set(1L, 3L))
    assert(out(1L) == 1.0 && out(3L) == 0.7071)
  }

  test("ANN IVF achieves high recall of the exact top-5 neighbors; candidates shrink") {
    val emb = Similarity.embeddings(spark, dir)
    val exact = Similarity.knnBrute(emb, col("vec_id") < 25, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.annIvf(emb, col("vec_id") < 25, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall")
    // fixed-point training: same data -> BIT-IDENTICAL codebook at any
    // partition count (integer sums are order-independent); compare a
    // local[1] repartition against the default plan exactly
    val uq = Similarity.quantized(emb).select("vec_id", "q")
    val c1 = Similarity.ivfCentroidsQ(uq, 8, 2).flatten.toSeq
    val c2 = Similarity.ivfCentroidsQ(uq.repartition(1), 8, 2).flatten.toSeq
    assert(c1 == c2)
  }

  test("annIvfRerank: same candidates as n03, exact-integer order, partition invariance") {
    val dir = "/root/testdata/sf0.001"
    val emb = operators.Similarity.embeddings(spark, dir)
    val rr = operators.Similarity.annIvfRerank(emb, col("vec_id") < 25, 5).collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1))
    val ivf = operators.Similarity.annIvf(emb, col("vec_id") < 25, 5).collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1))
    // identical candidate pools: per query the two top-5 SETS agree on
    // >= 4 of 5 (only quantization ULPs can reorder the margin)
    val byQ = rr.groupBy(_._1._1).map { case (q, v) => q -> v.map(_._2).toSet }
    val byQi = ivf.groupBy(_._1._1).map { case (q, v) => q -> v.map(_._2).toSet }
    assert(byQ.keySet == byQi.keySet && byQ.nonEmpty)
    byQ.foreach { case (q, s) => assert((s & byQi(q)).size >= 4, s"query $q") }
    // integer ranking is partition-proof
    val p7 = operators.Similarity.annIvfRerank(emb.repartition(7),
        col("vec_id") < 25, 5).collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1))
    assert(rr.toMap == p7.toMap)
  }

  test("ANN IVF-PQ: decent recall of the exact top-5 through 8-byte codes; codebooks deterministic") {
    val emb = Similarity.embeddings(spark, dir)
    val exact = Similarity.knnBrute(emb, col("vec_id") < 25, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.annIvfPq(emb, col("vec_id") < 25, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    // PQ is lossy by design (64 dims -> 8 bytes); through 4/16 probed
    // lists + ADC shortlist 20 it must still find most true neighbors
    assert(recall >= 0.5, s"recall $recall")
    // fixed-point subspace k-means: bit-identical at any partitioning
    val uq = Similarity.quantized(emb).select("vec_id", "q")
    val b1 = Similarity.pqCodebooks(uq, 8, 8, 16, 2).flatten.flatten.toSeq
    val b2 = Similarity.pqCodebooks(uq.repartition(3), 8, 8, 16, 2).flatten.flatten.toSeq
    assert(b1 == b2)
  }

  test("kmeansClusters: separated groups recovered, sizes consistent, assignment is argmax") {
    val sess = spark
    import sess.implicits._
    // two tight axis-aligned groups in 4-d, INTERLEAVED by id so the
    // deterministic first-k seeding picks one seed per group; k=2
    // must split them
    val rows = (0 until 20).map { i =>
      if (i % 2 == 0) (i.toLong, Array(1.0f, 0.001f * i, 0f, 0f))
      else (i.toLong, Array(0f, 0.001f * i, 1.0f, 0f))
    }
    val emb = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val out = operators.Similarity.kmeansClusters(emb, k = 2, iters = 3).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.size == 20)
    val g1 = (0L until 20L by 2).map(out(_)._1).toSet
    val g2 = (1L until 20L by 2).map(out(_)._1).toSet
    assert(g1.size == 1 && g2.size == 1 && g1 != g2)
    assert(out.values.forall(_._2 == 10L))
    // tight groups around the centroid: cosine near 1
    assert(out.values.forall(_._3 > 0.99))
    // partition invariance
    val rep = operators.Similarity.kmeansClusters(emb.repartition(7), k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rep == out)
  }

  test("semDedup marks exactly the injected twins on the d05 corpus") {
    val corpus = operators.Dedup.embCorpus(spark, dir).select("vec_id", "e")
    val out = Similarity.semDedup(corpus, lists = 16, iters = 2, tau = 0.85)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val twinIds = out.keySet.filter(_ >= 100000L)
    assert(twinIds.nonEmpty)
    // every scaled twin shares its original's unit vector -> same
    // cluster, cosine 1.0 -> must be marked; originals stay (natural
    // pairwise cosine in this corpus is far below 0.85)
    twinIds.foreach(id => assert(out(id), s"twin $id not marked"))
    out.keySet.filter(_ < 100000L).foreach(id => assert(!out(id), s"original $id marked"))
  }

  test("BPE: hand-replayed merges, greedy-leftmost runs, per-doc token counts") {
    import operators.TextOps
    // training table: "abab"×4, "ab"×3, "aaaaa"×2
    //  round 1: pairs (a,b)=4·2+3=11, (b,a)=4, (a,a)=2·4=8 → merge (a,b)
    //  round 2: seg abab→[ab,ab], ab→[ab], aaaaa unchanged
    //    pairs: (ab,ab)=4, (a,a)=8 → merge (a,a)
    //  round 3: aaaaa →greedy [aa,aa,a] → pairs (ab,ab)=4, (aa,aa)=2,
    //    (aa,a)=2 → merge (ab,ab)
    val wf = Seq(("abab", 4L), ("ab", 3L), ("aaaaa", 2L))
    val merges = TextOps.bpeTrain(wf, 3)
    assert(merges == Seq(("a", "b"), ("a", "a"), ("ab", "ab")))
    // greedy-leftmost application: run of 5 'a's pairs left-to-right
    val s5 = TextOps.bpeApplyMerge(TextOps.bpeSeg("aaaaa"), "a", "a")
    assert(s5 == " aa aa a ")
    // a merge can enable the next occurrence (rescan from the start)
    assert(TextOps.bpeApplyMerge(" a b a b ", "a", "b") == " ab ab ")
    // end-to-end per-doc counts under the learned merges
    val sess = spark
    import sess.implicits._
    val docs = Seq(
      (0L, "abab ab abab abab aaaaa"),
      (1L, "ab ab aaaaa"),
      (2L, "zq")).toDF("doc_id", "text")
    val got = TextOps.bpeTokens(docs, nMerges = 3, trainWords = 500).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // abab → [abab] (1 tok), ab → [ab] (1), aaaaa → [aa,aa,a] (3)
    assert(got(0L) == (5L, 1L + 1L + 1L + 1L + 3L))
    assert(got(1L) == (3L, 1L + 1L + 3L))
    // untrained word: chars survive unmerged
    assert(got(2L) == (1L, 2L))
  }

  test("silhouette: perfectly separated clusters score 1, a boundary vector drags its cluster") {
    import operators.Similarity
    val sess = spark
    import sess.implicits._
    // two orthogonal tight clusters; seeds (lowest ids 1, 2) start one
    // in each, so one Lloyd iteration lands centroids exactly on the
    // axes and every member sits ON its centroid: s = (1-0)/1 = 1
    val clean = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)), (2L, Seq(0.0, 1.0, 0.0, 0.0)),
      (3L, Seq(1.0, 0.0, 0.0, 0.0)), (4L, Seq(0.0, 1.0, 0.0, 0.0)))
      .toDF("vec_id", "e")
    val out = Similarity.silhouette(clean, k = 2, iters = 1).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.values.map(_._1).toSeq.sorted == Seq(2L, 2L))
    assert(out.values.forall(_._2 == 1.0), s"clean clusters score 1.0: $out")
    // a 45-degree boundary vector joins one cluster, shifts its
    // centroid, and scores well below the tight members
    val mixed = clean.unionAll(Seq((5L, Seq(math.sqrt(0.5), math.sqrt(0.5), 0.0, 0.0)))
      .toDF("vec_id", "e"))
    val m = Similarity.silhouette(mixed, k = 2, iters = 2).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(m.map(_._2).sum == 5L)
    val host = m.maxBy(_._2) // the 3-member cluster absorbed the straggler
    assert(host._2 == 3L && host._4 < 0.9, s"boundary vector drags min_sil: $m")
    assert(m.forall(r => r._3 >= 0.0 && r._3 <= 1.0 && r._4 <= r._5))
  }

  test("tokenizerFertility: per-lang closed form on the BPE hand corpus") {
    import operators.TextOps
    val sess = spark
    import sess.implicits._
    // same hand corpus as the t13 spec, now with langs: the trained
    // merges favor 'ab'-heavy text, so zz-lang pays higher fertility
    val docs = Seq(
      (0L, "abab ab abab abab aaaaa", "en"),
      (1L, "ab ab aaaaa", "en"),
      (2L, "zq zq", "zz")).toDF("doc_id", "text", "lang")
    val got = TextOps.tokenizerFertility(docs, nMerges = 3, trainWords = 500)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    // en: words 5+3=8, tokens 7+5=12, bytes 23+11=34
    assert(got("en") == ((2L, 8L, 12L, 1.5, math.rint(34.0 / 12 * 10000) / 10000)))
    // zz: 'zq' untrained -> 2 chars each: words 2, tokens 4, bytes 5
    assert(got("zz") == ((1L, 2L, 4L, 2.0, 1.25)))
    assert(got("zz")._4 > got("en")._4, "under-represented lang pays more tokens per word")
  }

  test("lineStats: hand-checked duplicate-line/char/punct fractions") {
    import operators.TextOps
    val sess = spark
    import sess.implicits._
    // 2-word lines: [a b, a b, a b, c.] → 4 lines, 2 distinct,
    // dup chars 6 of 11, one terminal-punct line; 4-word paragraphs:
    // [a b a b, a b c.] → no duplicates
    val docs = Seq((0L, "a b a b a b c.")).toDF("doc_id", "text")
    val r = TextOps.lineStats(docs, lineWords = 2, paraWords = 4).collect()(0)
    assert(r.getAs[Long]("n_lines") == 4L)
    assert(r.getAs[Double]("dup_line_frac") == 0.5)
    assert(r.getAs[Double]("dup_line_char_frac") == 0.5455)
    assert(r.getAs[Double]("term_punct_frac") == 0.25)
    assert(r.getAs[Double]("dup_para_frac") == 0.0)
  }

  test("gopherGate: each rule trips on its constructed doc, clean doc keeps") {
    import operators.TextOps
    val sess = spark
    import sess.implicits._
    val stops = "the be to of and that have with" // all 8 stop words
    // 0: clean 56-word doc → every rule passes
    val good = (stops + " ") * 7
    // 1: 9 words (mean length 28/9 ≥ 3) → r1 (word count ≥ 50) fails only
    val short = stops + " gone"
    // 2: 56 words, one symbol per word → r3 (symbol ratio < 0.1) fails
    val symb = ((stops.split(" ").map(_ + " #").mkString(" ") + " ") * 7).trim
    // 3: every 8-word line bullet-led → r4 (< 90% bulleted) fails
    val bullet = (("- " + stops.split(" ").take(7).mkString(" ") + " ") * 8).trim
    // 4: every 8-word line ellipsis-ended → r5 (< 30% ellipsis) fails
    val ellip = ((stops.split(" ").take(7).mkString(" ") + " done... ") * 8).trim
    // 5: 56 numeric words → r6 (alpha frac > 0.8) and r7 fail
    val nums = (("1 2 3 4 5 6 7 8" + " ") * 7).trim
    // 6: empty text → r1 fails, ratio rules null out (counted failed)
    val docs = Seq((0L, good), (1L, short), (2L, symb), (3L, bullet),
      (4L, ellip), (5L, nums), (6L, "")).toDF("doc_id", "text")
    val r = TextOps.gopherGate(docs, lineWords = 8).orderBy("doc_id").collect()
    assert(r(0).getAs[Boolean]("keep") && r(0).getAs[Long]("n_failed") == 0L)
    assert(r(0).getAs[Long]("stop_hits") == 8L)
    assert(!r(1).getAs[Boolean]("keep") && r(1).getAs[Long]("n_words") == 9L &&
      r(1).getAs[Long]("n_failed") == 1L)
    assert(!r(2).getAs[Boolean]("keep") &&
      r(2).getAs[Double]("symbol_ratio") >= 0.1)
    assert(!r(3).getAs[Boolean]("keep") &&
      r(3).getAs[Double]("bullet_frac") >= 0.9)
    assert(!r(4).getAs[Boolean]("keep") &&
      r(4).getAs[Double]("ellipsis_frac") >= 0.3)
    assert(!r(5).getAs[Boolean]("keep") &&
      r(5).getAs[Double]("alpha_frac") == 0.0 &&
      r(5).getAs[Long]("stop_hits") == 0L)
    assert(!r(6).getAs[Boolean]("keep") && r(6).getAs[Long]("n_words") == 0L &&
      r(6).isNullAt(r(6).fieldIndex("mean_wlen")) &&
      r(6).getAs[Long]("n_failed") == 5L)
  }

  test("repetitionGate: hand-computed gram/line/para fracs, singleton tops pass, no-evidence passes") {
    import operators.TextOps
    val sess = spark
    import sess.implicits._
    // 0: "x y x y x y" — tot 11 chars; top 2-gram "x y"×3 (9/11),
    //    top 3-gram ×2 len5 (10/11), top 4-gram ×2 len7 (14/11→cap 1),
    //    5-grams distinct → dup5 0; lines "x y x"/"y x y" distinct
    val a = "x y x y x y"
    // 1: 3-word lines duplicate pairwise → dup_line_frac 0.5,
    //    dup_line_char_frac 10/20 = 0.5; 4-grams all singletons → top4 0
    val c = "p q r p q r s t u s t u"
    // 2: two identical 12-word paragraphs → para fracs 0.5
    val dWords = (1 to 12).map(i => f"w$i%02d").mkString(" ")
    val d = dWords + " " + dWords
    // 3: 60 distinct words → everything passes
    val e = (1 to 60).map(i => f"v$i%02d").mkString(" ")
    val docs = Seq((0L, a), (1L, c), (2L, d), (3L, e), (4L, ""))
      .toDF("doc_id", "text")
    val r = TextOps.repetitionGate(docs).orderBy("doc_id").collect()
    def g(i: Int, c: String) = r(i).getAs[Double](c)
    // doc 0: exact rounded fractions
    assert(g(0, "top_2gram_char_frac") == 0.8182)
    assert(g(0, "top_3gram_char_frac") == 0.9091)
    assert(g(0, "top_4gram_char_frac") == 1.0)
    assert(g(0, "dup_5gram_char_frac") == 0.0)
    assert(r(0).isNullAt(r(0).fieldIndex("dup_7gram_char_frac"))) // no 7-grams
    assert(g(0, "dup_line_frac") == 0.0)
    assert(!r(0).getAs[Boolean]("keep") && r(0).getAs[Long]("n_failed") == 3L)
    // doc 1: line duplication + top-2/3 fail; singleton 4-grams → 0
    assert(g(1, "dup_line_frac") == 0.5 && g(1, "dup_line_char_frac") == 0.5)
    assert(g(1, "top_2gram_char_frac") == 0.2609) // 2·3 / 23
    assert(g(1, "top_3gram_char_frac") == 0.4348) // 2·5 / 23
    assert(g(1, "top_4gram_char_frac") == 0.0)    // mc = 1 → not repetition
    assert(!r(1).getAs[Boolean]("keep") && r(1).getAs[Long]("n_failed") == 4L)
    // doc 2: paragraph rules fire (both count and char fraction)
    assert(g(2, "dup_para_frac") == 0.5 && g(2, "dup_para_char_frac") == 0.5)
    assert(!r(2).getAs[Boolean]("keep"))
    // doc 3: clean — all rules pass
    assert(r(3).getAs[Boolean]("keep") && r(3).getAs[Long]("n_failed") == 0L)
    // doc 4: empty — every frac null = no evidence → PASSES (unlike
    // t19's coverage rules, absent repetition is a clean pass)
    assert(r(4).getAs[Boolean]("keep") && r(4).getAs[Long]("n_failed") == 0L)
    assert(r(4).isNullAt(r(4).fieldIndex("dup_line_frac")))
  }

  test("gopherGate kernel equals the declarative twin row-for-row") {
    import operators.TextOps
    val sess = spark
    import sess.implicits._
    // edge docs: tabs (space-only trim + \s+ split leading empties),
    // bullet/ellipsis lines, overlapping dots (occ's non-overlapping
    // count), stop words punctuation-attached vs space-delimited,
    // empty text, runs of spaces, non-ASCII (code-point lengths)
    val edge = Seq(
      (910001L, "\tstarts with a tab and then some # words ..."),
      (910002L, "- bullet one two three\n* bullet led again here now\nplain line..."),
      (910003L, ""),
      (910004L, "......##  dots overlap the, be, to of and that have with"),
      (910005L, "héllo wörld the be to of ... naïve café crème brûlée"),
      (910006L, "  the   be  to  of and that have with  "))
      .toDF("doc_id", "text")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).unionByName(edge)
    val a = TextOps.gopherGate(docs).orderBy("doc_id").collect()
    val b = TextOps.gopherGateDeclarative(docs).orderBy("doc_id").collect()
    assert(a.length == b.length && a.length > 5)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"\nkernel: $x\ndecl:   $y") }
  }

  test("repetition (t08) kernel equals the declarative twin row-for-row") {
    import operators.TextOps
    val sess = spark
    import sess.implicits._
    val edge = Seq(
      (920001L, "spam spam spam spam eggs spam"),
      (920002L, ""),                       // splits to one empty token
      (920003L, "one"),                    // no 2-grams -> null count
      (920004L, "a b a b a b a b c d"),
      (920005L, "héllo wörld héllo wörld naïve café"),
      (920006L, "tabs\tand\nnewlines collapse to single spaces here"))
      .toDF("doc_id", "text")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).unionByName(edge)
    val a = TextOps.repetition(docs).orderBy("doc_id").collect()
    val b = TextOps.repetitionDeclarative(docs).orderBy("doc_id").collect()
    assert(a.length == b.length && a.length > 5)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"\nkernel: $x\ndecl:   $y") }
  }

  test("repetitionGate kernel equals the declarative twin row-for-row") {
    import operators.TextOps
    val sess = spark
    import sess.implicits._
    // real corpus (with its mutated duplicate rows) + synthetic edge
    // docs: tabs/newlines (trim + relining paths), runs of spaces
    // (normText collapse + empty split tokens), empty text, heavy
    // repetition, and a non-ASCII doc (code-point lengths)
    val edge = Seq(
      (900001L, "a\tb\tc d\ne f g h i j k l m n o p"),
      (900002L, "  double  spaced   words  here and more tokens x y z"),
      (900003L, ""),
      (900004L, ("spam ham " * 30).trim),
      (900005L, "héllo wörld héllo wörld héllo wörld naïve café crème"))
      .toDF("doc_id", "text")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).unionByName(edge)
    val a = TextOps.repetitionGate(docs).orderBy("doc_id").collect()
    val b = TextOps.repetitionGateDeclarative(docs).orderBy("doc_id").collect()
    assert(a.length == b.length && a.length > 5)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"\nkernel: $x\ndecl:   $y") }
  }

  test("charEntropy kernel equals the HOF twin row-for-row") {
    import operators.TextOps
    val sess = spark
    import sess.implicits._
    val edge = Seq(
      (800001L, "aaabbbccc"),
      (800002L, ""),
      (800003L, "a"),
      (800004L, "héllo wörld ünïcode ééé"),
      (800005L, "the quick brown fox jumps over the lazy dog 0123456789"))
      .toDF("doc_id", "text")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).unionByName(edge)
    val a = TextOps.charEntropy(docs).orderBy("doc_id").collect()
    val b = TextOps.charEntropyHof(docs).orderBy("doc_id").collect()
    assert(a.length == b.length && a.length > 5)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"\nkernel: $x\nhof:    $y") }
  }

  test("unigramLogprob: hand-checked xent, rare tokens score higher, empty doc nulls") {
    val sess = spark
    import sess.implicits._
    // tokens: a x4, b x2, z x1, total 7
    val docs = Seq((0L, "a a b"), (1L, "a a b"), (2L, "z"), (3L, "  "))
      .toDF("doc_id", "text")
    val out = operators.TextOps.unigramLogprob(docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    val expDoc0 = -(2 * math.log(4.0 / 7) + math.log(2.0 / 7)) / 3
    assert(out(0L).getLong(1) == 3)
    assert(out(0L).getDouble(2) == r4(expDoc0))
    assert(out(2L).getDouble(2) == r4(-math.log(1.0 / 7)))
    // the rare-token doc is the most surprising one
    assert(out(2L).getDouble(2) > out(0L).getDouble(2))
    assert(out(3L).getLong(1) == 0 && out(3L).isNullAt(2))
  }

  test("hyperplanes are deterministic") {
    val a = Similarity.hyperplanes(24, 64, 7L)
    val b = Similarity.hyperplanes(24, 64, 7L)
    assert(a.flatten.toSeq == b.flatten.toSeq)
    assert(a.flatten.forall(v => v == 1.0 || v == -1.0))
  }

  test("polyHyperplanes are balanced and uncorrelated across planes") {
    val hp = Similarity.polyHyperplanes(24, 64)
    assert(hp.flatten.forall(v => v == 1.0 || v == -1.0))
    // each plane roughly half +1 (binomial: 32 ± ~4σ=16 of 64)
    hp.foreach { plane =>
      val pos = plane.count(_ == 1.0)
      assert(pos >= 16 && pos <= 48, s"unbalanced plane: $pos/64 positive")
    }
    // no two planes nearly equal or nearly opposite (|agreement-32|
    // small): the pre-square hash's alternating parity would fail this
    for (i <- hp.indices; j <- (i + 1) until hp.length) {
      val agree = hp(i).zip(hp(j)).count { case (x, y) => x == y }
      assert(agree >= 16 && agree <= 48, s"planes $i,$j agree on $agree/64")
    }
  }

  test("charEntropyAgg (scale twin) equals the projection-form t09 on the corpus") {
    val docs = graft.Tables.documents(spark, dir)
    val proj = operators.TextOps.charEntropy(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(1).toLong, Option(r.get(2)))).toMap
    val agg = operators.TextOps.charEntropyAgg(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), Option(r.get(2)))).toMap
    assert(agg.keySet == proj.keySet)
    proj.foreach { case (id, (n, h)) =>
      assert(agg(id)._1 == n, s"doc $id n_chars")
      assert(agg(id)._2 == h, s"doc $id entropy: proj=$h agg=${agg(id)._2}")
    }
  }

  test("mipsTopK: exact integer dots, magnitude sensitivity, augmentation reduction, invariance") {
    val sess = spark
    import sess.implicits._
    val emb = Seq(
      (1L, Seq(1.0, 2.0)),
      (2L, Seq(0.5, -1.0)),
      (3L, Seq(2.0, 0.25)),
      (4L, Seq(3.0, 6.0)) // v1's direction, 3x the magnitude
    ).toDF("vec_id", "e")
    val out = operators.Similarity.mipsTopK(emb, col("vec_id") === 1, 3)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
    // q=(1,2): v4 = 3+12 = 15 (magnitude wins — cosine would tie v4
    // with q's own direction), v3 = 2.5, v2 = -1.5; micro = 1e12×
    assert(out.toSeq == Seq(
      (4L, 1, 15000000000000L, 15.0),
      (3L, 2, 2500000000000L, 2.5),
      (2L, 3, -1500000000000L, -1.5)))
    // the 100 TB path: norm-augmentation (corpus x -> (x, sqrt(M²-‖x‖²)),
    // query -> (q, 0)) makes cosine order EQUAL MIPS order, so n02's
    // hyperplane LSH applies unchanged — replay the reduction by hand
    val vecs = Map(2L -> Seq(0.5, -1.0), 3L -> Seq(2.0, 0.25), 4L -> Seq(3.0, 6.0))
    val m = math.sqrt(vecs.values.map(v => v.map(x => x * x).sum).max)
    val q = Seq(1.0, 2.0, 0.0)
    val cosOrder = vecs.toSeq.map { case (id, v) =>
      val x = v :+ math.sqrt(m * m - v.map(c => c * c).sum)
      val dot = q.zip(x).map { case (a, b) => a * b }.sum
      id -> (dot / (math.sqrt(5.0) * m))
    }.sortBy(-_._2).map(_._1)
    assert(cosOrder == out.toSeq.map(_._1).toSeq)
    // integer ranking is partition-count-proof
    val big = (1L to 80L).map(i =>
      (i, Seq(math.sin(i * 0.7), math.cos(i * 1.3), math.sin(i * 2.1)))).toDF("vec_id", "e")
    val p1 = operators.Similarity.mipsTopK(big.repartition(1), col("vec_id") % 11 === 0, 4)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(1))).toSet
    val p7 = operators.Similarity.mipsTopK(big.repartition(7), col("vec_id") % 11 === 0, 4)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(1))).toSet
    assert(p1 == p7 && p1.nonEmpty)
  }

  test("sq8Knn: hand-quantized codes, exact integer ranking, agrees with float kNN when separated") {
    val sess = spark
    import sess.implicits._
    // 2-dim corpus with known extrema: dim1 ∈ [0, 10], dim2 ∈ [0, 2].
    // codes: (x-mn)/(mx-mn)*255 rounded — vec 0 (0,0)→(0,0),
    // 1 (10,2)→(255,255), 2 (5,1)→(128,128) (0.5*255=127.5→⌊128.0⌋),
    // 3 (10,0)→(255,0)
    val emb = Seq(
      (0L, "a", Seq(0.0, 0.0)), (1L, "a", Seq(10.0, 2.0)),
      (2L, "a", Seq(5.0, 1.0)), (3L, "a", Seq(10.0, 0.0)))
      .toDF("vec_id", "label", "e")
    val out = operators.Similarity.sq8Knn(emb, col("vec_id") === 1L, k = 3)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getLong(3)))
    // dots vs query (255,255): v3 = 255*255 = 65025,
    // v2 = 255*128 + 255*128 = 65280, v0 = 0 → order 2, 3, 0
    assert(out.toSeq == Seq((2L, 1, 65280L), (3L, 2, 65025L), (0L, 3, 0L)))
    // well-separated clusters: SQ8's top-1 equals float cosine's top-1
    val rng = new scala.util.Random(7)
    val big = (0 until 60).map { i =>
      val c = i % 3
      val base = Array.fill(8)(0.1 * rng.nextGaussian())
      base(c) += 5.0
      (i.toLong, c.toString, base.toSeq)
    }.toDF("vec_id", "label", "e")
    val sq = operators.Similarity.sq8Knn(big, col("vec_id") < 6, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fl = operators.Similarity.knnBrute(big, col("vec_id") < 6, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same CLUSTER (i mod 3) even if not the same vector
    sq.foreach { case (q, n) => assert(n % 3 == fl(q) % 3, s"query $q") }
  }

  test("knnClassify votes with top-k labels and breaks ties lexicographically") {
    val sess = spark
    import sess.implicits._
    // 2-D embeddings: queries 0/1 sit in opposite clusters; vec 10-12
    // labeled "pos" near +x, vec 20-22 labeled "neg" near -x; vec 30
    // ("zzz") equidistant-ish but outside everyone's top-3
    val emb = Seq(
      (0L, "q", Seq(1.0, 0.05)), (1L, "q", Seq(-1.0, -0.05)),
      (10L, "pos", Seq(1.0, 0.1)), (11L, "pos", Seq(0.9, 0.0)), (12L, "pos", Seq(1.0, -0.1)),
      (20L, "neg", Seq(-1.0, 0.1)), (21L, "neg", Seq(-0.9, 0.0)), (22L, "neg", Seq(-1.0, -0.1)),
      (30L, "zzz", Seq(0.0, 1.0))
    ).toDF("vec_id", "label", "e")
    val out = Similarity.knnClassify(emb, col("vec_id") < 2, k = 3).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(0L) == (("pos", 3L)))
    assert(out(1L) == (("neg", 3L)))
    // forced 2-2 vote tie at k=4 -> lexicographically smaller label wins
    val tie = Seq(
      (0L, "q", Seq(1.0, 0.0)),
      (1L, "bbb", Seq(1.0, 0.1)), (2L, "aaa", Seq(1.0, -0.1)),
      (3L, "bbb", Seq(0.9, 0.1)), (4L, "aaa", Seq(0.9, -0.1))
    ).toDF("vec_id", "label", "e")
    val t = Similarity.knnClassify(tie, col("vec_id") === 0, k = 4).collect()
    assert(t.length == 1 && t.head.getString(1) == "aaa" && t.head.getLong(2) == 2L)
  }

  test("bigramLogprob: hand-checked conditional xent, short docs null out") {
    val sess = spark
    import sess.implicits._
    // corpus bigrams: (a,b)x3 [doc1 x2, doc2 x1], (b,a)x2 [1 each],
    // (b,c)x1 [doc2]; contexts: a->3, b->3
    val docs = Seq(
      (1L, "a b a b"),     // bigrams ab, ba, ab
      (2L, "b a b c"),     // bigrams ba, ab, bc
      (3L, "single"),      // no bigrams
      (4L, "")             // empty
    ).toDF("doc_id", "text")
    val out = operators.TextOps.bigramLogprob(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(out(3L) == ((0L, None)) && out(4L) == ((0L, None)))
    // P(b|a)=3/3=1, P(a|b)=2/3, P(c|b)=1/3
    val d1 = -(2 * math.log(1.0) + 1 * math.log(2.0 / 3)) / 3
    val d2 = -(math.log(2.0 / 3) + math.log(1.0) + math.log(1.0 / 3)) / 3
    assert(out(1L)._1 == 3L && math.abs(out(1L)._2.get - d1) < 5e-5)
    assert(out(2L)._1 == 3L && math.abs(out(2L)._2.get - d2) < 5e-5)
    // context makes the signal: a doc of common-but-shuffled words
    // scores worse than the same words in corpus order
    val corpus = (0 until 50).map(i => (i.toLong, "the quick brown fox jumps")) ++
      Seq(50L -> "the quick brown fox jumps", 51L -> "fox the jumps brown quick quick the")
    val scored = operators.TextOps.bigramLogprob(corpus.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(scored(51L).get > scored(50L).get)
  }

  test("charEntropyAuto routes by sampled alphabet size: projection under the guard, aggregate over it") {
    val sess = spark
    import sess.implicits._
    // ASCII corpus -> small alphabet -> projection plan (no Join; the
    // aggregate twin left-joins per-doc stats back onto doc_id)
    val ascii = Seq((1L, "hello world"), (2L, "abcabc")).toDF("doc_id", "text")
    val autoAscii = operators.TextOps.charEntropyAuto(ascii)
    assert(!autoAscii.queryExecution.optimizedPlan.toString.contains("Join"),
      "ASCII corpus should take the pure-projection (t09) plan")
    // >256 distinct code points -> aggregate twin (Join present)
    val wide = Seq((1L, (0x4e00 until 0x4e00 + 300).map(_.toChar).mkString))
      .toDF("doc_id", "text")
    val autoWide = operators.TextOps.charEntropyAuto(wide)
    assert(autoWide.queryExecution.optimizedPlan.toString.contains("Join"),
      "CJK-scale alphabet should route to the aggregate (t12) plan")
    // routing never changes values: both frames match the direct twins
    assert(autoAscii.collect().map(_.toSeq).toSet ==
      operators.TextOps.charEntropy(ascii).collect().map(_.toSeq).toSet)
    assert(autoWide.collect().map(_.toSeq).toSet ==
      operators.TextOps.charEntropyAgg(wide).collect().map(_.toSeq).toSet)
  }

  test("t13 BPE knobs are session-configurable and more merges never add tokens") {
    val sess = spark
    import sess.implicits._
    val docs = Seq((1L, "aaab aaab aaab banana"), (2L, "aaab banana banana"))
      .toDF("doc_id", "text")
    def toks(merges: Int): Map[Long, Long] =
      operators.TextOps.bpeTokens(docs, nMerges = merges, trainWords = 100)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val zero = toks(0); val five = toks(5)
    // zero merges -> every word costs its code-point count
    assert(zero(1L) == ("aaab aaab aaab banana".count(_ != ' ')))
    assert(five(1L) < zero(1L) && five(2L) < zero(2L))
    // the registered query reads the session conf (corpus-scale knob)
    spark.conf.set("spark.graft.bpe.merges", "0")
    try {
      val viaConf = operators.TextOps.t13BpeTokens(spark, dir).collect()
      val direct = operators.TextOps
        .bpeTokens(graft.Tables.documents(spark, dir), nMerges = 0,
          trainWords = operators.TextOps.BpeTrainWords)
        .orderBy("doc_id").collect()
      assert(viaConf.map(_.toSeq).toSeq == direct.map(_.toSeq).toSeq)
    } finally spark.conf.unset("spark.graft.bpe.merges")
  }

  test("mediaStats aggregates the catalog per modality in one pass") {
    val sess = spark
    import sess.implicits._
    val media = Seq(
      (1L, "image/jpeg", 100), (2L, "image/jpeg", 300),
      (3L, "audio/wav", 50)
    ).toDF("doc_id", "mime", "n_bytes")
    val out = Multimodal.mediaStats(media).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4))).toMap
    assert(out("image/jpeg") == ((2L, 400L, 200.0, 300)))
    assert(out("audio/wav") == ((1L, 50L, 50.0, 50)))
  }

  test("sampleFrames keeps every stride-th frame plus the last") {
    val sess = spark
    import sess.implicits._
    // 1000 bytes / frameBytes 100 -> frames 0..9; stride 4 -> 0,4,8 + last 9
    val media = Seq((1L, ("x" * 1000).getBytes, 1000), (2L, "abc".getBytes, 3))
      .toDF("doc_id", "media", "n_bytes")
    val out = operators.Multimodal.sampleFrames(media, frameBytes = 100, stride = 4)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(r => r.getInt(1) -> r.getInt(2)).toSet).toMap
    assert(out(1L).map(_._1) == Set(0, 4, 8, 9))
    assert(out(1L).forall(_._2 == 100))
    assert(out(2L) == Set(0 -> 3)) // single short frame: first == last
  }

  test("parseImageHeader reads hand-built PNG IHDR and JPEG SOF bytes") {
    import Multimodal.{parseImageHeader, ImageHeader}
    // Hand-written (NOT via the builders) 3x2 grayscale PNG header:
    // signature, IHDR length 13, width 3, height 2, depth 8, color 0.
    val png = Array(
      0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, // signature
      0, 0, 0, 13, 'I', 'H', 'D', 'R',             // length + type
      0, 0, 0, 3, 0, 0, 0, 2,                      // width=3 height=2 (BE u32)
      8, 0, 0, 0, 0,                               // depth, color 0, etc.
      0xde, 0xad, 0xbe, 0xef                       // CRC (not validated)
    ).map(_.toByte)
    assert(parseImageHeader(png).contains(ImageHeader("png", 3, 2, 1, 33)))
    // Hand-written baseline JPEG: SOI + bare SOF0 (h=2, w=3, 1 comp).
    val jpg = Array(
      0xff, 0xd8,                                  // SOI
      0xff, 0xc0, 0x00, 0x0b,                      // SOF0, len 11
      8, 0, 2, 0, 3, 1, 0x11, 0, 0                 // prec, h=2, w=3, 1 comp
    ).map(_.toByte)
    assert(parseImageHeader(jpg).contains(ImageHeader("jpeg", 3, 2, 1, 15)))
    // RGBA PNG and progressive 3-component JPEG via the builders
    // (round-trip: encode then parse back), APP0 skip exercised.
    val data = "pixels!".getBytes("US-ASCII")
    assert(parseImageHeader(Multimodal.buildPng(640, 480, 6, data))
      .contains(ImageHeader("png", 640, 480, 4, 33)))
    assert(parseImageHeader(Multimodal.buildJpeg(321, 123, 3, progressive = true, data))
      .contains(ImageHeader("jpeg", 321, 123, 3, 39)))
    // Unparseable payloads: wrong magic, truncated PNG, JPEG with no
    // SOF before EOF, corrupt marker stream.
    assert(parseImageHeader("not an image at all, just text".getBytes).isEmpty)
    assert(parseImageHeader(png.take(20)).isEmpty)
    assert(parseImageHeader(Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x02).map(_.toByte)).isEmpty)
    assert(parseImageHeader(Array(0xff, 0xd8, 0x12, 0x34, 0x56, 0x78).map(_.toByte)).isEmpty)
  }

  test("parseWavHeader walks RIFF chunks: hand-built bytes, LIST skip, odd-size pad") {
    import Multimodal.{parseWavHeader, WavHeader, buildWav}
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
    def t(s: String) = s.getBytes("US-ASCII")
    // hand-written (NOT via the builder): RIFF/WAVE with a 3-byte LIST
    // chunk (odd size -> pad byte) BEFORE fmt, then fmt(stereo,
    // 16 kHz, 16-bit) and a 12-byte data chunk
    val wav = t("RIFF") ++ le32(60) ++ t("WAVE") ++
      t("LIST") ++ le32(3) ++ Array[Byte](1, 2, 3, 0) ++ // odd size + pad
      t("fmt ") ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(16000) ++
      le32(64000) ++ le16(4) ++ le16(16) ++
      t("data") ++ le32(12) ++ Array.fill[Byte](12)(7)
    val parsed = parseWavHeader(wav)
    assert(parsed.contains(WavHeader(2, 16000, 16, 12, wav.length - 12)))
    // builder round-trip
    val built = buildWav(1, 44100, 16, "samples!".getBytes)
    assert(parseWavHeader(built).contains(WavHeader(1, 44100, 16, 8, 44)))
    assert(built.length == 52) // canonical 44-byte header + 8 data bytes
    // unparseable: wrong magic, truncated, data before fmt
    assert(parseWavHeader(t("RIFX") ++ wav.drop(4)).isEmpty)
    assert(parseWavHeader(wav.take(30)).isEmpty)
    assert(parseWavHeader(t("RIFF") ++ le32(20) ++ t("WAVE") ++
      t("data") ++ le32(4) ++ Array.fill[Byte](4)(1)).isEmpty)
    // m05 end-to-end: closed-form geometry round-trips through real bytes
    val feats = Multimodal.m05WavHeader(spark, dir).collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == Multimodal.wavChannels(id), s"doc $id channels")
      assert(r.getInt(2) == Multimodal.wavSampleRate(id), s"doc $id rate")
      assert(r.getInt(3) == 16)
      assert(r.getLong(5) == r.getLong(4) * 1000L / r.getInt(2), s"doc $id duration")
    }
  }

  test("parseMp4Header walks boxes: hand-built v0/v1 mvhd, largesize, truncation") {
    import Multimodal.{parseMp4Header, Mp4Header, buildMp4}
    def be32(v: Int) = Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def t(s: String) = s.getBytes("US-ASCII")
    // hand-written (NOT via the builder): free box, then moov with a
    // skipped child ahead of a minimal v0 mvhd, then mdat
    val mvhd = be32(8 + 24) ++ t("mvhd") ++
      Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++ be32(1000) ++ be32(2500) ++ be32(0)
    val child = be32(12) ++ t("udta") ++ be32(0)
    val moov = be32(8 + child.length + mvhd.length) ++ t("moov") ++ child ++ mvhd
    val free = be32(10) ++ t("free") ++ Array[Byte](1, 2)
    val mdat = be32(8 + 5) ++ t("mdat") ++ Array.fill[Byte](5)(9)
    val mp4 = free ++ moov ++ mdat
    assert(parseMp4Header(mp4).contains(
      Mp4Header(1000, 2500L, 5, mp4.length - 5)))
    // builder round-trip: both mvhd versions
    val data = "frames!".getBytes("US-ASCII")
    assert(parseMp4Header(buildMp4(90000, 123456789L, v1 = false, data))
      .exists(h => h.timescale == 90000 && h.duration == 123456789L && h.dataBytes == 7))
    assert(parseMp4Header(buildMp4(48000, 1L << 33, v1 = true, data))
      .exists(h => h.timescale == 48000 && h.duration == (1L << 33)))
    // unparseable: garbage, truncated moov, missing mdat
    assert(parseMp4Header("certainly not an mp4 file here".getBytes).isEmpty)
    assert(parseMp4Header(mp4.take(free.length + 10)).isEmpty)
    assert(parseMp4Header(free ++ moov).isEmpty)
    // m06 end-to-end: closed form round-trips through real boxes
    val feats = Multimodal.m06Mp4Header(spark, dir).collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == Multimodal.mp4Timescale(id), s"doc $id timescale")
      assert(r.getLong(2) == Multimodal.mp4Duration(id), s"doc $id duration")
    }
  }

  test("multimodal decode: real headers round-trip and batching preserves features") {
    val media = Multimodal.imageTable(spark, dir).toDF()
    val feats1 = Multimodal.extractFeatures(media, batchSize = 64).collect()
      .map(f => f.doc_id -> f).toMap
    val feats2 = Multimodal.extractFeatures(media.repartition(7), batchSize = 8).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats1.size == feats2.size && feats1.nonEmpty)
    // features are independent of partitioning/batch split
    feats1.foreach { case (id, f) =>
      val g = feats2(id)
      assert((f.n_bytes, f.format, f.width, f.height, f.channels, f.data_sum, f.thumb_md5) ==
        (g.n_bytes, g.format, g.width, g.height, g.channels, g.data_sum, g.thumb_md5))
    }
    // header-derived facts match the generator's closed form
    feats1.foreach { case (id, f) =>
      assert(f.format == (if (id % 2 == 0) "png" else "jpeg"), s"doc $id format")
      assert(f.width == Multimodal.imgWidth(id), s"doc $id width")
      assert(f.height == Multimodal.imgHeight(id), s"doc $id height")
    }
    assert(feats1.values.map(_.channels).toSet.subsetOf(Set(1, 2, 3, 4)))
    // stub resize: thumbnail digests are distinct per doc
    assert(feats1.values.map(_.thumb_md5).toSet.size > feats1.size / 2)
    // non-image payloads degrade to format=unknown, not a crash
    val plain = Multimodal.extractFeatures(Multimodal.mediaTable(spark, dir)).collect()
    assert(plain.nonEmpty && plain.forall(f => f.format == "unknown" && f.width == 0))
    // batch ids actually batch (batchSize 8 -> multiple batches somewhere)
    assert(Multimodal.extractFeatures(media.repartition(2), batchSize = 8)
      .collect().map(_.batch_id).max > 0)
  }

  test("parsePpmHeader reads hand-built P6 bytes; pixel decode means are exact") {
    import Multimodal.{parsePpmHeader, PpmHeader}
    // hand-written (NOT via the builder) header with comments and
    // mixed whitespace runs — the general netpbm grammar, not just
    // the canonical layout buildPpm emits
    val golden = ("P6 # binary rgb\n" +
      "# a full-line comment\n  2\t1 # dims\n255\n").getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40, 50, 60)
    val hdr = parsePpmHeader(golden)
    assert(hdr.contains(PpmHeader(2, 1, 255, golden.length - 6)))
    // exact per-channel means over the known raster
    val sess = spark
    import sess.implicits._
    val ds = Seq(Multimodal.MediaRow(1L, golden, "image/x-portable-pixmap", golden.length)).toDS()
    val f = Multimodal.extractPpmFeatures(ds).collect().head
    assert(f.format == "ppm" && f.n_pixels == 2L)
    assert(f.mean_r.contains(25.0) && f.mean_g.contains(35.0) && f.mean_b.contains(45.0))
    // unparseable/truncated: wrong magic, maxval > 255, zero dim,
    // raster shorter than 3wh -> degrade, never throw
    assert(parsePpmHeader("P5\n2 1\n255\n".getBytes).isEmpty)
    assert(parsePpmHeader("P6\n2 1\n65535\n".getBytes).isEmpty)
    assert(parsePpmHeader("P6\n0 1\n255\n".getBytes).isEmpty)
    val short = Multimodal.buildPpm(4, 4, Array[Byte](1, 2, 3))
    val g = Multimodal.extractPpmFeatures(
      Seq(Multimodal.MediaRow(2L, short, "x", short.length)).toDS()).collect().head
    assert(g.format == "unknown" && g.mean_r.isEmpty)
  }

  test("extractPpmChannelStats: exact integer profile on hand-built rasters") {
    val sess = spark
    import sess.implicits._
    // 2x1 raster: pixels (10,20,30),(40,50,60) — every moment known
    val golden = "P6\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40, 50, 60)
    val out = Multimodal.extractPpmChannelStats(
      Seq(Multimodal.MediaRow(1L, golden, "x", golden.length)).toDS())
      .collect().map(r => r.channel -> r).toMap
    for ((c, s, ss, mn, mx) <- Seq(("r", 50L, 1700L, 10, 40),
        ("g", 70L, 2900L, 20, 50), ("b", 90L, 4500L, 30, 60))) {
      val row = out(c)
      assert(row.n == 2L && row.sum == s && row.sumsq == ss, c)
      assert(row.bmin == mn && row.bmax == mx, c)
      assert(row.h0 == 2L && row.h1 == 0L && row.h2 == 0L && row.h3 == 0L, c)
    }
    // bin boundaries + the unsigned-byte path: 70→h1, 130→h2, 200→h3
    val hi = "P6\n1 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](70, 130.toByte, 200.toByte)
    val oh = Multimodal.extractPpmChannelStats(
      Seq(Multimodal.MediaRow(2L, hi, "x", hi.length)).toDS())
      .collect().map(r => r.channel -> r).toMap
    assert(oh("r").h1 == 1L && oh("g").h2 == 1L && oh("b").h3 == 1L)
    assert(oh("g").bmin == 130 && oh("b").sum == 200L)
    // truncated raster emits nothing (no partial profiles)
    val short = Multimodal.buildPpm(4, 4, Array[Byte](1, 2, 3))
    assert(Multimodal.extractPpmChannelStats(
      Seq(Multimodal.MediaRow(3L, short, "x", short.length)).toDS()).count() == 0L)
  }

  test("extractPpmOtsu: two-cluster raster splits at the dark bin; flat raster emits -1") {
    val sess = spark
    import sess.implicits._
    // 3x2 raster: 4 dark pixels (10,10,10) -> lum 30 bin 2; 2 bright
    // (200,200,200) -> lum 600 bin 50. Only candidate threshold is
    // bin 2: w0=4, s0=8, W=6, S=2*4+50*2=108, a=8*6-108*4=-384,
    // d=4*2=8 -> split at 2 with fg = 2/6
    val raster = (Seq.fill(4)(Seq(10, 10, 10)) ++ Seq.fill(2)(Seq(200, 200, 200)))
      .flatten.map(_.toByte).toArray
    val golden = "P6\n3 2\n255\n".getBytes("US-ASCII") ++ raster
    val r = Multimodal.extractPpmOtsu(
      Seq(Multimodal.MediaRow(1L, golden, "x", golden.length)).toDS()).collect().head
    assert(r.thr_bin == 2 && r.n_bg == 4L && r.n_px == 6L)
    assert(math.abs(r.fg_frac - 0.3333) < 1e-12)
    // flat image: a single occupied bin has no valid split
    val flat = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ Array.fill(12)(42.toByte)
    val f = Multimodal.extractPpmOtsu(
      Seq(Multimodal.MediaRow(2L, flat, "x", flat.length)).toDS()).collect().head
    assert(f.thr_bin == -1 && f.n_bg == 0L && f.n_px == 4L && f.fg_frac == 0.0)
  }

  test("pmiPairs: hand-computed pmi on a tiny corpus, window span, min-count filter") {
    val sess = spark
    import sess.implicits._
    // corpus: 5x "a b", 5x "c d e"
    // window 3 events: (a,b)x5; (c,d),(c,e),(d,e) x5 -> N = 20
    // marginals (both sides): a5 b5 c10 d10 e10
    val docs = ((1 to 5).map(i => (i.toLong, "a b")) ++
      (6 to 10).map(i => (i.toLong, "c d e"))).toDF("doc_id", "text")
    val out = operators.TextOps.pmiPairs(docs, window = 3, minCount = 5L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    def pmi(c: Long, mx: Long, my: Long) =
      math.floor(math.log(c.toDouble * 20 / (mx * my)) * 1e4 + 0.5) / 1e4 + 0.0
    assert(out.keySet == Set(("a", "b"), ("c", "d"), ("c", "e"), ("d", "e")))
    assert(out(("a", "b")) == ((5L, pmi(5, 5, 5))))
    assert(out(("c", "d")) == ((5L, pmi(5, 10, 10))))
    // min-count 6 drops everything
    assert(operators.TextOps.pmiPairs(docs, 3, 6L, 10).count() == 0)
    // window 1: only adjacent pairs -> (c,e) disappears
    val w1 = operators.TextOps.pmiPairs(docs, 1, 1L, 10).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(w1 == Set(("a", "b"), ("c", "d"), ("d", "e")))
  }

  test("tar: build/parse round-trip, 512-block walk, checksum + truncation rejections") {
    import operators.Multimodal._
    val a = Array.fill[Byte](1)('a')
    val b = Array.tabulate[Byte](513)(i => (i % 251).toByte) // crosses a block
    val tar = buildTar(Seq(("x/a.txt", a), ("x/b.bin", b)))
    // layout: h1@0 d1@512(+512 pad block) h2@1024 d2@1536 (513 -> 1024 padded)
    assert(tar.length == 512 + 512 + 512 + 1024 + 1024)
    val idx = parseTarIndex(tar).get
    assert(idx == Seq(TarMember("x/a.txt", 512L, 1L), TarMember("x/b.bin", 1536L, 513L)))
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(tar, 1536, 1536 + 513), b))
    // flip one data byte: checksum still fine (covers header only)
    val t2 = tar.clone(); t2(600) = 'z'.toByte
    assert(parseTarIndex(t2).isDefined)
    // flip a header byte: checksum mismatch -> None
    val t3 = tar.clone(); t3(0) = 'y'.toByte
    assert(parseTarIndex(t3).isEmpty)
    // non-octal size digit -> None
    val t4 = tar.clone(); t4(124) = '9'.toByte
    assert(parseTarIndex(t4).isEmpty)
    // truncation: cut before the terminator -> None
    assert(parseTarIndex(tar.take(tar.length - 1024)).isEmpty)
    // declared size overrunning the archive -> None
    val t5 = tar.clone()
    // member 2 size -> huge (octal '7777777' at 124) with checksum fixed up
    val h2 = 1024
    val old = t5.slice(h2 + 124, h2 + 136).clone()
    "77777777777".getBytes("US-ASCII").copyToArray(t5, h2 + 124)
    var sum = 0L
    for (k <- 0 until 512) sum += (if (k >= 148 && k < 156) ' '.toInt else (t5(h2 + k) & 0xff))
    val cs = java.lang.Long.toOctalString(sum)
    (("0" * (6 - cs.length)) + cs).getBytes("US-ASCII").copyToArray(t5, h2 + 148)
    t5(h2 + 154) = 0; t5(h2 + 155) = ' '
    assert(parseTarIndex(t5).isEmpty)
  }

  test("BMP: hand-built bytes round-trip; stride padding skipped; bottom-up flip honored") {
    import operators.Multimodal._
    val sess = spark
    import sess.implicits._
    // 2x2 BGR, stored bottom-up: stored row 0 = IMAGE BOTTOM row
    // image top row = pixels (10,20,30) (40,50,60); bottom = (1,2,3) (4,5,6)
    val stored = Array[Byte](1, 2, 3, 4, 5, 6, 10, 20, 30, 40, 50, 60)
    val bytes = buildBmp(2, 2, stored)
    val h = parseBmpHeader(bytes).get
    assert(h.width == 2 && h.height == 2 && h.dataOffset == 54 && !h.topDown)
    // stride is 8 for w=2 (6 pixel bytes + 2 pad); poison the padding:
    // a decoder that walks rows contiguously would read these as pixels
    bytes(54 + 6) = 99.toByte; bytes(54 + 7) = 99.toByte
    val out = extractBmpFeatures(Seq(MediaRow(7L, bytes, "image/bmp", bytes.length)).toDS())
      .collect().head
    assert(out.format == "bmp" && out.n_pixels == 4L)
    assert(out.mean_b.get == (1.0 + 4 + 10 + 40) / 4)
    assert(out.mean_g.get == (2.0 + 5 + 20 + 50) / 4)
    assert(out.mean_r.get == (3.0 + 6 + 30 + 60) / 4)
    // top IMAGE row = stored row h-1 = (10,20,30),(40,50,60)
    assert(out.top_row_sum.get == 10L + 20 + 30 + 40 + 50 + 60)
    // negative height = top-down storage: same bytes now mean the
    // OPPOSITE row order
    val td = buildBmp(2, 2, stored)
    td(22) = (-2 & 0xff).toByte; td(23) = 0xff.toByte; td(24) = 0xff.toByte; td(25) = 0xff.toByte
    val ht = parseBmpHeader(td).get
    assert(ht.topDown && ht.height == 2)
    val outTd = extractBmpFeatures(Seq(MediaRow(8L, td, "image/bmp", td.length)).toDS())
      .collect().head
    assert(outTd.top_row_sum.get == 1L + 2 + 3 + 4 + 5 + 6)
    // rejections: magic, bpp, compression
    assert(parseBmpHeader("XX".getBytes ++ bytes.drop(2)).isEmpty)
    val b32 = buildBmp(2, 2, stored); b32(28) = 32.toByte
    assert(parseBmpHeader(b32).isEmpty)
    val bc = buildBmp(2, 2, stored); bc(30) = 1.toByte
    assert(parseBmpHeader(bc).isEmpty)
    // truncated payload degrades, not throws
    val outTr = extractBmpFeatures(
      Seq(MediaRow(9L, bytes.take(60), "image/bmp", 60)).toDS()).collect().head
    assert(outTr.format == "unknown" && outTr.mean_b.isEmpty)
  }

  test("JPEG: hand-built segment walk round-trips; corrupt markers and truncation degrade") {
    import operators.Multimodal._
    val sess = spark
    import sess.implicits._
    val entropy = Array[Byte](10, 20, 30, 40, 50, 60) // 3x2 image, 6 payload bytes
    val bytes = buildJpeg(3, 2, entropy)
    val h = parseJpegHeader(bytes).get
    assert(h.width == 3 && h.height == 2 && h.components == 3 && h.precision == 8)
    // sosEnd points past the SOS segment: payload then EOI fill the rest
    assert(bytes.length - h.sosEnd - 2 == entropy.length)
    val out = extractJpegHeaders(
      Seq(MediaRow(5L, bytes, "image/jpeg", bytes.length)).toDS()).collect().head
    assert(out.format == "jpeg" && out.width == 3 && out.height == 2)
    assert(out.entropy_sum.get == 10L + 20 + 30 + 40 + 50 + 60)
    // a segment LENGTH off by one desynchronizes the walk → unknown
    val badLen = buildJpeg(3, 2, entropy)
    badLen(5) = (badLen(5) + 1).toByte // APP0 length low byte
    assert(parseJpegHeader(badLen).isEmpty)
    // SOS before any SOF → no dims → unknown
    val noSof = bytes.take(2) ++ bytes.drop(2).filterNot(_ => false)
    // (build a stream with the SOF segment excised: copy up to DQT end,
    //  then skip the 0xC0 segment)
    val sofStart = {
      var i = 2; var r = -1
      while (r < 0) {
        val m = noSof(i + 1) & 0xff
        val len = ((noSof(i + 2) & 0xff) << 8) | (noSof(i + 3) & 0xff)
        if (m == 0xc0) r = i else i += 2 + len
      }
      r
    }
    val sofLen = 2 + (((bytes(sofStart + 2) & 0xff) << 8) | (bytes(sofStart + 3) & 0xff))
    val excised = bytes.take(sofStart) ++ bytes.drop(sofStart + sofLen)
    assert(parseJpegHeader(excised).isEmpty)
    // truncation degrades, not throws
    val outTr = extractJpegHeaders(
      Seq(MediaRow(6L, bytes.take(bytes.length - 3), "image/jpeg", 1)).toDS()).collect().head
    assert(outTr.format == "unknown" && outTr.entropy_sum.isEmpty)
    // missing SOI
    assert(parseJpegHeader(bytes.drop(2)).isEmpty)
  }

  test("PNG chunk walk: hand-built container round-trips; corrupt CRC, truncation, trailing bytes degrade") {
    import operators.Multimodal._
    val sess = spark
    import sess.implicits._
    // 5x4 image → 20 payload bytes → ONE IDAT; chunks = IHDR, tEXt, IDAT, IEND
    val payload = Array.tabulate(20)(i => (i + 1).toByte) // sum 210
    val bytes = buildPngChunked(5, 4, payload)
    val f = pngChunkWalk(bytes).get
    assert(f.format == "png" && f.width == 5 && f.height == 4)
    assert(f.bit_depth == 8 && f.color_type == 2)
    assert(f.n_chunks == 4 && f.idat_sum.contains(210L))
    // multi-IDAT: 100 payload bytes at 64/chunk → 2 IDATs, 5 chunks
    val big = buildPngChunked(10, 10, Array.fill(100)(3.toByte))
    val fb = pngChunkWalk(big).get
    assert(fb.n_chunks == 5 && fb.idat_sum.contains(300L))
    // the walker really walks: m01's header-only parser agrees on dims
    assert(parseImageHeader(bytes).contains(ImageHeader("png", 5, 4, 3, 33)))
    // one flipped payload byte breaks that chunk's CRC → unknown
    val badCrc = bytes.clone()
    badCrc(bytes.length - 12 - 5) = (badCrc(bytes.length - 12 - 5) ^ 0x01).toByte
    assert(pngChunkWalk(badCrc).isEmpty)
    // truncation (no IEND) and trailing garbage both fail the walk
    assert(pngChunkWalk(bytes.take(bytes.length - 6)).isEmpty)
    assert(pngChunkWalk(bytes ++ Array[Byte](0)).isEmpty)
    // bad signature
    assert(pngChunkWalk(bytes.drop(1)).isEmpty)
    // degrade path through the batched extractor
    val out = extractPngHeaders(Seq(
      MediaRow(7L, bytes, "image/png", bytes.length),
      MediaRow(8L, badCrc, "image/png", badCrc.length)).toDS())
      .collect().map(r => r.doc_id -> r).toMap
    assert(out(7L).format == "png" && out(7L).n_chunks == 4)
    assert(out(8L).format == "unknown" && out(8L).idat_sum.isEmpty)
    // the registered table shape: geometry + chunk count + checksum
    // are the oracle's closed forms of (doc_id, text)
    val t = pngTable(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 3).collect().sortBy(_.doc_id)
    val walked = t.map(r => pngChunkWalk(r.media).get.copy(doc_id = r.doc_id))
    walked.foreach { wf =>
      val w = 4 + (wf.doc_id % 19).toInt
      val h = 4 + (wf.doc_id % 13).toInt
      assert(wf.width == w && wf.height == h)
      assert(wf.n_chunks == 3 + (w * h + 63) / 64, s"doc ${wf.doc_id}")
    }
  }

  test("GIF walk: hand-built animated container round-trips; structural violations degrade") {
    import operators.Multimodal._
    val sess = spark
    import sess.implicits._
    // 2 frames, 300-byte payload → 2 sub-blocks per frame (255 + 45)
    val payload = Array.tabulate(300)(i => ((i % 7) + 1).toByte)
    val psum = payload.map(_.toLong).sum
    val bytes = buildGif(6, 4, 2, payload)
    val f = gifWalk(bytes).get
    assert(f.format == "gif" && f.width == 6 && f.height == 4)
    assert(f.n_frames == 2 && f.n_subblocks == 4 && f.data_sum.contains(2 * psum))
    // single frame, short payload → one sub-block
    val one = gifWalk(buildGif(3, 3, 1, Array[Byte](1, 2, 3))).get
    assert(one.n_frames == 1 && one.n_subblocks == 1 && one.data_sum.contains(6L))
    // bad signature (GIF87a is NOT this builder's contract)
    val sig87 = bytes.clone(); sig87(4) = '7'.toByte
    assert(gifWalk(sig87).isEmpty)
    // trailing bytes after the 0x3B trailer fail the walk
    assert(gifWalk(bytes ++ Array[Byte](0)).isEmpty)
    // truncation (lost trailer) fails
    assert(gifWalk(bytes.take(bytes.length - 1)).isEmpty)
    // frame geometry must match the screen: flip a descriptor width.
    // descriptor of frame 1 sits right after LSD(13) + GCT(12) +
    // comment ext (3+5+1=9) + GCE(8): introducer at +42, width at +47
    val badGeo = bytes.clone(); badGeo(47) = (badGeo(47) ^ 0x01).toByte
    assert(gifWalk(badGeo).isEmpty)
    // degrade path through the batched extractor
    val out = extractGifHeaders(Seq(
      MediaRow(7L, bytes, "image/gif", bytes.length),
      MediaRow(8L, badGeo, "image/gif", badGeo.length)).toDS())
      .collect().map(r => r.doc_id -> r).toMap
    assert(out(7L).n_frames == 2 && out(8L).format == "unknown")
    // registered table shape: frame/sub-block counts and checksum are
    // the oracle's closed forms of (doc_id, text)
    val t = gifTable(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 3).collect().sortBy(_.doc_id)
    t.foreach { r =>
      val wf = gifWalk(r.media).get
      val id = r.doc_id
      assert(wf.width == 3 + (id % 17).toInt && wf.height == 3 + (id % 11).toInt)
      assert(wf.n_frames == 1 + (id % 3).toInt, s"doc $id frames")
    }
  }

  test("ZIP index: EOCD-anchored CRC-verified walk round-trips; header disagreement degrades") {
    import operators.Multimodal._
    val sess = spark
    import sess.implicits._
    val members = Seq(
      "a.txt" -> "hello zip".getBytes("US-ASCII"),
      "dir/b.bin" -> Array.tabulate(300)(_.toByte))
    val bytes = buildZip(members)
    val idx = parseZipIndex(bytes).get
    assert(idx.map(_.name) == Seq("a.txt", "dir/b.bin"))
    // offsets are local-header arithmetic: 30 + name length
    assert(idx(0).offset == 30 + 5 && idx(0).size == 9)
    assert(idx(1).offset == (30 + 5 + 9) + 30 + 9 && idx(1).size == 300)
    // md5 matches the member bytes
    val md5a = java.security.MessageDigest.getInstance("MD5")
      .digest("hello zip".getBytes("US-ASCII")).map("%02x".format(_)).mkString
    assert(idx(0).data_md5 == md5a)
    // one flipped data byte breaks that member's CRC → None
    val badCrc = bytes.clone()
    badCrc(36) = (badCrc(36) ^ 0x01).toByte
    assert(parseZipIndex(badCrc).isEmpty)
    // truncation loses the EOCD; trailing garbage shifts it
    assert(parseZipIndex(bytes.take(bytes.length - 1)).isEmpty)
    assert(parseZipIndex(bytes ++ Array[Byte](9)).isEmpty)
    // CD/local-header disagreement (zip-confusion surface): flip the
    // LOCAL header's size field only — the CD still agrees with EOCD
    val badLocal = bytes.clone()
    badLocal(18) = (badLocal(18) ^ 0x01).toByte
    assert(parseZipIndex(badLocal).isEmpty)
    // registered table shape: 3 members per doc, closed-form offsets
    val t = zipTable(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 2).collect().sortBy(_.doc_id)
    t.foreach { r =>
      val ms = parseZipIndex(r.media).get.sortBy(_.name)
      val dl = r.doc_id.toString.length
      assert(ms.map(_.name) == Seq(s"${r.doc_id}/label.cls",
        s"${r.doc_id}/meta.json", s"${r.doc_id}/text.txt"))
      assert(ms(2).offset == 30 + dl + 9, s"doc ${r.doc_id} text offset")
    }
  }

  test("SRT cue walk: build/parse round-trips; continuity, overlap, grammar violations degrade") {
    import operators.Multimodal._
    // 3 one-word cues at the 500/400 grid
    val srt = buildSrt(Seq("hello", "srt", "world"))
    val f = parseSrt(srt).get
    assert(f.n_cues == 3 && f.speech_ms == 1200 && f.span_ms == 1400)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest("hello srt world".getBytes("US-ASCII")).map("%02x".format(_)).mkString
    assert(f.text_md5 == md5)
    // a hand-written multi-line cue with an hour-scale timestamp parses
    val hand = "1\n01:02:03,450 --> 01:02:05,000\nline one\nline two\n\n" +
      "2\n01:02:05,000 --> 01:02:06,500\nnext\n\n"
    val fh = parseSrt(hand).get
    assert(fh.n_cues == 2 && fh.speech_ms == 1550 + 1500 && fh.span_ms == 3050)
    assert(fh.text_md5 == java.security.MessageDigest.getInstance("MD5")
      .digest("line one line two next".getBytes("US-ASCII")).map("%02x".format(_)).mkString)
    // index skip (1,3) fails the continuity rule
    assert(parseSrt(srt.replace("\n3\n", "\n4\n")).isEmpty)
    // overlapping cues (start < previous end) fail
    assert(parseSrt(
      "1\n00:00:00,000 --> 00:00:01,000\na\n\n2\n00:00:00,500 --> 00:00:02,000\nb\n\n").isEmpty)
    // start >= end fails
    assert(parseSrt("1\n00:00:01,000 --> 00:00:01,000\na\n\n").isEmpty)
    // malformed timestamps: dot millis, short field, minutes > 59
    assert(parseSrt("1\n00:00:00.000 --> 00:00:01,000\na\n\n").isEmpty)
    assert(parseSrt("1\n0:00:00,000 --> 00:00:01,000\na\n\n").isEmpty)
    assert(parseSrt("1\n00:60:00,000 --> 00:60:01,000\na\n\n").isEmpty)
    // a cue without text fails
    assert(parseSrt("1\n00:00:00,000 --> 00:00:01,000\n\n").isEmpty)
    // empty input fails
    assert(parseSrt("").isEmpty && parseSrt("\n\n").isEmpty)
    // registered table shape: cue count == the c06 whitespace-token
    // count, the closed form the oracle replays
    val t = srtTable(spark, "/root/testdata/sf0.001")
      .filter(col("_1") < 3).collect().sortBy(_._1)
    t.foreach { case (id, s) =>
      val wf = parseSrt(s).get
      assert(wf.speech_ms == 400L * wf.n_cues, s"doc $id")
      assert(wf.span_ms == 500L * (wf.n_cues - 1) + 400, s"doc $id")
    }
  }

  test("resizePpm: NN sampling exact on hand-built rasters, identity at same dims, degrade path") {
    val sess = spark
    import sess.implicits._
    // 2x2 source: pixels (r,g,b) = p00(0,1,2) p10(10,11,12)
    //                              p01(20,21,22) p11(30,31,32)
    val raster = Array.tabulate(12)(i => ((i / 3) * 10 + i % 3).toByte)
    val src = Multimodal.buildPpm(2, 2, raster)
    val ds = Seq(Multimodal.MediaRow(1L, src, "x", src.length)).toDS()
    // upscale to 4x3: sx = x*2/4 = [0,0,1,1]; sy = y*2/3 = [0,0,1]
    // -> rows y=0,1 sample source row 0, y=2 samples row 1
    val t = Multimodal.resizePpm(ds, 4, 3).collect().head
    assert(t.width == 2 && t.height == 2 && t.tw == 4 && t.th == 3)
    // checksum: 8 samples of row0 pixels (p00,p00,p10,p10 twice) +
    // 4 samples of row1 (p01,p01,p11,p11)
    val p = (i: Int) => (0 to 2).map(c => (i * 10 + c).toLong).sum // pixel byte sum
    val expectCs = 2L * (2 * p(0) + 2 * p(1)) + (2 * p(2) + 2 * p(3))
    assert(t.checksum == expectCs, s"checksum ${t.checksum} want $expectCs")
    // mean_r: 12 samples of channel 0: rows0/1: 0,0,10,10 twice; row2: 20,20,30,30
    assert(t.mean_r.contains((2 * (0 + 0 + 10 + 10) + (20 + 20 + 30 + 30)) / 12.0))
    // identity resize: 2x2 -> 2x2 reproduces the source exactly
    val id = Multimodal.resizePpm(ds, 2, 2).collect().head
    assert(id.checksum == raster.map(_.toLong & 0xff).sum)
    assert(id.mean_r.contains((0 + 10 + 20 + 30) / 4.0))
    // unparseable payload degrades, never throws
    val bad = Seq(Multimodal.MediaRow(2L, "nope".getBytes, "x", 4)).toDS()
    val d = Multimodal.resizePpm(bad, 4, 3).collect().head
    assert(d.tw == 0 && d.checksum == 0L && d.mean_r.isEmpty)
  }

  test("PCM decode: golden stereo frames give exact peak/energy/zero-crossings") {
    val sess = spark
    import sess.implicits._
    // stereo, 2 frames: ch0 = [1000, -1000] (one sign change),
    // ch1 = [-2, 3] (one sign change) — interleaved LE i16
    def le(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val data = le(1000) ++ le(-2) ++ le(-1000) ++ le(3)
    val wav = Multimodal.buildWav(2, 8000, 16, data)
    val f = Multimodal.extractPcmFeatures(
      Seq(Multimodal.MediaRow(1L, wav, "audio/wav", wav.length)).toDS()).collect().head
    assert(f.channels == 2 && f.sample_rate == 8000 && f.n_frames == 2L)
    assert(f.peak == 1000)
    assert(f.sum_sq == 1000L * 1000 + 2L * 2 + 1000L * 1000 + 3L * 3)
    assert(f.zero_cross == 2L)
    assert(math.abs(f.rms - math.sqrt(f.sum_sq.toDouble / 4)) < 1e-12)
    // trailing odd byte is ignored, not mis-decoded as a frame
    val odd = Multimodal.buildWav(1, 8000, 16, le(7) ++ Array(1.toByte))
    val g = Multimodal.extractPcmFeatures(
      Seq(Multimodal.MediaRow(2L, odd, "audio/wav", odd.length)).toDS()).collect().head
    assert(g.n_frames == 1L && g.sum_sq == 49L)
    // 8-bit payloads and garbage degrade to zeroed stats, never throw
    val eightBit = Multimodal.buildWav(1, 8000, 8, Array[Byte](1, 2))
    val h = Multimodal.extractPcmFeatures(
      Seq(Multimodal.MediaRow(3L, eightBit, "audio/wav", eightBit.length),
        Multimodal.MediaRow(4L, "nope".getBytes, "x", 4)).toDS()).collect()
    assert(h.forall(x => x.channels == 0 && x.n_frames == 0L))
    // round-trip: the table's encoded bytes decode back to pcmVal
    val row = Multimodal.pcmWavTable(spark, dir).filter(_.doc_id == 3L).head()
    val ff = Multimodal.extractPcmFeatures(Seq(row).toDS()).collect().head
    val n = Multimodal.pcmFrames(3L) * 2 // doc 3 is stereo (1 + 3%2)
    val vals = (0L until n.toLong).map(k => Multimodal.pcmVal(3L, k))
    assert(ff.peak == vals.map(math.abs).max)
    assert(ff.sum_sq == vals.map(v => v.toLong * v).sum)
  }

  test("resamplePcm: identity at 8k, exact midpoint interpolation, stereo ch0, round-trip") {
    val sess = spark
    import sess.implicits._
    def le(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def run(id: Long, wav: Array[Byte]) = Multimodal.resamplePcm(
      Seq(Multimodal.MediaRow(id, wav, "audio/wav", wav.length)).toDS())
      .collect().head
    // 8 kHz → 8 kHz is the identity on the ×8000 grid
    val idWav = Multimodal.buildWav(1, 8000, 16, le(5) ++ le(-7) ++ le(9))
    val a = run(1L, idWav)
    assert(a.n_in == 3 && a.n_out == 3)
    assert(a.sum_q == (5L - 7 + 9) * 8000 && a.peak_q == 9L * 8000)
    assert(a.sum_abs_q == (5L + 7 + 9) * 8000)
    // 16 kHz: every second sample, rem always 0
    val b = run(2L, Multimodal.buildWav(1, 16000, 16,
      le(0) ++ le(1600) ++ le(-3200) ++ le(800)))
    assert(b.n_out == 2 && b.sum_q == -3200L * 8000 && b.peak_q == 3200L * 8000)
    // 12 kHz: j=1 falls exactly between samples 1 and 2 (rem 4000)
    val c = run(3L, Multimodal.buildWav(1, 12000, 16,
      le(0) ++ le(1000) ++ le(2000)))
    assert(c.n_out == 2)
    assert(c.sum_q == 0L + (1000L * 4000 + 2000L * 4000))
    // stereo: channel 0 only (100, 200), ch1 ignored
    val d = run(4L, Multimodal.buildWav(2, 8000, 16,
      le(100) ++ le(-5) ++ le(200) ++ le(-6)))
    assert(d.n_out == 2 && d.sum_q == 300L * 8000 && d.sum_abs_q == 300L * 8000)
    // garbage degrades to a zeroed row, never throws
    val e = run(5L, "nope".getBytes)
    assert(e.sample_rate == 0 && e.n_out == 0)
    // round-trip vs an independent replay on the real corpus bytes
    val row = Multimodal.pcmWavTable(spark, dir).filter(_.doc_id == 3L).head()
    val f = Multimodal.resamplePcm(Seq(row).toDS()).collect().head
    val ch = 1 + (3 % 2); val sr = 16000 // doc 3: stereo, (3//2)%4=1
    val n = Multimodal.pcmFrames(3L)
    val v = (0 until n).map(fr => Multimodal.pcmVal(3L, fr.toLong * ch))
    val nOut = ((n - 1).toLong * 8000 / sr + 1).toInt
    var sum = 0L; var peak = 0L
    (0 until nOut).foreach { j =>
      val num = j.toLong * sr
      val i = (num / 8000).toInt; val rem = num % 8000
      val q = v(i).toLong * (8000 - rem) +
        (if (rem > 0) v(i + 1).toLong * rem else 0L)
      sum += q; if (math.abs(q) > peak) peak = math.abs(q)
    }
    assert(f.sample_rate == sr && f.n_in == n && f.n_out == nOut)
    assert(f.sum_q == sum && f.peak_q == peak)
  }

  test("extractPpmPatches: ragged 5x3 grid exact sums, mass conservation, corpus round-trip") {
    val sess = spark
    import sess.implicits._
    // 5×3 raster, byte j = j: grid is 2 rows × 3 cols of 2×2 patches,
    // right/bottom edges ragged
    val raster = Array.tabulate(45)(j => j.toByte)
    val wav = Multimodal.buildPpm(5, 3, raster)
    val out = Multimodal.extractPpmPatches(
        Seq(Multimodal.MediaRow(1L, wav, "image/ppm", wav.length)).toDS())
      .collect().map(p => (p.patch_row, p.patch_col) ->
        (p.n_px, p.sum_r, p.sum_g, p.sum_b)).toMap
    assert(out.size == 6)
    // independent replay over (x, y)
    val exp = (for { y <- 0 until 3; x <- 0 until 5 } yield (y / 2, x / 2, x, y))
      .groupBy(t => (t._1, t._2)).map { case (k, px) =>
        def s(c: Int) = px.map { case (_, _, x, y) => 3 * (y * 5 + x) + c }.sum.toLong
        k -> (px.length.toLong, s(0), s(1), s(2))
      }
    assert(out == exp)
    // hand corners: full patch 4 px, right edge 2, bottom-right 1
    assert(out((0, 0))._1 == 4L && out((0, 2))._1 == 2L && out((1, 2))._1 == 1L)
    assert(out((0, 0))._2 == 0L + 3 + 15 + 18)
    // mass conservation: patch sums rebuild the whole raster
    assert(out.values.map(_._1).sum == 15L)
    assert(out.values.map(v => v._2 + v._3 + v._4).sum ==
      raster.map(_.toInt & 0xff).map(_.toLong).sum)
    // corpus round-trip: doc 2's patches vs the generator closed form
    val row = Multimodal.ppmTable(spark, dir).filter(_.doc_id == 2L).head()
    val f = Multimodal.extractPpmPatches(Seq(row).toDS()).collect()
    val (w, h) = (Multimodal.ppmWidth(2L), Multimodal.ppmHeight(2L))
    assert(f.map(_.n_px).sum == w.toLong * h)
    assert(f.map(p => (p.patch_row, p.patch_col)).distinct.length == f.length)
  }

  test("segmentPcm: hand runs, boundary at thr, segments tile the frames, corpus replay") {
    val sess = spark
    import sess.implicits._
    def le(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    // frames: 100 (sil), 9000 (v), -9000 (v), 8192 (v, boundary IN),
    // -8191 (sil), 0 (sil) -> runs: sil[0,1), voiced[1,4), sil[4,6)
    val wav = Multimodal.buildWav(1, 8000, 16,
      le(100) ++ le(9000) ++ le(-9000) ++ le(8192) ++ le(-8191) ++ le(0))
    val out = Multimodal.segmentPcm(
        Seq(Multimodal.MediaRow(1L, wav, "audio/wav", wav.length)).toDS())
      .collect().sortBy(_.seg_idx)
      .map(s => (s.seg_idx, s.voiced, s.start_frame, s.n_frames, s.peak))
    assert(out.toSeq == Seq(
      (0, 0, 0L, 1L, 100), (1, 1, 1L, 3L, 9000), (2, 0, 4L, 2L, 8191)))
    // corpus replay: segments tile [0, n_frames) with alternating kinds
    val row = Multimodal.pcmWavTable(spark, dir).filter(_.doc_id == 5L).head()
    val segs = Multimodal.segmentPcm(Seq(row).toDS()).collect().sortBy(_.seg_idx)
    val n = Multimodal.pcmFrames(5L)
    assert(segs.head.start_frame == 0L && segs.map(_.n_frames).sum == n.toLong)
    segs.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.start_frame + a.n_frames == b.start_frame)
        assert(a.voiced != b.voiced) // maximal runs alternate
      case _ =>
    }
    // independent per-frame replay (channel 0 of stereo doc 5)
    val ch = 1 + (5 % 2).toInt
    val kinds = (0 until n).map(f =>
      if (math.abs(Multimodal.pcmVal(5L, f.toLong * ch)) >= 8192) 1 else 0)
    segs.foreach { s =>
      (s.start_frame until s.start_frame + s.n_frames).foreach(f =>
        assert(kinds(f.toInt) == s.voiced))
    }
  }

  test("ppmAHash: gradient golden hash, pattern survives dimension change, uniform is zero") {
    import Multimodal._
    // left half dark (10), right half bright (200): bright cells are
    // gc∈{2,3} for every gr -> bits 2,3,6,7,10,11 = 0xCCC
    def mk(w: Int, h: Int): Array[Byte] = {
      val raster = Array.tabulate(3 * w * h) { j =>
        val x = (j / 3) % w
        if (x < w / 2) 10.toByte else 200.toByte
      }
      buildPpm(w, h, raster)
    }
    assert(ppmAHash(mk(8, 6)).contains(0xCCCL))
    // same pattern at different dimensions -> SAME perceptual hash,
    // though the byte payloads differ (the point of the operator)
    assert(ppmAHash(mk(4, 3)).contains(0xCCCL))
    // uniform image: no cell exceeds the mean strictly -> hash 0
    assert(ppmAHash(buildPpm(4, 3, Array.fill(36)(77.toByte))).contains(0L))
    // unparseable/truncated degrade to None, never throw
    assert(ppmAHash("P5\nnope".getBytes).isEmpty)
    assert(ppmAHash(buildPpm(4, 3, Array[Byte](1, 2, 3))).isEmpty)
  }

  test("recallAtK: identity is 1.0, partial overlap counts per query") {
    val sess = spark
    import sess.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L),
      (2L, 20L), (2L, 21L)).toDF("query_id", "neighbor_id")
    // approx: query 1 finds 2 of 4 (plus a non-exact extra that must
    // NOT count), query 2 finds none
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L), (2L, 77L))
      .toDF("query_id", "neighbor_id")
    val r = Similarity.recallAtK(exact, approx).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(1L) == ((4L, 2L, 0.5)))
    assert(r(2L) == ((2L, 0L, 0.0)))
    // an index evaluated against itself has perfect recall
    assert(Similarity.recallAtK(exact, exact).collect()
      .forall(_.getDouble(3) == 1.0))
  }

  test("pcaPower: axis-aligned exact case, dominant axis wins, invariance") {
    val sess = spark
    import sess.implicits._
    // two antipodal x-axis unit vectors: mean 0, cov = diag(2e12, 0)
    // -> loadings exactly (1e6, 0), sign fixed by the all-ones start
    val ax = Seq((1L, Seq(3.0, 0.0)), (2L, Seq(-5.0, 0.0)))
      .toDF("vec_id", "e")
    val out = Similarity.pcaPower(ax, iters = 4)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(0 -> 1000000L, 1 -> 0L))
    // x-spread dominates y-spread: top component concentrates on dim 0
    val mix = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(-1.0, 0.0)),
      (3L, Seq(0.0, 1.0))).toDF("vec_id", "e")
    val m = Similarity.pcaPower(mix, iters = 8)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(m(0) == 1000000L && math.abs(m(1)) < 1000L)
    // deterministic 3-D cloud: identical loadings at any partition count
    val cloud = (1 to 40).map(i =>
      (i.toLong, Seq(i.toDouble, (i * i % 17).toDouble, 1.0)))
      .toDF("vec_id", "e")
    val r1 = Similarity.pcaPower(cloud.repartition(1), 6)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val r8 = Similarity.pcaPower(cloud.repartition(8), 6)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(r1 == r8)
  }

  test("dsirWeights: target-like docs score positive, raw-like negative, math matches") {
    val sess = spark
    import sess.implicits._
    // target docs are all "foo bar"; raw-only docs are all "qux zap".
    // Counts must DOMINATE the add-one smoothing mass (64 buckets) for
    // the sign intuition to hold — with 2-token docs the smoothing
    // dilutes the tiny target LM and everything scores raw-like (the
    // first draft of this test proved that arithmetic the hard way) —
    // so each doc repeats its pair 50x. foo/bar/qux/zap land in
    // distinct buckets at 64 bins (6/19/20/41).
    val rep = Array.fill(50)("foo bar").mkString(" ")
    val rawRep = Array.fill(50)("qux zap").mkString(" ")
    val docs = Seq(
      (1L, rep, "t"), (2L, rep, "t"),
      (3L, rawRep, "r"), (4L, rep, "r"), (5L, "", "r"))
      .toDF("doc_id", "text", "source")
    val out = graft.operators.TextOps.dsirWeights(docs, col("source") === "t", 64)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1).getAs[Boolean]("is_target"))
    assert(out(1).getAs[Double]("logw") > 0 && out(1).getAs[Boolean]("selected"))
    assert(out(4).getAs[Double]("logw") > 0) // target words, raw source
    assert(out(3).getAs[Double]("logw") < 0 && !out(3).getAs[Boolean]("selected"))
    assert(out(5).getAs[Long]("n_tokens") == 0 && out(5).isNullAt(
      out(5).fieldIndex("logw")))
    // closed form for doc 3: target LM foo=100, bar=100, tt=200; raw
    // LM foo=150, bar=150, qux=50, zap=50, rt=400. Per qux/zap token:
    //   ln((0+1)/(200+64)) - ln((50+1)/(400+64)),  100 tokens total
    val expected = 100.0 * (math.log(1.0 / 264.0) - math.log(51.0 / 464.0))
    assert(math.abs(out(3).getAs[Double]("logw") - expected) < 5e-4,
      s"${out(3).getAs[Double]("logw")} vs $expected")
  }
}
