package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/**
 * Similarity search over an embedding column (`Array[Float]` cast to
 * double): brute-force cosine top-k (n01) as the exact baseline, and
 * random-hyperplane LSH-bucketed ANN (n02) as the scale path.
 *
 * Scale shapes:
 *  - n01 is O(|queries| · n): fine for a bounded query set against a
 *    large corpus (queries broadcast, corpus streams through), wrong
 *    for all-pairs — that's what n02 is for.
 *  - n02 buckets both sides on (band, signature) from deterministic
 *    ±1 hyperplanes; only same-bucket candidates shuffle and get an
 *    exact cosine, then a per-query top-k window. Probes ≪ n².
 *    Band/bit counts are corpus-density-dependent (8 bands × 3 bits
 *    here, tuned for ~0.3–0.5 cosine neighbors in 64 dims).
 */
object Similarity {

  /** Natural embeddings with double vectors (no injected twins). */
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("e"))

  /** Brute-force cosine top-k for a query subset. Norms project once
    * per row; the corpus streams through the broadcast join. */
  def knnBrute(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val withN = Dedup.withNorm(emb)
    val q = withN.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
    val n = withN.select(col("vec_id").as("neighbor_id"), col("e").as("ne"), col("nrm").as("nn"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(q).join(n, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Dedup.dot(col("qe"), col("ne")) / (col("qn") * col("nn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), round(col("cos"), 4).as("cos"))
  }

  def n01KnnBrute(spark: SparkSession, dir: String): DataFrame =
    knnBrute(embeddings(spark, dir), col("vec_id") < 25, k = 5)
      .orderBy("query_id", "rnk")

  /**
   * Radius (threshold) search: every corpus vector within cosine ≥
   * `tau` of each query — retrieval's "give me everything similar
   * enough" counterpart to n01's fixed top-k. Same broadcast shape
   * (bounded query set broadcasts, corpus streams) but with a
   * threshold FILTER instead of a top-k window, so the plan has no
   * window and no shuffle beyond the presentation sort — at 100 TB
   * it is one streaming pass over the corpus per query batch.
   */
  def radiusSearch(emb: DataFrame, queryPred: Column, tau: Double): DataFrame = {
    val withN = Dedup.withNorm(emb)
    val q = withN.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
    val n = withN.select(col("vec_id").as("neighbor_id"), col("e").as("ne"), col("nrm").as("nn"))
    broadcast(q).join(n, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Dedup.dot(col("qe"), col("ne")) / (col("qn") * col("nn")))
      .filter(col("cos") >= tau)
      .select(col("query_id"), col("neighbor_id"), Norm.r4(col("cos")).as("cos"))
  }

  def n05RadiusSearch(spark: SparkSession, dir: String): DataFrame =
    radiusSearch(embeddings(spark, dir), col("vec_id") < 25, tau = 0.3)
      .orderBy("query_id", "neighbor_id")

  // ------------------------------------------------------------ n02 LSH

  /** Deterministic ±1 hyperplane entries (splitmix bit stream). */
  private[graft] def hyperplanes(planes: Int, dims: Int, seed: Long): Array[Array[Double]] = {
    val params = Dedup.permParams(planes * dims, seed)
    Array.tabulate(planes, dims)((p, d) => if ((params(p * dims + d)._2 & 1L) == 1L) 1.0 else -1.0)
  }

  /**
   * SQL-expressible ±1 hyperplane entries (the d04 trick that earned
   * SimHash its full oracle): the sign is bit 7 of a SQUARED
   * multiplicative hash of the flat (plane, dim) index — plain
   * 64-bit-safe integer arithmetic a DuckDB oracle reproduces
   * verbatim, unlike the splitmix stream above. The squaring matters:
   * the pre-square values walk an arithmetic progression mod the
   * prime, whose low bits alternate near-deterministically; squaring
   * mod the prime scrambles them into a balanced, uncorrelated ±1
   * family. All intermediates < 2⁶² (ANSI-overflow-safe).
   */
  private[graft] def polyHyperplanes(planes: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(planes, dims) { (p, d) =>
      val i = p.toLong * dims + d + 1
      val h = (i * 2654435761L) % 1000000007L
      if ((((h * h) % 1000000007L >> 7) & 1L) == 1L) 1.0 else -1.0
    }

  /** Sign signature of a vector under the hyperplanes, packed to Int. */
  private[graft] def signBits(e: Seq[Double], hp: Array[Array[Double]]): Int = {
    var sig = 0
    var p = 0
    while (p < hp.length) {
      var dot = 0.0
      var d = 0
      val plane = hp(p)
      val lim = math.min(plane.length, e.length)
      while (d < lim) { dot += plane(d) * e(d); d += 1 }
      if (dot > 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  /**
   * ANN top-k: LSH candidate generation (same (band, signature) bucket
   * in any band) + exact cosine re-rank. Recall vs n01 is spec-checked;
   * the planes are `polyHyperplanes`, so the whole query — signatures,
   * band buckets, candidates, re-rank — also replays under the DuckDB
   * hash gate.
   */
  def annLsh(emb: DataFrame, queryPred: Column, k: Int,
      bands: Int = 8, bitsPerBand: Int = 3, dims: Int = 64): DataFrame = {
    val hp = polyHyperplanes(bands * bitsPerBand, dims)
    val sigUdf = udf((e: Seq[Double]) => signBits(e, hp))
    val mask = (1 << bitsPerBand) - 1
    // signature table referenced by both join sides — materialize once;
    // localCheckpoint (not cache) so blocks free with the plan's GC
    val banded = Dedup.withNorm(emb.withColumn("sig", sigUdf(col("e"))))
      .select(col("vec_id"), col("e"), col("nrm"), col("sig"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("sig"), b * bitsPerBand).bitwiseAND(lit(mask)).as("bv"))): _*)).as("bk"))
      .select(col("vec_id"), col("e"), col("nrm"), col("bk.band"), col("bk.bv"))
      .localCheckpoint(true)
    val q = banded.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"),
        col("band"), col("bv"))
    val cand = q.join(banded.select(col("vec_id").as("neighbor_id"), col("e").as("ne"),
        col("nrm").as("nn"), col("band"), col("bv")), Seq("band", "bv"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "qe", "ne", "qn", "nn")
      .distinct()
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("cos", Dedup.dot(col("qe"), col("ne")) / (col("qn") * col("nn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), round(col("cos"), 4).as("cos"))
  }

  def n02AnnLsh(spark: SparkSession, dir: String): DataFrame =
    annLsh(embeddings(spark, dir), col("vec_id") < 25, k = 5)
      .orderBy("query_id", "rnk")

  // ------------------------------------------------------------ n03 IVF

  /**
   * Spherical k-means coarse quantizer (the IVF codebook): Lloyd
   * iterations where ONLY the k×dims centroid table ever leaves the
   * executors — assignment is a broadcast argmax-dot projection over
   * the corpus, the per-list mean reduces map-side via a posexplode +
   * (list, dim) aggregation, and the collected model (k·dims doubles,
   * same altitude as IRLS's beta) is re-broadcast for the next round.
   * Deterministic up to floating-point sum order: seeds are the k
   * lowest-id vectors, fixed iteration count, no RNG — but the
   * per-list means merge double partials in shuffle-fetch order, so
   * re-runs on a real cluster can differ in the last ulp (and a
   * near-boundary vector may swap lists). Treat the codebook as a
   * model artifact: train once, persist, reuse — not as a value that
   * re-derives bit-identically.
   */
  private[graft] def ivfCentroids(emb: DataFrame, k: Int, iters: Int): Array[Array[Double]] =
    ivfCentroidsFromUnit(
      Dedup.withNorm(emb)
        .select(col("vec_id"), transform(col("e"), x => x / col("nrm")).as("u"))
        .localCheckpoint(true), // read once per Lloyd iteration
      k, iters)

  private def ivfCentroidsFromUnit(unit: DataFrame, k: Int, iters: Int): Array[Array[Double]] = {
    var cents = unit.orderBy("vec_id").limit(k)
      .collect().map(_.getSeq[Double](1).toArray)
    for (_ <- 1 to iters) {
      val assignUdf = nearestCentroidUdf(cents)
      val sums = unit
        .withColumn("cid", assignUdf(col("u")))
        .select(col("cid"), posexplode(col("u")).as(Seq("dim", "v")))
        .groupBy("cid", "dim").agg(sum("v").as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2) / r.getLong(3)
      }
      // re-normalize to the sphere (spherical k-means step)
      cents = next.map { c =>
        val n = math.sqrt(c.map(x => x * x).sum)
        if (n > 0) c.map(_ / n) else c
      }
    }
    cents
  }

  private def nearestCentroidUdf(cents: Array[Array[Double]]) =
    udf((u: Seq[Double]) => {
      var best = 0; var bestDot = Double.NegativeInfinity
      var c = 0
      while (c < cents.length) {
        var dot = 0.0; var d = 0
        val cent = cents(c)
        val lim = math.min(cent.length, u.length)
        while (d < lim) { dot += cent(d) * u(d); d += 1 }
        if (dot > bestDot) { bestDot = dot; best = c }
        c += 1
      }
      best
    })

  private def nearestCentroidsUdf(cents: Array[Array[Double]], nprobe: Int) =
    udf((u: Seq[Double]) =>
      cents.indices.map { c =>
        var dot = 0.0; var d = 0
        val cent = cents(c)
        val lim = math.min(cent.length, u.length)
        while (d < lim) { dot += cent(d) * u(d); d += 1 }
        (-dot, c)
      }.sorted.take(nprobe).map(_._2))

  /**
   * IVF ANN top-k: the corpus is partitioned into k inverted lists by
   * nearest centroid; each query probes its `nprobe` closest lists and
   * exact-cosine re-ranks only those candidates. Candidates/query ≈
   * n·nprobe/k instead of n, and the probe is an equi-join on the list
   * id — the standard IVF-flat trade (recall vs probes) with Spark
   * doing what it is good at: one broadcast (centroids inside the
   * UDFs), one equi-join, one per-query top-k window.
   */
  def annIvf(emb: DataFrame, queryPred: Column, k: Int,
      lists: Int = 16, nprobe: Int = 4, iters: Int = 4): DataFrame = {
    // one scan + one checkpointed normalized table feeds codebook
    // training, corpus assignment, AND query probing
    val withN = Dedup.withNorm(emb)
      .withColumn("u", transform(col("e"), x => x / col("nrm")))
      .localCheckpoint(true)
    val cents = ivfCentroidsFromUnit(withN.select("vec_id", "u"), lists, iters)
    val corpus = withN
      .withColumn("cid", nearestCentroidUdf(cents)(col("u")))
      .select(col("vec_id").as("neighbor_id"), col("e").as("ne"), col("nrm").as("nn"), col("cid"))
    val queries = withN.filter(queryPred)
      .withColumn("cid", explode(nearestCentroidsUdf(cents, nprobe)(col("u"))))
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"), col("cid"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    queries.join(corpus, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Dedup.dot(col("qe"), col("ne")) / (col("qn") * col("nn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), round(col("cos"), 4).as("cos"))
  }

  /** n03: IVF-flat ANN — the brief's "IVF variant as the scale path"
    * alongside n02's LSH. Rows + recall spec vs n01: unlike n02's
    * polynomial planes, a k-means codebook (iterating FP means) is a
    * trained model artifact, not SQL-re-derivable. */
  def n03AnnIvf(spark: SparkSession, dir: String): DataFrame =
    annIvf(embeddings(spark, dir), col("vec_id") < 25, k = 5)
      .orderBy("query_id", "rnk")

  /**
   * Per-label embedding centroids as (label, dim, value) rows — the
   * class-prototype / cluster-statistics primitive (nearest-centroid
   * classification, drift monitoring, IVF seeding). posexplode +
   * (label, dim) hash aggregate: the per-dimension means reduce
   * map-side, so the ONE shuffle carries |labels|·dims partial sums,
   * not vectors. Long form (not reassembled arrays) keeps the output
   * joinable and the aggregation codegen-friendly.
   */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("e")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(round(avg("v"), 4).as("centroid"), count(lit(1)).as("n_vectors"))

  /** n04: 64-dim centroid of every label over the embeddings table. */
  def n04LabelCentroids(spark: SparkSession, dir: String): DataFrame =
    labelCentroids(embeddings(spark, dir))
      .orderBy("label", "dim")

  // --------------------------------------------------------- oracle SQL

  val oracleSql: Map[String, String] = Map(
    "n04_label_centroids" ->
      """WITH e AS (
        |  SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |), x AS (
        |  SELECT label, unnest(e) AS v, generate_subscripts(e, 1) - 1 AS dim FROM e
        |)
        |SELECT label, CAST(dim AS INT) AS dim,
        |  round(avg(v), 4) + 0 AS centroid,
        |  count(*) AS n_vectors
        |FROM x GROUP BY 1, 2 ORDER BY label, dim""".stripMargin,
    "n05_radius_search" ->
      """WITH emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |  WHERE list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)) > 0
        |),
        |q AS (SELECT vec_id AS query_id, e AS qe FROM emb WHERE vec_id < 25)
        |SELECT q.query_id, n.vec_id AS neighbor_id,
        |  round(list_cosine_similarity(q.qe, n.e), 4) + 0 AS cos
        |FROM q JOIN emb n ON q.query_id <> n.vec_id
        |WHERE list_cosine_similarity(q.qe, n.e) >= 0.3
        |ORDER BY query_id, neighbor_id""".stripMargin,
    "n01_knn_brute" ->
      """WITH emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |  -- mirror knnBrute's zero-norm filter (no cosine direction)
        |  WHERE list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)) > 0
        |),
        |q AS (SELECT vec_id AS query_id, e AS qe FROM emb WHERE vec_id < 25),
        |s AS (
        |  SELECT q.query_id, n.vec_id AS neighbor_id,
        |    list_cosine_similarity(q.qe, n.e) AS cos
        |  FROM q JOIN emb n ON q.query_id <> n.vec_id
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        |  FROM s
        |)
        |SELECT query_id, neighbor_id, rnk, round(cos, 4) + 0 AS cos
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    // full LSH replay: the same polyHyperplanes sign matrix (squared
    // multiplicative hash of the flat plane*64+dim index), the same
    // 8-band × 3-bit buckets, the same candidate join + exact cosine
    // re-rank — so the ANN path itself sits under the hash gate
    "n02_ann_lsh" ->
      """WITH emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |  WHERE list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)) > 0
        |), planes AS (
        |  SELECT p.p AS p, list_transform(range(0, 64), d ->
        |    CASE WHEN ((((((p.p * 64 + d + 1) * 2654435761) % 1000000007)
        |                * (((p.p * 64 + d + 1) * 2654435761) % 1000000007))
        |                % 1000000007 >> 7) & 1) = 1
        |      THEN 1.0 ELSE -1.0 END) AS pv
        |  FROM (SELECT unnest(range(0, 24)) AS p) p
        |), sig AS (
        |  SELECT e.vec_id,
        |    CAST(sum(CASE WHEN list_dot_product(e.e, pl.pv) > 0
        |      THEN (CAST(1 AS BIGINT) << pl.p) ELSE 0 END) AS BIGINT) AS sig
        |  FROM emb e, planes pl GROUP BY 1
        |), banded AS (
        |  SELECT s.vec_id, b.b AS band, (s.sig >> (b.b * 3)) & 7 AS bv
        |  FROM sig s, (SELECT unnest(range(0, 8)) AS b) b
        |), cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
        |  FROM banded q JOIN banded n ON q.band = n.band AND q.bv = n.bv
        |  WHERE q.vec_id < 25 AND q.vec_id <> n.vec_id
        |), scored AS (
        |  SELECT c.query_id, c.neighbor_id, list_cosine_similarity(a.e, b.e) AS cos
        |  FROM cand c
        |  JOIN emb a ON a.vec_id = c.query_id
        |  JOIN emb b ON b.vec_id = c.neighbor_id
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        |  FROM scored
        |)
        |SELECT query_id, neighbor_id, rnk, round(cos, 4) + 0 AS cos
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
  )
}
