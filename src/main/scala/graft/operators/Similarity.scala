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
    val withN = emb.withColumn("nrm", Dedup.norm2(col("e")))
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

  // ------------------------------------------------------------ n02 LSH

  /** Deterministic ±1 hyperplane entries (splitmix bit stream). */
  private[graft] def hyperplanes(planes: Int, dims: Int, seed: Long): Array[Array[Double]] = {
    val params = Dedup.permParams(planes * dims, seed)
    Array.tabulate(planes, dims)((p, d) => if ((params(p * dims + d)._2 & 1L) == 1L) 1.0 else -1.0)
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
   * in any band) + exact cosine re-rank. Recall vs n01 is spec-checked.
   */
  def annLsh(emb: DataFrame, queryPred: Column, k: Int,
      bands: Int = 8, bitsPerBand: Int = 3, dims: Int = 64): DataFrame = {
    val hp = hyperplanes(bands * bitsPerBand, dims, 7L)
    val sigUdf = udf((e: Seq[Double]) => signBits(e, hp))
    val mask = (1 << bitsPerBand) - 1
    // signature table referenced by both join sides — materialize once;
    // localCheckpoint (not cache) so blocks free with the plan's GC
    val banded = emb.withColumn("sig", sigUdf(col("e")))
      .withColumn("nrm", Dedup.norm2(col("e")))
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

  // --------------------------------------------------------- oracle SQL

  val oracleSql: Map[String, String] = Map(
    "n01_knn_brute" ->
      """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |q AS (SELECT vec_id AS query_id, e AS qe FROM emb WHERE vec_id < 25),
        |s AS (
        |  SELECT q.query_id, n.vec_id AS neighbor_id,
        |    list_cosine_similarity(q.qe, n.e) AS cos
        |  FROM q JOIN emb n ON q.query_id <> n.vec_id
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        |  FROM s
        |)
        |SELECT query_id, neighbor_id, rnk, round(cos, 4) AS cos
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
  )
}
