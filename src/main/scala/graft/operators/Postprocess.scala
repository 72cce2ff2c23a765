package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/**
 * Postprocessing operators mirroring the reference's postprocessing
 * stage (/root/reference/src/polars_mas/postprocessing.py): Bonferroni
 * flag, definitions annotate join, sort + multi-format write — plus
 * the README-roadmap BH-FDR correction.
 *
 * Scale note: these run over the RESULTS table (one row per
 * (predictor, dependent) pair), which is orders of magnitude smaller
 * than the input data — a PheWAS with a million pairs is a million
 * rows. The global windows in BH are bounded by that, not by the
 * 100 TB input.
 */
object Postprocess {

  /** Bonferroni flag (postprocessing.py:14-20): threshold =
    * alpha / #non-null pvals; one aggregate row broadcast back. */
  def bonferroni(df: DataFrame, pvalCol: String = "pval", alpha: Double = 0.05): DataFrame = {
    val nTests = df.agg(count(col(pvalCol)).as("__n_tests"))
    df.crossJoin(broadcast(nTests))
      .withColumn("bonferroni_significant", col(pvalCol) < (lit(alpha) / col("__n_tests")))
      .drop("__n_tests")
  }

  /** Benjamini-Hochberg adjusted p-values (roadmap item):
    * p_adj(i) = min_{j ≥ i} min(1, m·p(j)/j) over ascending ranks —
    * the running min taken from the tail via a descending window. */
  def bhFdr(df: DataFrame, pvalCol: String = "pval", alpha: Double = 0.05): DataFrame = {
    val nonNull = df.filter(col(pvalCol).isNotNull)
    val m = nonNull.agg(count(lit(1)).as("__m"))
    val byP = Window.orderBy(col(pvalCol), col("__rtb"))
    val fromTail = Window.orderBy(col(pvalCol).desc, col("__rtb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    nonNull
      .withColumn("__rtb", monotonically_increasing_id())
      .crossJoin(broadcast(m))
      .withColumn("__rank", row_number().over(byP))
      .withColumn("p_adj",
        least(lit(1.0), min(col(pvalCol) * col("__m") / col("__rank")).over(fromTail)))
      .withColumn("bh_significant", col("p_adj") < alpha)
      .drop("__m", "__rank", "__rtb")
  }

  /** Definitions annotate (postprocessing.py:23-29): broadcast left
    * join of results against a small definitions dim — on `dependent`
    * for a PheWAS, on `predictor` for a FlipWAS. */
  def annotate(results: DataFrame, defs: DataFrame, on: String, defsKey: String): DataFrame =
    results.join(broadcast(defs), results(on) === defs(defsKey), "left")
      .drop(defsKey)

  /** Sort by p-value and write (postprocessing.py:32-40): parquet or
    * delimited text. The returned frame is the sorted result. */
  def sortAndWrite(df: DataFrame, path: String, format: String,
      pvalCol: String = "pval", tieBreak: Seq[String] = Nil): DataFrame = {
    val sorted = df.orderBy((col(pvalCol) +: tieBreak.map(col)): _*)
    format match {
      case "parquet" => sorted.write.mode("overwrite").parquet(path)
      case "csv" => sorted.write.mode("overwrite").option("header", "true").csv(path)
      case "tsv" | "txt" => sorted.write.mode("overwrite")
        .option("header", "true").option("delimiter", "\t").csv(path)
      case other => throw new IllegalArgumentException(s"Unsupported output format: $other")
    }
    sorted
  }

  // ============================================================ queries

  /** Deterministic pseudo p-values from integer hashing — identical
    * arithmetic in Spark and DuckDB, nulls injected every 97th key to
    * exercise the non-null test count. */
  private def pseudoPvals(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      when(col("o_orderkey") % 97 === 0, lit(null))
        .otherwise(((col("o_orderkey") * 2654435761L) % 1000000L) / 1000000.0)
        .as("pval"))

  private val pseudoPvalsSql =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 97 = 0 THEN NULL
      |    ELSE ((o_orderkey * 2654435761) % 1000000) / 1000000.0 END AS pval
      |FROM orders""".stripMargin

  /** s01: Bonferroni significance flag over pseudo p-values. */
  def s01Bonferroni(spark: SparkSession, dir: String): DataFrame =
    bonferroni(pseudoPvals(spark, dir))
      .select(col("o_orderkey"), round(col("pval"), 6).as("pval"),
        col("bonferroni_significant"))
      .orderBy("o_orderkey")

  /** s02: BH-FDR adjusted p-values (alpha 0.05). Tied p-values all
    * receive the same adjusted value (the running min absorbs the
    * within-tie rank differences), so the arbitrary tie-break inside
    * bhFdr cannot leak into the output. */
  def s02BhFdr(spark: SparkSession, dir: String): DataFrame =
    bhFdr(pseudoPvals(spark, dir), "pval")
      .select(col("o_orderkey"), round(col("pval"), 6).as("pval"),
        round(col("p_adj"), 6).as("p_adj"), col("bh_significant"))
      .orderBy("o_orderkey")

  /** s03: definitions annotate — synthesized public dim from nation
    * (code/phenotype/category), broadcast left join on dependent. */
  def s03Annotate(spark: SparkSession, dir: String): DataFrame = {
    val results = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_results"))
      .select(concat(lit("PH"), col("c_nationkey")).as("dependent"), col("n_results"))
    val defs = Tables.nation(spark, dir).select(
      concat(lit("PH"), col("n_nationkey")).as("phecode"),
      col("n_name").as("phenotype"),
      col("n_regionkey").as("category_number"))
    annotate(results, defs, "dependent", "phecode")
      .orderBy("dependent")
  }

  /** s04: sort by pval + multi-format write (parquet here; all four
    * formats exercised in the spec). */
  def s04SortOutput(spark: SparkSession, dir: String): DataFrame = {
    val tmp = System.getProperty("java.io.tmpdir") + "/graft_s04_out"
    sortAndWrite(pseudoPvals(spark, dir).filter(col("pval").isNotNull),
      tmp, "parquet", "pval", tieBreak = Seq("o_orderkey"))
      .select(col("o_orderkey"), round(col("pval"), 6).as("pval"))
  }

  // --------------------------------------------------------- oracle SQL

  val oracleSql: Map[String, String] = Map(
    "s01_bonferroni" ->
      s"""WITH p AS ($pseudoPvalsSql),
         |n AS (SELECT count(pval) AS n_tests FROM p)
         |SELECT o_orderkey, round(pval, 6) AS pval,
         |  pval < (0.05 / n_tests) AS bonferroni_significant
         |FROM p, n ORDER BY o_orderkey""".stripMargin,
    "s02_bh_fdr" ->
      s"""WITH p AS ($pseudoPvalsSql),
         |np AS (SELECT o_orderkey, pval FROM p WHERE pval IS NOT NULL),
         |m AS (SELECT count(*) AS m FROM np),
         |r AS (SELECT o_orderkey, pval,
         |        row_number() OVER (ORDER BY pval, o_orderkey) AS rnk
         |      FROM np),
         |adj AS (SELECT o_orderkey, pval,
         |        least(1.0, min(pval * m.m / rnk) OVER (
         |          ORDER BY pval DESC, o_orderkey DESC
         |          ROWS UNBOUNDED PRECEDING)) AS p_adj
         |      FROM r, m)
         |SELECT o_orderkey, round(pval, 6) AS pval, round(p_adj, 6) AS p_adj,
         |  p_adj < 0.05 AS bh_significant
         |FROM adj ORDER BY o_orderkey""".stripMargin,
    "s03_annotate" ->
      """WITH results AS (
        |  SELECT 'PH' || c_nationkey AS dependent, count(*) AS n_results
        |  FROM customer GROUP BY c_nationkey
        |)
        |SELECT r.dependent, r.n_results, n.n_name AS phenotype,
        |  n.n_regionkey AS category_number
        |FROM results r LEFT JOIN nation n ON r.dependent = 'PH' || n.n_nationkey
        |ORDER BY dependent""".stripMargin,
    "s04_sort_output" ->
      """SELECT o_orderkey,
        |  round(((o_orderkey * 2654435761) % 1000000) / 1000000.0, 6) AS pval
        |FROM orders WHERE o_orderkey % 97 <> 0
        |ORDER BY 2, 1""".stripMargin,
  )
}
