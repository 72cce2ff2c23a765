package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/**
 * Graph analytics over relationship tables — the Pregel-shaped
 * message-passing family d06's connected components started,
 * expressed as joins + map-side-combined aggregates (the Spark-first
 * form of "vertex program + message sum"): no graph library, no
 * driver-side adjacency, state = one row per vertex.
 */
object Graph {

  /** Micro-unit scale: ranks live on a 1e-6 fixed-point grid as
    * LONGS, so every cross-engine / cross-partition reduction is an
    * INTEGER sum — order-independent, bit-reproducible at any
    * partition count, and replayable verbatim by the generated
    * DuckDB CTEs (the n03 codebook rule applied to graph state). */
  val Scale = 1000000L

  /**
   * PageRank with damping d = 0.85, fixed `iters` power iterations
   * from the uniform vector — fixed iteration count, not a
   * convergence test, so the oracle can unroll the loop exactly.
   *
   * Per iteration (all declarative):
   *   contrib(v) = Σ_{u→v} r(u) div outdeg(u)   — integer floor
   *   division loses < outdeg(u) micro-units per vertex
   *   (deterministically, identically in both engines);
   *   dangling mass = Σ r(u) over outdeg-0 vertices (one 1-row
   *   aggregate, broadcast-cross-joined);
   *   r'(v) = teleport + round(d · (contrib(v) + dangling/N)).
   * The edge join shuffles on vertex id; rank state is one long per
   * vertex; each round cuts lineage with localCheckpoint (the d06
   * rule — cache() alone grows the plan exponentially).
   *
   * `edges` must be (src, dst) pairs; vertices = edge endpoints.
   */
  def pagerank(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 50, s"pagerank: iters in [1,50], got $iters")
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val teleport = math.round(0.15 * Scale.toDouble / n)
    val r0 = Scale / n // uniform start, floor to the grid
    var rank = nodes.withColumn("r", lit(r0))
    for (_ <- 1 to iters) {
      val withDeg = rank.join(broadcast(outdeg),
        rank("node") === outdeg("src"), "left")
      val contrib = withDeg.filter(col("outdeg").isNotNull)
        .select(col("node"), expr("r div outdeg").as("c"))
        .join(e, col("node") === e("src"))
        .groupBy(col("dst").as("node")).agg(sum("c").as("contrib"))
      val dangling = withDeg.filter(col("outdeg").isNull)
        .agg(coalesce(sum("r"), lit(0L)).as("dm"))
      rank = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit(teleport) + round(lit(0.85) *
            (coalesce(col("contrib"), lit(0L)) + expr(s"dm div ${n}L")))
            .cast("long")).as("r"))
        .localCheckpoint(true)
    }
    rank.select(col("node"), col("r").as("rank_micro"),
      round(col("r") / Scale.toDouble, 4).as("rank"))
  }

  /** g01: PageRank over the customer–supplier trade graph (distinct
    * (cust, supp) pairs from lineitem ⋈ orders, one directed edge
    * EACH WAY so rank flows through the bipartite structure), 5
    * iterations, top-20 vertices. */
  def g01Pagerank(spark: SparkSession, dir: String): DataFrame = {
    val pairs = tradeEdges(spark, dir)
    val bi = pairs.select(col("c").as("src"), col("s").as("dst"))
      .union(pairs.select(col("s").as("src"), col("c").as("dst")))
    pagerank(bi, iters = 5)
      .orderBy(col("rank_micro").desc, col("node"))
      .limit(20)
  }

  private def tradeEdges(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("c"),
        concat(lit("s"), col("l_suppkey")).as("s"))
      .distinct()

  // --------------------------------------------------------- oracle SQL

  /** Unrolled power iterations as generated CTEs — same integer
    * grid, same div/round steps, so the replay is exact. N is not
    * known until runtime in Spark, but IS a pure function of the
    * data, so the oracle computes it in SQL (cnt CTE) and the
    * teleport/start constants are expressed in terms of it. */
  private def pagerankSql(iters: Int): String = {
    val head =
      s"""WITH pairs AS (
         |  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS c,
         |    's' || CAST(l.l_suppkey AS VARCHAR) AS s
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |), edges AS (
         |  SELECT c AS src, s AS dst FROM pairs
         |  UNION ALL SELECT s AS src, c AS dst FROM pairs
         |), nodes AS (
         |  SELECT DISTINCT src AS node FROM edges
         |  UNION SELECT DISTINCT dst AS node FROM edges
         |), cnt AS (SELECT count(*) AS n FROM nodes),
         |outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
         |r0 AS (
         |  SELECT node, CAST(${Scale} // (SELECT n FROM cnt) AS BIGINT) AS r
         |  FROM nodes
         |)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      val prev = s"r${i - 1}"
      s""", c$i AS (
         |  SELECT e.dst AS node, sum(r.r // o.outdeg) AS contrib
         |  FROM edges e
         |  JOIN $prev r ON e.src = r.node
         |  JOIN outdeg o ON e.src = o.src
         |  GROUP BY e.dst
         |), d$i AS (
         |  SELECT coalesce(sum(r.r), 0) AS dm FROM $prev r
         |  LEFT JOIN outdeg o ON r.node = o.src WHERE o.src IS NULL
         |), r$i AS (
         |  SELECT n.node,
         |    CAST(round((0.15 * ${Scale} / (SELECT n FROM cnt)) + 0.0)
         |      AS BIGINT)
         |    + CAST(round(0.85 * (coalesce(c.contrib, 0)
         |        + (SELECT dm FROM d$i) // (SELECT n FROM cnt))) AS BIGINT)
         |      AS r
         |  FROM nodes n LEFT JOIN c$i c ON n.node = c.node
         |)""".stripMargin
    }.mkString
    head + iterCtes +
      s"""
         |SELECT node, r AS rank_micro,
         |  round(r / ${Scale}.0, 4) + 0 AS rank
         |FROM r$iters ORDER BY rank_micro DESC, node LIMIT 20""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "g01_pagerank" -> pagerankSql(5))
}
