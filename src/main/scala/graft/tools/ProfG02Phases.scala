package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Graph

/**
 * r19 item-1 evidence: phase breakdown of g02's 1x run (the quiet
 * sweep read 5.08 s in r18 vs 3.72 in r17 with the 10x point halved —
 * is the creep in the edge build, the adjacency checkpoint, or the
 * intersect/agg?). Times, per rep: edges (coOrderEdges fresh), adj
 * (deg + orientation + sorted-array checkpoint), tri (intersect +
 * contribution agg + checkpoint), top (orderBy/limit). Prints one
 * JSON line per rep plus a min summary.
 */
object ProfG02Phases {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    def loadAvg(): Double = {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.getLines().next().split(" ")(0).toDouble finally src.close()
    }
    def t[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val mins = Array.fill(4)(Double.MaxValue)
    for (rep <- 1 to reps) {
      val ld = loadAvg()
      // fresh edge build every rep (inline coOrderEdges body — the
      // session cache would otherwise hide the cost after rep 1)
      val (edges, tE) = t {
        val li = graft.Tables.lineitem(spark, dir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
          .distinct()
        li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
          .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
          .localCheckpoint(true)
      }
      // candidate edge build: one groupBy + in-array pair explode
      // (orders have <= 7 parts, so the pair fan-out is bounded)
      val (edges2, tE2) = t {
        val li = graft.Tables.lineitem(spark, dir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        li.groupBy("ok").agg(sort_array(collect_set(col("p"))).as("ps"))
          .select(explode(flatten(transform(col("ps"), (x, i) =>
            transform(slice(col("ps"), i + 2, size(col("ps"))), y =>
              struct(x.as("u"), y.as("v")))))).as("e"))
          .select(col("e.u"), col("e.v")).distinct()
          .localCheckpoint(true)
      }
      println(f"""{"edges2_sec":$tE2%.3f,"n1":${edges.count()},"n2":${edges2.count()}}""")
      // the adj/tri phases call the SHIPPED helpers (factored out of
      // triangles() in this round) so the attribution can never drift
      // from the operator it profiles; only the edge-build VARIANTS
      // above are inlined, since comparing builds is the point
      val (adj, tA) = t(Graph.orientedAdjArrays(edges).localCheckpoint(true))
      val (tri, tT) = t(Graph.trianglesFromAdj(adj).localCheckpoint(true))
      val (_, tK) = t(tri.orderBy(col("n_triangles").desc, col("node")).limit(20).collect())
      val ts = Array(tE, tA, tT, tK)
      for (i <- 0 until 4) mins(i) = math.min(mins(i), ts(i))
      println(f"""{"rep":$rep,"load_pre":$ld%.2f,"edges":$tE%.3f,"adj":$tA%.3f,"tri":$tT%.3f,"topk":$tK%.3f,"total":${ts.sum}%.3f}""")
    }
    println(f"""{"min_edges":${mins(0)}%.3f,"min_adj":${mins(1)}%.3f,"min_tri":${mins(2)}%.3f,"min_topk":${mins(3)}%.3f,"min_total":${mins.sum}%.3f}""")
    spark.stop()
  }
}
