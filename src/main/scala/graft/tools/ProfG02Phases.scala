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
      val (adj, tA) = t {
        val deg = edges.select(col("u").as("node"))
          .union(edges.select(col("v").as("node")))
          .groupBy("node").agg(count(lit(1)).as("deg"))
        val fwd = col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v"))
        val oriented = edges
          .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
          .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
          .select(when(fwd, col("u")).otherwise(col("v")).as("src"),
            when(fwd, col("v")).otherwise(col("u")).as("dst"))
        oriented.groupBy("src")
          .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
          .localCheckpoint(true)
      }
      val (tri, tT) = t {
        val e2 = adj.select(col("src"), col("nbrs").as("nu"),
          explode(col("nbrs")).as("dst"))
        e2.join(adj.select(col("src").as("dst"), col("nbrs").as("nv")), Seq("dst"))
          .select(col("src"), col("dst"),
            array_intersect(col("nu"), col("nv")).as("ws"))
          .filter(size(col("ws")) > 0)
          .select(explode(concat(
            array(struct(col("src").as("node"), size(col("ws")).cast("long").as("n")),
              struct(col("dst").as("node"), size(col("ws")).cast("long").as("n"))),
            transform(col("ws"), w => struct(w.as("node"), lit(1L).as("n"))))).as("c"))
          .select(col("c.node").as("node"), col("c.n").as("n"))
          .groupBy("node").agg(sum(col("n")).as("n_triangles"))
          .localCheckpoint(true)
      }
      val (_, tK) = t(tri.orderBy(col("n_triangles").desc, col("node")).limit(20).collect())
      val ts = Array(tE, tA, tT, tK)
      for (i <- 0 until 4) mins(i) = math.min(mins(i), ts(i))
      println(f"""{"rep":$rep,"load_pre":$ld%.2f,"edges":$tE%.3f,"adj":$tA%.3f,"tri":$tT%.3f,"topk":$tK%.3f,"total":${ts.sum}%.3f}""")
    }
    println(f"""{"min_edges":${mins(0)}%.3f,"min_adj":${mins(1)}%.3f,"min_tri":${mins(2)}%.3f,"min_topk":${mins(3)}%.3f,"min_total":${mins.sum}%.3f}""")
    spark.stop()
  }
}
