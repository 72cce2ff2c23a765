package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Graph

/**
 * Evidence run for the g02 hubCap escape hatch (r15 verdict item 4):
 * exact triangles vs hubCap in {64, 32} on the bench 10x co-order
 * graph — wall time, top-20 node overlap, and count-ratio stats per
 * cap. Prints one JSON line for the committed artifact.
 */
object ProfG02Cap {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_scale10x_v3"
    val edgesFile = if (args.length > 1) args(1) else "coorder_edges_10x.parquet"
    val spark = graft.GraftSession.get()
    def loadAvg(): Double = {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.getLines().next().split(" ")(0).toDouble finally src.close()
    }
    val edges = (if (edgesFile == "coorder_sf") Graph.coOrderEdges(spark, dir)
      else spark.read.parquet(s"$dir/$edgesFile")).localCheckpoint(true)
    println("edges=" + edges.count())
    def run(cap: Int): (Double, Double, Map[Long, Long], Seq[Long]) = {
      val ld = loadAvg()
      val t0 = System.nanoTime()
      val out = Graph.triangles(edges, cap)
        .orderBy(col("n_triangles").desc, col("node"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      (dt, ld, out.toMap, out.take(20).map(_._1).toSeq)
    }
    val (tEx, ldEx, exact, topEx) = run(0)
    val caps = Seq(64, 32).map { cap =>
      val (t, ld, counts, top) = run(cap)
      val overlap = top.toSet.intersect(topEx.toSet).size
      // capped counts are a LOWER bound; ratio over the exact top-20
      val ratios = topEx.map(n => counts.getOrElse(n, 0L).toDouble / exact(n))
      f"""{"cap":$cap,"sec":$t%.2f,"load_pre":$ld%.2f,"top20_overlap":$overlap,""" +
        f""""top20_count_ratio_min":${ratios.min}%.4f,"top20_count_ratio_mean":${
          ratios.sum / ratios.size}%.4f}"""
    }
    println(f"""{"edges_file":"$edgesFile","exact_sec":$tEx%.2f,""" +
      f""""exact_load_pre":$ldEx%.2f,"caps":[${caps.mkString(",")}]}""")
    spark.stop()
  }
}
