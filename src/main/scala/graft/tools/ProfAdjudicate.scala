package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Association, Graph}

/**
 * Round-17 adjudication run (r16 verdict items 1 + 5): the graph/MAS
 * 10x slope points (g02 94.1 -> 147.8 s, g01 17.9 -> 26.8 s,
 * mas_firth 14.6 -> 28.3 s r15 -> r16 with no code change to those
 * paths) and the six in-sweep regressions (t20 10.2, t09 5.4, n09
 * 4.0, g06 4.4, q03 1.5, a37 1.9 s at load gate 1.5 vs r15's 0.7)
 * re-measured ISOLATED, min-of-3, each rep stamped with the load
 * average sampled immediately BEFORE it (post-stamps on a 100-s
 * local[32] burst mostly measure the run's own trailing 1-min
 * average). A cooldown loop waits for decay below the bar between
 * reps so rep N's stamp is not rep N-1's self-load. Prints one JSON
 * line for the committed artifact.
 */
object ProfAdjudicate {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val bigDir = if (args.length > 1) args(1) else "/tmp/graft_scale10x_v3"
    val reps = if (args.length > 2) args(2).toInt else 3
    val bar = sys.env.get("SPARK_GRAFT_COOLDOWN_BAR")
      .flatMap(s => scala.util.Try(s.toDouble).toOption).getOrElse(2.0)
    val spark = graft.GraftSession.get()
    def loadAvg(): Double = {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.getLines().next().split(" ")(0).toDouble finally src.close()
    }
    // wait (up to 5 min) for the 1-min load to decay below the bar so
    // a rep's pre-stamp reflects EXTERNAL tenancy, not the prior rep
    def coolWait(): Unit = {
      val deadline = System.nanoTime() + 300L * 1000000000L
      while (loadAvg() > bar && System.nanoTime() < deadline) Thread.sleep(5000)
    }
    def measure(name: String)(body: => Unit): String = {
      val rs = (1 to reps).map { _ =>
        coolWait()
        val ld = loadAvg()
        val t0 = System.nanoTime()
        body
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (dt, ld)
      }
      val secs = rs.map(r => f"${r._1}%.2f").mkString(",")
      val lds = rs.map(r => f"${r._2}%.2f").mkString(",")
      val line = f""""$name":{"min":${rs.map(_._1).min}%.2f,"reps":[$secs],"load_pre":[$lds]}"""
      System.err.println("DONE " + line)
      line
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // same synthetic melted cohort as Bench.masMelted (hash-derived,
    // deterministic) at the 10x slope shape: 50k samples x 1800 deps
    def masMelted(n: Int, d: Int, k: Int) =
      spark.range(n.toLong * d).select(
          (col("id") % n).as("sample"), (col("id") / n).cast("long").as("di"))
        .select(
          lit("x").as("predictor"),
          concat(lit("dep_"), col("di")).as("dependent"),
          (pmod(xxhash64(col("sample"), lit(1)), lit(1000003)) / 1000003.0 * 4.0 - 2.0).as("x"),
          col("sample"), col("di"))
        .select(col("predictor"), lit(0).as("pidx"), col("dependent"),
          col("di").cast("int").as("didx"), col("x"),
          (pmod(xxhash64(col("sample"), col("di"), lit(7)), lit(1000003)) / 1000003.0 <
            lit(1.0) / (lit(1.0) + exp(-(col("x") * 0.8 - 2.0 +
              (col("di") % 7).cast("double") * 0.1)))).cast("double").as("y"),
          array((1 to k).map(c =>
            (pmod(xxhash64(col("sample"), lit(c + 100)), lit(1000003)) / 1000003.0).as(s"z$c")): _*)
            .as("covs"))
    def masCfg(d: Int, k: Int) =
      Association.Config(Seq("x"), (0 until d).map(i => s"dep_$i"),
        (1 to k).map(c => s"z$c"), model = "firth", minCaseCount = 10)

    // warm the JVM (classload + codegen) on untimed work so rep 1 of
    // the first target is not billed the session's startup cost
    noop(spark.read.parquet(sfDir + "/lineitem.parquet").groupBy("l_returnflag").count())
    noop(Graph.pagerank(spark.read.parquet(s"$bigDir/trade_edges_1x.parquet"), iters = 1))

    val out = scala.collection.mutable.ArrayBuffer[String]()
    // in-sweep regressions first (cheap), heavy slope points last
    for (nm <- Seq("q03_join", "a37_screen_firth", "n09_pca_power",
        "g06_kcore", "t09_char_entropy", "t20_repetition_gate"))
      out += measure(nm)(noop(graft.SparkEntry.queries(nm)(spark, sfDir)))
    out += measure("g01_1x")(noop(
      Graph.pagerank(spark.read.parquet(s"$bigDir/trade_edges_1x.parquet"), iters = 5)
        .orderBy(col("rank_micro").desc, col("node")).limit(20)))
    out += measure("g01_10x")(noop(
      Graph.pagerank(spark.read.parquet(s"$bigDir/trade_edges_10x.parquet"), iters = 5)
        .orderBy(col("rank_micro").desc, col("node")).limit(20)))
    out += measure("mas_firth_1x")(noop(
      Association.binary(masMelted(5000, 1800, 5), masCfg(1800, 5))))
    out += measure("mas_firth_10x")(noop(
      Association.binary(masMelted(50000, 1800, 5), masCfg(1800, 5))))
    out += measure("g02_1x")(noop(
      Graph.triangles(spark.read.parquet(s"$bigDir/coorder_edges_1x.parquet"))
        .orderBy(col("n_triangles").desc, col("node")).limit(20)))
    out += measure("g02_10x")(noop(
      Graph.triangles(spark.read.parquet(s"$bigDir/coorder_edges_10x.parquet"))
        .orderBy(col("n_triangles").desc, col("node")).limit(20)))
    println(s"""{"artifact":"adjudicate_r17","sf":"$sfDir","reps":$reps,""" +
      s""""cooldown_bar":$bar,"stamp":"pre-rep-after-cooldown",""" +
      out.mkString(",") + "}")
    spark.stop()
  }
}
