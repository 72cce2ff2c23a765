package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Association

/**
 * Per-iteration profile of the distributed Firth path at the bench
 * headline shape (5000 samples x 1800 dependents x 5 covariates) —
 * run with GRAFT_FIRTH_DEBUG=1 to see the iteration stamps this
 * summarizes. Dev-only.
 */
object ProfFirthGram {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 5000
    val d = if (args.length > 1) args(1).toInt else 1800
    val k = if (args.length > 2) args(2).toInt else 5
    val spark = graft.GraftSession.get()
    // the Bench.masMelted cohort, verbatim shape
    def melted = spark.range(n.toLong * d).select(
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
    val cfg = Association.Config(Seq("x"), (0 until d).map(i => s"dep_$i"),
      (1 to k).map(c => s"z$c"), model = "firth", minCaseCount = 10)
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      Association.firthGram(melted, cfg).write.format("noop").mode("overwrite").save()
      println(f"PROF firthGram rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
