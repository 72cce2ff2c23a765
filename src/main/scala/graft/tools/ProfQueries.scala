package graft.tools

import graft.{GraftSession, SparkEntry}

/** Ad-hoc isolated per-op timer: `runMain graft.tools.ProfQueries
  * <sfDir> <reps> <op> [op...]` — times each registered query to the
  * noop sink (the Bench convention) rep times, printing every rep.
  * Ops run in registry order within one session, so session-cached
  * artifacts are billed to the FIRST op that builds them, exactly as
  * in the sweep. */
object ProfQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = GraftSession.get()
    for (name <- names; r <- 1 to reps) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROF $name rep$r $dt%.2f s")
    }
    spark.stop()
  }
}
