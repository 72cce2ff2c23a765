package graft

import org.apache.spark.sql.SparkSession

/**
 * Central SparkSession factory: every entry point (Verify, Bench,
 * tests) shares the same scale-oriented defaults — shuffle partitions
 * sized to the local core count (not the 200 default), AQE on for
 * runtime re-planning/skew handling, UTC for oracle parity, and
 * nanosecond parquet timestamps read as longs (Spark 4 otherwise
 * rejects TIMESTAMP(NANOS); Tables.events converts back to µs).
 */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // InferFiltersFromGenerate synthesizes `size(arr) > 0` filters
      // under explode()s; predicate pushdown then substitutes the
      // full array-building expression into an interpreted Filter,
      // re-evaluating expensive HOF chains once per row (measured 20×
      // slowdown on the shingling ops). Generate already skips
      // empty/null arrays, so the rule only costs us here.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    // default to ALL cores: Verify/Bench/Main want full parallelism,
    // and a driver-side run without SPARK_GRAFT_CPUS must not fall
    // back to a 4-thread session (a local[4] MAS bench measures 4-10x
    // slower than local[32] — specs pin their own counts explicitly)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
