package graft

import org.apache.spark.sql.SparkSession

/**
 * CLI entry point mirroring the reference's command surface
 * (/root/reference/src/polars_mas/cli.py): flag-per-config-field,
 * `i:` column specs supported everywhere, defaults matching the
 * reference (firth, min-case-count 10, parquet output).
 *
 * Example:
 *   spark-submit --class graft.Main graft.jar \
 *     --input cohort.parquet --predictors exposure \
 *     --dependents i:10-1800 --covariates age,sex \
 *     --model firth --min-case-count 50 --output /out/assoc
 */
object Main {

  private[graft] def parseArgs(args: Array[String]): GraftConfig = {
    val m = scala.collection.mutable.Map[String, String]()
    var i = 0
    while (i < args.length) {
      val a = args(i)
      require(a.startsWith("--"), s"Expected --flag, got '$a'")
      val key = a.drop(2)
      if (key == "male-only" || key == "female-only") { m(key) = "true"; i += 1 }
      else {
        require(i + 1 < args.length, s"Missing value for --$key")
        m(key) = args(i + 1); i += 2
      }
    }
    def req(k: String): String =
      m.getOrElse(k, throw new IllegalArgumentException(s"Missing required --$k"))
    GraftConfig(
      input = req("input"),
      predictors = req("predictors"),
      dependents = req("dependents"),
      covariates = m.getOrElse("covariates", ""),
      categoricalCovariates = m.getOrElse("categorical-covariates", ""),
      model = m.getOrElse("model", "firth"),
      missingCovariateValues = m.getOrElse("missing-covariate-values", "fail"),
      minCaseCount = m.getOrElse("min-case-count", "10").toInt,
      sexCol = m.getOrElse("sex-col", ""),
      femaleCode = m.getOrElse("female-code", "1.0").toDouble,
      maleOnly = m.getOrElse("male-only", "false").toBoolean,
      femaleOnly = m.getOrElse("female-only", "false").toBoolean,
      output = m.getOrElse("output", ""),
      outputFormat = m.getOrElse("output-format", "parquet"))
  }

  def main(args: Array[String]): Unit = {
    val cfg = parseArgs(args)
    // spark-submit injects spark.master; fall back to local outside it
    val spark =
      if (sys.props.contains("spark.master")) SparkSession.builder().appName("graft").getOrCreate()
      else GraftSession.get()
    val results = Pipeline.run(spark, cfg)
    if (cfg.output.isEmpty) results.show(50, truncate = false)
    spark.stop()
  }
}
