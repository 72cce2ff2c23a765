package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.operators.{Association, Postprocess, Preprocess}

/**
 * End-to-end MAS pipeline — the library's `GraftConfig`-style entry
 * point mirroring the reference orchestration
 * (/root/reference/src/polars_mas/pipeline.py:17-42 and config.py):
 * read → column selection (names + `i:` specs) → sex filter →
 * missing-covariate handling → drop constant covariates → one-hot →
 * associate → Bonferroni → optional annotate → sort → write.
 *
 * Where the reference materializes a preprocessed IPC file and fans
 * per-pair processes over it, here every stage extends ONE lazy
 * Catalyst plan: preprocessing is projections/filters Catalyst pushes
 * into the scan, and the association engine's melt/groupBy is the
 * only shuffle until the (pair-count-sized) postprocessing.
 */
final case class GraftConfig(
    input: String,                        // parquet path or table dir
    predictors: String,                   // comma list, i: specs allowed
    dependents: String,
    covariates: String = "",
    categoricalCovariates: String = "",
    model: String = "firth",              // firth | logistic | linear
    missingCovariateValues: String = "fail", // fail|drop|forward-is-not-supported-here
    minCaseCount: Int = 10,
    sexCol: String = "",
    femaleCode: Double = 1.0,
    maleOnly: Boolean = false,
    femaleOnly: Boolean = false,
    output: String = "",                  // empty = don't write
    outputFormat: String = "parquet",
    annotateDefs: Option[DataFrame] = None,
    annotateOn: String = "dependent",
    annotateKey: String = "phecode")

object Pipeline {

  /** Resolve a comma/`i:` column spec against the frame (empty → none). */
  private def resolve(df: DataFrame, spec: String): Seq[String] =
    if (spec.trim.isEmpty) Nil
    else Preprocess.selectColumns(df, spec).columns.toSeq

  def run(spark: SparkSession, cfg: GraftConfig): DataFrame = {
    val raw = spark.read.parquet(cfg.input)
    run(raw, cfg)
  }

  /** Run on an already-loaded frame (testing / composition). */
  def run(raw: DataFrame, cfg: GraftConfig): DataFrame = {
    val predictors = resolve(raw, cfg.predictors)
    val dependents = resolve(raw, cfg.dependents)
    var covariates = resolve(raw, cfg.covariates)
    val categoricals = resolve(raw, cfg.categoricalCovariates)

    // project to the used columns only — pushdown-friendly
    val used = (predictors ++ dependents ++ covariates ++
      (if (cfg.sexCol.nonEmpty) Seq(cfg.sexCol) else Nil)).distinct
    var df = raw.select(used.map(col): _*)

    // sex-specific filter (preprocessing.py:43-62)
    if (cfg.maleOnly || cfg.femaleOnly) {
      require(cfg.sexCol.nonEmpty && used.contains(cfg.sexCol),
        s"Sex column '${cfg.sexCol}' not found in included columns.")
      df = Preprocess.sexFilter(df, cfg.sexCol, cfg.femaleCode, cfg.femaleOnly)
    }

    // missing covariates (preprocessing.py:7-40)
    if (covariates.nonEmpty) cfg.missingCovariateValues match {
      case "fail" =>
        val nulls = df.select(covariates.map(c =>
          org.apache.spark.sql.functions.sum(col(c).isNull.cast("long")).as(c)): _*).head()
        covariates.foreach { c =>
          val n = nulls.getAs[Long](c)
          require(n == 0, s"Missing values found in covariate column '$c': $n missing values.")
        }
      case "drop" => df = df.na.drop(covariates)
      case s => df = Preprocess.fillNulls(df, covariates, s)
    }

    // global constant-covariate drop (preprocessing.py:65-79)
    if (covariates.nonEmpty) {
      val before = covariates.toSet
      df = Preprocess.dropConstant(df, covariates)
      covariates = covariates.filter(df.columns.contains)
      val dropped = before -- covariates
      if (dropped.nonEmpty) { /* mirrored reference warning-log point */ }
    }

    // one-hot categoricals, first level dropped (preprocessing.py:82-108)
    if (categoricals.nonEmpty) {
      val beforeCols = df.columns.toSet
      df = Preprocess.oneHot(df, categoricals)
      val newCols = df.columns.filterNot(beforeCols.contains)
      covariates = covariates.filterNot(categoricals.contains) ++ newCols
    }

    // associate
    val assocCfg = Association.Config(predictors, dependents, covariates,
      model = cfg.model, minCaseCount = cfg.minCaseCount)
    val results = Association.assoc(df, assocCfg)

    // postprocess: Bonferroni (+ optional annotate), sort, write
    var out = Postprocess.bonferroni(results)
    cfg.annotateDefs.foreach { defs =>
      out = Postprocess.annotate(out, defs, cfg.annotateOn, cfg.annotateKey)
    }
    if (cfg.output.nonEmpty)
      Postprocess.sortAndWrite(out, cfg.output, cfg.outputFormat, "pval",
        tieBreak = Seq("predictor", "dependent"))
    else out.orderBy(col("pval"), col("predictor"), col("dependent"))
  }
}
