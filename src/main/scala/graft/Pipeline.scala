package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.operators.{Association, Postprocess, Preprocess}
import graft.sources.Sources

/**
 * End-to-end MAS pipeline — the library's `GraftConfig`-style entry
 * point mirroring the reference orchestration
 * (/root/reference/src/polars_mas/pipeline.py:17-42 and config.py):
 * read (parquet/csv/tsv/txt + null markers) → column selection (names
 * + `i:` specs) → validation → sex filter → missing-covariate
 * handling → drop constant covariates → one-hot → dependent
 * transforms (log / RINT, README-roadmap items) → associate →
 * Bonferroni → optional PheCode annotate → sort → write.
 *
 * Where the reference materializes a preprocessed IPC file and fans
 * per-pair processes over it, here every stage extends ONE lazy
 * Catalyst plan: preprocessing is projections/filters Catalyst pushes
 * into the scan, and the association engine's melt/groupBy is the
 * only shuffle until the (pair-count-sized) postprocessing. The two
 * exceptions need a total row order made explicit (`orderCol`):
 * forward/backward fill and RINT rank ties — a distributed engine has
 * no "file row order" (preprocessing.py:31-33 relies on it).
 */
final case class GraftConfig(
    input: String,                        // parquet/csv/tsv/txt path
    predictors: String,                   // comma list, i: specs allowed
    dependents: String,
    covariates: String = "",
    categoricalCovariates: String = "",
    nullValues: Seq[String] = Nil,        // delimited-input null markers (config.py:110-121)
    model: String = "firth",              // firth | logistic | linear
    missingCovariateValues: String = "fail", // fail|drop|forward|backward|min|max|mean|zero|one
    minCaseCount: Int = 20,               // reference default (cli.py:117)
    quantitative: Boolean = false,        // dependents are continuous (cli.py:88-92)
    rint: Boolean = false,                // RINT dependents (roadmap)
    logt: Boolean = false,                // log-transform dependents (roadmap)
    phewas: Boolean = false,              // annotate dependents with PheCode defs
    flipwas: Boolean = false,             // annotate predictors with PheCode defs
    phecodeDefs: String = "",             // path to a phecode_definitions CSV (public catalog layout)
    sexCol: String = "sex",               // reference default (cli.py:139-144)
    femaleCode: Double = 1.0,
    maleOnly: Boolean = false,
    femaleOnly: Boolean = false,
    orderCol: String = "",                // explicit row order: forward/backward fill, RINT ties
    output: String = "",                  // output PREFIX; empty = don't write
    outputType: String = "csv",           // reference default (cli.py:61-68)
    dryRun: Boolean = false,
    distributed: Boolean = false,         // graft extension: route binary fits
                                          // through the Gram IRLS paths (cohorts
                                          // too large for one task); linear is
                                          // always distributed (sufficient stats)
    annotateDefs: Option[DataFrame] = None, // direct defs override (tests/composition)
    annotateOn: String = "dependent",
    annotateKey: String = "phecode")

object Pipeline {

  /** Resolve a comma/`i:` column spec against the frame (empty → none). */
  private def resolve(df: DataFrame, spec: String): Seq[String] =
    if (spec.trim.isEmpty) Nil
    else Preprocess.selectColumns(df, spec).columns.toSeq

  /** Config-level validation — the reference's fail-fast contract
    * (config.py:180-196 unique sets, cli.py mutually-exclusive
    * groups), plus the engine pairings a lazy plan can check early. */
  private def validate(cfg: GraftConfig, predictors: Seq[String], dependents: Seq[String],
      covariates: Seq[String], categoricals: Seq[String]): Unit = {
    require(Seq("firth", "logistic", "linear").contains(cfg.model),
      s"Unknown model: ${cfg.model}")
    require(!(cfg.rint && cfg.logt), "--rint and --logt are mutually exclusive.")
    require(!(cfg.phewas && cfg.flipwas), "--phewas and --flipwas are mutually exclusive.")
    require(!(cfg.maleOnly && cfg.femaleOnly), "--male-only and --female-only are mutually exclusive.")
    // quantitative selects the continuous validation branch
    // (analysis.py:125-165) and only the linear model fits a
    // continuous dependent — fail fast instead of fitting garbage
    require(cfg.quantitative == (cfg.model == "linear"),
      "--quantitative and model=linear go together: binary models need binary dependents.")
    require(!(cfg.rint || cfg.logt) || cfg.quantitative,
      "--rint/--logt transform continuous dependents; use with --quantitative.")
    require(!cfg.rint || cfg.orderCol.nonEmpty,
      "--rint needs --order-col to break rank ties deterministically.")
    val needsOrder = Seq("forward", "backward").contains(cfg.missingCovariateValues)
    require(!needsOrder || cfg.orderCol.nonEmpty,
      "forward/backward covariate fill needs --order-col: a distributed engine has no file row order.")
    // unique column sets (config.py:180-196, same messages)
    val p = predictors.toSet; val d = dependents.toSet; val c = covariates.toSet
    require((p & d).isEmpty, "Predictor and dependent columns must be unique")
    require((p & c).isEmpty, "Predictor and covariate columns must be unique")
    require((d & c).isEmpty, "Dependent and covariate columns must be unique")
    val cc = categoricals.toSet
    require(cc.isEmpty || (cc & c).nonEmpty && (cc -- c).isEmpty,
      "Categorical covariate columns must be a subset of covariate columns")
  }

  /** Reference-style configuration summary (config.py:231-255) — what
    * `--dry-run` prints instead of executing. */
  def summary(raw: DataFrame, cfg: GraftConfig): String = {
    def fmt(columns: Seq[String], maxDisplay: Int = 5): String = {
      val n = columns.length
      if (n == 0) "(none)"
      else if (n <= maxDisplay) s"$n column${if (n != 1) "s" else ""}: ${columns.mkString(", ")}"
      else s"$n columns: ${columns.head}, ${columns(1)}, ... ${columns(n - 2)}, ${columns.last}"
    }
    val predictors = resolve(raw, cfg.predictors)
    val dependents = resolve(raw, cfg.dependents)
    val covariates = resolve(raw, cfg.covariates)
    s"""Configuration summary:
       |  Input file: ${cfg.input}
       |  Output prefix: ${cfg.output}
       |  Model: ${cfg.model}${if (cfg.distributed) " (distributed IRLS)" else ""}
       |  Predictors:  ${fmt(predictors)}
       |  Dependents:  ${fmt(dependents)}
       |  Covariates:  ${fmt(covariates)}""".stripMargin
  }

  def run(spark: SparkSession, cfg: GraftConfig): DataFrame =
    run(Sources.read(spark, cfg.input, cfg.nullValues), cfg)

  /** Run on an already-loaded frame (testing / composition). */
  def run(raw: DataFrame, cfg: GraftConfig): DataFrame = {
    val predictors = resolve(raw, cfg.predictors)
    val dependents = resolve(raw, cfg.dependents)
    var covariates = resolve(raw, cfg.covariates)
    val categoricals = resolve(raw, cfg.categoricalCovariates)
    validate(cfg, predictors, dependents, covariates, categoricals)

    // project to the used columns only — pushdown-friendly. The sex
    // column is NOT auto-included: the reference requires it among the
    // included columns when filtering (preprocessing.py:47-49).
    val used = (predictors ++ dependents ++ covariates ++
      (if (cfg.orderCol.nonEmpty) Seq(cfg.orderCol) else Nil)).distinct
    var df = raw.select(used.map(col): _*)

    // sex-specific filter (preprocessing.py:43-62)
    if (cfg.maleOnly || cfg.femaleOnly) {
      require(used.contains(cfg.sexCol),
        s"Sex column '${cfg.sexCol}' not found in included columns.")
      df = Preprocess.sexFilter(df, cfg.sexCol, cfg.femaleCode, cfg.femaleOnly)
    }

    // orderCol is a join/rank key for RINT and directional fill:
    // duplicate values would fan out the RINT join (silently inflating
    // n_observations) and make rank tie-breaks nondeterministic —
    // fail fast instead. One small aggregate, only when orderCol is
    // actually used.
    val usesOrder = cfg.rint ||
      Seq("forward", "backward").contains(cfg.missingCovariateValues)
    if (usesOrder && cfg.orderCol.nonEmpty) {
      val r = df.agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.countDistinct(col(cfg.orderCol)).as("nd")).head()
      require(r.getAs[Long]("n") == r.getAs[Long]("nd"),
        s"--order-col '${cfg.orderCol}' must be unique and non-null: " +
          s"${r.getAs[Long]("n")} rows but ${r.getAs[Long]("nd")} distinct non-null values.")
    }

    // missing covariates (preprocessing.py:7-40)
    if (covariates.nonEmpty) cfg.missingCovariateValues match {
      case "fail" =>
        val aggCols = org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("__rows") +:
          covariates.map(c =>
            org.apache.spark.sql.functions.sum(col(c).isNull.cast("long")).as(c))
        val nulls = df.agg(aggCols.head, aggCols.tail: _*).head()
        val rows = nulls.getAs[Long]("__rows")
        covariates.foreach { c =>
          val n = nulls.getAs[Long](c)
          // all-missing first, like preprocessing.py:12-16
          require(n < rows || rows == 0, s"All values are missing in covariate column '$c'.")
          require(n == 0, s"Missing values found in covariate column '$c': $n missing values.")
        }
      case "drop" => df = df.na.drop(covariates)
      case dir @ ("forward" | "backward") =>
        df = Preprocess.fillOrdered(df, covariates, dir == "forward", cfg.orderCol)
      case s => df = Preprocess.fillNulls(df, covariates, s)
    }

    // global constant-covariate drop (preprocessing.py:65-79)
    if (covariates.nonEmpty) {
      df = Preprocess.dropConstant(df, covariates)
      covariates = covariates.filter(df.columns.contains)
    }

    // one-hot categoricals, first level dropped (preprocessing.py:82-108)
    if (categoricals.nonEmpty) {
      val beforeCols = df.columns.toSet
      df = Preprocess.oneHot(df, categoricals)
      val newCols = df.columns.filterNot(beforeCols.contains)
      covariates = covariates.filterNot(categoricals.contains) ++ newCols
    }

    // dependent transforms (README-roadmap: log / RINT), pre-melt
    if (cfg.logt) df = Preprocess.logTransform(df, dependents)
    if (cfg.rint) {
      // one ranking job per dependent (quantitative MAS workloads have
      // few dependents); ties break on orderCol, nulls stay null
      df = dependents.foldLeft(df) { (d, dep) =>
        val r = Preprocess.rint(d, dep, cfg.orderCol)
          .select(col(cfg.orderCol), col("rint").as(s"__rint_$dep"))
        d.join(r, Seq(cfg.orderCol), "left")
          .withColumn(dep, col(s"__rint_$dep"))
          .drop(s"__rint_$dep")
      }
    }

    // associate
    val assocCfg = Association.Config(predictors, dependents, covariates,
      model = cfg.model, minCaseCount = cfg.minCaseCount)
    val results =
      if (cfg.distributed && cfg.model != "linear") {
        // same melt, same viability gates, same output schema — only
        // the fit topology changes (one aggregation scan per Newton
        // step instead of one task per pair); spec-pinned equal to
        // the in-task fitters
        val melted = Association.melt(df, assocCfg)
        if (cfg.model == "firth") Association.firthGram(melted, assocCfg)
        else Association.logisticGram(melted, assocCfg)
      } else Association.assoc(df, assocCfg)

    // postprocess: Bonferroni, PheCode/custom annotate, sort, write
    var out = Postprocess.bonferroni(results)
    val defs: Option[DataFrame] = cfg.annotateDefs.orElse {
      if (cfg.phewas || cfg.flipwas) {
        // no --phecode-defs needed: the public catalog ships bundled,
        // mirroring the reference (constants.py:6-16); a user-pointed
        // CSV overrides it
        Some(if (cfg.phecodeDefs.nonEmpty)
          Sources.phecodeDefs(raw.sparkSession, cfg.phecodeDefs)
        else Sources.bundledPhecodeDefs(raw.sparkSession))
      } else None
    }
    defs.foreach { d =>
      val on = if (cfg.flipwas) "predictor" else cfg.annotateOn
      out = Postprocess.annotate(out, d, on, cfg.annotateKey)
    }
    if (cfg.output.nonEmpty) {
      // reference output naming: {prefix}_polars_mas_results.{ext}
      // (postprocessing.py:32-40); Spark writes it as a directory
      val path = s"${cfg.output}_polars_mas_results.${cfg.outputType}"
      Postprocess.sortAndWrite(out, path, cfg.outputType, "pval",
        tieBreak = Seq("predictor", "dependent"))
    } else out.orderBy(col("pval"), col("predictor"), col("dependent"))
  }
}
