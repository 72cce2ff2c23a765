package graft.operators

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.models.Models

/**
 * The MAS association engine — the Spark-native re-expression of the
 * reference's per-pair analysis loop
 * (/root/reference/src/polars_mas/analysis.py:42-107): for every
 * (predictor, dependent) pair, drop nulls on the pair, validate
 * viability (analysis.py:110-193), drop covariates that are constant
 * within the pair's cohort (analysis.py:196-206), fit the configured
 * model, and emit one result row per pair with the reference's output
 * schema (analysis.py:228-260).
 *
 * Spark-first design, not a port:
 *  - The reference fans (predictor × dependent) tasks across local
 *    processes over a memory-mapped IPC file. Here the wide frame is
 *    melted (two `explode`s) into (predictor, dependent, x, y, covs)
 *    rows and grouped by pair — thousands of pairs spread across
 *    executors, data motion is one shuffle of the melted rows.
 *  - The LINEAR path never materializes a pair's rows: a declarative
 *    Gram aggregation (sum(f_i*f_j) columns — plain codegen'd
 *    HashAggregate with map-side partial combine) reduces each pair to
 *    O((k+2)²) doubles, and a tiny per-group solve turns sufficient
 *    stats into the fit. At 100 TB the shuffle carries kilobytes per
 *    pair, not rows. Constant-covariate detection also happens on the
 *    sufficient stats (zero variance ⇔ S_cc − S_c²/n = 0).
 *  - The LOGISTIC/FIRTH paths are iteratively reweighted and need the
 *    pair's rows: `mapGroups` fits one pair per task (cohort ×
 *    (k+2) doubles of task memory). For cohorts too large for one
 *    task, the documented escape hatch is the distributed IRLS — one
 *    Gram pass per iteration using the same aggregation as the linear
 *    path.
 *  - Pairs that lose every row to the null-drop vanish from the
 *    aggregation, so the full predictor × dependent grid is restored
 *    with a left join and "No data after dropping nulls." rows
 *    (analysis.py:113-121).
 */
object Association {

  /** Mirrors the reference MASConfig knobs the engine needs
    * (config.py): model ∈ {firth, logistic, linear}, min_case_count
    * gates viability, tolerances default to the reference fitters'
    * (logistf defaults for firth). */
  final case class Config(
      predictors: Seq[String],
      dependents: Seq[String],
      covariates: Seq[String] = Nil,
      model: String = "firth",
      minCaseCount: Int = 10,
      maxIter: Int = 25,
      tol: Double = 1e-5)

  /** Output row for binary models (reference analysis.py:230-245). */
  final case class BinResult(
      predictor: String, dependent: String,
      pval: Double, beta: Double, se: Double, OR: Double,
      ci_low: Double, ci_high: Double,
      cases: Long, controls: Long, total_n: Long,
      converged: Boolean, failed_reason: String, equation: String)

  /** Output row for the linear model (reference analysis.py:246-259). */
  final case class LinResult(
      predictor: String, dependent: String,
      pval: Double, beta: Double, se: Double,
      ci_low: Double, ci_high: Double,
      n_observations: Long,
      converged: Boolean, failed_reason: String, equation: String)

  private[operators] final case class MeltRow(
      predictor: String, dependent: String, x: Double, y: Double, covs: Seq[Double])

  /** Wide → long melt: one row per (input row, predictor, dependent)
    * that survives the pair null-drop, covariates packed as an array.
    * Two explodes over literal-struct arrays — pure projection, no
    * shuffle; Catalyst prunes unreferenced input columns. */
  def melt(df: DataFrame, cfg: Config): DataFrame = {
    val predArr = array(cfg.predictors.map(p =>
      struct(lit(p).as("predictor"), col(p).cast("double").as("x"))): _*)
    val depArr = array(cfg.dependents.map(d =>
      struct(lit(d).as("dependent"), col(d).cast("double").as("y"))): _*)
    val covArr =
      if (cfg.covariates.isEmpty) lit(Array.empty[Double])
      else array(cfg.covariates.map(c => col(c).cast("double")): _*)
    df.select(explode(predArr).as("p"), depArr.as("ds"), covArr.as("covs"))
      .select(col("p.predictor").as("predictor"), col("p.x").as("x"),
        explode(col("ds")).as("d"), col("covs"))
      .select(col("predictor"), col("d.dependent").as("dependent"),
        col("x"), col("d.y").as("y"), col("covs"))
      .filter(col("x").isNotNull && col("y").isNotNull)
  }

  /** Run the configured model over the melted frame. */
  def assoc(df: DataFrame, cfg: Config): DataFrame = {
    val melted = melt(df, cfg)
    if (cfg.model == "linear") linear(melted, cfg) else binary(melted, cfg)
  }

  // ------------------------------------------------------------- linear

  /** Upper-triangle flat index for the Gram column ordering below. */
  private def triIdx(m: Int, i: Int, j: Int): Int = i * m - i * (i - 1) / 2 + (j - i)

  /** One-pass distributed OLS: Gram sufficient statistics as plain
    * `sum` columns (codegen'd, map-side combined), then a per-group
    * solve. Features are [x, covs…, 1] with the intercept LAST so the
    * reported coefficient 0 is the predictor (models.py:72-83). */
  def linear(melted: DataFrame, cfg: Config): DataFrame = {
    val k = cfg.covariates.size
    val m = k + 2
    def f(i: Int): Column =
      if (i == 0) col("x") else if (i <= k) col("covs")(i - 1) else lit(1.0)
    val pairs = for { i <- 0 until m; j <- i until m } yield (i, j)
    val aggCols: Seq[Column] =
      pairs.map { case (i, j) => sum(f(i) * f(j)).as(s"s_${i}_$j") } ++
        (0 until m).map(i => sum(f(i) * col("y")).as(s"t_$i")) ++
        Seq(sum(col("y") * col("y")).as("syy"), count(lit(1)).as("n"))
    val agg = melted.groupBy("predictor", "dependent")
      .agg(aggCols.head, aggCols.tail: _*)
    val gram = array(pairs.map { case (i, j) => col(s"s_${i}_$j") }: _*)
    val xty = array((0 until m).map(i => col(s"t_$i")): _*)
    val covNames = cfg.covariates
    val minN = cfg.minCaseCount
    val solve = udf((pred: String, dep: String, g: Seq[Double], t: Seq[Double],
        syy: Double, n: Long) =>
      solveLinearGroup(pred, dep, g.toArray, t.toArray, syy, n, covNames, minN))
    val solved = agg
      .select(solve(col("predictor"), col("dependent"), gram, xty, col("syy"), col("n")).as("r"))
      .select("r.*")
    completeGrid(solved, cfg, linearDefaults(cfg))
  }

  /** Solve one pair from sufficient statistics (runs once per group —
    * off the hot path). Constant covariates are detected and dropped
    * from the Gram itself: n·var(c) = S_cc − S_c²/n. */
  private def solveLinearGroup(
      pred: String, dep: String, g: Array[Double], t: Array[Double],
      syy: Double, n: Long, covNames: Seq[String], minN: Int): LinResult = {
    val k = covNames.size
    val m = k + 2
    def S(i: Int, j: Int): Double =
      if (i <= j) g(triIdx(m, i, j)) else g(triIdx(m, j, i))
    if (n < minN)
      return LinResult(pred, dep, Double.NaN, Double.NaN, Double.NaN, Double.NaN,
        Double.NaN, -9L, converged = false, s"Not enough observations ($n).", "nan")
    val keptCovs = (1 to k).filter { c =>
      math.abs(S(c, c) - S(c, m - 1) * S(c, m - 1) / n) > 1e-9 * math.max(1.0, S(c, c))
    }
    val kept = 0 +: keptCovs :+ (m - 1)
    val keptNames = keptCovs.map(c => covNames(c - 1))
    // trailing "+ " with zero covariates mirrors the reference's
    // f"{dep} ~ {pred} + {' + '.join(covs)}" (analysis.py:73)
    val equation = s"$dep ~ $pred + ${keptNames.mkString(" + ")}"
    try {
      val xtx = DenseMatrix.tabulate(kept.size, kept.size)((a, b) => S(kept(a), kept(b)))
      val xty = DenseVector.tabulate(kept.size)(a => t(kept(a)))
      val r = Models.linearFromGram(xtx, xty, syy, n)
      LinResult(pred, dep, r.pval, r.beta, r.se, r.ciLow, r.ciHigh, n, r.converged,
        "nan", equation)
    } catch {
      case e: Throwable =>
        LinResult(pred, dep, Double.NaN, Double.NaN, Double.NaN, Double.NaN,
          Double.NaN, n, converged = false,
          Option(e.getMessage).getOrElse(e.toString), equation)
    }
  }

  // ------------------------------------------------------ logistic/firth

  /** Iterative fits: one pair per task via mapGroups. */
  def binary(melted: DataFrame, cfg: Config): DataFrame = {
    val spark = melted.sparkSession
    import spark.implicits._
    val covNames = cfg.covariates
    val minCase = cfg.minCaseCount
    val firth = cfg.model == "firth"
    val maxIter = cfg.maxIter
    val tol = cfg.tol
    // mapValues strips the key strings from the shuffled value payload
    // (they already travel once as the key) — less shuffle I/O and far
    // fewer per-row string allocations on the fit side.
    val solved = melted.as[MeltRow]
      .groupByKey(r => (r.predictor, r.dependent))
      .mapValues(r => (r.x, r.y, r.covs))
      .mapGroups { (key: (String, String), it: Iterator[(Double, Double, Seq[Double])]) =>
        fitBinaryGroup(key._1, key._2, it, covNames, minCase, firth, maxIter, tol)
      }
      .toDF()
    completeGrid(solved, cfg, binaryDefaults(cfg))
  }

  private def fitBinaryGroup(
      pred: String, dep: String, it: Iterator[(Double, Double, Seq[Double])],
      covNames: Seq[String], minCase: Int, firth: Boolean,
      maxIter: Int, tol: Double): BinResult = {
    def fail(reason: String): BinResult =
      BinResult(pred, dep, Double.NaN, Double.NaN, Double.NaN, Double.NaN,
        Double.NaN, Double.NaN, -9L, -9L, -9L, converged = false, reason, "nan")
    val rows = it.toArray
    val n = rows.length
    val cases = math.round(rows.iterator.map(_._2).sum)
    val controls = n - cases
    // validation order mirrors analysis.py:168-193 exactly
    if (cases < minCase) return fail(s"Insufficient case count ($cases cases).")
    if (controls < minCase) return fail(s"Insufficient control count ($controls controls).")
    if (cases == n) return fail("All observations are cases.")
    val keptCovs = covNames.indices.filter { c =>
      val first = rows(0)._3(c)
      rows.exists(_._3(c) != first)
    }
    val keptNames = keptCovs.map(covNames)
    val equation = s"$dep ~ $pred + ${keptNames.mkString(" + ")}"
    val x = DenseMatrix.tabulate(n, 1 + keptCovs.size) { (i, j) =>
      if (j == 0) rows(i)._1 else rows(i)._3(keptCovs(j - 1))
    }
    val y = DenseVector(rows.map(_._2))
    try {
      val r =
        if (firth) Models.firth(x, y, maxIter = maxIter, gtol = tol, xtol = tol)
        else Models.logistic(x, y, maxIter = maxIter, tol = tol)
      BinResult(pred, dep, r.pval, r.beta, r.se, r.or, r.ciLow, r.ciHigh,
        cases, controls, n, r.converged, "nan", equation)
    } catch {
      case e: Throwable =>
        BinResult(pred, dep, Double.NaN, Double.NaN, Double.NaN, Double.NaN,
          Double.NaN, Double.NaN, cases, controls, n, converged = false,
          Option(e.getMessage).getOrElse(e.toString), equation)
    }
  }

  // ----------------------------------------- distributed logistic IRLS

  /**
   * Distributed logistic IRLS — the escape hatch for pairs whose
   * cohort is too large to materialize inside one `mapGroups` task
   * (the default binary path). Nothing but sufficient statistics ever
   * leaves the executors:
   *
   * each Newton iteration is ONE declarative aggregation pass over the
   * melted frame: under the current per-pair beta (broadcast joined,
   * O(pairs·k) bytes), every row contributes w·f_i·f_j and f_i·(y−p)
   * partials; map-side combine reduces them to O(k²) doubles per pair,
   * the driver solves the k×k systems and re-broadcasts. Iterations
   * are O(scan); data never shuffles by group — only (pairs × k²)
   * stats move. Wald inference comes from the final information
   * matrix, exactly as the in-task fitter does.
   *
   * Semantics match `binary(model=logistic)` except per-pair
   * constant-covariate drop (a constant covariate makes the
   * information matrix singular → that pair reports failed_reason, as
   * statsmodels would); run `Preprocess.dropConstant` first.
   */
  def logisticGram(melted: DataFrame, cfg: Config): DataFrame = {
    val spark = melted.sparkSession
    import spark.implicits._
    val k = cfg.covariates.size
    val m = k + 2
    def f(i: Int): Column =
      if (i == 0) col("x") else if (i <= k) col("covs")(i - 1) else lit(1.0)

    // viability pass (one aggregation): counts per pair
    val counts = melted.groupBy("predictor", "dependent")
      .agg(sum("y").cast("long").as("cases"), count(lit(1)).as("n"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val viable = scala.collection.mutable.Map[(String, String), Array[Double]]()
    val failed = scala.collection.mutable.Map[(String, String), String]()
    counts.foreach { case (key, (cases, n)) =>
      val controls = n - cases
      if (cases < cfg.minCaseCount) failed(key) = s"Insufficient case count ($cases cases)."
      else if (controls < cfg.minCaseCount) failed(key) = s"Insufficient control count ($controls controls)."
      else if (cases == n) failed(key) = "All observations are cases."
      else viable(key) = Array.fill(m)(0.0)
    }

    val pairs = for { i <- 0 until m; j <- i until m } yield (i, j)
    def triOf(i: Int, j: Int): Int = i * m - i * (i - 1) / 2 + (j - i)
    var lastInfo = Map.empty[(String, String), breeze.linalg.DenseMatrix[Double]]
    var it = 0
    var active = viable.keySet.toSet
    while (it < cfg.maxIter && active.nonEmpty) {
      val betaDf = viable.toSeq.map { case ((p, d), b) => (p, d, b.toSeq) }
        .toDF("predictor", "dependent", "beta")
      val joined = melted.join(broadcast(betaDf), Seq("predictor", "dependent"))
      val eta = (0 until m).map(i => f(i) * col("beta")(i)).reduce(_ + _)
      val withW = joined
        .withColumn("p", lit(1.0) / (lit(1.0) + exp(-eta)))
        .withColumn("w", greatest(col("p") * (lit(1.0) - col("p")), lit(1e-10)))
        .withColumn("r", col("y") - col("p"))
      val aggCols: Seq[Column] =
        pairs.map { case (i, j) => sum(col("w") * f(i) * f(j)).as(s"s_${i}_$j") } ++
          (0 until m).map(i => sum(f(i) * col("r")).as(s"g_$i"))
      val stats = withW.groupBy("predictor", "dependent").agg(aggCols.head, aggCols.tail: _*)
        .collect()
      val newInfo = scala.collection.mutable.Map[(String, String), breeze.linalg.DenseMatrix[Double]]()
      val stillMoving = scala.collection.mutable.Set[(String, String)]()
      stats.foreach { row =>
        val key = (row.getString(0), row.getString(1))
        if (viable.contains(key) && active.contains(key)) {
          val info = breeze.linalg.DenseMatrix.tabulate(m, m)((a, b) =>
            row.getDouble(2 + triOf(math.min(a, b), math.max(a, b))))
          val grad = breeze.linalg.DenseVector.tabulate(m)(i =>
            row.getDouble(2 + pairs.length + i))
          newInfo(key) = info
          try {
            val delta = info \ grad
            val b = viable(key)
            var i = 0
            while (i < m) { b(i) += delta(i); i += 1 }
            if (breeze.linalg.max(breeze.numerics.abs(delta)) >= cfg.tol) stillMoving += key
          } catch {
            case e: Throwable =>
              failed(key) = Option(e.getMessage).getOrElse(e.toString)
              viable.remove(key)
          }
        }
      }
      lastInfo = lastInfo ++ newInfo
      active = stillMoving.toSet
      it += 1
    }

    def failRow(pred: String, dep: String, reason: String) =
      BinResult(pred, dep, Double.NaN, Double.NaN, Double.NaN, Double.NaN,
        Double.NaN, Double.NaN, -9L, -9L, -9L, converged = false, reason, "nan")
    val out = cfg.predictors.flatMap(p => cfg.dependents.map(d => (p, d))).map {
      case key @ (pred, dep) =>
        if (viable.contains(key)) {
          val (cases, n) = counts(key)
          val b = viable(key)
          val covm = breeze.linalg.inv(lastInfo(key))
          val se0 = math.sqrt(covm(0, 0))
          val b0 = b(0)
          BinResult(pred, dep, graft.functions.Numerics.normSf2(b0 / se0), b0, se0,
            math.exp(b0), b0 - 1.959963984540054 * se0, b0 + 1.959963984540054 * se0,
            cases, n - cases, n, converged = !active.contains(key), "nan",
            s"$dep ~ $pred + ${cfg.covariates.mkString(" + ")}")
        } else failRow(pred, dep,
          failed.getOrElse(key, "No data after dropping nulls."))
    }
    spark.createDataFrame(out)
  }

  // ------------------------------------------------------ grid completion

  private def linearDefaults(cfg: Config): Map[String, Column] = Map(
    "pval" -> lit(Double.NaN), "beta" -> lit(Double.NaN), "se" -> lit(Double.NaN),
    "ci_low" -> lit(Double.NaN), "ci_high" -> lit(Double.NaN),
    "n_observations" -> lit(-9L), "converged" -> lit(false),
    "failed_reason" -> lit("No data after dropping nulls."), "equation" -> lit("nan"))

  private def binaryDefaults(cfg: Config): Map[String, Column] = Map(
    "pval" -> lit(Double.NaN), "beta" -> lit(Double.NaN), "se" -> lit(Double.NaN),
    "OR" -> lit(Double.NaN), "ci_low" -> lit(Double.NaN), "ci_high" -> lit(Double.NaN),
    "cases" -> lit(-9L), "controls" -> lit(-9L), "total_n" -> lit(-9L),
    "converged" -> lit(false),
    "failed_reason" -> lit("No data after dropping nulls."), "equation" -> lit("nan"))

  /** Pairs whose rows all dropped produce no group — restore the full
    * predictor × dependent grid with reference default values
    * (analysis.py:113-121, schema defaults :228-260). The grid is a
    * literal local relation; both sides are one-row-per-pair small. */
  private def completeGrid(
      solved: DataFrame, cfg: Config, defaults: Map[String, Column]): DataFrame = {
    val spark = solved.sparkSession
    import spark.implicits._
    val grid = cfg.predictors.flatMap(p => cfg.dependents.map(d => (p, d)))
      .toDF("predictor", "dependent")
    val joined = grid.join(broadcast(solved), Seq("predictor", "dependent"), "left")
    val cols = Seq(col("predictor"), col("dependent")) ++
      solved.columns.filterNot(c => c == "predictor" || c == "dependent").map { c =>
        coalesce(col(c), defaults(c)).as(c)
      }
    joined.select(cols: _*)
  }
}
