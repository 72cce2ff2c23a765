package graft.models

import breeze.linalg.{DenseMatrix, DenseVector, cholesky, diag, inv}
import graft.functions.Numerics

/**
 * Regression fitters backing the association engine.
 *
 * Semantics mirror the reference engine's three models
 * (/root/reference/src/polars_mas/models.py):
 *  - linear: OLS, t-based inference, intercept appended LAST so the
 *    reported coefficient 0 is the predictor (models.py:72-83)
 *  - logistic: Newton MLE, Wald z inference (models.py:56-69)
 *  - firth: Jeffreys-penalized logistic with logistf defaults
 *    (maxit=25, maxstep=5, no half-steps, gtol/xtol=1e-5) and an LRT
 *    p-value for the predictor (models.py:9-53)
 *
 * All fitters take a column-major design matrix whose FIRST column is
 * the predictor; the intercept column is appended internally. They are
 * plain-JVM (breeze) and run inside executor tasks — one fit per
 * (predictor, dependent) group.
 */
final case class FitResult(
    pval: Double,
    beta: Double,
    se: Double,
    or: Double,
    ciLow: Double,
    ciHigh: Double,
    converged: Boolean)

object Models {
  private val Z975 = 1.959963984540054 // qnorm(0.975)

  private def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))

  /** Append an all-ones intercept column (reference adds it last). */
  def withIntercept(x: DenseMatrix[Double]): DenseMatrix[Double] =
    DenseMatrix.horzcat(x, DenseMatrix.ones[Double](x.rows, 1))

  // ------------------------------------------------------------- linear

  /**
   * OLS from sufficient statistics: xtx/xty INCLUDE the intercept
   * column (appended last). This is the 100 TB path — the Gram matrix
   * is accumulated distributively (map-side combine) so only
   * O(k^2) doubles per group reach the reducer; rows never shuffle.
   */
  def linearFromGram(
      xtx: DenseMatrix[Double],
      xty: DenseVector[Double],
      yty: Double,
      n: Long): FitResult = {
    val k = xtx.cols
    val dfRes = n - k
    if (dfRes <= 0) return FitResult(Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, converged = false)
    val xtxInv = inv(xtx)
    val beta = xtxInv * xty
    val rss = math.max(0.0, yty - (beta dot xty))
    val sigma2 = rss / dfRes
    val se0 = math.sqrt(sigma2 * xtxInv(0, 0))
    val b0 = beta(0)
    val t = b0 / se0
    val pval = Numerics.tSf2(t, dfRes.toDouble)
    val tq = Numerics.tQuantile(0.975, dfRes.toDouble)
    FitResult(pval, b0, se0, Double.NaN, b0 - tq * se0, b0 + tq * se0, converged = true)
  }

  /** OLS from a realized design (materializes the Gram and delegates). */
  def linear(x: DenseMatrix[Double], y: DenseVector[Double]): FitResult = {
    val xi = withIntercept(x)
    linearFromGram(xi.t * xi, xi.t * y, y dot y, y.length.toLong)
  }

  // ----------------------------------------------------------- logistic

  /** Newton-Raphson logistic MLE; Wald z p-value/CI for coefficient 0. */
  def logistic(
      x: DenseMatrix[Double],
      y: DenseVector[Double],
      maxIter: Int = 35,
      tol: Double = 1e-8): FitResult = {
    val xi = withIntercept(x)
    val n = xi.rows
    val k = xi.cols
    val beta = DenseVector.zeros[Double](k)
    var converged = false
    var it = 0
    var info: DenseMatrix[Double] = null
    while (it < maxIter && !converged) {
      val eta = xi * beta
      val p = eta.map(sigmoid)
      val w = p.map(pi => math.max(pi * (1.0 - pi), 1e-10))
      // X^T W X and X^T (y - p)
      info = xi.t * (xi(::, breeze.linalg.*) *:* w)
      val grad = xi.t * (y - p)
      val delta = info \ grad
      beta += delta
      if (breeze.linalg.max(breeze.numerics.abs(delta)) < tol) converged = true
      it += 1
    }
    val covm = inv(info)
    val se0 = math.sqrt(covm(0, 0))
    val b0 = beta(0)
    val z = b0 / se0
    val pval = Numerics.normSf2(z)
    FitResult(pval, b0, se0, math.exp(b0), b0 - Z975 * se0, b0 + Z975 * se0, converged)
  }

  // -------------------------------------------------------------- firth

  /**
   * Firth-penalized logistic regression (Jeffreys prior), matching
   * logistf defaults. Returns Wald CI and a likelihood-ratio-test
   * p-value for coefficient 0 (the predictor), as the reference does.
   */
  def firth(
      x: DenseMatrix[Double],
      y: DenseVector[Double],
      maxIter: Int = 25,
      maxStep: Double = 5.0,
      gtol: Double = 1e-5,
      xtol: Double = 1e-5): FitResult = {
    val xi = withIntercept(x)
    val full = firthFit(xi, y, fixZero = -1, maxIter, maxStep, gtol, xtol)
    // LRT: refit with the predictor coefficient constrained to zero;
    // the Jeffreys penalty stays on the full design (logistf behavior).
    // Warm-started from the full fit (as firthmodels does) — same
    // optimum, fewer IRLS iterations.
    val warm = full.beta.copy
    warm(0) = 0.0
    val constrained = firthFit(xi, y, fixZero = 0, maxIter, maxStep, gtol, xtol, Some(warm))
    val stat = 2.0 * (full.pll - constrained.pll)
    val pval = Numerics.chi2Sf(math.max(stat, 0.0), 1.0)
    val b0 = full.beta(0)
    val se0 = full.se(0)
    FitResult(pval, b0, se0, math.exp(b0), b0 - Z975 * se0, b0 + Z975 * se0,
      full.converged && constrained.converged)
  }

  private final case class FirthFit(
      beta: DenseVector[Double], se: DenseVector[Double], pll: Double, converged: Boolean)

  /**
   * Penalized IRLS. fixZero >= 0 holds that coefficient at zero while
   * maximizing over the rest (used for the LRT null model).
   * Defaults follow logistf/firthmodels: maxit=25, maxstep=5,
   * gconv=xconv=1e-5, no step-halving.
   */
  private def firthFit(
      xi: DenseMatrix[Double],
      y: DenseVector[Double],
      fixZero: Int,
      maxIter: Int = 25,
      maxStep: Double = 5.0,
      gtol: Double = 1e-5,
      xtol: Double = 1e-5,
      init: Option[DenseVector[Double]] = None): FirthFit = {
    val k = xi.cols
    val n = xi.rows
    val free = (0 until k).filter(_ != fixZero).toArray
    val beta = init.map(_.copy).getOrElse(DenseVector.zeros[Double](k))
    var converged = false
    var it = 0
    while (it < maxIter && !converged) {
      val eta = xi * beta
      val p = eta.map(sigmoid)
      val w = p.map(pi => math.max(pi * (1.0 - pi), 1e-12))
      val info = xi.t * (xi(::, breeze.linalg.*) *:* w)
      val infoInv = inv(info)
      // hat diagonal h_i = w_i * x_i^T info^{-1} x_i, computed as one
      // gemm (M = X·info⁻¹) plus a fused row-sum — the naive per-row
      // slice/dot allocates two vectors per row per iteration and
      // dominated the whole fit (~2× end-to-end on the 5000×1800 MAS
      // benchmark shape).
      val m = xi * infoInv
      val xd = xi.data; val md = m.data // column-major, stride n
      val resid = DenseVector.tabulate(n) { i =>
        var acc = 0.0
        var j = 0
        while (j < k) { acc += md(j * n + i) * xd(j * n + i); j += 1 }
        val hi = w(i) * acc
        y(i) - p(i) + hi * (0.5 - p(i))
      }
      val score = xi.t * resid
      // restrict to free coordinates
      val scoreF = DenseVector(free.map(score(_)))
      val infoF = DenseMatrix.tabulate(free.length, free.length)((a, b) => info(free(a), free(b)))
      val deltaF = infoF \ scoreF
      // cap the step (logistf maxstep)
      val mx = breeze.linalg.max(breeze.numerics.abs(deltaF))
      val scale = if (mx > maxStep) maxStep / mx else 1.0
      var j = 0
      while (j < free.length) { beta(free(j)) += scale * deltaF(j); j += 1 }
      if (breeze.linalg.max(breeze.numerics.abs(deltaF)) * scale < xtol &&
        breeze.linalg.max(breeze.numerics.abs(scoreF)) < gtol) converged = true
      it += 1
    }
    // final penalized log-likelihood and SEs at the solution
    val eta = xi * beta
    val p = eta.map(sigmoid)
    val w = p.map(pi => math.max(pi * (1.0 - pi), 1e-12))
    val info = xi.t * (xi(::, breeze.linalg.*) *:* w)
    val ll = (0 until xi.rows).map { i =>
      val pi = math.min(math.max(p(i), 1e-15), 1 - 1e-15)
      y(i) * math.log(pi) + (1.0 - y(i)) * math.log(1.0 - pi)
    }.sum
    val pll = ll + 0.5 * logDet(info)
    val se = breeze.numerics.sqrt(diag(inv(info)))
    FirthFit(beta, se, pll, converged)
  }

  private def logDet(m: DenseMatrix[Double]): Double = {
    val l = cholesky(m)
    2.0 * (0 until m.rows).map(i => math.log(l(i, i))).sum
  }
}
