package graft.functions

/**
 * Special functions needed for regression inference, implemented from
 * scratch in pure Scala (no external deps beyond the JDK).
 *
 * These back the p-value / confidence-interval computations of the
 * association engine (see graft.models): chi-square survival for the
 * Firth LRT (reference behavior: /root/reference/src/polars_mas/models.py:46),
 * normal/t distributions for Wald tests and OLS inference
 * (models.py:56-83).
 *
 * Algorithms are the classical series / continued-fraction expansions
 * (Lanczos lgamma; incomplete gamma via power series + Lentz continued
 * fraction; incomplete beta via Lentz; AS241-style normal quantile) —
 * all long-published public numerical methods.
 */
object Numerics {

  // ---------------------------------------------------------------- lgamma

  /** log Γ(x) for x > 0, Lanczos approximation (g=7, n=9), ~15 digits. */
  def lgamma(x: Double): Double = {
    if (x.isNaN || x <= 0.0) return Double.NaN
    // Lanczos coefficients (g=7)
    val c = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5) {
      // reflection: Γ(x)Γ(1-x) = π / sin(πx)
      math.log(math.Pi / math.sin(math.Pi * x)) - lgamma(1.0 - x)
    } else {
      val z = x - 1.0
      var a = c(0)
      val t = z + 7.5
      var i = 1
      while (i < 9) { a += c(i) / (z + i); i += 1 }
      0.5 * math.log(2.0 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  // ------------------------------------------------- incomplete gamma P/Q

  private val Eps = 1e-15
  private val FpMin = Double.MinPositiveValue / Eps

  /** Regularized lower incomplete gamma P(a, x). */
  def gammaP(a: Double, x: Double): Double = {
    if (x < 0.0 || a <= 0.0) return Double.NaN
    if (x == 0.0) return 0.0
    if (x < a + 1.0) gammaPSeries(a, x) else 1.0 - gammaQCf(a, x)
  }

  /** Regularized upper incomplete gamma Q(a, x) = 1 - P(a, x). */
  def gammaQ(a: Double, x: Double): Double = {
    if (x < 0.0 || a <= 0.0) return Double.NaN
    if (x == 0.0) return 1.0
    if (x < a + 1.0) 1.0 - gammaPSeries(a, x) else gammaQCf(a, x)
  }

  /** Series expansion for P(a,x), converges fast for x < a+1. */
  private def gammaPSeries(a: Double, x: Double): Double = {
    var ap = a
    var sum = 1.0 / a
    var del = sum
    var n = 0
    while (n < 500) {
      ap += 1.0
      del *= x / ap
      sum += del
      if (math.abs(del) < math.abs(sum) * Eps) n = 500 else n += 1
    }
    sum * math.exp(-x + a * math.log(x) - lgamma(a))
  }

  /** Continued fraction for Q(a,x) (modified Lentz), good for x >= a+1. */
  private def gammaQCf(a: Double, x: Double): Double = {
    var b = x + 1.0 - a
    var c = 1.0 / FpMin
    var d = 1.0 / b
    var h = d
    var i = 1
    var done = false
    while (i <= 500 && !done) {
      val an = -i * (i - a)
      b += 2.0
      d = an * d + b
      if (math.abs(d) < FpMin) d = FpMin
      c = b + an / c
      if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < Eps) done = true
      i += 1
    }
    math.exp(-x + a * math.log(x) - lgamma(a)) * h
  }

  /** Chi-square survival function P(X > x) with df degrees of freedom. */
  def chi2Sf(x: Double, df: Double): Double = {
    if (x.isNaN) Double.NaN
    else if (x <= 0.0) 1.0
    else gammaQ(df / 2.0, x / 2.0)
  }

  // ------------------------------------------------------ incomplete beta

  /** Regularized incomplete beta I_x(a, b), continued fraction (Lentz). */
  def incBeta(a: Double, b: Double, x: Double): Double = {
    if (x.isNaN || a <= 0 || b <= 0) return Double.NaN
    if (x <= 0.0) return 0.0
    if (x >= 1.0) return 1.0
    val lbeta = lgamma(a) + lgamma(b) - lgamma(a + b)
    val front = math.exp(a * math.log(x) + b * math.log(1.0 - x) - lbeta)
    if (x < (a + 1.0) / (a + b + 2.0)) front * betaCf(a, b, x) / a
    else 1.0 - front * betaCf(b, a, 1.0 - x) / b
  }

  private def betaCf(a: Double, b: Double, x: Double): Double = {
    val qab = a + b
    val qap = a + 1.0
    val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < FpMin) d = FpMin
    d = 1.0 / d
    var h = d
    var m = 1
    var done = false
    while (m <= 300 && !done) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c
      if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c
      if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < Eps) done = true
      m += 1
    }
    h
  }

  // --------------------------------------------------- t distribution

  /** Student-t CDF with df degrees of freedom. */
  def tCdf(t: Double, df: Double): Double = {
    if (t.isNaN || df <= 0) return Double.NaN
    if (t == 0.0) return 0.5
    val x = df / (df + t * t)
    val p = 0.5 * incBeta(df / 2.0, 0.5, x)
    if (t > 0) 1.0 - p else p
  }

  /** Two-sided t-test p-value: P(|T| > |t|). */
  def tSf2(t: Double, df: Double): Double = {
    if (t.isNaN || df <= 0) Double.NaN
    else incBeta(df / 2.0, 0.5, df / (df + t * t))
  }

  /** t quantile (inverse CDF): Newton iterations seeded by qnorm. */
  def tQuantile(p: Double, df: Double): Double = {
    if (p.isNaN || p <= 0.0 || p >= 1.0 || df <= 0) return Double.NaN
    var t = qnorm(p) // start from normal quantile
    var i = 0
    while (i < 100) {
      val f = tCdf(t, df) - p
      val dens = tPdf(t, df)
      if (dens < 1e-300) i = 100
      else {
        val step0 = f / dens
        val step = math.max(-2.0 * (math.abs(t) + 1), math.min(2.0 * (math.abs(t) + 1), step0))
        t -= step
        if (math.abs(step) < 1e-12 * (1.0 + math.abs(t))) i = 100 else i += 1
      }
    }
    t
  }

  def tPdf(t: Double, df: Double): Double = {
    val l = lgamma((df + 1) / 2.0) - lgamma(df / 2.0) - 0.5 * math.log(df * math.Pi)
    math.exp(l - (df + 1) / 2.0 * math.log1p(t * t / df))
  }

  // --------------------------------------------------- normal distribution

  /** Standard normal CDF via erfc (rational + exponential bound). */
  def normCdf(x: Double): Double = 0.5 * erfc(-x / math.sqrt(2.0))

  /** Two-sided normal p-value: P(|Z| > |z|). */
  def normSf2(z: Double): Double = erfc(math.abs(z) / math.sqrt(2.0))

  /** Complementary error function, ~1e-12 accuracy (series/CF hybrid). */
  def erfc(x: Double): Double = {
    if (x.isNaN) return Double.NaN
    val ax = math.abs(x)
    // crossover at 1.0: the Laplace CF converges slowly below ~1 (at
    // x=0.5 it stalls near 1e-10), while the Taylor series is fine for
    // |x| < 1 — so the series owns [0,1).
    val r =
      if (ax < 1.0) 1.0 - erfSeries(ax)
      else erfcCf(ax)
    if (x >= 0) r else 2.0 - r
  }

  /** erf via Taylor/power series, for small |x|. */
  private def erfSeries(x: Double): Double = {
    val x2 = x * x
    var term = x
    var sum = x
    var n = 1
    while (n < 80) {
      term *= -x2 / n
      val add = term / (2 * n + 1)
      sum += add
      if (math.abs(add) < 1e-17 * math.abs(sum)) n = 80 else n += 1
    }
    sum * 2.0 / math.sqrt(math.Pi)
  }

  /** erfc via Lentz continued fraction, for x >= 0.5. */
  private def erfcCf(x: Double): Double = {
    // erfc(x) = exp(-x^2)/sqrt(pi) * 1/(x + 1/2/(x + 1/(x + 3/2/(x + ...))))
    var c = 1.0 / FpMin
    var d = 1.0 / x
    var h = d
    var n = 1
    var done = false
    while (n <= 300 && !done) {
      val an = n / 2.0
      d = 1.0 / (x + an * d)
      c = x + an / c
      val del = c * d
      h *= del
      if (math.abs(del - 1.0) < 1e-16) done = true
      n += 1
    }
    math.exp(-x * x) / math.sqrt(math.Pi) * h
  }

  /**
   * Standard normal quantile (inverse CDF). Peter Acklam-style rational
   * approximation refined with one Halley step against normCdf — ~1e-14.
   */
  def qnorm(p: Double): Double = {
    if (p.isNaN || p <= 0.0 || p >= 1.0) {
      return if (p == 0.0) Double.NegativeInfinity
      else if (p == 1.0) Double.PositiveInfinity
      else Double.NaN
    }
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01,
      -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pLow = 0.02425
    var x =
      if (p < pLow) {
        val q = math.sqrt(-2.0 * math.log(p))
        (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
          ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1.0)
      } else if (p <= 1.0 - pLow) {
        val q = p - 0.5
        val r = q * q
        (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
          (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1.0)
      } else {
        val q = math.sqrt(-2.0 * math.log(1.0 - p))
        -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
          ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1.0)
      }
    // one Halley refinement step
    val e = normCdf(x) - p
    val u = e * math.sqrt(2.0 * math.Pi) * math.exp(x * x / 2.0)
    x = x - u / (1.0 + x * u / 2.0)
    x
  }
}
