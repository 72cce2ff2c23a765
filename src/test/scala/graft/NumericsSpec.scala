package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Numerics._

/** Checks against widely-published distribution table values. */
class NumericsSpec extends AnyFunSuite {
  def near(a: Double, b: Double, tol: Double = 1e-9): Boolean = math.abs(a - b) <= tol

  test("lgamma matches known values") {
    assert(near(lgamma(1.0), 0.0, 1e-12))
    assert(near(lgamma(2.0), 0.0, 1e-12))
    assert(near(lgamma(0.5), math.log(math.sqrt(math.Pi)), 1e-12))
    assert(near(lgamma(10.0), math.log(362880.0), 1e-8))
  }

  test("chi2 survival function") {
    // P(X > 3.841458820694124) with df=1 = 0.05
    assert(near(chi2Sf(3.841458820694124, 1.0), 0.05, 1e-10))
    // P(X > 6.634896601021213) df=1 = 0.01
    assert(near(chi2Sf(6.634896601021213, 1.0), 0.01, 1e-10))
    // df=5: P(X > 11.0704976935) = 0.05
    assert(near(chi2Sf(11.070497693516351, 5.0), 0.05, 1e-10))
    assert(near(chi2Sf(0.0, 3.0), 1.0, 1e-15))
  }

  test("normal cdf / quantile round trip") {
    assert(near(normCdf(0.0), 0.5, 1e-14))
    assert(near(normCdf(1.959963984540054), 0.975, 1e-12))
    assert(near(qnorm(0.975), 1.959963984540054, 1e-10))
    assert(near(qnorm(0.5), 0.0, 1e-12))
    assert(near(qnorm(0.025), -1.959963984540054, 1e-10))
    for (p <- Seq(1e-10, 1e-4, 0.1, 0.3, 0.7, 0.9, 0.9999, 1 - 1e-10))
      assert(near(normCdf(qnorm(p)), p, 1e-12), s"roundtrip $p")
  }

  test("t distribution") {
    // two-sided 5% critical values
    assert(near(tQuantile(0.975, 10), 2.2281388519649385, 1e-8))
    assert(near(tQuantile(0.975, 1), 12.706204736432095, 1e-6))
    assert(near(tQuantile(0.975, 100), 1.9839715184496334, 1e-8))
    assert(near(tSf2(2.2281388519649385, 10), 0.05, 1e-10))
    assert(near(tCdf(0.0, 7), 0.5, 1e-14))
    // large df converges to normal
    assert(near(tQuantile(0.975, 1e7), 1.9599641, 1e-4))
  }

  test("incomplete beta basic identities") {
    assert(near(incBeta(2.0, 3.0, 0.0), 0.0, 1e-15))
    assert(near(incBeta(2.0, 3.0, 1.0), 1.0, 1e-15))
    // I_x(1,1) = x
    for (x <- Seq(0.1, 0.35, 0.8)) assert(near(incBeta(1, 1, x), x, 1e-12))
    // I_x(2,2) = x^2 (3 - 2x)
    for (x <- Seq(0.2, 0.5, 0.9))
      assert(near(incBeta(2, 2, x), x * x * (3 - 2 * x), 1e-12))
  }

  test("erfc sanity") {
    assert(near(erfc(0.0), 1.0, 1e-14))
    assert(near(erfc(1.0), 0.15729920705028513, 1e-12))
    assert(near(erfc(-1.0), 2.0 - 0.15729920705028513, 1e-12))
    assert(near(erfc(3.0), 2.209049699858544e-05, 1e-15))
  }
}
