package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Numerics

/** Property-based checks of the from-scratch numerics — identities
  * that must hold across the whole domain, not just spot values.
  * (Drives ScalaCheck generators directly — scalatestplus isn't in
  * the offline dependency cache.) */
class NumericsPropSpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(t => f(t._1, t._2, t._3))

  private val probs = Gen.choose(1e-12, 1.0 - 1e-12)
  private val smallPos = Gen.choose(0.1, 50.0)

  test("qnorm is the inverse of normCdf across (0,1)") {
    forAll(probs) { p =>
      val x = Numerics.qnorm(p)
      assert(math.abs(Numerics.normCdf(x) - p) < 1e-11 * math.max(1.0, 1 / math.min(p, 1 - p) * 1e-6) + 1e-12)
    }
  }

  test("Zelen-Severo tail (the s13/a27/a28/a29 oracle form) stays within its 7.5e-8 bound of erfc") {
    // the exact Horner form the operators and their DuckDB oracles
    // share — any edit there must keep this bound or the docs lie
    def zsTail(x: Double): Double = {
      val t = 1.0 / (1.0 + 0.2316419 * x)
      val poly = t * (0.319381530 + t * (-0.356563782 + t * (1.781477937 +
        t * (-1.821255978 + t * 1.330274429))))
      2.0 * math.exp(-0.5 * x * x) * 0.3989422804014327 * poly
    }
    forAll(Gen.choose(0.0, 8.0), n = 2000) { x =>
      val exact = Numerics.erfc(x / math.sqrt(2.0)) // 2(1 - Phi(x))
      assert(math.abs(zsTail(x) - exact) < 1.5e-7, // 2x the one-sided A&S bound
        s"x=$x zs=${zsTail(x)} erfc=$exact")
    }
    // the even-df chi-square tail (a30) vs numerically-integrated truth
    def chiTailEven(x: Double, df: Int): Double = {
      val h = x / 2.0
      val m = df / 2
      math.exp(-h) * (0 until m).map(i =>
        math.pow(h, i) / (1 to i).map(_.toDouble).product).sum
    }
    // df=2: exp(-x/2) exactly; df=4 vs Simpson integration of the density
    forAll(Gen.choose(0.1, 30.0), n = 200) { x =>
      assert(math.abs(chiTailEven(x, 2) - math.exp(-x / 2)) < 1e-15)
      val steps = 4000
      val hi = x + 60.0
      val w = (hi - x) / steps
      // chi2_4 density: (x/4)exp(-x/2)
      def dens(v: Double) = v / 4.0 * math.exp(-v / 2.0)
      val simpson = (0 until steps).map { i =>
        val a = x + i * w
        (dens(a) + 4 * dens(a + w / 2) + dens(a + w)) * w / 6
      }.sum
      assert(math.abs(chiTailEven(x, 4) - simpson) < 1e-6,
        s"x=$x closed=${chiTailEven(x, 4)} simpson=$simpson")
    }
  }

  test("erfc symmetry: erfc(-x) = 2 - erfc(x)") {
    forAll(Gen.choose(-6.0, 6.0)) { x =>
      assert(math.abs(Numerics.erfc(-x) - (2.0 - Numerics.erfc(x))) < 1e-13)
    }
  }

  test("incomplete beta symmetry: I_x(a,b) = 1 - I_{1-x}(b,a)") {
    forAll(smallPos, smallPos, probs) { (a, b, x) =>
      val lhs = Numerics.incBeta(a, b, x)
      val rhs = 1.0 - Numerics.incBeta(b, a, 1.0 - x)
      assert(math.abs(lhs - rhs) < 1e-9, s"a=$a b=$b x=$x")
    }
  }

  test("gammaP + gammaQ = 1 and both in [0,1]") {
    forAll(smallPos, Gen.choose(0.0, 100.0)) { (a, x) =>
      val p = Numerics.gammaP(a, x)
      val q = Numerics.gammaQ(a, x)
      assert(p >= -1e-12 && p <= 1 + 1e-12)
      assert(math.abs(p + q - 1.0) < 1e-10)
    }
  }

  test("t distribution: sf2 symmetry and df->inf normal limit") {
    forAll(Gen.choose(-8.0, 8.0), Gen.choose(1.0, 200.0)) { (t, df) =>
      // two-sided p equals 2*(1 - cdf(|t|))
      val p2 = Numerics.tSf2(t, df)
      val viaCdf = 2.0 * (1.0 - Numerics.tCdf(math.abs(t), df))
      assert(math.abs(p2 - viaCdf) < 1e-10)
    }
    // large-df limit approaches the normal
    assert(math.abs(Numerics.tSf2(1.96, 1e7) - Numerics.normSf2(1.96)) < 1e-5)
  }

  test("rolling hash composition: h(a+b) = (h(a)*31^|b| + h(b)) mod m") {
    val m = 1000000007L
    def h(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((acc, c) => (acc * 31 + (c & 0xff)) % m)
    def powMod(b: Long, e: Long, m: Long): Long = {
      var r = 1L; var bb = b % m; var ee = e
      while (ee > 0) { if ((ee & 1) == 1) r = r * bb % m; bb = bb * bb % m; ee >>= 1 }
      r
    }
    forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a, b) =>
      val expected = (h(a) * powMod(31, b.getBytes("UTF-8").length.toLong, m) + h(b)) % m
      assert(h(a + b) == expected)
    }
  }

  test("container-header parsers never throw on arbitrary bytes (fuzz)") {
    import graft.operators.Multimodal
    val bytes = Gen.choose(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    forAll(bytes, n = 2000) { b =>
      // total functions on untrusted input: None, never an exception
      Multimodal.parseImageHeader(b)
      Multimodal.parseWavHeader(b)
      Multimodal.parseMp4Header(b)
      Multimodal.parsePpmHeader(b)
    }
    // adversarial magic prefixes: valid signatures + garbage tails
    val prefixes = Seq[Array[Byte]](
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
      Array(0xff, 0xd8).map(_.toByte),
      "RIFF".getBytes ++ Array.fill[Byte](4)(0x7f) ++ "WAVE".getBytes,
      Array[Byte](0, 0, 0, 16) ++ "ftyp".getBytes,
      "P6\n".getBytes)
    forAll(Gen.zip(Gen.choose(0, prefixes.size - 1), bytes), n = 2000) {
      case (pi, tail) =>
        val payload = prefixes(pi) ++ tail
        Multimodal.parseImageHeader(payload)
        Multimodal.parseWavHeader(payload)
        Multimodal.parseMp4Header(payload)
        Multimodal.parsePpmHeader(payload)
    }
    // the overflow regression: a WAV chunk declaring a ~2^31 size must
    // parse to None, not wrap the cursor into negative indexing
    val evil = "RIFF".getBytes ++ Array[Byte](100, 0, 0, 0) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ Array(0xff, 0xff, 0xff, 0x7f).map(_.toByte) ++
      Array.fill[Byte](64)(1)
    assert(Multimodal.parseWavHeader(evil).isEmpty)
  }

  test("valid container builds round-trip through their parsers (fuzz)") {
    import graft.operators.Multimodal
    val dims = Gen.zip(Gen.choose(1, 65535), Gen.choose(1, 65535))
    val data = Gen.choose(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    forAll(Gen.zip(dims, Gen.oneOf(0, 2, 4, 6), data), n = 300) {
      case ((w, h), ct, d) =>
        val parsed = Multimodal.parseImageHeader(Multimodal.buildPng(w, h, ct, d))
        assert(parsed.exists(p => p.width == w && p.height == h))
    }
    forAll(Gen.zip(dims, Gen.oneOf(1, 3), Gen.oneOf(true, false), data), n = 300) {
      case ((w, h), nc, prog, d) =>
        val parsed = Multimodal.parseImageHeader(Multimodal.buildJpeg(w, h, nc, prog, d))
        assert(parsed.exists(p => p.width == w && p.height == h && p.channels == nc))
    }
    forAll(Gen.zip(Gen.choose(1, 8), Gen.choose(1, 192000), data), n = 300) {
      case (ch, sr, d) =>
        val parsed = Multimodal.parseWavHeader(Multimodal.buildWav(ch, sr, 16, d))
        assert(parsed.exists(p => p.channels == ch && p.sampleRate == sr &&
          p.dataBytes == d.length))
    }
    forAll(Gen.zip(Gen.choose(1, 96), Gen.choose(1, 96), data), n = 300) {
      case (w, h, d) =>
        // raster tiled to exactly 3wh bytes, like ppmTable
        val raster = Array.tabulate(3 * w * h)(j => if (d.isEmpty) 7.toByte else d(j % d.length))
        val parsed = Multimodal.parsePpmHeader(Multimodal.buildPpm(w, h, raster))
        assert(parsed.exists(p => p.width == w && p.height == h && p.maxval == 255))
    }
    forAll(Gen.zip(Gen.choose(1, 200000), Gen.choose(1L, 1L << 40),
      Gen.oneOf(true, false), data), n = 300) {
      case (ts, dur, v1, d) =>
        // v0 stores duration as u32: constrain to the layout's range
        val dd = if (v1) dur else dur % 0xffffffffL
        val parsed = Multimodal.parseMp4Header(Multimodal.buildMp4(ts, dd, v1, d))
        assert(parsed.exists(p => p.timescale == ts && p.duration == dd &&
          p.dataBytes == d.length))
    }
  }
}
