package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Product-surface parity: the README quick-start invocation driven
 * through `graft.Main.main` — file in, file out, no test scaffolding
 * inside — against a cohort in the exact shape of the reference's
 * bundled dataset (/root/reference/src/polars_mas/data/sex2.csv: the
 * public logistf `sex2` case-control study, columns
 * case,age,oc,vic,vicl,vis,dia). The specs assert on the WRITTEN
 * output with plain file IO (the session Main owned is stopped by the
 * time we look), then cross-check the numbers two independent ways:
 * the library API run of the same config, and a closed-form 2x2
 * anchor computed from the raw file.
 */
class CliParitySpec extends AnyFunSuite {

  private val sex2Path = "/root/reference/src/polars_mas/data/sex2.csv"

  /** sex2.csv rows as Long tuples keyed by header name. */
  private def readSex2(): (Array[String], Seq[Array[Long]]) = {
    val src = scala.io.Source.fromFile(sex2Path)
    try {
      val lines = src.getLines().toList
      val header = lines.head.split(",").map(_.replace("\"", "").trim)
      (header, lines.tail.filter(_.nonEmpty).map(_.split(",").map(_.trim.toLong)))
    } finally src.close()
  }

  /** Writes the reference CSV shape as the TSV the quick-start reads. */
  private def writeTsv(): java.io.File = {
    val (header, rows) = readSex2()
    val f = java.io.File.createTempFile("sex2_cohort", ".tsv")
    f.deleteOnExit()
    val w = new java.io.PrintWriter(f, "UTF-8")
    try {
      w.println(header.mkString("\t"))
      rows.foreach(r => w.println(r.mkString("\t")))
    } finally w.close()
    f
  }

  /** Header + parsed data rows of a Spark-written delimited dir. */
  private def readWritten(dir: String, delim: String): (Array[String], Seq[Array[String]]) = {
    val d = new java.io.File(dir)
    assert(d.isDirectory, s"expected output directory at $dir")
    val parts = d.listFiles().filter(f => f.getName.startsWith("part-"))
    assert(parts.nonEmpty, s"no part files in $dir")
    val all = parts.toSeq.flatMap { p =>
      val src = scala.io.Source.fromFile(p)
      try src.getLines().toList finally src.close()
    }
    val header = all.head.split(delim, -1)
    (header, all.tail.filterNot(_ == all.head).filter(_.nonEmpty).map(_.split(delim, -1)))
  }

  test("README quick-start through graft.Main: sex2 tsv -> firth -> tsv, " +
    "reference schema, pval-sorted, equals the library API run") {
    assume(new java.io.File(sex2Path).isFile, "reference sex2.csv not present")
    val tsv = writeTsv()
    val outDir = java.nio.file.Files.createTempDirectory("cli_parity").toFile
    outDir.deleteOnExit()
    val prefix = outDir.getAbsolutePath + "/assoc"
    // the README quick-start invocation shape (short aliases, firth,
    // explicit min-case-count, tsv output)
    Main.main(Array(
      "-i", tsv.getAbsolutePath, "-nv", "NA,-9",
      "-p", "oc,vic,vicl,vis,dia", "-d", "case", "-c", "age",
      "-m", "firth", "-mc", "5",
      "-o", prefix, "-ot", "tsv"))
    val (header, rows) = readWritten(s"${prefix}_polars_mas_results.tsv", "\t")
    // reference result schema (models.py:44-67, postprocessing.py:20)
    for (c <- Seq("predictor", "dependent", "pval", "beta", "se", "OR",
        "bonferroni_significant"))
      assert(header.contains(c), s"missing output column $c; header=${header.mkString(",")}")
    assert(rows.size == 5, s"one row per predictor, got ${rows.size}")
    val pvalIx = header.indexOf("pval")
    val pvals = rows.map(_(pvalIx).toDouble)
    assert(pvals.forall(p => p >= 0 && p <= 1 && !p.isNaN))
    assert(pvals == pvals.sorted, "output must be pval-ascending (reference sort)")

    // the same config through the library API must produce the same
    // numbers — CLI adds arg parsing + file IO, never arithmetic
    val spark = GraftSession.builder("4").appName("cli-parity").getOrCreate()
    try {
      val raw = graft.sources.Sources.read(spark, tsv.getAbsolutePath, Seq("NA", "-9"))
      val direct = Pipeline.run(raw, GraftConfig(
        input = tsv.getAbsolutePath, predictors = "oc,vic,vicl,vis,dia",
        dependents = "case", covariates = "age", model = "firth",
        minCaseCount = 5)).collect()
      val directBy = direct.map(r => r.getAs[String]("predictor") ->
        (r.getAs[Double]("pval"), r.getAs[Double]("beta"))).toMap
      val predIx = header.indexOf("predictor")
      val betaIx = header.indexOf("beta")
      rows.foreach { r =>
        val (dp, db) = directBy(r(predIx))
        assert(math.abs(r(pvalIx).toDouble - dp) < 1e-9, s"pval ${r(predIx)}")
        assert(math.abs(r(betaIx).toDouble - db) < 1e-9, s"beta ${r(predIx)}")
      }
    } finally spark.stop()
  }

  test("CLI marginal firth fit equals the Haldane-corrected 2x2 closed form " +
    "computed from the raw reference file") {
    assume(new java.io.File(sex2Path).isFile, "reference sex2.csv not present")
    val tsv = writeTsv()
    val outDir = java.nio.file.Files.createTempDirectory("cli_parity2").toFile
    outDir.deleteOnExit()
    val prefix = outDir.getAbsolutePath + "/marg"
    Main.main(Array(
      "-i", tsv.getAbsolutePath, "-p", "dia", "-d", "case",
      "-m", "firth", "-mc", "5", "-o", prefix, "-ot", "csv"))
    val (header, rows) = readWritten(s"${prefix}_polars_mas_results.csv", ",")
    assert(rows.size == 1)
    val beta = rows.head(header.indexOf("beta")).toDouble

    // Firth with one binary predictor == add 1/2 to each 2x2 cell
    // (the ModelsSpec Haldane property, here through the whole CLI)
    val (h, data) = readSex2()
    val ci = h.indexOf("case"); val di = h.indexOf("dia")
    def cnt(c: Long, d: Long) =
      data.count(r => r(ci) == c && r(di) == d).toDouble + 0.5
    val expected = math.log(cnt(1, 1) * cnt(0, 0) / (cnt(1, 0) * cnt(0, 1)))
    assert(math.abs(beta - expected) < 1e-6,
      s"CLI beta $beta vs Haldane closed form $expected")
  }
}
