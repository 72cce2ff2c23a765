package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("2").appName("pipeline-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def cohortDf = {
    val sess = spark
    import sess.implicits._
    val rng = new scala.util.Random(5)
    (0 until 400).map { i =>
      val x = rng.nextGaussian()
      val z = rng.nextGaussian()
      val sex = i % 2
      val seg = Seq("A", "B", "C")(i % 3)
      val p = 1.0 / (1.0 + math.exp(-(1.2 * x - 1.0)))
      val d1 = if (rng.nextDouble() < p) 1.0 else 0.0
      val d2 = if (rng.nextDouble() < 0.3) 1.0 else 0.0
      (i, x, z, sex, seg, d1, d2, 7.0)
    }.toDF("id", "x", "z", "sex", "seg", "d1", "d2", "zconst")
  }

  test("end-to-end firth pipeline: select, one-hot, assoc, bonferroni, sort") {
    val out = Pipeline.run(cohortDf, GraftConfig(
      input = "", predictors = "x", dependents = "d1,d2",
      covariates = "z,zconst,seg", categoricalCovariates = "seg",
      model = "firth", minCaseCount = 10))
    val rows = out.collect()
    assert(rows.length == 2)
    val cols = out.columns.toSet
    assert(cols.contains("bonferroni_significant"))
    // one-hot: zconst dropped globally, seg expanded (first level dropped)
    val eq = rows.map(_.getAs[String]("equation")).mkString(" ")
    assert(!eq.contains("zconst"))
    assert(eq.contains("seg_B") && eq.contains("seg_C"))
    // sorted by pval: the strong d1 association first
    assert(rows.head.getAs[String]("dependent") == "d1")
    assert(rows.head.getAs[Double]("pval") < 1e-6)
    assert(rows.head.getAs[Double]("beta") > 0.5)
  }

  test("--distributed routes binary fits through the Gram paths with identical results") {
    def run(dist: Boolean, model: String) = Pipeline.run(cohortDf, GraftConfig(
      input = "", predictors = "x", dependents = "d1,d2",
      covariates = "z", model = model, minCaseCount = 10,
      distributed = dist))
      .collect().map(r => r.getAs[String]("dependent") -> r).toMap
    for (model <- Seq("firth", "logistic")) {
      val inTask = run(dist = false, model)
      val gram = run(dist = true, model)
      assert(gram.keySet == inTask.keySet, model)
      for (d <- gram.keys; c <- Seq("pval", "beta", "se", "OR")) {
        assert(math.abs(gram(d).getAs[Double](c) - inTask(d).getAs[Double](c)) < 1e-5,
          s"$model $d $c")
      }
      for (d <- gram.keys) {
        assert(gram(d).getAs[String]("equation") == inTask(d).getAs[String]("equation"),
          s"$model $d equation")
      }
    }
    // CLI flag parses (graft extension, not a reference flag)
    assert(Main.parseArgs(Array("-i", "a", "-p", "p", "-d", "d", "--distributed")).distributed)
    assert(!Main.parseArgs(Array("-i", "a", "-p", "p", "-d", "d")).distributed)
  }

  test("--phewas with no --phecode-defs annotates from the bundled public catalog") {
    val sess = spark
    import sess.implicits._
    // dependents named as real PheCodes from the v1.2 catalog
    val rng = new scala.util.Random(11)
    val df = (0 until 300).map { i =>
      val x = rng.nextGaussian()
      val p = 1.0 / (1.0 + math.exp(-(1.5 * x - 0.5)))
      val d = if (rng.nextDouble() < p) 1.0 else 0.0
      val d2 = if (rng.nextDouble() < 0.4) 1.0 else 0.0
      (i, x, d, d2)
    }.toDF("id", "x", "008", "244")
    val out = Pipeline.run(df, GraftConfig(
      input = "", predictors = "x", dependents = "008,244",
      model = "logistic", minCaseCount = 5, phewas = true))
    val rows = out.collect()
    assert(rows.length == 2)
    val byDep = rows.map(r => r.getAs[String]("dependent") -> r).toMap
    // catalog line 2: 008 = "Intestinal infection", infectious diseases
    assert(byDep("008").getAs[String]("phenotype") == "Intestinal infection")
    assert(byDep("008").getAs[String]("category") == "infectious diseases")
    assert(byDep("244").getAs[String]("phenotype") == "Hypothyroidism")
  }

  test("library default minCaseCount == CLI/pipeline default == reference default (20)") {
    // reference cli.py:114-117: --min-case-count default 20; a library
    // caller of Association.assoc must get the same viability gate as
    // the CLI path
    assert(operators.Association.Config(Nil, Nil).minCaseCount == 20)
    assert(GraftConfig(input = "", predictors = "", dependents = "").minCaseCount == 20)
  }

  test("sex filter + i: column specs + fail-on-missing-covariates") {
    val base = cohortDf
    // i:1 is x, by position; the sex column must be among the included
    // columns (reference preprocessing.py:47-49) — here as a covariate,
    // where the female-only filter makes it constant and drops it
    val out = Pipeline.run(base, GraftConfig(
      input = "", predictors = "i:1", dependents = "d1",
      covariates = "z,sex", model = "logistic", minCaseCount = 5,
      sexCol = "sex", femaleCode = 1.0, femaleOnly = true))
    val r = out.collect()(0)
    assert(r.getAs[String]("predictor") == "x")
    assert(r.getAs[Long]("total_n") == 200L) // half the rows
    // fail strategy surfaces missing covariates
    val sess = spark
    import sess.implicits._
    val holey = base.withColumn("z",
      org.apache.spark.sql.functions.when(org.apache.spark.sql.functions.col("id") % 5 === 0,
        null.asInstanceOf[java.lang.Double]).otherwise(org.apache.spark.sql.functions.col("z")))
    val ex = intercept[IllegalArgumentException] {
      Pipeline.run(holey, GraftConfig(input = "", predictors = "x",
        dependents = "d1", covariates = "z", missingCovariateValues = "fail"))
    }
    assert(ex.getMessage.contains("Missing values found in covariate column 'z'"))
    // mean-fill strategy proceeds
    val filled = Pipeline.run(holey, GraftConfig(input = "", predictors = "x",
      dependents = "d1", covariates = "z", missingCovariateValues = "mean",
      model = "logistic"))
    assert(filled.collect().length == 1)
  }

  test("tsv input + null markers flow through the pipeline end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    val f = new java.io.File(s"$dir/cohort.tsv")
    val w = new java.io.PrintWriter(f)
    w.println("id\tx\tz\td1")
    val rng = new scala.util.Random(7)
    (0 until 300).foreach { i =>
      val x = rng.nextGaussian()
      val z = if (i % 17 == 0) "NA" else f"${rng.nextGaussian()}%.6f"
      val d1 = if (rng.nextDouble() < 1.0 / (1.0 + math.exp(-(1.5 * x - 0.8)))) 1 else 0
      w.println(s"$i\t$x\t$z\t$d1")
    }
    w.close()
    val out = Pipeline.run(spark, GraftConfig(
      input = f.toString, predictors = "x", dependents = "d1", covariates = "z",
      nullValues = Seq("NA"), model = "logistic", missingCovariateValues = "mean",
      minCaseCount = 5))
    val r = out.collect()(0)
    assert(r.getAs[String]("predictor") == "x")
    assert(r.getAs[Long]("total_n") == 300L) // NA covariates mean-filled, not dropped
    assert(r.getAs[Double]("beta") > 0.5)
  }

  test("forward/backward covariate fill uses the explicit order column") {
    val sess = spark
    import sess.implicits._
    val df = Seq(
      (1L, 1.0, Option(10.0), 1.0), (2L, -0.5, Option.empty[Double], 0.0),
      (3L, 0.3, Option(20.0), 1.0), (4L, 0.9, Option.empty[Double], 0.0),
      (5L, -1.2, Option.empty[Double], 1.0)
    ).toDF("id", "x", "z", "d1")
    def zOf(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => r.getAs[Long]("id") -> Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    val fwd = zOf(operators.Preprocess.fillOrdered(df, Seq("z"), forward = true, "id"))
    assert(fwd(1).contains(10.0) && fwd(2).contains(10.0) && fwd(4).contains(20.0)
      && fwd(5).contains(20.0))
    val back = zOf(operators.Preprocess.fillOrdered(df, Seq("z"), forward = false, "id"))
    assert(back(2).contains(20.0) && back(4).isEmpty && back(5).isEmpty)
    // pipeline-level wiring (missing-covariate-values forward + order-col)
    val out = Pipeline.run(df, GraftConfig(input = "", predictors = "x",
      dependents = "d1", covariates = "z", missingCovariateValues = "forward",
      orderCol = "id", model = "logistic", minCaseCount = 1))
    assert(out.collect().length == 1)
    // forward fill without an order column fails fast
    intercept[IllegalArgumentException](Pipeline.run(df, GraftConfig(input = "",
      predictors = "x", dependents = "d1", covariates = "z",
      missingCovariateValues = "forward", model = "logistic")))
  }

  test("fillOrdered equals the single-window reference fill on random data") {
    val sess = spark
    import sess.implicits._
    val rng = new scala.util.Random(23)
    val df = (0 until 500).map { i =>
      (i.toLong,
        if (rng.nextDouble() < 0.3) Option.empty[Double] else Option(rng.nextGaussian()),
        if (rng.nextDouble() < 0.3) Option.empty[Double] else Option(rng.nextGaussian()))
    }.toDF("id", "u", "v").repartition(7) // force boundary carries
    for (forward <- Seq(true, false)) {
      // oracle: the windowed fill with no partition keys (single task —
      // fine in a test, the thing fillOrdered exists to avoid at scale)
      val expected = operators.Preprocess.fillDirectional(df, Seq("u", "v"),
        forward, partitionBy = Nil, orderBy = Seq("id")).collect()
        .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
      val got = operators.Preprocess.fillOrdered(df, Seq("u", "v"), forward, "id")
        .collect()
        .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
      assert(got == expected, s"forward=$forward")
    }
  }

  test("pipeline --rint equals association over manually transformed dependents") {
    val sess = spark
    import sess.implicits._
    val rng = new scala.util.Random(11)
    val df = (0 until 200).map { i =>
      val x = rng.nextGaussian()
      (i.toLong, x, 2.0 * x + rng.nextGaussian() * 3.0)
    }.toDF("id", "x", "yq")
    val viaPipeline = Pipeline.run(df, GraftConfig(input = "", predictors = "x",
      dependents = "yq", model = "linear", quantitative = true, rint = true,
      orderCol = "id", minCaseCount = 10)).collect()(0)
    val rinted = df.drop("yq").join(
      operators.Preprocess.rint(df, "yq", "id")
        .select(org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.col("rint").as("yq")), "id")
    val direct = operators.Association.assoc(rinted,
      operators.Association.Config(Seq("x"), Seq("yq"), model = "linear",
        minCaseCount = 10)).collect()(0)
    assert(math.abs(viaPipeline.getAs[Double]("beta") - direct.getAs[Double]("beta")) < 1e-9)
    assert(math.abs(viaPipeline.getAs[Double]("se") - direct.getAs[Double]("se")) < 1e-9)
  }

  test("config validation parity: unique sets, categorical subset, model pairing, all-missing") {
    val df = cohortDf
    def cfg0 = GraftConfig(input = "", predictors = "x", dependents = "d1")
    def msgOf(body: => Any): String =
      intercept[IllegalArgumentException](body).getMessage
    assert(msgOf(Pipeline.run(df, cfg0.copy(dependents = "x,d1")))
      .contains("Predictor and dependent columns must be unique"))
    assert(msgOf(Pipeline.run(df, cfg0.copy(covariates = "x,z")))
      .contains("Predictor and covariate columns must be unique"))
    assert(msgOf(Pipeline.run(df, cfg0.copy(covariates = "d1")))
      .contains("Dependent and covariate columns must be unique"))
    assert(msgOf(Pipeline.run(df, cfg0.copy(covariates = "z", categoricalCovariates = "seg")))
      .contains("Categorical covariate columns must be a subset of covariate columns"))
    assert(msgOf(Pipeline.run(df, cfg0.copy(model = "linear")))
      .contains("--quantitative"))
    assert(msgOf(Pipeline.run(df, cfg0.copy(quantitative = true)))
      .contains("--quantitative"))
    val allNull = df.withColumn("zn",
      org.apache.spark.sql.functions.lit(null).cast("double"))
    assert(msgOf(Pipeline.run(allNull, cfg0.copy(covariates = "zn")))
      .contains("All values are missing in covariate column 'zn'"))
  }

  test("duplicate --order-col values fail fast (RINT join would fan out)") {
    val sess = spark
    import sess.implicits._
    val df = Seq((1L, 0.1, 1.0), (1L, 0.2, 2.0), (2L, 0.3, 3.0))
      .toDF("id", "x", "yq")
    val msg = intercept[IllegalArgumentException](
      Pipeline.run(df, GraftConfig(input = "", predictors = "x",
        dependents = "yq", model = "linear", quantitative = true, rint = true,
        orderCol = "id", minCaseCount = 1))).getMessage
    assert(msg.contains("must be unique and non-null"))
  }
}
