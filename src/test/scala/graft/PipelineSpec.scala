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

  test("sex filter + i: column specs + fail-on-missing-covariates") {
    val base = cohortDf
    // i:1 is x, by position
    val out = Pipeline.run(base, GraftConfig(
      input = "", predictors = "i:1", dependents = "d1",
      covariates = "z", model = "logistic", minCaseCount = 5,
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
}
