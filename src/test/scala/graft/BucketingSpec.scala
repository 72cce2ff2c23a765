package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources

/** Bucketing = pay the join shuffle once at write time. This spec is
  * the plan-level evidence for the scale claim: two tables bucketed
  * and sorted on the join key sort-merge-join with NO Exchange and NO
  * Sort in the physical plan. */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    val wh = Files.createTempDirectory("graft-warehouse").toString
    spark = GraftSession.builder("4").appName("bucketing-spec")
      .config("spark.sql.warehouse.dir", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("same-key bucketed tables join with no shuffle and no sort") {
    // force the sort-merge path and a concrete (non-adaptive) plan so
    // the Exchange assertion inspects what actually runs
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Sources.writeBucketed(Tables.orders(spark, dir), "b_orders", "o_orderkey", 8)
      Sources.writeBucketed(Tables.lineitem(spark, dir), "b_lineitem", "l_orderkey", 8)
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("qty"))
      val expected = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("qty"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == expected && got.nonEmpty)
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // the JOIN is exchange-free; the only legal shuffle is the final
      // groupBy on o_orderpriority (a different key)
      assert(exchanges.size == 1, s"plan had ${exchanges.size} exchanges:\n" +
        joined.queryExecution.executedPlan.toString)
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("SortMergeJoin"))
      assert(!planStr.contains("Exchange hashpartitioning(l_orderkey") &&
        !planStr.contains("Exchange hashpartitioning(o_orderkey"))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("partitioned write prunes partitions at planning time") {
    val out = Files.createTempDirectory("graft-part").toString + "/docs"
    val docs = Tables.documents(spark, dir).select("doc_id", "lang", "n_chars")
    Sources.writePartitioned(docs, out, Seq("lang"))
    val back = spark.read.parquet(out).filter(col("lang") === "en")
    // value-level round trip
    val expected = docs.filter(col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = back.collect().map(r =>
      r.getLong(r.fieldIndex("doc_id")) -> r.getLong(r.fieldIndex("n_chars"))).toMap
    assert(got == expected && got.nonEmpty)
    // plan-level: the lang predicate is a PartitionFilter (directory
    // pruning), not a data filter — non-en files are never opened
    val scan = back.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scan.nonEmpty)
    assert(scan.head.partitionFilters.exists(_.toString.contains("lang")),
      s"lang not in partitionFilters: ${scan.head.partitionFilters}")
    assert(scan.head.relation.location.inputFiles.forall(_.contains("lang=")))
  }
}
