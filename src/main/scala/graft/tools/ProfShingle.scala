package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Measures the Tables.ensureMinParallelism guard's effect on the
  * per-row signature kernels: same shingle+MinHash stage at guard
  * parallelism vs coalesced to one partition. Dev-only. */
object ProfShingle {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_scale10x_v3"
    val spark = graft.GraftSession.get()
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROF $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Dedup.corpus(spark, dir)
    println("corpus partitions = " + docs.rdd.getNumPartitions)
    time("warm count") { docs.count() }
    val params = Dedup.permParams(128, 42L)
    val sigUdf = udf((sh: Seq[String]) => Dedup.minhashSig(sh, params))
    def sigStage(d: org.apache.spark.sql.DataFrame) =
      Dedup.withShingles(d, "text", "sh")
        .select(col("doc_id"), col("sh"))
        .withColumn("sig", sigUdf(col("sh")))
        .select(sum(element_at(col("sig"), 1))).collect()(0)
    time("shingle+sig [guarded]") { println("  " + sigStage(docs)) }
    time("shingle+sig [guarded, 2nd]") { println("  " + sigStage(docs)) }
    time("shingle+sig [coalesce(1)]") { println("  " + sigStage(docs.coalesce(1))) }
    spark.stop()
  }
}
