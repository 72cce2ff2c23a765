package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/**
 * Dev profiler for the d03 MinHash pipeline: times each stage of
 * [[Dedup.minhashLshPairs]] in isolation at an arbitrary corpus dir
 * (default: the bench 10x replica corpus) so constant-cut work
 * targets the measured bottleneck, not the assumed one.
 */
object ProfD03 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_scale10x_v3"
    val spark = graft.GraftSession.get()
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROF $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Dedup.corpus(spark, dir)
    time("corpus count") { println("  docs=" + docs.count()) }
    val withSh = time("shingles+ckpt") {
      // checkpoint BEFORE the nonempty filter — mirrors
      // Dedup.shingleTable (the filter-over-projection form inlines
      // the shingle lambda into a pushed-down filter, ~200x)
      Dedup.withShingles(docs, "text", "sh")
        .select(col("doc_id"), col("sh"))
        .localCheckpoint(true)
        .filter(size(col("sh")) > 0)
    }
    val params = Dedup.permParams(128, 42L)
    val sigUdf = udf((sh: Seq[String]) => Dedup.minhashSig(sh, params))
    val bandUdf = udf((sig: Seq[Long]) =>
      (0 until 32).map(bi =>
        (bi, scala.util.hashing.MurmurHash3.orderedHash(sig.slice(bi * 4, bi * 4 + 4)))))
    val buckets = time("sig+band+ckpt") {
      withSh.withColumn("sig", sigUdf(col("sh")))
        .select(col("doc_id"), explode(bandUdf(col("sig"))).as("b"))
        .select(col("doc_id"), col("b._1").as("band"), col("b._2").as("bh"))
        .localCheckpoint(true)
    }
    val cand = time("bucket join+distinct") {
      buckets.as("x").join(buckets.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
        .distinct()
        .localCheckpoint(true)
    }
    println("  cand=" + cand.count())
    time("verify joins") {
      val sh1 = withSh.select(col("doc_id").as("id1"), col("sh").as("sh1"))
      val sh2 = withSh.select(col("doc_id").as("id2"), col("sh").as("sh2"))
      val out = cand.join(sh1, "id1").join(sh2, "id2")
        .withColumn("common", size(array_intersect(col("sh1"), col("sh2"))).cast("double"))
        .withColumn("jaccard",
          col("common") / (size(col("sh1")) + size(col("sh2")) - col("common")))
        .filter(col("jaccard") >= 0.5)
        .select(col("id1"), col("id2"), round(col("jaccard"), 4).as("jaccard"))
      println("  pairs=" + out.count())
    }
    time("full d03 (end-to-end)") {
      Dedup.d03DedupMinhash(spark, dir).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
