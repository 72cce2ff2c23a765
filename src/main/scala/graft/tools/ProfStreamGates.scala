package graft.tools

/**
 * Streaming-gate overhead profile (r16 verdict item 4): runs the six
 * heaviest gates twice with GRAFT_STREAM_DEBUG per-phase stamps —
 * rep 1 pays the feed collect, rep 2 isolates the steady-state
 * micro-batch/startup/teardown split the sweep actually pays.
 * Dev-only.
 */
object ProfStreamGates {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.get()
    val gates = Seq("e11_stream_window_gate", "e13_stream_join_gate",
      "e16_stream_static_gate", "e17_stream_file_gate",
      "e19_stream_ingest_gate", "e15_stream_session_gate")
    for (rep <- 1 to 2; g <- gates) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(g)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"PROF $g rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
