package graft.tools

import org.apache.spark.sql.streaming.StreamingQueryListener

/**
 * Micro-batch duration breakdown for the streaming gates (r21): a
 * session-wide StreamingQueryListener prints each progress event's
 * durationMs map (queryPlanning / getBatch / addBatch / walCommit /
 * commitOffsets / triggerExecution) and per-operator state commit
 * times, so the "batch0 is the whole gate" wall time from
 * GRAFT_STREAM_DEBUG decomposes into engine phases. Dev-only.
 */
object ProfGateBatch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val gates = if (args.length > 1) args.drop(1).toSeq
      else Seq("e11_stream_window_gate", "e19_stream_ingest_gate")
    val spark = graft.GraftSession.get()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        System.err.println(s"[prog] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=$dur")
        p.stateOperators.foreach { so =>
          System.err.println(s"[prog]   state op=${so.operatorName} " +
            s"commitMs=${so.commitTimeMs} rowsUpdated=${so.numRowsUpdated} " +
            s"memUsed=${so.memoryUsedBytes}")
        }
      }
    })
    for (rep <- 1 to 2; g <- gates) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(g)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"PROF $g rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
