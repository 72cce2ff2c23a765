package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, baseOutDir) = args
    val spark = GraftSession.get()
    // dev-only subset filter (comma-separated names) for fast local
    // iteration on new queries; the driver never sets it
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // subset runs land in a sibling dir: a partial oracle_sql.json must
    // never overwrite a full run's, or a later gate pass over stale
    // per-query dirs would report full success on partial coverage
    val outDir = if (only.isDefined) baseOutDir + "-subset" else baseOutDir
    new java.io.File(outDir).mkdirs()
    // the gate iterates oracle_sql.json, so a query registered WITHOUT
    // an oracle entry silently drops out of the hash compare — warn
    SparkEntry.queries.keys.filterNot(SparkEntry.oracleSql.contains).toSeq.sorted
      .foreach(n => System.err.println(s"[verify] WARNING: $n has no oracleSql entry"))
    def keep(name: String): Boolean = only.forall(_.contains(name))
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
