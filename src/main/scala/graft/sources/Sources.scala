package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/**
 * Input readers mirroring the reference's format handling
 * (/root/reference/src/polars_mas/config.py:110-121): parquet, csv,
 * tsv, txt (tab-delimited), with user-supplied null markers.
 *
 * Parquet carries nulls in the schema; the delimited readers accept a
 * list of null markers. Spark's csv source takes ONE `nullValue`, so
 * the first marker rides the scan (vectorized) and any further
 * markers are nulled by a projection over the string-typed columns —
 * numeric columns can't contain a surviving marker string (a column
 * holding one would have inferred as string).
 */
object Sources {

  def read(spark: SparkSession, path: String, nullValues: Seq[String] = Nil,
      format: Option[String] = None): DataFrame = {
    val fmt = format.getOrElse(path.split('.').last.toLowerCase)
    fmt match {
      case "parquet" => spark.read.parquet(path)
      case "csv" => delimited(spark, path, ",", nullValues)
      case "tsv" | "txt" => delimited(spark, path, "\t", nullValues)
      case other => throw new IllegalArgumentException(s"Unsupported input file format: .$other")
    }
  }

  /**
   * PheCode definitions loader (reference constants.py:6-16): reads a
   * user-pointed copy of the public PheWAS-catalog CSV
   * (phecode_definitions1.2.csv layout) and selects the five
   * annotation columns. All columns load as strings — `phecode` MUST
   * stay string ("008" ≠ "8", schema_overrides in the reference) and
   * the rest are labels. The frame is dimension-sized (~1,800 rows);
   * every join against it broadcasts.
   */
  /** One reader body for both catalog loaders — options and the
    * 5-column projection must never diverge between the path and the
    * bundled-resource entry points. */
  private def phecodeReader(spark: SparkSession) =
    spark.read.option("header", "true").option("inferSchema", "false")

  private def phecodeSelect(df: DataFrame): DataFrame =
    df.select("phecode", "phenotype", "sex", "category", "category_number")

  def phecodeDefs(spark: SparkSession, path: String): DataFrame =
    phecodeSelect(phecodeReader(spark).csv(path))

  /**
   * The bundled public PheCode catalog (phecode_definitions v1.2, the
   * same public data the reference redistributes and auto-joins on
   * `--phewas`/`--flipwas` — constants.py:6-16). Shipped as a
   * classpath resource so annotation works with no user-supplied
   * file; `--phecode-defs` stays available as an override. The
   * ~1.9k lines are read driver-side and handed to the CSV reader as
   * an in-memory Dataset (full quoting semantics, no temp file) — a
   * driver-local path would break on any real cluster, where the csv
   * scan tasks run on executors that can't see the driver's /tmp.
   */
  def bundledPhecodeDefs(spark: SparkSession): DataFrame = {
    val in = getClass.getResourceAsStream("/graft/phecode_definitions1.2.csv")
    require(in != null, "bundled phecode_definitions1.2.csv missing from classpath")
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
      finally in.close()
    import spark.implicits._
    phecodeSelect(phecodeReader(spark).csv(spark.createDataset(lines)))
  }

  /**
   * Bucketed table writer — the co-location path for repeated large
   * joins/aggregations on the same key (the 100 TB pattern: pay the
   * shuffle ONCE at write time, then every downstream join on the
   * bucket key is exchange-free). Buckets are hash(key) mod n and each
   * bucket is sorted, so a sort-merge join over two tables bucketed
   * the same way needs neither Exchange nor Sort — verified by the
   * bucketing spec against the physical plan.
   */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val sc = if (sortCols.isEmpty) Seq(key) else sortCols
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(sc.head, sc.tail: _*)
      .saveAsTable(table)
  }

  /**
   * Hive-style partitioned parquet writer — the layout path for
   * columns queries FILTER on (language, date, split): each partition
   * value becomes a directory, so a reader's `WHERE lang = 'en'`
   * prunes to that directory at PLANNING time (PartitionFilters in
   * the scan, verified by the spec) and a 100 TB corpus scan touches
   * only the selected partitions' files. Choose low-cardinality
   * columns: every distinct value is a directory, and a
   * high-cardinality partition key shatters the table into millions
   * of small files (use `writeBucketed` for join keys instead).
   */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "writePartitioned: no partition columns")
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  private def delimited(spark: SparkSession, path: String, delim: String,
      nullValues: Seq[String]): DataFrame = {
    var reader = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("delimiter", delim)
    nullValues.headOption.foreach(v => reader = reader.option("nullValue", v))
    val df = reader.csv(path)
    val rest = nullValues.drop(1)
    if (rest.isEmpty) df
    else {
      val cols = df.schema.fields.map { f =>
        if (f.dataType == StringType)
          when(col(f.name).isin(rest: _*), lit(null)).otherwise(col(f.name)).as(f.name)
        else col(f.name)
      }
      df.select(cols.toIndexedSeq: _*)
    }
  }
}
