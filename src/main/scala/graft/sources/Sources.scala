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
