package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the driver-provided test data layout. */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts arrives in whatever physical type the generator used:
    // TIMESTAMP(NANOS) → long ns (see GraftSession), naive µs →
    // TIMESTAMP_NTZ. Normalize both to µs TimestampType (session tz is
    // UTC, so the NTZ cast is value-preserving), matching a DuckDB
    // CAST(ts AS TIMESTAMP); downstream epoch math (unix_micros,
    // cast-to-double) rejects NTZ outright in Spark 4.
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        // the NTZ→TimestampType cast reinterprets the naive value in
        // the SESSION zone: value-preserving only under UTC. A session
        // built outside GraftSession with a local zone would silently
        // shift every epoch downstream — fail loudly instead.
        require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
          "Tables: events.ts is TIMESTAMP_NTZ; the cast to TimestampType is only " +
            "value-preserving with spark.sql.session.timeZone=UTC (use GraftSession)")
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
