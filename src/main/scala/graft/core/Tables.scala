package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * All queries take a scale-factor directory and resolve tables through
  * here so the same code runs at sf0.001 (smoke), sf0.01 (correctness)
  * and sf0.1+ (bench). At cluster scale the same API points at a
  * partitioned object-store prefix — nothing here assumes local files.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "region")
  /** Events with `ts` normalized to the engine-internal contract:
    * nanos-since-epoch as LONG, whatever the physical parquet encoding.
    *
    * The driver has shipped this table under two encodings so far —
    * TIMESTAMP(NANOS) (readable only as a raw long via
    * `spark.sql.legacy.parquet.nanosAsLong`) and plain `timestamp[us]`
    * (arriving as TIMESTAMP/TIMESTAMP_NTZ). Every event-time operator
    * downstream assumes nanos-long, so the encoding is absorbed HERE,
    * once, rather than in 18 queries. Session timezone is UTC in every
    * entry point, so an NTZ local datetime maps to the same epoch the
    * DuckDB oracles' `epoch_ns(ts)`/`epoch_us(ts)` produce. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = t(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case LongType => df // legacy nanos-as-long read — already the contract
      case _ => // TIMESTAMP or TIMESTAMP_NTZ: µs precision → exact ×1000
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "embeddings")
}
