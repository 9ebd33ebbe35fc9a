package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  def events(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "embeddings")
}
