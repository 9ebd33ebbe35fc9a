package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scratch profiler for d21 stage costs (not part of the library API). */
object ProfileD21 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    Tables.documents(spark, sfDir).count()
    val K = 20
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("len"))
    def pos = docs
      .select(col("doc_id"), col("text"), col("len"),
        explode(when(col("len") < K, array().cast("array<int>"))
          .otherwise(sequence(lit(1), (col("len") - (K - 1)).cast("int"))))
          .as("p"))
      .select(col("doc_id"), col("len"), col("p").cast("long").as("p"),
        col("text").substr(col("p"), lit(K)).as("g"))
    time("pos explode count")(println(pos.count()))
    time("crossDoc countDistinct")(println(
      pos.groupBy("g").agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).count()))
    time("crossDoc two-level")(println(
      pos.select("g", "doc_id").groupBy("g", "doc_id").agg(count(lit(1)))
        .groupBy("g").agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= 2).count()))
    val crossDoc = pos.groupBy("g")
      .agg(countDistinct(col("doc_id")).as("nd")).filter(col("nd") >= 2)
    time("semi join count")(println(
      pos.join(crossDoc, Seq("g"), "left_semi").count()))
    time("hash-key semi join count")(println {
      val posH = pos.withColumn("gh", xxhash64(col("g")))
      val cdH = posH.groupBy("gh")
        .agg(countDistinct(col("doc_id")).as("nd")).filter(col("nd") >= 2)
      posH.join(cdH, Seq("gh"), "left_semi").count()
    })
    spark.stop()
  }
}
