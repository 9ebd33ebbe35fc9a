package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions._

/** Scratch profiler for dedup hotspots (not part of the library API). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    Tables.documents(spark, sfDir).count()

    val d = Tables.documents(spark, sfDir)
      .withColumn("hs", tokenHashes(col("text")))
      .select(col("doc_id"), simhashFromHashes(col("hs")).as("sh"))
      .withColumn("band", graft.functions.KeyAlgebra.ldiv(col("sh"), lit(1L << 30)))
      .cache()
    time("d04 cache fill (simhash)") { d.count() }
    val joined = d.as("x").join(d.as("y"),
      col("x.band") === col("y.band") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 2)
    time("d04 band join + filter") { joined.write.format("noop").mode("overwrite").save() }
    time("d04 orderBy output") {
      joined.orderBy("doc_a", "doc_b").write.format("noop").mode("overwrite").save()
    }
    d.unpersist()
    spark.stop()
  }
}
