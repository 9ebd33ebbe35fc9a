package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scratch profiler for the round-7 bench outliers (qn07/qn08/qn09 vs
  * their qn03 twin shape; t04/m01/m02 noise check). Runs each query
  * several times in one JVM so first-use JIT / classloading separates
  * from steady-state cost. Not part of the library API. */
object ProfileRound7 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "qn03_zarr_roundtrip", "qn07_zarr_v3_roundtrip", "qn09_cf_unpack",
      "qn08_export_formats", "t04_bpe_tokens", "m01_media_features",
      "m02_frame_sample")
    val reps = sys.env.getOrElse("PROF_REPS", "3").toInt
    for (n <- names; r <- 1 to reps) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(f"[prof] $n run$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
