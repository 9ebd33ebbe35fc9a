package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for q76 steady-state cost (not part of the API). */
object ProfileQ76 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 3).foreach { i =>
      time(s"q76 rep $i") {
        graft.operators.RelationalQueries
          .q76_partition_evolution(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
  }
}
