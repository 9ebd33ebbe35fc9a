package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Round-18 profiler, part 3: job-level time accounting for one query —
  * prints every Spark job's wall time and description so harness floors
  * (drops, micro-batches, collects) are attributable. Scratch tool. */
object ProfileR18c {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q47_join_filesource")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
          lines.add(f"job ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $desc")
        }
      }
    })
    graft.core.Tables.documents(spark, sfDir).count()
    val fn = graft.SparkEntry.queries(name)
    // run twice; the second is steady-state
    for (iter <- 1 to 2) {
      graft.core.SessionMemo.clear(spark)
      spark.catalog.clearCache()
      lines.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(s"=== $name iter $iter: total $total s ===")
      lines.forEach(l => println(s"[job$iter] $l"))
    }
    spark.stop()
  }
}
