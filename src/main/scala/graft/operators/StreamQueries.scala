package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.core.Tables
import graft.functions.KeyAlgebra

/** Streaming operators run under the batch oracle (like d09): the
  * events table flows through the REAL micro-batch engine and the
  * emitted results must hash-match the equivalent batch SQL — proving
  * watermark/window semantics converge to the offline answer.
  */
object StreamQueries {

  /** q23 — watermarked tumbling 1 h windows over the event stream in
    * append mode: two ts-ordered micro-batches plus a far-future
    * sentinel event advance the watermark past every real window, so
    * the closed-window stream equals the batch aggregation (q16's
    * shape). The sentinel's own (still-open) window is excluded. */
  def q23_stream_window(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = Tables.events(s, dir).select(col("ts"), col("value"))
      .orderBy("ts").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val sentinelNs = rows.last._1 + 7200L * 1000000000L
    val mid = rows.length / 2
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
    val agg = in.toDF().toDF("tns", "value")
      // nanos → timestamp at µs precision (exact integer truncation)
      .withColumn("ts", timestamp_micros(KeyAlgebra.ldiv(col("tns"), lit(1000L))))
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 hour").as("win"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(unix_timestamp(col("win.start")).as("window_start"),
        col("n"), col("sum_value"))
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("q23_stream_out").start()
    try {
      in.addData(rows.take(mid).toIndexedSeq)
      q.processAllAvailable()
      in.addData((rows.drop(mid) :+ (sentinelNs, 0.0)).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    // materialize the (small) window set and release the sink table so
    // session memory doesn't accumulate across a long query sweep
    val sentinelHour = sentinelNs / 3600000000000L * 3600L
    val closed = s.table("q23_stream_out")
      .filter(col("window_start") < sentinelHour)
    val result = closed.collect().toIndexedSeq
    val schema = closed.schema
    s.catalog.dropTempView("q23_stream_out")
    s.createDataFrame(s.sparkContext.parallelize(result, 1), schema)
      .orderBy("window_start")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_stream_window" -> (q23_stream_window _),
  )

  val oracles: Map[String, String] = Map(
    "q23_stream_window" ->
      """SELECT epoch_ns(ts) // 3600000000000 * 3600 AS window_start,
         count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1 ORDER BY window_start""",
  )
}
