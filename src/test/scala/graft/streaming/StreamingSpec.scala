package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  test("appendStream accumulates micro-batches like chunked multi_insert") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = MemoryStream[(Long, Double)]
    @volatile var latest: Option[org.apache.spark.sql.DataFrame] = None
    val q = Streaming.appendStream(in.toDF().toDF("id_dim", "measure"),
      df => latest = Some(df))
    try {
      in.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      assert(latest.get.count() == 2)
      in.addData((3L, 3.0))
      q.processAllAvailable()
      assert(latest.get.count() == 3)
      assert(latest.get.agg(sum("measure")).head.getDouble(0) == 6.0)
    } finally q.stop()
  }

  test("windowedAgg groups a batch view by tumbling window") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("2026-01-01 00:05:00", "a", 1.0),
      ("2026-01-01 00:15:00", "a", 2.0),
      ("2026-01-01 01:05:00", "b", 3.0))
      .toDF("tss", "k", "v")
      .withColumn("ts", to_timestamp(col("tss")))
    // batch DataFrames accept the same plan (window fn is shared)
    val out = df.groupBy(window(col("ts"), "1 hour").as("win"), col("k"))
      .agg(count(lit(1)).as("n"), sum("v").as("sum_value"))
      .select(col("win.start").as("window_start"), col("k"), col("n"), col("sum_value"))
      .orderBy("window_start", "k")
      .collect()
    assert(out.length == 2)
    assert(out(0).getLong(2) == 2 && out(0).getDouble(3) == 3.0)
  }

  test("windowedAgg over a real stream: watermark drops late data, windows close") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = MemoryStream[(String, String, Double)]
    val events = in.toDF().toDF("tss", "k", "v")
      .withColumn("ts", to_timestamp(col("tss")))
    val agg = Streaming.windowedAgg(events, "ts", "k", "v",
      window_ = "10 minutes", watermark = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("winagg")
      .outputMode("append").start()
    try {
      in.addData(("2026-01-01 00:01:00", "a", 1.0), ("2026-01-01 00:04:00", "a", 2.0))
      q.processAllAvailable()
      // advance event time far past the first window + watermark → closes it
      in.addData(("2026-01-01 01:00:00", "a", 9.0))
      q.processAllAvailable()
      // a very late event for the closed window must be dropped
      in.addData(("2026-01-01 00:02:00", "a", 100.0))
      in.addData(("2026-01-01 02:00:00", "a", 0.5)) // push watermark again
      q.processAllAvailable()
      val rows = s.table("winagg").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(2), r.getDouble(3)))
      assert(rows.contains(("2026-01-01 00:00:00.0", 2L, 3.0)),
        s"first window missing/late row not dropped: ${rows.toSeq}")
      assert(!rows.exists(_._3 == 103.0), "late data leaked into closed window")
    } finally q.stop()
  }

  test("stream-to-engine: micro-batches become a live dialect-queryable fragment") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val srv = new graft.engine.IoServer(s)
    val ses = srv.newSession()
    val in = MemoryStream[(Long, Double)]
    val q = Streaming.appendStream(in.toDF().toDF("id_dim", "measure"),
      df => srv.updateFragment("default", "live", df))
    try {
      in.addData((1L, 10.0), (2L, 20.0))
      q.processAllAvailable()
      assert(ses.execute("operation=select;field=id_dim;from=live").get.count() == 2)
      in.addData((3L, 30.0))
      q.processAllAvailable()
      val r = ses.execute(
        "operation=select;field=id_dim|measure;from=live;order=id_dim;order_dir=DESC")
        .get.head()
      assert(r.getLong(0) == 3L && r.getDouble(1) == 30.0)
    } finally q.stop()
  }

  test("sessionize closes sessions after the inactivity gap") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = MemoryStream[Streaming.SessionEvent]
    val out = Streaming.sessionize(in.toDS(), gapMs = 60000,
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      def ev(uid: Long, minute: Int, v: Double) = Streaming.SessionEvent(
        uid, java.sql.Timestamp.valueOf(f"2026-01-01 00:$minute%02d:00"), v)
      in.addData(ev(1, 0, 1.0), ev(1, 1, 2.0), ev(1, 10, 5.0))
      q.processAllAvailable()
      // first session (2 events) closed by the 9-minute gap
      val rows = s.table("sessions").collect()
      assert(rows.exists(r => r.getLong(0) == 1 && r.getLong(1) == 2 &&
        r.getDouble(2) == 3.0))
    } finally q.stop()
  }
}
