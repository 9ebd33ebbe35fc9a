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

  test("q83 protocol: a forcibly redelivered batchId is replayed once and published once") {
    val s = spark
    import s.implicits._
    import java.io.File
    val tmp = java.nio.file.Files.createTempDirectory("graft_e1x_spec").toString
    val watch = new File(tmp, "watch"); watch.mkdirs()
    val outDir = new File(tmp, "out"); outDir.mkdirs()
    val ckpt = new File(tmp, "ckpt").getAbsolutePath
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    def start() = s.readStream.schema(schema).parquet(watch.getAbsolutePath)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], id: Long) =>
        graft.operators.StreamQueries.idempotentBatchWrite(outDir, id, df.toDF())
      }
      .option("checkpointLocation", ckpt).start()
    // run 1: one batch, fully committed by the engine
    val q1 = start()
    try {
      Seq(1L, 2L, 3L).toDF("v").coalesce(1)
        .write.mode("append").parquet(watch.getAbsolutePath)
      q1.processAllAvailable()
    } finally q1.stop()
    // crash window: sink published, engine commit lost
    graft.operators.StreamQueries.dropLatestCommit(ckpt)
    // run 2: the engine REDELIVERS the batch, then processes new data
    val q2 = start()
    try {
      Seq(10L, 20L).toDF("v").coalesce(1)
        .write.mode("append").parquet(watch.getAbsolutePath)
      q2.processAllAvailable()
    } finally q2.stop()
    // the ledger proves the redelivery: batch 0 attempted TWICE
    val attempts = scala.io.Source.fromFile(new File(outDir, "attempts.log"))
      .getLines().toSeq
    assert(attempts.count(_ == "0") == 2,
      s"expected batch 0 redelivered, attempts = $attempts")
    // ...and the published data holds exactly one copy of everything
    val published = outDir.listFiles()
      .filter(f => f.isDirectory &&
        new File(outDir, f.getName + ".committed").exists())
      .map(_.getAbsolutePath)
    val vals = s.read.schema(schema).parquet(published.toSeq: _*)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(vals == Seq(1L, 2L, 3L, 10L, 20L))
    org.apache.commons.io.FileUtils.deleteQuietly(new File(tmp))
  }

  test("q80 ledger: watermark-dropped accounting reconciles to the row level") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val out = graft.operators.StreamQueries
      .q80_stream_late_ledger(spark, dir).collect()
    val ledger = out.filter(_.getLong(0) < 0)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ev = graft.core.Tables.events(spark, dir)
      .select(org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("ts")).collect()
    val nOdd = ev.count(_.getLong(0) % 2 != 0).toLong
    val oddWindows = ev.filter(_.getLong(0) % 2 != 0)
      .map(_.getLong(1) / 3600000000000L).distinct.length.toLong
    assert(ledger(-4L) == ev.length + 4, "fed = events + 4 injected")
    assert(ledger(-3L) == oddWindows,
      "engine counter drops one merged row per late WINDOW (the " +
        "post-partial-aggregation granularity this harness documents)")
    assert(ledger(-2L) == nOdd,
      "reconciled fed - emitted - in-flight must equal the late ROWS")
    assert(ledger(-1L) == 1, "only the sentinel window stays in flight")
    // the emitted windows carry no late contribution: every window row
    // count must be reproduced by the even-id rows + injected rows alone
    val emitted = out.filter(_.getLong(0) >= 0).map(_.getLong(1)).sum
    val nEven = ev.count(_.getLong(0) % 2 == 0).toLong
    assert(emitted == nEven + 3, "emitted = even rows + anchor + 2 fresh")
  }

  test("q89 chained stateful: dedup feeds windows inside one query") {
    // the chained pipeline must converge to q23's single-stateful
    // windows despite in-batch AND cross-batch redelivery — the dedup
    // store absorbing the duplicates before they reach window state
    // (the in-query require already pins stateOperators == 2)
    val chained = graft.operators.StreamQueries
      .q89_stream_chained_stateful(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val single = graft.operators.StreamQueries
      .q23_stream_window(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(chained == single,
      "chained dedup->window diverged from the clean single-stage windows")
    assert(chained.nonEmpty)
  }

  test("q91 streaming WARC ledger equals the qn20 batch books") {
    // two landed drops through the binaryFile stream must accumulate to
    // the one-shot batch walk: a lost record after a corrupt member or
    // a double-counted shard shifts the shard books
    val streamed = graft.operators.StreamQueries
      .q91_stream_warc_ingest(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val batch = graft.operators.NetCDFQueries
      .qn20_warc_ingest(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(streamed == batch, "streaming ledger diverged from batch books")
    assert(streamed.map(_._4).sum > 0, "fixture lost its quarantine class")
  }
}
