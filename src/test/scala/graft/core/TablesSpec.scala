package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.SparkSpec

/** Guards the events-table encoding contract: whatever physical type the
  * driver ships `ts` as, [[Tables.events]] must deliver nanos-since-epoch
  * longs. The round-9 regression (driver moved TIMESTAMP(NANOS) →
  * timestamp[us]; 12 event-time queries failed at analysis) is exactly
  * the class this pins. */
class TablesSpec extends SparkSpec {

  test("events.ts arrives as nanos-long from the shipped testdata") {
    val df = Tables.events(spark, sf())
    assert(df.schema("ts").dataType == LongType)
    // sanity of magnitude: nanos since epoch for any plausible date is
    // > 1e18 ns (2001-09-09); micros/millis/seconds would be 3/6/9
    // orders smaller — catches a wrong-unit conversion, not just type
    val lo = df.agg(min("ts")).head().getLong(0)
    assert(lo > 1000000000000000000L, s"ts=$lo does not look like nanos")
  }

  test("a timestamp-typed ts and its nanos-long twin normalize identically") {
    val d = Files.createTempDirectory("graft_events_enc").toString
    val s = spark
    import s.implicits._
    val base = Seq(
      (1L, 1700000000123456L, 7L, "click", 1.5, "{}"),
      (2L, 1700000100654321L, 8L, "purchase", 2.5, "{}"))
    def tsOf(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(us / 1000)
      t.setNanos((us % 1000000L).toInt * 1000)
      t
    }
    // twin A: real timestamp[us] column (the round-9+ driver encoding)
    base.map { case (e, us, u, t, v, p) => (e, tsOf(us), u, t, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/a/events.parquet")
    // twin B: raw nanos-as-long (the pre-round-9 contract, already long)
    base.map { case (e, us, u, t, v, p) => (e, us * 1000L, u, t, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/b/events.parquet")
    val a = Tables.events(spark, s"$d/a").select("event_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = Tables.events(spark, s"$d/b").select("event_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.sameElements(b), s"encodings diverge: ${a.toSeq} vs ${b.toSeq}")
    assert(a.head._2 == 1700000000123456L * 1000L)
  }
}
