package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables
import graft.functions.KeyAlgebra.ldiv

/** q24 (as-of join) and q25 (range join): the scale plans (union+window,
  * bucket+refine) cross-checked against the naive quadratic definitions,
  * which are affordable at the smoke scale factor. */
class TemporalJoinSpec extends SparkSpec {

  private lazy val ev = Tables.events(spark, sf())
    .withColumn("ts", ldiv(col("ts"), lit(1000L)))
    .cache()

  test("q24 as-of join matches the naive most-recent-purchase definition") {
    val out = RelationalQueries.q24_asof_join(spark, sf()).collect()
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value").collect()
    assert(out.length == clicks.length)
    // naive: per user, the purchases sorted by ts; match = last at-or-before
    val purch = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "value", "event_id").collect()
      .groupBy(_.getLong(0))
      .map { case (u, rs) =>
        // same tie rule as the query: one row per ts, max event_id wins
        u -> rs.groupBy(_.getLong(1)).map { case (ts, g) =>
          (ts, g.maxBy(_.getLong(3)).getDouble(2))
        }.toSeq.sortBy(_._1)
      }
    val expect = clicks.map { c =>
      val m = purch.getOrElse(c.getLong(1), Seq.empty)
        .takeWhile(_._1 <= c.getLong(2)).lastOption
      (c.getLong(0), m.map(_._1).getOrElse(-1L), m.map(_._2).getOrElse(0.0))
    }.sortBy(_._1)
    val got = out.map(r => (r.getLong(0), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == expect.toSeq)
  }

  test("q25 range join matches the naive inequality join") {
    val out = RelationalQueries.q25_range_join(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts").collect().map(r => (r.getLong(0), r.getLong(1)))
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts").collect()
    val naive = errors.map { e =>
      e.getLong(0) -> clicks.count(c =>
        c._1 == e.getLong(1) && math.abs(c._2 - e.getLong(2)) <= 300000000L)
    }.filter(_._2 > 0).toMap
    assert(out == naive)
  }

  test("q26 streaming as-of enrichment equals the q24 batch answer") {
    val batch = RelationalQueries.q24_asof_join(spark, sf()).collect()
      .map(_.toSeq).toIndexedSeq
    val stream = StreamQueries.q26_stream_asof(spark, sf()).collect()
      .map(_.toSeq).toIndexedSeq
    assert(stream == batch)
  }

  test("q27 streaming sessionization equals the q17 batch answer") {
    val batch = RelationalQueries.q17_sessionize_batch(spark, sf()).collect()
      .map(_.toSeq).toIndexedSeq
    val stream = StreamQueries.q27_stream_sessionize(spark, sf()).collect()
      .map(_.toSeq).toIndexedSeq
    assert(stream == batch)
  }

  test("q42 engine-native streaming session_window equals the q40 batch answer") {
    val batch = RelationalQueries.q40_session_window(spark, sf()).collect()
      .map(_.toSeq).toIndexedSeq
    val stream = StreamQueries.q42_stream_session_window(spark, sf())
      .collect().map(_.toSeq).toIndexedSeq
    assert(stream == batch)
  }

  test("q44 streaming outer join equals the batch left interval join") {
    import org.apache.spark.sql.functions._
    val e = Tables.events(spark, sf())
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), graft.functions.KeyAlgebra.ldiv(col("ts"),
        lit(1000L)).as("us"), col("user_id"), col("event_type"))
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("us").as("cus"),
        col("user_id"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("us").as("pus"),
        col("user_id").as("pu"))
    val batch = c.join(p, col("user_id") === col("pu") &&
        col("pus").between(col("cus") - 86400000000L, col("cus")), "left")
      .select(col("click_id"), coalesce(col("pid"), lit(-1L)).as("purchase_id"),
        col("user_id"), coalesce(col("cus") - col("pus"), lit(-1L)).as("lag_us"))
      .orderBy("click_id", "purchase_id")
      .collect().map(_.toSeq).toIndexedSeq
    val stream = StreamQueries.q44_stream_outer_join(spark, sf())
      .collect().map(_.toSeq).toIndexedSeq
    assert(stream == batch)
    // outer rows actually exercised: some clicks must be purchase-less
    assert(stream.exists(_(1) == -1L), "no null-extended rows in fixture")
  }

  test("q28 streaming top-k equals the batch TopKPerKey operator") {
    val base = Tables.events(spark, sf())
      .select(col("user_id"), col("event_id"), col("value"))
    val batch = graft.plans.TopKPerKey(base, Seq("user_id"), "value",
        "event_id", 3)
      .select(col("user_id"), col("rank"), col("event_id"), col("value"))
      .orderBy("user_id", "rank").collect().map(_.toSeq).toIndexedSeq
    val stream = StreamQueries.q28_stream_topk(spark, sf())
      .collect().map(_.toSeq).toIndexedSeq
    assert(stream == batch)
  }

  test("q25 bucket explosion produces no duplicate (error, click) pairs") {
    // every pair lands in exactly one of the error's 3 candidate buckets:
    // counts must not exceed the per-user click totals
    val out = RelationalQueries.q25_range_join(spark, sf())
    val clicksPerUser = ev.filter(col("event_type") === "click")
      .groupBy("user_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val errUser = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    out.collect().foreach { r =>
      assert(r.getLong(1) <= clicksPerUser(errUser(r.getLong(0))))
    }
  }
}
