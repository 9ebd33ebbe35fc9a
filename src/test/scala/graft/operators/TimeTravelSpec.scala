package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** q52 snapshot semantics: what each version must and must not see. */
class TimeTravelSpec extends SparkSpec {

  private lazy val rows =
    RelationalQueries.q52_time_travel(spark, sf("sf0.01")).collect()
      .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap

  test("q52 appends are monotone: v2 sees everything v1 saw") {
    rows.keys.filter(_._1 == 1L).foreach { case (_, st) =>
      assert(rows((1L, st))._1 <= rows((2L, st))._1,
        s"status $st shrank from v1 to v2")
    }
  }

  test("q52 v3 rewrite deleted exactly the pre-1998 'F' rows") {
    val o = graft.core.Tables.orders(spark, sf("sf0.01"))
    val preF = o.filter(col("o_orderdate") < lit("1998-01-01") &&
      col("o_orderstatus") === "F").count()
    val post98F = o.filter(col("o_orderdate") >= lit("1998-01-01") &&
      col("o_orderstatus") === "F").count()
    assert(preF > 0, "fixture needs pre-1998 'F' rows to delete")
    // v2 'F' = pre-2000 'F'; v3 'F' = all-time 'F' minus the deleted set
    val allF = preF + post98F
    assert(rows((3L, "F"))._1 == allF - preF)
    // non-'F' statuses at v3 cover the whole table
    rows.keys.filter(k => k._1 == 3L && k._2 != "F").foreach { case (_, st) =>
      assert(rows((3L, st))._1 ==
        o.filter(col("o_orderstatus") === st).count())
    }
  }

  test("q81 cherry-pick replays exactly one commit's file set onto main") {
    val out = RelationalQueries
      .q81_branch_cherry_pick(spark, sf()).collect()
      .map(r => ((r.getString(0), r.getLong(1), r.getString(2)),
        (r.getLong(3), r.getLong(4)))).toMap
    val o = graft.core.Tables.orders(spark, sf())
    // main@4 = the FULL table: the pick restored exactly v3's dropped
    // rows — nothing more (a merge would have dragged the branch's
    // stale base and shifted every status count)
    o.groupBy("o_orderstatus").count().collect().foreach { r =>
      assert(out(("main", 4L, r.getString(0)))._1 == r.getLong(1),
        s"main@4 status ${r.getString(0)}")
    }
    // main@3 is untouched by the branch: still missing the F/pre-98 rows
    val preF = o.filter(col("o_orderdate") < lit("1998-01-01") &&
      col("o_orderstatus") === "F").count()
    val allF = o.filter(col("o_orderstatus") === "F").count()
    assert(out(("main", 3L, "F"))._1 == allF - preF)
    // audit@3 stacks its commit on the base snapshot: the quarantined
    // rows count TWICE (present in both fa and fe)
    val pre2000F = o.filter(col("o_orderdate") < lit("2000-01-01") &&
      col("o_orderstatus") === "F").count()
    assert(out(("audit", 3L, "F"))._1 == pre2000F + preF)
    // and the pick carried ONLY F rows: every other status on main@4
    // equals main@3 exactly (count AND checksum)
    out.keys.filter(k => k._1 == "main" && k._2 == 4L && k._3 != "F")
      .foreach { k =>
        assert(out(k) == out(("main", 3L, k._3)), s"status ${k._3} moved")
      }
  }

  test("q85 AS OF: inclusive boundary, version agreement with q52, pre-history rejects") {
    val asof = RelationalQueries.q85_time_travel_asof(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    // resolved versions: mid-history -> 1, AT commit 2 -> 2, after -> 3
    assert(asof.map(t => t._1 -> t._2).distinct.sorted.toSeq ==
      Seq(1000090000L -> 1L, 1000172800L -> 2L, 1000999999L -> 3L))
    // the AT-commit-2 probe's rows must equal q52's VERSION AS OF 2
    val v52 = RelationalQueries.q52_time_travel(spark, sf()).collect()
      .filter(_.getLong(0) == 2L)
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    val v85 = asof.filter(_._1 == 1000172800L)
      .map(t => (t._3, t._4, t._5)).sortBy(_._1)
    assert(v85.toSeq == v52.toSeq, "timestamp and version reads diverge")
    // a probe before the first commit fails loudly (no silent earliest)
    assert(RelationalQueries.q52CommitTs(1L) > 1000000001L)
  }
}
