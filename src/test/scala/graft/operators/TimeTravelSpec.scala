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
}
