package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** q62 equality-delete merge-on-read: sequence-number scoping is the
  * semantic that distinguishes eq-deletes from a plain anti-join —
  * pinned here against an in-memory replay of the lifecycle. */
class EqDeleteSpec extends SparkSpec {

  test("q62: re-inserted keys outlive the older delete; non-PK delete kills both generations") {
    val li = Tables.lineitem(spark, sf())
      .select(col("l_orderkey").cast("long"),
        col("l_linenumber").cast("long"), col("l_suppkey").cast("long"),
        col("l_quantity").cast("double"), col("l_shipdate").cast("string"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(4)))
    // replay: gen0 (seq1) + bumped re-inserts (seq3) for orderkey%19==3,
    // PK delete @2 kills only gen0 copies of those keys, supp delete @4
    // kills every generation of suppkey%23==7
    val live = li.flatMap { case (ok, ln, sk, q, sd) =>
      val gens = Seq((q, 1L)) ++
        (if (ok % 19 == 3) Seq((q + 5, 3L)) else Nil)
      gens.filter { case (_, seq) =>
        !(ok % 19 == 3 && seq < 2) && !(sk % 23 == 7 && seq < 4)
      }.map { case (qq, _) => (sd.substring(0, 7), qq, sk) }
    }
    val exp = live.groupBy(_._1).map { case (m, rows) =>
      (m, (rows.length.toLong,
        math.round(rows.map(_._2).sum * 100) / 100.0,
        rows.map(_._3).distinct.length.toLong))
    }
    val got = RelationalQueries.q62_equality_deletes(spark, sf())
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(got.keySet === exp.keySet)
    exp.foreach { case (m, (n, q, s)) =>
      assert(got(m)._1 === n, s"n_items month $m")
      assert(math.abs(got(m)._2 - q) < 1e-6, s"sum_qty month $m")
      assert(got(m)._3 === s, s"n_supp month $m")
    }
    // the scoping must matter: some re-inserted rows actually survived
    val reinserts = li.filter(r => r._1 % 19 == 3 && r._3 % 23 != 7)
    assert(reinserts.nonEmpty)
  }
}
