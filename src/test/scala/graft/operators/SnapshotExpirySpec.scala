package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q77 snapshot expiry: pins the three claims — the orphan is really
  * gone from disk, the rebased log carries ONLY the head, and the head
  * read after expiry matches a direct source replay. */
class SnapshotExpirySpec extends SparkSpec {

  test("q77: orphan deleted on disk, log rebased, head read exact") {
    val out = RelationalQueries.q77_snapshot_expiry(spark, sf())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList

    val tag = graft.core.SessionMemo.pathTag(spark, sf())
    def f(n: String) = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_q77_${n}_$tag")
    // fa (v1's file, removed by the v3 rewrite) must be PHYSICALLY gone;
    // the three retained files must survive
    assert(!f("a").exists(), "orphan fa must be deleted")
    Seq("b", "c", "d").foreach(n => assert(f(n).exists(), s"f$n must survive"))
    // the rebased log holds only head entries
    val log = spark.read.parquet(f("log").getAbsolutePath).collect()
    assert(log.nonEmpty && log.forall(_.getLong(0) == 3L))
    assert(log.forall(_.getString(1) == "add"))

    val expected = graft.core.Tables.orders(spark, sf())
      .filter(col("o_orderdate") >= lit("1998-01-01") ||
        col("o_orderstatus") =!= "F")
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * lit(100)).cast("long")).as("t"))
      .orderBy("status")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        3L, 1L)).toList
    assert(out == expected)
  }
}
