package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q76 partition-spec evolution: pins the pruning asymmetry that makes
  * the feature worth having — era-2 (evolved spec) directories prune by
  * month AND bucket, era-1 prune by month only and re-filter as a
  * residual — plus correctness of the merged read against the source. */
class PartitionEvolutionSpec extends SparkSpec {

  test("q76: era-2 prunes 3/4 of buckets, era-1 scans all, result exact") {
    val df = RelationalQueries.q76_partition_evolution(spark, sf())
    val out = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toList

    // independent replay from the source table
    val monthIdx = (year(col("o_orderdate")) - 1995) * 12 +
      month(col("o_orderdate")) - 1
    val o = graft.core.Tables.orders(spark, sf()).withColumn("m", monthIdx)
    val r = o.agg(min("m"), max("m")).head()
    val (lo0, hi0) = (r.getInt(0).toLong, r.getInt(1).toLong)
    val (lo, hi) = (lo0 + (hi0 - lo0) / 3, lo0 + 2 * (hi0 - lo0) / 3)
    val expected = o.filter(col("m").between(lo, hi) &&
        pmod(col("o_custkey"), lit(4L)) === 1L)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * lit(100)).cast("long")).as("t"))
      .orderBy("status")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toList
    assert(out == expected)

    // scan-scope accounting from the written layout: within the month
    // band, era-1 contributes EVERY directory (spec 1 cannot see the
    // bucket), era-2 exactly the b=1 quarter
    val tag = graft.core.SessionMemo.pathTag(spark, sf())
    val root = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_q76_$tag")
    def months(era: String) = new java.io.File(root, era).listFiles()
      .filter(_.getName.startsWith("m="))
      .filter { f => val m = f.getName.drop(2).toLong; m >= lo && m <= hi }
    val e1 = months("era1")
    val e2 = months("era2")
    assert(e1.nonEmpty && e2.nonEmpty)
    // every era-2 month dir holds ~4 bucket dirs; the read keeps only b=1
    val bucketDirs = e2.flatMap(_.listFiles()).count(_.getName.startsWith("b="))
    val kept = e2.flatMap(_.listFiles()).count(_.getName == "b=1")
    // at most one bucket dir kept per month (a sparse month may have
    // no b=1 rows at all — the prune then keeps nothing for it)
    assert(kept > 0 && kept <= e2.length)
    assert(bucketDirs >= 3 * kept,
      s"evolved spec must offer >=3x pruning: $bucketDirs dirs, $kept kept")
  }
}
