package graft.operators

import graft.SparkSpec

/** q66's cost contract — the property the layout-independent oracle
  * cannot see: a changelog read opens ONLY the files that changed
  * between the two snapshots; the unchanged file (fb) never enters the
  * scan. At 100 TB this is the difference between reading the delta
  * and re-reading the table. */
class ChangelogSpec extends SparkSpec {

  test("q66 scans only changed files; the unchanged snapshot file is skipped") {
    val (_, files) = RelationalQueries.q52Layout(spark, sf())
    val Seq(fa, fb, fc, fd) = files
    val df = RelationalQueries.q66_changelog_diff(spark, sf())
    val scanned = df.inputFiles.toSeq
    def touches(dir: String) = scanned.exists(_.contains(
      new java.io.File(dir).getName))
    assert(touches(fa) && touches(fc) && touches(fd),
      s"changed files must be scanned: $scanned")
    assert(!touches(fb),
      s"unchanged file fb must NOT be scanned (cost ∝ changed files): $scanned")
    // and the feed itself balances: deletes are pre-1998 'F' rows,
    // inserts are the >= 2000 load
    import org.apache.spark.sql.functions._
    val byType = df.groupBy("change_type")
      .agg(sum("n").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = graft.core.Tables.orders(spark, sf())
    val wantDel = o.filter(col("o_orderdate") < lit("1998-01-01") &&
      col("o_orderstatus") === "F").count()
    val wantIns = o.filter(col("o_orderdate") >= lit("2000-01-01")).count()
    assert(byType("delete") === wantDel && byType("insert") === wantIns)
  }
}
