package graft.operators

import graft.SparkSpec

/** The q65 manifest prune's FILE mechanics — the part the
  * layout-independent DuckDB oracle cannot see: the zone-map filter
  * must open strictly fewer files than were written, never drop a file
  * that can match, and the pruned scan must still equal the full-scan
  * filter. */
class ManifestSkipSpec extends SparkSpec {

  test("zone maps skip files outside the key band, keep every candidate") {
    import org.apache.spark.sql.functions._
    val (dataP, manP) = RelationalQueries.q65Layout(spark, sf())
    val man = spark.read.parquet(manP)
    val total = man.count()
    val mx = man.agg(max("max_ok")).head.getLong(0)
    val (lo, hi) = (mx / 4, mx / 2)
    val keep = RelationalQueries.q65Survivors(man, lo, hi)
    // the clustered layout makes the band land in a strict file subset
    assert(keep.nonEmpty, "some file must intersect [max/4, max/2]")
    assert(keep.size < total,
      s"manifest prune must skip files (${keep.size} of $total opened)")
    // soundness: every row matching the band lives in a kept file —
    // count rows of the band found via full scan vs via pruned scan
    val full = spark.read.parquet(dataP)
      .filter(col("l_orderkey").between(lo, hi)).count()
    val pruned = spark.read.parquet(keep: _*)
      .filter(col("l_orderkey").between(lo, hi)).count()
    assert(pruned == full,
      s"pruned scan lost rows: $pruned vs $full — a zone map lied")
  }

  test("the pruned aggregate equals the plain BETWEEN replay") {
    import org.apache.spark.sql.functions._
    val got = RelationalQueries.q65_manifest_skipping(spark, sf())
      .agg(sum("n_items")).head.getLong(0)
    val li = graft.core.Tables.lineitem(spark, sf())
    val mx = li.agg(max("l_orderkey")).head.getLong(0)
    val want = li.filter(col("l_orderkey").between(mx / 4, mx / 2)).count()
    assert(got == want, s"row count diverged: $got vs $want")
  }
}
