package graft.operators

import graft.SparkSpec

/** q68's copy-on-write file mechanics — what the layout-independent
  * oracle cannot see: the rewrite touches ONLY the zone-pruned
  * candidate files, untouched files are referenced in the new snapshot
  * by their ORIGINAL paths (no copy), and matched/unmatched rows land
  * where COW semantics demand. */
class MergeCowSpec extends SparkSpec {

  test("q68 rewrites a strict file subset; untouched originals are reused") {
    import org.apache.spark.sql.functions._
    val (_, manP) = RelationalQueries.q65Layout(spark, sf())
    val man = spark.read.parquet(manP)
    val total = man.count()
    val (newFiles, untouched) = RelationalQueries.q68Merge(spark, sf())
    assert(untouched.nonEmpty && untouched.size < total,
      s"expected a strict rewrite subset (${total - untouched.size} of $total rewritten)")
    // the snapshot scan must reference the untouched ORIGINAL paths
    val scanned = RelationalQueries.q68_merge_cow(spark, sf())
      .inputFiles.toSet
    untouched.foreach { p =>
      assert(scanned.exists(_.endsWith(new java.io.File(p).getName)),
        s"untouched file $p must be referenced, not copied")
    }
    // COW row semantics: band rows updated (+10), inserts appended
    val mx = man.agg(max("max_ok")).head.getLong(0)
    val (lo, hi) = (mx / 4, mx / 4 + mx / 100)
    val base = graft.core.Tables.lineitem(spark, sf())
    val nBand = base.filter(col("l_orderkey").between(lo, hi)).count()
    val merged = spark.read.parquet(untouched ++ newFiles: _*)
    assert(merged.count() === base.count() + nBand,
      "merged snapshot = base rows + inserted band copies")
    val insRows = merged.filter(col("l_orderkey") > mx).count()
    assert(insRows === nBand, "inserts must be the shifted band")
  }
}
