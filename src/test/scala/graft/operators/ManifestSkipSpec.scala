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

  test("q86: two-level planning prunes shards, equals one-level survivors") {
    import org.apache.spark.sql.functions._
    val (shardsP, listP) = RelationalQueries.q86Layout(spark, sf())
    val list = spark.read.parquet(listP)
    val totalShards = list.count()
    val mx = list.agg(max("max_ok")).head.getLong(0)
    val (lo, hi) = (mx / 8, mx / 4)
    val (shards, files) =
      RelationalQueries.q86Plan(spark, shardsP, listP, lo, hi)
    // level 1 must skip at least one shard for this 1/8-band
    assert(shards.nonEmpty && shards.size < totalShards,
      s"list prune must skip shards (${shards.size} of $totalShards)")
    // the entry rows collected are the bounded survivors, never the
    // full manifest — entry pruning happened in executors
    val totalEntries = spark.read.parquet(shardsP).count()
    assert(files.nonEmpty && files.size < totalEntries,
      s"planned ${files.size} of $totalEntries entries — no prune?")
    // two-level planning loses and invents nothing vs the one-level
    // prune over the full entry manifest
    val (_, manP) = RelationalQueries.q65Layout(spark, sf())
    val oneLevel = RelationalQueries.q65Survivors(
      spark.read.parquet(manP), lo, hi)
    assert(files == oneLevel,
      s"two-level survivors diverged from one-level: $files vs $oneLevel")
    // the shard scan is PARTITION-pruned (directory-level skip), not a
    // full-manifest read filtered after the fact
    val prunedScan = spark.read.parquet(shardsP)
      .filter(col("shard").isin(shards: _*))
    val plan = prunedScan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("shard"),
      s"shard scan must carry partition filters:\n$plan")
  }
}
