package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exclusive prefix sum over per-block subtotals — the
  * shared scan layout of the token/weight-budget family (p04 packing,
  * p10 weighted sampling, p13 dedup-aware sampling).
  *
  * Three blocking levels: callers pre-aggregate docs into 512-doc
  * blocks; blocks aggregate into 512-block superblocks; the ONLY
  * unpartitioned (single-task) window runs over the superblock table —
  * n_docs / 512² rows, ~381 k at 100 B docs, and the pattern recurses
  * if that ever grows. The per-block starts are then a window
  * PARTITIONED by superblock plus a broadcast of the tiny superblock
  * starts, so no stage ever funnels one row per 512 docs through a
  * single task (the two-level scheme's 100 TB bottleneck: ~200 M block
  * rows in one SinglePartition sort).
  *
  * The returned (blk, blk_start) table is one row per block and stays
  * DISTRIBUTED — callers join it back on blk without a broadcast hint;
  * AQE turns that into a broadcast join at test scale while a 100 TB
  * run keeps it a co-partitioned shuffle join (a 200 M-row broadcast
  * would not fit).
  */
object PrefixSum {

  /** Blocks per superblock (and docs per block, by convention). */
  val Fanout = 512L

  /** `blocks` must be one row per block: (`blkCol` long, `wtCol` long).
    * Returns (`blkCol`, blk_start) where blk_start is the exclusive
    * prefix sum of `wtCol` in `blkCol` order. */
  def blockStarts(blocks: DataFrame, blkCol: String, wtCol: String): DataFrame = {
    import graft.functions.KeyAlgebra.ldiv
    val withSup = blocks.withColumn("__sup", ldiv(col(blkCol), lit(Fanout)))
    val supStarts = withSup.groupBy("__sup").agg(sum(wtCol).as("__sup_wt"))
      .withColumn("__sup_start", coalesce(
        sum("__sup_wt").over(Window.orderBy("__sup")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__sup", "__sup_start")
    withSup.join(broadcast(supStarts), "__sup")
      .withColumn("blk_start", col("__sup_start") + coalesce(
        sum(wtCol).over(Window.partitionBy("__sup").orderBy(blkCol)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(blkCol, "blk_start")
  }
}
