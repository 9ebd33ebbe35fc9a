package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q87's checkpointed-resolution mechanics — the part the
  * layout-independent oracle cannot see: a resolution must read ONLY
  * the latest checkpoint at-or-before the target plus the log suffix
  * after it, pick the right checkpoint for every resolution class, and
  * agree with a full log replay at every version. */
class CheckpointSpec extends SparkSpec {

  private lazy val store = RelationalQueries.q87Layout(spark, sf())

  /** Independent full replay over the complete log. */
  private def fullReplay(v: Long): Seq[String] = {
    val (logP, _) = store
    spark.read.parquet(logP).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(_._1 <= v).sortBy(_._1)
      .foldLeft(Set.empty[String]) {
        case (acc, (_, "add", p)) => acc + p
        case (acc, (_, _, p)) => acc - p
      }.toSeq.sorted
  }

  test("resolution reads checkpoint + suffix only, per resolution class") {
    val (logP, ckptP) = store
    // pre-first-checkpoint: no checkpoint, pure suffix replay (3 adds)
    val (_, c3, n3) = RelationalQueries.q87Resolve(spark, logP, ckptP, 3L)
    assert(c3.isEmpty && n3 == 3L, s"v3: ckpt=$c3 suffix=$n3")
    // checkpoint + suffix: ckpt 4, then v5 add, v6 add+remove+add, v7 add
    val (_, c7, n7) = RelationalQueries.q87Resolve(spark, logP, ckptP, 7L)
    assert(c7.contains(4L) && n7 == 5L, s"v7: ckpt=$c7 suffix=$n7")
    // checkpoint-exact: zero suffix entries replayed
    val (_, c12, n12) = RelationalQueries.q87Resolve(spark, logP, ckptP, 12L)
    assert(c12.contains(12L) && n12 == 0L, s"v12: ckpt=$c12 suffix=$n12")
    // mid-cadence: ckpt 8 + one entry
    val (_, c9, n9) = RelationalQueries.q87Resolve(spark, logP, ckptP, 9L)
    assert(c9.contains(8L) && n9 == 1L, s"v9: ckpt=$c9 suffix=$n9")
  }

  test("checkpointed resolution equals a full replay at every version") {
    val (logP, ckptP) = store
    (1L to 12L).foreach { v =>
      val (got, _, _) = RelationalQueries.q87Resolve(spark, logP, ckptP, v)
      assert(got == fullReplay(v), s"v$v diverged from the full replay")
    }
  }

  test("the v6 rewrite is visible through checkpoints: 'F' rows drop") {
    val (logP, ckptP) = store
    def fCount(v: Long): Long = {
      val (paths, _, _) = RelationalQueries.q87Resolve(spark, logP, ckptP, v)
      spark.read.parquet(paths: _*)
        .filter(col("o_orderstatus") === "F" &&
          col("o_custkey") % 12 === 2).count()
    }
    assert(fCount(5L) > 0L, "stratum 3 must carry 'F' rows before v6")
    assert(fCount(7L) == 0L, "the v6 rewrite must drop stratum-3 'F' rows")
    assert(fCount(12L) == 0L, "the drop must persist through checkpoint 12")
  }

  test("AS OF rides the checkpointed resolution with the q85 boundary rule") {
    // probe just after commit 9 resolves to v9 (latest at-or-before)
    val probe = RelationalQueries.q52CommitTs(9) + 100
    val v = (1L to 12L).filter(RelationalQueries.q52CommitTs(_) <= probe).max
    assert(v == 9L)
    // probe exactly AT a commit reads that commit (inclusive boundary)
    val atProbe = RelationalQueries.q52CommitTs(8)
    assert((1L to 12L).filter(RelationalQueries.q52CommitTs(_) <= atProbe)
      .max == 8L)
  }
}
