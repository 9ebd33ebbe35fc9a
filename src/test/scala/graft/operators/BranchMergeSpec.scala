package graft.operators

import graft.SparkSpec

/** q88's merge mechanics beyond the oracle: the three-way file-diff
  * algebra against an independent derivation, the conflict predicate,
  * and the no-mutation-on-reject contract. */
class BranchMergeSpec extends SparkSpec {

  test("merge applies branch diffs; conflicts reject; reject mutates nothing") {
    val out = RelationalQueries.q88_branch_merge(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    // the rejected merge's state is BYTE-equal to the main head
    val main = out.filter(_._1 == "main_v3").map(t => (t._3, t._4, t._5))
    val rej = out.filter(_._1 == "bad_merge").map(t => (t._3, t._4, t._5))
    assert(rej.toSeq == main.toSeq, "a rejected merge must not mutate main")
    assert(out.filter(_._1 == "bad_merge").forall(_._2 == "rejected"))
    assert(out.filter(_._1 != "bad_merge").forall(_._2 == "committed"))
    // merged = main minus the branch-rewritten base file plus the
    // branch's replacement: row counts obey set algebra computed
    // independently from the source table
    val o = graft.core.Tables.orders(spark, sf())
    import org.apache.spark.sql.functions._
    def cnt(c: org.apache.spark.sql.Column): Long = o.filter(c).count()
    val nMain = cnt(col("o_orderdate") >= "1998-01-01" ||
      col("o_orderstatus") =!= "F")
    val nMerged = cnt((col("o_orderdate") < "1998-01-01" &&
      col("o_orderstatus") =!= "F") ||
      col("o_orderdate") >= "2000-01-01" ||
      (col("o_orderdate") >= "1998-01-01" &&
        col("o_orderdate") < "2000-01-01" && col("o_orderstatus") === "O"))
    assert(out.filter(_._1 == "main_v3").map(_._4).sum == nMain)
    assert(out.filter(_._1 == "merged_v4").map(_._4).sum == nMerged)
  }

  test("the file-level three-way rule on abstract sets") {
    // base {a,b}; main rewrote a -> c,d; branch rewrote b -> e
    val base = Set("a", "b")
    val ours = Set("b", "c", "d")
    def merge(theirs: Set[String]): Either[Set[String], Set[String]] = {
      val removedB = base -- theirs
      val conflicts = removedB & (base -- ours)
      if (conflicts.nonEmpty) Left(conflicts)
      else Right(ours -- removedB ++ (theirs -- base))
    }
    assert(merge(Set("a", "e")) == Right(Set("c", "d", "e")))
    // branch also rewrote a: both sides touched base file a -> conflict
    assert(merge(Set("e")) == Left(Set("a")))
    // branch that only ADDS merges onto any head
    assert(merge(Set("a", "b", "z")) == Right(Set("b", "c", "d", "z")))
  }
}
