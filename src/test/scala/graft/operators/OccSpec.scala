package graft.operators

import graft.SparkSpec

/** q69's optimistic-concurrency protocol properties the layout-blind
  * oracle cannot see: the conflict really fires (validated inside the
  * query via require), attempt outcomes land in the documented order,
  * and each committed version's state is consistent (monotone version
  * numbers; the conflicting attempt leaves the state untouched; the
  * retried rewrite strictly shrinks the table). */
class OccSpec extends SparkSpec {

  test("q69: commit sequence, conflict no-op, retry consumes the rebase") {
    val rows = RelationalQueries.q69_occ_conflict(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.map(t => (t._2, t._4)).toSeq == Seq(
      ("appender", "committed"), ("rewriter1", "committed"),
      ("rewriter2", "conflict"), ("rewriter2", "committed")))
    // version monotone over committed attempts; the conflict attempt
    // reports the UNCHANGED head (same version and state as attempt 2)
    assert(rows.map(_._5).toSeq == Seq(2L, 3L, 3L, 4L))
    assert(rows(2)._6 == rows(1)._6 && rows(2)._7 == rows(1)._7,
      "a conflicting attempt must not change table state")
    // the retry was re-executed against the REBASED file: it removes
    // only early non-F cheap rows, so v4 is a strict subset of v3 that
    // still excludes every early-F row v3 dropped
    assert(rows(3)._6 < rows(1)._6)
    assert(rows(3)._3 == 3L, "retry must base on the post-conflict head")
    // the appender's v2 is the full source table
    val all = graft.core.Tables.orders(spark, sf()).count()
    assert(rows(0)._6 == all)
  }
}
