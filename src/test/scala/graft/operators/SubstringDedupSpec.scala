package graft.operators

import graft.SparkSpec

/** d28's span-merge semantics, replayed independently in driver-side
  * Scala (Map-based gram counting + an explicit island fold) against
  * the Catalyst aggregate-HOF implementation on the same corpus. */
class SubstringDedupSpec extends SparkSpec {

  private val L = 24
  private val S = 8

  test("d28 equals a driver-side brute-force span merge") {
    val docs = graft.core.Tables.documents(spark, sf())
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // corpus-wide gram occurrence counts at the anchor stride
    val counts = scala.collection.mutable.Map.empty[String, Int]
    val grams = docs.map { case (id, t) =>
      val ps = (0 to (if (t.length >= L) (t.length - L) / S else -1))
        .map(k => (k * S, t.substring(k * S, k * S + L)))
      ps.foreach { case (_, g) =>
        counts(g) = counts.getOrElse(g, 0) + 1
      }
      (id, t.length, ps)
    }
    val expected = grams.map { case (id, len, ps) =>
      val kept = ps.collect { case (p, g) if counts(g) >= 2 => p.toLong }
      var n = 0L; var chars = 0L
      var first = -1L; var prev = -1L
      kept.foreach { p =>
        if (first < 0) { first = p; prev = p }
        else if (p - prev <= L) prev = p
        else { n += 1; chars += prev - first + L; first = p; prev = p }
      }
      if (first >= 0) { n += 1; chars += prev - first + L }
      val ppm = if (len > 0) chars * 1000000L / len else 0L
      (id, n, chars, ppm)
    }.sortBy(_._1)
    val got = DedupQueries.d28_substring_spans(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // the corpus must actually exercise the operator: some doc carries a
    // duplicated span, and not every doc is fully duplicated
    assert(got.exists(_._2 > 0), "no duplicated span found anywhere")
    assert(got.exists(_._3 == 0), "every doc fully duplicated? fixture bug")
  }

  test("spans coalesce: adjacent anchors merge, distant ones split") {
    // pure fold check on the merge arithmetic, no corpus: positions
    // 0,8,16 merge into one span [0, 16+24); 0 and 48 stay two spans
    def fold(ps: Seq[Long]): (Long, Long) = {
      var n = 0L; var chars = 0L; var first = -1L; var prev = -1L
      ps.foreach { p =>
        if (first < 0) { first = p; prev = p }
        else if (p - prev <= L) prev = p
        else { n += 1; chars += prev - first + L; first = p; prev = p }
      }
      if (first >= 0) { n += 1; chars += prev - first + L }
      (n, chars)
    }
    assert(fold(Seq(0L, 8L, 16L)) == (1L, 40L))
    assert(fold(Seq(0L, 48L)) == (2L, 48L))
    assert(fold(Seq(0L, 24L)) == (1L, 48L)) // touching spans coalesce
    assert(fold(Nil) == (0L, 0L))
  }
}
