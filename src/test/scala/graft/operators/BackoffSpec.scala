package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** t26 stupid-backoff: a hand-built fixture exercises every backoff
  * level with hand-computed integer scores. Training doc "a b c a b d"
  * (source src0, length 4 → LM side): c3(abc)=1, c2(ab)=2, c1(a)=2,
  * c1(d)=1, N=6. */
class BackoffSpec extends SparkSpec {

  test("t28 equals an in-memory log-odds replay; directional sanity holds") {
    val out = TextQueries.t28_log_odds(spark, sf("sf0.01"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toList

    val toks = graft.core.Tables.documents(spark, sf("sf0.01"))
      .select(org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.col("text"))
      .collect().flatMap(r =>
        r.getString(1).split(" ", -1).map(w => (r.getString(0).length == 4, w)))
    val words = toks.groupBy(_._2).map { case (w, ts) =>
      (w, ts.count(_._1).toLong, ts.count(!_._1).toLong)
    }.toArray
    val n1 = words.map(_._2).sum.toDouble
    val n2 = words.map(_._3).sum.toDouble
    val scored = words.map { case (w, y1, y2) =>
      val aw = (y1 + y2).toDouble; val a0 = n1 + n2
      val d = math.log((y1 + aw) / (n1 + a0 - y1 - aw)) -
        math.log((y2 + aw) / (n2 + a0 - y2 - aw))
      val z = d / math.sqrt(1.0 / (y1 + aw) + 1.0 / (y2 + aw))
      (w, y1, y2, math.floor(z * 1e6).toLong)
    }
    val g1 = scored.sortBy(x => (-x._4, x._1)).take(10).zipWithIndex
      .map { case ((w, y1, y2, z), i) => ("g1", i + 1L, w, y1, y2, z) }
    val g2 = scored.sortBy(x => (x._4, x._1)).take(10).zipWithIndex
      .map { case ((w, y1, y2, z), i) => ("g2", i + 1L, w, y1, y2, z) }
    assert(out == (g1 ++ g2).toList)
    // directional sanity: every g1 pick leans toward group 1 relative
    // mass, every g2 pick the other way
    out.foreach { case (side, _, _, y1, y2, z) =>
      if (side == "g1") assert(y1 * n2 >= y2 * n1 || z <= 0)
      else assert(y2 * n1 >= y1 * n2 || z >= 0)
    }
  }

  test("t27: canonical Luhn vectors accept/reject; seeds split by parity") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_t27").toString
    // 4111111111111111 is THE canonical Luhn-valid test number;
    // flipping its last digit breaks the checksum. doc_ids 1/2 avoid
    // the %5 seeding so only the embedded numbers are candidates;
    // 10 and 5 take the seeded valid / seeded off-by-one paths.
    Seq(
      (1L, "pay with 4111111111111111 now", "en", "web", 30L),
      (2L, "pay with 4111111111111112 now", "en", "web", 30L),
      (3L, "no digits here", "en", "web", 14L),
      (10L, "seeded valid", "en", "web", 12L),
      (5L, "seeded invalid", "en", "web", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = TextQueries.t27_luhn_pii(spark, d)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got(1L) === ((1L, 1L, 0L)), "canonical valid card must pass")
    assert(got(2L) === ((1L, 0L, 1L)), "last-digit flip must fail")
    assert(got(3L) === ((0L, 0L, 0L)))
    assert(got(10L) === ((1L, 1L, 0L)), "seeded check digit must close")
    assert(got(5L) === ((1L, 0L, 1L)), "off-by-one check digit must fail")
  }

  test("t26: trigram hit, bigram backoff, unigram backoff, full miss, short doc") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_t26").toString
    Seq(
      (0L, "a b c a b d", "en", "src0", 11L), // the LM
      (1L, "a b c", "en", "src10", 5L), // known trigram
      (2L, "a b x", "en", "src10", 5L), // all levels miss
      (3L, "x a b", "en", "src10", 5L), // bigram backoff
      (4L, "x y d", "en", "src10", 5L), // unigram backoff
      (5L, "a", "en", "src10", 1L)) // too short: zero row
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = TextQueries.t26_stupid_backoff(spark, d)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // doc 1: S = c3/c2(ab) = 1/2 → 500000 at level 3
    assert(got(1L) === ((1L, 1L, 0L, 0L, 500000L)))
    // doc 2: trigram abx, bigram bx, unigram x all unseen → 0 at level 0
    assert(got(2L) === ((1L, 0L, 0L, 0L, 0L)))
    // doc 3: 0.4·c2(ab)/c1(a) = (2e6/2)·2/5 → 400000 at level 2
    assert(got(3L) === ((1L, 0L, 1L, 0L, 400000L)))
    // doc 4: 0.4²·c1(d)/N: 1e6/6=166666, ·2/5=66666, ·2/5=26666 at level 1
    assert(got(4L) === ((1L, 0L, 0L, 1L, 26666L)))
    // doc 5: no trigram positions — all-zero row still present
    assert(got(5L) === ((0L, 0L, 0L, 0L, 0L)))
    // the LM doc itself is not scored
    assert(!got.contains(0L))
  }
}
