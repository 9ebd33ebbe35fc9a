package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** t38 interpolated Kneser–Ney: a hand-built corpus with hand-computed
  * fixed-point probabilities, plus the probability axioms the formula
  * must satisfy on real data. */
class KneserNeySpec extends SparkSpec {

  test("t38 matches hand-computed KN probabilities on a tiny corpus") {
    // docs: "a b a b", "c b a d" — bigrams:
    //   doc1: (a,b) (b,a) (a,b)   doc2: (c,b) (b,a) (a,d)
    // type table: (a,b)=2, (b,a)=2, (c,b)=1, (a,d)=1  -> nbb = 4
    // contexts: c(a·)=3, N1+(a·)=2; c(b·)=2, N1+(b·)=1; c(c·)=1, N1+(c·)=1
    // continuations: N1+(·b)=2, N1+(·a)=1, N1+(·d)=1
    val dir = Files.createTempDirectory("kn_fixture").toFile.getAbsolutePath
    import spark.implicits._
    Seq((1L, "a b a b", "src0", "en"), (2L, "c b a d", "src0", "en"))
      .toDF("doc_id", "text", "source", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextQueries.t38_kneser_ney(spark, dir)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(rows.size == 4)
    val S = 1000000000000L
    def kn(c12: Long, c1: Long, nCont: Long, nPred: Long, nbb: Long): Long =
      (4 * c12 - 3) * S / (4 * c1) + 3 * nCont * nPred * S / (4 * c1 * nbb)
    // P(b|a) = (2-.75)/3 + .75*2/3 * 2/4 = 5/12 + 1/4
    assert(rows(("a", "b")) == (2L, 3L, 2L, 2L, kn(2, 3, 2, 2, 4)))
    assert(kn(2, 3, 2, 2, 4) == 5L * S / 12 + S / 4)
    // P(a|b) = (2-.75)/2 + .75*1/2 * 1/4
    assert(rows(("b", "a")) == (2L, 2L, 1L, 1L, kn(2, 2, 1, 1, 4)))
    // P(b|c) = (1-.75)/1 + .75*1/1 * 2/4
    assert(rows(("c", "b")) == (1L, 1L, 1L, 2L, kn(1, 1, 1, 2, 4)))
    // P(d|a) = (1-.75)/3 + .75*2/3 * 1/4
    assert(rows(("a", "d")) == (1L, 3L, 2L, 1L, kn(1, 3, 2, 1, 4)))
  }

  test("t38 on real data: probabilities in (0,1], discount never negative") {
    val out = TextQueries.t38_kneser_ney(spark, sf()).collect()
    assert(out.length == 50)
    out.foreach { r =>
      val (c12, c1, knFp) = (r.getLong(2), r.getLong(3), r.getLong(6))
      assert(c12 >= 1 && c1 >= c12)
      assert(knFp > 0 && knFp <= 1000000000000L)
    }
    // the head is ordered by raw bigram count
    val counts = out.map(_.getLong(2))
    assert(counts.sameElements(counts.sortBy(-_)))
  }

  test("t38 per-context probabilities sum to 1 over observed continuations" +
    " plus the backoff mass") {
    // For a context w1 with all its continuations in the head,
    // Σ_w2 P(w2|w1) = [Σ max(c-D,0) + D·N1+(w1·)·Σ Pcont(w2)] / c(w1·);
    // on the fixture context 'a': P(b|a) + P(d|a) =
    // (5/12 + 1/4) + (1/12 + 1/8) = 7/8 < 1 — the missing 1/8 is the
    // mass KN reserves for unseen continuations of 'a' (by construction
    // Pcont(b)+Pcont(d) = 3/4, not 1). Asserted on the OPERATOR's
    // output, so a wrong denominator in the production expr fails here.
    val dir = Files.createTempDirectory("kn_fixture2").toFile.getAbsolutePath
    import spark.implicits._
    Seq((1L, "a b a b", "src0", "en"), (2L, "c b a d", "src0", "en"))
      .toDF("doc_id", "text", "source", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val S = 1000000000000L
    val sumA = TextQueries.t38_kneser_ney(spark, dir)
      .filter(col("w1") === "a")
      .collect().map(_.getLong(6)).sum
    // each fixed-point term floors, so the sum sits within the
    // truncation slack (4 floored terms) of the exact rational 7/8
    assert(sumA <= 7L * S / 8 && sumA > 7L * S / 8 - 4)
  }
}
