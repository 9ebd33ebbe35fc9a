package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the three 100 TB-scale overflow guards the round-13 advisor
  * audited, so a future edit cannot silently reintroduce the wrap:
  *
  *  - c10 / p22 reduce doc_id mod 2³¹−1 BEFORE the LCG multiply —
  *    id·1103515245 wraps int64 past id ≈ 8.4·10⁹ (silently in Spark,
  *    loudly in DuckDB). Each test feeds doc_ids ABOVE 2³¹ through the
  *    real operator and compares against an exact BigInt replay of the
  *    intended (pre-reduced) arithmetic: remove the pmod and Spark's
  *    wrapped product diverges from the replay.
  *  - c11's MCC² runs its division in TWO steps, never materializing
  *    num² (which would blow DECIMAL(38,0) at n ≈ 5·10⁷). The test
  *    drives the extracted expression at n = 10⁹-scale marginals where
  *    the naive form overflows, asserting the exact two-step value.
  */
class OverflowGuardSpec extends SparkSpec {

  private val M = 2147483647L // 2^31 − 1
  // small ids (the pre-reduction is a no-op there) plus two above the
  // wrap point id·1103515245 > Long.MaxValue; enough small ids that
  // every bootstrap rep draws nonzero total weight (ldiv guard)
  private val ids: Seq[Long] = (1L to 20L) ++ Seq(2147483655L, 10000000000L)

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_overflow").toString
    import spark.implicits._
    ids.map(id => (id, "alpha beta gamma", "en", "web", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  /** The intended per-(id, k) LCG draw: reduce FIRST, then multiply —
    * exact in BigInt, so this replay is the wrap-free definition. */
  private def lcg(id: Long, k: Long): Long = {
    val h1 = (BigInt(id).mod(M) * 1103515245L + (k + 1) * 12345L + 6789L)
      .mod(M)
    (h1 * 16807L).mod(M).toLong
  }

  test("c10: bootstrap weights for doc_ids above 2^31 match the " +
    "pre-reduced BigInt replay (red if the pmod guard is removed)") {
    def weight(id: Long, rep: Long): Long = {
      val b = lcg(id, rep) % 100L
      if (b < 37) 0L else if (b < 74) 1L else if (b < 92) 2L
      else if (b < 98) 3L else 4L
    }
    val expected = (0L to 31L).map(rep => rep -> ids.map(weight(_, rep)).sum)
      .toMap
    // sanity: every rep draws weight (no ldiv-by-zero in mean_fp), and
    // the huge ids contribute nonzero weight somewhere — otherwise the
    // pin could not distinguish wrap (b < 0 ⇒ w = 0) from the intended
    // draw
    assert((0L to 31L).forall(rep => expected(rep) > 0))
    assert((0L to 31L).exists(rep =>
      ids.filter(_ > M).exists(weight(_, rep) > 0)))
    val got = ClusterQueries.c10_bootstrap_ci(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("p22: rendezvous shard assignment for doc_ids above 2^31 matches " +
    "the pre-reduced BigInt replay (red if the pmod guard is removed)") {
    def assign(id: Long, n: Int): Long =
      (0 until n).map(k => lcg(id, k.toLong) * 32L + k).max % 32L
    val per = ids.map(id => (assign(id, 16), assign(id, 17)))
    val expected = per.groupBy(_._1).map { case (s16, g) =>
      val moved = g.count(p => p._1 != p._2).toLong
      s16 -> (g.size.toLong, moved,
        Math.floorDiv(moved * 1000000L, g.size.toLong))
    }
    val got = PipelineQueries.p22_rendezvous_shards(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected)
  }

  test("c11: the two-step MCC^2 chain stays exact at n = 1e9 marginals " +
    "where the naive num^2*1e6 form overflows DECIMAL(38,0)") {
    import spark.implicits._
    val n = 1000000000L
    val num = 500000000000000000L // 5e17, within Cauchy-Schwarz bound
    val sumP2 = 300000000000000000L // D1 = n^2 - sum_p2 = 7e17
    val sumT2 = 400000000000000000L // D2 = 6e17
    // exact BigInt replay of the two-step order: (|num|*1e6 div D1)*|num| div D2
    val d1 = BigInt(n) * n - sumP2
    val d2 = BigInt(n) * n - sumT2
    val expect = (BigInt(num) * 1000000L / d1 * num / d2).toLong
    // the naive intermediate num^2 * 1e6 needs 42 digits — would be
    // NULL (non-ANSI) or an overflow error (ANSI) in DECIMAL(38,0)
    assert(BigInt(num) * num * 1000000L > BigInt(10).pow(38))
    val row = Seq((n, num, sumP2, sumT2)).toDF("n", "num", "sum_p2", "sum_t2")
      .select(expr(ClusterQueries.Mcc2TwoStepExpr).as("mcc2_fp"))
      .collect()(0)
    assert(!row.isNullAt(0), "two-step chain must not overflow at n=1e9")
    assert(row.getLong(0) == expect)
  }
}
