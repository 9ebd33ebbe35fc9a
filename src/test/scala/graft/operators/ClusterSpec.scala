package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** c02's Lloyd loop: structural invariants that hold for ANY data, so
  * they complement (not duplicate) the DuckDB replay oracle. */
class ClusterSpec extends SparkSpec {

  private lazy val out = ClusterQueries.c02_kmeans_lloyd(spark, sf()).cache()
  private lazy val nRows =
    graft.core.Tables.embeddings(spark, sf()).count()

  test("clusters partition the input (sizes sum to row count)") {
    assert(out.agg(sum("n")).head.getLong(0) == nRows)
  }

  test("cluster ids come from the init set 0..4") {
    val cids = out.select("cid").collect().map(_.getLong(0)).toSet
    assert(cids.subsetOf((0L until 5L).toSet) && cids.nonEmpty)
  }

  test("centroids are 64-element fixed-point vectors in data range") {
    out.select("centroid").collect().foreach { r =>
      val xs = r.getString(0).split(",").map(_.toLong)
      assert(xs.length == 64)
      // embeddings live in ~[-0.5, 0.5] → scaled centroids within 1e9
      assert(xs.forall(x => math.abs(x) <= 1000000000L))
    }
  }

  test("deterministic under repartitioning (fixed-point sums commute)") {
    val again = ClusterQueries.c02_kmeans_lloyd(
      spark, sf()).collect().map(_.toString).sorted
    assert(again.sameElements(out.collect().map(_.toString).sorted))
  }

  test("c03: power iteration converges to the dominant eigendirection") {
    val rows = ClusterQueries.c03_pca_power(spark, sf())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val eig = rows.filter(_._1 == "eig").sortBy(_._2).map(_._3)
    assert(eig.length == 64)
    // renormalization invariant: the largest component is exactly ±1e6
    assert(eig.map(math.abs).max == 1000000L)
    val lambda = rows.find(_._1 == "lambda").get._3
    assert(lambda > 0L, s"covariance Rayleigh quotient must be positive: $lambda")
    // independent quality check in doubles: the test embeddings are
    // near-isotropic (λ2/λ1 ≈ 0.93 at sf0.001), so the DIRECTION
    // converges slowly by design — but the Rayleigh quotient converges
    // as (λ2/λ1)^2t, so the captured VARIANCE must be ≈ λ1. Reference
    // λ1 from 500 double-precision power steps on the same Gram.
    val vecs = graft.core.Tables.embeddings(spark, sf())
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).map(x => math.floor(x * 1e6)).toArray)
    val n = vecs.length
    val mean = Array.tabulate(64)(j => math.floor(vecs.map(_(j)).sum / n))
    val cent = vecs.map(v => Array.tabulate(64)(j => v(j) - mean(j)))
    def gmul(x: Array[Double]): Array[Double] = Array.tabulate(64) { j =>
      cent.map(c => c(j) * c.zip(x).map { case (a, b) => a * b }.sum).sum
    }
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    var ref = Array.tabulate(64)(j => 1.0 + j * 0.01) // non-axis start
    for (_ <- 1 to 500) {
      val u = gmul(ref); val nm = math.sqrt(dot(u, u))
      ref = u.map(_ / nm)
    }
    val lambda1 = dot(gmul(ref), ref)
    val we = eig.map(_.toDouble).toArray
    val rayleigh = dot(gmul(we), we) / dot(we, we)
    // the whole SPECTRUM is diffuse here (Marchenko-Pastur bulk of a
    // ~50×64 isotropic sample), so an exact-λ1 bound is unreachable by
    // ANY power method in few steps; what PCA must still deliver is
    // (a) more variance than every coordinate axis and (b) within a
    // few percent of λ1
    val maxAxisVar = (0 until 64).map(j =>
      cent.map(c => c(j) * c(j)).sum).max
    assert(rayleigh > maxAxisVar,
      s"principal direction beaten by a raw axis: $rayleigh <= $maxAxisVar")
    assert(rayleigh >= 0.95 * lambda1,
      s"captured variance $rayleigh < 0.95 * lambda1 $lambda1")
  }

  test("c04: OLS from sufficient statistics matches a direct fit") {
    val rows = ClusterQueries.c04_ols_suffstats(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    // independent reference fit per group, straight from the data
    val raw = graft.core.Tables.lineitem(spark, sf("sf0.01"))
      .select(col("l_returnflag"), year(col("l_shipdate")).cast("long"),
        col("l_quantity").cast("long"),
        floor(col("l_extendedprice") * lit(100)).cast("long"))
      .collect()
      .groupBy(r => (r.getString(0), r.getLong(1)))
    rows.foreach { r =>
      val pts = raw((r.getString(0), r.getLong(1)))
        .map(p => (p.getLong(2).toDouble, p.getLong(3).toDouble))
      val n = pts.length.toDouble
      assert(r.getLong(2) == pts.length)
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sx2 = pts.map(p => p._1 * p._1).sum
      val slope = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
      val icpt = (sy - slope * sx) / n
      // fixed-point truncation allows ±1 ulp of 1e-6; scale tolerance
      assert(math.abs(r.getLong(3) / 1e6 - slope) < math.abs(slope) * 1e-9 + 1e-5,
        s"slope mismatch for ${r.getString(0)}/${r.getLong(1)}")
      assert(math.abs(r.getLong(4) / 1e6 - icpt) < math.abs(icpt) * 1e-9 + 1e-4,
        s"intercept mismatch for ${r.getString(0)}/${r.getLong(1)}")
    }
  }

  test("c04 plan is one aggregation pass (no join, no window)") {
    val p = ClusterQueries.c04_ols_suffstats(spark, sf())
      .queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"))
    assert(!p.contains("Window") && !p.contains("Join"),
      "sufficient-statistics fit must not join or window")
  }

  test("c05: rank AUC equals the quadratic pairwise definition") {
    val row = ClusterQueries.c05_auc_rank(spark, sf()).head()
    val (n1, n0, num, den) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    // brute-force pairwise U statistic from the raw table
    val signs = (1 to 64).map(i =>
      if (i.toLong * 2654435761L / 65536L % 2L == 1L) 1.0 else -1.0)
    val rows = graft.core.Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>"))
      .collect().map { r =>
        val a = r.getSeq[Double](2)
        var s = 0.0
        var i = 0
        while (i < 64) { s += a(i) * signs(i); i += 1 }
        (r.getInt(1) % 2, math.floor(s * 1e6).toLong)
      }
    val pos = rows.filter(_._1 == 1).map(_._2)
    val neg = rows.filter(_._1 == 0).map(_._2)
    assert(n1 == pos.length && n0 == neg.length)
    var wins2 = 0L // 2*wins + ties, i.e. 2*U
    for (p1 <- pos; p0 <- neg) {
      if (p1 > p0) wins2 += 2L else if (p1 == p0) wins2 += 1L
    }
    assert(num == wins2 && den == 2L * n1 * n0)
    // AUC is a proper probability
    assert(num >= 0 && num <= den)
  }

  test("c15: average precision equals the direct sorted-sweep definition") {
    val row = ClusterQueries.c15_average_precision(spark, sf()).head()
    val (n1, n0, ap, rp) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val signs = (1 to 64).map(i =>
      if (i.toLong * 2654435761L / 65536L % 2L == 1L) 1.0 else -1.0)
    val rows = graft.core.Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>"))
      .collect().map { r =>
        val a = r.getSeq[Double](2)
        var s = 0.0
        var i = 0
        while (i < 64) { s += a(i) * signs(i); i += 1 }
        (r.getLong(0), r.getInt(1) % 2, math.floor(s * 1e6).toLong)
      }
    // direct sweep: sort by (score desc, vec_id), accumulate P@k at
    // each positive with the same integer freeze
    val sorted = rows.sortBy(r => (-r._3, r._1))
    var seen = 0L; var apSum = 0L; var hits = 0L
    val nPos = rows.count(_._2 == 1).toLong
    sorted.zipWithIndex.foreach { case ((_, y, _), k) =>
      if (y == 1) {
        seen += 1
        apSum += seen * 1000000000L / (k + 1L)
        if (k + 1L <= nPos) hits += 1
      }
    }
    assert(n1 == nPos && n0 == rows.length - nPos)
    assert(ap == apSum / nPos)
    assert(rp == hits * 1000000000L / nPos)
    // AP and R-precision are proper fractions
    assert(ap >= 0 && ap <= 1000000000L && rp >= 0 && rp <= 1000000000L)
  }

  test("c16: contingency cells tie out against a direct per-item replay") {
    val row = ClusterQueries.c16_mcnemar_paired(spark, sf()).head()
    val cells = (0 to 3).map(row.getLong)
    val (accA, accB, mc) = (row.getLong(4), row.getLong(5), row.getLong(6))
    def signs(m: Long) = (1 to 64).map(i =>
      if (i.toLong * m / 65536L % 2L == 1L) 1.0 else -1.0)
    val (sa, sb) = (signs(2654435761L), signs(2246822519L))
    val rows = graft.core.Tables.embeddings(spark, sf())
      .select(col("label"), col("embedding").cast("array<double>"))
      .collect().map { r =>
        val a = r.getSeq[Double](1)
        def sc(ss: Seq[Double]) = math.floor(
          a.indices.map(i => a(i) * ss(i)).sum * 1e6).toLong
        val y = (r.getInt(0) % 2).toLong
        val ca = if ((if (sc(sa) > 0) 1L else 0L) == y) 1 else 0
        val cb = if ((if (sc(sb) > 0) 1L else 0L) == y) 1 else 0
        (ca, cb)
      }
    val exp = Seq((0, 0), (0, 1), (1, 0), (1, 1))
      .map(p => rows.count(_ == p).toLong)
    assert(cells == exp, s"cells $cells vs $exp")
    val n = rows.length.toLong
    assert(accA == (exp(2) + exp(3)) * 1000000L / n)
    assert(accB == (exp(1) + exp(3)) * 1000000L / n)
    val (b, c) = (exp(1), exp(2))
    val expMc = if (b + c == 0) 0L
      else (math.abs(b - c) - 1) * (math.abs(b - c) - 1) * 1000000L / (b + c)
    assert(mc == expMc)
  }

  test("c18: Spearman rho equals a direct rank replay; self-rank is exactly 1e6") {
    val row = ClusterQueries.c18_spearman(spark, sf()).head()
    val (n, d2, rho) = (row.getLong(0), row.getLong(1), row.getLong(2))
    def signs(m: Long) = (1 to 64).map(i =>
      if (i.toLong * m / 65536L % 2L == 1L) 1.0 else -1.0)
    val rows = graft.core.Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map { r =>
        val a = r.getSeq[Double](1)
        def sc(ss: Seq[Double]) = math.floor(
          a.indices.map(i => a(i) * ss(i)).sum * 1e6).toLong
        (r.getLong(0), sc(signs(2654435761L)), sc(signs(2246822519L)))
      }
    def ranks(key: ((Long, Long, Long)) => (Long, Long)): Map[Long, Long] =
      rows.sortBy(key).zipWithIndex.map { case (r, i) => r._1 -> (i + 1L) }.toMap
    val ra = ranks(r => (r._2, r._1))
    val rb = ranks(r => (r._3, r._1))
    val expD2 = rows.map(r => { val d = ra(r._1) - rb(r._1); d * d }).sum
    assert(n == rows.length && d2 == expD2)
    assert(rho == 1000000L - 6000000L * expD2 / (n * (n * n - 1)))
    // rho of a ranking against itself would be exactly 1e6; against the
    // reversal exactly -1e6 (the formula's calibration points)
    val nn = 9L
    val rev = (1L to nn).map(i => { val d = i - (nn + 1 - i); d * d }).sum
    assert(1000000L - 6000000L * rev / (nn * (nn * nn - 1)) == -1000000L)
  }

  test("c17: PSI is zero for identical halves, positive for a shifted one") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_c17").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(i: Int) = new java.sql.Timestamp(t0.getTime + i * 60000L)
    // 'stable': the same 40-value histogram in each half -> PSI exactly 0
    // (every p_b equals q_b, term frozen at floor(0) = 0).
    // 'shift': second half moves all mass two bins up -> PSI > 0.
    val rows =
      (0 until 40).map(i => (i.toLong, ts(i), 1L, "stable", (i % 10) * 32.0 + 1, "{}")) ++
      (0 until 40).map(i => (100L + i, ts(1000 + i), 1L, "stable", (i % 10) * 32.0 + 1, "{}")) ++
      (0 until 40).map(i => (200L + i, ts(i), 1L, "shift", (i % 10) * 32.0 + 1, "{}")) ++
      (0 until 40).map(i => (300L + i, ts(1000 + i), 1L, "shift", ((i % 10) + 2) * 32.0 + 1, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = ClusterQueries.c17_psi_drift(spark, d)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val psi = got.map { case (k, (n1, n2, p)) => assert(n1 == 40 && n2 == 40); k -> p }
    assert(psi("stable") == 0L, s"identical halves must score 0: $psi")
    assert(psi("shift") > 100000L, s"two-bin shift must score large: $psi")
  }

  test("c06: decile bins are balanced, complete, and score-monotone") {
    val rows = ClusterQueries.c06_calibration_bins(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == (0L to 9L))
    val n = rows.map(_._2).sum
    assert(n == graft.core.Tables.embeddings(spark, sf()).count())
    // rank-based deciles differ by at most 1 in size
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1)
    rows.foreach { case (_, nb, np, rate, _) =>
      assert(np >= 0 && np <= nb)
      assert(rate == np * 1000000000L / nb)
    }
    // mean score is non-decreasing across rank deciles by construction
    rows.map(_._5).sliding(2).foreach {
      case Array(a, b) => assert(a <= b)
      case _ =>
    }
  }

  test("c21: cumulative columns are exact prefix sums; full coverage = overall error") {
    val rows = ClusterQueries.c21_risk_coverage(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq == (0L to 9L), "ten coverage deciles")
    // cum columns are prefix sums of the per-decile columns
    var cn = 0L; var ce = 0L
    rows.foreach { case (_, n, err, cumN, cumErr, riskFp) =>
      cn += n; ce += err
      assert(cumN == cn && cumErr == ce)
      assert(riskFp == ce * 1000000000L / cn)
      assert(err >= 0 && err <= n)
    }
    // the decile-9 row is full coverage: its risk is the overall error
    // rate of the unconditional classifier, independently recomputed
    val n = graft.core.Tables.embeddings(spark, sf()).count()
    assert(rows.last._4 == n, "full coverage covers everything")
    // the most-confident decile must beat (or match) full-coverage risk
    // for this margin-correlated scorer — the curve's reason to exist
    assert(rows.head._6 <= rows.last._6,
      s"selective risk ${rows.head._6} worse than unconditional ${rows.last._6}")
  }

  test("c22: alpha matches an independent per-unit replay and is positive here") {
    val row = ClusterQueries.c22_krippendorff(spark, sf()).collect().head
    val (n, doInt, deInt, alphaFp) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    // independent replay from the raw rater triples
    val rated = graft.operators.TextQueries.t02_langid(spark, sf())
      .selectExpr("doc_id", "actual_lang", "pred_lang").collect()
      .map { r =>
        val (id, a, p) = (r.getLong(0), r.getString(1), r.getString(2))
        (a, p, if (id % 3 == 0) p else a)
      }
    assert(n == rated.length)
    val doChk = rated.map { case (a, b, c) =>
      if (a == b && b == c) 0L
      else if (a != b && b != c && a != c) 6L else 4L
    }.sum
    assert(doInt == doChk)
    val catTot = rated.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (_, v) => v.length.toLong }
    val deChk = catTot.map(nc => nc * (3L * n - nc)).sum
    assert(deInt == deChk)
    // the exact rational, replayed in BigInt
    val num = (BigInt(2) * deInt - BigInt(doInt) * (3L * n - 1)) * 1000000
    assert(num > 0, "alpha must be positive on this data (divide semantics)")
    assert(BigInt(alphaFp) == num / (BigInt(2) * deInt))
    assert(alphaFp > 0 && alphaFp < 1000000)
  }
}
