package graft.operators

import graft.SparkSpec
import graft.core.Tables
import graft.plans.TextHashKernels
import org.apache.spark.sql.functions._

/** d23 LSH recall/precision eval: the counts are re-derived by an
  * independent in-memory replay (exact Jaccard truth + the same
  * minhash/band construction), so the spec is an oracle of its own. */
class LshEvalSpec extends SparkSpec {

  test("d24 histogram ties out against d14's cluster manifest") {
    val hist = DedupQueries.d24_cluster_histogram(spark, sf())
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    val manifest = DedupQueries.d14_dedup_components(spark, sf())
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val total = Tables.documents(spark, sf()).count()
    // doc mass partitions exactly across buckets
    assert(hist.map(_._4).sum == total)
    // clustered rows tie to the manifest: per-size cluster counts
    val bySize = manifest.groupBy(_._1).map(_._2.head._2)
      .groupBy(identity).map { case (sz, xs) => sz -> xs.size.toLong }
    def bucketOf(sz: Long) =
      if (sz == 2) 1L else if (sz <= 4) 2L else if (sz <= 8) 3L else 4L
    val expClusters = bySize.groupBy { case (sz, _) => bucketOf(sz) }
      .map { case (b, m) => b -> m.values.sum }
    hist.filter(_._1 > 0).foreach { case (b, _, nc, _, mx) =>
      assert(nc == expClusters.getOrElse(b, 0L), s"bucket $b")
      assert(mx == bySize.keys.filter(sz => bucketOf(sz) == b).maxOption
        .getOrElse(0L))
    }
    // singleton count = corpus minus clustered docs
    assert(hist.head._3 == total - manifest.length)
    // occupied buckets only, in order, drawn from the fixed label set
    val full = List("1", "2", "3-4", "5-8", "9+")
    assert(hist.map(_._2).forall(full.contains))
    assert(hist.map(_._1) == hist.map(_._1).sorted)
    assert(hist.head._2 == "1")
  }

  test("d23 counts equal an in-memory truth + band replay") {
    val row = DedupQueries.d23_lsh_recall_eval(spark, sf()).head()
    val got = (0 to 3).map(row.getLong)

    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val tk = r.getString(1).split(" ").distinct
          .map(t => TextHashKernels.md5Long60(t.getBytes("UTF-8"))).toSet
        (r.getLong(0), tk)
      }
    val n = docs.length.toLong
    val r = {
      var b = 0
      while ((1L << b) < n) b += 1
      math.max(8, (b + 1) / 2)
    }
    val p = 2147483647L
    def sig(tk: Set[Long]): IndexedSeq[Long] = (0 until 2 * r).map { k =>
      val a = (1103515245L * (k + 1) + 12345L) % p
      val bb = (1103515245L * (k + 101) + 12345L) % p
      tk.map(h => (a * (h % p) + bb) % p).min
    }
    val sigs = docs.map { case (id, tk) => (id, tk, sig(tk)) }
    val m = math.max(25L, n / 100L)
    val qs = sigs.filter(_._1 % m == 0)
    def jac(a: Set[Long], b: Set[Long]): Double =
      a.intersect(b).size.toDouble / a.union(b).size.toDouble
    val truth = (for {
      q <- qs; d <- sigs if d._1 != q._1 && jac(d._2, q._2) >= 0.9
    } yield (q._1, d._1)).toSet
    def bandKeys(sg: IndexedSeq[Long]) =
      Seq(0, 1).map(b => (b, sg.slice(b * r, b * r + r).mkString("_")))
    val qbk = qs.flatMap(q => bandKeys(q._3).map(k => (k, q._1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val cand = (for {
      d <- sigs; k <- bandKeys(d._3); q <- qbk.getOrElse(k, Array.empty[Long])
      if q != d._1
    } yield (q, d._1)).toSet
    val hit = cand.intersect(truth)
    assert(got == Seq(qs.length.toLong, truth.size.toLong,
      cand.size.toLong, hit.size.toLong),
      s"got $got vs ${(qs.length, truth.size, cand.size, hit.size)}")
    assert(row.getLong(4) == (if (cand.isEmpty) 1000000L
      else hit.size * 1000000L / cand.size))
    assert(row.getLong(5) == (if (truth.isEmpty) 1000000L
      else hit.size * 1000000L / truth.size))
  }
}
