package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables

/** Structural invariants for the round-6 corpus-preparation operators:
  * t07 repetition quality, p05 domain mixing, p06 leakproof split,
  * d12 semantic dedup. These hold for ANY input, complementing the
  * DuckDB value oracles. */
class CorpusPrepSpec extends SparkSpec {

  private lazy val nDocs = Tables.documents(spark, sf()).count()

  test("t07 fixed-point metrics stay in [0, 1e6] and keep matches thresholds") {
    val rows = TextQueries.t07_quality_repetition(spark, sf()).collect()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val (ttr, topw, topg) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ttr > 0 && ttr <= 1000000L)
      assert(topw > 0 && topw <= 1000000L)
      assert(topg > 0 && topg <= 1000000L)
      assert(r.getBoolean(5) ==
        (ttr >= 450000L && topw <= 120000L && topg <= 60000L))
    }
    // thresholds must actually split the corpus (guards against a
    // trivially all-true/all-false keep flag)
    assert(rows.count(_.getBoolean(5)) > 0)
    assert(rows.count(!_.getBoolean(5)) > 0)
  }

  test("p05 takes at least one doc per domain and never restarts past budget") {
    PipelineQueries.p05_domain_mix(spark, sf()).collect().foreach { r =>
      val (budget, nTotal, nKept, charsKept) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nKept >= 1 && nKept <= nTotal)
      // the last kept doc starts strictly below budget; docs are < 1000
      // chars, so the overshoot is bounded by one doc
      assert(charsKept < budget + 1000)
    }
  }

  test("p06 split partitions docs and groups exactly") {
    val out = PipelineQueries.p06_split_leakproof(spark, sf()).collect()
    assert(out.map(_.getLong(1)).sum == nDocs)
    val nGroups = Tables.documents(spark, sf())
      .select(concat_ws(" ",
        array_sort(array_distinct(split(col("text"), " ")))).as("canon"))
      .distinct().count()
    assert(out.map(_.getLong(2)).sum == nGroups)
  }

  test("d12 semantic dedup matches the naive within-cluster cosine check") {
    val out = DedupQueries.d12_semantic_dedup(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val vecs = Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byCluster = out.groupBy(_._2)
    out.foreach { case (id, cid, isDup) =>
      val lower = byCluster(cid).filter(_._1 < id)
      val expect = lower.exists(o => cos(vecs(o._1), vecs(id)) >= 0.4)
      assert(isDup == expect, s"vec $id in cluster $cid")
    }
  }
}
