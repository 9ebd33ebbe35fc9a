package graft.operators

import graft.SparkSpec

/** p21's oriented-wedge count against a brute-force triangle
  * enumeration, and c10's bootstrap invariants (weight calibration,
  * band ordering, determinism) — the properties the row-hash oracle
  * can't articulate. */
class TriangleBootstrapSpec extends SparkSpec {

  test("p21 equals brute-force triangle enumeration on the small graph") {
    import org.apache.spark.sql.functions._
    val out = PipelineQueries.p21_triangle_count(spark, sf()).head()
    // rebuild the undirected edge set exactly as docLinkGraph does and
    // enumerate triangles by brute force (n ≈ 500 docs at sf0.001)
    val docs = graft.core.Tables.documents(spark, sf())
      .select("doc_id").collect().map(_.getLong(0))
    val n = docs.length.toLong
    val und = scala.collection.mutable.Set.empty[(Long, Long)]
    docs.foreach { id =>
      Seq((id * 31 + 7) % n, (id * 17 + 3) % n,
        (id * 13 + 11) % n, (id + 1) % n).foreach { d0 =>
        val d = if (d0 == id) (d0 + 1) % n else d0
        if (d != id) und += ((math.min(id, d), math.max(id, d)))
      }
    }
    val adj = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupMap(_._1)(_._2).map { case (k, v) => k -> v.toSet }
    val tri = und.toSeq.map { case (a, b) =>
      (adj(a) & adj(b)).count(c => c > b) // count each triangle once
    }.sum
    assert(out.getAs[Long]("n_edges") === und.size.toLong)
    assert(out.getAs[Long]("n_triangles") === tri.toLong)
    val wedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    assert(out.getAs[Long]("n_wedges") === wedges)
    assert(out.getAs[Long]("transitivity_fp") ===
      3000000L * tri / wedges)
  }

  test("c10 weights are Poisson(1)-calibrated and the band brackets") {
    val rows = ClusterQueries.c10_bootstrap_ci(spark, sf()).collect()
    assert(rows.length === 32)
    val nDocs = graft.core.Tables.documents(spark, sf()).count()
    // E[w] = 0.99 by the bucket table; each replicate's effective n
    // should sit near the corpus size (±20% at ~500 docs)
    rows.foreach { r =>
      val nEff = r.getAs[Long]("n_eff")
      assert(math.abs(nEff - nDocs).toDouble / nDocs < 0.20,
        s"replicate ${r.getAs[Long]("rep")}: n_eff $nEff vs $nDocs")
    }
    val means = rows.map(_.getAs[Long]("mean_fp")).sorted
    val (lo, hi) = (rows.head.getAs[Long]("lo_fp"),
      rows.head.getAs[Long]("hi_fp"))
    assert(lo === means(1) && hi === means(30),
      "band must be the 2nd/31st order statistics")
    assert(lo < hi)
    // determinism: a second run reproduces every replicate mean
    val again = ClusterQueries.c10_bootstrap_ci(spark, sf()).collect()
      .map(_.getAs[Long]("mean_fp")).sorted
    assert(again.sameElements(means))
  }

  test("p22: HRW reshard moves docs ONLY into the new shard, ≈1/17 of them") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column
    // recompute both assignments row-level to check the HRW guarantee
    // the aggregated query output can't express
    def score(doc: Column, k: Long): Column =
      (pmod(doc, lit(2147483647L)) * 1103515245L +
        lit(k + 1L) * 12345L + 6789L) % 2147483647L * 16807L % 2147483647L
    def assign(n: Int): Column =
      array_max(array((0 until n).map(k =>
        score(col("doc_id"), k.toLong) * 32L + k.toLong): _*)) % 32L
    val rows = graft.core.Tables.documents(spark, sf())
      .select(col("doc_id"), assign(16).as("s16"), assign(17).as("s17"))
    val moved = rows.filter(col("s16") =!= col("s17"))
    // minimal disruption: every moved doc lands in shard 16, never in
    // another surviving shard
    assert(moved.filter(col("s17") =!= 16L).count() === 0L,
      "HRW must never move a doc between surviving shards")
    val (m, n) = (moved.count().toDouble, rows.count().toDouble)
    assert(m / n > 0.02 && m / n < 0.12,
      s"moved share ${m / n} should be near 1/17")
    // and the query's aggregate agrees with the row-level recompute
    val agg = PipelineQueries.p22_rendezvous_shards(spark, sf())
      .agg(sum("n_moved")).head.getLong(0)
    assert(agg === moved.count())
  }
}
