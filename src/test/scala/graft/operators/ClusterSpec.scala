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
}
