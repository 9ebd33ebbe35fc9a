package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** p23 greedy k-center coreset: re-derived here by an independent
  * in-memory farthest-point replay (same left-fold Σ(x−y)² order, same
  * lowest-vec_id tie-breaks), so the spec is an oracle of its own. */
class KCenterSpec extends SparkSpec {

  test("p23 equals an in-memory farthest-point replay, all ties included") {
    val k = 8
    val out = PipelineQueries.p23_kcenter_coreset(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList

    val pts = Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); acc += t * t; i += 1 }
      acc
    }
    var centers = Vector((pts.head._1, pts.head._2, 0.0))
    val mind = scala.collection.mutable.Map(
      pts.map(p => p._1 -> d2(p._2, pts.head._2)): _*)
    for (_ <- 2 to k) {
      val chosen = centers.map(_._1).toSet
      val pick = pts.filterNot(p => chosen(p._1))
        .maxBy(p => (mind(p._1), -p._1))
      centers :+= ((pick._1, pick._2, mind(pick._1)))
      pts.foreach(p => mind(p._1) = math.min(mind(p._1), d2(p._2, pick._2)))
    }
    // assignment: nearest center, tie -> earliest round
    val counts = Array.fill(k)(0L)
    pts.foreach { p =>
      val ds = centers.map(c => d2(p._2, c._2))
      counts(ds.indexOf(ds.min)) += 1
    }
    val expected = centers.zipWithIndex.map { case ((id, _, m), i) =>
      (i + 1L, id, math.floor(m * 1e6).toLong, counts(i))
    }.toList
    assert(out == expected)
    // farthest-point invariant: selection radii are non-increasing after r=2
    out.drop(1).sliding(2).foreach {
      case List(a, b) => assert(a._3 >= b._3)
      case _ =>
    }
    assert(out.map(_._4).sum == pts.length)
  }
}
