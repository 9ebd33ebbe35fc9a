package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** q63 incremental batch MV + s13 ANN recall eval. */
class IncrementalMvRecallSpec extends SparkSpec {

  test("q63: refresh never rescans the base fact table") {
    val df = RelationalQueries.q63_incremental_mv(spark, sf())
    // the refresh plan's inputs are the stored aggregate + the delta
    // partition — lineitem.parquet itself must NOT be among them
    val inputs = df.inputFiles
    assert(inputs.nonEmpty)
    assert(!inputs.exists(_.contains("lineitem.parquet")),
      s"base facts rescanned: ${inputs.mkString(", ")}")
    assert(inputs.exists(_.contains("graft_q63_agg")) &&
      inputs.exists(_.contains("graft_q63_delta")))
    // and the merged view equals the one-shot aggregate
    val full = Tables.lineitem(spark, sf())
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"),
        col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    val got = df.collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got === full)
  }

  test("s13: recall matches an in-memory exact-vs-IVF replay; mean row folds hits") {
    val vecs = Tables.embeddings(spark, sf())
      .selectExpr("vec_id", "cast(embedding as array<double>) a", "label")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
    def l2(x: Array[Double], y: Array[Double]): Double =
      x.zip(y).map { case (p, q) => (p - q) * (p - q) }.sum
    // centroids replay s02's exact fixed-point mean
    val cents = vecs.groupBy(_._3).map { case (lb, vs) =>
      val sums = vs.map(_._2).transpose.map(col =>
        col.map(x => math.floor(x * 1e9).toLong).sum)
      (lb, sums.map(_.toDouble / vs.length / 1e9).toArray)
    }
    val queries = vecs.filter(_._1 % 50 == 0)
    val exp = queries.map { case (qid, qa, _) =>
      val exact = vecs.filter(_._1 != qid)
        .sortBy(v => (l2(qa, v._2), v._1)).take(3).map(_._1).toSet
      val cell = cents.minBy { case (lb, c) => (l2(qa, c), lb) }._1
      val approx = vecs.filter(v => v._3 == cell && v._1 != qid)
        .sortBy(v => (l2(qa, v._2), v._1)).take(3).map(_._1).toSet
      (qid, (approx & exact).size.toLong)
    }.toMap
    val got = SimilarityQueries.s13_ann_recall(spark, sf())
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    exp.foreach { case (qid, h) =>
      assert(got(qid) === ((h, h * 1000000L / 3L)), s"query $qid")
    }
    val tot = exp.values.sum
    assert(got(-1L) === ((tot, tot * 1000000L / (exp.size * 3L))))
  }
}
