package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The custom codegen expressions vs their HOF/scala references —
  * interpreted path (nullSafeEval) and codegen path must both agree. */
class ExpressionsSpec extends SparkSpec {

  test("DotProduct equals the HOF left-fold on random-ish vectors") {
    import spark.implicits._
    val a = Seq(1.5, -2.0, 3.25, 0.0, 7.125)
    val b = Seq(2.0, 4.5, -1.25, 9.0, 0.5)
    val df = Seq((a, b)).toDF("a", "b")
    val native = df.select(DotProduct(col("a"), col("b"))).head.getDouble(0)
    val hof = df.select(aggregate(zip_with(col("a"), col("b"), _ * _),
      lit(0.0), _ + _)).head.getDouble(0)
    assert(native == hof)
    assert(native == a.zip(b).map { case (x, y) => x * y }.sum)
  }

  test("SortedIntersectSize equals set-intersection size") {
    import spark.implicits._
    val a = Seq(1L, 3L, 5L, 7L, 9L, 11L)
    val b = Seq(2L, 3L, 5L, 8L, 11L, 20L)
    val df = Seq((a, b)).toDF("a", "b")
    val got = df.select(SortedIntersectSize(col("a"), col("b"))).head.getInt(0)
    assert(got == a.toSet.intersect(b.toSet).size)
    // degenerate cases
    val e = Seq((Seq.empty[Long], b)).toDF("a", "b")
    assert(e.select(SortedIntersectSize(col("a"), col("b"))).head.getInt(0) == 0)
  }

  test("SimHash60 native equals the HOF formulation") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val texts = Seq("spark join merge window batch", "the a fast slow key value",
      "hash table scan row part dup dup dup")
    val df = texts.toDF("text")
      .withColumn("hs", TextFunctions.tokenHashes(col("text")))
    val native = df.select(SimHash60(col("hs"))).collect().map(_.getLong(0)).toSeq
    val hof = df.select(TextFunctions.simhashFromHashesHof(col("hs")))
      .collect().map(_.getLong(0)).toSeq
    assert(native == hof)
    assert(native.forall(v => v >= 0 && v < (1L << 60)))
  }
}
