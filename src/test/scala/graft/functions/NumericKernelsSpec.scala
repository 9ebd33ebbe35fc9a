package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.BinaryCodec

/** Direct unit coverage for the numeric kernels and codecs that have no
  * oracle query (transcendental or binary outputs): compress round-trip,
  * spline knots, in-array kcluster, complex polar/rect round-trip. */
class NumericKernelsSpec extends SparkSpec {

  private def df = {
    val s = spark
    import s.implicits._
    Seq((1L, Seq(1.0, 4.0, 9.0, 16.0, 25.0, 36.0))).toDF("id", "a")
  }

  test("oph_compress / oph_uncompress round-trip the packed blob") {
    val out = df.select(
      BinaryCodec.oph_from_bin(
        BinaryCodec.oph_uncompress(
          BinaryCodec.oph_compress(
            BinaryCodec.oph_to_bin(col("a"))))).as("rt"))
      .head.getSeq[Double](0)
    assert(out == Seq(1.0, 4.0, 9.0, 16.0, 25.0, 36.0))
  }

  test("oph_gsl_spline reproduces values at the knots") {
    val out = df.select(
      Numeric.oph_gsl_spline(col("a"), Seq(1.0, 3.0, 6.0)).as("s"))
      .head.getSeq[Double](0)
    assert(out(0) == 1.0 && out(1) == 9.0 && out(2) == 36.0)
  }

  test("oph_gsl_spline interpolates between knots monotonically here") {
    val out = df.select(
      Numeric.oph_gsl_spline(col("a"), Seq(2.5)).as("s"))
      .head.getSeq[Double](0)
    assert(out(0) > 4.0 && out(0) < 9.0) // between a(2)=4 and a(3)=9
  }

  test("oph_ccluster_kcluster maps each element to one of k centroids") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, Seq(0.0, 0.1, 0.2, 10.0, 10.1, 10.2))).toDF("id", "a")
    val out = d.select(Numeric.oph_ccluster_kcluster(col("a"), 2).as("c"))
      .head.getSeq[Double](0)
    assert(out.distinct.size == 2)
    // low elements share one centroid (~0.1), high share the other (~10.1)
    assert(out.take(3).distinct.size == 1 && out.drop(3).distinct.size == 1)
    assert(math.abs(out.head - 0.1) < 1e-9 && math.abs(out.last - 10.1) < 1e-9)
  }

  test("complex to_polar / to_rect round-trip interleaved pairs") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, Seq(3.0, 4.0, -1.0, 2.0))).toDF("id", "a")
    val out = d.select(
      Stats.oph_gsl_complex_to_rect(
        Stats.oph_gsl_complex_to_polar(col("a"))).as("rt"))
      .head.getSeq[Double](0)
    out.zip(Seq(3.0, 4.0, -1.0, 2.0)).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-12, s"$got != $want")
    }
  }
}
