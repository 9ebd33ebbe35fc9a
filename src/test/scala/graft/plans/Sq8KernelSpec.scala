package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SQ8 kernel semantics pinned against driver-side Scala replays: the
  * exact integer code formula, the clamped edges, the dequantization
  * error bound, and the codegen ADC against a HOF formulation. */
class Sq8KernelSpec extends SparkSpec {

  private val rnd = new scala.util.Random(23)
  private val mins = Array.fill(64)(rnd.nextDouble() - 0.7)
  private val scales = Array.fill(64)(rnd.nextDouble() + 0.1)

  test("encode matches the exact formula; in-range values never clamp") {
    import spark.implicits._
    val v = Array.tabulate(64)(d => mins(d) + rnd.nextDouble() * scales(d))
    val codes = Seq(Tuple1(v.toSeq)).toDF("a")
      .select(Sq8Encode(col("a"), mins.toIndexedSeq, scales.toIndexedSeq))
      .head.getAs[Array[Byte]](0)
    codes.zipWithIndex.foreach { case (c, d) =>
      val want = math.floor((v(d) - mins(d)) / scales(d) * 255.0).toInt
      assert((c & 0xFF) == want, s"dim $d")
    }
    // exact bounds: min codes to 0, max to 255; outliers clamp
    val lo = Seq(Tuple1(mins.toSeq)).toDF("a")
      .select(Sq8Encode(col("a"), mins.toIndexedSeq, scales.toIndexedSeq))
      .head.getAs[Array[Byte]](0)
    assert(lo.forall(_ == 0))
    val hi = Seq(Tuple1(mins.zip(scales).map { case (m, s) => m + s * 2 }.toSeq))
      .toDF("a")
      .select(Sq8Encode(col("a"), mins.toIndexedSeq, scales.toIndexedSeq))
      .head.getAs[Array[Byte]](0)
    assert(hi.forall(b => (b & 0xFF) == 255))
    // a degenerate dimension (range 0) codes to 0, never divides by zero
    val zs = Array.fill(64)(0.0)
    val z = Seq(Tuple1(mins.toSeq)).toDF("a")
      .select(Sq8Encode(col("a"), mins.toIndexedSeq, zs.toIndexedSeq))
      .head.getAs[Array[Byte]](0)
    assert(z.forall(_ == 0))
  }

  test("adc equals the dequantized exact distance within the SQ bound") {
    import spark.implicits._
    val x = Array.tabulate(64)(d => mins(d) + rnd.nextDouble() * scales(d))
    val q = Array.tabulate(64)(d => mins(d) + rnd.nextDouble() * scales(d))
    val df = Seq((x.toSeq, q.toSeq)).toDF("a", "qa")
      .withColumn("sq",
        Sq8Encode(col("a"), mins.toIndexedSeq, scales.toIndexedSeq))
    val adc = df
      .select(Sq8Adc(col("qa"), col("sq"), mins.toIndexedSeq,
        scales.toIndexedSeq)).head.getDouble(0)
    // driver replay of the dequantized distance
    val codes = df.select("sq").head.getAs[Array[Byte]](0)
    val want = (0 until 64).map { d =>
      val deq = mins(d) + (codes(d) & 0xFF).toDouble * scales(d) / 255.0
      val dx = q(d) - deq
      dx * dx
    }.foldLeft(0.0)(_ + _)
    assert(adc == want, "codegen ADC must equal the scalar replay exactly")
    // quantization moves each dim by < scale/255, so ADC brackets the
    // exact distance within the per-dim worst case
    val exact = (0 until 64).map(d => (q(d) - x(d)) * (q(d) - x(d))).sum
    val slack = (0 until 64).map { d =>
      val e = scales(d) / 255.0
      2 * math.abs(q(d) - x(d)) * e + e * e
    }.sum
    assert(math.abs(adc - exact) <= slack + 1e-12)
  }
}
