package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Across-row elementwise array aggregation — the reference's AGGREGATE
  * primitives `oph_aggregate_operator` (etc/oph_primitives_list.in:9) and
  * friends, whose clear/add/exec lifecycle
  * (oph_query_plugin_executor.c:161-583) maps directly onto Spark's
  * partial+final `Aggregator` model: `reduce` = add (map-side partial,
  * so long arrays never explode into a per-element shuffle), `merge` =
  * the reference's `_partial`/`_final` protocol
  * (oph_primitives_list.in:17-21), `finish` = exec.
  *
  * Two variants:
  *  - [[ElementwiseLongAgg]] — exact fixed-point (pre-scaled long) sums:
  *    order-independent at ANY parallelism, so results are reproducible
  *    on 1 core or 1000 executors. This is the oracle-checked path.
  *  - [[ElementwiseDoubleAgg]] — raw double path for min/max (exact) and
  *    throughput-critical sums where last-bit reproducibility is waived.
  *
  * Buffer is a primitive array: one object per group per partition, no
  * per-element boxing in reduce.
  */
class ElementwiseLongAgg(op: String)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  private val init: Long = op match {
    case "sum" => 0L
    case "min" => Long.MaxValue
    case "max" => Long.MinValue
    case o => throw new IllegalArgumentException(s"unknown elementwise op: $o")
  }
  @inline private def combine(a: Long, b: Long): Long = op match {
    case "sum" => a + b
    case "min" => math.min(a, b)
    case "max" => math.max(a, b)
  }
  def zero: Array[Long] = Array.empty
  def reduce(b: Array[Long], a: Seq[Long]): Array[Long] = {
    if (a == null) return b
    val buf = if (b.length == 0) Array.fill(a.length)(init) else b
    var i = 0
    while (i < buf.length && i < a.length) { buf(i) = combine(buf(i), a(i)); i += 1 }
    buf
  }
  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    if (x.length == 0) return y
    if (y.length == 0) return x
    var i = 0
    while (i < x.length && i < y.length) { x(i) = combine(x(i), y(i)); i += 1 }
    x
  }
  def finish(b: Array[Long]): Seq[Long] = b.toSeq
  def bufferEncoder = ExpressionEncoder[Array[Long]]()
  def outputEncoder = ExpressionEncoder[Seq[Long]]()
}

class ElementwiseDoubleAgg(op: String)
    extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
  private val init: Double = op match {
    case "sum" => 0.0
    case "min" => Double.PositiveInfinity
    case "max" => Double.NegativeInfinity
    case o => throw new IllegalArgumentException(s"unknown elementwise op: $o")
  }
  @inline private def combine(a: Double, b: Double): Double = op match {
    case "sum" => a + b
    case "min" => math.min(a, b)
    case "max" => math.max(a, b)
  }
  def zero: Array[Double] = Array.empty
  def reduce(b: Array[Double], a: Seq[Double]): Array[Double] = {
    if (a == null) return b
    val buf = if (b.length == 0) Array.fill(a.length)(init) else b
    var i = 0
    while (i < buf.length && i < a.length) { buf(i) = combine(buf(i), a(i)); i += 1 }
    buf
  }
  def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
    if (x.length == 0) return y
    if (y.length == 0) return x
    var i = 0
    while (i < x.length && i < y.length) { x(i) = combine(x(i), y(i)); i += 1 }
    x
  }
  def finish(b: Array[Double]): Seq[Double] = b.toSeq
  def bufferEncoder = ExpressionEncoder[Array[Double]]()
  def outputEncoder = ExpressionEncoder[Seq[Double]]()
}

/** Elementwise running stats across rows (oph_aggregate_stats:13 and its
  * explicit two-phase _partial:21/_final:17 protocol — which is exactly
  * Spark's partial/final aggregation, so one Aggregator covers all
  * three): buffer = (count, sum, sumsq) per element; finish emits
  * [mean_0..mean_{n-1}, sd_0..sd_{n-1}] (population sd, mask "1?"). */
class ElementwiseStatsAgg
    extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
  // buffer layout: [n, sum_0.., sumsq_0..]
  def zero: Array[Double] = Array.empty
  def reduce(b: Array[Double], a: Seq[Double]): Array[Double] = {
    if (a == null) return b
    val m = a.length
    val buf = if (b.length == 0) new Array[Double](1 + 2 * m) else b
    buf(0) += 1
    var i = 0
    while (i < m && 1 + m + i < buf.length) {
      buf(1 + i) += a(i)
      buf(1 + m + i) += a(i) * a(i)
      i += 1
    }
    buf
  }
  def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
    if (x.length == 0) return y
    if (y.length == 0) return x
    var i = 0
    while (i < x.length && i < y.length) { x(i) += y(i); i += 1 }
    x
  }
  def finish(b: Array[Double]): Seq[Double] = {
    if (b.length == 0) return Seq.empty
    val m = (b.length - 1) / 2
    val n = b(0)
    val out = new Array[Double](2 * m)
    var i = 0
    while (i < m) {
      val mean = b(1 + i) / n
      out(i) = mean
      out(m + i) = math.sqrt(math.max(b(1 + m + i) / n - mean * mean, 0.0))
      i += 1
    }
    out.toSeq
  }
  def bufferEncoder = ExpressionEncoder[Array[Double]]()
  def outputEncoder = ExpressionEncoder[Seq[Double]]()
}

object ArrayAggregates {
  /** Elementwise mean+sd across rows (oph_aggregate_stats). */
  val ewStats = udaf(new ElementwiseStatsAgg, ExpressionEncoder[Seq[Double]]())
  /** Exact elementwise sum of pre-scaled long arrays (oracle path). */
  val ewSumLong = udaf(new ElementwiseLongAgg("sum"), ExpressionEncoder[Seq[Long]]())
  /** Elementwise min/max across rows (exact for doubles). */
  val ewMinDouble = udaf(new ElementwiseDoubleAgg("min"), ExpressionEncoder[Seq[Double]]())
  val ewMaxDouble = udaf(new ElementwiseDoubleAgg("max"), ExpressionEncoder[Seq[Double]]())
  /** Throughput path: raw double elementwise sum. */
  val ewSumDouble = udaf(new ElementwiseDoubleAgg("sum"), ExpressionEncoder[Seq[Double]]())
}
