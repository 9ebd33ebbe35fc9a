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

object ArrayAggregates {
  /** Exact elementwise sum of pre-scaled long arrays (oracle path). */
  val ewSumLong = udaf(new ElementwiseLongAgg("sum"), ExpressionEncoder[Seq[Long]]())
  /** Elementwise min/max across rows (exact for doubles). */
  val ewMinDouble = udaf(new ElementwiseDoubleAgg("min"), ExpressionEncoder[Seq[Double]]())
  val ewMaxDouble = udaf(new ElementwiseDoubleAgg("max"), ExpressionEncoder[Seq[Double]]())
  /** Throughput path: raw double elementwise sum. */
  val ewSumDouble = udaf(new ElementwiseDoubleAgg("sum"), ExpressionEncoder[Seq[Double]]())
}
