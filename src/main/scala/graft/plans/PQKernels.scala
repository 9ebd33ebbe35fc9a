package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

import graft.core.ColumnBridge

/** Native single-pass kernels for product quantization (s08/s09). They
  * compute EXACTLY the values of the HOF formulations they replaced —
  * the same left-fold i=0..7 sub-distance, the same first-minimum
  * argmin (`array_position(dists, array_min(dists))`), the same
  * ascending-m ADC fold — so the DuckDB oracles are unchanged
  * (PQKernelSpec pins the equivalence against the HOF build).
  *
  * They exist because the expression-tree version of the 8×16-codebook
  * encode is ~4000 Catalyst nodes after the nested transform/aggregate
  * HOFs expand, and profiling showed PLAN+CODEGEN time, not data work,
  * dominating s08/s09 at bench scale (2.6–3.1 s for 2 000 vectors).
  * One static call per row keeps the whole encode inside whole-stage
  * codegen with three flat loops — and at 100 TB the same call is the
  * per-row cost that matters.
  *
  * Codebook layout: flattened row-major `c*64 + m*8 + i` (entry c holds
  * a full 64-dim vector; sub-block m uses dims m*8..m*8+7), matching
  * the HOF's `element_at(cbCol, c+1)[m*8+i+1]`. */
object PQKernels {
  final val M = 8
  final val K = 16
  final val D = 8

  /** Per-subspace argmin codes (first minimum wins ties). */
  def encode(x: ArrayData, cb: Array[Double]): ArrayData = {
    val out = new Array[Long](M)
    var m = 0
    while (m < M) {
      var best = Double.PositiveInfinity
      var bi = 0
      var c = 0
      while (c < K) {
        var s = 0.0
        var i = 0
        while (i < D) {
          val dx = x.getDouble(m * D + i) - cb(c * (M * D) + m * D + i)
          s += dx * dx
          i += 1
        }
        if (s < best) { best = s; bi = c }
        c += 1
      }
      out(m) = bi.toLong
      m += 1
    }
    new GenericArrayData(out)
  }

  /** The 8×16 table of sub-distances from a query (residual) to every
    * codebook entry — one per (m, c). */
  def lut(qr: ArrayData, cb: Array[Double]): ArrayData = {
    val rows = new Array[Any](M)
    var m = 0
    while (m < M) {
      val row = new Array[Double](K)
      var c = 0
      while (c < K) {
        var s = 0.0
        var i = 0
        while (i < D) {
          val dx = qr.getDouble(m * D + i) - cb(c * (M * D) + m * D + i)
          s += dx * dx
          i += 1
        }
        row(c) = s
        c += 1
      }
      rows(m) = new GenericArrayData(row)
      m += 1
    }
    new GenericArrayData(rows)
  }

  /** Asymmetric distance: ascending-m fold of lut[m][codes[m]]. */
  def adc(lut: ArrayData, codes: ArrayData): Double = {
    var s = 0.0
    var m = 0
    while (m < M) {
      s += lut.getArray(m).getDouble(codes.getLong(m).toInt)
      m += 1
    }
    s
  }
}

/** PQ encode as one native call; `cb` is the flattened 16×64 codebook. */
final case class PQEncode(child: Expression, cb: Seq[Double])
    extends UnaryExpression {
  override def prettyName: String = "graft_pq_encode"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  @transient private lazy val cbArr: Array[Double] = cb.toArray
  override def nullSafeEval(x: Any): Any =
    PQKernels.encode(x.asInstanceOf[ArrayData], cbArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqcb", cbArr, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.PQKernels.encode($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): PQEncode =
    copy(child = newChild)
}

object PQEncode {
  def apply(c: Column, cb: Seq[Double]): Column =
    ColumnBridge.column(PQEncode(ColumnBridge.expression(c), cb))
}

/** Per-query LUT as one native call. */
final case class PQLut(child: Expression, cb: Seq[Double])
    extends UnaryExpression {
  override def prettyName: String = "graft_pq_lut"
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  @transient private lazy val cbArr: Array[Double] = cb.toArray
  override def nullSafeEval(x: Any): Any =
    PQKernels.lut(x.asInstanceOf[ArrayData], cbArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqcb", cbArr, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.PQKernels.lut($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): PQLut =
    copy(child = newChild)
}

object PQLut {
  def apply(c: Column, cb: Seq[Double]): Column =
    ColumnBridge.column(PQLut(ColumnBridge.expression(c), cb))
}

/** ADC lookup-sum as one native call. */
final case class PQAdc(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_pq_adc"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    PQKernels.adc(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.plans.PQKernels.adc($l, $r)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PQAdc = copy(left = newLeft, right = newRight)
}

object PQAdc {
  def apply(l: Column, r: Column): Column =
    ColumnBridge.column(PQAdc(ColumnBridge.expression(l), ColumnBridge.expression(r)))
}
