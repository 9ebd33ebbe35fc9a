package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

import graft.core.ColumnBridge

/** Native single-pass kernels for SCALAR quantization (s24) — the SQ8
  * layout next to PQ ([[PQKernels]]) and binary (s16): each dimension
  * stores one uint8 code against a per-dimension [min, max] range, so a
  * 64-dim double vector shrinks 512 → 64 bytes with far better fidelity
  * than PQ's 8 bytes. Codes are exact integer transforms
  * (`⌊(x−min)/range·255⌋` clamped), the asymmetric distance dequantizes
  * at `min + code·range/255` — both replayed verbatim by the DuckDB
  * oracle, and both inside whole-stage codegen as one static call per
  * row (the s18 interpreted-HOF lesson). */
object SQ8Kernels {
  final val D = 64

  /** Per-dimension uint8 codes, packed as 64 bytes. A degenerate
    * dimension (range ≤ 0) codes to 0. */
  def encode(x: ArrayData, mins: Array[Double],
             scales: Array[Double]): Array[Byte] = {
    val out = new Array[Byte](D)
    var d = 0
    while (d < D) {
      val s = scales(d)
      val q =
        if (s <= 0.0) 0
        else {
          val v = math.floor((x.getDouble(d) - mins(d)) / s * 255.0)
          if (v < 0.0) 0 else if (v > 255.0) 255 else v.toInt
        }
      out(d) = q.toByte
      d += 1
    }
    out
  }

  /** Asymmetric squared-L2: exact query vs dequantized codes, ascending
    * dimension order (the oracle's left fold). */
  def adc(q: ArrayData, codes: Array[Byte], mins: Array[Double],
          scales: Array[Double]): Double = {
    var s = 0.0
    var d = 0
    while (d < D) {
      val deq = mins(d) + (codes(d) & 0xFF).toDouble * scales(d) / 255.0
      val dx = q.getDouble(d) - deq
      s += dx * dx
      d += 1
    }
    s
  }
}

/** SQ8 encode as one native call; `mins`/`scales` are the per-dimension
  * quantizer bounds (bounded driver-side state, shipped as references). */
final case class Sq8Encode(child: Expression, mins: Seq[Double],
                           scales: Seq[Double]) extends UnaryExpression {
  override def prettyName: String = "graft_sq8_encode"
  override def dataType: DataType = BinaryType
  @transient private lazy val mn: Array[Double] = mins.toArray
  @transient private lazy val sc: Array[Double] = scales.toArray
  override def nullSafeEval(x: Any): Any =
    SQ8Kernels.encode(x.asInstanceOf[ArrayData], mn, sc)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mref = ctx.addReferenceObj("sq8mins", mn, "double[]")
    val sref = ctx.addReferenceObj("sq8scales", sc, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.SQ8Kernels.encode($c, $mref, $sref)")
  }
  override protected def withNewChildInternal(newChild: Expression): Sq8Encode =
    copy(child = newChild)
}

object Sq8Encode {
  def apply(c: Column, mins: Seq[Double], scales: Seq[Double]): Column =
    ColumnBridge.column(Sq8Encode(ColumnBridge.expression(c), mins, scales))
}

/** SQ8 asymmetric distance as one native call. */
final case class Sq8Adc(left: Expression, right: Expression,
                        mins: Seq[Double], scales: Seq[Double])
    extends BinaryExpression {
  override def prettyName: String = "graft_sq8_adc"
  override def dataType: DataType = DoubleType
  @transient private lazy val mn: Array[Double] = mins.toArray
  @transient private lazy val sc: Array[Double] = scales.toArray
  override def nullSafeEval(l: Any, r: Any): Any =
    SQ8Kernels.adc(l.asInstanceOf[ArrayData], r.asInstanceOf[Array[Byte]],
      mn, sc)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mref = ctx.addReferenceObj("sq8mins", mn, "double[]")
    val sref = ctx.addReferenceObj("sq8scales", sc, "double[]")
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.plans.SQ8Kernels.adc($l, $r, $mref, $sref)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Sq8Adc = copy(left = newLeft, right = newRight)
}

object Sq8Adc {
  def apply(l: Column, r: Column, mins: Seq[Double],
            scales: Seq[Double]): Column =
    ColumnBridge.column(Sq8Adc(ColumnBridge.expression(l),
      ColumnBridge.expression(r), mins, scales))
}
