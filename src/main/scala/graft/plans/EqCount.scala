package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

import graft.core.ColumnBridge

/** Number of positions where two equal-length array<bigint> columns hold
  * the same value — the MinHash collision-estimate kernel
  * (`|{i : sigA[i] = sigB[i]}|`). Replaces the
  * `aggregate(zip_with(...))` higher-order formulation in the LSH
  * prefilter: HOFs evaluate interpreted (lambda dispatch per element),
  * and the prefilter runs INSIDE the band self-join where a single hot
  * bucket can emit millions of candidate rows in one task — a per-pair
  * interpreted lambda there serializes the whole stage behind one slow
  * task. This loop is codegen'd, allocation-free, O(k).
  */
final case class EqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> args, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_eq_count"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var c = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $i = 0; int $c = 0;
         |while ($i < $n) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |  $i++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): EqCount =
    copy(left = newLeft, right = newRight)
}

object EqCount {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(EqCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
