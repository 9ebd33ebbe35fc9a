package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

import graft.core.ColumnBridge

/** Membership test against a STATIC sorted set of disjoint long ranges,
  * by binary search — O(log r) per row instead of the O(r) chain a
  * `range₁ OR range₂ OR …` predicate compiles to. Built for the z-order
  * BIGMIN probe (q43): a quadtree box decomposition yields
  * O(width+height) ranges, and at hundreds of ranges the sequential OR
  * chain dominates the scan (measured 4× the whole-query cost at 10×
  * sf0.1). The ranges ride into codegen as two reference long[] arrays.
  *
  * Callers keep a cheap pushable envelope conjunct (zval BETWEEN min
  * AND max of all ranges) next to this expression: the envelope reaches
  * parquet row-group stats, this expression decides rows exactly.
  */
final case class SortedRangeContains(child: Expression, startsSeq: Seq[Long],
    endsSeq: Seq[Long]) extends UnaryExpression {
  require(startsSeq.length == endsSeq.length && startsSeq.nonEmpty,
    "starts/ends must be same-length and non-empty")
  // Seq params (not Array): case-class equality stays structural, so
  // semanticEquals / subexpression elimination work, and toString
  // renders the actual ranges instead of [J@… identity hashes in
  // EXPLAIN dumps. The eval/codegen path wants primitive arrays:
  @transient private lazy val starts: Array[Long] = startsSeq.toArray
  @transient private lazy val ends: Array[Long] = endsSeq.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint child, got ${other.simpleString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_in_sorted_ranges"

  private def contains(v: Long): Boolean = {
    val idx = java.util.Arrays.binarySearch(starts, v)
    if (idx >= 0) true
    else {
      val ip = -idx - 1
      ip > 0 && v <= ends(ip - 1)
    }
  }

  override def nullSafeEval(input: Any): Any =
    contains(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val startsRef = ctx.addReferenceObj("starts", starts, "long[]")
    val endsRef = ctx.addReferenceObj("ends", ends, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val idx = ctx.freshName("idx")
      val ip = ctx.freshName("ip")
      s"""
         |int $idx = java.util.Arrays.binarySearch($startsRef, $v);
         |if ($idx >= 0) {
         |  ${ev.value} = true;
         |} else {
         |  int $ip = -$idx - 1;
         |  ${ev.value} = $ip > 0 && $v <= $endsRef[$ip - 1];
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SortedRangeContains =
    copy(child = newChild)
}

object SortedRangeContains {
  /** `ranges` must be sorted by start and pairwise disjoint. */
  def apply(c: Column, ranges: Seq[(Long, Long)]): Column =
    ColumnBridge.column(SortedRangeContains(ColumnBridge.expression(c),
      ranges.map(_._1), ranges.map(_._2)))
}
