package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import graft.core.ColumnBridge

/** Array-index key algebra: the reference's built-in scalar functions used
  * to re-map `id_dim` keys between cube shapes.
  *
  * Reference: `src/query_engine/oph_query_expression_functions.c:30-200`.
  * All of these are pure column arithmetic — they stay inside whole-stage
  * codegen and never leave the Catalyst expression tree, so filters built
  * from them are evaluated at scan time (and, with `id_dim`-ordered
  * layouts, benefit from parquet min/max row-group pruning).
  *
  * The reference evaluates `floor((id-1)/size)` in C `double` arithmetic;
  * we use true 64-bit integral division (`IntegralDivide`), which agrees
  * for all positive ids and stays exact past 2^53.
  */
object KeyAlgebra {

  /** Exact integer division on longs (Catalyst `div`). */
  def ldiv(a: Column, b: Column): Column =
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(a.cast(LongType)),
      ColumnBridge.expression(b.cast(LongType))))

  /** `oph_id(id, size) = 1 + floor((id-1)/size)` — collapse key by block.
    * Ref: oph_query_expression_functions.c:30-48. */
  def oph_id(id: Column, size: Column): Column =
    lit(1L) + ldiv(id - 1L, size)
  def oph_id(id: Column, size: Long): Column = oph_id(id, lit(size))

  /** `oph_id2(id, size, bs)` — block-preserving collapse:
    * `1 + (id-1) % bs + floor((id-1)/(size*bs)) * bs`.
    *
    * NOTE: the reference source (oph_query_expression_functions.c:50-69)
    * contains a C precedence bug: `(id - 1 % block_size)` parses as
    * `id - (1 % block_size)`. We implement the documented intent (the
    * parenthesised formula above); divergence is deliberate.
    */
  def oph_id2(id: Column, size: Column, blockSize: Column): Column =
    lit(1L) + pmod(id - 1L, blockSize).cast(LongType) +
      ldiv(id - 1L, size.cast(LongType) * blockSize.cast(LongType)) * blockSize.cast(LongType)
  def oph_id2(id: Column, size: Long, blockSize: Long): Column =
    oph_id2(id, lit(size), lit(blockSize))

  /** `oph_id3(id, list, bs)` — collapse via a per-slot row-count list
    * (subset remap). `list(i)` = number of kept rows in output slot i.
    * Ref: oph_query_expression_functions.c:71-126.
    *
    * The reference receives `list` as a packed int64 BLOB; we take the
    * decoded sizes. Implemented as pure column arithmetic over a literal
    * list (the list is always a query-time constant in the dialect).
    */
  def oph_id3(id: Column, list: Seq[Long], blockSize: Long): Column = {
    val reduced = list.sum
    val k = id.cast(LongType) - 1L
    val rowIndex = ldiv(k, lit(blockSize))
    val rel = pmod(rowIndex, lit(reduced))
    // find i such that prefix(i) <= rel < prefix(i+1); last slot catches rest
    val prefix = list.scanLeft(0L)(_ + _) // size n+1
    val slot = (0 until list.size - 1).foldRight(lit(list.size - 1L): Column) {
      case (i, els) => when(rel >= prefix(i) && rel < prefix(i + 1), lit(i.toLong)).otherwise(els)
    }
    pmod(k, lit(blockSize)) + (slot + ldiv(rowIndex, lit(reduced)) * list.size) * blockSize + 1L
  }

  /** `oph_id_to_index(id, size1, size2, ...)` — mixed-radix decode of id,
    * returning the index (1-based) along the LAST listed dimension.
    * Ref: oph_query_expression_functions.c:128-156. */
  def oph_id_to_index(id: Column, sizes: Long*): Column = {
    var cur = id.cast(LongType) - 1L
    var index = cur
    sizes.foreach { s =>
      index = pmod(cur, lit(s))
      cur = ldiv(cur - index, lit(s))
    }
    when(id - 1L < 0L, lit(-1L)).otherwise(index + 1L)
  }

  /** `oph_id_to_index2(id, bs, size) = 1 + (floor((id-1)/bs) mod size)`.
    * Ref: oph_query_expression_functions.c:158-177. */
  def oph_id_to_index2(id: Column, blockSize: Column, size: Column): Column =
    lit(1L) + pmod(ldiv(id - 1L, blockSize), size.cast(LongType))
  def oph_id_to_index2(id: Column, blockSize: Long, size: Long): Column =
    oph_id_to_index2(id, lit(blockSize), lit(size))

  /** `oph_is_in_subset(id, start, step, max)` — membership of id in the
    * strided range [start, max] with stride `step`.
    * Ref: oph_query_expression_functions.c:179-200. Returns BOOLEAN
    * (the reference returns LONG 0/1; cast if the compat layer needs it). */
  def oph_is_in_subset(id: Column, start: Column, step: Column, max: Column): Column =
    (pmod(id - start, step) === 0L) && (id >= start) && (id <= max)
  def oph_is_in_subset(id: Column, start: Long, step: Long, max: Long): Column =
    oph_is_in_subset(id, lit(start), lit(step), lit(max))

  /** `oph_id_of_subset` plugin alias (etc/oph_primitives_list.in:201). */
  def oph_id_of_subset(id: Column, start: Long, step: Long, max: Long): Column =
    oph_is_in_subset(id, start, step, max)
}
