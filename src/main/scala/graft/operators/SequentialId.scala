package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlShims}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, GenericInternalRow, JoinedRow}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.types.LongType

/** Global dense row numbering — the reference's `sequential_id` /
  * `oph_subset` re-keying (oph_io_server_query_procedures.c:188-196):
  * output rows are renumbered start..start+n-1 in sort order.
  *
  * Scale posture: a bare `row_number() OVER (ORDER BY ...)` collapses to
  * a single partition at 100 TB. Instead: range-partition + local sort
  * (one shuffle — the same shuffle any global sort needs), then a small
  * per-partition COUNT job whose prefix sums become broadcast offsets,
  * and numbering is purely partition-local. The count job and the
  * numbering job share the sort's shuffle dependency, so the map side
  * runs once. No single-executor bottleneck at any scale.
  *
  * The numbering pass stays on InternalRow (Tungsten): rows flow from
  * the sorted exec straight into a JoinedRow(prefix-id, row) that the
  * LogicalRDD scan re-projects to UnsafeRow — no Row round-trip, no
  * DeserializeToObject in the plan (the previous `.rdd.zipWithIndex`
  * implementation deserialized every row to external Row and back). */
object SequentialId {
  def withSequentialId(df: DataFrame, idName: String, order: Seq[Column],
                       start: Long = 1L): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val qe = sorted.queryExecution
    val rdd = qe.toRdd
    val counts = rdd.mapPartitions({ it =>
      var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
      Iterator.single(n)
    }, preservesPartitioning = true).collect()
    val offsets = counts.scanLeft(start)(_ + _) // closure-captured, tiny
    val idAttr = AttributeReference(idName, LongType, nullable = false)()
    val attrs = idAttr +: qe.analyzed.output
    val numbered = rdd.mapPartitionsWithIndex({ (pid, it) =>
      var i = offsets(pid)
      val joined = new JoinedRow
      val idRow = new GenericInternalRow(1)
      // per-row mutation is safe: the LogicalRDD scan projects each row
      // to UnsafeRow before the next one is produced (the standard
      // unsafe-row iterator contract)
      it.map { row =>
        idRow.update(0, i); i += 1
        joined(idRow, row): org.apache.spark.sql.catalyst.InternalRow
      }
    }, preservesPartitioning = true)
    GraftSqlShims.ofRows(spark, LogicalRDD(attrs, numbered)(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]))
  }
}
