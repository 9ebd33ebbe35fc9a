package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Global dense row numbering — the reference's `sequential_id` /
  * `oph_subset` re-keying (oph_io_server_query_procedures.c:188-196):
  * output rows are renumbered start..start+n-1 in sort order.
  *
  * Scale posture: a bare `row_number() OVER (ORDER BY ...)` collapses to a
  * single partition at 100 TB. Instead: range-partition + local sort (one
  * shuffle — the same shuffle any global sort needs), then
  * `RDD.zipWithIndex`, which runs one small count job over partition sizes
  * and broadcasts the prefix offsets; numbering itself is then purely
  * partition-local. No single-executor bottleneck at any scale.
  */
object SequentialId {
  def withSequentialId(df: DataFrame, idName: String, order: Seq[Column],
                       start: Long = 1L): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = sorted.schema
    val withId = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq((i + start) +: row.toSeq)
    }
    spark.createDataFrame(withId,
      StructType(StructField(idName, LongType, nullable = false) +: schema.fields))
  }
}
