package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.operators.RelationalQueries.q03_agg_group(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.operators.RelationalQueries.queries ++
    graft.operators.ArrayQueries.queries ++
    graft.operators.TextQueries.queries ++
    graft.operators.DedupQueries.queries ++
    graft.operators.SimilarityQueries.queries ++
    graft.operators.MultimodalQueries.queries ++
    graft.operators.DialectQueries.queries ++
    graft.operators.ClusterQueries.queries ++
    graft.operators.NetCDFQueries.queries ++
    graft.operators.PipelineQueries.queries ++
    graft.operators.StreamQueries.queries ++
    graft.operators.CubeQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.operators.RelationalQueries.oracles ++
    graft.operators.ArrayQueries.oracles ++
    graft.operators.TextQueries.oracles ++
    graft.operators.DedupQueries.oracles ++
    graft.operators.SimilarityQueries.oracles ++
    graft.operators.MultimodalQueries.oracles ++
    graft.operators.DialectQueries.oracles ++
    graft.operators.ClusterQueries.oracles ++
    graft.operators.NetCDFQueries.oracles ++
    graft.operators.PipelineQueries.oracles ++
    graft.operators.StreamQueries.oracles ++
    graft.operators.CubeQueries.oracles
}
