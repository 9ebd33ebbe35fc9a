package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.engine.IoServer
import graft.functions.{ArrayPrimitives => AP}
import graft.sources.NetCDF3

/** End-to-end NetCDF pipeline with a DuckDB oracle: export the
  * embeddings to a NetCDF-classic file with our writer, load it back
  * through the DSv2 reader via the dialect's `@file` FROM (the
  * reference's create_frag_select_file, oph_io_server_query_engine.c:
  * 244-249) with an ESDM-style read-stream reduction
  * (sub_operation/sub_args, oph_io_server_esdm.c:1890-1899), CTAS the
  * result and read the fragment — proving writer → reader → dialect →
  * Catalyst agree with a SQL replay over the original parquet.
  */
object NetCDFQueries {

  /** qn01 — NetCDF round-trip: export → @file load with sub_operation
    * avg-8 reduce → key-algebra subset → fragment readback. */
  def qn01_netcdf_roundtrip(s: SparkSession, dir: String): DataFrame = {
    // export is a driver-side single-file write by design (the
    // reference's oph_export path; Cube.exportNetCDF documents the same)
    val rows = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .orderBy("vec_id").collect()
    val n = rows.length
    val data = new Array[Double](n * 64)
    rows.foreach { r =>
      val id = r.getLong(0).toInt
      val a = r.getSeq[Double](1)
      var i = 0
      while (i < 64) { data(id * 64 + i) = a(i); i += 1 }
    }
    val path = Files.createTempDirectory("graft_nc").resolve("emb.nc").toString
    NetCDF3.writeDoubleVar(path, Seq("row" -> n, "x" -> 64), "measure", data)

    val ses = new IoServer(s).newSession()
    ses.execute(
      s"operation=create_frag_select;frag_name=ncout;" +
        "field=id_dim|measure;field_alias=id_dim|measure;" +
        s"from=@$path;measure=measure;explicit=1;" +
        "sub_operation=avg;sub_args=8;" +
        "where=oph_is_in_subset(id_dim,1,2,99999)")
    ses.execute("operation=select;field=id_dim|measure;from=ncout;order=id_dim").get
      .withColumn("measure", AP.fx12(col("measure")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qn01_netcdf_roundtrip" -> (qn01_netcdf_roundtrip _),
  )

  val oracles: Map[String, String] = Map(
    "qn01_netcdf_roundtrip" ->
      """SELECT vec_id + 1 AS id_dim,
         coalesce(array_to_string(list_transform(
           list_transform(range(0, 8), b ->
             list_reduce(list_transform(embedding[b*8+1 : b*8+8], x -> x::DOUBLE),
               (x,y) -> x+y) / 8.0),
           v -> CAST(floor(v * 1e12) AS BIGINT)), ','), '') AS measure
         FROM embeddings
         WHERE vec_id % 2 = 0
         ORDER BY id_dim""",
  )
}
