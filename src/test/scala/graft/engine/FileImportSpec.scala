package graft.engine

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.NetCDF3

class FileImportSpec extends SparkSpec {

  test("create_frag_select with @file FROM loads NetCDF through DSv2") {
    val f = Files.createTempFile("graft", ".nc").toFile
    f.deleteOnExit()
    NetCDF3.writeDoubleVar(f.getAbsolutePath,
      Seq("t" -> 4, "x" -> 3), "measure", Array.tabulate(12)(_.toDouble))
    val srv = new IoServer(spark)
    val ses = srv.newSession()
    ses.execute(
      s"operation=create_frag_select;frag_name=ncfrag;from=@${f.getAbsolutePath};" +
        "measure=measure;explicit=1;" +
        "field=id_dim|oph_mul_scalar('oph_double','oph_double',measure,10.0);" +
        "field_alias=id_dim|measure")
    val out = ses.execute(
      "operation=select;field=id_dim|measure;from=ncfrag;order=id_dim").get.collect()
    assert(out.length == 4)
    assert(out.head.getSeq[Double](1) == Seq(0.0, 10.0, 20.0))
    assert(out.last.getSeq[Double](1) == Seq(90.0, 100.0, 110.0))
  }

  test("file_import / esdm_import bulk-load a path into a fragment; " +
      "create_frag_select_file name accepted") {
    val f = Files.createTempFile("graft", ".nc").toFile
    f.deleteOnExit()
    NetCDF3.writeDoubleVar(f.getAbsolutePath,
      Seq("t" -> 4, "x" -> 4), "m", Array.tabulate(16)(_.toDouble))
    val srv = new IoServer(spark)
    val ses = srv.newSession()
    // direct load, no select (oph_io_server_query.c:341-357)
    ses.execute(s"operation=file_import;frag_name=fi;" +
      s"src_path=${f.getAbsolutePath};measure=m;explicit=1")
    val out = ses.execute(
      "operation=select;field=id_dim|measure;from=fi;order=id_dim").get.collect()
    assert(out.length == 4 && out.head.getSeq[Double](1) == Seq(0.0, 1.0, 2.0, 3.0))
    // esdm_import: same path with the ESDM read-stream reduction folded in
    ses.execute(s"operation=esdm_import;frag_name=ei;" +
      s"src_path=${f.getAbsolutePath};measure=m;explicit=1;" +
      "sub_operation=sum;sub_args=4")
    val red = ses.execute(
      "operation=select;field=id_dim|measure;from=ei;order=id_dim").get.collect()
    assert(red.head.getSeq[Double](1) == Seq(6.0)) // 0+1+2+3
    // the reference's CTAS-from-file operation name resolves too
    ses.execute(
      s"operation=create_frag_select_file;frag_name=cf;from=@${f.getAbsolutePath};" +
        "measure=m;explicit=1;field=id_dim|measure;field_alias=id_dim|measure")
    assert(ses.execute("operation=select;field=id_dim;from=cf").get.count() == 4)
  }

  test("compressed=yes stores deflated cells; reads are transparent") {
    val f = Files.createTempFile("graft", ".nc").toFile
    f.deleteOnExit()
    NetCDF3.writeDoubleVar(f.getAbsolutePath,
      Seq("t" -> 4, "x" -> 4), "m", Array.tabulate(16)(_.toDouble))
    val srv = new IoServer(spark)
    val ses = srv.newSession()
    ses.execute(s"operation=file_import;frag_name=fz;" +
      s"src_path=${f.getAbsolutePath};measure=m;explicit=1;compressed=yes")
    // stored representation is a zlib blob, not an array
    assert(srv.storedFrag("default", "fz").schema("measure").dataType ==
      org.apache.spark.sql.types.BinaryType)
    // reads inflate transparently — same results as an uncompressed import
    val out = ses.execute(
      "operation=select;field=id_dim|measure;from=fz;order=id_dim").get.collect()
    assert(out.length == 4 && out.head.getSeq[Double](1) == Seq(0.0, 1.0, 2.0, 3.0))
    // functions work over compressed fragments too
    ses.execute("operation=create_frag_select;frag_name=fz2;" +
      "field=id_dim|oph_reduce('oph_double','oph_double',measure,'oph_sum',4);" +
      "field_alias=id_dim|measure;from=fz;compressed=yes")
    val red = ses.execute(
      "operation=select;field=id_dim|measure;from=fz2;order=id_dim").get.collect()
    assert(red.head.getSeq[Double](1) == Seq(6.0))
    // the qd05 path: chunked prepared multi_insert with compressed=yes
    ses.execute("operation=create_frag;frag_name=mz;" +
      "column_name=id_dim|measure;column_type=long|double_array")
    ses.execute("operation=multi_insert;frag_name=mz;field=id_dim|measure;" +
      "value=?1|?2;tot_run=2;curr_run=1;compressed=yes",
      Seq[Any](1L, Seq(1.0, 2.0)))
    ses.execute("operation=multi_insert;frag_name=mz;field=id_dim|measure;" +
      "value=?1|?2;tot_run=2;curr_run=2;compressed=yes",
      Seq[Any](2L, Seq(3.0, 4.0)))
    assert(srv.storedFrag("default", "mz").schema("measure").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val ins = ses.execute(
      "operation=select;field=id_dim|measure;from=mz;order=id_dim").get.collect()
    assert(ins.map(_.getSeq[Double](1)).toSeq == Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))
  }

  test("catalog save/load round-trips fragments and databases") {
    val dir = Files.createTempDirectory("graft-catalog").toFile.getAbsolutePath
    val srv = new IoServer(spark)
    val ses = srv.newSession()
    ses.execute("operation=create_database;db_name=mydb")
    ses.execute("operation=random_import;frag_name=cf;nrows=7;array_length=3")
    srv.saveCatalog(dir)
    val srv2 = new IoServer(spark)
    srv2.loadCatalog(dir)
    val ses2 = srv2.newSession()
    ses2.useDb("mydb") // database survived
    ses2.useDb("default")
    val rows = ses2.execute(
      "operation=select;field=id_dim|measure;from=cf;order=id_dim").get.collect()
    assert(rows.length == 7)
    val size = ses2.execute(
      "operation=function;function_name=oph_size;function_args=cf").get
    assert(size.head().getLong(0) == 7L)
  }

  test("dialect oph_aggregate_stats emits per-element mean+sd across rows") {
    val srv = new IoServer(spark)
    val ses = srv.newSession()
    ses.execute("operation=create_frag;frag_name=st;column_name=id_dim|measure;column_type=long|double")
    // two rows of 2-element arrays: means (2,3), population sd (1,1)
    import spark.implicits._
    srv.registerFragment("default", "stf",
      Seq((1L, Seq(1.0, 2.0)), (2L, Seq(3.0, 4.0))).toDF("id_dim", "measure"))
    ses.execute(
      "operation=create_frag_select;frag_name=stout;" +
        "field=oph_id(id_dim,10)|oph_aggregate_stats('oph_double',measure);" +
        "field_alias=id_dim|measure;from=stf;group=oph_id(id_dim,10)")
    val out = ses.execute(
      "operation=select;field=id_dim|measure;from=stout").get.collect()
    val stats = out.head.getSeq[Double](1)
    assert(stats == Seq(2.0, 3.0, 1.0, 1.0))
  }

  test("@info_system / @tot_table_size / @function_table compat keywords") {
    val srv = new IoServer(spark)
    val ses = srv.newSession()
    ses.execute("operation=random_import;frag_name=k;nrows=9;array_length=1")
    val info = ses.execute(
      "operation=select;field=id_dim|version|current_db;from=@info_system").get.head()
    assert(info.getString(2) == "default")
    val size = ses.execute(
      "operation=select;field=id_dim|tot_table_size;from=@tot_table_size").get.head()
    assert(size.getLong(1) == 9L)
    val fns = ses.execute(
      "operation=select;field=id_dim|function_name;from=@function_table").get
    assert(fns.count() > 80)
    val tbls = ses.execute(
      "operation=select;field=id_dim|db_name|frag_name|frag_size;" +
        "from=@info_system_table").get.collect()
    assert(tbls.exists(r => r.getString(2) == "k" && r.getLong(3) == 9L))
    val flds = ses.execute(
      "operation=select;field=id_dim|field_name;from=@function_fields").get
    assert(flds.collect().map(_.getString(1)).toSeq ==
      Seq("name", "ret", "dl", "type"))
  }

  test("compat mode enforces the reference's restrictions") {
    val srv = new IoServer(spark, compatStrict = true)
    val ses = srv.newSession()
    ses.execute("operation=random_import;frag_name=cm;nrows=10;array_length=2")
    // WHERE on a non-id column is rejected (only_id=1)
    intercept[IllegalArgumentException] {
      ses.execute("operation=create_frag_select;frag_name=x1;" +
        "field=id_dim|measure;from=cm;where=oph_count_array(measure)=2")
    }
    // CTAS must be exactly 2 columns
    intercept[IllegalArgumentException] {
      ses.execute("operation=create_frag_select;frag_name=x2;" +
        "field=id_dim|measure|measure;from=cm")
    }
    // DESC is ignored (ascending output), matching the reference warning
    val r = ses.execute("operation=select;field=id_dim;from=cm;" +
      "order=id_dim;order_dir=DESC").get.collect()
    assert(r.map(_.getLong(0)).toSeq == (1L to 10L))
  }

  test("tot_run/curr_run chunked prepared inserts commit on the last run") {
    val srv = new IoServer(spark)
    val ses = srv.newSession()
    ses.execute("operation=create_frag;frag_name=tr;column_name=id_dim|measure;column_type=long|double")
    ses.execute("operation=insert;frag_name=tr;field=id_dim|measure;value=?1|?2;" +
      "tot_run=3;curr_run=1", Seq[Any](1L, 1.5))
    ses.execute("operation=insert;frag_name=tr;field=id_dim|measure;value=?1|?2;" +
      "tot_run=3;curr_run=2", Seq[Any](2L, 2.5))
    // not committed yet
    intercept[IllegalArgumentException] {
      ses.execute("operation=select;field=id_dim;from=tr")
    }
    ses.execute("operation=insert;frag_name=tr;field=id_dim|measure;value=?1|?2;" +
      "tot_run=3;curr_run=3", Seq[Any](3L, 3.5))
    val rows = ses.execute("operation=select;field=id_dim|measure;from=tr;order=id_dim")
      .get.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("prepared-statement binary args: array and blob binds") {
    val srv = new IoServer(spark)
    val ses = srv.newSession()
    ses.execute("operation=create_frag;frag_name=bb;column_name=id_dim|measure;column_type=long|blob")
    ses.execute("operation=insert;frag_name=bb;field=id_dim|measure;value=?1|?2",
      Seq[Any](1L, Seq(1.5, 2.5, 3.5)))
    val row = ses.execute("operation=select;field=id_dim|measure;from=bb").get.head()
    assert(row.getSeq[Double](1) == Seq(1.5, 2.5, 3.5))
  }

  test("oph_export writes NetCDF that our reader round-trips") {
    val srv = new IoServer(spark)
    val ses = srv.newSession()
    ses.execute("operation=random_import;frag_name=ex;nrows=6;array_length=4")
    val out = Files.createTempFile("graft-export", ".nc").toFile
    out.deleteOnExit()
    ses.execute("operation=function;function_name=oph_export;" +
      s"function_args=ex|${out.getAbsolutePath}")
    val hdr = NetCDF3.readHeader(out.getAbsolutePath)
    assert(hdr.dims.map(_.length) == Seq(6, 4))
    val v = hdr.variable("measure")
    val data = NetCDF3.readSlab(out.getAbsolutePath, hdr, v, Seq(0, 0), Seq(6, 4))
    val orig = ses.execute("operation=select;field=id_dim|measure;from=ex;order=id_dim")
      .get.collect().flatMap(_.getSeq[Double](1))
    assert(data.toSeq == orig.toSeq)
  }

  test("oph_export format arg: cdf5/netcdf4/zarr/zarr3 all reimport byte-identically") {
    val srv = new IoServer(spark)
    val ses = srv.newSession()
    ses.execute("operation=random_import;frag_name=exf;nrows=6;array_length=4")
    val orig = ses.execute(
      "operation=select;field=id_dim|measure;from=exf;order=id_dim")
      .get.collect().flatMap(_.getSeq[Double](1)).toSeq
    Seq("cdf5" -> ".nc", "netcdf4" -> ".h5",
        "zarr" -> ".zarr", "zarr3" -> ".zarr").foreach { case (fmt, ext) =>
      val dir = Files.createTempDirectory("graft-export-fmt")
      val path = dir.resolve(s"out$ext").toString
      ses.execute("operation=function;function_name=oph_export;" +
        s"function_args=exf|$path|$fmt")
      // every exported container reads back through the sniffing reader
      val r = graft.sources.NcReader.open(path)
      try {
        assert(r.shape("measure") == Seq(6, 4), s"format $fmt")
        assert(r.readSlab("measure", Seq(0, 0), Seq(6, 4)).toSeq == orig,
          s"format $fmt")
      } finally r.close()
    }
  }

  test("read-stream reduction (sub_operation) folds into the @file load") {
    val f = Files.createTempFile("graft-sub", ".nc").toFile
    f.deleteOnExit()
    NetCDF3.writeDoubleVar(f.getAbsolutePath,
      Seq("t" -> 3, "x" -> 4), "measure", Array.tabulate(12)(_.toDouble))
    val srv = new IoServer(spark)
    val ses = srv.newSession()
    ses.execute(
      s"operation=create_frag_select;frag_name=sub;from=@${f.getAbsolutePath};" +
        "explicit=1;sub_operation=avg;" +
        "field=id_dim|measure;field_alias=id_dim|measure")
    val rows = ses.execute(
      "operation=select;field=id_dim|measure;from=sub;order=id_dim").get.collect()
    assert(rows.length == 3)
    assert(rows.map(_.getSeq[Double](1).head).toSeq == Seq(1.5, 5.5, 9.5))
  }

  test("dialect aggregate avg across rows divides by group size") {
    val srv = new IoServer(spark)
    val ses = srv.newSession()
    ses.execute("operation=random_import;frag_name=av;nrows=20;array_length=3")
    ses.execute(
      "operation=create_frag_select;frag_name=avout;" +
        "field=oph_id(id_dim,10)|oph_aggregate_operator('oph_double',measure,'oph_avg');" +
        "field_alias=id_dim|measure;from=av;group=oph_id(id_dim,10)")
    val out = ses.execute(
      "operation=select;field=id_dim|measure;from=avout;order=id_dim").get.collect()
    assert(out.length == 2)
    // cross-check against the sum variant / 10
    ses.execute(
      "operation=create_frag_select;frag_name=sout2;" +
        "field=oph_id(id_dim,10)|oph_aggregate_operator('oph_double',measure,'oph_sum');" +
        "field_alias=id_dim|measure;from=av;group=oph_id(id_dim,10)")
    val sums = ses.execute(
      "operation=select;field=id_dim|measure;from=sout2;order=id_dim").get.collect()
    out.zip(sums).foreach { case (a, s2) =>
      a.getSeq[Double](1).zip(s2.getSeq[Double](1)).foreach { case (av, sm) =>
        assert(math.abs(av - sm / 10.0) < 1e-12)
      }
    }
  }
}
