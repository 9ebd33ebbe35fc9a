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
