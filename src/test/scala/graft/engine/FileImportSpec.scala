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
