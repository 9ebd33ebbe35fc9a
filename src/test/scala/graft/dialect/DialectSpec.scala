package graft.dialect

import graft.SparkSpec
import graft.dialect.ExprParser._

class DialectSpec extends SparkSpec {

  test("key=value parser handles multi-values and quoted separators") {
    val q = QueryParser.parse(
      "operation=create_frag_select;frag_name=out;field=id_dim|oph_reduce('oph_double',measure,'avg',10);where=id_dim=1")
    assert(q.operation == "create_frag_select")
    assert(q.multi("field").size == 2)
    assert(q.multi("field")(1).startsWith("oph_reduce"))
  }

  test("legacy where_* keywords are rejected like the reference") {
    intercept[IllegalArgumentException] {
      QueryParser.parse("operation=select;where_left=id_dim")
    }
  }

  test("expression parser: precedence and literals") {
    // 1+2*3 parses as 1+(2*3)
    assert(ExprParser.parse("1+2*3") ==
      Bin('+', NumL(1), Bin('*', NumL(2), NumL(3))))
    assert(ExprParser.parse("2.5") == NumD(2.5))
    assert(ExprParser.parse("'abc'") == Str("abc"))
    assert(ExprParser.parse("NULL") == NullL)
    assert(ExprParser.parse("?2") == Arg(2))
  }

  test("expression parser: the reference's canonical WHERE expression") {
    // from oph_query_expression_client.c:44-60
    val ast = ExprParser.parse(
      "mysql.oph_is_in_subset(mysql.oph_id_to_index2(id_dim,10,10),1,1,1) & mysql.oph_is_in_subset(mysql.oph_id_to_index2(id_dim,1,10),1,1,1)")
    ast match {
      case Bin('&', Fn("oph_is_in_subset", a1), Fn("oph_is_in_subset", _)) =>
        assert(a1.head == Fn("oph_id_to_index2", Seq(Var("id_dim"), NumL(10), NumL(10))))
      case o => fail(s"unexpected ast: $o")
    }
  }

  test("compiler: division divides (reference eDIVIDE bug NOT replicated)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(10L).toDF("x")
    val c = ExprCompiler.compile(ExprParser.parse("x/4"), n => col(n)).num
    assert(df.select(c).head.getDouble(0) == 2.5)
  }

  test("compiler: oph_long output hint routes oph_to_bin through the exact 64-bit packer") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 2^53+1 is unrepresentable as a double: only the exact route keeps it
    val df = Seq(Tuple1(Seq(9007199254740993L))).toDF("m")
    val packed = ExprCompiler.compile(
      ExprParser.parse("mysql.oph_to_bin('oph_long','oph_long',m)"), col(_)).num
    val bytes = df.select(packed).head.getAs[Array[Byte]](0)
    assert(bytes.map("%02x".format(_)).mkString == "0100000000002000")
    // no hint (or a double hint) keeps the double lingua-franca layout
    val dbl = ExprCompiler.compile(
      ExprParser.parse("mysql.oph_to_bin('oph_double','oph_double',m)"), col(_)).num
    val df2 = Seq(Tuple1(Seq(1.0))).toDF("m")
    assert(df2.select(dbl).head.getAs[Array[Byte]](0)
      .map("%02x".format(_)).mkString == "000000000000f03f")
  }

  test("compiler: = yields boolean, & is logical, % is integer mod") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((7L, 3L)).toDF("x", "y")
    val c = ExprCompiler.compile(ExprParser.parse("x%y=1 & !(x=y)"), n => col(n))
    assert(df.filter(c.bool).count() == 1)
  }

  test("native-mode comparisons: < > <= >= != <>") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((5L, 3L)).toDF("x", "y")
    def holds(e: String): Boolean =
      df.filter(ExprCompiler.compile(ExprParser.parse(e), col(_)).bool).count() == 1
    assert(holds("x > y") && holds("x >= 5") && !holds("x < y"))
    assert(holds("y <= 3") && holds("x != y") && holds("x <> 4"))
    assert(holds("x > y & !(y > x)")) // unary ! still works
    assert(holds("x - 2 = y")) // arithmetic binds tighter than comparison
  }

  test("subset-string parser matches the reference grammar") {
    import graft.functions.Subset
    assert(Subset.resolve(Subset.parse("1:3:10"), 10) == Seq(1, 4, 7, 10))
    assert(Subset.resolve(Subset.parse("2:end"), 5) == Seq(2, 3, 4, 5))
    assert(Subset.resolve(Subset.parse("1;4;2:3"), 10) == Seq(1, 2, 3, 4))
  }

  /** The 88 registered plugin names, extracted from the reference's
    * etc/oph_primitives_list.in section headers (lines 1-352). Embedded
    * so the spec is hermetic; the cross-check below re-extracts when the
    * reference tree is present so the list can never drift. */
  private val referencePrimitives: Seq[String] = Seq(
    "oph_abs_array", "oph_accumulate", "oph_aggregate_operator",
    "oph_aggregate_stats", "oph_aggregate_stats_final",
    "oph_aggregate_stats_partial", "oph_append", "oph_arg_array", "oph_cast",
    "oph_ccluster_kcluster", "oph_compare", "oph_compress", "oph_concat",
    "oph_concat2", "oph_convert_d", "oph_convert_l", "oph_count_array",
    "oph_deaccumulate", "oph_div_array", "oph_dump", "oph_expand",
    "oph_extend", "oph_extract", "oph_find", "oph_get_index_array",
    "oph_get_subarray", "oph_get_subarray2", "oph_get_subarray3",
    "oph_gsl_boxplot", "oph_gsl_complex_get_abs", "oph_gsl_complex_get_arg",
    "oph_gsl_complex_get_imag", "oph_gsl_complex_get_real",
    "oph_gsl_complex_to_polar", "oph_gsl_complex_to_rect",
    "oph_gsl_correlation", "oph_gsl_dwt", "oph_gsl_fft", "oph_filter",
    "oph_gsl_fit_linear", "oph_gsl_fit_linear_coeff", "oph_gsl_histogram",
    "oph_gsl_idwt", "oph_gsl_ifft", "oph_gsl_quantile", "oph_gsl_sd",
    "oph_gsl_sort", "oph_gsl_spline", "oph_gsl_stats", "oph_id3",
    "oph_id_of_subset", "oph_id_to_index", "oph_interlace", "oph_interlace2",
    "oph_mask_array", "oph_math", "oph_max_array", "oph_min_array",
    "oph_moving_avg", "oph_mul_array", "oph_mul_scalar", "oph_mul_scalar2",
    "oph_normalize", "oph_operation_array", "oph_operator",
    "oph_operator_array", "oph_padding", "oph_permute", "oph_predicate",
    "oph_predicate2", "oph_quantize", "oph_reduce", "oph_reduce2",
    "oph_reduce3", "oph_replace", "oph_reverse", "oph_roll_up", "oph_rotate",
    "oph_sequence", "oph_shift", "oph_size_array", "oph_sub_array",
    "oph_sum_array", "oph_sum_scalar", "oph_sum_scalar2", "oph_to_bin",
    "oph_uncompress", "oph_value_to_bin")

  test("embedded primitive list matches the reference's own registry") {
    // re-extract the list from the reference checkout so the embedded
    // copy can never silently drift; on a checkout without the reference
    // tree this CANCELS visibly (scalatest 'canceled', not a silent pass)
    val refRoot = sys.env.getOrElse("GRAFT_REFERENCE_ROOT", "/root/reference")
    val listFile = new java.io.File(refRoot, "etc/oph_primitives_list.in")
    assume(listFile.isFile,
      s"reference registry not found at $listFile — set GRAFT_REFERENCE_ROOT " +
        "to the reference checkout to run the drift cross-check")
    val extracted = scala.io.Source.fromFile(listFile).getLines()
      .collect { case l if l.startsWith("[") => l.stripPrefix("[").stripSuffix("]") }
      .toSeq
    assert(extracted.sorted == referencePrimitives.sorted)
  }

  test("all 88 reference primitive names resolve in the dialect") {
    import org.apache.spark.sql.functions.col
    assert(referencePrimitives.size == 88)
    for (name <- referencePrimitives) {
      assert(ExprCompiler.registeredFunctions.contains(name),
        s"$name missing from registeredFunctions")
      // compile must reach the name's match arm: any failure from a dummy
      // zero-arg call is an arity/argument error, never the
      // unknown-dialect-function fallthrough
      val msg = try {
        ExprCompiler.compile(Fn(name, Nil), col(_)); ""
      } catch { case e: Throwable => Option(e.getMessage).getOrElse("") }
      assert(!msg.contains("unknown dialect function"),
        s"$name fell through to the unknown-function arm: $msg")
    }
  }

  test("compiler: oph_filter keeps elements where the condition holds") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(Tuple1(Seq(-2.0, 0.5, 3.0, -0.1, 7.0))).toDF("m")
    val c = ExprCompiler.compile(
      ExprParser.parse("oph_filter('oph_double',m,'x>0')"), col(_)).num
    assert(df.select(c).head.getSeq[Double](0) == Seq(0.5, 3.0, 7.0))
  }

  test("compiler: oph_predicate2 sees both arrays as x and y") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((Seq(1.0, 5.0, 2.0), Seq(4.0, 3.0, 2.0))).toDF("a", "b")
    // elementwise max via "if x-y >= 0 then x else y"
    val c = ExprCompiler.compile(ExprParser.parse(
      "oph_predicate2('oph_double','oph_double',a,b,'x-y','>=','x','y')"),
      col(_)).num
    assert(df.select(c).head.getSeq[Double](0) == Seq(4.0, 5.0, 2.0))
  }

  test("compiler: nested oph_expand fails with the generator message") {
    import org.apache.spark.sql.functions.col
    val e = intercept[IllegalArgumentException] {
      ExprCompiler.compile(
        ExprParser.parse("oph_sum_scalar(oph_expand('oph_double',m),1)"),
        col(_))
    }
    assert(e.getMessage.contains("generator-valued"))
  }

  test("engine: oph_expand select route promotes elements to rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val srv = new graft.engine.IoServer(spark)
    srv.registerFragment("default", "t",
      Seq((1L, Seq(10.0, 20.0)), (2L, Seq(30.0)), (3L, Seq(40.0, 50.0)))
        .toDF("id_dim", "measure"))
    val ses = srv.newSession()
    val out = ses.execute(
      "operation=select;field=id_dim|oph_expand('oph_double','oph_double',measure);" +
        "field_alias=id_dim|val;from=t;order=id_dim").get
    assert(out.columns.toSeq == Seq("id_dim", "val"))
    assert(out.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0), (5L, 50.0)))
    // generator fields are invalid under GROUP BY — loud, not silent
    val e = intercept[IllegalArgumentException] {
      ses.execute("operation=select;" +
        "field=oph_expand('oph_double','oph_double',measure);" +
        "from=t;group=id_dim")
    }
    assert(e.getMessage.contains("oph_expand"))
    // an expand field aliased 'id_dim' would collide with the re-keyed
    // row id — descriptive rejection, not an ambiguous-reference error
    val e2 = intercept[IllegalArgumentException] {
      ses.execute("operation=select;" +
        "field=oph_expand('oph_double','oph_double',measure);" +
        "field_alias=id_dim;from=t")
    }
    assert(e2.getMessage.contains("id_dim"))
    // duplicate output aliases share the failure mode — same treatment
    val e3 = intercept[IllegalArgumentException] {
      ses.execute("operation=select;" +
        "field=measure|oph_expand('oph_double','oph_double',measure);" +
        "field_alias=v|v;from=t")
    }
    assert(e3.getMessage.contains("duplicate field alias"))
  }
}
