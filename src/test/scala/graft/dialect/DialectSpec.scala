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
}
