package graft.dialect

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz arms for the dialect front-end — the engine's user-facing
  * parse surface. Contract under hostile input: return an AST or throw
  * IllegalArgumentException with a message; never hang, never NPE,
  * never escape with an internal exception class. Mirrors the media
  * codecs' fuzz discipline (MediaCodecFuzzSpec). */
class DialectFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(31)

  private def parseOutcome(s: String): Option[String] =
    try { ExprParser.parse(s); None }
    catch {
      case e: IllegalArgumentException => Some(Option(e.getMessage).getOrElse(""))
    }

  test("random character soup never hangs or escapes the parser") {
    val alphabet = "abxyz019.,'()|&!<>=%+-*/ ?_"
    for (_ <- 1 to 2000) {
      val s = Array.fill(rnd.nextInt(40))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      parseOutcome(s) // Some(msg) or None — anything else fails the test
    }
  }

  test("mutations of valid expressions fail descriptive or parse clean") {
    val valid = Seq(
      "oph_is_in_subset(oph_id_to_index2(id_dim,10,10),1,1,1)",
      "oph_reduce('oph_double','oph_double',measure,'oph_avg',8)",
      "a + b * 2 - c / 4 % 3",
      "x > 1 & !(y <= 2) | z != 3",
      "oph_predicate('oph_double',m,'x-2','>=','x','0')")
    for (base <- valid; _ <- 1 to 200) {
      val sb = new StringBuilder(base)
      rnd.nextInt(3) match {
        case 0 => sb.insert(rnd.nextInt(sb.length + 1),
          "()'|&=!%,.".charAt(rnd.nextInt(10)))
        case 1 if sb.nonEmpty => sb.deleteCharAt(rnd.nextInt(sb.length))
        case _ if sb.nonEmpty =>
          sb.setCharAt(rnd.nextInt(sb.length), '\'')
        case _ =>
      }
      parseOutcome(sb.result())
    }
  }

  test("deep nesting is bounded: parse or fail, never a stack overflow") {
    for (depth <- Seq(10, 100, 1000, 5000)) {
      val s = "(" * depth + "1" + ")" * depth
      try { ExprParser.parse(s); () }
      catch { case _: IllegalArgumentException => }
    }
  }

  test("compile of every parseable fuzz AST fails typed, never NPEs") {
    // feed parseable strings through the compiler with a plain resolver:
    // anything unknown must surface as IllegalArgumentException (unknown
    // function / bad arity), not an NPE or MatchError
    val alphabet = "ab12+-*/(),'x "
    var compiled = 0
    for (_ <- 1 to 1000) {
      val s = Array.fill(rnd.nextInt(24) + 1)(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val ast = try Some(ExprParser.parse(s)) catch {
        case _: IllegalArgumentException => None
      }
      ast.foreach { a =>
        // contract: IllegalArgumentException ONLY — an arity slip must
        // surface as the compiler's descriptive wrong-number-of-args
        // error, never a raw IndexOutOfBounds
        try { ExprCompiler.compile(a, col(_)); compiled += 1 }
        catch { case _: IllegalArgumentException => }
      }
    }
    assert(compiled > 0, "the fuzz alphabet should produce some valid exprs")
  }

  test("wrong-arity primitive calls fail with the descriptive arity message") {
    for (bad <- Seq("oph_predicate2('oph_double',m)", "oph_reduce()",
      "oph_id(x)", "oph_gsl_histogram(m,4)")) {
      val e = intercept[IllegalArgumentException] {
        ExprCompiler.compile(ExprParser.parse(bad), col(_))
      }
      assert(e.getMessage.contains("wrong number of arguments"),
        s"$bad: ${e.getMessage}")
    }
  }

  test("query parser: random key=value soup never hangs or escapes") {
    val alphabet = "abct=;|'()0 _"
    for (_ <- 1 to 2000) {
      val s = Array.fill(rnd.nextInt(50))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      try { QueryParser.parse(s); () }
      catch { case _: IllegalArgumentException => }
    }
    // unbalanced quotes/parens in values must not break the splitter
    QueryParser.parse("operation=select;field=oph_dump('ab")
    QueryParser.parse("operation=select;where=((((")
  }
}
