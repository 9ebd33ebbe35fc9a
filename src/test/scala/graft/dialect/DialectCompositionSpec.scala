package graft.dialect

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.{ArrayPrimitives => AP, Numeric, Stats}

/** Property sweep over dialect COMPOSITIONS: every (inner, outer) pair
  * from a curated table is evaluated twice — once compiled from the
  * dialect string `outer(inner(m))` (type hints, literal conversion,
  * positional args: the plumbing where arg-order bugs hide), once
  * through the Scala API directly — and the results must agree
  * bit-exactly. The 88-name registry test proves RESOLUTION; this
  * proves the argument PLUMBING under nesting, 336 pairs at a time. */
class DialectCompositionSpec extends SparkSpec {

  private case class Op(name: String,
      dialect: String => String, api: Column => Column)

  // array → array: usable in either position
  private val transforms: Seq[Op] = Seq(
    Op("sum_scalar", x => s"oph_sum_scalar('oph_double','oph_double',$x,2.5)",
      AP.oph_sum_scalar(_, 2.5)),
    Op("mul_scalar", x => s"oph_mul_scalar('oph_double','oph_double',$x,1.5)",
      AP.oph_mul_scalar(_, 1.5)),
    Op("sum_scalar2", x => s"oph_sum_scalar2('oph_double','oph_double',0.75,$x)",
      AP.oph_sum_scalar(_, lit(0.75))),
    Op("abs", x => s"oph_abs_array('oph_double','oph_double',$x)",
      c => AP.oph_abs_array(c)),
    Op("math_square", x => s"oph_math('oph_double','oph_double',$x,'square')",
      AP.oph_math(_, "square")),
    Op("reverse", x => s"oph_reverse('oph_double','oph_double',$x)",
      AP.oph_reverse _),
    Op("rotate", x => s"oph_rotate('oph_double','oph_double',$x,3)",
      AP.oph_rotate(_, lit(3))),
    Op("subarray", x => s"oph_get_subarray('oph_double','oph_double',$x,2,5)",
      c => AP.oph_get_subarray(c, lit(2), lit(5))),
    Op("shift", x => s"oph_shift('oph_double','oph_double',$x,2,0.5)",
      AP.oph_shift(_, 2, 0.5)),
    Op("padding", x => s"oph_padding('oph_double','oph_double',$x,12,0.25)",
      AP.oph_padding(_, 12, 0.25)),
    Op("replace", x => s"oph_replace('oph_double','oph_double',$x,3.0,9.0,0.5)",
      c => AP.oph_replace(c, lit(3.0), lit(9.0), lit(0.5))),
    Op("extend", x => s"oph_extend('oph_double','oph_double',$x,2)",
      AP.oph_extend(_, 2)),
    Op("filter", x => s"oph_filter('oph_double',$x,'x')",
      c => AP.oph_filter(c, x => x =!= 0.0)),
    Op("moving_avg", x => s"oph_moving_avg('oph_double','oph_double',$x,3)",
      Stats.oph_moving_avg(_, 3)),
    Op("accumulate", x => s"oph_accumulate('oph_double','oph_double',$x)",
      Numeric.oph_accumulate _),
    Op("gsl_sort", x => s"oph_gsl_sort('oph_double','oph_double',$x)",
      Stats.oph_gsl_sort _))

  // array → scalar/blocks: outermost position only
  private val reducers: Seq[Op] = Seq(
    Op("reduce_avg", x => s"oph_reduce('oph_double','oph_double',$x,'oph_avg',4)",
      c => AP.oph_reduce(c, "avg", lit(4))),
    Op("reduce_max", x => s"oph_reduce('oph_double','oph_double',$x,'oph_max',3)",
      c => AP.oph_reduce(c, "max", lit(3))),
    Op("reduce2_sum", x => s"oph_reduce2('oph_double','oph_double',$x,'oph_sum',2)",
      c => AP.oph_reduce2(c, "sum", lit(2))),
    Op("count", x => s"oph_count_array('oph_double',$x)",
      c => AP.oph_count_array(c)),
    Op("size", x => s"oph_size_array('oph_double',$x)",
      c => AP.oph_size_array(c)))

  /** NaN-stable deep normalization: doubles compare by bit pattern so
    * NaN == NaN, arrays recurse. */
  private def norm(v: Any): Any = v match {
    case d: java.lang.Double => java.lang.Double.doubleToLongBits(d)
    case s: scala.collection.Seq[_] => s.map(norm)
    case other => other
  }

  test("all 336 inner-outer compositions agree dialect vs Scala API") {
    import spark.implicits._
    val df = Seq(
      Tuple1(Seq(1.0, -2.0, 3.0, 0.0, 5.5, -6.25, 7.0, 8.0)),
      Tuple1(Seq(2.0, 3.0, -1.0, 4.0))).toDF("m")
    val pairs = for (i <- transforms; o <- transforms ++ reducers) yield (i, o)
    assert(pairs.size >= 100)
    // evaluate in column batches: one select per 24 pairs, not per pair
    pairs.grouped(24).foreach { batch =>
      val cols = batch.zipWithIndex.flatMap { case ((i, o), k) =>
        val d = ExprCompiler.compile(
          ExprParser.parse(o.dialect(i.dialect("m"))), df.apply).num
        Seq(d.as(s"d$k"), o.api(i.api(df("m"))).as(s"a$k"))
      }
      val rows = df.select(cols: _*).collect()
      rows.foreach { r =>
        batch.zipWithIndex.foreach { case ((i, o), k) =>
          assert(norm(r.get(2 * k)) == norm(r.get(2 * k + 1)),
            s"${o.name}(${i.name}(m)) diverged: dialect=${r.get(2 * k)} " +
              s"api=${r.get(2 * k + 1)}")
        }
      }
    }
  }
}
