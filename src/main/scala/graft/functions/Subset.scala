package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Ophidia subset-string parser: `start:stride:end` clauses, `;`-separated,
  * 1-based inclusive; `end` keyword = dimension size.
  *
  * Grammar (reference: ophidia subset_filter used by oph_get_subarray2 and
  * the import `dim_start/dim_end` args — see SURVEY.md §2.6):
  *   subset  := clause (';' clause)*
  *   clause  := INT | INT ':' bound | INT ':' INT ':' bound
  *   bound   := INT | 'end'
  * Selected index set = ascending union of all clauses.
  */
object Subset {
  /** One clause; `end=None` means "to the end of the dimension". */
  final case class Clause(start: Long, stride: Long, end: Option[Long])

  def parse(s: String): Seq[Clause] =
    s.split(";").toSeq.filter(_.nonEmpty).map { c =>
      c.split(":").map(_.trim) match {
        case Array(v)       => val x = v.toLong; Clause(x, 1, Some(x))
        case Array(a, b)    => Clause(a.toLong, 1, bound(b))
        case Array(a, s, b) => Clause(a.toLong, s.toLong, bound(b))
        case _ => throw new IllegalArgumentException(s"bad subset clause: $c")
      }
    }

  private def bound(b: String): Option[Long] =
    if (b.equalsIgnoreCase("end")) None else Some(b.toLong)

  /** Resolve clauses against a known dimension size → ascending 1-based
    * indices (union, deduplicated). */
  def resolve(clauses: Seq[Clause], size: Int): Seq[Int] =
    clauses.flatMap { c =>
      val hi = math.min(c.end.getOrElse(size.toLong), size.toLong)
      (c.start to hi by c.stride).map(_.toInt)
    }.distinct.sorted

  /** Membership predicate for a 1-based index column. */
  def membership(i: Column, clauses: Seq[Clause], size: Column): Column =
    clauses.map { c =>
      val hi = c.end.map(lit(_)).getOrElse(size.cast("long"))
      i >= c.start && i <= hi && pmod(i - c.start, lit(c.stride)) === 0
    }.reduce(_ || _)

  /** Runtime-size index array: ascending kept indices as a Column. */
  def indexColumn(clauses: Seq[Clause], size: Column): Column =
    filter(sequence(lit(1), size.cast(IntegerType)), i => membership(i, clauses, size))
}
