package graft.dialect

/** The reference's submission syntax: `key=value;` pairs with `|`
  * multi-value separators — NOT free SQL (reference grammar:
  * src/query_engine/oph_query_engine_language.h:27-37, parser
  * src/query_engine/oph_query_parser.c:39-139).
  *
  * Values may contain quoted strings ('...') in which `;` `|` `=` are
  * literal. Legacy keywords `where_left/where_cond/where_right` are
  * rejected like the reference does (oph_query_parser.c:266-287).
  */
object QueryParser {

  final case class ParsedQuery(args: Map[String, String]) {
    def apply(k: String): String = args.getOrElse(k,
      throw new IllegalArgumentException(s"missing required argument '$k'"))
    def get(k: String): Option[String] = args.get(k)
    def multi(k: String): Seq[String] = get(k).map(splitMulti).getOrElse(Nil)
    def operation: String = apply("operation").toLowerCase
  }

  private val Rejected = Set("where_left", "where_cond", "where_right")

  def parse(q: String): ParsedQuery = {
    val pairs = splitTop(q, ';').filter(_.trim.nonEmpty).map { kv =>
      val i = indexOfTop(kv, '=')
      if (i < 0) throw new IllegalArgumentException(s"malformed pair: '$kv'")
      val k = kv.substring(0, i).trim.toLowerCase
      val v = kv.substring(i + 1).trim
      if (Rejected(k))
        throw new IllegalArgumentException(s"legacy keyword '$k' not supported")
      k -> v
    }
    ParsedQuery(pairs.toMap)
  }

  /** Split the `|` multi-value separator, quote-aware
    * (OPH_QUERY_ENGINE_LANG_MULTI_VALUE_SEPARATOR). */
  def splitMulti(v: String): Seq[String] = splitTop(v, '|').map(_.trim)

  /** Quote/paren-aware split on an arbitrary separator. */
  def splitMultiOn(v: String, sep: Char): Seq[String] =
    splitTop(v, sep).map(_.trim)

  /** Split on `sep` outside single-quoted regions and parentheses. */
  private[dialect] def splitTop(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var depth = 0
    s.foreach {
      case '\'' => inQ = !inQ; cur += '\''
      case '(' if !inQ => depth += 1; cur += '('
      case ')' if !inQ => depth -= 1; cur += ')'
      case c if c == sep && !inQ && depth == 0 =>
        out += cur.result(); cur.clear()
      case c => cur += c
    }
    out += cur.result()
    out.result()
  }

  private def indexOfTop(s: String, c: Char): Int = {
    var inQ = false
    s.indices.foreach { i =>
      if (s(i) == '\'') inQ = !inQ
      else if (s(i) == c && !inQ) return i
    }
    -1
  }
}
