package graft.sources

/** From-spec robots.txt (RFC 9309, the Robots Exclusion Protocol) —
  * the crawl-compliance gate that sits in front of every fetch at
  * corpus scale. Implements the full matching model:
  *
  *  - line grammar: `field: value` with `#` comments, case-insensitive
  *    field names, blank-line-tolerant;
  *  - GROUPS: consecutive `User-agent` lines share the following rules;
  *  - group selection: the matching non-`*` user-agent group (product
  *    token compared case-insensitively), else the `*` group, else no
  *    group (everything allowed);
  *  - rule matching: `Allow`/`Disallow` path patterns with the RFC's
  *    `*` (any chars) and `$` (end anchor) metacharacters;
  *  - precedence: the matching rule with the LONGEST pattern (octets)
  *    wins; on a tie Allow wins; no matching rule → allowed; an empty
  *    Disallow value matches nothing (allows all).
  */
object Robots {
  final case class Rule(allow: Boolean, pattern: String)
  final case class Group(agents: Seq[String], rules: Seq[Rule])

  def parse(text: String): Seq[Group] = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var inRules = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules)
      agents = Vector.empty; rules = Vector.empty; inRules = false
    }
    text.split("\n", -1).foreach { raw =>
      val noComment = { val h = raw.indexOf('#'); if (h < 0) raw else raw.substring(0, h) }
      val line = noComment.trim
      val c = line.indexOf(':')
      if (c > 0) {
        val field = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        field match {
          case "user-agent" =>
            if (inRules) flush() // a UA line after rules starts a new group
            agents :+= value.toLowerCase
          case "allow" | "disallow" =>
            if (agents.nonEmpty) { // rules before any UA line are ignored
              inRules = true
              rules :+= Rule(field == "allow", value)
            }
          case _ => () // sitemap/crawl-delay/unknown: not part of the gate
        }
      }
    }
    flush()
    groups.toSeq
  }

  // compiled per distinct pattern, shared across rows (the rule set of
  // a host is tiny; the corpus is not)
  private val rxCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()

  /** Does `pattern` (with `*` wildcards and an optional trailing `$`
    * anchor) match a PREFIX of `path` (or, when anchored, all of it)?
    * An empty pattern matches nothing (RFC: empty Disallow allows).
    * A greedy first-occurrence scan is WRONG for anchored patterns with
    * repeated segments (`/a*b$` vs `/aXbXb`), so segments compile to a
    * quoted regex: `lookingAt` gives prefix semantics, `matches` the
    * anchored form. */
  def matches(pattern: String, path: String): Boolean = {
    if (pattern.isEmpty) return false
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    val rx = rxCache.computeIfAbsent(pattern, _ =>
      java.util.regex.Pattern.compile(
        p.split("\\*", -1).map(java.util.regex.Pattern.quote).mkString(".*"),
        java.util.regex.Pattern.DOTALL))
    val m = rx.matcher(path)
    if (anchored) m.matches() else m.lookingAt()
  }

  /** Select the group for `userAgent` (RFC: matching specific group
    * first, `*` fallback). */
  def groupFor(groups: Seq[Group], userAgent: String): Option[Group] = {
    val ua = userAgent.toLowerCase
    groups.find(_.agents.exists(a => a != "*" && a == ua))
      .orElse(groups.find(_.agents.contains("*")))
  }

  /** The gate: longest matching pattern wins, Allow wins ties, no
    * match → allowed. */
  def allowed(groups: Seq[Group], userAgent: String, path: String): Boolean =
    groupFor(groups, userAgent) match {
      case None => true
      case Some(g) =>
        val hits = g.rules.filter(r => matches(r.pattern, path))
        if (hits.isEmpty) true
        else {
          val best = hits.map(_.pattern.length).max
          hits.filter(_.pattern.length == best).exists(_.allow)
        }
    }
}
