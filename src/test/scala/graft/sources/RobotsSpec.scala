package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The RFC 9309 robots.txt engine: grammar tolerance, group selection,
  * longest-pattern precedence with Allow winning ties, and the `*`/`$`
  * metacharacter semantics — including the repeated-segment anchored
  * case a greedy first-occurrence matcher gets wrong. */
class RobotsSpec extends AnyFunSuite {

  private val policy = Robots.parse(
    """# policy
      |User-Agent: GraftBot
      |Disallow: /private/
      |Allow: /private/doc/
      |Disallow: /doc/tmp$
      |Disallow: /*.bin
      |Disallow:
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin)

  private def ok(path: String, ua: String = "graftbot"): Boolean =
    Robots.allowed(policy, ua, path)

  test("group selection: specific UA case-insensitively, * fallback, none") {
    assert(ok("/anything"))
    assert(!Robots.allowed(policy, "randombot", "/anything")) // deny-all *
    assert(Robots.allowed(Nil, "anybot", "/x")) // no groups: allowed
  }

  test("longest pattern wins; Allow wins ties; no match allows") {
    assert(!ok("/private/admin/1")) // /private/ (9) only
    assert(ok("/private/doc/1")) // Allow (13) out-prefixes Disallow (9)
    assert(ok("/doc/1")) // nothing matches
    val tie = Robots.parse(
      "User-agent: a\nDisallow: /p/\nAllow: /p*\n")
    assert(Robots.allowed(tie, "a", "/p/x")) // equal length 3: Allow wins
  }

  test("$ anchors to the full path; * matches any span") {
    assert(!ok("/doc/tmp"))
    assert(ok("/doc/tmp2")) // anchored rule must not fire on a prefix
    assert(!ok("/data/5.bin"))
    assert(!ok("/x/y/z.bin")) // /*.bin matches anywhere
    // '/*.bin' is UNanchored: any path CONTAINING '.bin' matches
    assert(!ok("/data/5.binx"))
  }

  test("anchored pattern with repeated segments (greedy-matcher trap)") {
    val g = Robots.parse("User-agent: a\nDisallow: /a*b$\n")
    assert(!Robots.allowed(g, "a", "/aXbXb")) // must match via the LAST b
    assert(Robots.allowed(g, "a", "/aXbXbY"))
  }

  test("grammar: empty Disallow matches nothing; rules before UA ignored") {
    assert(ok("/")) // the deny-all only lives in the * group
    val stray = Robots.parse("Disallow: /\nUser-agent: a\nAllow: /x\n")
    assert(Robots.allowed(stray, "a", "/anything")) // stray rule dropped
  }

  test("a User-agent line after rules starts a NEW group") {
    val g = Robots.parse(
      "User-agent: a\nDisallow: /x\nUser-agent: b\nDisallow: /y\n")
    assert(!Robots.allowed(g, "a", "/x1") && Robots.allowed(g, "a", "/y1"))
    assert(Robots.allowed(g, "b", "/x1") && !Robots.allowed(g, "b", "/y1"))
  }
}
