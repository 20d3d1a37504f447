package graft.sources

/** robots.txt parsing + the crawl-policy decision (RFC 9309) — the
  * FIRST gate of any web-corpus pipeline: before a WARC record is even
  * fetched, the crawler must answer "may I take this path?". Group
  * semantics per the RFC: consecutive `User-agent` lines open one
  * group; a group's rules apply to the most SPECIFIC matching agent
  * product token (exact token beats `*`, and only the best-matching
  * group's rules apply — rules never merge across groups); matching is
  * longest-prefix with Allow winning length ties (the published
  * Googlebot rule); no matching rule → allowed. Unknown directives and
  * comments (`#`) are ignored per the RFC's forward-compatibility
  * clause.
  *
  * Deterministic pure functions of (robots text, agent, path) — the
  * decision a 100 TB crawl replays billions of times belongs in
  * compiled code on the executor, with the parsed rule list broadcast
  * (robots files are KB-sized by contract; the fetch tier caches one
  * per host). */
object RobotsTxt {

  final case class Rule(allow: Boolean, prefix: String)

  /** Parse the rule list that applies to `agent` (case-insensitive
    * product token): collect every group, pick the group set of the
    * longest matching agent token (exact > `*`); groups for other
    * agents are invisible. */
  def rulesFor(text: String, agent: String): Seq[Rule] = {
    val want = agent.toLowerCase(java.util.Locale.ROOT)
    // (agentTokens, rules) per group
    val groups = Seq.newBuilder[(Seq[String], Seq[Rule])]
    var agents = Seq.empty[String]
    var rules = Seq.empty[Rule]
    var inAgents = true
    def flush(): Unit = {
      if (agents.nonEmpty) groups += ((agents, rules))
      agents = Seq.empty; rules = Seq.empty; inAgents = true
    }
    text.split("\n", -1).foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.substring(0, i).trim
          .toLowerCase(java.util.Locale.ROOT)
        val v = line.substring(i + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents) flush()
            agents :+= v.toLowerCase(java.util.Locale.ROOT)
            inAgents = true
          case "allow" =>
            inAgents = false
            if (v.nonEmpty) rules :+= Rule(allow = true, v)
          case "disallow" =>
            inAgents = false
            // empty Disallow means "allow all" — contributes no rule
            if (v.nonEmpty) rules :+= Rule(allow = false, v)
          case _ => () // sitemap, crawl-delay, unknown: ignored
        }
      }
    }
    flush()
    val all = groups.result()
    def score(tokens: Seq[String]): Int =
      tokens.map {
        case t if t == want => 2
        case "*" => 1
        case _ => 0
      }.max
    val best = all.map(g => (score(g._1), g)).filter(_._1 > 0)
    if (best.isEmpty) Seq.empty
    else {
      val top = best.map(_._1).max
      // every group tied at the best specificity contributes (a file
      // may repeat "User-agent: x" blocks; the RFC merges them)
      best.filter(_._1 == top).flatMap(_._2._2)
    }
  }

  /** Longest-prefix decision: the longest matching rule wins; a length
    * tie goes to Allow; no match → allowed. */
  def isAllowed(rules: Seq[Rule], path: String): Boolean = {
    val hits = rules.filter(r => path.startsWith(r.prefix))
    if (hits.isEmpty) true
    else {
      val m = hits.map(_.prefix.length).max
      hits.filter(_.prefix.length == m).exists(_.allow)
    }
  }
}
