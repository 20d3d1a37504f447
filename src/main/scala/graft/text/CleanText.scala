package graft.text

/** F1 `clean_text` — HTML/XML strip + whitespace normalization.
  *
  * Re-derivation of the reference behavior (see
  * `/root/reference/data-ingestion/opinion_utills.py:132-146`): strip
  * markup, join text nodes with a single space (each node trimmed,
  * empty nodes dropped), then collapse any whitespace run to one space.
  *
  * Pure Scala (no jsoup in this environment): a small tag/entity-aware
  * scanner. Exposed to Spark as a UDF in [[graft.functions]].
  */
object CleanText {

  private val namedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "sect" -> "§", "para" -> "¶",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "rsquo" -> "’", "lsquo" -> "‘",
    "rdquo" -> "”", "ldquo" -> "“", "copy" -> "©")

  /** Decode named + numeric (`&#65;` / `&#x41;`) character references.
    * Unknown references are left verbatim (lenient, like html parsers). */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          val decoded: Option[String] =
            if (body.startsWith("#x") || body.startsWith("#X"))
              try Some(new String(Character.toChars(Integer.parseInt(body.drop(2), 16))))
              catch { case _: Exception => None }
            else if (body.startsWith("#"))
              try Some(new String(Character.toChars(Integer.parseInt(body.drop(1)))))
              catch { case _: Exception => None }
            else namedEntities.get(body)
          decoded match {
            case Some(d) => out.append(d); i = semi + 1
            case None    => out.append(c); i += 1
          }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Extract text nodes: drop tags and comments, join trimmed non-empty
    * nodes with a single space. */
  def stripMarkup(content: String): String = {
    val nodes = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    val n = content.length
    def flush(): Unit = {
      val t = cur.toString.trim
      if (t.nonEmpty) nodes += t
      cur.clear()
    }
    while (i < n) {
      val c = content.charAt(i)
      if (c == '<') {
        flush()
        if (content.startsWith("<!--", i)) {
          val end = content.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val end = content.indexOf('>', i + 1)
          i = if (end < 0) n else end + 1
        }
      } else { cur.append(c); i += 1 }
    }
    flush()
    nodes.mkString(" ")
  }

  /** Full F1: strip markup, decode entities, collapse whitespace. */
  def apply(content: String): String =
    if (content == null || content.isEmpty) ""
    else decodeEntities(stripMarkup(content)).replaceAll("\\s+", " ").trim
}
