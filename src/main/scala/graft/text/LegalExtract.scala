package graft.text

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** F2-F7 — citation / entity extraction.
  *
  * Regex families re-derived from the reference
  * (`/root/reference/data-ingestion/opinion_utills.py:43-130`): the same
  * pattern *semantics* expressed as Java regexes. Output arrays are
  * deduplicated AND sorted — the reference's `list(set(...))` has
  * nondeterministic order (SURVEY.md Q3); we pick sorted order so results
  * are stable and oracle-testable.
  */
object LegalExtract {

  final case class LegalEntities(
      judges: Seq[String], parties: Seq[String],
      courts: Seq[String], statutes: Seq[String])

  final case class LegalInfo(citations: Seq[String], entities: LegalEntities)

  private val CI = Pattern.CASE_INSENSITIVE

  // Citations: U.S. Reports; Federal Reporter 2d/3d; S.Ct.; state
  // reporters; law reviews. Matched case-insensitively, whole match kept.
  private[text] val citationPatterns: Seq[Pattern] = Seq(
    Pattern.compile("""\b\d+\s+U\.S\.?\s+\d+\s*\(\d{4}\)""", CI),
    Pattern.compile("""\b\d+\s+F\.\s*(?:2d|3d)?\s+\d+\s*\([^)]*\d{4}\)""", CI),
    Pattern.compile("""\b\d+\s+S\.\s*Ct\.\s+\d+\s*\(\d{4}\)""", CI),
    Pattern.compile("""\b\d+\s+[A-Z][a-z]*\.?\s*(?:App\.?\s*)?(?:\d[a-z]*\s+)?\d+\s*\([^)]*\d{4}\)""", CI),
    Pattern.compile("""\b\d+\s+[A-Z][a-z]*\.?\s*L\.?\s*Rev\.?\s+\d+\s*\(\d{4}\)""", CI))

  // Judges: "Justice Name ..." (group 1) and "Name, J." style (group 1).
  private[text] val judgePatterns: Seq[(Pattern, Int)] = Seq(
    (Pattern.compile("""(?:Justice|Judge|Chief Justice|Associate Justice)\s+([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*)"""), 1),
    (Pattern.compile("""([A-Z][a-z]+),?\s+(?:J\.|C\.J\.|Associate Justice|Chief Justice)"""), 1))

  // Parties: "X v. Y" — both sides captured.
  private[text] val partyPattern: Pattern =
    Pattern.compile("""([A-Z][a-zA-Z\s&,\.]+?)\s+v\.?\s+([A-Z][a-zA-Z\s&,\.]+?)(?:\s|,|\.|\n)""")

  private[text] val courtPatterns: Seq[Pattern] = Seq(
    Pattern.compile("""(Supreme Court of [A-Z][a-zA-Z\s]+)"""),
    Pattern.compile("""(United States Supreme Court)"""),
    Pattern.compile("""([A-Z][a-zA-Z\s]+ Circuit Court of Appeals)"""),
    Pattern.compile("""([A-Z][a-zA-Z\s]+ District Court)"""),
    Pattern.compile("""(Court of Appeals for the [A-Z][a-zA-Z\s]+ Circuit)"""))

  private[text] val statutePatterns: Seq[Pattern] = Seq(
    Pattern.compile("""\b\d+\s+U\.S\.C\.?\s*§+\s*\d+[a-z]*(?:\([^)]+\))*""", CI),
    Pattern.compile("""Title\s+[IVX]+(?:\s+of\s+[^,.\n]+)?""", CI),
    Pattern.compile("""Section\s+\d+[a-z]*(?:\([^)]+\))*""", CI))

  private def findAll(p: Pattern, text: String, group: Int = 0): Seq[String] = {
    val m = p.matcher(text)
    val out = ArrayBuffer.empty[String]
    while (m.find()) out += m.group(group)
    out.toSeq
  }

  /** Deterministic dedup: trim, drop empties, distinct, sorted (Q3/D3). */
  private def cleanDedup(xs: Seq[String]): Seq[String] =
    xs.map(_.trim).filter(_.nonEmpty).distinct.sorted

  def citations(text: String): Seq[String] =
    cleanDedup(citationPatterns.flatMap(findAll(_, text)))

  def judges(text: String): Seq[String] =
    cleanDedup(judgePatterns.flatMap { case (p, g) => findAll(p, text, g) })

  def parties(text: String): Seq[String] = {
    val m = partyPattern.matcher(text)
    val out = ArrayBuffer.empty[String]
    while (m.find()) { out += m.group(1); out += m.group(2) }
    cleanDedup(out.toSeq)
  }

  def courts(text: String): Seq[String] =
    cleanDedup(courtPatterns.flatMap(findAll(_, text, 1)))

  def statutes(text: String): Seq[String] =
    cleanDedup(statutePatterns.flatMap(findAll(_, text)))

  /** Full extraction (reference `extract_legal_info`). */
  def apply(text: String): LegalInfo =
    if (text == null || text.isEmpty)
      LegalInfo(Nil, LegalEntities(Nil, Nil, Nil, Nil))
    else
      LegalInfo(
        citations(text),
        LegalEntities(judges(text), parties(text), courts(text), statutes(text)))
}
