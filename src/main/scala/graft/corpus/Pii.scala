package graft.corpus

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction for training-data curation (the standard
  * pre-release scrub: emails, IPv4 addresses, US-SSN-shaped ids, phone
  * numbers, credit-card numbers with Luhn validation). Everything is
  * builtin regexp machinery — scan-stage codegen, no UDF, no shuffle —
  * and every pattern is written in the Java-regex ∩ RE2 common subset
  * (character classes, alternation, bounded quantifiers, `\b`) so an
  * external engine recomputes the same decisions from the same strings.
  *
  * Redaction is regex-conservative: every credit-card-SHAPED run is
  * replaced whether or not it Luhn-validates (a scrubber must not leak a
  * number because a checksum failed); [[detect]] reports both the raw
  * candidate count and the Luhn-valid count so a pipeline can gate on
  * either. Order matters and is fixed: email → credit card → SSN → IPv4 →
  * phone (cards are redacted before phones so a spaced 16-digit group can
  * never be half-eaten by the 3-3-4 phone shape; placeholders contain no
  * digits, so later passes never re-match earlier replacements).
  *
  * No reference analog (syslog-ng has no PII operator); determinism rules
  * as everywhere in graft — content-derived decisions only.
  */
object Pii {

  /** RFC-5322-ish practical email shape. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 with octet range checks. */
  val Ipv4Re =
    "\\b((25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\\.){3}(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\\b"

  /** US SSN layout NNN-NN-NNNN. */
  val SsnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** NANP-ish phone: optional +1/1 prefix, (NNN) or NNN, separator, NNN,
    * separator, NNNN. No leading `\b` — a word boundary cannot sit between
    * a space and `(`, which would drop every parenthesized area code. */
  val PhoneRe = "(\\+?1[-. ])?(\\([0-9]{3}\\) ?|[0-9]{3}[-. ])[0-9]{3}[-. ][0-9]{4}"

  /** Credit-card-shaped: 4×4 digit groups with a uniform separator, or a
    * bare 16-digit run. Luhn validation is a separate, composable check
    * ([[luhnValid]]) because a regex cannot compute a checksum. */
  val CreditCardRe = "\\b[0-9]{4}([- ][0-9]{4}){3}\\b|\\b[0-9]{16}\\b"

  /** Redaction order + placeholders (see scaladoc for why this order). */
  val RedactionOrder: Seq[(String, String)] = Seq(
    EmailRe -> "<EMAIL>",
    CreditCardRe -> "<CREDIT_CARD>",
    SsnRe -> "<SSN>",
    Ipv4Re -> "<IP>",
    PhoneRe -> "<PHONE>")

  /** Luhn checksum over the digits of `s` (separators stripped): doubles
    * every second digit from the right, subtracts 9 from two-digit
    * products, valid iff the total ≡ 0 (mod 10) and the digit count is a
    * plausible PAN length (13–19). Pure builtins — `when` guards keep the
    * aggregate from ever seeing a descending `sequence`. */
  def luhnValid(s: Column): Column = {
    val d = regexp_replace(s, "[^0-9]", "")
    val n = length(d)
    val total = aggregate(sequence(lit(1), n), lit(0), (acc, i) => {
      val x = d.substr(i, lit(1)).cast("int")
      acc + when(pmod(n - i + lit(1), lit(2)) === 0,
        when(x * 2 > 9, x * 2 - 9).otherwise(x * 2)).otherwise(x)
    })
    when(n >= 13 && n <= 19, pmod(total, lit(10)) === 0).otherwise(lit(false))
  }

  /** Per-category hit counts: raw regex candidates for each PII family
    * plus the Luhn-validated credit-card count. One struct, one pass. */
  def detect(text: Column): Column = {
    def hits(re: String): Column =
      size(regexp_extract_all(text, lit(re), lit(0))).cast("long")
    val ccs = regexp_extract_all(text, lit(CreditCardRe), lit(0))
    struct(
      hits(EmailRe).as("n_email"),
      hits(Ipv4Re).as("n_ipv4"),
      hits(SsnRe).as("n_ssn"),
      hits(PhoneRe).as("n_phone"),
      size(ccs).cast("long").as("n_cc"),
      size(filter(ccs, c => luhnValid(c))).cast("long").as("n_cc_luhn"))
  }

  /** All-category placeholder redaction in the fixed [[RedactionOrder]]. */
  def redact(text: Column): Column =
    RedactionOrder.foldLeft(text) { case (t, (re, ph)) => regexp_replace(t, re, ph) }

  // ------------------------------------------------ pseudonymization

  /** Rebuild `text` with every match of `re` replaced by `pseudo(match)`.
    * `regexp_replace` cannot compute a function of the match, so the text
    * splits on the regex (trailing empties kept — both engines agree),
    * the matches extract in order, and a transform+join stitches
    * part[i] + pseudo(match[i]) back together. Scan-stage builtins; the
    * regex must not match the empty string (every [[Pii]] pattern is
    * non-empty by construction).
    */
  private def replaceEach(text: Column, re: String, pseudo: Column => Column): Column = {
    val parts = split(text, re, -1)
    val ms = regexp_extract_all(text, lit(re), lit(0))
    array_join(transform(sequence(lit(1), size(parts)), i =>
      concat(element_at(parts, i),
        when(i <= size(ms), pseudo(try_element_at(ms, i))).otherwise(lit("")))), "")
  }

  /** Deterministic email pseudonym: `user-<md5₈ of the lowercased
    * address>@example.com` — the SAME address (case-insensitive) maps to
    * the SAME pseudonym everywhere in the corpus. */
  def pseudoEmail(m: Column): Column =
    concat(lit("user-"), substring(md5(lower(m)), 1, 8), lit("@example.com"))

  /** Deterministic IPv4 pseudonym inside 10/8: `10.b1.b2.b3` from the
    * first three md5 bytes of the literal address. */
  def pseudoIpv4(m: Column): Column = {
    def b(i: Int) = conv(substring(md5(m), 2 * i + 1, 2), 16, 10)
    concat(lit("10."), b(0), lit("."), b(1), lit("."), b(2))
  }

  /** Consistent pseudonymization — the privacy scrub that PRESERVES
    * coreference and distributional structure where [[redact]] erases it:
    * every occurrence of the same email / IPv4, within and ACROSS
    * documents, maps to the same content-derived stand-in ("alice mailed
    * bob, then alice replied" keeps its two actors; per-host log volumes
    * keep their shape). The identity itself is gone — pseudonyms live in
    * reserved namespaces (example.com, 10/8) and derive via md5, which is
    * exactly as reversible as the corpus-wide salt-free hash everything
    * else here uses (documented trade-off vs [[redact]]: use redact when
    * linkability itself is the risk). Emails first, then IPs; an email
    * pseudonym contains no dotted digit quad, so the second pass never
    * touches the first's output. */
  def pseudonymize(text: Column): Column =
    replaceEach(replaceEach(text, EmailRe, pseudoEmail), Ipv4Re, pseudoIpv4)
}
