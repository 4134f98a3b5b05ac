package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-corpus hygiene (the C4/Pile
  * recipe step: scrub contact information before training).
  *
  * EXACT coverage (the contract — nothing beyond these classes/formats is
  * detected):
  *  - emails: `local@domain.tld` (ASCII local/domain, 2+ letter TLD);
  *  - IPv4 literals: dotted quads, 1-3 digits per octet;
  *  - phone numbers, four shapes: `+CC NNN NNNN` and `+CC NNN NNN NNNN`
  *    (space- or dash-separated), `+CC (NNN) NNN-NNNN`, `(NNN) NNN-NNNN`,
  *    and bare `NNN-NNN-NNNN` / `NNN NNN NNNN`;
  *  - street addresses, one conservative shape: `<1-5 digits> <Capitalized
  *    word> <Street|Avenue|Boulevard|Road|Lane|Drive|St|Ave|Blvd|Rd|Ln|Dr>`.
  * National formats outside these shapes (e.g. `0171/1234567`,
  * `01 23 45 67 89`), extension suffixes, and free-form postal addresses are
  * OUT OF SCOPE — a regex operator cannot promise them; route such corpora
  * through a dedicated NER pass instead.
  *
  * Pure regex column expressions — map-only, whole-stage-codegen'd, no UDF.
  * The patterns deliberately stay within the syntax subset that Java regex
  * (Spark) and RE2 (DuckDB, Go tooling) interpret identically — character
  * classes, bounded repetition, `\b`, and alternations whose branches are
  * ordered longest-first at any shared start position, so leftmost-first
  * (Java) and leftmost-longest (POSIX RE2) semantics pick the same match.
  * That keeps the operator portable AND oracle-checkable. */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** Phone shapes (see object doc). Branch order: at any given start
    * character the longer-matching branch comes first (`+CC (NNN)` before
    * `+CC NNN NNN NNNN` before `+CC NNN NNNN`), so first-match and
    * longest-match agree. */
  val PhoneRe = "\\+\\d{1,3}[ -]\\(\\d{3}\\)[ -]?\\d{3}-\\d{4}" +
    "|\\+\\d{1,3}[ -]\\d{3}[ -]\\d{3}[ -]\\d{4}" +
    "|\\+\\d{1,3}[ -]\\d{3}[ -]\\d{4}" +
    "|\\(\\d{3}\\)[ -]?\\d{3}-\\d{4}" +
    "|\\b\\d{3}[ -]\\d{3}[ -]\\d{4}\\b"
  /** One conservative street-address shape; suffix literals ordered
    * longest-first (Street before St, ...) for the same first/longest
    * agreement. */
  val AddressRe = "\\b\\d{1,5} [A-Z][A-Za-z]+ " +
    "(Street|Avenue|Boulevard|Road|Lane|Drive|St|Ave|Blvd|Rd|Ln|Dr)\\b"

  /** One kernel call returning every PII signal at once:
    * `struct<n_emails, n_ips, n_phones, n_addresses, redacted>`. Counts are
    * over the INPUT text (the `regexp_extract_all` convention); `redacted`
    * is the sequential email -> IP -> phone -> address rewrite. Backed by
    * the `pii_scan` codegen byte-scanner ([[graft.functions.PiiScan]]) —
    * java.util.regex backtracking was the single most expensive per-byte
    * cost in the curation pipeline (56x DuckDB's RE2 at sf1); the scanner
    * reproduces its semantics exactly (bit-parity spec `TextScanKernelSpec`
    * + the unchanged regex-form DuckDB oracle). Callers needing several
    * fields should bind the struct once, not call per-field helpers. */
  def scan(text: Column): Column = call_function("pii_scan", text)

  def emailCount(text: Column): Column = scan(text).getField("n_emails")
  def ipv4Count(text: Column): Column = scan(text).getField("n_ips")
  def phoneCount(text: Column): Column = scan(text).getField("n_phones")
  def addressCount(text: Column): Column = scan(text).getField("n_addresses")

  /** All four PII classes replaced by typed placeholder tags. Replacement
    * order (email, then IP, then phone, then address) is part of the
    * contract — the oracle mirrors it exactly. */
  def redact(text: Column): Column = scan(text).getField("redacted")

  // ---- staged regex forms — the semantic reference the kernel is
  // parity-tested against (and the shape the DuckDB oracle still runs) ----
  def emailCountStaged(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0)))
  def ipv4CountStaged(text: Column): Column =
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0)))
  def phoneCountStaged(text: Column): Column =
    size(regexp_extract_all(text, lit(PhoneRe), lit(0)))
  def addressCountStaged(text: Column): Column =
    size(regexp_extract_all(text, lit(AddressRe), lit(0)))
  def redactStaged(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>"),
      AddressRe, "<ADDRESS>")
}
