package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-corpus hygiene (the C4/Pile
  * recipe step: scrub emails, phone numbers, and addresses before training).
  *
  * Pure regex column expressions — map-only, whole-stage-codegen'd, no UDF.
  * The patterns deliberately stay within the syntax subset that Java regex
  * (Spark) and RE2 (DuckDB, Go tooling) interpret identically — character
  * classes, bounded repetition, `\b` — no backrefs, no lookaround, no
  * alternation whose match could differ between leftmost-first (Java) and
  * leftmost-longest (RE2) semantics. That keeps the operator portable AND
  * oracle-checkable. */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** International-format phone: +CC NNN NNNN (space- or dash-separated). */
  val PhoneRe = "\\+\\d{1,3}[ -]\\d{3}[ -]\\d{4}"

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0)))
  def ipv4Count(text: Column): Column =
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0)))
  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhoneRe), lit(0)))

  /** All three PII classes replaced by typed placeholder tags. Replacement
    * order (email, then IP, then phone) is part of the contract — the oracle
    * mirrors it exactly. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")
}
