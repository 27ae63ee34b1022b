package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrubbing pass every training-data
  * pipeline runs before text leaves curation (emails, phone numbers,
  * IP addresses replaced by category tokens, with per-document match
  * counts kept for filtering/audit).
  *
  * Pure per-row projections over codegen'd regexp built-ins: no state,
  * no shuffle — the 100 TB cost is exactly one streamed pass. Patterns
  * are deliberately restricted to the regex subset that means the same
  * thing in Java's engine and in RE2-style engines (character classes,
  * bounded repetition, `\b` word boundaries — no backreferences or
  * lookaround), so redaction is bit-reproducible against an independent
  * SQL engine.
  *
  * Redaction order matters and is fixed: emails first (an email's
  * local part may contain digits a phone pattern could clip),
  * then IPv4 (dotted digit runs a phone pattern could clip),
  * then phones.
  */
object Redact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  /** International-ish form: +CC-... digit groups separated by dashes. */
  val PhoneRe = "\\+[0-9]{1,3}(-[0-9]{2,4}){2,4}"

  val EmailToken = "[EMAIL]"
  val Ipv4Token = "[IP]"
  val PhoneToken = "[PHONE]"

  /** Per-category match counts (cheap audit/filter columns). */
  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Re))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))

  /** All three categories replaced by their tokens, fixed order. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, EmailToken),
        Ipv4Re, Ipv4Token),
      PhoneRe, PhoneToken)
}
