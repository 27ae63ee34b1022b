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
  /** US SSN: exactly 3-2-4 digit groups (the 2-digit middle group
    * keeps it disjoint from both phone forms). */
  val SsnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  /** Payment-card number: four 4-digit groups with a uniform dash or
    * space separator, or an unbroken 16-digit run. */
  val CardRe =
    "\\b[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}\\b" +
      "|\\b[0-9]{4} [0-9]{4} [0-9]{4} [0-9]{4}\\b|\\b[0-9]{16}\\b"
  /** US domestic forms: (NNN) NNN-NNNN or NNN-NNN-NNNN. */
  val UsPhoneRe = "\\(\\d{3}\\) ?\\d{3}-\\d{4}|\\b\\d{3}-\\d{3}-\\d{4}\\b"

  val EmailToken = "[EMAIL]"
  val Ipv4Token = "[IP]"
  val PhoneToken = "[PHONE]"
  val SsnToken = "[SSN]"
  val CardToken = "[CARD]"

  /** Per-category match counts (cheap audit/filter columns). */
  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Re))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))
  def ssnCount(text: Column): Column = regexp_count(text, lit(SsnRe))
  def cardCount(text: Column): Column = regexp_count(text, lit(CardRe))
  def usPhoneCount(text: Column): Column = regexp_count(text, lit(UsPhoneRe))

  /** The original three categories replaced by their tokens, fixed
    * order (the q72-gated contract, kept stable). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, EmailToken),
        Ipv4Re, Ipv4Token),
      PhoneRe, PhoneToken)

  /** All six categories, fixed order: email first (digit-bearing local
    * parts), then the longest digit shapes before the shorter ones
    * that could clip them (card -> ssn -> ipv4 -> intl phone -> us
    * phone). Same engine-portable subset as [[redactPii]]. */
  def redactPiiFull(text: Column): Column = {
    val chain = Seq(
      EmailRe -> EmailToken, CardRe -> CardToken, SsnRe -> SsnToken,
      Ipv4Re -> Ipv4Token, PhoneRe -> PhoneToken, UsPhoneRe -> PhoneToken)
    chain.foldLeft(text) { case (c, (re, tok)) =>
      regexp_replace(c, re, tok)
    }
  }
}
