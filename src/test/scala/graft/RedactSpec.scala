package graft

import org.apache.spark.sql.functions._

import graft.ops.Redact

class RedactSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: (Long, String)*) =
    texts.toDF("id", "text")
      .select($"id", Redact.redactPii($"text").as("red"),
        Redact.emailCount($"text").cast("long").as("ne"),
        Redact.phoneCount($"text").cast("long").as("np"),
        Redact.ipv4Count($"text").cast("long").as("ni"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("redactPii scrubs planted emails, phones, and IPs with correct counts") {
    val out = run(
      1L -> "write to alice.smith+x@corp.example.org today",
      2L -> "call +44-20-7946-0958 or +1-555-0100 now",
      3L -> "server at 192.168.0.1 and 10.0.0.255",
      4L -> "mixed bob@ex.io via 172.16.4.20 tel +7-495-123-45-67")
    assert(out(1L) == (("write to [EMAIL] today", 1L, 0L, 0L)))
    assert(out(2L) == (("call [PHONE] or [PHONE] now", 0L, 2L, 0L)))
    assert(out(3L) == (("server at [IP] and [IP]", 0L, 0L, 2L)))
    assert(out(4L) == (("mixed [EMAIL] via [IP] tel [PHONE]", 1L, 1L, 1L)))
  }

  test("near-miss patterns survive: decimals, versions, bare dashes") {
    val out = run(5L -> "no pii: 3.14, v1.2.3, 2024-01-02, a-b, x at y dot com")
    assert(out(5L) == (("no pii: 3.14, v1.2.3, 2024-01-02, a-b, x at y dot com",
      0L, 0L, 0L)))
  }

  test("redaction is idempotent (tokens contain no redactable text)") {
    val df = Seq((1L, "bob@ex.io +1-555-0100 10.0.0.1")).toDF("id", "text")
    val once = df.select(Redact.redactPii($"text").as("t"))
    val twice = once.select(Redact.redactPii($"t").as("t"))
    assert(once.head().getString(0) == twice.head().getString(0))
    assert(once.head().getString(0) == "[EMAIL] [PHONE] [IP]")
  }

  test("redactPiiFull scrubs SSN, card (all three shapes), US phones") {
    val df = Seq(
      (1L, "ssn 219-09-9999 ok"),
      (2L, "4111-1111-1111-1111 and 4111 1111 1111 1111 and 4012888888881881"),
      (3L, "call (555) 867-5309 or 555-867-5309"),
      (4L, "all bob@ex.io 4111 1111 1111 1111 219-09-9999 10.0.0.1 +1-555-0100 (555) 867-5309"))
      .toDF("id", "text")
    val out = df.select($"id", Redact.redactPiiFull($"text").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "ssn [SSN] ok")
    assert(out(2L) == "[CARD] and [CARD] and [CARD]")
    assert(out(3L) == "call [PHONE] or [PHONE]")
    assert(out(4L) == "all [EMAIL] [CARD] [SSN] [IP] [PHONE] [PHONE]")
  }

  test("full-chain ordering: card groups never half-match as SSN/phone") {
    // 4-4-4-4 digits must redact as ONE card, not clip into the
    // 3-2-4 (ssn) or 3-3-4 (phone) shapes
    val out = Seq((1L, "pay 4111-1111-1111-1111 thanks")).toDF("id", "text")
      .select(Redact.redactPiiFull($"text")).head().getString(0)
    assert(out == "pay [CARD] thanks")
    // ssn/us-phone counts on the raw text are zero for a card string
    val cnts = Seq((1L, "4111-1111-1111-1111")).toDF("id", "text")
      .select(Redact.ssnCount($"text").cast("long"),
        Redact.usPhoneCount($"text").cast("long")).head()
    assert(cnts.getLong(0) == 0 && cnts.getLong(1) == 0)
  }

  test("near-miss digit shapes survive the full chain") {
    val s = "v 1.2.3 date 2024-01-02 num 123-45 12345678901234567"
    val out = Seq((1L, s)).toDF("id", "text")
      .select(Redact.redactPiiFull($"text")).head().getString(0)
    assert(out == s)
  }
}
