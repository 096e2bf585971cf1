package graft.quality

import graft.SparkSpec

class PiiSpec extends SparkSpec {
  import spark.implicits._

  test("annotate: every category redacts to its placeholder, counts match") {
    val docs = Seq(
      (1L, "mail a.b+c@ex-ample.co.uk now"),
      (2L, "call 555-123-4567 or 555.123.4567"),
      (3L, "host 10.0.0.1 and 192.168.255.34"),
      (4L, "ssn 123-45-6789 ok"),
      (5L, "card 4242 4242 4242 4242 or 4242-4242-4242-4242"),
      (6L, "clean text, no pii at all"),
      (7L, "x@y.io from 10.0.0.1 ssn 111-22-3333")
    ).toDF("id", "text")
    val out = Pii.annotate(docs, "text").orderBy("id")
      .select("id", "n_email", "n_card", "n_ssn", "n_phone", "n_ipv4",
        "n_pii", "redacted")
      .as[(Long, Long, Long, Long, Long, Long, Long, String)]
      .collect().toSeq
    assert(out(0) === ((1L, 1L, 0L, 0L, 0L, 0L, 1L, "mail <EMAIL> now")))
    assert(out(1) === ((2L, 0L, 0L, 0L, 2L, 0L, 2L,
      "call <PHONE> or <PHONE>")))
    assert(out(2) === ((3L, 0L, 0L, 0L, 0L, 2L, 2L,
      "host <IP> and <IP>")))
    assert(out(3) === ((4L, 0L, 0L, 1L, 0L, 0L, 1L, "ssn <SSN> ok")))
    assert(out(4) === ((5L, 0L, 2L, 0L, 0L, 0L, 2L,
      "card <CARD> or <CARD>")))
    assert(out(5) === ((6L, 0L, 0L, 0L, 0L, 0L, 0L,
      "clean text, no pii at all")))
    assert(out(6) === ((7L, 1L, 0L, 1L, 0L, 1L, 3L,
      "<EMAIL> from <IP> ssn <SSN>")))
  }

  test("annotate: null text propagates null counts and redaction") {
    // a null document is NOT a clean document — counts and redacted stay
    // null (Spark regexp semantics), so a `n_pii === 0` release filter
    // does not silently admit it; coalesce upstream if null means empty
    val docs = Seq((1L, Option("x@y.io here")), (2L, Option.empty[String]))
      .toDF("id", "text")
    val out = Pii.annotate(docs, "text").orderBy("id")
      .select("id", "n_pii", "redacted")
      .as[(Long, Option[Long], Option[String])].collect().toSeq
    assert(out === Seq((1L, Some(1L), Some("<EMAIL> here")),
      (2L, None, None)))
  }

  test("rule order: a card never double-counts as phones; email digits stay put") {
    // the card rule runs before phone, so the 16-digit run is consumed
    // whole; counts reflect inserted placeholders, not original-text scans
    val docs = Seq((1L, "pay 4242-4242-4242-4242 then call 555-123-4567"))
      .toDF("id", "text")
    val r = Pii.annotate(docs, "text")
      .select("n_card", "n_phone", "n_ssn", "redacted")
      .as[(Long, Long, Long, String)].head()
    assert(r === ((1L, 1L, 0L, "pay <CARD> then call <PHONE>")))
    // an email whose local part is digit-shaped redacts as ONE email
    val e = Pii.annotate(Seq((1L, "id 555-123-4567@ex.com end")).toDF("id", "text"), "text")
      .select("n_email", "n_phone", "redacted").as[(Long, Long, String)].head()
    assert(e === ((1L, 0L, "id <EMAIL> end")))
  }

  test("annotate rejects input columns that collide with its outputs") {
    val d = Seq((1L, "x", 0L)).toDF("id", "text", "n_email")
    val e = intercept[IllegalArgumentException](Pii.annotate(d, "text"))
    assert(e.getMessage.contains("n_email"))
    // redaction is idempotent: placeholders contain no redactable shapes
    val once = Pii.annotate(Seq((1L, "a@b.co 10.0.0.1 123-45-6789"))
      .toDF("id", "text"), "text").select("id", "redacted")
      .withColumnRenamed("redacted", "text")
    val twice = Pii.annotate(once, "text")
      .select("n_pii", "redacted").as[(Long, String)].head()
    assert(twice === ((0L, "<EMAIL> <IP> <SSN>")))
  }

  test("findings: one row per instance with its category") {
    val docs = Seq((1L, "a@b.co and 10.0.0.1"), (2L, "clean")).toDF("id", "text")
    val f = Pii.findings(docs, "id", "text")
      .orderBy("id", "category").as[(Long, String, String)].collect().toSeq
    assert(f === Seq((1L, "email", "a@b.co"), (1L, "ipv4", "10.0.0.1")))
  }
}
