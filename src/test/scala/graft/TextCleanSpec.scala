package graft

import graft.operators.TextClean
import org.apache.spark.sql.functions._

class TextCleanSpec extends SparkSpec {
  import spark.implicits._

  test("scrubPii redacts emails, IPs, and phones — IPs before the looser phone pattern") {
    val got = Seq(
      "mail bob.smith+x@corp.example.org now",
      "server 10.20.30.40 responded",
      "call +1-555-867-5309 or 555 867 5309",
      "mixed: a@b.io via 192.168.0.1 tel 02-1234-5678",
      "clean text with no pii at all"
    ).toDF("t").select(TextClean.scrubPii(col("t")).as("s")).as[String].collect()
    assert(got.toSeq == Seq(
      "mail [EMAIL] now",
      "server [IP] responded",          // IP redacted as [IP], NOT [PHONE]
      "call [PHONE] or [PHONE]",
      "mixed: [EMAIL] via [IP] tel [PHONE]",
      "clean text with no pii at all"))
  }

  test("piiCount counts each category once per occurrence") {
    val got = Seq(
      ("a@b.io and c@d.net", 2L),
      ("ip 10.0.0.1 phone 555-123-4567", 2L),
      ("nothing here", 0L)
    ).toDF("t", "want")
    val bad = got.filter(TextClean.piiCount(col("t")) =!= col("want")).count()
    assert(bad == 0)
  }

  test("maskKeepLast preserves only the suffix") {
    val got = Seq("555-867-5309", "1234", "56").toDF("t")
      .select(TextClean.maskKeepLast(col("t"), 4).as("m")).as[String].collect()
    assert(got.toSeq == Seq("********5309", "1234", "56"))
  }

  test("normalizeWhitespace collapses runs and trims") {
    val got = Seq("  a\t\tb \n c  ").toDF("t")
      .select(TextClean.normalizeWhitespace(col("t")).as("n")).as[String].head()
    assert(got == "a b c")
  }
}
