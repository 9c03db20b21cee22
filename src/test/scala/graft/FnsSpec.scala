package graft

import graft.functions.Fns
import org.apache.spark.sql.functions._

class FnsSpec extends SparkSpec {
  import spark.implicits._

  test("cents: dollars to integer cents, half-up on the double's true value") {
    // 1.005 as a double is 1.00499999... -> 100 cents; this is the exact
    // IEEE behavior every engine reproduces (the point of the formulation).
    val rows = Seq(0.0, 1.0, 1.005, 12.34, 19.999, 1234.56).toDF("d")
      .select(Fns.cents(col("d")).as("c")).as[Long].collect()
    assert(rows.toSeq == Seq(0L, 100L, 100L, 1234L, 2000L, 123456L))
  }

  test("priceDisplay renders $D.CC with zero-padded cents") {
    val rows = Seq(0L, 5L, 99L, 100L, 1234L, 120000L).toDF("c")
      .select(Fns.priceDisplay(col("c")).as("s")).as[String].collect()
    assert(rows.toSeq == Seq("$0.00", "$0.05", "$0.99", "$1.00", "$12.34", "$1200.00"))
  }

  test("tokenCount counts whitespace tokens") {
    val n = Seq("a b c", "one", "x y z w").toDF("t")
      .select(Fns.tokenCount(col("t")).as("n")).as[Long].collect()
    assert(n.toSeq == Seq(3L, 1L, 4L))
  }

  test("dsum is exact and order-independent") {
    val vals = (1 to 10000).map(i => i * 0.01)
    val a = vals.toDF("x").repartition(7).agg(Fns.dsum(col("x"))).as[Double].head()
    val b = vals.reverse.toDF("x").repartition(3).agg(Fns.dsum(col("x"))).as[Double].head()
    assert(a == b)
    assert(math.abs(a - 500050.0) < 1e-6)
  }

  test("htmlEscape matches the reference escapeHTML map (X14)") {
    // reference app/templates/search.html:174
    val got = Seq("""<a href="x">Tom & Jerry's</a>""", "plain", "&amp;").toDF("t")
      .select(Fns.htmlEscape(col("t")).as("e")).as[String].collect()
    assert(got.toSeq == Seq(
      "&lt;a href=&quot;x&quot;&gt;Tom &amp; Jerry&#039;s&lt;/a&gt;",
      "plain",
      "&amp;amp;"))  // ampersands escape first, never double-escaped beyond
  }

  test("swapExt/extCandidates mirror the reference ext-swap fallback (X13)") {
    val got = Seq("covers/1.PNG", "covers/2.jpeg", "noext").toDF("u")
      .select(Fns.swapExt(col("u"), "jpg").as("s")).as[String].collect()
    assert(got.toSeq == Seq("covers/1.jpg", "covers/2.jpg", "noext.jpg"))
    val cands = Seq("a.webp").toDF("u")
      .select(Fns.extCandidates(col("u")).as("c")).as[Seq[String]].head()
    assert(cands == Seq("a.jpg", "a.jpeg", "a.png", "a.webp"))
  }

  test("relevance weights substring hits") {
    val r = Seq(("red widget", "ECONOMY"), ("blue bolt", "STANDARD")).toDF("name", "typ")
      .select(
        (Fns.relevance("red", Seq(col("name") -> 3)) +
         Fns.relevance("economy", Seq(col("typ") -> 2))).as("score"))
      .as[Int].collect()
    assert(r.toSeq == Seq(5, 0))
  }
}
