package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("stopwordCount and qualityScore behave on edge inputs") {
    val df = Seq("the a the", "no stopwords here", "x").toDF("t")
    val stops = df.select(TextAnalysis.stopwordCount(col("t"), Seq("a", "the")).as("n"))
      .as[Long].collect()
    assert(stops.toSeq == Seq(3L, 0L, 0L))
    val q = df.select(TextAnalysis.qualityScore(col("t"), Seq("a", "the")).as("q"))
      .as[Double].collect()
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(0) == 0.0) // all-stopword text floors at zero
  }

  test("langId argmax is deterministic with alphabetical tie-break") {
    val markers = Seq("en" -> Seq("the"), "de" -> Seq("der"), "fr" -> Seq("le"))
    val got = Seq("the cat", "der hund", "le chat", "nothing matches")
      .toDF("t").select(TextAnalysis.langId(col("t"), markers).as("l"))
      .as[String].collect()
    // all-zero scores tie -> alphabetically first language wins
    assert(got.toSeq == Seq("en", "de", "fr", "de"))
  }

  test("fingerprint normalizes case and whitespace") {
    val fps = Seq("Hello World", "  hello world  ").toDF("t")
      .select(TextAnalysis.fingerprint(col("t"))).as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("avgTokenLen is exact") {
    val v = Seq("ab cd ef").toDF("t")
      .select(TextAnalysis.avgTokenLen(col("t"))).as[Double].head()
    assert(v == 2.0)
  }
}
