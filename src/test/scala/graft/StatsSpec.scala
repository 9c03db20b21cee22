package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("medianPerGroup: exact two-middle mean, deterministic under ties") {
    val df = Seq(
      ("a", 1.0, 1L), ("a", 3.0, 2L), ("a", 2.0, 3L), ("a", 10.0, 4L),
      ("b", 5.0, 5L), ("b", 7.0, 6L), ("b", 9.0, 7L)).toDF("g", "v", "id")
    val got = Stats.medianPerGroup(df, Seq("g"), "v", "id")
      .as[(String, Double)].collect().toMap
    assert(got("a") == 2.5 && got("b") == 7.0, got.toString)
  }

  test("madPerGroup: zero for constant groups, exact on a known set") {
    val df = Seq(
      ("c", 4.0, 1L), ("c", 4.0, 2L), ("c", 4.0, 3L),
      // median 5, |devs| = {4,2,0,2,4} -> MAD 2
      ("d", 1.0, 4L), ("d", 3.0, 5L), ("d", 5.0, 6L), ("d", 7.0, 7L), ("d", 9.0, 8L))
      .toDF("g", "v", "id")
    val got = Stats.madPerGroup(df, Seq("g"), "v", "id")
      .as[(String, Double)].collect().toMap
    assert(got("c") == 0.0 && got("d") == 2.0, got.toString)
  }

  test("approx variants: within rank tolerance of exact on a skewed 100k-row group") {
    // one giant group (the case the sketch exists for) + one small group
    val df = spark.range(1, 100001)
      .select(lit("big").as("g"), col("id").cast("double").as("v"), col("id"))
      .unionByName(spark.range(1, 8)
        .select(lit("small").as("g"), (col("id") * 10).cast("double").as("v"), col("id")))
    val exactM = Stats.medianPerGroup(df, Seq("g"), "v", "id")
      .as[(String, Double)].collect().toMap
    val approxM = Stats.approxMedianPerGroup(df, Seq("g"), "v", accuracy = 10000)
      .as[(String, Double)].collect().toMap
    // rank error <= n/accuracy = 10 rows on the big group -> <= 10.5 in value
    assert(math.abs(approxM("big") - exactM("big")) <= 11.0,
      s"approx median ${approxM("big")} vs exact ${exactM("big")}")
    // small group (n < accuracy): exact-rank observed element
    assert(math.abs(approxM("small") - exactM("small")) <= 10.0)
    val exactD = Stats.madPerGroup(df, Seq("g"), "v", "id")
      .as[(String, Double)].collect().toMap
    val approxD = Stats.approxMadPerGroup(df, Seq("g"), "v", accuracy = 10000)
      .as[(String, Double)].collect().toMap
    // two sketched levels compound: allow 2x the single-level bound
    assert(math.abs(approxD("big") - exactD("big")) <= 22.0,
      s"approx MAD ${approxD("big")} vs exact ${exactD("big")}")
  }
}
