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

  test("thresholdForKeepRate: exact k-th-highest threshold, tie mass reported, edge cases") {
    def cal(scores: Seq[Double], rate: Double) =
      Stats.thresholdForKeepRate(
        scores.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s"),
        "s", "id", rate)
        .as[(Long, Long, Double, Long, Double)].collect().toSeq

    // plain case: k = floor(0.6*5) = 3, T = 3rd highest, exactly 3 kept
    assert(cal(Seq(0.9, 0.8, 0.8, 0.7, 0.1), 0.6) ==
      Seq((5L, 3L, 0.8, 3L, 0.6)))
    // tie mass AT the threshold: k = 2, T = 0.8, but three 0.8s keep ->
    // actual rate overshoots the target (documented contract)
    assert(cal(Seq(0.9, 0.8, 0.8, 0.8, 0.1), 0.4) ==
      Seq((5L, 2L, 0.8, 4L, 0.8)))
    // rate 1.0: threshold is the minimum, everything keeps
    assert(cal(Seq(0.5, 0.2, 0.9), 1.0) == Seq((3L, 3L, 0.2, 3L, 1.0)))
    // tiny rate floors k at 1 (the top row)
    assert(cal(Seq(0.5, 0.2, 0.9), 0.01) == Seq((3L, 1L, 0.9, 1L, 1.0 / 3)))
    // empty input: no distribution to calibrate against -> empty result
    assert(cal(Seq.empty, 0.5).isEmpty)
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
