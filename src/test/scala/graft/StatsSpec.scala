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

  test("robustOutlierStats: MAD fence flags the planted garbage, mean-dragging resistant") {
    // group "s": 9 well-behaved lengths around 100 plus one 10_000-char
    // megadoc. A mean/stddev fence at 3 sigma would let the megadoc drag
    // sigma to ~3000 and flag nothing; the MAD fence flags exactly it.
    val wellBehaved = Seq(96.0, 98.0, 99.0, 100.0, 100.0, 101.0, 102.0, 104.0, 110.0)
    val df = (wellBehaved :+ 10000.0).zipWithIndex
      .map { case (v, i) => ("s", v, i.toLong) }.toDF("g", "v", "id")
    val got = Stats.robustOutlierStats(df, Seq("g"), "v", "id", nMads = 3.0)
      .as[(String, Long, Double, Double, Long, Boolean)].collect().toSeq
    // median of 10 sorted values = mean of the 5th/6th (100, 101) =
    // 100.5; devs sorted = {.5,.5,.5,1.5,1.5,2.5,3.5,4.5,9.5,9899.5} ->
    // MAD = (1.5+2.5)/2 = 2; fence = 6 -> the 110 (dev 9.5) and the
    // megadoc (dev 9899.5) are out; mad > 0 -> the alarm is real
    assert(got == Seq(("s", 10L, 100.5, 2.0, 2L, true)), got.toString)
    // sanity: the classical 3-sigma fence really does miss the megadoc's
    // companions — stddev here is ~2970, so only the megadoc exceeds it,
    // and shrinking it to 9000 hides even that from 3-sigma while the
    // MAD fence still fires
    val shrunk = (wellBehaved :+ 9000.0).zipWithIndex
      .map { case (v, i) => ("s", v, i.toLong) }.toDF("g", "v", "id")
    val stats = shrunk.agg(avg($"v"), stddev_pop($"v")).as[(Double, Double)].head()
    assert(9000.0 - stats._1 < 3 * stats._2, "fixture: 3-sigma must miss the planted doc")
    val robust = Stats.robustOutlierStats(shrunk, Seq("g"), "v", "id", nMads = 3.0)
      .as[(String, Long, Double, Double, Long, Boolean)].head()
    assert(robust._5 >= 1L, s"MAD fence must still flag the planted doc: $robust")
    // degenerate spread: constant group -> mad 0, nothing differs, 0 out,
    // and spread_signal says the fence carries no information
    val const = Seq.fill(5)(7.0).zipWithIndex.map { case (v, i) => ("c", v, i.toLong) }
      .toDF("g", "v", "id")
    assert(Stats.robustOutlierStats(const, Seq("g"), "v", "id")
      .as[(String, Long, Double, Double, Long, Boolean)].head() ==
      ("c", 5L, 7.0, 0.0, 0L, false))
    // the degenerate case the column exists for: over half the group at
    // one value -> mad 0 -> every differing row reads as an "outlier";
    // spread_signal=false is the machine-readable "do not page on this"
    val discrete = (Seq.fill(6)(1.0) ++ Seq(2.0, 3.0, 4.0)).zipWithIndex
      .map { case (v, i) => ("d", v, i.toLong) }.toDF("g", "v", "id")
    val deg = Stats.robustOutlierStats(discrete, Seq("g"), "v", "id")
      .as[(String, Long, Double, Double, Long, Boolean)].head()
    assert(deg == (("d", 9L, 1.0, 0.0, 3L, false)),
      s"mad=0 group must flag its vacuous fence: $deg")
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

  test("thresholdForKeepRateSampled: keep rate within the binomial bound of target; exact on k >= n") {
    import graft.operators.Sketches
    // 10k docs, scores a deterministic pseudo-uniform scramble of rank
    val df = spark.range(0, 10000)
      .select(col("id"), (pmod(col("id") * 2654435761L, lit(10000L)) / 10000.0).as("s"))
    val sample = Sketches.bottomKSample(
      df.select(col("id"), col("s"), lit("all").as("g")), "id", "s", Seq("g"), k = 64)
    val got = Stats.thresholdForKeepRateSampled(df, sample, "s", "id", targetRate = 0.7)
      .as[(Long, Long, Long, Double, Long, Double)].head()
    val (nDocs, sampleN, _, thr, _, actualRate) = got
    assert(nDocs == 10000L && sampleN == 64L, got.toString)
    // documented tolerance: |actual - target| <= 2 * sqrt(q(1-q)/k)
    // (the binomial quantile-sampling 2-sigma bound; ~0.115 at k=64)
    val bound = 2 * math.sqrt(0.7 * 0.3 / 64)
    assert(math.abs(actualRate - 0.7) <= bound,
      s"sampled keep rate $actualRate outside the 2-sigma bound $bound of 0.7")
    // rank error vs the exact single-reducer calibration: same bound,
    // measured in rows (the error the sample trades the global sort for)
    val exact = Stats.thresholdForKeepRate(df, "s", "id", targetRate = 0.7)
      .as[(Long, Long, Double, Long, Double)].head()
    val rankErr = math.abs(
      df.filter(col("s") >= thr).count() - exact._4).toDouble
    assert(rankErr <= bound * nDocs,
      s"sampled threshold rank error $rankErr exceeds ${bound * nDocs}")
    // a sample covering the population degenerates to the exact result
    val full = Sketches.bottomKSample(
      df.select(col("id"), col("s"), lit("all").as("g")), "id", "s", Seq("g"),
      k = 10000)
    val gotFull = Stats.thresholdForKeepRateSampled(df, full, "s", "id", 0.7)
      .as[(Long, Long, Long, Double, Long, Double)].head()
    assert(gotFull._4 == exact._3 && gotFull._5 == exact._4,
      s"full-coverage sample must equal exact: $gotFull vs $exact")
    // empty sample: no distribution to calibrate against
    assert(Stats.thresholdForKeepRateSampled(df, sample.limit(0), "s", "id", 0.7)
      .isEmpty)
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
