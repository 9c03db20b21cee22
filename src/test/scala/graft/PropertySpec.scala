package graft

import graft.functions.Fns
import graft.operators.{Relational, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style laws (SURVEY.md §5.3) over ScalaCheck-generated inputs,
  * evaluated in single batched Spark jobs: money round-trip, merge
  * idempotence, dedup stability, simhash order-invariance.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[Seq[A]]): Seq[A] =
    g.apply(Gen.Parameters.default, Seed(42L)).get

  test("cents/priceDisplay round-trip: parse(display(c)) == c for c >= 0") {
    val cents = sample(Gen.listOfN(300, Gen.chooseNum(0L, 999999999L)))
    val back = cents.toDF("c")
      .select(col("c"), Fns.priceDisplay(col("c")).as("s"))
      .withColumn("back",
        (regexp_extract(col("s"), "^\\$(\\d+)\\.(\\d{2})$", 1).cast("long") * 100 +
         regexp_extract(col("s"), "^\\$(\\d+)\\.(\\d{2})$", 2).cast("long")))
      .filter(col("back") =!= col("c")).count()
    assert(back == 0L)
  }

  test("money rendering law: priceDisplay == native format_money for any sign") {
    val cents = sample(Gen.listOfN(400, Gen.chooseNum(-999999999L, 999999999L)))
    val mismatches = (cents ++ Seq(0L, -1L, -99L, -100L, -250L, 99L)).toDF("c")
      .select(Fns.priceDisplay(col("c")).as("composed"),
              graft.plans.GraftFunctions.format_money(col("c")).as("native"))
      .filter(col("composed") =!= col("native")).count()
    assert(mismatches == 0L)
    // sign-prefix form spot checks
    val got = Seq(-250L, -5L, 305L).toDF("c")
      .select(Fns.priceDisplay(col("c")).as("s")).as[String].collect()
    assert(got.toSeq == Seq("-$2.50", "-$0.05", "$3.05"))
  }

  test("upsert idempotence: merge(merge(T,B),B) == merge(T,B) on random batches") {
    val keys = sample(Gen.listOfN(120, Gen.chooseNum(0L, 60L)))
    val target = keys.zipWithIndex.map { case (k, i) => (k, s"t$i", i.toDouble) }
      .toDF("k", "v", "p").dropDuplicates("k")
    val incoming = sample(Gen.listOfN(80, Gen.chooseNum(20L, 90L))).zipWithIndex
      .map { case (k, i) => (k, s"i$i", i.toDouble, i) }
      .toDF("k", "v", "p", "src")
    val once = Relational.upsert(target, incoming, Seq("k"), Seq("v", "p"), Seq(col("src")))
    val twice = Relational.upsert(once, incoming, Seq("k"), Seq("v", "p"), Seq(col("src")))
    assert(once.orderBy("k", "v").collect().toSeq == twice.orderBy("k", "v").collect().toSeq)
  }

  test("firstWins is a projection: applying it twice changes nothing") {
    val rows = sample(Gen.listOfN(200,
      Gen.zip(Gen.chooseNum(0, 40), Gen.alphaLowerStr.map(_.take(5)), Gen.chooseNum(0, 9))))
    val df = rows.toDF("k", "v", "ord")
    val once = Relational.firstWins(df, Seq("k"), Seq(col("ord"), col("v")))
    val twice = Relational.firstWins(once, Seq("k"), Seq(col("ord"), col("v")))
    assert(once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq)
  }

  test("cappedDistinct law: equals exact distinct under the cap, null over it") {
    val rows = sample(Gen.listOfN(3000,
      Gen.zip(Gen.chooseNum(0, 50), Gen.chooseNum(0L, 12L))))
    val df = rows.toDF("g", "v").repartition(7)   // exercise partial/merge paths
    val got = df.groupBy("g")
      .agg(graft.functions.CappedSetAgg.cappedDistinct(col("v"), 6).as("s"))
      .as[(Int, Option[Seq[Long]])].collect().toMap
    val exact = rows.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted.toSeq).toMap
    exact.foreach { case (g, vs) =>
      if (vs.size <= 6) assert(got(g) == Some(vs), s"group $g")
      else assert(got(g).isEmpty, s"group $g should overflow (${vs.size} distinct)")
    }
  }

  test("simhash64 is token-order invariant (bag-of-words semantics)") {
    val docs = sample(Gen.listOfN(40, Gen.listOfN(12,
      Gen.oneOf("spark", "query", "join", "scan", "the", "a", "merge", "sort"))))
    val forward  = docs.map(_.mkString(" ")).zipWithIndex.map(_.swap)
    val shuffled = docs.map(ws => scala.util.Random.javaRandomToRandom(
      new java.util.Random(7)).shuffle(ws).mkString(" ")).zipWithIndex.map(_.swap)
    def sigs(rows: Seq[(Int, String)]) = rows.toDF("id", "text")
      .select(col("id"), TextAnalysis.simhash64(col("text")).as("sig"))
      .as[(Int, Long)].collect().toMap
    assert(sigs(forward) == sigs(shuffled))
  }
}
