package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def tokDf(words: Seq[String]) = words.toDF("t")

  test("CMS never under-estimates and is exact without collisions") {
    val words = Seq.fill(7)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val toks = tokDf(words)
    val sketch = Sketches.cmsSketch(toks, "t", depth = 4, width = 64)
    val probes = tokDf(Seq("alpha", "beta", "gamma", "absent"))
    val est = Sketches.cmsEstimate(sketch, probes, "t", depth = 4, width = 64)
      .as[(String, Long)].collect().toMap
    val truth = Map("alpha" -> 7L, "beta" -> 3L, "gamma" -> 1L, "absent" -> 0L)
    truth.foreach { case (tok, n) =>
      assert(est(tok) >= n, s"CMS under-estimated $tok: ${est(tok)} < $n")
    }
    // 3 distinct tokens in 4x64 cells: some row almost surely separates
    // them, so the min over rows is exact here
    assert(est("alpha") == 7L && est("beta") == 3L)
  }

  test("CMS sketches merge by cell-wise summation") {
    val a = tokDf(Seq("x", "x", "y"))
    val b = tokDf(Seq("x", "z", "z", "z"))
    def cells(df: org.apache.spark.sql.DataFrame) =
      Sketches.cmsSketch(df, "t", depth = 4, width = 64)
    val merged = cells(a).unionByName(cells(b))
      .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    val whole = cells(a.unionByName(b)).as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("CMS heavy hitters: no true hitter at the threshold is ever missed; est >= true") {
    import graft.operators.Sketches
    // skewed corpus: token h1 = 30%, h2 = 10%, 60% spread over 120 cold tokens
    val rows = (1 to 300).map(_ => "h1") ++ (1 to 100).map(_ => "h2") ++
      (1 to 600).map(i => s"cold${i % 120}")
    val toks = rows.toDF("t")
    val phi = 0.05
    val k = 10
    val hh = Sketches.cmsHeavyHitters(toks, "t", depth = 4, width = 64, phi, k)
      .as[(String, Long, Long)].collect()
    // est >= true on every returned row (CMS one-sided error)
    assert(hh.forall { case (_, est, tru) => est >= tru })
    // completeness: every token with true count >= phi * total is present
    // (est >= true makes missing one impossible unless k truncates it —
    // pick k above the true-hitter count)
    val total = rows.size.toDouble
    val truth = rows.groupBy(identity).view.mapValues(_.size)
      .filter(_._2 >= phi * total).keySet
    assert(truth.subsetOf(hh.map(_._1).toSet),
      s"missed true heavy hitters: ${truth -- hh.map(_._1).toSet}")
  }
}
