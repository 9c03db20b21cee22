package graft

import graft.plans.TopKPerKey
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def data = (1 to 2000).map { i =>
    (i % 7L, i.toLong, (i * 37 % 1000).toDouble)
  }.toDF("k", "id", "score").repartition(8)

  test("bounded top-k per key matches the window formulation") {
    val got = TopKPerKey.topK(data, Seq("k"), Seq("score" -> false, "id" -> true), 5)
      .select("k", "id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    val want = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("k").orderBy(desc("score"), col("id"))
      data.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select("k", "id", "score").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    }
    assert(got.toSeq == want.toSeq)
  }

  test("plan uses TopKPerKeyExec partial+final and no Window/full Sort") {
    val df = TopKPerKey.topK(data, Seq("k"), Seq("score" -> false, "id" -> true), 3)
    // SparkPlan.nodeName strips the Exec suffix: the operator renders as
    // "TopKPerKey <k>, [keys], [order], <partial>"
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerKey \\d".r.findAllIn(plan).size == 2, s"plan:\n$plan")
    assert(!plan.contains("Window"), s"plan:\n$plan")
    assert(!plan.contains("Sort "), s"plan:\n$plan")
    assert(df.count() == 7 * 3)
  }

  test("keys with fewer than k rows keep all their rows") {
    val small = Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (2L, 3L, 3.0)).toDF("k", "id", "score")
    val got = TopKPerKey.topK(small, Seq("k"), Seq("score" -> false), 5).count()
    assert(got == 3)
  }
}
