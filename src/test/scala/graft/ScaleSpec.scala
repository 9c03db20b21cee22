package graft

import graft.core.Tables.t
import org.apache.spark.sql.functions._

/** Evidence for the 100 TB posture that PlanSpec's per-query assertions
  * don't cover: Spark's runtime bloom-filter injection prunes the big side
  * of a shuffle join before the exchange when the other side carries a
  * selective filter. On a cluster this is the difference between shuffling
  * the full fact table and shuffling only rows that can possibly match.
  */
class ScaleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // Thresholds sized for the test fixture: production defaults (10M-row
    // creation side / 10 GB application side) make this fire only at real
    // fact-table scale, which is exactly the point.
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val li = t(spark, sf, "lineitem")
      val ord = t(spark, sf, "orders").filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy(ord("o_orderpriority")).agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"runtime bloom filter not injected:\n$optimized")
      // and the pruned plan still computes the right answer
      val n = joined.collect().head.getLong(1)
      val expected = li.join(ord, li("l_orderkey") === ord("o_orderkey")).count()
      assert(n == expected)
    }
  }

  test("bucketed fact-fact join is co-located: no exchange, no sort") {
    // Bucketing pre-shuffles at WRITE time: both sides hash-bucketed on the
    // join key join with zero runtime exchanges — at 100 TB this converts
    // the recurring fact-fact shuffle into a one-time layout cost.
    val db = "graft_bucket_spec"
    val loc = java.nio.file.Files.createTempDirectory("bucket_wh").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$loc'")
    try {
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
               "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
        t(spark, sf, "lineitem").write
          .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
          .mode("overwrite").saveAsTable(s"$db.li_b")
        t(spark, sf, "orders").write
          .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
          .mode("overwrite").saveAsTable(s"$db.ord_b")
        val joined = spark.table(s"$db.li_b")
          .join(spark.table(s"$db.ord_b"), col("l_orderkey") === col("o_orderkey"))
        val p = joined.queryExecution.executedPlan.toString
        assert(!p.contains("Exchange hashpartitioning"),
          s"bucketed join still shuffles:\n$p")
        assert(joined.count() ==
          t(spark, sf, "lineitem").join(t(spark, sf, "orders"),
            col("l_orderkey") === col("o_orderkey")).count())
      }
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }
}
