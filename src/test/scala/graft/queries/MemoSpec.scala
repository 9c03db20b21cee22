package graft.queries

import org.apache.spark.sql.functions._

/** In package graft.queries to reach the private[queries] artifact memo. */
class MemoSpec extends graft.SparkSpec {

  test("artifact memo: path is cached per (name, dir); a reused name with a different layout refuses") {
    val df = spark.range(10).selectExpr("id", "id % 2 AS cell")
    val p1 = Memo.parquetArtifactPath(spark, "/tmp/memo_spec_dir",
      "memo_spec_art", Seq("cell"))(df)
    // same name + same layout: the cached path, no rebuild (the build
    // expression here would fail loudly if re-evaluated)
    val p2 = Memo.parquetArtifactPath(spark, "/tmp/memo_spec_dir",
      "memo_spec_art", Seq("cell"))(sys.error("memo must not rebuild"))
    assert(p1 == p2)
    assert(spark.read.parquet(p1).count() == 10)
    // a second call site reusing the NAME with a different partitionBy
    // would silently read the first layout — defeating the partition
    // pruning it asked for — so the mismatch must fail loudly
    val ex = intercept[IllegalArgumentException] {
      Memo.parquetArtifactPath(spark, "/tmp/memo_spec_dir",
        "memo_spec_art")(df)
    }
    assert(ex.getMessage.contains("layout"), ex.getMessage)
    // distinct artifact names per layout: both coexist
    val p3 = Memo.parquetArtifactPath(spark, "/tmp/memo_spec_dir",
      "memo_spec_art_flat")(df.select(col("id")))
    assert(p3 != p1 && spark.read.parquet(p3).count() == 10)
  }
}
