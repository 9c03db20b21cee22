package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Golden-output tests over a comics-catalog fixture mirroring the
  * reference's live DB SHAPE (FIXTURES.md §A: 2 publishers, null-heavy
  * dates, an orphan issue, dirty CSV-derived series) — the reference's own
  * `stats` and `quality` commands with pinned outputs.
  */
class GoldenCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def publishers = Seq((1, "Marvel"), (2, "publisher")).toDF("publisher_id", "name")

  private def series = Seq(
    (1, "Amazing Tales", 1), (2, "Spider Saga", 1),
    (3, "Amaziseries", 2),   // the reference's corrupted CSV-derived row
    (4, "Cosmic Quests", 1)
  ).toDF("series_id", "title", "publisher_id")

  // (issue_id, series_id, issue_number TEXT, cover_date nullable, price_cents)
  private def issues = Seq(
    (1, 1, "1", Some("2010-01-06"), Some(399L)),
    (2, 1, "2", Some("2010-02-03"), Some(399L)),
    (3, 1, "10", None, Some(499L)),          // null cover_date; "10" sorts before "9"
    (4, 1, "9", Some("2010-09-01"), None),
    (5, 2, "1", Some("2011-01-01"), Some(299L)),
    (6, 2, "1.1", Some("2011-01-15"), Some(299L)),  // variant-style number
    (7, 99, "1", None, Some(100L))           // orphan: series 99 doesn't exist
  ).toDF("issue_id", "series_id", "issue_number", "cover_date", "price_cents")
    .withColumn("cover_date", to_date(col("cover_date")))

  test("stats: top series by issue count (the reference's flagship query)") {
    val joined = issues.join(broadcast(series), "series_id")
    val got = Relational.topKByCount(joined, col("title"), 3, "issue_count")
      .as[(String, Long)].collect()
    assert(got.toSeq == Seq(("Amazing Tales", 4L), ("Spider Saga", 2L)))
  }

  test("quality: null cover_date count and orphan issues") {
    assert(issues.filter(col("cover_date").isNull).count() == 2)
    val orphans = Relational.orphans(issues, series, "series_id", "series_id")
    assert(orphans.select("issue_id").as[Int].collect().toSeq == Seq(7))
  }

  test("O2: issue_number is TEXT — lexicographic order puts '10' before '9'") {
    val nums = issues.filter(col("series_id") === 1)
      .orderBy(col("issue_number")).select("issue_number").as[String].collect()
    assert(nums.toSeq == Seq("1", "10", "2", "9"))
    // the documented numeric-aware alternative
    val numeric = issues.filter(col("series_id") === 1)
      .orderBy(col("issue_number").cast("double"), col("issue_number"))
      .select("issue_number").as[String].collect()
    assert(numeric.toSeq == Seq("1", "2", "9", "10"))
  }

  test("upsert by (series_id, issue_number) updates mutable fields only") {
    val incoming = Seq(
      (101, 1, "2", Some("2010-02-10"), Some(449L)),  // update issue 2
      (102, 2, "3", Some("2011-03-01"), Some(299L))   // new issue
    ).toDF("issue_id", "series_id", "issue_number", "cover_date", "price_cents")
      .withColumn("cover_date", to_date(col("cover_date")))
    val merged = Relational.upsert(issues, incoming,
      keys = Seq("series_id", "issue_number"),
      mutableCols = Seq("cover_date", "price_cents"),
      incomingOrder = Seq(col("issue_id")))
    assert(merged.count() == 8)
    val updated = merged.filter(col("series_id") === 1 && col("issue_number") === "2").head()
    assert(updated.getAs[Int]("issue_id") == 2)            // key/immutables kept
    assert(updated.getAs[Long]("price_cents") == 449L)     // mutable updated
    // null-coalescing D4 semantics: incoming null never clobbers
    val nullIncoming = Seq((103, 1, "1", Option.empty[String], Option.empty[Long]))
      .toDF("issue_id", "series_id", "issue_number", "cover_date", "price_cents")
      .withColumn("cover_date", to_date(col("cover_date")))
    val merged2 = Relational.upsert(issues, nullIncoming,
      Seq("series_id", "issue_number"), Seq("cover_date", "price_cents"),
      Seq(col("issue_id")))
    val kept = merged2.filter(col("series_id") === 1 && col("issue_number") === "1").head()
    assert(kept.getAs[Long]("price_cents") == 399L)
  }
}
