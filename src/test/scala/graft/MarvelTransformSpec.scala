package graft

import graft.operators.MarvelTransform
import org.apache.spark.sql.functions._

class MarvelTransformSpec extends SparkSpec {
  import spark.implicits._

  // Canned raw comic documents mirroring the Marvel payload shape
  // (FIXTURES.md), including the dirty cases: non-ISO offset date,
  // image_not_available thumbnail, numeric issueNumber, variant title.
  private val rawJson = Seq(
    """{"id": 1001, "title": "Amazing Tales (2010) #1", "issueNumber": 1.0,
        "description": "first", "isbn": "978-1", "upc": "7598",
        "dates": [{"type": "onsaleDate", "date": "2010-01-06T00:00:00-0500"},
                  {"type": "focDate", "date": "2009-12-21T00:00:00-0500"}],
        "prices": [{"type": "printPrice", "price": 3.99}],
        "creators": {"items": [{"name": " Stan Writer ", "role": "Writer"},
                               {"name": "Jack Artist", "role": "Penciller"}]},
        "thumbnail": {"path": "http://img.example/a1", "extension": "jpg"},
        "variantDescription": ""}""",
    """{"id": 1002, "title": "Amazing Tales (2010) #1.1 Variant", "issueNumber": "1.1",
        "description": null, "isbn": null, "upc": null,
        "dates": [{"type": "onsaleDate", "date": "2010-02-03T00:00:00-0500"}],
        "prices": [{"type": "printPrice", "price": 0.0}],
        "creators": {"items": []},
        "thumbnail": {"path": "http://img.example/image_not_available", "extension": "jpg"},
        "variantDescription": "Second Printing Variant"}"""
  )

  private def raw = spark.read.json(rawJson.toDS())

  test("flattenComics whitelists and normalizes the issue row") {
    val rows = MarvelTransform.flattenComics(raw).orderBy("marvel_comic_id").collect()
    val r1 = rows(0)
    assert(r1.getAs[Long]("marvel_comic_id") == 1001L)
    assert(r1.getAs[String]("issue_number") == "1")      // 1.0 -> "1"
    assert(r1.getAs[java.sql.Date]("onsale_date").toString == "2010-01-06")
    assert(r1.getAs[Long]("price_cents") == 399L)
    assert(r1.getAs[String]("cover_url") == "http://img.example/a1/portrait_uncanny.jpg")
    assert(!r1.getAs[Boolean]("is_variant"))
    val r2 = rows(1)
    assert(r2.getAs[String]("issue_number") == "1.1")    // variant preserved
    assert(r2.getAs[String]("cover_url") == null)         // placeholder -> null
    assert(r2.getAs[Boolean]("is_variant"))
    assert(r2.getAs[Long]("price_cents") == 0L)
  }

  test("explodeCreators yields one normalized credit row per creator") {
    val rows = MarvelTransform.explodeCreators(raw)
      .orderBy("creator_name")
      .as[(Long, String, String)].collect()
    assert(rows.toSeq == Seq(
      (1001L, "Jack Artist", "penciller"),
      (1001L, "Stan Writer", "writer")))
  }

  test("withIssueOrder numbers issues within series by onsale date") {
    val issues = Seq(
      (10L, 1L, java.sql.Date.valueOf("2020-02-01")),
      (11L, 1L, java.sql.Date.valueOf("2020-01-01")),
      (12L, 2L, java.sql.Date.valueOf("2020-03-01"))
    ).toDF("marvel_comic_id", "marvel_series_id", "onsale_date")
    val got = MarvelTransform.withIssueOrder(issues)
      .orderBy("marvel_comic_id")
      .select("marvel_comic_id", "issue_order").as[(Long, Int)].collect()
    assert(got.toSeq == Seq((10L, 2), (11L, 1), (12L, 1)))
  }
}
