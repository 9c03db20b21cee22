package graft.domain

import java.sql.Date

/** Typed domain model of the reference's catalog schema (SURVEY.md §1.2,
  * `etl/models.py` / `sql/schema.sql`) — `Dataset[T]` encoders for the
  * load path where compile-time field checks help; the dynamic query
  * surface stays DataFrame-based.
  */
final case class Publisher(publisher_id: Int, name: String)

final case class Series(
    series_id: Long, title: String, publisher_id: Option[Int],
    start_year: Option[Int], volume: Option[Int],
    source_key: Option[String], source_system: Option[String])

final case class Issue(
    issue_id: Long, series_id: Long, issue_number: String,
    title: Option[String], release_date: Option[Date],
    price_cents: Option[Long], isbn: Option[String], upc: Option[String],
    description: Option[String], cover_url: Option[String],
    marvel_series_id: Option[Long], marvel_comic_id: Option[Long],
    onsale_date: Option[Date], is_variant: Boolean,
    variant_name: Option[String], issue_order: Option[Int])

final case class Creator(creator_id: Long, name: String)

final case class IssueCreator(issue_id: Long, creator_id: Long, role: String)
