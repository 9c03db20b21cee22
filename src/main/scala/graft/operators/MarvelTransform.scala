package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Transform layer for raw comic-API JSON documents (the reference's
  * extract->transform path, re-expressed as narrow column expressions over
  * a DataFrame of nested documents — "raw JSON landing zone -> staged
  * Parquet" instead of per-row Python dicts).
  *
  * Expected input schema (FIXTURES.md "Marvel comic JSON"):
  *   id LONG, title STRING, issueNumber STRING|DOUBLE, description STRING,
  *   dates ARRAY<STRUCT<type STRING, date STRING>>,
  *   prices ARRAY<STRUCT<type STRING, price DOUBLE>>,
  *   creators STRUCT<items ARRAY<STRUCT<name STRING, role STRING>>>,
  *   thumbnail STRUCT<path STRING, extension STRING>,
  *   variantDescription STRING, isbn STRING, upc STRING.
  */
object MarvelTransform {

  /** X1 `normalize_issue_number` (starter:etl/transform.py:4-12): any type
    * -> trimmed string, null-safe; preserves "1.1"-style variants. A
    * numeric 1.0 renders as "1" (strip trailing ".0") to match the
    * reference's str() of an int-valued field. */
  def normalizeIssueNumber(c: Column): Column =
    when(c.isNull, lit(null).cast(StringType))
      .otherwise(regexp_replace(trim(c.cast(StringType)), "\\.0$", ""))

  /** X4 `parse_marvel_date` (etl/seed/seed_from_marvel.py:193-204): pick
    * the entry of the requested type from dates[], tolerate the non-ISO
    * offset format by taking the leading date part. */
  def parseMarvelDate(dates: Column, dateType: String): Column = {
    val entry = try_element_at(filter(dates, d => d.getField("type") === dateType), lit(1))
    to_date(substring(entry.getField("date"), 1, 10), "yyyy-MM-dd")
  }

  /** X2-shaped price pick: printPrice (dollars) -> integer cents. */
  def printPriceCents(prices: Column): Column = {
    val entry = try_element_at(filter(prices, p => p.getField("type") === "printPrice"), lit(1))
    graft.functions.Fns.cents(entry.getField("price"))
  }

  /** X6 `normalize_thumb` (etl/seed/seed_from_marvel.py:181-190):
    * thumbnail{path, extension} -> portrait_uncanny URL; null when missing
    * or a placeholder image. */
  def normalizeThumb(thumbnail: Column): Column = {
    val path = thumbnail.getField("path")
    val ext  = thumbnail.getField("extension")
    when(path.isNull || ext.isNull || path.contains("image_not_available"),
      lit(null).cast(StringType))
      .otherwise(concat(path, lit("/portrait_uncanny."), ext))
  }

  /** X7 variant heuristic (etl/seed/seed_from_marvel.py:266-269). */
  def isVariant(title: Column, variantDescription: Column): Column =
    lower(concat_ws(" ", coalesce(title, lit("")),
      coalesce(variantDescription, lit("")))).contains("variant")

  /** P1 field-whitelist projection (starter:etl/transform.py:31-40): raw
    * comic document -> fixed issue row. Everything not selected is
    * dropped; optional payload fields absent from a landed batch's
    * inferred schema surface as nulls (API payloads omit empty fields).
    */
  def flattenComics(raw: DataFrame): DataFrame = {
    val present = raw.columns.toSet
    def opt(name: String): Column =
      if (present.contains(name)) col(name) else lit(null).cast(StringType)
    raw.select(
      col("id").as("marvel_comic_id"),
      col("title"),
      normalizeIssueNumber(col("issueNumber")).as("issue_number"),
      parseMarvelDate(col("dates"), "onsaleDate").as("onsale_date"),
      printPriceCents(col("prices")).as("price_cents"),
      opt("isbn").as("isbn"),
      opt("upc").as("upc"),
      opt("description").as("description"),
      normalizeThumb(col("thumbnail")).as("cover_url"),
      isVariant(col("title"), opt("variantDescription")).as("is_variant"))
  }

  /** X12 creator explosion (starter:etl/transform.py:41-46): one comic ->
    * N (comic, creator, role) credit rows, names case/space-normalized
    * (X9). Generator-based: no shuffle. */
  def explodeCreators(raw: DataFrame): DataFrame =
    raw.select(col("id").as("marvel_comic_id"),
        explode(col("creators.items")).as("c"))
      .select(col("marvel_comic_id"),
        trim(col("c.name")).as("creator_name"),
        lower(trim(col("c.role"))).as("role"))
      .filter(col("creator_name").isNotNull && length(col("creator_name")) > 0)

  /** W1 `issue_order` (etl/seed/seed_from_marvel.py:243-245): stable
    * 1-based position of each issue within its series in onsale order —
    * the reference's mutable counter becomes a window, deterministic under
    * parallelism via the comic-id tie-break. */
  def withIssueOrder(issues: DataFrame, seriesCol: String = "marvel_series_id"): DataFrame = {
    val w = Window.partitionBy(col(seriesCol))
      .orderBy(col("onsale_date").asc_nulls_last, col("marvel_comic_id"))
    issues.withColumn("issue_order", row_number().over(w))
  }
}
