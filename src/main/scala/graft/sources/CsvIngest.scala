package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV seed ingestion with a quarantine path (SURVEY.md §2.2 F7, §2.1
  * S6/S13). The reference's seed CSV ships real defects — a corrupted
  * mid-file header row and unquoted commas that shift columns
  * (SURVEY.md appendix) — which it loaded into the DB as garbage rows; we
  * split them into a quarantine side-output with a reason column instead.
  */
object CsvIngest {

  final case class Ingested(good: DataFrame, quarantine: DataFrame)

  /** Read a header CSV; rows failing structural validation are diverted to
    * `quarantine` with a `reason`. `requiredCols` must be non-blank;
    * rows whose parse collapsed (corrupt record, wrong column count) are
    * caught by Spark's PERMISSIVE corrupt-record column.
    */
  def readWithQuarantine(spark: SparkSession, path: String,
                         requiredCols: Seq[String]): Ingested = {
    val raw = spark.read
      .option("header", true)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)
      .withColumn("_corrupt",
        if (columnExists(spark, path)) col("_corrupt") else lit(null).cast("string"))

    val reason =
      when(col("_corrupt").isNotNull, lit("malformed_row"))
        .otherwise(requiredCols.map { c =>
          when(col(c).isNull || trim(col(c)) === "", lit(s"missing_$c"))
            .otherwise(lit(null).cast("string"))
        }.reduce((a, b) => coalesce(a, b)))

    val flagged = raw.withColumn("reason", reason)
    Ingested(
      good = flagged.filter(col("reason").isNull).drop("reason", "_corrupt"),
      quarantine = flagged.filter(col("reason").isNotNull).drop("_corrupt"))
  }

  // PERMISSIVE mode only materializes _corrupt when the schema declares it;
  // with inferred schemas Spark drops it unless present — probe cheaply.
  private def columnExists(spark: SparkSession, path: String): Boolean = {
    val cols = spark.read.option("header", true)
      .option("columnNameOfCorruptRecord", "_corrupt").csv(path).columns
    cols.contains("_corrupt")
  }

  /** S13 missing/failed-row report sink: one header CSV with reasons
    * (cv_fetch_covers.py:204-207 writes missing_covers.csv). */
  def writeReport(quarantine: DataFrame, path: String): Unit =
    quarantine.coalesce(1).write.mode("overwrite").option("header", true).csv(path)
}
