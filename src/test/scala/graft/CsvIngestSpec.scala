package graft

import graft.sources.CsvIngest
import java.nio.file.Files

class CsvIngestSpec extends SparkSpec {

  // Mirrors the reference seed CSV's real defects (SURVEY.md appendix):
  // a corrupted mid-file header row and a row with a blank required field.
  private val fixture =
    """series,publisher,issue_number,issue_title,cover_path,notes
      |Amazing Tales,Marvel,1,First Issue,covers/a1.jpg,
      |Amaziseries,publisher,issue_number,issue_title,cover_path,notes
      |Amazing Tales,Marvel,,Missing Number,covers/a2.jpg,
      |Spider Saga,Marvel,2,Second Issue,covers/s2.jpg,note ok
      |""".stripMargin

  test("readWithQuarantine splits valid rows from defective ones") {
    val dir = Files.createTempDirectory("csv_ingest").toFile
    val f = new java.io.File(dir, "seed.csv")
    Files.writeString(f.toPath, fixture)

    val got = CsvIngest.readWithQuarantine(spark, f.getAbsolutePath,
      requiredCols = Seq("series", "issue_number"))
    val good = got.good.collect()
    val quarantined = got.quarantine.collect()

    // 3 structurally-valid rows: the corrupted mid-file header row has all
    // fields non-blank so it passes the structural gate (the second test
    // shows the value-level rule that catches it).
    assert(good.length == 3)
    assert(good.map(_.getAs[String]("series")).toSet ==
      Set("Amazing Tales", "Spider Saga", "Amaziseries"))
    val reasons = quarantined.map(_.getAs[String]("reason"))
    assert(reasons.contains("missing_issue_number"))
    assert(quarantined.length == 1)

    val reportDir = new java.io.File(dir, "report")
    CsvIngest.writeReport(got.quarantine, reportDir.getAbsolutePath)
    val written = spark.read.option("header", true).csv(reportDir.getAbsolutePath)
    assert(written.count() == quarantined.length)
  }

  test("repeated header rows can be filtered as value-echo defects") {
    val dir = Files.createTempDirectory("csv_ingest2").toFile
    val f = new java.io.File(dir, "seed.csv")
    Files.writeString(f.toPath, fixture)
    val got = CsvIngest.readWithQuarantine(spark, f.getAbsolutePath,
      requiredCols = Seq("series", "issue_number"))
    // the "Amaziseries,publisher,..." corrupted header: its publisher cell
    // echoes the column name — catchable by a value-level rule
    import org.apache.spark.sql.functions._
    val echo = got.good.filter(col("publisher") === "publisher").count()
    assert(echo == 1)
  }
}
