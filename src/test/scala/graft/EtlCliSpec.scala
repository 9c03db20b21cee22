package graft

import graft.tools.EtlCli
import java.nio.file.Files

/** Drives the full reference ETL lifecycle end-to-end: init -> ingest ->
  * re-ingest (idempotence) -> quality -> stats, over a parquet warehouse.
  */
class EtlCliSpec extends SparkSpec {

  // newline-delimited JSON: one comic document per line
  private val rawJson = Seq(
    """{"id": 1, "title": "Amazing Tales #1", "issueNumber": "1",
        "dates": [{"type": "onsaleDate", "date": "2010-01-06T00:00:00-0500"}],
        "prices": [{"type": "printPrice", "price": 3.99}],
        "creators": {"items": [{"name": "Stan Writer", "role": "writer"},
                               {"name": "Jack Artist", "role": "penciller"}]},
        "thumbnail": {"path": "p", "extension": "jpg"}, "variantDescription": ""}""",
    """{"id": 2, "title": "Amazing Tales #2", "issueNumber": "2",
        "dates": [], "prices": [{"type": "printPrice", "price": 3.99}],
        "creators": {"items": [{"name": "Stan Writer", "role": "writer"}]},
        "thumbnail": {"path": "p", "extension": "jpg"}, "variantDescription": ""}"""
  ).map(_.replaceAll("\n\\s+", " ")).mkString("\n") +
    "\n{this is not valid json at all"  // F7: malformed line -> quarantine

  test("init -> ingest -> re-ingest is idempotent; quality and stats read back") {
    val dir = Files.createTempDirectory("etlcli").toFile.getAbsolutePath
    val wh = s"$dir/wh"
    val raw = s"$dir/raw.json"
    Files.writeString(java.nio.file.Paths.get(raw), rawJson)

    EtlCli.init(spark, wh)
    val run1 = EtlCli.ingest(spark, wh, raw)
    assert(run1.status == "SUCCESS" && run1.records_read == 2)
    assert(spark.read.parquet(s"$wh/quarantine").count() == 1) // malformed line
    assert(EtlCli.readTable(spark, s"$wh/issue").count() == 2)
    assert(EtlCli.readTable(spark, s"$wh/creator").count() == 2)
    assert(EtlCli.readTable(spark, s"$wh/issue_creator").count() == 3)

    // idempotence: same batch again changes nothing
    EtlCli.ingest(spark, wh, raw)
    assert(EtlCli.readTable(spark, s"$wh/issue").count() == 2)
    assert(EtlCli.readTable(spark, s"$wh/creator").count() == 2)
    assert(EtlCli.readTable(spark, s"$wh/issue_creator").count() == 3)
    assert(spark.read.parquet(s"$wh/etl_run").count() == 2)

    val q = EtlCli.quality(spark, wh).collect().head
    assert(q.getAs[Long]("issues_null_onsale_date") == 1) // issue 2 has no date
    assert(q.getAs[Long]("orphan_credit_rows") == 0)

    val top = EtlCli.stats(spark, wh, 5).collect()
    assert(top.head.getString(0) == "Amazing Tales #1")
    assert(top.head.getLong(1) == 2)

    // superseded versions are pruned: one data dir + one marker per table
    val issueDir = new java.io.File(s"$wh/issue")
    assert(issueDir.list().count(_.startsWith("data_v")) == 1)
    assert(issueDir.list().count(_.startsWith("_committed_v")) == 1)
  }

  test("compact rewrites many small files into few, contents unchanged") {
    import spark.implicits._
    val wh = Files.createTempDirectory("etlcompact").toFile.getAbsolutePath
    val path = s"$wh/t"
    // simulate small-batch accretion: 64 files for a few thousand rows
    EtlCli.writeTable((1 to 5000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(64), path)
    val before = EtlCli.readTable(spark, path)
    assert(before.inputFiles.length == 64)
    val want = before.orderBy("k").as[(Long, String)].collect().toSeq

    EtlCli.compact(spark, path)
    val after = EtlCli.readTable(spark, path)
    assert(after.inputFiles.length <= 2, s"still ${after.inputFiles.length} files")
    assert(after.orderBy("k").as[(Long, String)].collect().toSeq == want)
  }

  test("crash between stage and commit leaves the old table intact") {
    import spark.implicits._
    val wh = Files.createTempDirectory("etlcrash").toFile.getAbsolutePath
    val path = s"$wh/t"
    EtlCli.writeTable(Seq((1L, "old")).toDF("k", "v"), path)

    // simulated crash: the next version's data lands fully, but the process
    // dies before the commit marker — readers must still see the old table
    EtlCli.stage(Seq((2L, "new")).toDF("k", "v"), path)
    val survived = EtlCli.readTable(spark, path).as[(Long, String)].collect()
    assert(survived.toSeq == Seq((1L, "old")))

    // the next successful writeBack commits v3 and prunes the abandoned v2
    EtlCli.writeTable(Seq((3L, "next")).toDF("k", "v"), path)
    assert(EtlCli.readTable(spark, path).as[(Long, String)].collect().toSeq
      == Seq((3L, "next")))
    val names = new java.io.File(path).list().toSeq
    assert(names.count(_.startsWith("data_v")) == 1)
    assert(names.count(_.startsWith("_committed_v")) == 1)
  }
}
