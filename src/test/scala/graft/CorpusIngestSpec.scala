package graft

import graft.operators.CorpusPipeline
import graft.streaming.CorpusIngest
import graft.tools.EtlCli
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Streaming corpus ingestion over two micro-batches: every batch-1 trap
  * (near-dup of seed, exact dup of seed, contaminated, low-quality) is
  * dropped; batch 2 proves the band index accreted (a near-dup of a
  * batch-1 survivor is caught) and that replayed ids are no-ops.
  */
class CorpusIngestSpec extends SparkSpec {
  import spark.implicits._

  private def words(prefix: String): Seq[String] = (1 to 35).map(i => s"$prefix$i")
  private def doc(prefix: String, stop: String = "the"): String =
    (words(prefix) :+ stop).mkString(" ")

  private val seed = doc("seed")
  private val evalDocs = Seq((100L, "prefix secret eval answer key suffix")).toDF("doc_id", "text")
  private val cfg = CorpusPipeline.Config()

  test("two-batch ingest: gates, exact/near dedup vs warehouse, decontaminate, replay") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("corpus_ingest").toString
    val (corpusPath, bandsPath) = (s"$root/docs", s"$root/bands")

    // bootstrap: seed corpus + its band index
    val seedDf = Seq((1L, seed)).toDF("doc_id", "text")
    EtlCli.writeTable(seedDf, corpusPath)
    EtlCli.writeTable(
      graft.operators.Dedup.bandTable(
        graft.operators.Dedup.minhashSignatures(
          graft.operators.Dedup.shingleRows(seedDf, "doc_id", "text", cfg.shingleK),
          cfg.numHashes, cfg.dfCap),
        cfg.numHashes, cfg.bandSize),
      bandsPath)

    val input = MemoryStream[(Long, String)]
    def runBatch(rows: (Long, String)*): Unit = {
      input.addData(rows: _*)
      val q = CorpusIngest.ingest(
        input.toDF().toDF("doc_id", "text"), evalDocs,
        corpusPath, bandsPath, s"$root/ckpt", cfg = cfg)
      q.awaitTermination()
    }

    runBatch(
      10L -> doc("alpha"),                                          // keeps
      11L -> (words("seed").init ++ Seq("swap99", "the")).mkString(" "), // near-dup of seed
      12L -> seed,                                                  // exact dup of seed
      13L -> (words("beta").take(28) ++ Seq("secret", "eval", "answer", "key", "a")).mkString(" "),
      14L -> "tiny doc the end")                                    // fails gates
    val after1 = EtlCli.readTable(spark, corpusPath)
      .select("doc_id").as[Long].collect().toSet
    assert(after1 == Set(1L, 10L), s"batch-1 survivors wrong: $after1")

    runBatch(
      20L -> (words("alpha").init ++ Seq("swap42", "the")).mkString(" "), // near-dup of 10
      21L -> doc("gamma", "a"),                                     // keeps
      10L -> doc("alpha"))                                          // replayed id: no-op
    val after2 = EtlCli.readTable(spark, corpusPath)
      .select("doc_id").as[Long].collect().toSet
    assert(after2 == Set(1L, 10L, 21L), s"batch-2 survivors wrong: $after2")
  }
}
