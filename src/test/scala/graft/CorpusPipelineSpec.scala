package graft

import graft.operators.CorpusPipeline
import org.apache.spark.sql.functions._

/** End-to-end corpus preparation over a planted fixture: each stage must
  * drop exactly its target document and nothing else.
  */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  // 35 distinct words + a stopword: passes every gate
  private def words(prefix: String): Seq[String] =
    (1 to 35).map(i => s"$prefix$i")

  private val good = (words("alpha") :+ "the").mkString(" ")
  private val nearDup = (words("alpha").init ++ Seq("sigma99", "the")).mkString(" ")
  private val contaminated =
    (words("beta").take(28) ++ Seq("secret", "eval", "answer", "key", "a")).mkString(" ")
  private val lowQuality = "tiny doc the end"
  private val unique = (words("gamma") :+ "a").mkString(" ")

  private val docs = Seq(
    (1L, good),
    (2L, good),          // exact dup of 1
    (3L, nearDup),       // near dup of 1
    (4L, contaminated),  // shares a 4-gram with the eval set
    (5L, lowQuality),    // fails the word-count gate
    (6L, unique)
  ).toDF("doc_id", "text")

  private val evalDocs = Seq(
    (100L, "prefix secret eval answer key suffix")
  ).toDF("doc_id", "text")

  test("each stage drops its target; survivors are chunked") {
    val chunks = CorpusPipeline.clean(docs, evalDocs, "doc_id", "text")
    val survivors = chunks.select("doc_id").distinct().as[Long].collect().toSet
    assert(survivors == Set(1L, 6L), s"wrong survivor set: $survivors")
    // chunks reassemble to the original text modulo the overlap windows
    val chunkCols = chunks.columns.toSeq
    assert(chunkCols == Seq("doc_id", "chunk_idx", "chunk"))
  }

  test("chunkLen <= 0 returns cleaned documents with schema unchanged") {
    val cleaned = CorpusPipeline.clean(docs, evalDocs, "doc_id", "text",
      CorpusPipeline.Config(chunkLen = 0))
    assert(cleaned.columns.toSeq == docs.columns.toSeq)
    val got = cleaned.orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, good), (6L, unique)))
  }

  test("a clean corpus passes through intact") {
    val cleaned = CorpusPipeline.clean(
      Seq((7L, good), (8L, unique)).toDF("doc_id", "text"),
      evalDocs, "doc_id", "text", CorpusPipeline.Config(chunkLen = 0))
    assert(cleaned.select("doc_id").as[Long].collect().toSet == Set(7L, 8L))
  }

  test("optional span-scrub stage deletes shared boilerplate from survivors") {
    // two otherwise-distinct docs share an 8-word boilerplate header; they
    // are NOT near-dups (jaccard way below threshold), so they survive to
    // the scrub stage, which removes exactly the shared span
    val boiler = (1 to 8).map(i => s"hdr$i").mkString(" ")
    val d7 = s"$boiler ${(words("delta") :+ "the").mkString(" ")}"
    val d8 = s"$boiler ${(words("epsln") :+ "a").mkString(" ")}"
    val cleaned = CorpusPipeline.clean(
      Seq((7L, d7), (8L, d8)).toDF("doc_id", "text"),
      evalDocs, "doc_id", "text",
      CorpusPipeline.Config(chunkLen = 0, scrubSpanN = 8, scrubMinDocs = 2))
    val got = cleaned.orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (7L, (words("delta") :+ "the").mkString(" ")),
      (8L, (words("epsln") :+ "a").mkString(" "))), s"got $got")
  }
}
