package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary training (Sennrich/Haddow/Birch ACL'16,
  * batched as production subword trainers do at corpus scale).
  *
  * Each round re-tokenizes the corpus under the merges learned so far
  * (map-only: the merge table rides a one-row broadcast, pairs are the
  * native BpePairsExpr), counts within-word adjacent token pairs (one
  * partial-agg'd groupBy on the pair string), and appends the top
  * `batchSize` pairs to the table. Batching is the standard scale
  * trade: strictly sequential BPE re-counts after EVERY merge (50k
  * rounds over the corpus); selecting a batch per round cuts that to
  * nMerges/batchSize passes, at the cost that pairs within one batch
  * were counted under the same table (their counts ignore each other's
  * merges) — rank order within the batch still applies them
  * deterministically. Ties break lexicographically, so the learned
  * table is bit-stable across partitionings.
  *
  * Everything stays distributed: the merge table is a DataFrame
  * throughout (pinned per round — it is tiny and feeds two consumers),
  * and nothing wider than `batchSize` rows ever leaves an aggregation.
  * At 100 TB you learn the vocabulary on a corpus sample (trainers do)
  * and encode the full corpus with the learned table as a plan-time
  * constant (BpeEncodeExpr via GraftFunctions.bpe_encode).
  *
  * Returns (rank INT, rule STRING) — feed `rule` in rank order to
  * bpe_encode.
  */
object Tokenize {

  def learnBpeMerges(docs: DataFrame, textCol: String, nMerges: Int,
                     batchSize: Int = 16): DataFrame = {
    require(nMerges >= 0 && batchSize >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

    val corpus = graft.core.Tables.ensureParallelism(docs)
      .select(col(textCol).as("__text"))
    var merges = Seq.empty[(Int, String)].toDF("rank", "rule")
    var learned = 0
    var exhausted = false
    while (learned < nMerges && !exhausted) {
      val b = math.min(batchSize, nMerges - learned)
      // merge table as ONE ordered row (groupBy().agg on an empty table
      // still yields the single [] row, so round 0 needs no special case)
      val mOne = merges.groupBy().agg(
        transform(array_sort(collect_list(struct(col("rank"), col("rule")))),
          s => s.getField("rule")).as("m"))
      val pairs = corpus.crossJoin(broadcast(mOne))
        .select(explode(column(graft.plans.BpePairsExpr(
          expression(col("__text")), expression(col("m"))))).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
      // bounded single-partition window: the input is <= batchSize rows by
      // construction (post-limit), so single-partition ranking is the
      // point — the pmod key (n >= 1 on every surviving pair, so it is
      // the constant 0) keeps the optimizer from flagging a global
      // WindowExec while the semantics stay the global ranking
      val w = Window.partitionBy(pmod(col("n"), col("n")))
        .orderBy(col("n").desc, col("pair"))
      val newRules = pairs
        .orderBy(col("n").desc, col("pair")).limit(b)
        .select((row_number().over(w) + lit(learned - 1)).cast("int").as("rank"),
          col("pair").as("rule"))
      merges = merges.unionByName(newRules).transform(graft.core.Materialize.pin)
      val now = merges.count()
      exhausted = now == learned // no new pairs left to merge
      learned = now.toInt
    }
    merges
  }

  /** TOKEN-aware chunking — the context-window prep step: each document's
    * BPE token sequence splits into windows of `chunkLen` tokens advancing
    * by chunkLen - overlap, so every chunk fits a model context by TOKEN
    * count (chunkByChars' character windows can blow a token budget on
    * token-dense text). Map-only: tokenize (native BpeEncodeExpr with the
    * merge table as a plan constant), explode window starts, slice — the
    * per-chunk rows carry (doc_id, chunk_idx, n_tokens, chunk_tokens) and
    * text never shuffles. A trailing window starting inside the previous
    * chunk's overlap tail is dropped (zero new tokens), matching
    * chunkByChars' rule. Docs that tokenize to ZERO tokens (e.g.
    * whitespace-only text — bpe_encode skips whitespace) emit no chunks:
    * the gate is on token count, not text length, matching the oracle's
    * range(1, len(tk)+1) which is empty for len(tk) = 0. */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
                    merges: Seq[String], chunkLen: Int, overlap: Int): DataFrame = {
    require(chunkLen > overlap && overlap >= 0, "need chunkLen > overlap >= 0")
    val step = chunkLen - overlap
    graft.core.Tables.ensureParallelism(docs)
      .select(col(idCol).as("doc_id"),
        graft.plans.GraftFunctions.bpe_encode(col(textCol), merges).as("__tk"))
      .filter(size(col("__tk")) >= 1)
      .select(col("doc_id"), col("__tk"),
        posexplode(sequence(lit(1), size(col("__tk")), lit(step)))
          .as(Seq("chunk_idx", "__start")))
      .filter(col("chunk_idx") === 0 || col("__start") + overlap <= size(col("__tk")))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("__tk"), col("__start"), lit(chunkLen)).as("__c"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("__c")).cast("bigint").as("n_tokens"),
        array_join(col("__c"), " ").as("chunk_tokens"))
  }
}
