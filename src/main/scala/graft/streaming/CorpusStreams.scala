package graft.streaming

import graft.operators.Dedup
import graft.tools.EtlCli
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming composition of the incremental-dedup production shape
  * (SURVEY.md §2.9 extension + the round-3 incremental dedup operator):
  * each micro-batch of documents PROBES the persisted LSH band index for
  * near-dups against everything ingested so far (plus itself), then
  * atomically EXTENDS the index with its own bands — so the band index,
  * the near-dup pairs table, and the ingested-corpus table stay in
  * lockstep through EtlCli's versioned commit protocol.
  *
  * This is the 100 TB ingest loop: per batch the signing is map-only over
  * the batch, the probe joins only on band keys, and verification touches
  * text for the candidate slice alone — O(|batch|) work per increment,
  * never a corpus re-scan.
  */
object CorpusStreams {

  /** Start the incremental-dedup sink over a streaming `incoming` frame of
    * (idCol, textCol, ...) documents. Three versioned tables:
    *
    *  - `indexPath`:  (doc_id, band) — the persisted LSH band index
    *  - `pairsPath`:  (doc_a, doc_b, jaccard) — all near-dup pairs found
    *  - `corpusPath`: (idCol, textCol) — ingested docs (verification text
    *                  for future probes, and the replay guard)
    *
    * Replay safety (foreachBatch is at-least-once): a replayed batch
    * anti-joins against the committed corpus, so already-ingested docs
    * sign nothing and emit nothing; pair/band extensions are distinct
    * unions of deterministic rows. Commit ORDER is pairs → index → corpus:
    * the corpus commit is the replay-guard fencepost, so a crash between
    * any two commits replays into identical state (the distinct unions
    * absorb the partial progress) — at-least-once delivery becomes
    * exactly-once table state, the same contract as the CDC upsert sink.
    *
    * Scale note: each commit rewrites the table's current version (the
    * warehouse protocol is rewrite-based); at 100 TB the index/pairs
    * tables would be directory-partitioned by ingest epoch so a commit
    * rewrites one partition — the protocol composes with
    * Store.overwritePartitions unchanged.
    */
  def incrementalDedupSink(incoming: DataFrame, idCol: String, textCol: String,
                           indexPath: String, pairsPath: String, corpusPath: String,
                           checkpointDir: String, k: Int, numHashes: Int,
                           bandSize: Int, threshold: Double, dfCap: Int = 0)
      : StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val spark = batch0.sparkSession
        def tableOr(path: String, empty: => DataFrame): DataFrame =
          scala.util.Try(EtlCli.readTable(spark, path)).getOrElse(empty)
        val batch = batch0.select(col(idCol), col(textCol))
        val corpus = tableOr(corpusPath, batch.limit(0))
        val corpusBands = tableOr(indexPath,
          batch.select(col(idCol).as("doc_id"), lit("").as("band")).limit(0))
        // replay guard: docs already committed to the corpus were fully
        // processed by a previous (possibly crashed-after-commit) attempt
        val newDocs = batch
          .join(corpus.select(col(idCol)), Seq(idCol), "left_anti")
          .transform(graft.core.Materialize.pin)
        if (newDocs.limit(1).count() > 0) {
          // sign ONCE; the bands both probe the index and extend it
          val newBands = Dedup.signBands(newDocs, idCol, textCol, k, numHashes,
              bandSize, dfCap)
            .transform(graft.core.Materialize.pin)
          val pairs = Dedup.incrementalNearDupsFromBands(newBands, newDocs,
            corpus, corpusBands, idCol, textCol, k, threshold)
          val oldPairs = tableOr(pairsPath,
            pairs.limit(0))
          EtlCli.writeTable(oldPairs.unionByName(pairs).distinct(), pairsPath)
          EtlCli.writeTable(corpusBands.unionByName(newBands).distinct(), indexPath)
          EtlCli.writeTable(corpus.unionByName(newDocs), corpusPath)
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
