package graft.tools

import graft.core.Graft
import graft.operators.{Audit, CorpusPipeline, Export, MarvelTransform, Relational}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The reference's ETL CLI (`python -m etl.etl {initdb,marvel,quality,
  * stats}` — starter:etl/etl.py:70-93) rebuilt on the Spark engine over a
  * parquet warehouse:
  *
  *   runMain graft.tools.EtlCli init    <warehouse>
  *   runMain graft.tools.EtlCli ingest  <warehouse> <rawComicsJson>
  *   runMain graft.tools.EtlCli quality <warehouse>
  *   runMain graft.tools.EtlCli stats   <warehouse> [topN]
  *
  * ingest = extract(landed JSON) -> MarvelTransform flatten/explode ->
  * idempotent upsert into issue/creator/bridge tables -> etl_run audit row
  * (the full reference lifecycle, SURVEY.md §3.1). Re-running ingest with
  * the same input is a no-op on the tables (asserted in EtlCliSpec).
  */
object EtlCli {

  def main(args: Array[String]): Unit = {
    val spark = Graft.session("graft-etl")
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args.toSeq)
    finally spark.stop()
  }

  def run(spark: SparkSession, args: Seq[String]): Unit = args match {
    case Seq("init", wh)           => init(spark, wh)
    case Seq("ingest", wh, raw)    => ingest(spark, wh, raw)
    case Seq("quality", wh)        => quality(spark, wh).show(truncate = false)
    case Seq("stats", wh)          => stats(spark, wh, 10).show(truncate = false)
    case Seq("stats", wh, top)     => stats(spark, wh, top.toInt).show(truncate = false)
    case Seq("export", wh, docs, eval)     => export(spark, wh, docs, eval)
    case Seq("export", wh, docs, eval, n)  => export(spark, wh, docs, eval, n.toInt)
    case Seq("export", wh, docs, eval, n, fmt, flags @ _*) =>
      val unknown = flags.filterNot(f => f == "bpe" || f.startsWith("epochs="))
      if (unknown.nonEmpty)
        sys.error(s"unknown export flags: ${unknown.mkString(", ")} " +
          "(expected 'bpe' and/or 'epochs=src:2.5,other:0.5')")
      export(spark, wh, docs, eval, n.toInt, format = fmt,
        bpeTokens = flags.contains("bpe"),
        epochs = flags.find(_.startsWith("epochs="))
          .map(f => parseEpochs(f.stripPrefix("epochs="))).getOrElse(Map.empty))
    case Seq("learn-bpe", wh, docs, nMerges) =>
      learnBpe(spark, wh, docs, nMerges.toInt)
    case Seq("versions", path)      => println(versions(spark, path).mkString(","))
    case Seq("vacuum", path)        => vacuum(spark, path)
    case Seq("vacuum", path, n)     => vacuum(spark, path, n.toInt)
    case Seq("diff", path, key, a, b) =>
      diffVersions(spark, path, key, a.toLong, b.toLong)
        .orderBy("change", key).show(numRows = 1000, truncate = false)
    case Seq("verify-export", path) =>
      val bad = verifyExport(spark, path)
      if (bad.nonEmpty) sys.error(s"export at $path FAILED verification — " +
        s"shards diverging from the committed manifest: ${bad.mkString(", ")}")
      else println(s"export at $path verifies against its manifest")
    case Seq("sweep-lsh", corpusTable, outTable) =>
      sweepLsh(spark, corpusTable, outTable).show(truncate = false)
    case Seq("sweep-lsh", corpusTable, outTable, samplePeriod) =>
      sweepLsh(spark, corpusTable, outTable, samplePeriod.toInt).show(truncate = false)
    case Seq("sweep-binary", indexTable, outTable) =>
      sweepBinary(spark, indexTable, outTable).show(truncate = false)
    case Seq("sweep-binary", indexTable, outTable, nQueries) =>
      sweepBinary(spark, indexTable, outTable, nQueries.toInt).show(truncate = false)
    case Seq("sweep-binary", indexTable, outTable, nQueries, idCol, vecCol) =>
      sweepBinary(spark, indexTable, outTable, nQueries.toInt,
        idCol = idCol, vecCol = vecCol).show(truncate = false)
    case Seq("sweep-binary-ivf", indexTable, centPath, outTable) =>
      sweepBinaryIvf(spark, indexTable, centPath, outTable)
        .show(numRows = 100, truncate = false)
    case Seq("sweep-binary-ivf", indexTable, centPath, outTable, nQueries) =>
      sweepBinaryIvf(spark, indexTable, centPath, outTable, nQueries.toInt)
        .show(numRows = 100, truncate = false)
    case Seq("sweep-binary-ivf", indexTable, centPath, outTable, nQueries, idCol, vecCol) =>
      sweepBinaryIvf(spark, indexTable, centPath, outTable, nQueries.toInt,
        idCol = idCol, vecCol = vecCol).show(numRows = 100, truncate = false)
    case Seq("sweep-fused-rrf", indexTable, centPath, docsTable, outTable,
             terms) =>
      sweepFusedRrf(spark, indexTable, centPath, docsTable, outTable,
        terms.split(",").toSeq).show(numRows = 100, truncate = false)
    case Seq("sweep-fused-rrf", indexTable, centPath, docsTable, outTable,
             terms, nQueries) =>
      sweepFusedRrf(spark, indexTable, centPath, docsTable, outTable,
        terms.split(",").toSeq, nQueries.toInt)
        .show(numRows = 100, truncate = false)
    case Seq("check-drift", driftLog) => checkDrift(spark, driftLog)
    case Seq("check-drift", driftLog, maxCellShare) =>
      checkDrift(spark, driftLog, maxCellShare.toDouble)
    case Seq("retrain-binary-ivf", indexTable, centOut, idxOut, baseOut, nCells, dims) =>
      retrainBinaryIvf(spark, indexTable, centOut, idxOut, baseOut,
        nCells.toInt, dims.toInt)
    case Seq("retrain-binary-ivf", indexTable, centOut, idxOut, baseOut, nCells, dims,
             samplePeriod) =>
      retrainBinaryIvf(spark, indexTable, centOut, idxOut, baseOut,
        nCells.toInt, dims.toInt, samplePeriod.toInt)
    case Seq("retrain-binary-ivf", indexTable, centOut, idxOut, baseOut, nCells, dims,
             samplePeriod, idCol, vecCol) =>
      retrainBinaryIvf(spark, indexTable, centOut, idxOut, baseOut,
        nCells.toInt, dims.toInt, samplePeriod.toInt, idCol, vecCol)
    case Seq("retrain-ivfpq", vecsTable, centOut, cbOut, codesOut, baseOut,
             nCells, m, ksub, iters) =>
      retrainIvfPq(spark, vecsTable, centOut, cbOut, codesOut, baseOut,
        nCells.toInt, m.toInt, ksub.toInt, iters.toInt)
    case Seq("retrain-ivfpq", vecsTable, centOut, cbOut, codesOut, baseOut,
             nCells, m, ksub, iters, samplePeriod) =>
      retrainIvfPq(spark, vecsTable, centOut, cbOut, codesOut, baseOut,
        nCells.toInt, m.toInt, ksub.toInt, iters.toInt, samplePeriod.toInt)
    case Seq("retrain-ivfpq", vecsTable, centOut, cbOut, codesOut, baseOut,
             nCells, m, ksub, iters, samplePeriod, idCol, vecCol) =>
      retrainIvfPq(spark, vecsTable, centOut, cbOut, codesOut, baseOut,
        nCells.toInt, m.toInt, ksub.toInt, iters.toInt, samplePeriod.toInt,
        idCol, vecCol)
    case Seq("sweep-ivfpq", codesTable, centPath, cbPath, vecsTable, outTable) =>
      sweepIvfPq(spark, codesTable, centPath, cbPath, vecsTable, outTable)
        .show(numRows = 100, truncate = false)
    case Seq("sweep-ivfpq", codesTable, centPath, cbPath, vecsTable, outTable,
             nQueries) =>
      sweepIvfPq(spark, codesTable, centPath, cbPath, vecsTable, outTable,
        nQueries.toInt).show(numRows = 100, truncate = false)
    case Seq("sweep-ivfpq", codesTable, centPath, cbPath, vecsTable, outTable,
             nQueries, idCol, vecCol) =>
      sweepIvfPq(spark, codesTable, centPath, cbPath, vecsTable, outTable,
        nQueries.toInt, idCol = idCol, vecCol = vecCol)
        .show(numRows = 100, truncate = false)
    case Seq("knn-graph", vecsTable, outTable, k, rounds) =>
      knnGraph(spark, vecsTable, outTable, k.toInt, rounds.toInt)
    case Seq("knn-graph", vecsTable, outTable, k, rounds, nBits) =>
      knnGraph(spark, vecsTable, outTable, k.toInt, rounds.toInt,
        nBits = Some(nBits.toInt))
    case Seq("knn-graph", vecsTable, outTable, k, rounds, idCol, vecCol) =>
      knnGraph(spark, vecsTable, outTable, k.toInt, rounds.toInt, idCol, vecCol)
    case Seq("knn-graph", vecsTable, outTable, k, rounds, nBits, idCol, vecCol) =>
      knnGraph(spark, vecsTable, outTable, k.toInt, rounds.toInt, idCol, vecCol,
        Some(nBits.toInt))
    case Seq("extend-knn-graph", vecsTable, graphPath) =>
      extendKnnGraph(spark, vecsTable, graphPath)
    case Seq("extend-knn-graph", vecsTable, graphPath, k, rounds) =>
      extendKnnGraph(spark, vecsTable, graphPath, Some(k.toInt), rounds.toInt)
    case Seq("extend-knn-graph", vecsTable, graphPath, k, rounds, nBits) =>
      extendKnnGraph(spark, vecsTable, graphPath, Some(k.toInt), rounds.toInt,
        Some(nBits.toInt))
    case Seq("extend-knn-graph", vecsTable, graphPath, k, rounds, nBits,
             idCol, vecCol) =>
      extendKnnGraph(spark, vecsTable, graphPath, Some(k.toInt), rounds.toInt,
        Some(nBits.toInt), idCol, vecCol)
    case Seq("read-optimize-knn-graph", graphPath, outPath) =>
      graft.streaming.CorpusStreams.knnGraphReadOptimize(spark, graphPath, outPath)
      println(s"k-NN graph compacted to the stamped flat layout at $outPath")
    case Seq("compact-knn-graph", graphPath) =>
      graft.streaming.CorpusStreams.knnGraphCompact(spark, graphPath)
    case Seq("vacuum-knn-graph", graphPath) =>
      graft.streaming.CorpusStreams.vacuumKnnGraph(spark, graphPath)
    case Seq("vacuum-knn-graph", graphPath, checkpointDir) =>
      graft.streaming.CorpusStreams.vacuumKnnGraph(spark, graphPath,
        Some(checkpointDir))
    case Seq("check-graph-quality", graphPath) =>
      checkGraphQuality(spark, graphPath)
    case Seq("check-graph-quality", graphPath, minRatio) =>
      checkGraphQuality(spark, graphPath, minRatio.toDouble)
    case Seq("check-graph-quality", graphPath, minRatio, maxOccupancy) =>
      checkGraphQuality(spark, graphPath, minRatio.toDouble,
        Some(maxOccupancy.toLong))
    case Seq("check-graph-quality", graphPath, minRatio, maxOccupancy,
             minRecall) =>
      checkGraphQuality(spark, graphPath, minRatio.toDouble,
        Some(maxOccupancy.toLong), Some(minRecall.toDouble))
    case Seq("probe-graph-recall", graphPath) =>
      graft.streaming.CorpusStreams.knnGraphRecallProbe(spark, graphPath)
        .show(truncate = false)
    case Seq("probe-graph-recall", graphPath, nQueries) =>
      graft.streaming.CorpusStreams.knnGraphRecallProbe(spark, graphPath,
        nQueries.toInt).show(truncate = false)
    case Seq("hard-negatives", graphTable, vecsTable, outTable, k) =>
      mineHardNegatives(spark, graphTable, vecsTable, outTable, k.toInt)
    case Seq("hard-negatives", graphTable, vecsTable, outTable, k,
             idCol, vecCol, labelCol) =>
      mineHardNegatives(spark, graphTable, vecsTable, outTable, k.toInt,
        idCol, vecCol, labelCol)
    case Seq("read-optimize-binary-ivf", indexTable, outPath) =>
      graft.streaming.CorpusStreams.binaryIvfReadOptimize(spark, indexTable, outPath)
      println(s"binary-IVF index compacted to the cell-partitioned layout at $outPath")
    case Seq("read-optimize-binary-ivf", indexTable, outPath, centPath) =>
      graft.streaming.CorpusStreams.binaryIvfReadOptimize(spark, indexTable,
        outPath, centPath)
      println(s"binary-IVF index compacted (dead non-leaf rows reclaimed) at $outPath")
    case Seq("read-optimize-ivfpq", codesTable, outPath) =>
      graft.streaming.CorpusStreams.annReadOptimize(spark, codesTable, outPath)
      println(s"IVF-PQ codes compacted to the cell-partitioned layout at $outPath")
    case Seq("split-hot-cells", indexTable, centPath, maxShare) =>
      splitHotCells(spark, indexTable, centPath, maxShare.toDouble)
    case Seq("split-hot-cells", indexTable, centPath, maxShare, branch) =>
      splitHotCells(spark, indexTable, centPath, maxShare.toDouble, branch.toInt)
    case Seq("split-hot-cells", indexTable, centPath, maxShare, branch,
             idCol, vecCol) =>
      splitHotCells(spark, indexTable, centPath, maxShare.toDouble, branch.toInt,
        idCol, vecCol)
    case other =>
      sys.error("usage: init|ingest|quality|stats|export|learn-bpe|versions|" +
        s"vacuum|diff|verify-export|sweep-lsh|sweep-binary|sweep-binary-ivf|" +
        s"check-drift|retrain-binary-ivf|retrain-ivfpq|sweep-ivfpq|" +
        s"split-hot-cells|read-optimize-binary-ivf|read-optimize-ivfpq|" +
        s"knn-graph|extend-knn-graph|compact-knn-graph|vacuum-knn-graph|" +
        s"probe-graph-recall|check-graph-quality ... " +
        s"(got $other)")
  }

  /** Build and COMMIT the LSH band-sweep artifact the streaming ingest's
    * sweep wiring consumes (`curatedIngestSink(sweepPath = ...)`): sample
    * the corpus 1/samplePeriod by doc id, build exhaustive exact-Jaccard
    * truth over the sample (O(sample²) by nature — the period bounds it),
    * sweep every band size dividing numHashes against that truth, and
    * commit the frontier at `outTable` via the versioned-table protocol.
    * This is the periodic RE-SWEEP a recall monitor triggers; the next
    * ingest epoch then signs under the picker's refreshed choice. Accepts
    * either an epoch-partitioned corpus (the streaming sink's layout) or
    * a flat versioned table. Returns the committed frontier. */
  def sweepLsh(spark: SparkSession, corpusTable: String, outTable: String,
               samplePeriod: Int = 3, k: Int = 9, numHashes: Int = 8,
               threshold: Double = 0.8): DataFrame = {
    require(samplePeriod >= 1, s"sample period must be >= 1, got $samplePeriod")
    val docs = scala.util.Try(readEpochTable(spark, corpusTable))
      .getOrElse(readTable(spark, corpusTable))
      .select(col("doc_id"), col("text"))
    val sample = docs.filter(pmod(col("doc_id"), lit(samplePeriod.toLong)) === 0)
    val truth = graft.operators.Dedup.jaccardPairsExhaustive(
      sample, "doc_id", "text", k, threshold)
    val bandSizes = (1 to numHashes).filter(numHashes % _ == 0)
    val sweep = graft.operators.Dedup.lshBandSweep(
      sample, "doc_id", "text", k, numHashes, bandSizes, truth)
    // The artifact records the shingle k the frontier was MEASURED at:
    // the ingest sink's pick resolution requires it to equal its own
    // signing k — a frontier swept at k=9 says nothing about recall of
    // k=5 bands, and deploying across that mismatch would claim a recall
    // floor that was never measured.
    writeTable(sweep.withColumn("shingle_k", lit(k)), outTable)
    readTable(spark, outTable)
  }

  /** Build and COMMIT the binary shortlist-sweep artifact the picker
    * consumes (pickBinaryConfig) — the sweep-lsh sibling for the binary
    * ANN path: sample nQueries query vectors by deterministic hash rank
    * (the coarseSeeds idiom — no RNG, re-sweeps are reproducible), build
    * exact cosine truth for them over the index, sweep the shortlist
    * depths against that truth, and commit the frontier at `outTable`
    * via the versioned-table protocol. Accepts an epoch-partitioned
    * index (binaryIndexSink's layout) or a flat table; dims infer from
    * the stored vectors. This is the periodic re-sweep a recall monitor
    * triggers when the corpus distribution drifts. */
  /** The drift monitor's read side: scan the per-epoch quantizer-drift
    * log a binaryIvfIndexSinkWithDrift maintains and FAIL naming every
    * alarmed epoch — the signal that the pinned day-0 centroids no
    * longer fit the corpus and a retrain + full re-encode is due. With
    * `maxCellShare` set, ALSO fail on epochs whose hot-cell share
    * crosses it, naming the cheaper remedial (split-hot-cells): skew is
    * a COST cliff, not a recall cliff — the distribution alarm can stay
    * quiet while one cell swallows the corpus, and the local split fixes
    * that for O(hot mass) where the retrain pays O(corpus). Quiet logs
    * print a one-line all-clear. Driver-side work is bounded by the
    * epoch count (one boolean filter over an nEpochs-row table). */
  def checkDrift(spark: SparkSession, driftLog: String,
                 maxCellShare: Double = 1.0): Unit = {
    require(maxCellShare > 0 && maxCellShare <= 1,
      s"maxCellShare must be in (0,1], got $maxCellShare")
    // merge schemas: a log whose early epochs predate the skew column
    // must still expose it (nulls for the old rows), not flap on which
    // file supplies the footer
    val log = readEpochTable(spark, driftLog, mergeSchema = true)
    val alarmed = log.filter(col("drift_alarm"))
      .select(col("epoch").cast("long")).collect().map(_.getLong(0)).sorted
    if (alarmed.nonEmpty)
      sys.error(s"quantizer drift alarm in epoch(s) ${alarmed.mkString(", ")} " +
        s"of $driftLog — the pinned coarse centroids no longer fit the " +
        "corpus; retrain them and re-encode the index (probe recall decays " +
        "silently otherwise)")
    if (maxCellShare < 1.0) {
      require(log.columns.contains("max_cell_share"),
        s"drift log at $driftLog has no max_cell_share column — it predates " +
          "the skew axis; bound skew on logs a current sink wrote")
      val skewed = log.filter(col("max_cell_share") > maxCellShare)
        .select(col("epoch").cast("long")).collect().map(_.getLong(0)).sorted
      if (skewed.nonEmpty)
        sys.error(s"hot-cell share above $maxCellShare in epoch(s) " +
          s"${skewed.mkString(", ")} of $driftLog — the corpus is " +
          "concentrating into one probe cell (stage-1 cost degrades toward " +
          "the flat scan long before recall moves); run split-hot-cells on " +
          "the index, then re-sweep")
    }
    println(s"no drift alarms across ${log.count()} epoch(s) at $driftLog")
  }

  /** The remedial action checkDrift names: retrain the coarse quantizer
    * on the CURRENT corpus and re-encode the whole index under it. The
    * index itself carries the vectors (id, cell, words, vec), so the
    * corpus needs no separate table — accepts the epoch layout a
    * binaryIvf sink accretes or the cell-partitioned read-optimized
    * layout. Writes three NEW artifacts (blue/green — probes keep
    * serving the old index until the deployment switches paths):
    *  - `centroidsOut`: fresh hash-rank coarse centroids over the corpus
    *  - `indexOut`: the full re-encode, committed directly in the
    *    read-optimized cell-partitioned probe layout (a retrain is the
    *    one event that invalidates EVERY stored cell, so there is no
    *    epoch history worth preserving — the new index IS epoch zero)
    *  - `baselineOut`: the new drift baseline — a deterministic
    *    1/samplePeriod hash-rank id sample of the corpus the quantizer
    *    now fits (xxhash64 of the id AS STRING, so arbitrary id types
    *    sample uniformly — the bottomKSample idiom), so the monitor's
    *    next epochs compare against the post-retrain distribution
    *    (comparing against the stale baseline would re-alarm forever)
    * All three commit via the versioned-marker protocol (the index in the
    * cell-partitioned layout), so a probe reading concurrently with the
    * retrain never sees a half-written directory. A retrain also
    * invalidates every sweep measured against the OLD quantizer: sweeps
    * carry the centroid identity ([[sweepBinaryIvf]]) and the probe
    * refuses an identity mismatch, so run `sweep-binary-ivf` against the
    * new artifacts before switching the deployment.
    * This is deliberately a FULL O(corpus) rebuild: the pinned-centroid
    * design trades cheap O(batch) epoch appends for exactly this
    * explicit, monitor-evidenced re-encode when the distribution moves. */
  def retrainBinaryIvf(spark: SparkSession, indexTable: String,
                       centroidsOut: String, indexOut: String,
                       baselineOut: String, nCells: Int, dims: Int,
                       samplePeriod: Int = 1, idCol: String = "vec_id",
                       vecCol: String = "embedding"): Unit = {
    require(nCells >= 1, s"nCells must be >= 1, got $nCells")
    require(samplePeriod >= 1, s"sample period must be >= 1, got $samplePeriod")
    // INGEST epochs only — maintenance epochs (hot-cell split relabels)
    // are deliberately EXCLUDED from the retrain corpus: every relabeled
    // row copies an ingest row's (id, vec) verbatim (only `cell` moves,
    // and retrain ignores the old cell entirely), so they add nothing —
    // while their epoch numbers count in an INDEPENDENT namespace that
    // also starts at 0. Folding both namespaces into one max_by ordering
    // would let a relabel at maintenance epoch m outrank a GENUINE
    // re-ingest at ingest epoch e <= m and silently train on the stale
    // vector.
    val index = scala.util.Try(readEpochTableTagged(spark, indexTable))
      .getOrElse(spark.read.parquet(indexTable).withColumn("__epoch", lit(0L)))
    val missing = Seq(idCol, vecCol).filterNot(index.columns.contains)
    if (missing.nonEmpty)
      sys.error(s"index at $indexTable lacks column(s) ${missing.mkString(", ")} " +
        s"— pass the id/vector column names it was built with (got: " +
        s"${index.columns.mkString(", ")})")
    // one copy per id, LATEST EPOCH WINS: an id RE-INGESTED with an
    // updated vector must retrain on the newest copy (max-by-vector
    // alone would keep the lexicographically-largest — deterministic but
    // possibly the STALE vector). The vector is the deterministic
    // tiebreak inside one epoch. dropDuplicates would keep whichever
    // copy a partition delivered first and break the "re-run commits
    // the identical baseline" contract below.
    val corpus = index.select(col(idCol), col(vecCol),
        col("__epoch").cast(LongType).as("__epoch"))
      .groupBy(col(idCol))
      .agg(max_by(col(vecCol), struct(col("__epoch"), col(vecCol))).as(vecCol))
    if (corpus.isEmpty)
      sys.error(s"index at $indexTable is empty — nothing to retrain on")
    val cent = graft.operators.Similarity.coarseCentroids(
      corpus, idCol, vecCol, nCells)
    writeTable(cent, centroidsOut)
    // hash-based 1/samplePeriod sample: id-type agnostic (string ids
    // sample exactly like numeric ones) and deterministic, so a re-run
    // commits the identical baseline
    writeTable(corpus.filter(
        pmod(xxhash64(col(idCol).cast("string")), lit(samplePeriod.toLong)) === 0),
      baselineOut)
    writeTable(
      graft.operators.Similarity.binaryIvfIndexBuild(corpus, idCol, vecCol,
        dims, readTable(spark, centroidsOut)),
      indexOut, partitionBy = Seq("cell"))
  }

  /** The remedial action a CODEBOOK-drift alarm names, for the residual
    * IVF-PQ family — the invalidation-CASCADE retrain: fresh coarse
    * centroids over the current corpus, a fresh residual codebook trained
    * against them (the old codebook encodes residuals vs the OLD
    * centroids, so retraining centroids alone invalidates the codebook
    * too — both must move together), and a full re-encode — all committed
    * blue/green via the versioned protocol, probes keep serving the old
    * artifacts until the deployment switches paths. `vectorsTable`
    * supplies (idCol, vecCol): unlike the binary index the PQ codes table
    * deliberately does NOT carry vectors (8-byte codes ARE the point), so
    * the retrain reads the corpus table the embedding pipeline maintains
    * (epoch-partitioned, versioned, or a raw parquet dir).
    * `baselineOut` gets the hash-rank 1/samplePeriod sample the monitor's
    * next epochs compare against — same contract as retrainBinaryIvf. */
  def retrainIvfPq(spark: SparkSession, vectorsTable: String,
                   centroidsOut: String, codebookOut: String,
                   codesOut: String, baselineOut: String,
                   nCells: Int, m: Int, ksub: Int, iters: Int,
                   samplePeriod: Int = 1, idCol: String = "vec_id",
                   vecCol: String = "embedding"): Unit = {
    require(nCells >= 1, s"nCells must be >= 1, got $nCells")
    require(samplePeriod >= 1, s"sample period must be >= 1, got $samplePeriod")
    val vecs = readAnyTable(spark, vectorsTable)
    val missing = Seq(idCol, vecCol).filterNot(vecs.columns.contains)
    if (missing.nonEmpty)
      sys.error(s"vectors at $vectorsTable lack column(s) ${missing.mkString(", ")} " +
        s"— pass the id/vector column names (got: ${vecs.columns.mkString(", ")})")
    val corpus = vecs.select(col(idCol), col(vecCol))
    if (corpus.isEmpty)
      sys.error(s"vectors at $vectorsTable are empty — nothing to retrain on")
    // ivfPqResidualBuild derives its coarse seeds from the corpus by the
    // same deterministic hash-rank rule as coarseCentroids, so the
    // persisted centroid table below IS the quantizer the codebook and
    // codes were trained under — bit-for-bit
    writeTable(graft.operators.Similarity.coarseCentroids(
      corpus, idCol, vecCol, nCells), centroidsOut)
    val (cb, codes) = graft.operators.Similarity.ivfPqResidualBuild(
      corpus, idCol, vecCol, nCells, m, ksub, iters)
    // stamp the codebook with the quantizer it was trained UNDER: the
    // residual codebook is meaningless against any other centroids, and
    // the streaming encode sinks refuse a mismatched pair (deploying new
    // centroids with a stale codebook would encode garbage silently)
    writeTable(cb.withColumn("quantizer_id",
      lit(graft.operators.Similarity.quantizerIdentity(
        readTable(spark, centroidsOut)))), codebookOut)
    writeTable(codes, codesOut)
    writeTable(corpus.filter(
        pmod(xxhash64(col(idCol).cast("string")), lit(samplePeriod.toLong)) === 0),
      baselineOut)
  }

  /** Maintenance epochs (split relabels) live in their OWN epoch table
    * under the index dir. They must NOT share the `epoch=` namespace:
    * the streaming sink keys epochs by its checkpoint batchId, so a
    * maintenance epoch at max+1 would be silently REPLACED by the
    * stream's next batch (idempotent-replace is the sink's replay
    * contract) — losing every relabeled row. The `maintenance` subdir is
    * invisible to the `epoch=` lister, so no batchId can ever collide,
    * and epoch compaction folds only the ingest epochs around it. */
  private def maintenancePath(indexTable: String): String =
    s"$indexTable/maintenance"

  /** The committed live view of a binary-IVF epoch index: every ingest
    * epoch plus every maintenance epoch (hot-cell split relabels), when
    * any exist. Every full-index consumer — sweep, retrain,
    * read-optimize, the split itself — reads THIS, never the ingest
    * epochs alone. */
  def readIndexWithMaintenance(spark: SparkSession, indexTable: String): DataFrame = {
    val base = readEpochTable(spark, indexTable)
    if (committedEpochs(spark, maintenancePath(indexTable)).isEmpty) base
    else base.unionByName(readEpochTable(spark, maintenancePath(indexTable)))
  }

  /** The remedial action a HOT `max_cell_share` names: split the hot
    * cells locally and flip the quantizer — O(hot mass), against
    * retrain-binary-ivf's O(corpus) re-encode. Reads the committed epoch
    * index and the quantizer at `centroidsPath`, appends the relabeled
    * hot rows as a fresh epoch FIRST (child cells are not leaves of the
    * old tree, so a crash between the two commits leaves old readers
    * exactly correct — the orphan epoch is invisible), then commits the
    * (cc, cv, parent) tree as the next quantizer version. The flip moves
    * the leaf identity, so every sweep stamped against the old quantizer
    * refuses at probe time — run sweep-binary-ivf before switching the
    * deployment, and let the next read-optimize cadence reclaim the dead
    * parent rows. Replay-safe twice over: a crashed run's orphan epoch is
    * detected (the recomputed split is deterministic, so its child cells
    * name the same fresh ids AND relabel the same (id, cell) set —
    * content-checked, not just counted) and only the tree flip is
    * redone; a re-run AFTER a completed split measures the post-split
    * leaf occupancy and no-ops. */
  def splitHotCells(spark: SparkSession, indexTable: String,
                    centroidsPath: String, maxShare: Double,
                    branch: Int = 2, idCol: String = "vec_id",
                    vecCol: String = "embedding"): Unit = {
    // the split's O(hot) story is the maintenance-epoch APPEND, and the
    // probe's read path only unions maintenance epochs over the EPOCH
    // layout — a versioned (retrain / read-optimize output) or raw table
    // can't host one, so refuse with the actual remedial instead of
    // readEpochTable's misleading "nothing ingested yet"
    if (committedEpochs(spark, indexTable).isEmpty)
      sys.error(s"index at $indexTable has no committed ingest epochs — " +
        "split-hot-cells operates on the epoch log the streaming sink " +
        "accretes (the read-optimize INPUT); run it against that index, " +
        "then re-run read-optimize-binary-ivf so probes see the children")
    val index = readIndexWithMaintenance(spark, indexTable)
    val tree = readTable(spark, centroidsPath)
    val (newTree, relabeled) = graft.operators.Similarity.splitHotCells(
      index, idCol, vecCol, tree, maxShare, branch)
    val rel = graft.core.Materialize.pin(relabeled)
    if (rel.isEmpty) {
      println(s"no splittable leaf cell above share $maxShare at $indexTable " +
        "— nothing to do")
      return
    }
    val treeP = graft.core.Materialize.pin(newTree)
    // fresh child ids can exist in the index ONLY as the orphan epoch of a
    // run that crashed between its two commits (they exceed every cc the
    // old tree could have assigned) — detect and finish the flip instead
    // of appending a duplicate copy
    val oldCells = tree.select(col("cc").cast("long")).collect().map(_.getLong(0)).toSet
    val childCells = treeP.select(col("cc").cast("long")).collect()
      .map(_.getLong(0)).filterNot(oldCells).sorted
    // content-hash of an (id, cell) assignment: order-independent XOR of
    // per-row xxhash64 — counts alone can collide (a corpus whose shape
    // changed between crash and re-run can make a DIFFERENT cell hot
    // with coincidentally equal mass, and completing the flip over it
    // would commit a tree whose intervals disagree with the rows already
    // stored in those child cells — silent index corruption)
    def assignHash(df: DataFrame): (Long, Long) = {
      val r = df.agg(coalesce(expr("bit_xor(xxhash64(cast(" + idCol +
          " as string), cast(cell as long)))"), lit(0L)).as("h"),
        count(lit(1)).as("n")).collect().head
      (r.getLong(0), r.getLong(1))
    }
    val (orphanHash, orphan) = assignHash(
      index.filter(col("cell").cast("long").isin(childCells: _*)))
    val (relHash, relCount) = assignHash(rel)
    if (orphan == 0L) {
      val maint = maintenancePath(indexTable)
      val epoch = committedEpochs(spark, maint).maxOption.getOrElse(-1L) + 1
      appendEpoch(rel, maint, epoch)
      println(s"split committed as maintenance epoch $epoch: $relCount rows " +
        s"relabeled into cell(s) ${childCells.mkString(", ")}")
    } else if (orphan == relCount && orphanHash == relHash) {
      println(s"found the orphan split epoch ($orphan rows already relabeled, " +
        "(id, cell) content hash matches the deterministic replay) " +
        "— completing the quantizer flip only")
    } else {
      sys.error(s"index at $indexTable holds $orphan rows in unassigned " +
        s"cell(s) ${childCells.mkString(", ")} but this split relabels " +
        s"$relCount (content hashes $orphanHash vs $relHash) — the orphan " +
        "epoch does not match a deterministic replay; inspect the epoch " +
        "log before re-running")
    }
    writeTable(treeP, centroidsPath)
    println(s"quantizer flipped at $centroidsPath: ${childCells.length} child " +
      s"cell(s); re-sweep (sweep-binary-ivf) before probing — the old sweep's " +
      "identity stamp now refuses")
  }

  /** Build and COMMIT the binary-IVF 2D sweep artifact the production
    * probe consumes (`CorpusStreams.binaryIvfProbeWithSweep` /
    * `pickBinaryIvfConfig`) — the sweep-binary sibling for the
    * cell-pruned family, and the re-sweep step of the retrain runbook:
    * sample nQueries query vectors by deterministic hash rank, build
    * exact cosine truth for them over the index, sweep the
    * (nProbe, shortlist) grid against that truth, and commit the
    * frontier stamped with the IDENTITY of the quantizer it was measured
    * against (Similarity.quantizerIdentity over `centroidsPath`). The
    * stamp is the stale-sweep guard: recall was measured under THESE
    * cells, so probing a retrained index with this artifact must refuse
    * — exactly as the LSH pick refuses a shingle-k mismatch. Accepts the
    * epoch layout a binaryIvf sink accretes, a versioned table (the
    * retrain/read-optimize output), or a raw directory. */
  def sweepBinaryIvf(spark: SparkSession, indexTable: String,
                     centroidsPath: String, outTable: String,
                     nQueries: Int = 5, k: Int = 10,
                     nProbes: Seq[Int] = Seq(1, 2, 4, 8),
                     shortlists: Seq[Int] = Seq(25, 50, 100, 200),
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    require(nQueries >= 1, s"need at least one query vector, got $nQueries")
    val index = scala.util.Try(readIndexWithMaintenance(spark, indexTable))
      .getOrElse(readAnyTable(spark, indexTable))
    Seq(idCol, vecCol, "cell", "words").foreach(c =>
      require(index.columns.contains(c),
        s"index at $indexTable has no '$c' column (columns: " +
          s"${index.columns.mkString(", ")}) — sweep-binary-ivf runs over a " +
          "binaryIvfIndexBuild layout (id, cell, words, vec)"))
    val firstVec = index.select(size(col(vecCol)).as("d")).limit(1).collect()
    require(firstVec.nonEmpty,
      s"index at $indexTable is empty — nothing to sweep; ingest at least " +
        "one epoch before calibrating the probe knobs")
    val dims = firstVec.head.getInt(0)
    val cent = readTable(spark, centroidsPath)
    // sweep over LIVE rows only: after a hot-cell split the parent cell's
    // pre-split copies remain in old epochs but probes never read them
    // (the parent is no longer a leaf) — the exact truth and the swept
    // index must see the same single copy of every vector
    val live = index.join(broadcast(graft.operators.Similarity.leafCells(cent)
        .select(col("cc").cast("long").as("__leaf"))),
      index("cell").cast("long") === col("__leaf"), "left_semi")
    val qids = live.select(col(idCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(nQueries)
    val queries = live.join(qids, idCol).select(col(idCol), col(vecCol))
    val exact = graft.operators.Similarity.bruteForceTopK(
        live.select(col(idCol), col(vecCol)), queries, idCol, vecCol, k)
      .select(col("qid"), col("cid"))
    val sweep = graft.operators.Similarity.binaryIvfSweep(
      live.select(col(idCol), col("cell"), col("words")),
      live.select(col(idCol), col(vecCol)),
      queries, idCol, vecCol, dims, cent, nProbes, shortlists, k, exact)
    writeTable(sweep.withColumn("quantizer_id",
      lit(graft.operators.Similarity.quantizerIdentity(cent))), outTable)
    readTable(spark, outTable)
  }

  /** Build and COMMIT the FUSED-recall sweep the hybrid-RRF consumer
    * deploys from (`CorpusStreams.hybridRrfWithFusedSweep`) — the
    * measured r13 rule ("fusion consumers must sweep against a deeper
    * floor than their arm needs standalone") turned into an artifact +
    * picker instead of prose. For each (nProbe, shortlist) grid point,
    * the committed frontier carries the recall of RRF(BM25 lex,
    * probe-arm) against RRF(BM25 lex, exact-dense) at the same fusion
    * knobs, measured over a hash-rank query sample of the live index.
    * Stamped with the quantizer identity (a retrain moves every stored
    * cell, invalidating the measurement) plus the fusion knobs
    * (arm_k / k_rrf / top_k) so the consumer serves the exact fused
    * shape that was measured. */
  def sweepFusedRrf(spark: SparkSession, indexTable: String,
                    centroidsPath: String, docsTable: String,
                    outTable: String, terms: Seq[String],
                    nQueries: Int = 3, armK: Int = 20, kRrf: Int = 60,
                    topK: Int = 10,
                    nProbes: Seq[Int] = Seq(1, 2, 4, 8),
                    shortlists: Seq[Int] = Seq(25, 50, 100, 200),
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    require(nQueries >= 1, s"need at least one query vector, got $nQueries")
    require(terms.nonEmpty, "the lexical arm needs at least one term")
    val index = scala.util.Try(readIndexWithMaintenance(spark, indexTable))
      .getOrElse(readAnyTable(spark, indexTable))
    Seq(idCol, vecCol, "cell", "words").foreach(c =>
      require(index.columns.contains(c),
        s"index at $indexTable has no '$c' column (columns: " +
          s"${index.columns.mkString(", ")}) — sweep-fused-rrf runs over a " +
          "binaryIvfIndexBuild layout (id, cell, words, vec)"))
    val firstVec = index.select(size(col(vecCol)).as("d")).limit(1).collect()
    require(firstVec.nonEmpty,
      s"index at $indexTable is empty — nothing to sweep")
    val dims = firstVec.head.getInt(0)
    val cent = readTable(spark, centroidsPath)
    val live = index.join(broadcast(graft.operators.Similarity.leafCells(cent)
        .select(col("cc").cast("long").as("__leaf"))),
      index("cell").cast("long") === col("__leaf"), "left_semi")
    val qids = live.select(col(idCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(nQueries)
    val queries = live.join(qids, idCol).select(col(idCol), col(vecCol))
    val exactArm = graft.operators.Similarity.bruteForceTopK(
        live.select(col(idCol), col(vecCol)), queries, idCol, vecCol, armK)
      .select(col("qid"), col("cid"), col("rank"))
    val docs = readAnyTable(spark, docsTable)
    // the shared lexical arm: BM25 top-armK over the docs table, ranked
    // with the bounded constant-partition window (the hybrid query's
    // exact shape)
    val lex = graft.operators.TextAnalysis.bm25(docs, "doc_id", "text",
        terms, k1 = 1.2, b = 0.75, topK = armK)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(pmod(length(md5(col("doc_id").cast("string"))), lit(32)))
          .orderBy(desc("score"), col("doc_id"))))
      .select(col("doc_id"), col("rank"))
    val sweep = graft.operators.Similarity.fusedRrfSweep(
      live.select(col(idCol), col("cell"), col("words")),
      live.select(col(idCol), col(vecCol)),
      queries, idCol, vecCol, dims, cent, lex, exactArm,
      nProbes, shortlists, armK, kRrf, topK)
    // lexical-arm provenance: the frontier was measured under ONE fixed
    // lex arm while production requests vary theirs — record the arm's
    // identity (order-independent fold over its ranked rows) and terms
    // so a reader can tell WHICH arm calibrated the committed pick.
    // Measured sensitivity (SimilaritySpec "lexical-arm sensitivity"):
    // across three disjoint term sets the per-grid-point fused recall
    // moved at most 0.07 — the dense knobs the sweep calibrates barely
    // feel the lexical fixture (RRF's rank-only fusion bounds any one
    // arm's pull), so the committed pick transfers to production's
    // varying arms; the stamp exists for provenance and drift forensics,
    // not as a refusal key.
    val lexId = lex.agg(coalesce(expr(
        "bit_xor(xxhash64(concat(cast(doc_id as string), ':', " +
          "cast(rank as string))))"), lit(0L)))
      .collect().head.getLong(0)
    writeTable(sweep
      .withColumn("quantizer_id",
        lit(graft.operators.Similarity.quantizerIdentity(cent)))
      .withColumn("arm_k", lit(armK))
      .withColumn("k_rrf", lit(kRrf))
      .withColumn("top_k", lit(topK))
      .withColumn("lex_id", lit(lexId))
      .withColumn("lex_terms", lit(terms.mkString(","))), outTable)
    readTable(spark, outTable)
  }

  /** Read a table in whatever layout it was maintained in: the epoch log
    * a streaming sink accretes, a versioned flat table (retrain /
    * read-optimize output), or a raw parquet dir — the acceptance
    * contract of every artifact-consuming CLI arm. */
  def readAnyTable(spark: SparkSession, table: String): DataFrame =
    scala.util.Try(readEpochTable(spark, table))
      .orElse(scala.util.Try(readTable(spark, table)))
      .getOrElse(spark.read.parquet(table))

  /** Build and COMMIT the approximate k-NN graph
    * (Similarity.nnDescentGraph) over a corpus table — the batch
    * maintenance job a SemDeDup-style pipeline or graph-retrieval
    * deployment schedules. Versioned commit, blue/green like every
    * maintained artifact. */
  def knnGraph(spark: SparkSession, vecsTable: String, outTable: String,
               k: Int, rounds: Int, idCol: String = "vec_id",
               vecCol: String = "embedding", nBits: Option[Int] = None,
               ringVersion: Int = 2): Unit = {
    val vecs = readAnyTable(spark, vecsTable)
    val missing = Seq(idCol, vecCol).filterNot(vecs.columns.contains)
    if (missing.nonEmpty)
      sys.error(s"vectors at $vecsTable lack column(s) ${missing.mkString(", ")} " +
        s"— pass the id/vector column names (got: ${vecs.columns.mkString(", ")})")
    val corpus = vecs.select(col(idCol), col(vecCol))
    // ring-bucket knob: derived from the corpus size unless pinned — a
    // FIXED bucket count at a growing corpus turns the per-bucket ring
    // windows into near-global sorts (Similarity.nnDescentNBits)
    val bits = nBits.getOrElse(
      graft.operators.Similarity.nnDescentNBits(corpus.count()))
    // stamp: the corpus identity the graph was built OVER — consumers
    // (hard-negative mining, curation) refuse a re-embedded corpus via
    // requireStamp instead of silently mining degraded neighbors
    val cid = graft.operators.Similarity.corpusIdentity(corpus, idCol, vecCol)
    writeTable(graft.operators.Similarity.nnDescentGraph(
        corpus, idCol, vecCol, k, rounds, bits, ringVersion)
      .withColumn("corpus_id", lit(cid)), outTable)
    println(s"k-NN graph (k=$k, $rounds NN-descent rounds, nBits=$bits, " +
      s"ring v$ringVersion) committed at $outTable, stamped corpus_id=$cid")
  }

  /** Batch-mode sibling of CorpusStreams.knnGraphSink for corpora
    * maintained by scheduled jobs rather than streams: commit ONE epoch
    * of the incremental graph at `graphPath` from a new-vectors table —
    * bootstrap (full NN-descent build) when no graph exists, O(batch)
    * extension otherwise. The graph's build params are IDENTITY: `k`
    * sizes every committed neighborhood and `nBits` keys the candidate
    * buckets, so an extension must reuse the committed values — stored
    * in the identity table, re-read here, and a conflicting explicit
    * argument refuses naming both. Bootstrap requires `k`; nBits
    * derives from the corpus size unless pinned. */
  def extendKnnGraph(spark: SparkSession, vecsTable: String, graphPath: String,
                     k: Option[Int] = None, rounds: Int = 2,
                     nBits: Option[Int] = None, idCol: String = "vec_id",
                     vecCol: String = "embedding",
                     ringVersion: Option[Int] = None): Unit = {
    val vecs = readAnyTable(spark, vecsTable)
    val missing = Seq(idCol, vecCol).filterNot(vecs.columns.contains)
    if (missing.nonEmpty)
      sys.error(s"vectors at $vecsTable lack column(s) ${missing.mkString(", ")} " +
        s"— pass the id/vector column names (got: ${vecs.columns.mkString(", ")})")
    val stored = scala.util.Try {
        val t = readTable(spark, s"$graphPath/identity")
        val withRing = if (t.columns.contains("ring_version")) t
          else t.withColumn("ring_version", lit(1)) // pre-versioning = v1
        withRing.select(col("k").cast("int"), col("n_bits").cast("int"),
          col("ring_version").cast("int"))
          .collect().headOption
      }.toOption.flatten
    val (kk, bits, ring) = stored match {
      case Some(r) =>
        val (k0, b0, rv0) = (r.getInt(0), r.getInt(1), r.getInt(2))
        k.filter(_ != k0).foreach(x => sys.error(
          s"graph at $graphPath was built with k=$k0 but this extension " +
            s"passes k=$x — mixing neighborhood sizes corrupts the view; " +
            s"omit k (the committed value is reused) or rebuild"))
        nBits.filter(_ != b0).foreach(x => sys.error(
          s"graph at $graphPath was built with nBits=$b0 but this " +
            s"extension passes nBits=$x — the knob keys the candidate " +
            "buckets and must stay fixed for the graph's life; omit it " +
            "or rebuild"))
        ringVersion.filter(_ != rv0).foreach(x => sys.error(
          s"graph at $graphPath was bootstrapped under ring formula " +
            s"v$rv0 but this run passes v$x — the exploration-ring " +
            "formula is graph-lifetime identity (a committed graph " +
            "replays bit-identically only under the formula that built " +
            "it); omit it (the committed version is reused) or rebuild"))
        (k0, b0, rv0)
      case None =>
        val kk = k.getOrElse(sys.error(s"no committed graph at $graphPath " +
          "— a bootstrap needs k (and optionally rounds / nBits)"))
        (kk, nBits.getOrElse(
          graft.operators.Similarity.nnDescentNBits(vecs.count())),
          ringVersion.getOrElse(2))
    }
    // Epoch choice is correctness, not bookkeeping: a run that crashed
    // after its nodes append but before the identity write left an epoch
    // whose ids are in the corpus reads but not in the identity fold. A
    // re-run at max+1 would see its own batch's prior copies as
    // "superseded" and XOR them back out — the ids would be missing from
    // the identity FOREVER. Detect the half-committed epoch (nodes
    // present but graph or identity missing) and REUSE its id: the
    // commit body recomputes from strictly-earlier state (the streaming
    // sink's checkpoint-replay semantics) and idempotently replaces the
    // crashed appends.
    // fold-aware max: after vacuum-knn-graph the raw tail may start past
    // (or be empty at) the folds' covered epochs — the next epoch must
    // never collide with a reclaimed one
    val (foldN, foldE) = graft.streaming.CorpusStreams
      .knnGraphFoldCovered(spark, graphPath)
    val next = (committedEpochs(spark, s"$graphPath/nodes").maxOption
        ++ foldN).maxOption match {
      case None => 0L
      case Some(n) =>
        val graphDone =
          committedEpochs(spark, s"$graphPath/graph").contains(n) ||
            foldE.exists(_ >= n)
        val idDone = scala.util.Try(readTable(spark, s"$graphPath/identity")
            .select(col("last_epoch").cast("long"))
            .collect().headOption.exists(_.getLong(0) >= n))
          .getOrElse(false)
        if (graphDone && idDone) n + 1
        else {
          println(s"epoch $n at $graphPath is half-committed (a prior run " +
            "crashed mid-commit) — replaying it instead of opening a new one")
          n
        }
    }
    graft.streaming.CorpusStreams.knnGraphCommitBatch(
      vecs.select(col(idCol), col(vecCol)), next, graphPath, idCol, vecCol,
      kk, rounds, bits, ring)
    println(s"graph at $graphPath ${if (next == 0) "bootstrapped" else "extended"} " +
      s"as epoch $next (k=$kk, nBits=$bits, ring v$ring)")
  }

  /** The graph family's monitor arm, checkDrift's sibling: read the
    * quality trend log a knnGraphSink appends (one exact-integer
    * mean-cosine row per epoch) and alarm when any epoch's mean falls
    * below `minRatio` of the BOOTSTRAP epoch's — the accumulated
    * staleness signal incremental NN-descent uniquely has (extensions
    * are order-dependent, so no bit-equality check can see decay; the
    * trend can). The remedial is explicit: rebuild from scratch
    * (knn-graph over the nodes table) and resume the sink. */
  def checkGraphQuality(spark: SparkSession, graphPath: String,
                        minRatio: Double = 0.8,
                        maxOccupancy: Option[Long] = None,
                        minRecall: Option[Double] = None): Unit = {
    require(minRatio > 0 && minRatio <= 1,
      s"minRatio must be in (0,1], got $minRatio")
    require(maxOccupancy.forall(_ >= 1),
      s"maxOccupancy must be >= 1, got $maxOccupancy")
    require(minRecall.forall(r => r > 0 && r <= 1),
      s"minRecall must be in (0,1], got $minRecall")
    // ground-truth axis first when asked for: the sampled exact-recall
    // probe log (CorpusStreams.knnGraphRecallProbe) — unlike the
    // bootstrap-relative cosine trend below it is distribution-blind, so
    // a low row is STALENESS, not a merely more diverse corpus
    minRecall.foreach { floor =>
      val probed = scala.util.Try(
          readEpochTable(spark, s"$graphPath/recall", mergeSchema = true))
        .toOption
      probed match {
        case None => println(s"no recall probe log at $graphPath — run " +
          "probe-graph-recall to add the ground-truth axis")
        case Some(t) =>
          val bad = t.filter(col("recall_micro") < floor)
            .select(col("epoch").cast("long"),
              col("recall_micro").cast("double"))
            .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
          if (bad.nonEmpty)
            sys.error("graph exact-recall probe fell below " +
              f"$floor%.2f at epoch(s) " +
              bad.map { case (e, r) => f"$e (recall $r%.3f)" }.mkString(", ") +
              s" of $graphPath — incremental-extension staleness against " +
              "the EXACT ground truth, not a distribution artifact. " +
              "Rebuild the graph from the nodes table (knn-graph) and " +
              "resume the sink")
      }
    }
    // mergeSchema: the quality log EVOLVES (the occupancy columns arrived
    // mid-family) — the default pick-one-footer schema would make column
    // visibility depend on which epoch's file wins
    val log = readEpochTable(spark, s"$graphPath/quality", mergeSchema = true)
    // bucket-skew axis first: the candidate bound the extension's
    // broadcast mate set rides is ~occupancy of the batch's buckets —
    // a near-dup-heavy corpus piles into one bucket, and the per-batch
    // cost cliff arrives LONG before the cosine trend moves. Alarm with
    // the remedial: rebuild at a finer derived nBits (more hyperplanes
    // thin the pile), or split/dedup the near-identical mass first.
    maxOccupancy.foreach { cap =>
      // axes live in two logs: quality/ carries the per-batch FINE ring
      // (what the fine-first extension pays; legacy rows may also carry
      // a coarse column), occupancy/ carries the compact-cadence
      // full-corpus stats at both granularities
      val occLog = scala.util.Try(
          readEpochTable(spark, s"$graphPath/occupancy", mergeSchema = true))
        .toOption
      val axes = (Seq(log) ++ occLog).flatMap { t =>
        Seq("max_bucket_members_fine", "max_bucket_members_coarse")
          .filter(t.columns.contains)
          .map(c => t.select(col("epoch").cast("long"),
            col(c).cast("long").as("__m")).filter(col("__m").isNotNull))
      }
      if (axes.nonEmpty) {
        val hot = axes.reduce(_ unionByName _).filter(col("__m") > cap)
          .groupBy(col("epoch")).agg(max(col("__m")).as("__m"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        if (hot.nonEmpty)
          sys.error(s"graph ring-bucket occupancy blew past $cap in epoch(s) " +
            hot.map { case (e, m) => s"$e (max $m)" }.mkString(", ") +
            s" at $graphPath — the extension's per-batch candidate bound is " +
            "occupancy-linear, so batches touching the hot bucket pay it in " +
            "full. Rebuild the graph at a FINER derived nBits (knn-graph; " +
            "nnDescentNBits with a smaller targetBucketSize), or near-dup " +
            "the piled mass away before it enters the corpus")
      }
    }
    // an EMPTY micro-batch logs a null mean (no edges to average — the
    // empty-frame guard, not a signal): skip those epochs rather than
    // reading 0-quality into the trend
    val rows = log
      .filter(col("mean_cosine").isNotNull)
      .select(col("epoch").cast("long"), col("mean_cosine").cast("double"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    if (rows.isEmpty) {
      println(s"graph quality log at $graphPath holds only empty epochs — " +
        "nothing to trend yet")
      return
    }
    val base = rows.head._2
    // cosine lives in [-1, 1]: a zero or NEGATIVE bootstrap mean makes
    // the ratio threshold degenerate (negative base RAISES the bar above
    // base itself, alarming on epochs that improved) — a trend needs a
    // positive anchor, so refuse loudly instead of paging nonsense
    if (base <= 0)
      sys.error(f"graph quality bootstrap epoch at $graphPath has " +
        f"non-positive mean neighbor cosine ($base%.4f) — a ratio trend " +
        "has no meaningful anchor; the bootstrap graph itself looks " +
        "degenerate (near-orthogonal or inverted neighborhoods). Rebuild " +
        "the graph (knn-graph) before trending its quality")
    val alarmed = rows.filter(_._2 < minRatio * base).map(_._1)
    if (alarmed.nonEmpty)
      sys.error(f"graph quality collapsed in epoch(s) ${alarmed.mkString(", ")} " +
        f"of $graphPath — mean neighbor cosine fell below $minRatio%.2f of " +
        f"the bootstrap epoch's ($base%.4f); incremental extension " +
        "staleness accumulated. Rebuild the graph from the nodes table " +
        "(knn-graph) and resume the sink")
    println(f"graph quality steady across ${rows.length} epoch(s) at " +
      f"$graphPath (bootstrap mean $base%.4f)")
  }

  /** The committed graph's first consumer — graph-powered contrastive
    * hard-negative mining (Similarity.hardNegativesFromGraph): per node,
    * the cosine-nearest different-label graph neighbors, a key join +
    * bounded re-rank over already-scored edges instead of a corpus scan
    * per query. Refuses a graph stamped for a DIFFERENT corpus identity
    * than the live vectors table (the re-embedded-corpus staleness the
    * stamp exists for) before reading one edge. */
  def mineHardNegatives(spark: SparkSession, graphTable: String,
                        vecsTable: String, outTable: String, k: Int,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        labelCol: String = "label"): Unit = {
    val graph = readAnyTable(spark, graphTable)
    val vecs = readAnyTable(spark, vecsTable)
    val missing = Seq(idCol, vecCol, labelCol).filterNot(vecs.columns.contains)
    if (missing.nonEmpty)
      sys.error(s"vectors at $vecsTable lack column(s) ${missing.mkString(", ")} " +
        s"— pass the id/vector/label column names (got: ${vecs.columns.mkString(", ")})")
    requireStamp(graph, "corpus_id",
      graft.operators.Similarity.corpusIdentity(vecs, idCol, vecCol),
      s"graph at $graphTable was built over corpus",
      s"the vectors at $vecsTable",
      "the embeddings moved since the graph was built — rebuild " +
        "(knn-graph) or re-stream the changed vectors through " +
        "knnGraphSink before mining")
    writeTable(graft.operators.Similarity.hardNegativesFromGraph(
      graph, vecs, idCol, labelCol, k), outTable)
    println(s"graph-mined hard negatives (top-$k per node) committed at $outTable")
  }

  /** THE identity-stamp guard, shared by every deploy-time binding check
    * (sweep↔quantizer, sweep↔codebook, codebook↔quantizer): when `df`
    * carries the stamp column, its distinct value must equal the live
    * identity or the deployment refuses, naming both sides and the
    * remedial. Unstamped (legacy) artifacts pass unchecked — stamps are
    * additive. */
  def requireStamp(df: DataFrame, column: String, live: Long,
                   stampedDesc: String, liveDesc: String,
                   hint: String): Unit =
    if (df.columns.contains(column)) {
      val stamped = df.select(col(column).cast("long"))
        .distinct().collect().map(_.getLong(0)).toSeq
      require(stamped == Seq(live),
        s"$stampedDesc identity ${stamped.mkString(",")} but $liveDesc has " +
          s"identity $live — $hint")
    }

  /** Build and COMMIT the residual IVF-PQ probe-depth sweep the deploy
    * path consumes (`CorpusStreams.ivfPqProbeWithSweep` /
    * `Similarity.pickIvfConfig`) — the last ANN family's
    * sweep→floor→choice loop. The codes table carries no raw vectors
    * (that is the point of PQ), so `vectorsTable` supplies (idCol,
    * vecCol) for the hash-rank query sample and the exact-L2 truth —
    * the corpus table the embedding pipeline maintains, exactly as
    * retrain-ivfpq reads it. The committed frontier is STAMPED with BOTH
    * identities it was measured under — the coarse quantizer's and the
    * codebook's — because residual-ADC recall depends on the pair: after
    * a retrain-ivfpq the probe refuses the stale sweep naming the moved
    * identity. The codebook must itself pair with the centroids
    * (refused otherwise, same posture as the encode sinks). m infers
    * from the stored code width. */
  def sweepIvfPq(spark: SparkSession, codesTable: String,
                 centroidsPath: String, codebookPath: String,
                 vectorsTable: String, outTable: String,
                 nQueries: Int = 5, k: Int = 10,
                 nProbes: Seq[Int] = Seq(1, 2, 4, 8),
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    require(nQueries >= 1, s"need at least one query vector, got $nQueries")
    val codes = readAnyTable(spark, codesTable)
    Seq("cid", "cell", "codes").foreach(c =>
      require(codes.columns.contains(c),
        s"codes at $codesTable have no '$c' column (columns: " +
          s"${codes.columns.mkString(", ")}) — sweep-ivfpq runs over an " +
          "ivfPqResidualEncode layout (cid, cell, codes)"))
    val cent = readTable(spark, centroidsPath)
    val cb = readTable(spark, codebookPath)
    requireStamp(cb, "quantizer_id",
      graft.operators.Similarity.quantizerIdentity(cent),
      s"codebook at $codebookPath was trained against quantizer",
      s"the centroids at $centroidsPath",
      "a sweep against a mismatched pair would measure recall of an index " +
        "that cannot exist")
    val firstCode = codes.select(size(col("codes")).as("m")).limit(1).collect()
    require(firstCode.nonEmpty,
      s"codes at $codesTable are empty — nothing to sweep; encode at least " +
        "one epoch before calibrating the probe depth")
    val m = firstCode.head.getInt(0)
    val vecs = readAnyTable(spark, vectorsTable).select(col(idCol), col(vecCol))
    val qids = vecs.select(col(idCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(nQueries)
    val queries = vecs.join(qids, idCol)
    val exact = graft.operators.Similarity.bruteForceL2TopK(
        vecs, queries, idCol, vecCol, k)
      .select(col("qid"), col("cid"))
    val sweep = graft.operators.Similarity.ivfPqResidualSweep(
      codes.select(col("cid"), col("cell"), col("codes")),
      cb.drop("quantizer_id"), cent, queries, idCol, vecCol, m, nProbes, k,
      exact)
    writeTable(sweep
      .withColumn("quantizer_id",
        lit(graft.operators.Similarity.quantizerIdentity(cent)))
      .withColumn("codebook_id",
        lit(graft.operators.Similarity.codebookIdentity(cb))), outTable)
    readTable(spark, outTable)
  }

  def sweepBinary(spark: SparkSession, indexTable: String, outTable: String,
                  nQueries: Int = 5, k: Int = 10,
                  shortlists: Seq[Int] = Seq(25, 50, 100, 200),
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nQueries >= 1, s"need at least one query vector, got $nQueries")
    val index = scala.util.Try(readEpochTable(spark, indexTable))
      .getOrElse(readTable(spark, indexTable))
    // binaryIndexSink accepts arbitrary id/vec column names, so the sweep
    // must too; precheck both shape and non-emptiness so a misnamed
    // column or an index with no committed epochs fails with a message,
    // not an opaque resolver/NoSuchElement error deep in the plan
    Seq(idCol, vecCol).foreach(c => require(index.columns.contains(c),
      s"index at $indexTable has no '$c' column (columns: " +
        s"${index.columns.mkString(", ")}) — pass idCol/vecCol matching " +
        "the names the index was built with"))
    val firstVec = index.select(size(col(vecCol)).as("d")).limit(1).collect()
    require(firstVec.nonEmpty,
      s"index at $indexTable is empty — nothing to sweep; ingest at least " +
        "one epoch before calibrating a shortlist depth")
    val dims = firstVec.head.getInt(0)
    val qids = index.select(col(idCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(nQueries)
    val queries = index.join(qids, idCol).select(col(idCol), col(vecCol))
    val exact = graft.operators.Similarity.bruteForceTopK(
        index, queries, idCol, vecCol, k)
      .select(col("qid"), col("cid"))
    val sweep = graft.operators.Similarity.binaryShortlistSweep(
      index, index, queries, idCol, vecCol, dims, shortlists, k, exact)
    writeTable(sweep, outTable)
    readTable(spark, outTable)
  }

  private def issuesPath(wh: String)  = s"$wh/issue"
  private def creatorsPath(wh: String) = s"$wh/creator"
  private def bridgePath(wh: String)  = s"$wh/issue_creator"

  /** Create empty tables with the canonical schemas. */
  def init(spark: SparkSession, wh: String): Unit = {
    import spark.implicits._
    writeBack(Seq.empty[(Long, String, String, java.sql.Date, Long, Boolean)]
      .toDF("marvel_comic_id", "title", "issue_number", "onsale_date",
        "price_cents", "is_variant"), issuesPath(wh))
    writeBack(Seq.empty[String].toDF("creator_name"), creatorsPath(wh))
    writeBack(Seq.empty[(Long, String, String)]
      .toDF("marvel_comic_id", "creator_name", "role"), bridgePath(wh))
  }

  /** Extract -> transform -> idempotent load -> audit. Malformed JSON
    * lines divert to a quarantine table (F7) instead of failing the batch
    * or loading garbage. */
  def ingest(spark: SparkSession, wh: String, rawJsonPath: String): Audit.EtlRun =
    Audit.audited(spark, "marvel", s"$wh/etl_run") { (readObs, loadObs) =>
      // cache: Spark disallows queries touching only _corrupt_record on a
      // raw JSON scan; a materialized batch lifts the restriction (and a
      // landed batch is read 3x below anyway)
      val landed = spark.read.json(rawJsonPath).cache()
      val raw0 =
        if (landed.columns.contains("_corrupt_record")) {
          landed.filter(col("_corrupt_record").isNotNull)
            .select(col("_corrupt_record").as("raw_line"))
            .write.mode(SaveMode.Append).parquet(s"$wh/quarantine")
          landed.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
        } else landed
      val raw = Audit.observed(raw0, readObs)

      // transform (P1/X1-X7): whitelist + normalize
      val incomingIssues = MarvelTransform.flattenComics(raw)
        .select("marvel_comic_id", "title", "issue_number", "onsale_date",
          "price_cents", "is_variant")

      // load: insert-if-absent + update-mutable (J4/D3/D4), first-wins
      val target = readTable(spark, issuesPath(wh))
      val merged = Relational.upsert(target, incomingIssues,
        keys = Seq("marvel_comic_id"),
        mutableCols = Seq("title", "onsale_date", "price_cents", "is_variant"),
        incomingOrder = Seq(col("marvel_comic_id")))
      val loaded = Audit.observed(merged, loadObs)
      writeBack(loaded, issuesPath(wh))

      // creators dimension + M:N bridge (J5), insert-if-absent
      val credits = MarvelTransform.explodeCreators(raw)
      val existingCreators = readTable(spark, creatorsPath(wh))
      val newCreators = credits.select(col("creator_name")).distinct()
        .join(existingCreators, Seq("creator_name"), "left_anti")
      writeBack(existingCreators.unionByName(newCreators), creatorsPath(wh))

      val existingBridge = readTable(spark, bridgePath(wh))
      val newLinks = credits.select("marvel_comic_id", "creator_name", "role").distinct()
        .join(existingBridge, Seq("marvel_comic_id", "creator_name", "role"), "left_anti")
      writeBack(existingBridge.unionByName(newLinks), bridgePath(wh))
    }

  /** Training-data EXPORT: the full corpus pipeline composed end-to-end on
    * the versioned warehouse —
    *
    *   CorpusPipeline.clean (quality gates → exact dedup → LSH near-dup →
    *   decontaminate) → Export.mixtureSample (uniform target share per
    *   source) → Export.packAssignments → Store.writeShards into
    *   `wh`/export under the same atomic commit protocol as the ETL
    *   tables, with read/loaded counters observed into the etl_run audit
    *   row.
    *
    * Everything downstream of the scan is deterministic (hash bands, no
    * RNG, md5 pseudo-shuffle row order inside each shard file), so a
    * re-run commits a byte-identical next version — asserted in
    * EtlCliSpec. Failure anywhere leaves the previous export version live.
    */
  /** Learn a BPE merge table from a corpus and commit it as the versioned
    * `wh`/bpe_merges table — the tokenizer-training half of the export
    * story. `export ... bpe` then measures sequence budgets in REAL
    * tokens under this table. */
  def learnBpe(spark: SparkSession, wh: String, docsPath: String,
               nMerges: Int): Unit =
    writeTable(
      graft.operators.Tokenize.learnBpeMerges(
        spark.read.parquet(docsPath), "text", nMerges),
      s"$wh/bpe_merges")

  /** Parse "web:2.5,books:1.5" into an epochs map (source → repetition
    * factor for Export.mixtureRepeat). */
  private[graft] def parseEpochs(s: String): Map[String, Double] =
    s.split(",").iterator.filter(_.nonEmpty).map { kv =>
      kv.split(":") match {
        case Array(g, e) => g -> e.toDouble
        case _ => sys.error(s"bad epochs entry '$kv' (expected source:factor)")
      }
    }.toMap

  def export(spark: SparkSession, wh: String, docsPath: String, evalPath: String,
             nShards: Int = 8, budget: Int = 2048,
             format: String = "parquet", bpeTokens: Boolean = false,
             epochs: Map[String, Double] = Map.empty): Audit.EtlRun =
    Audit.audited(spark, "export", s"$wh/etl_run") { (readObs, loadObs) =>
      // token measure for packing: whitespace by default; with bpeTokens
      // the learned merge table loads from the warehouse and becomes a
      // plan-time constant (vocab-sized — a config read, not a data
      // collect, same footing as the source census below)
      val tokens: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        if (bpeTokens) {
          val rules = readTable(spark, s"$wh/bpe_merges").orderBy("rank")
            .select("rule").collect().map(_.getString(0)).toSeq
          Export.bpeTokens(rules)
        } else Export.whitespaceTokens
      val docs = Audit.observed(spark.read.parquet(docsPath), readObs)
      val evalDocs = spark.read.parquet(evalPath)
      // pin: the cleaned slice feeds the source census, both mixture scans,
      // and the packing join — without it the LSH dedup tower would re-run
      // per consumer
      val cleaned = CorpusPipeline.clean(docs, evalDocs, "doc_id", "text",
          CorpusPipeline.Config(chunkLen = 0))
        .transform(graft.core.Materialize.pin)
      // uniform target share per surviving source: "balance the mixture".
      // The census is config-sized (distinct sources), not a data collect.
      val sources = cleaned.select("source").distinct()
        .collect().map(_.getString(0)).sorted
      val targets = sources.map(_ -> 1.0 / sources.length).toMap
      val mixed = Export.mixtureSample(cleaned, "doc_id", "source", targets)
        .filter(col("keep"))
        .select(cleaned.columns.map(col): _*)
      // epochs: the UPSAMPLING half of mixture building — repeat each
      // group per its factor (mixtureRepeat; deterministic md5-band
      // fractional copies). Every copy gets a unique export_id so the
      // packing order, shard layout, and shuffleOrder's md5 sort stay
      // TOTALLY ordered — duplicate keys would tie in the md5 sort and
      // leak reduce-side fetch order into the shard bytes, breaking the
      // byte-identical re-run contract.
      val (toPack, key) =
        if (epochs.isEmpty) (mixed, "doc_id")
        else (Export.mixtureRepeat(mixed, "doc_id", "source", epochs)
                .withColumn("export_id", concat_ws("#", col("doc_id"), col("copy")))
                .drop("epochs", "n_copies"),
              "export_id")
      val packed = Export.packAssignments(toPack, key, "text", nShards, budget, tokens)
      val out = toPack.join(packed.select(key, "n_tokens", "pack"), key)
      val loaded = Audit.observed(out, loadObs)
      val path = s"$wh/export"
      val next = committedVersion(spark, path).getOrElse(0L) + 1
      format match {
        case "parquet" | "orc" =>
          graft.core.Store.writeShards(loaded, s"$path/data_v$next", key,
            nShards, shuffleOrder = true, format = format)
        case "jsonl" =>
          graft.core.Store.writeJsonlShards(loaded, s"$path/data_v$next", key,
            nShards, shuffleOrder = true)
        case other => sys.error(s"export format must be parquet|orc|jsonl, got $other")
      }
      // delivery receipt: manifest computed from the STAGED shards (what
      // actually landed), written as `_manifest` INSIDE the version dir —
      // the leading underscore hides it from shard readers, and the one
      // commit marker below covers shards + receipt atomically. orderBy +
      // coalesce(1) make the manifest file itself byte-deterministic, so
      // the byte-identical re-export contract extends to the receipt. A
      // ZERO-ROW export stages no shard files (nothing to read back, no
      // schema to infer) — it commits with no manifest, and verifyExport
      // treats manifest-less empty versions as trivially verified.
      val stagedDir = s"$path/data_v$next"
      if (hasShardFiles(spark, stagedDir)) {
        val staged = format match {
          case "jsonl" => spark.read.text(stagedDir)
          case f       => spark.read.format(f).load(stagedDir)
        }
        graft.core.Store.shardManifest(staged).orderBy("shard").coalesce(1)
          .write.parquet(s"$stagedDir/_manifest")
      }
      commit(spark, path, next)
    }

  /** Cheap FS check: does the dir hold any non-hidden shard data file?
    * (A zero-row export stages only _SUCCESS — no schema to read back.) */
  private def hasShardFiles(spark: SparkSession, dir: String): Boolean = {
    val it = fs(spark, dir).listFiles(new org.apache.hadoop.fs.Path(dir), true)
    var found = false
    while (it.hasNext && !found) {
      val n = it.next().getPath.getName
      found = !n.startsWith("_") && !n.startsWith(".") &&
        (n.endsWith(".parquet") || n.endsWith(".orc") || n.endsWith(".txt"))
    }
    found
  }

  /** Consumer-side receipt check: recompute Store.shardManifest over the
    * current export version's landed shards and compare to the committed
    * `_manifest`. Returns the diverging shard ids (empty = verified) —
    * the check a downstream trainer runs after transferring an export,
    * proving integrity without trusting file sizes or counts. Works for
    * columnar and jsonl exports alike (the manifest was computed from the
    * same read shape at commit time). */
  def verifyExport(spark: SparkSession, path: String): Seq[String] = {
    val v = committedVersion(spark, path).getOrElse(
      sys.error(s"no committed export at $path"))
    val dir = s"$path/data_v$v"
    val hasManifest = fs(spark, dir)
      .exists(new org.apache.hadoop.fs.Path(s"$dir/_manifest"))
    if (!hasManifest) {
      // a zero-row export commits with no manifest (nothing to receipt);
      // a version with SHARDS but no manifest is a broken commit
      if (hasShardFiles(spark, dir))
        sys.error(s"export version $v at $path holds shards but no _manifest receipt")
      return Seq.empty
    }
    // sniffFormat deliberately errors on text shards (jsonl exports are
    // not columnar tables) — here that same signal routes to the text read
    val landed = scala.util.Try(sniffFormat(spark, dir)) match {
      case scala.util.Success(f) => spark.read.format(f).load(dir)
      case scala.util.Failure(_) => spark.read.text(dir)
    }
    val exp = spark.read.parquet(s"$dir/_manifest")
      .select(col("shard").cast("string").as("shard"), col("n_rows"), col("checksum"))
    val got = graft.core.Store.shardManifest(landed)
      .select(col("shard").cast("string").as("shard"), col("n_rows"), col("checksum"))
    exp.join(got, Seq("shard"), "full_outer")
      .filter(exp("n_rows").isNull || got("n_rows").isNull ||
        exp("n_rows") =!= got("n_rows") || exp("checksum") =!= got("checksum"))
      .select("shard").collect().map(_.getString(0)).toSeq.sorted
  }

  // ---- versioned table layout -------------------------------------------
  //
  // A logical table at `path` is a directory of immutable versioned data
  // dirs plus commit markers:
  //
  //   path/data_v3/...parquet     path/_committed_v3
  //   path/data_v4/...parquet     path/_committed_v4   <- current
  //
  // Readers resolve max(committed version); writers stage data_v{N+1} fully,
  // then create the marker (one atomic file create = the commit point), then
  // prune superseded versions. A crash anywhere before the marker leaves the
  // old version untouched and readable — unlike the previous
  // stage-then-overwrite double-write, which destroyed the live table if
  // the process died between the two writes. This also solves
  // read-modify-write on the same logical table without a materialization
  // barrier (the new version is a DIFFERENT directory than the one the
  // plan reads), and halves the write volume (one data write, not two).

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def committedVersion(spark: SparkSession, path: String): Option[Long] = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val f = fs(spark, path)
    if (!f.exists(dir)) None
    else f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("_committed_v") => n.drop("_committed_v".length).toLong }
      .maxOption
  }

  /** Resolve the current committed version of a versioned table. The data
    * format is self-describing: the reader sniffs the staged files'
    * extension (.orc vs .parquet), so a table can be written in either
    * format — or migrate between them across versions — with no catalog. */
  def readTable(spark: SparkSession, path: String): DataFrame =
    committedVersion(spark, path) match {
      case Some(v) =>
        val dir = s"$path/data_v$v"
        spark.read.format(sniffFormat(spark, dir)).load(dir)
      case None => sys.error(s"no committed version at $path — run `init` first")
    }

  private def sniffFormat(spark: SparkSession, dataDir: String): String = {
    val it = fs(spark, dataDir).listFiles(new org.apache.hadoop.fs.Path(dataDir), true)
    var fmt = "parquet"
    var found = false
    // hidden = any path segment BELOW dataDir starting with _ or .
    // (the _manifest receipt, _SUCCESS, ...): Spark's readers ignore
    // those, so the sniff must too — a jsonl export's parquet receipt
    // must not masquerade as the table. Only segments below dataDir
    // count: a warehouse that happens to LIVE under /data/_staging/...
    // must not have every file skipped by its ancestors' names.
    // qualify base through the SAME filesystem as the listed paths so a
    // RELATIVE dataDir still strips — otherwise every ancestor segment
    // would be re-included in the hidden check (a cwd under /x/.cache/
    // would classify all files hidden and silently fall back to parquet)
    val base = fs(spark, dataDir)
      .makeQualified(new org.apache.hadoop.fs.Path(dataDir))
      .toUri.getPath.stripSuffix("/")
    def hiddenBelowBase(p: org.apache.hadoop.fs.Path): Boolean = {
      val rel = p.toUri.getPath.stripPrefix(base).stripPrefix("/")
      rel.split('/').exists(s => s.startsWith("_") || s.startsWith("."))
    }
    while (it.hasNext && !found) {
      val p = it.next().getPath
      val n = p.getName
      if (hiddenBelowBase(p)) ()
      else if (n.endsWith(".orc")) { fmt = "orc"; found = true }
      else if (n.endsWith(".parquet")) found = true
      else if (n.endsWith(".txt") || n.endsWith(".json")) sys.error(
        s"table at $dataDir holds text shards (jsonl export) — jsonl exports " +
          "are trainer interchange files, not readTable/compact-compatible " +
          "columnar tables; read them with spark.read.text/json directly")
    }
    fmt
  }

  /** Stage the next version's data dir WITHOUT committing it (the spec's
    * crash-simulation seam; writeBack = stage + commit + prune). */
  private[graft] def stage(df: DataFrame, path: String,
                           format: String = "parquet",
                           partitionBy: Seq[String] = Nil): Long = {
    val next = committedVersion(df.sparkSession, path).getOrElse(0L) + 1
    df.write.mode(SaveMode.Overwrite).format(format)
      .partitionBy(partitionBy: _*).save(s"$path/data_v$next")
    next
  }

  /** The current committed data dir of a versioned table — for consumers
    * that must read by PATH rather than DataFrame (the cell-partitioned
    * index probes prune partitions off a static path filter). A path with
    * no commit marker resolves to ITSELF, so raw directory layouts (run-
    * scoped memo artifacts, legacy indexes) keep working unchanged. */
  def resolveDataDir(spark: SparkSession, path: String): String =
    committedVersion(spark, path) match {
      case Some(v) => s"$path/data_v$v"
      case None    => path
    }

  /** All committed versions at `path`, ascending. */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val f = fs(spark, path)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("_committed_v") => n.drop("_committed_v".length).toLong }
      .sorted
  }

  /** Time-travel read: a SPECIFIC committed version (readTable resolves the
    * newest). Versions exist while retention keeps them — writeTable's
    * `retain` bounds how far back a reader can travel, and vacuum prunes
    * explicitly. Storage cost is retain × table size (versions share no
    * files), which is why retain defaults to 1: history is an opt-in cost
    * the operator sizes, exactly like lakehouse VACUUM retention. */
  def readTableAt(spark: SparkSession, path: String, version: Long): DataFrame = {
    val f = fs(spark, path)
    if (!f.exists(new org.apache.hadoop.fs.Path(s"$path/_committed_v$version")))
      sys.error(s"version $version at $path is not committed (vacuumed or never " +
        s"written; committed: ${versions(spark, path).mkString(",")})")
    val dir = s"$path/data_v$version"
    spark.read.format(sniffFormat(spark, dir)).load(dir)
  }

  /** Version diff — the "what changed since the last export" audit over a
    * versioned table's retained history: rows keyed by `keyCol`, change
    * classified by comparing an md5 fingerprint of ALL other columns
    * (md5 of the to_json'd struct, fields sorted by name — field names in
    * the JSON make the encoding unambiguous across column boundaries and
    * null-safe, and schema-order-independent). Output (key, change) with
    * change in added | removed | changed; unchanged rows are dropped —
    * the diff is sized by the churn, not the table. Scale shape: each
    * side reduces to (key, 32-hex fingerprint) IN the scan projection, so
    * the one full-outer join shuffles 40-byte rows — never payloads — and
    * at 100 TB the diff costs two scans plus a churn-sized join. */
  def diffVersions(spark: SparkSession, path: String, keyCol: String,
                   vOld: Long, vNew: Long): DataFrame = {
    def fp(df: DataFrame, as: String) = {
      val others = df.columns.filterNot(_ == keyCol).sorted
      require(others.nonEmpty, s"table at $path has no non-key columns to diff")
      df.select(col(keyCol),
        md5(to_json(struct(others.map(col): _*))).as(as))
    }
    fp(readTableAt(spark, path, vOld), "__fp_old")
      .join(fp(readTableAt(spark, path, vNew), "__fp_new"), Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("__fp_old").isNull, lit("added"))
          .when(col("__fp_new").isNull, lit("removed"))
          .when(col("__fp_old") =!= col("__fp_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("change"))
      .filter(col("change") =!= "unchanged")
  }

  /** Drop all but the newest `retain` committed versions, plus any
    * abandoned (never-committed) stage dirs. Single-maintenance-window
    * assumption as compact: don't vacuum while a writer is staging. */
  def vacuum(spark: SparkSession, path: String, retain: Int = 1): Unit = {
    require(retain >= 1, s"retain must be >= 1, got $retain")
    val keep = versions(spark, path).takeRight(retain).toSet
    if (keep.isEmpty) sys.error(s"no committed version at $path — nothing to vacuum")
    prune(spark, path, keep)
  }

  private def prune(spark: SparkSession, path: String, keep: Set[Long]): Unit = {
    val f = fs(spark, path)
    f.listStatus(new org.apache.hadoop.fs.Path(path)).foreach { st =>
      val n = st.getPath.getName
      val stale =
        (n.startsWith("_committed_v") && !keep(n.drop("_committed_v".length).toLong)) ||
        (n.startsWith("data_v") && !keep(n.drop("data_v".length).toLong))
      if (stale) f.delete(st.getPath, true)
    }
  }

  private[graft] def commit(spark: SparkSession, path: String, version: Long,
                            retain: Int = 1): Unit = {
    require(retain >= 1, s"retain must be >= 1, got $retain")
    val f = fs(spark, path)
    f.create(new org.apache.hadoop.fs.Path(s"$path/_committed_v$version"), true).close()
    // keep the newest `retain` committed versions (the one just committed
    // included); prune the rest + abandoned stage dirs
    prune(spark, path, versions(spark, path).takeRight(retain).toSet + version)
  }

  /** Atomically replace the table at `path` with `df` (stage + commit +
    * prune). Public: the streaming upsert sink and any bespoke loader use
    * the same commit protocol as the ETL. `format` is parquet or orc —
    * readers sniff it back, so the choice is per-version, not per-table.
    * `retain` keeps that many committed versions readable via readTableAt
    * (time travel); the default keeps only the new current. `partitionBy`
    * lays the staged data out hive-partitioned (e.g. the binary-IVF probe
    * layout partitioned by cell) — readTable discovers the partitions;
    * path-based probes resolve the dir via [[resolveDataDir]]. */
  def writeTable(df: DataFrame, path: String, format: String = "parquet",
                 retain: Int = 1, partitionBy: Seq[String] = Nil): Unit = {
    require(graft.core.Store.Formats(format), s"unsupported table format $format")
    commit(df.sparkSession, path, stage(df, path, format, partitionBy), retain)
  }

  // ---- epoch-partitioned versioned tables --------------------------------
  //
  // A table whose data accretes in INGEST EPOCHS (one per streaming
  // micro-batch / daily increment) is laid out as independent versioned
  // tables, one per epoch directory:
  //
  //   path/epoch=0/data_v1/...  path/epoch=0/_committed_v1
  //   path/epoch=7/data_v1/...  path/epoch=7/_committed_v1
  //
  // Appending epoch N stages + commits ONLY path/epoch=N — commit compute
  // and I/O are O(|batch|), prior epochs' files are never rewritten or even
  // listed by the writer. Each epoch dir carries the SAME atomic marker
  // protocol as a flat table (writeTable), so a replayed epoch rewrites its
  // own directory idempotently (new version, identical deterministic
  // content) and a crash mid-append leaves every other epoch readable.
  // This is the 100 TB ingest posture: the flat-table alternative
  // (union + rewrite per batch) is O(|corpus|) per increment.
  //
  // NAMESPACE RULE: `epoch=N` ids belong to the INGEST stream (N = the
  // checkpoint batchId; idempotent replace is the replay contract).
  // Maintenance jobs (hot-cell split relabels) must never write there —
  // the stream's next batch would silently replace them — so they get
  // their own epoch table under `<table>/maintenance` (invisible to this
  // lister, untouched by compaction) and full-index readers go through
  // readIndexWithMaintenance.

  /** Append `df` as ingest epoch `epoch` of the table at `path` — an
    * atomic commit scoped to that one epoch's directory. Re-appending an
    * existing epoch replaces it (idempotent replay). */
  def appendEpoch(df: DataFrame, path: String, epoch: Long,
                  format: String = "parquet"): Unit =
    writeTable(df, s"$path/epoch=$epoch", format)

  /** Epoch ceiling covered by the newest epoch-compaction fencepost, if
    * any (`_epochs_compacted_E` top-level marker — see compactEpochs). */
  private def epochsCompactedThrough(spark: SparkSession, path: String): Option[Long] = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val f = fs(spark, path)
    if (!f.exists(dir)) None
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("_epochs_compacted_") =>
        n.drop("_epochs_compacted_".length).toLong }
      .maxOption
  }

  /** Epochs of `path` that have a committed version AND are not superseded
    * by an epoch compaction, ascending. Driver-side metadata listing only
    * (one dir list + one marker probe per epoch). */
  def committedEpochs(spark: SparkSession, path: String): Seq[Long] = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val f = fs(spark, path)
    val floor = epochsCompactedThrough(spark, path).getOrElse(Long.MinValue)
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("epoch=") => n.drop("epoch=".length).toLong }
      .filter(e => e > floor && committedVersion(spark, s"$path/epoch=$e").isDefined)
      .sorted
  }

  /** Has ingest epoch `epoch` of the table at `path` already committed —
    * either directly (its own version marker) or by being folded behind a
    * compaction fencepost? This is the streaming sinks' replay guard for
    * batches whose COMMITTED output is a strict subset of their input
    * (curation drops docs): a redelivered batch must detect "my fencepost
    * epoch exists" and no-op, because recomputing from `input minus
    * committed-output` would see only the previously-dropped rows and
    * overwrite the epoch with garbage. */
  def epochCommitted(spark: SparkSession, path: String, epoch: Long): Boolean =
    epochsCompactedThrough(spark, path).exists(_ >= epoch) ||
      committedVersion(spark, s"$path/epoch=$epoch").isDefined

  /** Read the union of every committed epoch of the table at `path` (the
    * epoch-partitioned analog of readTable): the newest compaction's
    * folded data, plus every epoch appended after it. Errors when no epoch
    * has ever committed. */
  def readEpochTable(spark: SparkSession, path: String,
                     mergeSchema: Boolean = false): DataFrame = {
    val compacted = epochsCompactedThrough(spark, path).map { e =>
      val p = s"$path/compact=$e"
      s"$p/data_v${committedVersion(spark, p).get}"
    }
    val dirs = compacted.toSeq ++ committedEpochs(spark, path).map { e =>
      val p = s"$path/epoch=$e"
      s"$p/data_v${committedVersion(spark, p).get}"
    }
    if (dirs.isEmpty) sys.error(s"no committed epochs at $path — nothing ingested yet")
    // mergeSchema: for SMALL evolving tables (the drift log grew
    // max_cell_share mid-stream) where the default pick-one-footer schema
    // would make column visibility depend on which epoch's file wins;
    // indexes stay on the cheap path — their schema never evolves
    spark.read.format(sniffFormat(spark, dirs.head))
      .option("mergeSchema", mergeSchema.toString).load(dirs: _*)
  }

  /** [[readEpochTable]] with each row tagged by the ingest epoch it
    * arrived in (`__epoch`) — the latest-wins ordering a retrain's
    * one-copy-per-id dedupe needs (an id RE-INGESTED with an updated
    * vector must retrain on the newest copy, not the lexicographically
    * largest). Rows folded behind a compaction fencepost E carry E:
    * per-row origin is not recoverable post-fold, but every epoch still
    * visible alongside the fold is > E by the compaction protocol, so
    * cross-fold ordering is exact and only same-fold duplicates fall
    * back to the caller's tiebreak. */
  private[graft] def readEpochTableTagged(spark: SparkSession, path: String): DataFrame = {
    val dirs = epochsCompactedThrough(spark, path).map { e =>
      val p = s"$path/compact=$e"
      (e, s"$p/data_v${committedVersion(spark, p).get}")
    }.toSeq ++ committedEpochs(spark, path).map { e =>
      val p = s"$path/epoch=$e"
      (e, s"$p/data_v${committedVersion(spark, p).get}")
    }
    if (dirs.isEmpty) sys.error(s"no committed epochs at $path — nothing ingested yet")
    // allowMissingColumns: epoch logs evolve (the graph's edge log grew
    // nid_bucket/src_bucket mid-life) and a log is immutable history — a
    // strict union would make every read of a pre-evolution table throw
    // the moment one new-schema epoch lands, bricking the incremental
    // path for exactly the graphs that predate the upgrade. Rows from
    // pre-evolution epochs carry null in the new columns; every consumer
    // of an evolved column treats null as "absent" (the pruning hints'
    // unpruned fallback, the compactor's recompute-from-nodes fill).
    dirs.map { case (e, d) =>
      spark.read.format(sniffFormat(spark, d)).load(d)
        .withColumn("__epoch", lit(e))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Fold every visible epoch (plus any prior compaction) of the table at
    * `path` into one size-targeted `compact=E` dir — the maintenance
    * counterpart of the streaming sinks' O(batch) epoch appends. A year of
    * 5-minute micro-batches is ~100k epoch dirs whose per-read listing and
    * tiny files eventually dominate scan cost; compaction folds them back
    * to ~table-size/targetFileBytes files without ever blocking the
    * writer.
    *
    * Protocol: the folded union stages + commits under `compact=E` (E =
    * newest folded epoch) via the same versioned-marker protocol as any
    * table, INVISIBLE to readers; the top-level `_epochs_compacted_E`
    * fencepost — one atomic file create, same primitive as the version
    * markers — then flips reads to (compact=E) ∪ (epochs > E). A crash
    * anywhere before the fencepost leaves the old view fully intact; a
    * crash after it loses nothing (superseded dirs are garbage, not
    * truth). Safe against a concurrently-running sink: the stream only
    * appends NEW epochs (> E by construction), which stay visible through
    * the filter; a checkpoint-replayed epoch ≤ E re-appends byte-identical
    * content whose rows compact=E already holds. Superseded dirs are
    * reclaimed lazily by vacuumEpochs, never inline, so concurrent readers
    * mid-plan keep their files. */
  /** Marker a sink plants in an epoch table whose READ semantics are
    * latest-epoch-wins (not union-of-epochs): the generic fold below
    * erases per-row epoch provenance, so compacting such a table keeps
    * superseded copies alive in every read — silent corruption, refused
    * here by reading the marker's own message. The marker's CONTENT
    * names the table's blessed fold. */
  private[graft] val CompactionUnsafeMarker = "_compaction_unsafe"

  private[graft] def markCompactionUnsafe(spark: SparkSession, path: String,
                                          reason: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/$CompactionUnsafeMarker")
    val f = fs(spark, path)
    if (!f.exists(p)) {
      val out = f.create(p, true)
      out.write(reason.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.close()
    }
  }

  def compactEpochs(spark: SparkSession, path: String,
                    format: String = "parquet",
                    targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val marker = new org.apache.hadoop.fs.Path(s"$path/$CompactionUnsafeMarker")
    if (fs(spark, path).exists(marker)) {
      val in = fs(spark, path).open(marker)
      val reason = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                   finally in.close()
      sys.error(s"epoch table at $path is marked compaction-unsafe: $reason")
    }
    val live = committedEpochs(spark, path)
    if (live.isEmpty) return // nothing appended since the last fold
    val upTo = live.max
    // ONE consistent snapshot: resolve every source data dir from the same
    // `live` listing that defined upTo, and build the union from those
    // paths directly. (Calling readEpochTable here would re-list the
    // directory — a sink committing epoch upTo+1 between the two listings
    // would fold its rows into compact=upTo while epoch=upTo+1 stays
    // visible past the fencepost, double-counting them in every read.)
    val dataDirs = (epochsCompactedThrough(spark, path).map(e => s"$path/compact=$e").toSeq ++
      live.map(e => s"$path/epoch=$e"))
      .map(d => s"$d/data_v${committedVersion(spark, d).get}")
    val union = spark.read.format(sniffFormat(spark, dataDirs.head)).load(dataDirs: _*)
    val bytes = dataDirs.map { p =>
      fs(spark, path).getContentSummary(new org.apache.hadoop.fs.Path(p)).getLength
    }.sum
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    writeTable(union.coalesce(nFiles), s"$path/compact=$upTo", format)
    fs(spark, path)
      .create(new org.apache.hadoop.fs.Path(s"$path/_epochs_compacted_$upTo"), true)
      .close()
  }

  /** Reclaim epoch/compact dirs superseded by the newest compaction
    * fencepost (the epoch-table vacuum; run it when no reader still holds
    * a pre-compaction plan). */
  def vacuumEpochs(spark: SparkSession, path: String): Unit =
    epochsCompactedThrough(spark, path).foreach { e =>
      val f = fs(spark, path)
      f.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq.foreach { st =>
        val n = st.getPath.getName
        val stale =
          (n.startsWith("epoch=") && n.drop("epoch=".length).toLong <= e) ||
          (n.startsWith("compact=") && n.drop("compact=".length).toLong < e) ||
          (n.startsWith("_epochs_compacted_") &&
            n.drop("_epochs_compacted_".length).toLong < e)
        if (stale) f.delete(st.getPath, true)
      }
    }

  /** Small-files compaction (the OPTIMIZE of this warehouse): rewrite the
    * current version into ceil(bytes / targetFileBytes) files via the same
    * atomic stage+commit, so readers never see a half-compacted table.
    * Streaming upserts and frequent small batches accrete one file per
    * shuffle partition per write — at 100 TB unbounded file counts rot
    * scan planning and open-cost; compaction restores a healthy layout. */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val v = committedVersion(spark, path)
      .getOrElse(sys.error(s"no committed version at $path"))
    val dataDir = new org.apache.hadoop.fs.Path(s"$path/data_v$v")
    val bytes = fs(spark, path).getContentSummary(dataDir).getLength
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    writeTable(readTable(spark, path).coalesce(nFiles), path)
  }

  private def writeBack(df: DataFrame, path: String): Unit = writeTable(df, path)

  /** The reference `quality` command: null counts + orphan bridge rows. */
  def quality(spark: SparkSession, wh: String): DataFrame = {
    val issues = readTable(spark, issuesPath(wh))
    val bridge = readTable(spark, bridgePath(wh))
    val nullDates = issues.filter(col("onsale_date").isNull)
      .agg(count(lit(1)).as("issues_null_onsale_date"))
    val orphans = Relational.orphans(bridge, issues, "marvel_comic_id", "marvel_comic_id")
      .agg(count(lit(1)).as("orphan_credit_rows"))
    nullDates.crossJoin(orphans)
  }

  /** The reference `stats` command: top titles by credit count. */
  def stats(spark: SparkSession, wh: String, top: Int): DataFrame = {
    val issues = readTable(spark, issuesPath(wh))
    val bridge = readTable(spark, bridgePath(wh))
    Relational.topKByCount(
      bridge.join(broadcast(issues), "marvel_comic_id"),
      col("title"), top, "credit_count")
  }
}
