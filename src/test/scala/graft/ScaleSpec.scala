package graft

import graft.core.Tables.t
import org.apache.spark.sql.functions._

/** Evidence for the 100 TB posture that PlanSpec's per-query assertions
  * don't cover: Spark's runtime bloom-filter injection prunes the big side
  * of a shuffle join before the exchange when the other side carries a
  * selective filter. On a cluster this is the difference between shuffling
  * the full fact table and shuffling only rows that can possibly match.
  */
class ScaleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // Thresholds sized for the test fixture: production defaults (10M-row
    // creation side / 10 GB application side) make this fire only at real
    // fact-table scale, which is exactly the point.
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val li = t(spark, sf, "lineitem")
      val ord = t(spark, sf, "orders").filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy(ord("o_orderpriority")).agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"runtime bloom filter not injected:\n$optimized")
      // and the pruned plan still computes the right answer
      val n = joined.collect().head.getLong(1)
      val expected = li.join(ord, li("l_orderkey") === ord("o_orderkey")).count()
      assert(n == expected)
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true in final plan)") {
    import spark.implicits._
    // one hot key carrying ~98% of the left side's bytes — the classic
    // power-law shape (one viral user / one boilerplate domain). Thresholds
    // scaled to fixture bytes; production defaults (256MB/partition) fire
    // at real scale. Salting (Relational.saltedJoin) remains the static
    // fallback when AQE is off or the skew is inside one key.
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      // per-row md5 payload: shuffle blocks are lz4-compressed, so a
      // constant pad would compress the "skewed" partition under the
      // detection threshold — skew is about BYTES, not rows
      val left = spark.range(50100)
        .select(when(col("id") < 50000, 0L).otherwise(col("id") - 49999).as("k"),
          concat(md5(col("id").cast("string")),
            md5((col("id") + 1).cast("string")),
            md5((col("id") + 2).cast("string"))).as("payload"))
      val right = (0L to 100L).toDF("k").withColumn("r", col("k") * 2)
      // collect() (not count()) so THIS queryExecution is the one that
      // runs — count() would build a separate, aggregate-shaped plan
      val joined = left.join(right, "k")
      assert(joined.collect().length == 50000 + 100)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$finalPlan")
    }
  }

  test("incremental-dedup probe of a BUCKETED band index shuffles only the batch") {
    // The production composition at 100 TB: the persisted band index is
    // O(corpus)-sized and accretes daily; bucketing it by band at write
    // time means every later probe joins it IN PLACE — the only runtime
    // exchange on the band key is the O(batch) side. (When the batch is
    // tiny AQE would broadcast it instead; both plans leave the index
    // unmoved, this asserts the general big-batch shape.)
    val db = "graft_bandidx_spec"
    val loc = java.nio.file.Files.createTempDirectory("bandidx_wh").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$loc'")
    try {
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
               "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
        val docs = t(spark, sf, "documents").select(col("doc_id"), col("text"))
        val corpus = docs.filter(col("doc_id") % 4 =!= 0)
        val batch = docs.filter(col("doc_id") % 4 === 0)
        graft.operators.Dedup.signBands(corpus, "doc_id", "text",
            k = 9, numHashes = 8, bandSize = 2)
          .write.bucketBy(4, "band").sortBy("band")
          .mode("overwrite").saveAsTable(s"$db.band_idx")
        val idx = spark.table(s"$db.band_idx")
        val probe = graft.operators.Dedup.signBands(batch, "doc_id", "text",
            k = 9, numHashes = 8, bandSize = 2)
          .join(idx.withColumnRenamed("doc_id", "corpus_doc"), "band")
        val p = probe.queryExecution.executedPlan.toString
        val bandExchanges = "Exchange hashpartitioning\\(band".r.findAllIn(p).size
        assert(bandExchanges == 1, s"expected ONE band exchange (batch side only):\n$p")
        assert(probe.count() > 0)
      }
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }

  test("phrase search probes a persisted term-bucketed postings index with bucket-pruned scans") {
    // The retrieval composition at 100 TB: positional postings are
    // O(corpus)-sized and built ONCE; bucketing by term at write time
    // means each phrase-term probe reads only its term's bucket (bucket
    // pruning at the scan — SelectedBucketsCount in the plan), never the
    // whole index, and the (doc, pos') join tower runs over those pruned
    // slices. Term-partitioned dirs would explode at web vocab sizes;
    // buckets stay fixed-width.
    val db = "graft_postings_spec"
    val loc = java.nio.file.Files.createTempDirectory("postings_wh").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$loc'")
    try {
      val docs = t(spark, sf, "documents").select(col("doc_id"), col("text"))
      graft.operators.TextAnalysis.positionalPostings(docs, "doc_id", "text")
        .write.bucketBy(8, "term").sortBy("term")
        .mode("overwrite").saveAsTable(s"$db.postings")
      val post = spark.table(s"$db.postings")
      val phrase = Seq("big", "order", "scan")
      import spark.implicits._
      val probed = graft.operators.TextAnalysis.phraseSearchFromPostings(
        post, "doc_id", phrase.mkString(" "))
      val p = probed.queryExecution.executedPlan.toString
      // <= 3 buckets (3 terms; fewer if two hash together), exactly one scan
      assert("SelectedBucketsCount: [123] out of 8".r.findAllIn(p).size == 1,
        s"the one probe scan must prune to the phrase terms' buckets:\n$p")
      // and the index probe returns exactly the from-scratch operator's counts
      import spark.implicits._
      val viaIndex = probed.as[(Long, Long)].collect().toSet
      val fromScratch = graft.operators.TextAnalysis
        .phraseSearch(docs, "doc_id", "text", phrase.mkString(" "))
        .as[(Long, Long)].collect().toSet
      assert(viaIndex == fromScratch && viaIndex.nonEmpty)
      // BATCH probe: N phrases, still ONE scan, pruned to the UNION of
      // the phrases' terms — the decontamination-list production shape
      val phrases = Seq(phrase.mkString(" "), "slow hash")
      val batch = graft.operators.TextAnalysis.phraseSearchBatch(
        post, "doc_id", phrases)
      val bp = batch.queryExecution.executedPlan.toString
      assert("SelectedBucketsCount: [1-5] out of 8".r.findAllIn(bp).size == 1,
        s"the batch probe must stay ONE bucket-pruned scan:\n$bp")
      val batchRows = batch.select("phrase", "doc_id", "n_matches")
        .as[(String, Long, Long)].collect().toSet
      val oneByOne = phrases.flatMap { p =>
        graft.operators.TextAnalysis.phraseSearch(docs, "doc_id", "text", p)
          .as[(Long, Long)].collect().map { case (d, n) => (p, d, n) }
      }.toSet
      assert(batchRows == oneByOne && batchRows.nonEmpty)
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }

  test("incremental ANN index: new batch encodes against the persisted codebook, append-only") {
    // The ANN analog of the incremental-dedup composition: train the PQ
    // codebook ONCE on the initial corpus and persist it; every later
    // embedding batch encodes against the stored codebook in a MAP-ONLY
    // pass (in-row argmin — no shuffle, no retraining) and its codes
    // append through the versioned warehouse. PQ codes are a pure
    // per-vector function of (codebook, vector), so incremental equals
    // from-scratch EXACTLY — asserted, not approximated.
    val wh = java.nio.file.Files.createTempDirectory("ann_idx").toString
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") % 4 =!= 0)
    val batch = emb.filter(col("vec_id") % 4 === 0)
    // day 0: train + encode corpus, persist both
    val cb0 = graft.operators.Similarity.pqCodebook(corpus, "vec_id", "embedding",
      m = 8, ksub = 16, iters = 2)
    graft.tools.EtlCli.writeTable(cb0, s"$wh/codebook")
    graft.tools.EtlCli.writeTable(
      graft.operators.Similarity.pqEncode(corpus, "vec_id", "embedding", cb0, m = 8),
      s"$wh/codes")
    // day 1: batch encodes against the STORED codebook; codes append
    val cb = graft.tools.EtlCli.readTable(spark, s"$wh/codebook")
    val newCodes = graft.operators.Similarity.pqEncode(batch, "vec_id", "embedding", cb, m = 8)
    graft.tools.EtlCli.writeTable(
      graft.tools.EtlCli.readTable(spark, s"$wh/codes").unionByName(newCodes),
      s"$wh/codes")
    // equality with a from-scratch encode of the union under the same codebook
    val incr = graft.tools.EtlCli.readTable(spark, s"$wh/codes")
      .select(col("vid"), col("codes").cast("array<long>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    val scratch = graft.operators.Similarity.pqEncode(emb, "vec_id", "embedding", cb, m = 8)
      .select(col("vid"), col("codes").cast("array<long>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    assert(incr.toSeq == scratch.toSeq)
  }

  test("the end-to-end curation pipeline is run-to-run deterministic") {
    // q_corpus_clean chains five stages (gates -> exact dedup -> LSH CC
    // dedup -> decontaminate -> chunk) through pins and iterative CC —
    // exactly where hidden nondeterminism (partition-order survivors,
    // unconverged labels) would hide. Two full evaluations must collect
    // bit-identical results.
    def run() = SparkEntry.queries("q_corpus_clean")(spark, sf)
      .collect().map(_.toString).toSeq
    val a = run()
    assert(a.nonEmpty)
    assert(run() == a, "curation pipeline results differ between runs")
  }

  test("run-scoped ANN artifacts rebuild on a scale-factor switch (no stale reads)") {
    // q_pq_adc / q_ann_ivfpq_res persist artifacts at a FIXED path (the
    // static oracle SQL embeds it) with a dir-switch-invalidated memo; a
    // stale memo would silently score dir A's queries against dir B's
    // codebook. Drive dir1 -> dir2 -> dir1 and require the third result
    // to equal the first bit-for-bit.
    def run(dir: String) =
      SparkEntry.queries("q_pq_adc")(spark, dir)
        .collect().map(_.toString).toSeq
    val first = run("/root/testdata/sf0.001")
    val other = run("/root/testdata/sf0.01")
    assert(other != first, "distinct scale factors should rank differently")
    assert(run("/root/testdata/sf0.001") == first,
      "switching back must rebuild the artifacts, not reuse the other dir's")
  }

  test("PQ codebook training is capped: k-means input is exactly the hash-rank sample") {
    // Training on trainCap=N over the full corpus must equal training
    // UNCAPPED on just the N hash-rank-first vectors — proving the k-means
    // never reads past the sample (at 100 TB that is the difference
    // between iters x O(cap) and iters x full-corpus scans), while seeds
    // (the ksub-prefix of the SAME ranking) stay inside the sample.
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cap = 50
    val sampleIds = emb.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(cap).select("vec_id")
    val sample = emb.join(broadcast(sampleIds), "vec_id")
    assert(sample.count() == cap && emb.count() > cap,
      "fixture must be larger than the training cap for this test to bite")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("sub"), col("cc"), col("cv").cast("array<double>"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
        .sortBy(t => (t._1, t._2))
    val capped = canon(graft.operators.Similarity.pqCodebook(
      emb, "vec_id", "embedding", m = 8, ksub = 16, iters = 2, trainCap = cap))
    val sampleOnly = canon(graft.operators.Similarity.pqCodebook(
      sample, "vec_id", "embedding", m = 8, ksub = 16, iters = 2, trainCap = cap))
    assert(capped.toSeq == sampleOnly.toSeq,
      "capped training must be a pure function of the hash-rank sample")
  }

  test("bucketed fact-fact join is co-located: no exchange, no sort") {
    // Bucketing pre-shuffles at WRITE time: both sides hash-bucketed on the
    // join key join with zero runtime exchanges — at 100 TB this converts
    // the recurring fact-fact shuffle into a one-time layout cost.
    val db = "graft_bucket_spec"
    val loc = java.nio.file.Files.createTempDirectory("bucket_wh").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$loc'")
    try {
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
               "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
        t(spark, sf, "lineitem").write
          .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
          .mode("overwrite").saveAsTable(s"$db.li_b")
        t(spark, sf, "orders").write
          .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
          .mode("overwrite").saveAsTable(s"$db.ord_b")
        val joined = spark.table(s"$db.li_b")
          .join(spark.table(s"$db.ord_b"), col("l_orderkey") === col("o_orderkey"))
        val p = joined.queryExecution.executedPlan.toString
        assert(!p.contains("Exchange hashpartitioning"),
          s"bucketed join still shuffles:\n$p")
        assert(joined.count() ==
          t(spark, sf, "lineitem").join(t(spark, sf, "orders"),
            col("l_orderkey") === col("o_orderkey")).count())
      }
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }
}
