package graft.operators

import graft.core.Store
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data export operators: sequence packing and mixture
  * resampling — the last mile between a cleaned corpus and a trainer.
  *
  * Both are deterministic (hash bands, no RNG state), so a re-run after a
  * failure produces byte-identical shards — the same idempotency contract
  * as the reference's upsert ETL (`/root/reference/etl/load.py`), applied
  * to corpus exports.
  */
object Export {

  /** Assign each document to a fixed-token-budget pack within its hash
    * shard: documents are laid out in stable (shard, key) order, and a
    * pack is the run of consecutive documents whose cumulative token
    * count starts inside the same budget window — the streaming-friendly
    * variant of greedy bin packing (no global sort, no driver state).
    *
    * Scale shape: ONE shuffle, on shard. The running sum is sequential
    * per shard, so parallelism = nShards — at 100 TB you raise nShards
    * (Store.shardId supports up to 65536 via its two-level hex band, so
    * the per-shard sequential scan stays single-task-sized) and packs
    * stay independent across shards by construction. `budget` must be a
    * power of two so the floor-division is FP-exact on every engine.
    */
  def packAssignments(docs: DataFrame, keyCol: String, textCol: String,
                      nShards: Int, budget: Int,
                      tokens: Column => Column = whitespaceTokens,
                      sortByWeight: Boolean = false): DataFrame =
    packByWeight(
      docs.withColumn("n_tokens", tokens(col(textCol))),
      keyCol, "n_tokens", nShards, budget, sortByWeight)
      .select(col(keyCol), col("shard"), col("n_tokens"), col("pack"))

  /** Default packing weight: whitespace token count. */
  def whitespaceTokens: Column => Column = c => size(split(c, " ")).cast("long")

  /** Packing weight measured in REAL tokens: BPE encode under a learned
    * merge table (Tokenize.learnBpeMerges output, rules in rank order) —
    * what a trainer's sequence budget actually means. Map-only like the
    * default (the merge table is a plan-time constant). */
  def bpeTokens(merges: Seq[String]): Column => Column =
    c => size(graft.plans.GraftFunctions.bpe_encode(c, merges)).cast("long")

  /** The general packing core: any non-negative long weight column —
    * token counts for trainer sequences, payload bytes for inference
    * micro-batches (Multimodal.batchForInference). Same scale shape as
    * packAssignments (one shuffle on shard; per-shard running sum).
    *
    * `sortByWeight` lays each shard out in (weight DESC, key) order
    * before the running sum — length-sorted batching: a pack then holds
    * similar-length items, which is what bounds PADDING waste when the
    * consumer pads to the longest member (inference micro-batches,
    * un-concatenated trainer batches). Default keeps key order (best for
    * concatenation-style packing where only fill matters). Both orders
    * are total, so either way re-runs are deterministic. */
  def packByWeight(df: DataFrame, keyCol: String, weightCol: String,
                   nShards: Int, budget: Long,
                   sortByWeight: Boolean = false): DataFrame = {
    require(budget > 0 && (budget & (budget - 1)) == 0, s"budget must be a power of two, got $budget")
    val order =
      if (sortByWeight) Seq(col(weightCol).desc, col(keyCol))
      else Seq(col(keyCol))
    val w = Window.partitionBy("shard").orderBy(order: _*)
    df.withColumn("shard", Store.shardId(col(keyCol), nShards))
      .withColumn("cum", sum(col(weightCol)).over(w))
      .withColumn("pack", floor((col("cum") - col(weightCol)) / lit(budget.toDouble)))
      .drop("cum")
  }

  /** Deterministic mixture resampling: down-sample each over-represented
    * group so the kept corpus approaches `targets` (group → share summing
    * to ≤ 1). Acceptance rate per group = min(1, target_share · total /
    * group_count); a document is kept when its md5 band (0..255, a pure
    * function of the key) falls under rate·256 — no RNG, so the kept set
    * is stable across runs and machines.
    *
    * Scale shape: the rate table is one row per group (computed from a
    * map-side-partial count aggregate) and broadcasts; the corpus side is
    * a map-only probe+filter. Nothing wider than group counts ever
    * shuffles.
    */
  /** Epoch-weighted repetition — the upsampling half of mixture building
    * (mixtureSample only drops): group g's documents appear
    * floor(epochs(g)) times, plus once more for the deterministic
    * md5-band fraction covering the remainder — so "2.5 epochs of wiki"
    * means every wiki doc twice and a stable half of them a third time.
    * Groups absent from `epochs` default to 1.0 (pass through once);
    * fractional epochs < 1 downsample (floor 0 + fractional band).
    * No RNG: the copy count is a pure function of (key, group), so
    * re-exports are identical and the extra copies are the SAME docs
    * every run (the trainer sees a stable dataset, not a resample).
    *
    * Scale shape: the epochs table broadcasts; the corpus side is one
    * map-only projection + explode — output rows ≈ sum(epochs_g · n_g),
    * exactly the training-set size, nothing wider ever materializes.
    * Output: input columns + epochs + n_copies + copy (1-based). */
  /** Deterministic leakage-free dataset split (train/eval/test): each
    * row's assignment is a pure function of its id — u = the first 48
    * md5 bits as a uniform in [0,1) (the mixtureSample / DSIR
    * hash-uniform trick, no RNG) bucketed by the cumulative rate bounds.
    * Any engine replays the identical split; a document's split NEVER
    * changes as other documents arrive (the stability property
    * row_number / random splits lack — an accreting corpus keeps its
    * historical eval set intact); and train/eval leakage is impossible
    * by construction (one u, disjoint buckets).
    *
    * `splits` are (label, rate) in declared order; rates must sum to 1
    * (within 1e-9) and the LAST label is the unconditional otherwise, so
    * IEEE rounding at the top boundary can never drop a row. Map-only.
    * Returns the input plus (u, split). */
  def hashSplit(docs: DataFrame, keyCol: String,
                splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      s"every split rate must be positive, got $splits")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"split rates must sum to 1, got $total")
    val u = conv(substring(md5(col(keyCol).cast("string")), 1, 12), 16, 10)
      .cast("long").cast("double") / lit(281474976710656.0)
    // cumulative bounds via the same left-to-right IEEE summation an
    // oracle writes as literal additions (0.8e0 + 0.1e0 + ...)
    val bounds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val splitCol =
      if (splits.size == 1) lit(splits.head._1)
      else {
        val first = when(col("u") < lit(bounds.head), lit(splits.head._1))
        splits.tail.init.zip(bounds.tail.init)
          .foldLeft(first) { case (acc, ((label, _), bound)) =>
            acc.when(col("u") < lit(bound), lit(label))
          }
          .otherwise(lit(splits.last._1))
      }
    docs.withColumn("u", u).withColumn("split", splitCol)
  }

  def mixtureRepeat(docs: DataFrame, keyCol: String, groupCol: String,
                    epochs: Map[String, Double]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val eps = epochs.toSeq.toDF(groupCol, "epochs")
    val band = conv(substring(md5(col(keyCol).cast("string")), 1, 2), 16, 10)
      .cast("long")
    docs.join(broadcast(eps), Seq(groupCol), "left_outer")
      .withColumn("epochs", coalesce(col("epochs"), lit(1.0)))
      .withColumn("n_copies",
        floor(col("epochs")).cast("long") +
          when(band < (col("epochs") - floor(col("epochs"))) * lit(256.0), 1L)
            .otherwise(0L))
      // the filter must precede the explode: Spark's sequence(1, 0) is the
      // DESCENDING [1, 0], not empty
      .filter(col("n_copies") > 0)
      .withColumn("copy", explode(sequence(lit(1L), col("n_copies"))))
  }

  def mixtureSample(docs: DataFrame, keyCol: String, groupCol: String,
                    targets: Map[String, Double]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("group_n"))
    val total = counts.agg(sum(col("group_n")).as("total"))
    val rates = counts.crossJoin(broadcast(total)).join(
        broadcast(targets.toSeq.toDF(groupCol, "target_share")), groupCol)
      .withColumn("rate", least(lit(1.0), col("target_share") * col("total") / col("group_n")))
      .select(col(groupCol), col("rate"))
    val band = conv(substring(md5(col(keyCol).cast("string")), 1, 2), 16, 10)
      .cast("long")
    docs.join(broadcast(rates), groupCol)
      .withColumn("keep", band < col("rate") * lit(256.0))
  }

  /** SFT chat-template rendering: assemble (prompt, response) into the
    * trainer's chat format and compute the LOSS-MASK BOUNDARY — the token
    * index where supervised loss starts (everything through the assistant
    * marker is context; only response tokens train). All segments join on
    * single spaces, so under the corpus's whitespace-token convention the
    * masked prefix is token-ALIGNED: rendered tokens =
    * [userMark, prompt..., asstMark, response..., endMark] and the mask is
    * [n_prefix_tokens, n_total_tokens). Returns the input columns plus
    *   rendered        — "userMark prompt asstMark response endMark"
    *   n_prefix_tokens — tokens through asstMark inclusive
    *   n_total_tokens  — tokens of the full rendering
    *
    * Map-only: pure string/concat expressions, no shuffle, safe at any
    * scale; deterministic, so re-exports are byte-identical (the
    * warehouse contract). */
  /** Temperature-scaled mixture shares (the UniMax / multilingual
    * alpha-sampling family at alpha = 1/2): target share of group g is
    * sqrt(n_g) / Σ sqrt(n_h) — big sources are damped, small sources
    * boosted, relative order preserved. alpha = 1/2 is the one
    * temperature whose power is an IEEE-EXACT primitive (sqrt is
    * correctly rounded on every engine; pow(x, 0.3) is libm-dependent and
    * banned from hash-checked paths) — other alphas belong in non-oracle
    * pipelines. The sqrt weights quantize to integers (floor(·1e6 + 0.5))
    * before summing, so the denominator is an exact BIGINT and each share
    * is ONE float division — order-independent, engine-portable.
    *
    * Output: (groupCol, group_n, share) — feed shares into mixtureSample
    * (downsampling) or a token-budget solve into mixtureRepeat (epochs).
    * Scale shape: one partial-agg'd count per group, then arithmetic over
    * the |groups|-row census; the corpus is touched exactly once. */
  def mixtureTemperatureShares(docs: DataFrame, groupCol: String): DataFrame = {
    val counts = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("group_n"))
    val wq = floor(sqrt(col("group_n").cast("double")) * lit(1e6) + lit(0.5))
      .cast("long")
    val weighted = counts.withColumn("__wq", wq)
    val total = weighted.agg(sum(col("__wq")).as("__tot"))
    weighted.crossJoin(broadcast(total))
      .select(col(groupCol), col("group_n"),
        (col("__wq").cast("double") / col("__tot")).as("share"))
  }

  /** Curriculum bucket assignment — the planning step of quality-ordered
    * training (easy→hard, or high→low quality): every doc gets an
    * ntile(nBuckets) bucket within its group, ranked by (score, key) —
    * the key tiebreak makes the rank a TOTAL order, so bucket boundaries
    * are deterministic rank cuts on any engine (no percentile
    * interpolation, no RNG). One window sort per group; the downstream
    * per-bucket rollup partial-aggregates. At 100 TB the per-group sort
    * is the cost — for unbounded groups, pre-bucket by approxMedianPerGroup
    * cuts instead (Stats.scala's escape hatch). */
  def curriculumBuckets(docs: DataFrame, keyCol: String, groupCol: String,
                        score: Column, nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"need >= 2 buckets, got $nBuckets")
    val w = Window.partitionBy(col(groupCol)).orderBy(score, col(keyCol))
    docs.withColumn("bucket", ntile(nBuckets).over(w))
  }

  def renderChatTemplate(df: DataFrame, promptCol: String, responseCol: String,
                         userMark: String = "<|user|>",
                         asstMark: String = "<|assistant|>",
                         endMark: String = "<|end|>"): DataFrame = {
    val prefix = concat_ws(" ", lit(userMark), col(promptCol), lit(asstMark))
    df.withColumn("rendered",
        concat_ws(" ", lit(userMark), col(promptCol), lit(asstMark),
          col(responseCol), lit(endMark)))
      .withColumn("n_prefix_tokens", whitespaceTokens(prefix))
      .withColumn("n_total_tokens", whitespaceTokens(col("rendered")))
  }
}
