package graft.core

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Physical storage layout helpers — the 100 TB posture's write side
  * (SURVEY.md §4: "Parquet storage partitioned by stable keys; bucketing
  * by join key instead of indexes").
  *
  *  - Partitioning by a low-cardinality column (date, region) gives
  *    partition PRUNING: a filtered scan touches only matching
  *    directories (PartitionFilters in the plan, not a post-scan filter).
  *  - Bucketing by a join/agg key pre-shuffles data at write time: two
  *    tables bucketed the same way join with NO exchange on either side —
  *    the reference's unique-index point lookups become co-located joins.
  */
object Store {

  /** Columnar formats the layout helpers accept. Parquet is the default;
    * ORC is the drop-in alternative (both ship in Spark, both carry
    * min/max stats + predicate pushdown, so every layout trick below —
    * pruning, clustering, skipping — works identically). */
  val Formats: Set[String] = Set("parquet", "orc")

  private def checkFormat(format: String): String = {
    require(Formats(format), s"format must be one of $Formats, got $format")
    format
  }

  /** Directory-partitioned columnar files: one dir per distinct partition
    * value. Keep partition columns low-cardinality (day, region, source) —
    * a high-cardinality partition column creates a small-files storm. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       format: String = "parquet"): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*)
      .format(checkFormat(format)).save(path)

  /** Idempotent incremental load: overwrite ONLY the partitions present in
    * `df` (dynamic partition overwrite), leaving all others untouched —
    * the partition-level analog of the reference's idempotent upsert, and
    * the standard backfill/restatement pattern at scale. */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String],
                          format: String = "parquet"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .format(checkFormat(format)).save(path)

  /** Bucketed + sorted managed table: `numBuckets` files per partition,
    * hashed on `bucketCol`. Joins/aggregations on `bucketCol` between
    * same-bucketed tables skip the exchange entirely. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Data-skipping layout (the min/max-stats analog of partition pruning,
    * for columns too high-cardinality to directory-partition): range-
    * repartition + sort-within-partition on the cluster key(s), so every
    * output file (and every parquet row group inside it) covers a NARROW
    * slice of the key space. A selective filter then reads only the row
    * groups whose min/max straddle the predicate — at 100 TB this is the
    * difference between scanning a few hundred MB and the whole table.
    * Skipping is asserted observable in StoreSpec (records actually read).
    */
  def writeClustered(df: DataFrame, path: String, clusterCols: Seq[String],
                     numFiles: Int, format: String = "parquet"): Unit =
    df.repartitionByRange(numFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).format(checkFormat(format)).save(path)

  /** Deterministic hash-shard id in [0, nShards): a leading md5 hex slice
    * of the key → mod nShards. A pure function of the key, so re-running
    * an export — or extending the corpus incrementally — never reassigns
    * an existing key's shard; downstream training jobs can rely on shard
    * membership being stable across runs. All codegen'd builtins
    * (md5/substring/conv), no UDF.
    *
    * Two-level band width: nShards ≤ 256 reads TWO hex chars (the
    * historical layout — existing shard assignments never move), larger
    * nShards reads FOUR (0..65535), lifting the ceiling to 256² = 65536.
    * That is the parallelism ceiling of every per-shard sequential scan
    * built on this id (Export.packByWeight's running-sum window): at
    * 100 TB, 65536 shards ≈ 1.5 GB/shard — single-task-sized. Bias: the
    * band space % nShards residue buckets get one extra 1/2^(8·level)
    * band — ≤ one band either way, drowned by hash variance.
    */
  def shardId(key: Column, nShards: Int): Column = {
    require(nShards >= 1 && nShards <= 65536, s"nShards must be in [1,65536], got $nShards")
    val width = if (nShards <= 256) 2 else 4
    conv(substring(md5(key.cast("string")), 1, width), 16, 10).cast(LongType) % nShards
  }

  /** Export into `nShards` hash shards of ~`filesPerShard` parquet files
    * each, laid out as shard=N directories. The repartition keys each
    * writer task to one (shard, file-band) slice, so partitionBy never
    * fans out nShards files from every input task (the small-files storm);
    * at 100 TB you scale `filesPerShard` up so each file stays in the
    * 128 MB–1 GB band — shard count itself stays fixed because consumers
    * key on it. Hash collisions between (shard, band) pairs can merge two
    * bands into one file, so a shard holds between 1 and filesPerShard
    * files — never more.
    *
    * `shuffleOrder = true` additionally lays rows out in md5-of-key order
    * inside each file — a deterministic pseudo-random training order with
    * NO extra shuffle (sortWithinPartitions only; its [shard, md5] output
    * ordering also satisfies the partitionBy writer's required [shard]
    * ordering, so the writer skips its own sort). Epoch-stable: every
    * re-export reproduces the identical order. */
  def writeShards(df: DataFrame, path: String, keyCol: String,
                  nShards: Int, filesPerShard: Int = 1,
                  shuffleOrder: Boolean = false,
                  format: String = "parquet"): Unit = {
    val key = col(keyCol).cast("string")
    val band = conv(substring(md5(key), 3, 2), 16, 10).cast(LongType) % filesPerShard
    val sharded = df.withColumn("shard", shardId(col(keyCol), nShards))
      .withColumn("_band", band)
      .repartition(nShards * filesPerShard, col("shard"), col("_band"))
    val ordered =
      if (shuffleOrder) sharded.sortWithinPartitions(col("shard"), md5(key))
      else sharded
    ordered.drop("_band")
      .write.mode(SaveMode.Overwrite).partitionBy("shard")
      .format(checkFormat(format)).save(path)
  }

  /** JSONL (one JSON object per line) variant of writeShards — the
    * interchange format most training stacks ingest directly. Same
    * deterministic layout contract: hash shards, bounded file fan-out,
    * optional epoch-stable pseudo-shuffled row order. Serialization is the
    * codegen'd to_json over a struct of every column (field order = df
    * column order, so the line bytes are deterministic too); compression
    * stays at Spark's text default (none) because trainers seek into
    * shards. */
  def writeJsonlShards(df: DataFrame, path: String, keyCol: String,
                       nShards: Int, filesPerShard: Int = 1,
                       shuffleOrder: Boolean = false): Unit = {
    val key = col(keyCol).cast("string")
    val band = conv(substring(md5(key), 3, 2), 16, 10).cast(LongType) % filesPerShard
    val line = to_json(struct(df.columns.map(col).toSeq: _*)).as("value")
    val sharded = df.withColumn("shard", shardId(col(keyCol), nShards))
      .withColumn("_band", band)
      .repartition(nShards * filesPerShard, col("shard"), col("_band"))
    val ordered =
      if (shuffleOrder) sharded.sortWithinPartitions(col("shard"), md5(key))
      else sharded
    ordered.select(line, col("shard"))
      .write.mode(SaveMode.Overwrite).partitionBy("shard").text(path)
  }

  /** Export manifest — the delivery receipt for a shard layout: per shard,
    * row count and an order-independent content checksum (XOR of xxhash64
    * over each row's canonical to_json rendering, columns sorted by
    * name — field names make the encoding unambiguous across column
    * boundaries and null-safe; XOR never overflows, so it is safe under
    * ANSI mode). Compute it from the WRITTEN shards so the receipt covers
    * what actually landed; a consumer recomputes it after transfer to
    * prove integrity without trusting file sizes, at any read
    * parallelism (XOR is order-independent). Caveat of the XOR combine:
    * an identical row PAIR cancels — export rows carry their unique key,
    * so duplicates cannot occur in a well-formed shard, and n_rows still
    * catches pair-insertions. */
  def shardManifest(shards: DataFrame, shardCol: String = "shard"): DataFrame = {
    val payload = shards.columns.filterNot(_ == shardCol).sorted
    require(payload.nonEmpty, "shards have no payload columns to checksum")
    shards.groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_rows"),
        expr(s"bit_xor(xxhash64(to_json(struct(${payload.map(c => s"`$c`").mkString(", ")}))))")
          .as("checksum"))
  }

  /** Z-order bit-interleave of two non-negative integer keys: clustering by
    * this single key preserves locality in BOTH dimensions, so min/max
    * skipping works for filters on either column (the classic Z-order
    * curve used by lakehouse OPTIMIZE ZORDER BY). `bits` low bits of each
    * input are interleaved — a at odd positions, b at even. */
  def zorderKey(a: Column, b: Column, bits: Int = 16): Column = {
    val la = a.cast(LongType)
    val lb = b.cast(LongType)
    (0 until bits).map { i =>
      shiftleft(shiftright(la, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(lb, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)
  }
}
