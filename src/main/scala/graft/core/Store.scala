package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode}

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

  /** Directory-partitioned parquet: one dir per distinct partition value.
    * Keep partition columns low-cardinality (day, region, source) — a
    * high-cardinality partition column creates a small-files storm. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Idempotent incremental load: overwrite ONLY the partitions present in
    * `df` (dynamic partition overwrite), leaving all others untouched —
    * the partition-level analog of the reference's idempotent upsert, and
    * the standard backfill/restatement pattern at scale. */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

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
}
