package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S8 key=value cache file (reference `cv_fetch_covers.py:71-83`
  * load_cache/save_cache: one `k=v` line per entry, split on the FIRST
  * `=`, lines without `=` skipped) as a Spark dimension:
  *
  *  - `read` parses the text file into a (key, value) DataFrame;
  *  - `write` renders it back line-per-entry (round-trips `read`);
  *  - `resolve` is the reference's cache-lookup step (J8): a broadcast
  *    left-outer join decorating rows with the cached value — at 100 TB
  *    the cache is a small dim against an arbitrarily large fact side,
  *    so the broadcast is explicit and no shuffle touches the facts.
  */
object KvCache {

  /** Parse a k=v cache file. Duplicate keys: last line wins (dict
    * semantics in the reference), implemented ordinally by line offset.
    * A missing file is an EMPTY cache (reference `load_cache` returns {}),
    * not an error — first runs start cold. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    if (!p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)) {
      import spark.implicits._
      return Seq.empty[(String, String)].toDF("key", "value")
    }
    val lines = spark.read.text(path)
      .filter(col("value").contains("="))
      .select(
        substring_index(col("value"), "=", 1).as("key"),
        // everything AFTER the first '=' (value may itself contain '=')
        expr("substring(value, instr(value, '=') + 1)").as("value"))
    // last-wins per key without a window shuffle on file order: cache
    // files are small (a dim); dropDuplicates keeps the first row per key
    // in encounter order only with a single partition, so be explicit.
    lines.coalesce(1)
      .withColumn("__line", monotonically_increasing_id())
      .groupBy("key")
      .agg(max(struct(col("__line"), col("value"))).as("m"))
      .select(col("key"), col("m.value").as("value"))
  }

  /** Render (key, value) rows back to k=v lines (reference save_cache). */
  def write(df: DataFrame, path: String): Unit =
    df.select(concat(col("key"), lit("="), col("value")).as("value"))
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).text(path)

  /** J8 cache-resolution join: decorate `rows` with the cached value for
    * `keyExpr` (null where the cache misses — the reference then falls
    * back to an API search for those). Cache side broadcasts. */
  def resolve(rows: DataFrame, cache: DataFrame, keyExpr: Column,
              valueAlias: String = "cached_value"): DataFrame =
    rows.join(
      broadcast(cache.select(col("key").as("__ck"), col("value").as(valueAlias))),
      keyExpr === col("__ck"), "left_outer")
      .drop("__ck")
}
