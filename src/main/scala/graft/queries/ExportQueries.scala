package graft.queries

import graft.QueryDef
import graft.core.Tables.t
import org.apache.spark.sql.functions._

/** Training-data EXPORT analytics: the read-side checks a pipeline runs
  * before handing a corpus to a trainer — shard balance, sequence packing,
  * mixture reweighting, curriculum binning. Shuffle discipline: every
  * query aggregates per document first (map-only over the corpus) and
  * shuffles only per-shard / per-source / per-bin summaries.
  */
object ExportQueries {

  /** DuckDB-portable md5 two-hex-char band (0..255) of a key — the oracle
    * twin of Store.shardId's conv(substr(md5,1,2),16,10). DuckDB lacks
    * conv(), so the oracle decodes each hex char via strpos arithmetic. */
  private def oracleBand256(expr: String): String =
    s"""((strpos('0123456789abcdef', substr(md5($expr), 1, 1)) - 1) * 16
       + (strpos('0123456789abcdef', substr(md5($expr), 2, 1)) - 1))"""

  val defs: Seq[QueryDef] = Seq(

    // Shard-balance audit for Store.writeShards: docs and bytes per
    // deterministic hash shard. The shard id is a pure per-row expression,
    // so the corpus scan stays map-only and the single exchange carries
    // nShards × partitions pre-aggregated rows.
    QueryDef(
      "q_shard_stats",
      "per-shard doc/char counts + source spread for the 8-way hash-shard export",
      s"""SELECT CAST(${oracleBand256("CAST(doc_id AS VARCHAR)")} % 8 AS BIGINT) AS shard,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_chars) AS BIGINT) AS chars,
                 CAST(count(DISTINCT source) AS BIGINT) AS n_sources
          FROM documents GROUP BY 1 ORDER BY 1""") { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("shard", graft.core.Store.shardId(col("doc_id"), 8))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("shard"))
    },
  )
}
