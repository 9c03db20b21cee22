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

    // Sequence packing audit: per (shard, pack) document counts, token
    // totals, and fill ratio against the 2048-token budget. The pack
    // assignment is a running sum windowed WITHIN each hash shard —
    // parallelism = nShards, no global sort — see Export.packAssignments.
    QueryDef(
      "q_pack_sequences",
      "fixed-token-budget packing within hash shards: docs/tokens/fill per pack",
      s"""WITH toks AS (SELECT doc_id,
                               CAST(${oracleBand256("CAST(doc_id AS VARCHAR)")} % 8 AS BIGINT) AS shard,
                               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                        FROM documents),
               c AS (SELECT shard, n_tokens,
                            SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
                     FROM toks)
          SELECT shard, CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_tokens) AS BIGINT) AS tokens,
                 CAST(sum(n_tokens) AS BIGINT) / 2048.0 AS fill
          FROM c GROUP BY 1, 2 ORDER BY 1, 2""") { (s, dir) =>
      graft.operators.Export.packAssignments(
          t(s, dir, "documents"), "doc_id", "text", nShards = 8, budget = 2048)
        .groupBy(col("shard"), col("pack"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("tokens"),
          (sum(col("n_tokens")) / lit(2048.0)).as("fill"))
        .orderBy(col("shard"), col("pack"))
    },

    // Deterministic train/val/test split: the assignment is a pure md5
    // band of the doc key (no RNG, no state), so every engine, run, and
    // re-partitioning produces the same split — the property that makes
    // a held-out set actually held out across pipeline re-runs. Bands
    // 0-7 -> test (~3%), 8-15 -> val (~3%), rest train. Map-only; the
    // audit aggregation is the only shuffle.
    QueryDef(
      "q_split_stratified",
      "deterministic md5-band train/val/test split: per-source split sizes",
      s"""WITH b AS (SELECT source, doc_id,
                            ${oracleBand256("CAST(doc_id AS VARCHAR)")} AS band
                     FROM documents),
          s AS (SELECT source, doc_id,
                       CASE WHEN band < 8 THEN 'test'
                            WHEN band < 16 THEN 'val'
                            ELSE 'train' END AS split
                FROM b)
          SELECT source, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
          FROM s GROUP BY source, split ORDER BY source, split""") { (s, dir) =>
      val band = conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
        .cast("long")
      t(s, dir, "documents")
        .withColumn("split",
          when(band < 8, "test").when(band < 16, "val").otherwise("train"))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
        .orderBy(col("source"), col("split"))
    },

    // Length-sorted packing (padding-bounded batching): each shard laid
    // out in (n_tokens DESC, doc_id) order before the running-sum pack
    // assignment, so packs hold similar-length docs — max-min token
    // spread per pack is what a pad-to-longest consumer wastes. Same
    // single shuffle as q_pack_sequences; only the within-shard order
    // differs.
    QueryDef(
      "q_pack_sorted",
      "length-sorted packing within hash shards: per-pack doc count, token sum, and length spread",
      s"""WITH toks AS (SELECT doc_id,
                               CAST(${oracleBand256("CAST(doc_id AS VARCHAR)")} % 8 AS BIGINT) AS shard,
                               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                        FROM documents),
               c AS (SELECT shard, n_tokens,
                            SUM(n_tokens) OVER (PARTITION BY shard
                              ORDER BY n_tokens DESC, doc_id) AS cum
                     FROM toks)
          SELECT shard, CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_tokens) AS BIGINT) AS tokens,
                 CAST(min(n_tokens) AS BIGINT) AS min_toks,
                 CAST(max(n_tokens) AS BIGINT) AS max_toks
          FROM c GROUP BY 1, 2 ORDER BY 1, 2""") { (s, dir) =>
      graft.operators.Export.packAssignments(
          t(s, dir, "documents"), "doc_id", "text", nShards = 8, budget = 2048,
          sortByWeight = true)
        .groupBy(col("shard"), col("pack"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("tokens"),
          min(col("n_tokens")).as("min_toks"),
          max(col("n_tokens")).as("max_toks"))
        .orderBy(col("shard"), col("pack"))
    },

    // Mixture reweighting audit: deterministic down-sample toward target
    // corpus shares. Rates come from a one-row-per-source count table
    // (broadcast); the keep decision is a pure md5-band predicate, so the
    // kept set is identical on every run/engine — see Export.mixtureSample.
    // Sources outside the target mix are dropped by the inner rate join.
    QueryDef(
      "q_mix_resample",
      "deterministic mixture resampling toward target source shares (kept vs total)",
      s"""WITH counts AS (SELECT source, CAST(count(*) AS BIGINT) AS group_n
                          FROM documents GROUP BY source),
               tot AS (SELECT CAST(sum(group_n) AS BIGINT) AS total FROM counts),
               rates AS (SELECT source,
                                least(1.0, target_share * total / group_n) AS rate
                         FROM counts CROSS JOIN tot
                         JOIN (VALUES ('src0', 0.01), ('src1', 0.02),
                                      ('src2', 0.05), ('src3', 0.08))
                              AS tgt(source, target_share) USING (source))
          SELECT source, rate,
                 CAST(count(*) AS BIGINT) AS n_total,
                 CAST(count(*) FILTER (
                   WHERE ${oracleBand256("CAST(doc_id AS VARCHAR)")} < rate * 256.0
                 ) AS BIGINT) AS n_kept
          FROM documents JOIN rates USING (source)
          GROUP BY 1, 2 ORDER BY 1""") { (s, dir) =>
      graft.operators.Export.mixtureSample(
          t(s, dir, "documents"), "doc_id", "source",
          Map("src0" -> 0.01, "src1" -> 0.02, "src2" -> 0.05, "src3" -> 0.08))
        .groupBy(col("source"), col("rate"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
        .select(col("source"), col("rate"), col("n_total"), col("n_kept"))
        .orderBy(col("source"))
    },

    // Epoch-weighted repetition (the upsampling half of mixture building):
    // src0 at 2.5 epochs (every doc twice + a stable md5-band half a third
    // time), src1 at 0.25 (keep a quarter), everything else 1.0. The copy
    // count is a pure function of (doc_id, source) — no RNG.
    QueryDef(
      "q_mix_epochs",
      "deterministic epoch-weighted repetition: src0 x2.5, src1 x0.25, rest x1 — exploded copies",
      s"""WITH e(source, epochs) AS (VALUES ('src0', 2.5), ('src1', 0.25)),
          d AS (SELECT doc_id, documents.source AS source, COALESCE(epochs, 1.0) AS epochs
                FROM documents LEFT JOIN e USING (source)),
          c AS (SELECT doc_id, source,
                       CAST(FLOOR(epochs) AS BIGINT)
                         + (CASE WHEN ${oracleBand256("CAST(doc_id AS VARCHAR)")}
                                      < (epochs - FLOOR(epochs)) * 256.0
                            THEN 1 ELSE 0 END) AS n_copies
                FROM d)
          SELECT doc_id, source, CAST(t.copy AS BIGINT) AS copy
          FROM c, unnest(range(1, n_copies + 1)) AS t(copy)
          WHERE n_copies > 0
          ORDER BY doc_id, copy""") { (s, dir) =>
      graft.operators.Export.mixtureRepeat(
          t(s, dir, "documents"), "doc_id", "source",
          Map("src0" -> 2.5, "src1" -> 0.25))
        .select(col("doc_id"), col("source"), col("copy"))
        .orderBy(col("doc_id"), col("copy"))
    },

    // Token-budget mixture solver — the planning step that turns "train on
    // B tokens at these source shares" into the (epochs, sample_rate)
    // knobs mixtureRepeat/mixtureSample apply: wanted = share·B; epochs =
    // ceil(wanted/available) full passes over the source; sample_rate
    // thins the last pass so expected tokens hit wanted exactly. The
    // corpus-sized work is one map-side token count + partial-agg'd sum;
    // the solver arithmetic runs on the source-count-sized aggregate
    // (shares and budget are plan literals, divisions single IEEE ops —
    // engine-portable).
    QueryDef(
      "q_mix_budget",
      "token-budget solver: per-source epochs + sample rate for a 50k-token target mixture",
      """WITH avail AS (SELECT source,
                               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens_avail
                        FROM documents GROUP BY source),
          plan AS (SELECT source, n_tokens_avail,
                          target_share,
                          target_share * 50000 AS tokens_wanted
                   FROM avail
                   JOIN (VALUES ('src0', 0.30), ('src1', 0.25),
                                ('src2', 0.25), ('src3', 0.20))
                        AS tgt(source, target_share) USING (source))
          SELECT source, n_tokens_avail, target_share, tokens_wanted,
                 CAST(CEIL(tokens_wanted / n_tokens_avail) AS BIGINT) AS epochs,
                 tokens_wanted / (n_tokens_avail
                   * CAST(CEIL(tokens_wanted / n_tokens_avail) AS BIGINT)) AS sample_rate
          FROM plan ORDER BY source""") { (s, dir) =>
      val targets = Seq(("src0", 0.30), ("src1", 0.25), ("src2", 0.25), ("src3", 0.20))
      val tgt = s.createDataFrame(targets).toDF("source", "target_share")
      val wanted = col("target_share") * 50000
      val epochs = ceil(wanted / col("n_tokens_avail")).cast("long")
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_tokens_avail"))
        .join(broadcast(tgt), "source")
        .select(col("source"), col("n_tokens_avail"), col("target_share"),
          wanted.as("tokens_wanted"), epochs.as("epochs"),
          (wanted / (col("n_tokens_avail") * epochs)).as("sample_rate"))
        .orderBy(col("source"))
    },

    // Temperature-scaled mixture shares (UniMax / multilingual
    // alpha-sampling at alpha = 1/2): target share of language g is
    // sqrt(n_g) / Σ sqrt(n_h) — the head language damps, tail languages
    // boost, order preserved. alpha = 1/2 is the one temperature whose
    // power is an IEEE-exact primitive (sqrt is correctly rounded
    // everywhere; pow(x, 0.3) is libm-dependent and banned from
    // hash-checked paths). The sqrt weights quantize to integers before
    // summing (exact BIGINT denominator), each share is ONE float
    // division. Corpus-sized work is a single partial-agg'd count; the
    // share arithmetic runs on the |languages|-row census.
    QueryDef(
      "q_mix_temperature",
      "temperature-scaled (alpha=1/2) mixture shares per language: sqrt-count weighting",
      """WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS group_n
                    FROM documents GROUP BY lang),
          w AS (SELECT lang, group_n,
                       CAST(floor(sqrt(CAST(group_n AS DOUBLE)) * 1e6 + 0.5e0) AS BIGINT) AS wq
                FROM c),
          tot AS (SELECT CAST(SUM(wq) AS BIGINT) AS t FROM w)
          SELECT lang, group_n, CAST(wq AS DOUBLE) / t AS share
          FROM w CROSS JOIN tot ORDER BY lang""") { (s, dir) =>
      graft.operators.Export.mixtureTemperatureShares(
          t(s, dir, "documents"), "lang")
        .orderBy(col("lang"))
    },

    // SFT chat-template rendering with loss-mask token boundaries: the
    // fixture derives (prompt, response) by splitting each document at
    // token 8; Export.renderChatTemplate joins the segments on single
    // spaces so the masked prefix is token-aligned under the corpus's
    // whitespace-token convention (mask = [n_prefix_tokens,
    // n_total_tokens)). Map-only string assembly — no shuffle.
    QueryDef(
      "q_chat_render",
      "SFT chat-template rendering: '<|user|> p <|assistant|> r <|end|>' + loss-mask token boundary",
      """WITH base AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
          pr AS (SELECT doc_id,
                        array_to_string(l[1:8], ' ') AS prompt,
                        array_to_string(l[9:len(l)], ' ') AS response
                 FROM base WHERE len(l) > 8)
          SELECT doc_id,
                 '<|user|> ' || prompt || ' <|assistant|> ' || response || ' <|end|>' AS rendered,
                 CAST(len(string_split('<|user|> ' || prompt || ' <|assistant|>', ' ')) AS BIGINT) AS n_prefix_tokens,
                 CAST(len(string_split('<|user|> ' || prompt || ' <|assistant|> ' || response || ' <|end|>', ' ')) AS BIGINT) AS n_total_tokens
          FROM pr ORDER BY doc_id""") { (s, dir) =>
      val toks = split(col("text"), " ")
      val base = t(s, dir, "documents")
        .select(col("doc_id"), toks.as("l"))
        .filter(size(col("l")) > 8)
        .select(col("doc_id"),
          array_join(slice(col("l"), 1, 8), " ").as("prompt"),
          array_join(slice(col("l"), lit(9), size(col("l")) - 8), " ").as("response"))
      graft.operators.Export.renderChatTemplate(base, "prompt", "response")
        .select(col("doc_id"), col("rendered"),
          col("n_prefix_tokens"), col("n_total_tokens"))
        .orderBy(col("doc_id"))
    },

    // Within-source curriculum quartiles: ntile(4) over the total order
    // (n_chars, doc_id) inside each source. Partitioning by source keeps
    // the window parallel across domains — the global-curriculum variant
    // would serialize the corpus through one task and is exactly what NOT
    // to ship at 100 TB.
    QueryDef(
      "q_curriculum",
      "per-source curriculum quartiles by document length (ntile within source)",
      """WITH b AS (SELECT source, n_chars,
                           ntile(4) OVER (PARTITION BY source
                                          ORDER BY n_chars, doc_id) AS bin
                    FROM documents)
         SELECT source, CAST(bin AS BIGINT) AS bin,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(min(n_chars) AS BIGINT) AS min_chars,
                CAST(max(n_chars) AS BIGINT) AS max_chars,
                avg(n_chars) AS avg_chars
         FROM b GROUP BY 1, 2 ORDER BY 1, 2""") { (s, dir) =>
      graft.operators.Export.curriculumBuckets(
          t(s, dir, "documents").select(col("source"), col("doc_id"), col("n_chars")),
          "doc_id", "source", col("n_chars"), nBuckets = 4)
        .select(col("source"), col("n_chars"), col("bucket").cast("long").as("bin"))
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).cast("long").as("min_chars"),
          max(col("n_chars")).cast("long").as("max_chars"),
          avg(col("n_chars")).as("avg_chars"))
        .orderBy(col("source"), col("bin"))
    },

    // Deterministic train/eval/test SPLIT as a first-class OPERATOR
    // (Export.hashSplit) — the operator-ized generalization of
    // q_split_stratified's inline 256-band CASE: arbitrary (label, rate)
    // lists over a hash-uniform u in [0,1), so rates aren't limited to
    // multiples of 1/256, and the stability law (a doc's split never
    // changes as the corpus accretes — the historical eval set stays
    // intact across re-exports) is spec'd on the operator rather than
    // implicit in one query. The oracle replays the identical u and CASE
    // chain; id_sum is an exact BIGINT membership checksum per cell, so
    // a single reassigned doc flips the hash.
    QueryDef(
      "q_split_train_eval",
      "deterministic 0.8/0.1/0.1 train/eval/test hash split: per (source, split) counts + id checksum",
      """WITH su AS (
           SELECT doc_id, source,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                    / 281474976710656.0e0 AS u
           FROM documents),
         lab AS (
           SELECT source, doc_id,
                  CASE WHEN u < 0.8e0 THEN 'train'
                       WHEN u < 0.8e0 + 0.1e0 THEN 'eval'
                       ELSE 'test' END AS split
           FROM su)
         SELECT source, split, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(doc_id) AS BIGINT) AS id_sum
         FROM lab GROUP BY source, split ORDER BY source, split""") { (s, dir) =>
      graft.operators.Export.hashSplit(
          t(s, dir, "documents").select(col("doc_id"), col("source")),
          "doc_id", Seq("train" -> 0.8, "eval" -> 0.1, "test" -> 0.1))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).cast("long").as("id_sum"))
        .orderBy(col("source"), col("split"))
    },
  )
}
