package graft.queries

import graft.QueryDef
import graft.core.Tables.t
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Text-analysis + dedup surface over the `documents` table: token
  * counting, quality scoring, language-ID, fingerprinting, exact dedup,
  * n-gram Jaccard, MinHash-LSH, SimHash banding (the north-star
  * training-data-pipeline operators).
  */
object TextQueries {

  private val Stop = Seq("a", "the")

  /** Marker tokens per language, drawn from the fixture vocabulary so the
    * scores actually vary; deterministic argmax with alphabetical
    * tie-break. */
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("group", "order"),
    "en" -> Seq("the", "a"),
    "es" -> Seq("data", "value"),
    "fr" -> Seq("table", "column"),
    "zh" -> Seq("spark", "query"))

  /** DuckDB-side score for one language: sum of per-marker token counts. */
  private def langScoreSql(markers: Seq[String]): String =
    markers.map(m => s"len(list_filter(string_split(text,' '), t -> t = '$m'))").mkString(" + ")

  private val langCaseSql: String = {
    val scored = LangMarkers.sortBy(_._1)
    val cases = scored.zipWithIndex.map { case ((lang, _), i) =>
      val rest = scored.drop(i + 1)
      if (rest.isEmpty) s"ELSE '$lang'"
      else {
        val g = if (rest.size == 1) s"s_${rest.head._1}"
                else s"GREATEST(${rest.map("s_" + _._1).mkString(", ")})"
        s"WHEN s_$lang >= $g THEN '$lang'"
      }
    }
    s"CASE ${cases.mkString(" ")} END"
  }

  /** DuckDB 63-bit simhash over `toks` (see TextAnalysis.simhash64 for the
    * hex-high-bit construction). */
  private val simhashSql: String = {
    val lo = (1 to 32).map { b =>
      s"CASE WHEN 2 * len(list_filter(toks, x -> substr(md5(x), $b, 1) >= '8')) > len(toks) " +
        s"THEN CAST(${1L << (b - 1)} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }
    val hi = (1 to 31).map { b =>
      s"CASE WHEN 2 * len(list_filter(toks, x -> substr(md5('x:' || x), $b, 1) >= '8')) > len(toks) " +
        s"THEN CAST(${1L << (b + 31)} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }
    (lo ++ hi).mkString(" + ")
  }

  private val shinglesSql: String =
    "list_distinct(list_transform(range(1, length(text) - 7), i -> substr(text, CAST(i AS INT), 9)))"

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_text_stats",
      "per-document token count, mean token length, stopword ratio, quality score",
      s"""SELECT doc_id,
                 CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
                 CAST(length(replace(text, ' ', '')) AS DOUBLE)
                   / (length(text) - length(replace(text, ' ', '')) + 1) AS avg_token_len,
                 CAST(len(list_filter(string_split(text, ' '), x -> x IN ('a', 'the'))) AS BIGINT) AS n_stop,
                 CAST(len(list_filter(string_split(text, ' '), x -> x IN ('a', 'the'))) AS DOUBLE)
                   / (length(text) - length(replace(text, ' ', '')) + 1) AS stop_ratio,
                 GREATEST(0.0, LEAST(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
                   - CAST(len(list_filter(string_split(text, ' '), x -> x IN ('a', 'the'))) AS DOUBLE)
                     / (length(text) - length(replace(text, ' ', '')) + 1)) AS quality
          FROM documents ORDER BY doc_id""") { (s, dir) =>
      t(s, dir, "documents").select(
          col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          TextAnalysis.avgTokenLen(col("text")).as("avg_token_len"),
          TextAnalysis.stopwordCount(col("text"), Stop).as("n_stop"),
          (TextAnalysis.stopwordCount(col("text"), Stop).cast("double") /
            TextAnalysis.tokenCount(col("text"))).as("stop_ratio"),
          TextAnalysis.qualityScore(col("text"), Stop).as("quality"))
        .orderBy(col("doc_id"))
    },

    QueryDef(
      "q_lang_id",
      "marker-token language-ID heuristic, confusion counts vs labeled lang",
      s"""WITH scored AS (
            SELECT lang, ${LangMarkers.sortBy(_._1).map { case (l, m) => s"${langScoreSql(m)} AS s_$l" }.mkString(", ")}
            FROM documents)
          SELECT lang, $langCaseSql AS predicted, CAST(COUNT(*) AS BIGINT) AS n
          FROM scored GROUP BY lang, predicted ORDER BY lang, predicted""") { (s, dir) =>
      t(s, dir, "documents")
        .select(col("lang"), TextAnalysis.langId(col("text"), LangMarkers).as("predicted"))
        .groupBy("lang", "predicted")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("predicted"))
    },

    QueryDef(
      "q_fingerprint",
      "document fingerprinting: md5 content hash + portable 63-bit simhash",
      s"""SELECT doc_id, md5(lower(trim(text))) AS fp,
                 CAST($simhashSql AS BIGINT) AS simhash
          FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
          ORDER BY doc_id""") { (s, dir) =>
      t(s, dir, "documents").select(
          col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fp"),
          TextAnalysis.simhash64(col("text")).as("simhash"))
        .orderBy(col("doc_id"))
    },

    QueryDef(
      "q_dedup_exact",
      "exact dedup via content-hash groupBy (corpus unioned with a planted copy slice)",
      """WITH all_docs AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0)
         SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_copies, MIN(doc_id) AS first_doc
         FROM (SELECT doc_id, md5(lower(trim(text))) AS fp FROM all_docs)
         GROUP BY fp HAVING COUNT(*) > 1 ORDER BY fp""") { (s, dir) =>
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val withCopies = d.unionAll(
        d.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      Dedup.exactDupGroups(withCopies, "doc_id", "text").orderBy(col("fp"))
    },

    QueryDef(
      "q_dedup_jaccard",
      "all-pairs char-9-gram Jaccard similarity join (threshold 0.5)",
      s"""WITH sh AS (SELECT doc_id, unnest($shinglesSql) AS g FROM documents),
          cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
          pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
            FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
          SELECT doc_a, doc_b, common / (ca.n + cb.n - common) AS jaccard
          FROM pairs JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b
          WHERE common / (ca.n + cb.n - common) >= 0.5
          ORDER BY doc_a, doc_b""") { (s, dir) =>
      Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text", k = 9, threshold = 0.5)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    QueryDef(
      "q_dedup_minhash",
      "MinHash(8)+LSH(4 bands of 2) near-dup pipeline with exact Jaccard verification",
      s"""WITH s AS (SELECT doc_id, $shinglesSql AS sh FROM documents),
          sig AS (
            SELECT doc_id, sh,
                   ${(0 until 8).map(h => s"list_min(list_transform(sh, g -> md5('$h:' || g))) AS sig_$h").mkString(", ")}
            FROM s),
          bands AS (
            SELECT doc_id, unnest([${(0 until 4).map(b => s"'$b' || ':' || sig_${2 * b} || ':' || sig_${2 * b + 1}").mkString(", ")}]) AS band
            FROM sig),
          cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
          verified AS (
            SELECT doc_a, doc_b,
                   len(list_intersect(sa.sh, sb.sh))
                     / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jaccard
            FROM cand JOIN s sa ON sa.doc_id = doc_a JOIN s sb ON sb.doc_id = doc_b)
          SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= 0.5
          ORDER BY doc_a, doc_b""") { (s, dir) =>
      Dedup.lshNearDups(t(s, dir, "documents"), "doc_id", "text",
          k = 9, numHashes = 8, bandSize = 2, threshold = 0.5)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    QueryDef(
      "q_dedup_simhash",
      "SimHash near-dup pairs via 16-bit pigeonhole banding (hamming <= 3)",
      s"""WITH sig AS (
            SELECT doc_id, CAST($simhashSql AS BIGINT) AS sig
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
          bands AS (
            SELECT doc_id, sig,
                   unnest([${(0 until 4).map(i => s"'$i' || ':' || CAST((sig >> ${i * 16}) & 65535 AS VARCHAR)").mkString(", ")}]) AS band
            FROM sig)
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
          FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.sig, b.sig)) <= 3
          ORDER BY doc_a, doc_b""") { (s, dir) =>
      Dedup.simhashNearDups(t(s, dir, "documents"), "doc_id", "text", maxHamming = 3)
        .select(col("doc_a"), col("doc_b"), col("hamming").cast("int").as("hamming"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
  )
}
