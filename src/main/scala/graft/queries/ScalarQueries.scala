package graft.queries

import graft.QueryDef
import graft.core.Tables.t
import graft.functions.Fns._
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2.8 X1–X15): money, dates, hashing,
  * normalization, variant heuristic, explode. All expressions chosen for
  * bit-identical cross-engine semantics (see Fns).
  */
object ScalarQueries {

  val defs: Seq[QueryDef] = Seq(

    // X1/X2/X5/X7/X8/X9/X11 in one projection over orders.
    QueryDef(
      "q_x_scalars",
      "scalar suite: cents conversion, money display, ISO dates, md5 hash, normalization, variant heuristic",
      """SELECT o_orderkey,
                CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                CASE WHEN FLOOR(o_totalprice * 100 + 0.5) < 0 THEN '-' ELSE '' END
                    || '$' || CAST(ABS(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) // 100 AS VARCHAR)
                    || '.' || lpad(CAST(ABS(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) % 100 AS VARCHAR), 2, '0') AS price_display,
                STRFTIME(o_orderdate, '%Y-%m-%d') AS order_iso,
                md5(CAST(o_orderkey AS VARCHAR) || o_orderstatus) AS key_hash,
                lower(trim(o_orderpriority)) AS prio_norm,
                lower(o_orderpriority) LIKE '%urgent%' AS is_urgent
         FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""") { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 500)
        .select(
          col("o_orderkey"),
          cents(col("o_totalprice")).as("cents"),
          priceDisplay(cents(col("o_totalprice"))).as("price_display"),
          isoDate(col("o_orderdate")).as("order_iso"),
          md5(concat(col("o_orderkey").cast("string"), col("o_orderstatus"))).as("key_hash"),
          norm(col("o_orderpriority")).as("prio_norm"),
          lower(col("o_orderpriority")).contains("urgent").as("is_urgent"))
        .orderBy(col("o_orderkey"))
    },

    // X12: table-generating explode (the creators.items[] flattening shape).
    QueryDef(
      "q_x12_explode",
      "explode(split(...)) word frequency — the creator-explosion Generator shape",
      """SELECT word, CAST(COUNT(*) AS BIGINT) AS n
         FROM (SELECT unnest(string_split(lower(p_name), ' ')) AS word FROM part)
         GROUP BY word ORDER BY n DESC, word""") { (s, dir) =>
      t(s, dir, "part")
        .select(explode(split(lower(col("p_name")), " ")).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("word"))
    },

    // PII scrubbing (TextClean): regex redaction with Java/RE2-portable
    // patterns over deterministic synthesized PII (the fixtures carry no
    // real contact data, so the profile string is constructed from keys —
    // same construction in both engines).
    QueryDef(
      "q_pii_scrub",
      "PII redaction: email/IP/phone scrub, suffix-preserving mask, per-row PII count",
      s"""SELECT c_custkey, scrubbed, masked_phone, n_pii FROM (
            SELECT c_custkey,
                   regexp_replace(regexp_replace(regexp_replace(profile,
                     '${graft.operators.TextClean.EmailPattern}', '[EMAIL]', 'g'),
                     '${graft.operators.TextClean.IpPattern}', '[IP]', 'g'),
                     '${graft.operators.TextClean.PhonePattern}', '[PHONE]', 'g') AS scrubbed,
                   CASE WHEN len(phone) <= 4 THEN phone
                        ELSE repeat('*', len(phone) - 4) || substr(phone, len(phone) - 3, 4)
                   END AS masked_phone,
                   CAST(len(regexp_extract_all(profile, '${graft.operators.TextClean.EmailPattern}'))
                      + len(regexp_extract_all(regexp_replace(profile, '${graft.operators.TextClean.EmailPattern}', '[EMAIL]', 'g'),
                            '${graft.operators.TextClean.IpPattern}'))
                      + len(regexp_extract_all(regexp_replace(regexp_replace(profile,
                              '${graft.operators.TextClean.EmailPattern}', '[EMAIL]', 'g'),
                              '${graft.operators.TextClean.IpPattern}', '[IP]', 'g'),
                            '${graft.operators.TextClean.PhonePattern}')) AS BIGINT) AS n_pii
            FROM (
              SELECT c_custkey, phone,
                     'Contact me at ' || email || ' or ' || phone || ' from ' || ip AS profile
              FROM (
                SELECT c_custkey,
                       lower(replace(c_name, '#', '.')) || '@example.com' AS email,
                       '+1-' || CAST(c_custkey * 7 % 900 + 100 AS VARCHAR) || '-' ||
                         lpad(CAST(c_custkey * 13 % 10000 AS VARCHAR), 4, '0') AS phone,
                       '10.' || CAST(c_nationkey AS VARCHAR) || '.' ||
                         CAST(c_custkey % 256 AS VARCHAR) || '.' ||
                         CAST(1 + c_custkey % 250 AS VARCHAR) AS ip
                FROM customer WHERE c_custkey < 300)))
          ORDER BY c_custkey""") { (s, dir) =>
      import graft.operators.TextClean
      val base = t(s, dir, "customer")
        .filter(col("c_custkey") < 300)
        .select(col("c_custkey"),
          concat(lower(regexp_replace(col("c_name"), "#", ".")), lit("@example.com")).as("email"),
          concat(lit("+1-"), (col("c_custkey") * 7 % 900 + 100).cast("string"), lit("-"),
            lpad((col("c_custkey") * 13 % 10000).cast("string"), 4, "0")).as("phone"),
          concat(lit("10."), col("c_nationkey").cast("string"), lit("."),
            (col("c_custkey") % 256).cast("string"), lit("."),
            (col("c_custkey") % 250 + 1).cast("string")).as("ip"))
        .withColumn("profile",
          concat(lit("Contact me at "), col("email"), lit(" or "), col("phone"),
            lit(" from "), col("ip")))
      base.select(col("c_custkey"),
          TextClean.scrubPii(col("profile")).as("scrubbed"),
          TextClean.maskKeepLast(col("phone"), 4).as("masked_phone"),
          TextClean.piiCount(col("profile")).as("n_pii"))
        .orderBy(col("c_custkey"))
    },

    // O2: lexicographic TEXT ordering of numeric-looking keys ("10" < "9"),
    // with the documented numeric-aware alternative alongside.
    QueryDef(
      "q_o2_lexsort",
      "lexicographic vs numeric sort of TEXT issue numbers (reference O2 semantics)",
      """SELECT num_text, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(ROW_NUMBER() OVER (ORDER BY num_text) AS INT) AS lex_rank,
                CAST(ROW_NUMBER() OVER (ORDER BY CAST(num_text AS DOUBLE), num_text) AS INT) AS num_rank
         FROM (SELECT CAST(l_linenumber * 3 AS VARCHAR) AS num_text FROM lineitem)
         GROUP BY num_text ORDER BY num_text""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      // The global rank windows run on the POST-aggregation frame, whose
      // cardinality is distinct(l_linenumber*3) — bounded (7 rows) at any
      // scale factor, so the single-partition window is safe. partitionBy
      // `pmod(n, n)`: 0 for every row (count >= 1) but opaque to the
      // optimizer — literal 0 and `n * 0` are both folded away, leaving an
      // empty partitionSpec and WindowExec's global-window warning pointing
      // at a deliberate, bounded frame.
      val g = Window.partitionBy(pmod(col("n"), col("n")))
      t(s, dir, "lineitem")
        .select((col("l_linenumber") * 3).cast("string").as("num_text"))
        .groupBy("num_text")
        .agg(count(lit(1)).as("n"))
        .withColumn("lex_rank", row_number().over(g.orderBy(col("num_text"))).cast("int"))
        .withColumn("num_rank", row_number().over(
          g.orderBy(col("num_text").cast("double"), col("num_text"))).cast("int"))
        .orderBy(col("num_text"))
    },
  )
}
