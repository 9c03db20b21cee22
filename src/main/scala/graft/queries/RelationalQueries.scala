package graft.queries

import graft.QueryDef
import graft.core.Tables.t
import graft.functions.Fns._
import graft.operators.Relational
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational parity surface: SURVEY.md §2 operators (scan/filter/join/agg/
  * window/sort/dedup) over the driver's star schema. orders/lineitem play
  * the issue/issue_creator fact role; part/customer/nation/region are the
  * broadcastable dims (FIXTURES.md §B mapping).
  */
object RelationalQueries {

  val defs: Seq[QueryDef] = Seq(

    // A1 + J1 + O3: the reference's flagship "top series by issue count"
    // (starter:etl/etl.py:56-66) — top parts by lineitem count.
    QueryDef(
      "q_a1_top_parts",
      "flagship top-k by count: fact join dim, groupBy, count, orderBy desc, limit",
      """SELECT p_name, CAST(COUNT(*) AS BIGINT) AS issue_count
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_name
         ORDER BY issue_count DESC, p_name LIMIT 10""") { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val p  = broadcast(t(s, dir, "part"))
      Relational.topKByCount(
        li.join(p, li("l_partkey") === p("p_partkey")), col("p_name"), 10, "issue_count")
    },

    // TPC-H Q1 shape: wide aggregation with order-independent double sums.
    QueryDef(
      "q_pricing_summary",
      "multi-aggregate groupBy (sum/avg/count) with decimal-exact double sums",
      """SELECT l_returnflag, l_linestatus,
                CAST(SUM(CAST(FLOOR((l_quantity) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0 AS sum_qty,
                CAST(SUM(CAST(FLOOR((l_extendedprice) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0 AS sum_base_price,
                CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0 AS sum_disc_price,
                CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0 AS sum_charge,
                (CAST(SUM(CAST(FLOOR((l_quantity) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0) / COUNT(l_quantity) AS avg_qty,
                (CAST(SUM(CAST(FLOOR((l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0) / COUNT(l_discount) AS avg_disc,
                CAST(COUNT(*) AS BIGINT) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""") { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2001-09-02 00:00:00").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // TPC-H Q3 shape: 3-way fact join, filtered, revenue top-k.
    QueryDef(
      "q_revenue_topk",
      "customer⋈orders⋈lineitem with selective filters, top-10 revenue orders",
      """SELECT l_orderkey,
                CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0 AS revenue,
                STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate
         FROM customer JOIN orders ON c_custkey = o_custkey
                       JOIN lineitem ON o_orderkey = l_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
           AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY l_orderkey, o_orderdate
         ORDER BY revenue DESC, l_orderkey LIMIT 10""") { (s, dir) =>
      val c  = broadcast(t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING"))
      val o  = t(s, dir, "orders").filter(col("o_orderdate") < lit("1999-01-01 00:00:00").cast(TimestampType))
      val li = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1997-01-01 00:00:00").cast(TimestampType))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(li, o("o_orderkey") === li("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .select(col("l_orderkey"), col("revenue"), isoDate(col("o_orderdate")).as("orderdate"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
    },

    // TPC-H Q5 shape: snowflake join through two dims, per-region-year revenue.
    QueryDef(
      "q_salted_join",
      "skew-salted fact⋈fact join (lineitem⋈orders), revenue by order priority — result identical to the plain join",
      """SELECT o_orderpriority,
                CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0 AS revenue,
                CAST(COUNT(*) AS BIGINT) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, dir) =>
      // STATIC-width demo (explicit opt-in): the salt spreads any hot
      // orderkey over 8 reducers; the right side replicates x8 for EVERY
      // key. Same result set as the plain join — the oracle IS the plain
      // join, so the correctness row proves salting is result-invariant.
      // The static tool is for skew known up front or joins outside
      // AQE's reach; on unknown distributions the DEFAULT surface is
      // Relational.saltedJoin, which delegates to adaptiveSaltedJoin
      // (per-key widths, zero replication on cold keys — q_salted_adaptive).
      val li = t(s, dir, "lineitem").withColumnRenamed("l_orderkey", "orderkey")
      val o = t(s, dir, "orders")
        .select(col("o_orderkey").as("orderkey"), col("o_orderpriority"))
      graft.operators.Relational.staticSaltedJoin(li, o, "orderkey", "l_linenumber", saltFactor = 8)
        .groupBy(col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority"))
    },

    // The ADAPTIVE variant against the same plain-join oracle: per-key
    // salt widths come from the fact side's own key histogram (one
    // partial-agg'd count pass — itself skew-immune), hot keys fan out
    // ceil(cnt/target) ways, cold keys replicate ZERO extra copies —
    // where the static tool above pays saltFactor x replication on every
    // key. Hash-green here proves the data-driven widths are
    // result-invariant too.
    QueryDef(
      "q_salted_adaptive",
      "adaptive skew-salted join (per-key widths from the key histogram), revenue by order priority — result identical to the plain join",
      """SELECT o_orderpriority,
                CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0 AS revenue,
                CAST(COUNT(*) AS BIGINT) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, dir) =>
      // Salt on the PK composite (orderkey:linenumber) — per the operator
      // contract the salt id must be (near-)unique within each key;
      // l_linenumber alone has <=7 global values, which would cap a wide
      // key's effective fan-out at 7.
      val li = t(s, dir, "lineitem").withColumnRenamed("l_orderkey", "orderkey")
        .withColumn("__rid", concat_ws(":", col("orderkey"), col("l_linenumber")))
      val o = t(s, dir, "orders")
        .select(col("o_orderkey").as("orderkey"), col("o_orderpriority"))
      graft.operators.Relational.adaptiveSaltedJoin(li, o, "orderkey",
          "__rid", targetRowsPerSalt = 1000)
        .groupBy(col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority"))
    },

    QueryDef(
      "q_region_revenue",
      "snowflake join lineitem⋈orders⋈customer⋈nation⋈region, groupBy region+year",
      """SELECT r_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
                CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0 AS revenue,
                CAST(COUNT(*) AS BIGINT) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                       JOIN customer ON o_custkey = c_custkey
                       JOIN nation ON c_nationkey = n_nationkey
                       JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, order_year
         ORDER BY r_name, order_year""") { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val o  = t(s, dir, "orders")
      val c  = broadcast(t(s, dir, "customer"))
      val n  = broadcast(t(s, dir, "nation"))
      val r  = broadcast(t(s, dir, "region"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), year(col("o_orderdate")).as("order_year"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("order_year"))
    },

    // F2 + O1 + O4: case-insensitive substring search, sorted, capped —
    // the reference's /search route (app.py:182).
    QueryDef(
      "q_f2_ilike_search",
      "ILIKE substring search + orderBy + limit 50 (reference /search)",
      """SELECT p_partkey, p_name, p_brand
         FROM part WHERE lower(p_name) LIKE '%red%'
         ORDER BY p_name, p_partkey LIMIT 50""") { (s, dir) =>
      t(s, dir, "part")
        .filter(lower(col("p_name")).contains("red"))
        .select(col("p_partkey"), col("p_name"), col("p_brand"))
        .orderBy(col("p_name"), col("p_partkey"))
        .limit(50)
    },

    // F1 + F5 + F6 + P2: equality + compound conjunctive + prefix filters.
    QueryDef(
      "q_f5_compound_filter",
      "equality + conjunction + prefix filter, projected (reference browse route)",
      """SELECT c_custkey AS id, c_name AS name, CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents
         FROM customer
         WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 5000.0 AND c_name LIKE 'Customer#00000%'
         ORDER BY c_custkey""") { (s, dir) =>
      t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING" &&
                col("c_acctbal") > 5000.0 &&
                col("c_name").startsWith("Customer#00000"))
        .select(col("c_custkey").as("id"), col("c_name").as("name"),
                cents(col("c_acctbal")).as("acctbal_cents"))
        .orderBy(col("id"))
    },

    // J2 + A2 + A3 + F3: the reference's `quality` command — orphan count +
    // conditional null-count, as one audit row.
    QueryDef(
      "q_quality_checks",
      "data-quality audit: anti-join orphan count + IS NULL conditional count",
      """SELECT
           (SELECT CAST(COUNT(*) AS BIGINT) FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS customers_without_orders,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders WHERE NULLIF(o_orderstatus, 'O') IS NULL) AS open_status_null_like,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
             WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = lineitem.l_partkey)) AS lineitems_orphan_part""") { (s, dir) =>
      val c  = t(s, dir, "customer")
      val o  = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val p  = t(s, dir, "part")
      val custOrphans = Relational.orphans(c, o, "c_custkey", "o_custkey")
        .agg(count(lit(1)).as("customers_without_orders"))
      val nullLike = o.filter(nullif(col("o_orderstatus"), lit("O")).isNull)
        .agg(count(lit(1)).as("open_status_null_like"))
      val liOrphans = Relational.orphans(li, p, "l_partkey", "p_partkey", broadcastParent = true)
        .agg(count(lit(1)).as("lineitems_orphan_part"))
      custOrphans.crossJoin(nullLike).crossJoin(liOrphans)
    },

    // W1: row_number per group in date order — the reference's issue_order
    // sequence (etl/seed/seed_from_marvel.py:243-245).
    QueryDef(
      "q_w1_order_sequence",
      "row_number over (partition by customer order by date) — issue_order analog",
      """SELECT o_custkey, o_orderkey, order_seq FROM (
           SELECT o_custkey, o_orderkey,
                  CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS order_seq
           FROM orders WHERE o_custkey < 100)
         WHERE order_seq <= 3
         ORDER BY o_custkey, order_seq""") { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .filter(col("o_custkey") < 100)
        .withColumn("order_seq", row_number().over(w))
        .filter(col("order_seq") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("order_seq"))
        .orderBy(col("o_custkey"), col("order_seq"))
    },

    // W2 + F8: weighted relevance scoring + per-group ranking (the
    // reference's client-side search scorer, app/templates/search.html:177-196).
    QueryDef(
      "q_f8_relevance",
      "multi-field weighted substring relevance score, ranked top-20",
      """SELECT p_partkey, p_name, p_type, score FROM (
           SELECT p_partkey, p_name, p_type,
                  CAST(CASE WHEN lower(p_name) LIKE '%red%' THEN 3 ELSE 0 END
                     + CASE WHEN lower(p_type) LIKE '%economy%' THEN 2 ELSE 0 END
                     + CASE WHEN lower(p_brand) LIKE '%brand#1%' THEN 1 ELSE 0 END AS INT) AS score
           FROM part)
         WHERE score > 0
         ORDER BY score DESC, p_partkey LIMIT 20""") { (s, dir) =>
      t(s, dir, "part")
        .withColumn("score",
          relevance("red", Seq(col("p_name") -> 3)) +
          relevance("economy", Seq(col("p_type") -> 2)) +
          relevance("brand#1", Seq(col("p_brand") -> 1)))
        .filter(col("score") > 0)
        .select(col("p_partkey"), col("p_name"), col("p_type"), col("score"))
        .orderBy(desc("score"), col("p_partkey"))
        .limit(20)
    },

    // A9: deterministic argmax per group (best-scoring-series pick).
    QueryDef(
      "q_a9_argmax",
      "argmax per group: highest-balance customer per nation, deterministic ties",
      """SELECT n_name, c_custkey, c_name, c_acctbal
         FROM (SELECT n_name, c_custkey, c_name, c_acctbal,
                      ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rn
               FROM customer JOIN nation ON c_nationkey = n_nationkey)
         WHERE rn = 1 ORDER BY n_name""") { (s, dir) =>
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      Relational.argmaxPerGroup(
          c.join(n, c("c_nationkey") === n("n_nationkey")),
          Seq("n_name"), Seq(desc("c_acctbal"), col("c_custkey")))
        .select(col("n_name"), col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("n_name"))
    },

    // D1: union of overlapping scans + distinct (A–Z crawl dedup,
    // etl/sources/marvel_extract.py:95-119).
    QueryDef(
      "q_d1_union_dedup",
      "union two overlapping slices then dropDuplicates on key",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct_orders,
                CAST(SUM(CAST(FLOOR((o_totalprice) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0 AS sum_price
         FROM (SELECT DISTINCT o_orderkey, o_totalprice FROM (
                 SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
                 UNION ALL
                 SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 0))""") { (s, dir) =>
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
      o.filter(col("o_orderkey") % 2 === 0)
        .unionAll(o.filter(col("o_orderkey") % 3 === 0))
        .dropDuplicates("o_orderkey", "o_totalprice")
        .agg(count(lit(1)).as("n_distinct_orders"), dsum(col("o_totalprice")).as("sum_price"))
    },

    // J4 + D3 + D4 + S12: the idempotent MERGE — first-wins incoming dedup,
    // update-only-mutable-fields, insert-if-absent (starter:etl/load.py:26-47).
    QueryDef(
      "q_merge_upsert",
      "idempotent upsert: first-wins dedup + coalesce-mutable update + anti-join insert",
      """WITH target AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
           FROM orders WHERE o_orderkey % 3 = 0),
         raw_incoming AS (
           SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 1000.0 AS o_totalprice,
                  1 AS src FROM orders WHERE o_orderkey % 2 = 0
           UNION ALL
           SELECT o_orderkey, 'V' AS o_orderstatus, o_totalprice + 2000.0 AS o_totalprice,
                  2 AS src FROM orders WHERE o_orderkey % 4 = 0),
         incoming AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice
           FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY src) AS rn
                 FROM raw_incoming) WHERE rn = 1),
         updated AS (
           SELECT t.o_orderkey,
                  COALESCE(i.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
                  COALESCE(i.o_totalprice, t.o_totalprice) AS o_totalprice,
                  t.o_orderpriority
           FROM target t LEFT JOIN incoming i ON t.o_orderkey = i.o_orderkey),
         inserted AS (
           SELECT i.o_orderkey, i.o_orderstatus, i.o_totalprice,
                  'MERGED' AS o_orderpriority
           FROM incoming i WHERE NOT EXISTS (SELECT 1 FROM target t WHERE t.o_orderkey = i.o_orderkey)),
         merged AS (SELECT * FROM updated UNION ALL SELECT * FROM inserted)
         SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CAST(FLOOR((o_totalprice) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0 AS sum_price
         FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""") { (s, dir) =>
      val o = t(s, dir, "orders")
      val target = o.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"), col("o_orderpriority"))
      val rawIncoming = o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
                (col("o_totalprice") + 1000.0).as("o_totalprice"), lit(1).as("src"))
        .unionAll(o.filter(col("o_orderkey") % 4 === 0)
          .select(col("o_orderkey"), lit("V").as("o_orderstatus"),
                  (col("o_totalprice") + 2000.0).as("o_totalprice"), lit(2).as("src")))
      val incoming = rawIncoming
        .withColumn("o_orderpriority", lit("MERGED"))
      val merged = Relational.upsert(
        target,
        incoming.select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority", "src"),
        keys = Seq("o_orderkey"),
        mutableCols = Seq("o_orderstatus", "o_totalprice"),
        incomingOrder = Seq(col("src")))
      merged.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderstatus"))
    },
  )
}
