package graft

import graft.core.Tables
import graft.plans.GraftFunctions

/** The reference ran its analytics as SQL text (starter:etl/etl.py:56-66);
  * the same surface works here via registered temp views + spark.sql,
  * including the native functions.
  */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("flagship stats query runs as verbatim SQL over registered views") {
    Tables.registerAll(spark, sf)
    val got = spark.sql(
      """SELECT p_name, COUNT(*) AS issue_count
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_name ORDER BY issue_count DESC, p_name LIMIT 3""")
      .as[(String, Long)].collect()
    assert(got.length == 3)
    assert(got.sortBy(-_._2).toSeq == got.toSeq)
  }

  test("quality checks run as SQL (null count + orphan anti-join)") {
    Tables.registerAll(spark, sf)
    val nulls = spark.sql(
      "SELECT COUNT(*) FROM orders WHERE NULLIF(o_orderstatus, 'O') IS NULL")
      .as[Long].head()
    assert(nulls > 0)
    val orphans = spark.sql(
      """SELECT COUNT(*) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)""")
      .as[Long].head()
    assert(orphans == 0)
  }

  test("native functions compose with SQL over views") {
    Tables.registerAll(spark, sf)
    GraftFunctions.register(spark)
    val got = spark.sql(
      """SELECT format_money(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS disp
         FROM orders ORDER BY o_orderkey LIMIT 1""").as[String].head()
    assert(got.startsWith("$") && got.contains("."))
  }

  test("span-scrub pipeline is expressible in pure SQL via the native functions") {
    GraftFunctions.register(spark)
    Seq((1L, "a b c d x y"), (2L, "a b c d p q"), (3L, "u v w z k m"))
      .toDF("doc_id", "text").createOrReplaceTempView("sd")
    // hot 4-grams (here: "a b c d", in docs 1+2) scrub out of every doc
    val got = spark.sql(
      """WITH hot AS (
           SELECT h FROM (SELECT explode(word_gram_hashes(text, 4)) AS h FROM sd)
           GROUP BY h HAVING COUNT(*) >= 2),
         st AS (
           SELECT doc_id, sort_array(collect_list(g.pos)) AS starts
           FROM (SELECT doc_id, explode(word_gram_pos_hashes(text, 4)) AS g FROM sd)
           JOIN hot ON g.h = hot.h GROUP BY doc_id)
         SELECT sd.doc_id,
                scrub_spans(text, coalesce(starts, array()), 4) AS clean
         FROM sd LEFT JOIN st USING (doc_id) ORDER BY doc_id""")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "x y"), (2L, "p q"), (3L, "u v w z k m")))
  }

  test("word_gram_hashes is SQL-callable and rejects a non-constant width") {
    GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT size(word_gram_hashes('a b c d e', 4)) AS n").as[Int].head()
    assert(n == 2)
    // any foldable INT works ("length('xx')" folds to 2); a genuinely
    // non-constant width must fail at resolution
    val folded = spark.sql(
      "SELECT size(word_gram_hashes('a b c', length('xx'))) AS n").as[Int].head()
    assert(folded == 2)
    val err = intercept[Exception] {
      spark.sql("SELECT word_gram_hashes('a b', CAST(rand() * 4 AS INT))").collect()
    }
    assert(err.getMessage.contains("constant INT"))
  }
}
