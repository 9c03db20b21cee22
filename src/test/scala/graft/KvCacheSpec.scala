package graft

import graft.sources.KvCache
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** S8 key=value cache file: parse semantics (first-`=` split, skip lines
  * without `=`, last occurrence wins), write round-trip, and the broadcast
  * cache-resolution join (reference `cv_fetch_covers.py:71-107`). */
class KvCacheSpec extends SparkSpec {
  import spark.implicits._

  test("read parses k=v lines with reference semantics") {
    val dir = Files.createTempDirectory("kvcache").toFile.getAbsolutePath
    val f = s"$dir/cache.txt"
    Files.writeString(Paths.get(f),
      """Amazing Spider-Man=101
        |garbage line without separator
        |X-Men=202
        |Title = With Spaces=303
        |Amazing Spider-Man=999
        |""".stripMargin)
    val got = KvCache.read(spark, f).as[(String, String)].collect().toMap
    assert(got == Map(
      "Amazing Spider-Man" -> "999",          // last occurrence wins
      "X-Men" -> "202",
      "Title " -> " With Spaces=303"))        // split on FIRST '=' only
  }

  test("missing cache file reads as an empty cache (cold first run)") {
    val got = KvCache.read(spark, "/tmp/kvcache-does-not-exist-anywhere")
    assert(got.columns.toSeq == Seq("key", "value"))
    assert(got.count() == 0)
  }

  test("write renders k=v lines that read() round-trips") {
    val dir = Files.createTempDirectory("kvcache2").toFile.getAbsolutePath
    val path = s"$dir/out"
    val cache = Seq(("a", "1"), ("b", "x=y"), ("c", "")).toDF("key", "value")
    KvCache.write(cache, path)
    val back = KvCache.read(spark, path).as[(String, String)].collect().toMap
    assert(back == Map("a" -> "1", "b" -> "x=y", "c" -> ""))
  }

  test("resolve decorates rows via a broadcast lookup join; misses are null") {
    val cache = Seq(("Amazing Spider-Man", "101"), ("X-Men", "202")).toDF("key", "value")
    val rows = Seq("Amazing Spider-Man", "Unknown Series").toDF("series_title")
    val resolved = KvCache.resolve(rows, cache, col("series_title"), "volume_id")
    val plan = resolved.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"cache side must broadcast:\n$plan")
    val got = resolved.as[(String, Option[String])].collect().toMap
    assert(got == Map(
      "Amazing Spider-Man" -> Some("101"),
      "Unknown Series" -> None))
  }
}
