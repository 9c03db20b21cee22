package graft

import graft.sources.rest.{FetcherRegistry, PageFetcher, RetryingFetcher}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.util.concurrent.atomic.AtomicInteger

/** In-memory "API": 250 series rows, supports the reference's param
  * surface (exact title, titleStartsWith) + total reporting. Records the
  * params it was called with so pushdown is observable. */
class FakeApi extends PageFetcher {
  @volatile var lastParams: Map[String, String] = Map.empty
  val calls = new AtomicInteger(0)

  override val schema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("title", StringType),
    StructField("start_year", IntegerType)))

  private val data = (0 until 250).map { i =>
    Row(i.toLong, (if (i % 3 == 0) "Amazing " else "Spider ") + s"Series $i", 1990 + i % 30)
  }

  private def filtered(params: Map[String, String]) = {
    lastParams = params
    val rows = data
      .filter(r => params.get("title").forall(_ == r.getString(1)))
      .filter(r => params.get("titleStartsWith").forall(p => r.getString(1).startsWith(p)))
    // Marvel-style orderBy param: comma-separated fields, `-` prefix = desc.
    // foldRight: later terms are applied first, so stable sort makes the
    // first term the primary key.
    params.get("orderBy").fold(rows) { spec =>
      spec.split(",").foldRight(rows) { (term, acc) =>
        val desc = term.startsWith("-")
        val f = schema.fieldIndex(if (desc) term.drop(1) else term)
        val sorted = acc.sortBy { r =>
          r.get(f) match {
            case l: Long => f"$l%020d"
            case i: Int => f"$i%020d"
            case s: String => s
          }
        }
        if (desc) sorted.reverse else sorted
      }
    }
  }

  // countdown of artificially SLOW total() probes (adaptive-backpressure
  // spec: each slow probe simulates a degraded API)
  val slowProbes = new AtomicInteger(0)
  @volatile var slowProbeMs: Long = 0L

  override def total(params: Map[String, String]): Option[Int] = {
    if (slowProbes.getAndUpdate(n => math.max(0, n - 1)) > 0) Thread.sleep(slowProbeMs)
    Some(filtered(params).size)
  }

  override def fetch(params: Map[String, String], offset: Int, limit: Int): Seq[Row] = {
    calls.incrementAndGet()
    filtered(params).slice(offset, offset + limit)
  }
}

class RestSourceSpec extends SparkSpec {
  import spark.implicits._

  private def load(name: String, api: PageFetcher, pageSize: Int = 40) = {
    FetcherRegistry.register(name, api)
    spark.read.format("graft.sources.rest.RestSource")
      .option("fetcher", name).option("pageSize", pageSize.toString).load()
  }

  test("full scan paginates across parallel page-range partitions") {
    val api = new FakeApi
    val df = load("fake_full", api)
    assert(df.count() == 250)
    // 7 page-range InputPartitions planned (Spark may pack them into fewer
    // RDD partitions); the scan must still be parallel, not a driver loop.
    assert(df.rdd.getNumPartitions >= 2)
  }

  test("StartsWith filter is pushed down to the API as a param") {
    val api = new FakeApi
    val got = load("fake_prefix", api).filter($"title".startsWith("Amazing"))
      .select("id").as[Long].collect()
    assert(got.length == 84)
    assert(api.lastParams.get("titleStartsWith").contains("Amazing"))
  }

  test("equality filter + column pruning reach the source") {
    val api = new FakeApi
    val got = load("fake_eq", api).filter($"title" === "Spider Series 1")
      .select("id").as[Long].collect()
    assert(got.toSeq == Seq(1L))
    assert(api.lastParams.get("title").contains("Spider Series 1"))
  }

  test("limit pushdown caps the fetched range") {
    val api = new FakeApi
    val got = load("fake_limit", api).limit(5).collect()
    assert(got.length == 5)
    // one page of 40 max — not the full 250-row scan
    assert(api.calls.get() <= 2)
  }

  test("ORDER BY + LIMIT is pushed to the API; no Spark-side Sort remains") {
    val api = new FakeApi
    val df = load("fake_topn", api).orderBy($"start_year".desc).limit(5)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Sort"), s"Spark-side Sort survived TopN pushdown:\n$plan")
    val got = df.select("start_year").as[Int].collect()
    assert(got.toSeq == Seq(2019, 2019, 2019, 2019, 2019))
    assert(api.lastParams.get("orderBy").contains("-start_year"))
    // single ordered partition paginating front-to-back, capped at the limit
    assert(df.rdd.getNumPartitions == 1)
  }

  test("multi-column ascending sort pushes in API encoding") {
    val api = new FakeApi
    val df = load("fake_topn2", api).orderBy($"start_year", $"id".desc).limit(3)
    val got = df.select("id").as[Long].collect()
    assert(api.lastParams.get("orderBy").contains("start_year,-id"))
    // start_year == 1990 rows are id % 30 == 0; desc id within the year
    assert(got.toSeq == Seq(240L, 210L, 180L))
  }

  test("streaming read: pagination-offset micro-batches reassemble the batch scan exactly") {
    // offset = the API pagination offset; maxOffsetsPerTrigger = 60 over
    // 250 rows -> windows [0,60) [60,120) [120,180) [180,240) [240,250):
    // 5 micro-batches that must reassemble the batch DSV2 read exactly
    val api = new FakeApi
    FetcherRegistry.register("fake_stream", api)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rest_stream").toString
    val q = spark.readStream.format("graft.sources.rest.RestSource")
      .option("fetcher", "fake_stream").option("pageSize", "40")
      .option("maxOffsetsPerTrigger", "60").load()
      .writeStream.format("memory").queryName("rest_stream")
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    val nonEmpty = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    val streamed = spark.table("rest_stream")
      .select("id", "title", "start_year").as[(Long, String, Int)].collect().sortBy(_._1)
    val batch = load("fake_stream_batch", new FakeApi)
      .select("id", "title", "start_year").as[(Long, String, Int)].collect().sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq,
      "micro-batched pagination must equal the batch scan")
    assert(nonEmpty == 5, s"expected 5 throttled micro-batches, saw $nonEmpty")
  }

  test("streaming read honors maxItems exactly like the batch scan") {
    // the same options must mean the same bound in both modes: a stream
    // with maxItems=100 stops at 100 rows, not at the API's 250 total
    val api = new FakeApi
    FetcherRegistry.register("fake_stream_cap", api)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rest_cap").toString
    val q = spark.readStream.format("graft.sources.rest.RestSource")
      .option("fetcher", "fake_stream_cap").option("pageSize", "40")
      .option("maxItems", "100").load()
      .writeStream.format("memory").queryName("rest_stream_cap")
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("rest_stream_cap").count() == 100,
      "stream must stop at the maxItems cap")
  }

  test("adaptive backpressure: latency spikes halve the planned window, recovery doubles it back") {
    // AIMD throttle derived from the per-trigger total() probe latency —
    // the responsive analogue of the reference's fixed per-request sleep.
    // Two slow probes then healthy ones, budget ceiling 60, spike bar
    // 40ms: windows must run 30, 15 (halve, halve), then 30, 60, 60, 55
    // (double back to the ceiling) over the 250-row corpus.
    // generous margins keep the test timing-robust: a "healthy" probe
    // (no sleep) would need a 500ms stall to misread as a spike, and a
    // "slow" probe sleeps 3x the bar
    val api = new FakeApi
    api.slowProbes.set(2)
    api.slowProbeMs = 1500L
    FetcherRegistry.register("fake_stream_adaptive", api)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rest_adapt").toString
    val q = spark.readStream.format("graft.sources.rest.RestSource")
      .option("fetcher", "fake_stream_adaptive").option("pageSize", "40")
      .option("maxOffsetsPerTrigger", "60").option("latencySpikeMs", "500").load()
      .writeStream.format("memory").queryName("rest_stream_adaptive")
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    val windows = q.recentProgress.map(_.numInputRows).filter(_ > 0).toSeq
    q.stop()
    assert(windows == Seq(30L, 15L, 30L, 60L, 60L, 55L),
      s"expected halve/halve/recover window sizes, got $windows")
    // throttling must not lose or duplicate rows
    assert(spark.table("rest_stream_adaptive").count() == 250)
  }

  test("RetryingFetcher does not retry task interruption") {
    val interrupting = new PageFetcher {
      val attempts = new AtomicInteger(0)
      override val schema: StructType = StructType(Seq(StructField("id", LongType)))
      override def total(params: Map[String, String]): Option[Int] = Some(1)
      override def fetch(params: Map[String, String], offset: Int, limit: Int): Seq[Row] = {
        attempts.incrementAndGet()
        throw new InterruptedException("task killed")
      }
    }
    val r = new RetryingFetcher(interrupting, maxRetries = 5, baseSleepMs = 1)
    intercept[InterruptedException] { r.fetch(Map.empty, 0, 10) }
    // fatal-to-the-task failures surface on the FIRST attempt — a killed
    // task must not linger through 5 growing backoffs
    assert(interrupting.attempts.get() == 1)
  }

  test("RetryingFetcher retries transient failures with backoff") {
    val flaky = new PageFetcher {
      val attempts = new AtomicInteger(0)
      override val schema: StructType = StructType(Seq(StructField("id", LongType)))
      override def total(params: Map[String, String]): Option[Int] = Some(1)
      override def fetch(params: Map[String, String], offset: Int, limit: Int): Seq[Row] = {
        if (attempts.incrementAndGet() < 3) throw new RuntimeException("503")
        Seq(Row(7L))
      }
    }
    val r = new RetryingFetcher(flaky, maxRetries = 5, baseSleepMs = 1)
    assert(r.fetch(Map.empty, 0, 10) == Seq(Row(7L)))
    assert(flaky.attempts.get() == 3)
  }
}
