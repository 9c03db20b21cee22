package graft.sources.rest

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.sources.{EqualTo, Filter, StringStartsWith}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._
import scala.collection.concurrent.TrieMap

/** DataSource V2 batch source for a paginated REST-style API — the
  * reference's Marvel/ComicVine extractors (SURVEY.md §2.1 S1-S5, S10)
  * re-expressed as a Spark connector:
  *
  *  - pagination -> one InputPartition per page range (parallel fetch),
  *    planned from the API's `total` when known
  *    (`etl/sources/marvel_extract.py:61-87` stop-on-total loop);
  *  - server-side filters -> SupportsPushDownFilters: EqualTo and
  *    StringStartsWith become request params (`titleStartsWith`,
  *    `filter=volume:X` in the reference);
  *  - field_list projection -> SupportsPushDownRequiredColumns
  *    (`cv_fetch_covers.py:107`);
  *  - `limit:1` point reads -> SupportsPushDownLimit.
  *
  * Transport is pluggable via [[PageFetcher]]: production would be an HTTP
  * client with the reference's retry/backoff (see [[RetryingFetcher]]);
  * this zero-egress environment registers in-memory fetchers through
  * [[FetcherRegistry]] (option `fetcher=<name>`).
  *
  * Usage: `spark.read.format("graft.sources.rest.RestSource")
  *   .option("fetcher", name).option("pageSize", "100").load()`
  */
class RestSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FetcherRegistry.get(options.get("fetcher")).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new RestTable(schema, properties.asScala.toMap)

  override def supportsExternalMetadata(): Boolean = true
}

/** One page request: filters already translated to API params. */
trait PageFetcher extends Serializable {
  def schema: StructType
  /** Total row count for `params`, if the API reports one (enables
    * parallel page-range planning). */
  def total(params: Map[String, String]): Option[Int]
  /** Fetch rows [offset, offset+limit). A short page ends pagination. */
  def fetch(params: Map[String, String], offset: Int, limit: Int): Seq[Row]
}

/** S5 retry/backoff decorator (reference: 5 attempts, exponential 1.5^n —
  * `etl/seed/seed_from_marvel.py:58-88`). Wraps any fetcher; sleeps grow
  * exponentially and the last failure propagates.
  *
  * Only NonFatal failures are retried: OOM/LinkageError must surface
  * immediately, and an InterruptedException (task kill) must cancel the
  * fetch rather than linger through 5 growing backoffs. A backoff sleep
  * that is itself interrupted restores the interrupt flag and rethrows the
  * pending failure, so speculative-execution kills take effect promptly. */
final class RetryingFetcher(inner: PageFetcher, maxRetries: Int = 5,
                            baseSleepMs: Long = 1500) extends PageFetcher {
  override def schema: StructType = inner.schema
  override def total(params: Map[String, String]): Option[Int] = inner.total(params)
  override def fetch(params: Map[String, String], offset: Int, limit: Int): Seq[Row] = {
    var attempt = 0
    while (true) {
      try return inner.fetch(params, offset, limit)
      catch {
        case scala.util.control.NonFatal(e) =>
          attempt += 1
          if (attempt >= maxRetries) throw e
          try Thread.sleep((baseSleepMs * math.pow(1.5, attempt - 1)).toLong)
          catch {
            case _: InterruptedException =>
              Thread.currentThread().interrupt()
              throw e
          }
      }
    }
    Nil // unreachable
  }
}

/** Name -> fetcher registry: DSV2 instantiates providers reflectively, so
  * fetchers are wired by name through source options. */
object FetcherRegistry {
  private val fetchers = TrieMap.empty[String, PageFetcher]
  def register(name: String, f: PageFetcher): Unit = fetchers.put(name, f)
  def get(name: String): PageFetcher =
    fetchers.getOrElse(name,
      throw new IllegalArgumentException(s"no fetcher registered as '$name'"))
}

private[rest] class RestTable(schema: StructType, properties: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"rest(${properties.getOrElse("fetcher", "?")})"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(schema, options.asScala.toMap)
}

private[rest] class RestScanBuilder(fullSchema: StructType, options0: Map[String, String])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit
    with SupportsPushDownTopN {

  // CaseInsensitiveStringMap hands keys over LOWERCASED — normalize so
  // camelCase option names ("pageSize", "maxItems", "maxOffsetsPerTrigger",
  // "extraParams") resolve no matter which form the map arrived in
  private val options: Map[String, String] =
    options0.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema
  private var limit: Option[Int] = None
  private var orderBy: Option[String] = None

  /** EqualTo / StringStartsWith become API params; everything else stays a
    * Spark-side residual (returned back to Catalyst). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition {
      case EqualTo(_, v) => v != null && !v.isInstanceOf[Array[_]]
      case StringStartsWith(_, _) => true
      case _ => false
    }
    pushed = supported
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }

  /** O7 API-pushed sort (reference: `orderBy=issueNumber` /
    * `orderBy=-onsaleDate` request params — `etl/sources/marvel_extract.py:17`,
    * `etl/seed/seed_from_marvel.py:160`): ORDER BY + LIMIT over this source
    * becomes an `orderBy` param in Marvel's `-`-prefix-for-descending
    * encoding, and the Spark-side Sort is removed entirely
    * (isPartiallyPushed = false — the scan then plans a SINGLE ordered
    * partition, because parallel page ranges cannot guarantee a global
    * order). Only simple column sorts with the direction's default null
    * ordering are pushed; anything else stays a Spark-side Sort. */
  override def pushTopN(orders: Array[SortOrder], l: Int): Boolean = {
    val encoded = orders.toSeq.map { o =>
      o.expression() match {
        case nr: NamedReference
            if nr.fieldNames().length == 1 &&
              o.nullOrdering() == o.direction().defaultNullOrdering() =>
          Some((if (o.direction() == SortDirection.DESCENDING) "-" else "") +
            nr.fieldNames()(0))
        case _ => None
      }
    }
    if (encoded.nonEmpty && encoded.forall(_.isDefined)) {
      orderBy = Some(encoded.flatten.mkString(","))
      limit = Some(l)
      true
    } else false
  }
  override def isPartiallyPushed(): Boolean = false

  override def build(): Scan = {
    val params = pushed.flatMap {
      case EqualTo(attr, v) => Some(attr -> v.toString)
      case StringStartsWith(attr, prefix) => Some(s"${attr}StartsWith" -> prefix)
      case _ => None
    }.toMap ++
      orderBy.map("orderBy" -> _) ++
      options.get("extraparams").map(p => "extraParams" -> p)
    new RestScan(options, params, required, limit)
  }
}

private[rest] case class RestPageRange(offset: Int, count: Int) extends InputPartition

private[rest] class RestScan(options: Map[String, String], params: Map[String, String],
                             required: StructType, limit: Option[Int])
    extends Scan with Batch {

  // keys arrive lowercased (see RestScanBuilder's normalization)
  private val pageSize = options.getOrElse("pagesize", "100").toInt
  private val maxItems = options.get("maxitems").map(_.toInt)

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"RestScan(params=$params, columns=${required.fieldNames.mkString(",")}, limit=$limit)"

  /** Page-range planning: with a known total, ceil(total/pageSize)
    * partitions fetch in parallel (the reference's sequential offset loop,
    * distributed); unknown total degrades to a single partition that
    * paginates until a short page. */
  override def planInputPartitions(): Array[InputPartition] = {
    val fetcher = FetcherRegistry.get(options("fetcher"))
    val cap = (maxItems.toSeq ++ limit.toSeq).reduceOption(_ min _)
    fetcher.total(params) match {
      case Some(total) if !params.contains("orderBy") =>
        val n = cap.fold(total)(total min _)
        (0 until n by pageSize)
          .map(off => RestPageRange(off, pageSize min (n - off))).toArray
      case Some(total) =>
        // A fully-pushed TopN removed the Spark-side Sort, so the scan's own
        // row order IS the result order: one partition paginating the
        // API's sorted listing front-to-back (the reference's sequential
        // orderBy'd offset loop), capped at the pushed limit.
        Array(RestPageRange(0, cap.fold(total)(total min _)))
      case None =>
        Array(RestPageRange(0, cap.getOrElse(Int.MaxValue)))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory(options("fetcher"), params, required, pageSize)

  /** §2.9 streaming read: the reference's sequential pagination loop
    * (`etl/sources/marvel_extract.py:14-27` — fetch a page, advance
    * `offset`, stop at `total`) as a Structured Streaming source whose
    * OFFSET IS the API pagination offset. Each trigger advances at most
    * `maxOffsetsPerTrigger` rows past the last planned end (the throttle
    * analogue of the reference's per-request sleep), and the window
    * [start, end) plans the same parallel page ranges as the batch scan —
    * checkpointed offsets give exactly-once page consumption across
    * restarts. Limit/TopN pushdowns don't apply to the unbounded form,
    * but the user-facing `maxItems` option caps the stream's high-water
    * mark exactly as it caps the batch scan's row count — the same
    * options must mean the same bound in both modes. */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new RestMicroBatchStream(options("fetcher"), params, required, pageSize,
      options.get("maxoffsetspertrigger").map(_.toLong),
      options.get("maxitems").map(_.toLong),
      options.get("latencyspikems").map(_.toLong))
}

private[rest] case class RestOffset(offset: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = offset.toString
}

private[rest] class RestMicroBatchStream(fetcherName: String,
                                         params: Map[String, String],
                                         required: StructType, pageSize: Int,
                                         maxPerTrigger: Option[Long],
                                         maxItems: Option[Long] = None,
                                         latencySpikeMs: Option[Long] = None)
    extends MicroBatchStream {
  require(maxPerTrigger.forall(_ > 0), "maxOffsetsPerTrigger must be > 0")
  require(maxItems.forall(_ > 0), "maxItems must be > 0")
  require(latencySpikeMs.forall(_ > 0), "latencySpikeMs must be > 0")
  require(latencySpikeMs.isEmpty || maxPerTrigger.isDefined,
    "adaptive backpressure (latencySpikeMs) needs maxOffsetsPerTrigger as its budget ceiling")
  private def fetcher = FetcherRegistry.get(fetcherName)
  // furthest end this stream has planned/acknowledged — throttling is
  // relative to it; restart recovery folds checkpointed offsets in via
  // deserializeOffset before the first latestOffset call
  @volatile private var highWater: Long = 0L
  // ADAPTIVE BACKPRESSURE: the per-trigger offset budget, derived from
  // observed API latency — the rate-limit analogue of the reference's
  // fixed per-request sleep (`etl/seed/seed_from_marvel.py:175`), made
  // responsive: each trigger's `total()` probe doubles as a latency
  // sample, a sample above latencySpikeMs HALVES the next window (down
  // to 1 offset), and a healthy sample doubles it back toward the
  // maxOffsetsPerTrigger ceiling. AIMD-shaped, so a degraded API sheds
  // load geometrically while recovery is fast once latency normalizes.
  @volatile private var budget: Long = maxPerTrigger.getOrElse(Long.MaxValue)

  override def initialOffset(): org.apache.spark.sql.connector.read.streaming.Offset =
    RestOffset(0L)

  override def deserializeOffset(json: String): org.apache.spark.sql.connector.read.streaming.Offset = {
    val o = json.toLong
    if (o > highWater) highWater = o
    RestOffset(o)
  }

  override def latestOffset(): org.apache.spark.sql.connector.read.streaming.Offset = {
    val t0 = System.nanoTime()
    val apiTotal = fetcher.total(params).getOrElse(throw new IllegalStateException(
      s"fetcher '$fetcherName' reports no total — the streaming source needs " +
        "the API's total to bound each pagination window")).toLong
    val probeMs = (System.nanoTime() - t0) / 1000000L
    latencySpikeMs.foreach { spike =>
      val ceiling = maxPerTrigger.get
      budget =
        if (probeMs > spike) math.max(1L, budget / 2)
        else if (budget >= ceiling / 2) ceiling // doubling would pass (or overflow past) the ceiling
        else budget * 2
    }
    // maxItems caps the stream exactly as it caps the batch scan
    val total = maxItems.fold(apiTotal)(math.min(apiTotal, _))
    val end = maxPerTrigger.fold(total)(_ => math.min(total, highWater + budget))
    if (end > highWater) highWater = end
    RestOffset(math.max(end, highWater))
  }

  override def planInputPartitions(start: org.apache.spark.sql.connector.read.streaming.Offset,
                                   end: org.apache.spark.sql.connector.read.streaming.Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[RestOffset].offset
    val e = end.asInstanceOf[RestOffset].offset
    // offsets are Long in the checkpoint protocol, but the page fetch API
    // takes an Int offset — fail loudly rather than wrap negative past
    // 2^31 and silently re-fetch wrong pages
    require(e <= Int.MaxValue,
      s"stream offset $e exceeds the Int pagination range of the REST API")
    (s until e by pageSize.toLong)
      .map(off => RestPageRange(off.toInt, pageSize min (e - off).toInt)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory(fetcherName, params, required, pageSize)

  override def commit(end: org.apache.spark.sql.connector.read.streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

private[rest] class RestReaderFactory(fetcherName: String, params: Map[String, String],
                                      required: StructType, pageSize: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RestPartitionReader(fetcherName, params, required, pageSize,
      partition.asInstanceOf[RestPageRange])
}

private[rest] class RestPartitionReader(fetcherName: String, params: Map[String, String],
                                        required: StructType, pageSize: Int,
                                        range: RestPageRange)
    extends PartitionReader[InternalRow] {

  private val fetcher = FetcherRegistry.get(fetcherName)
  private val toCatalyst = CatalystTypeConverters.createToCatalystConverter(required)
  private var emitted = 0
  private var buffer: Iterator[Row] = Iterator.empty
  private var nextOffset = range.offset
  private var exhausted = false
  private var current: InternalRow = _

  // val, not def: name->index resolution and the array allocation must not
  // run once per row in the read hot loop.
  private val fieldOrdinals: Seq[Int] =
    required.fieldNames.map(n => fetcher.schema.fieldIndex(n)).toSeq

  override def next(): Boolean = {
    while (!buffer.hasNext && !exhausted && emitted < range.count) {
      val want = pageSize min (range.count - emitted)
      val page = fetcher.fetch(params, nextOffset, want)
      nextOffset += page.size
      if (page.size < want) exhausted = true
      buffer = page.iterator
    }
    if (buffer.hasNext && emitted < range.count) {
      val row = buffer.next()
      // column pruning: project the fetched row down to the required schema
      val projected = Row.fromSeq(fieldOrdinals.map(row.get))
      current = toCatalyst(projected).asInstanceOf[InternalRow]
      emitted += 1
      true
    } else false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
