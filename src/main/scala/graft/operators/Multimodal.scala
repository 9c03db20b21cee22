package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, plus partition-batched feature extraction.
  *
  * The Spark-side shape is real (schema, partitioning, batch iteration,
  * output contract); the media DECODE itself is a clearly-marked STUB — a
  * deterministic fake standing in for the codec libraries this container
  * does not ship (in PySpark the same seam is a Pandas UDF under
  * `mapInPandas`; in Scala the per-partition iterator below is the
  * equivalent batch boundary: one decoder init per partition, streaming
  * row batches through it).
  */
object Multimodal {

  /** Canonical media-table schema: binary payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),      // image|audio|video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("format", StringType, nullable = true))), nullable = true)))

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 features: Array[Float])

  /** STUB decoder: a real implementation would hand `bytes` to an image/
    * audio codec and pool model features. This deterministic fake derives
    * `dim` floats from the payload so the plumbing (schema, batching,
    * ordering, null-safety) is testable end-to-end.
    */
  private[operators] def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real codec goes here; deterministic fake below.
    val out = new Array[Float](dim)
    if (bytes != null && bytes.nonEmpty) {
      var i = 0
      while (i < dim) {
        out(i) = ((bytes(i % bytes.length) & 0xff) - 128) / 128.0f
        i += 1
      }
    }
    out
  }

  /** Partition-batched feature extraction: one "decoder" per partition
    * (expensive init amortized across the partition's rows), rows stream
    * through without materializing the partition. Returns a typed Dataset
    * ready to join back on media_id.
    */
  def featurize(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // decoder/session init would happen HERE, once per partition
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind,
          if (r.bytes == null) 0L else r.bytes.length.toLong,
          decodeStub(r.bytes, dim))
      }
    }
  }

  /** Frame sampling for video payloads: every `stride`-th fixed-size chunk
    * is treated as a frame (STUB chunking; a real demuxer yields frames).
    * Output explodes to one row per sampled frame — downstream image ops
    * apply uniformly. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    media
      .filter(col("kind") === "video" && col("bytes").isNotNull)
      .select(col("media_id"),
        posexplode(expr(
          s"transform(sequence(0, CAST(floor((length(bytes) - 1) / $frameBytes) AS INT), $stride), " +
          s"i -> substring(bytes, i * $frameBytes + 1, $frameBytes))")).as(Seq("frame_idx", "frame")))
  }

  /** Plan GPU-inference micro-batches over variable-size payloads: batch
    * membership is bounded by TOTAL BYTES (the real accelerator-memory
    * constraint), not row count, via the same per-shard running-sum
    * packing as trainer sequences (Export.packByWeight). Output adds
    * (shard, batch) — repartitioning on them lands each micro-batch in
    * one task, so the per-partition decoder in `featurize` sees exactly
    * one batch's payloads at a time. Deterministic: a re-run after a
    * failed inference job rebuilds identical batches. */
  def batchForInference(media: DataFrame, byteBudget: Long,
                        nShards: Int = 64): DataFrame =
    graft.operators.Export.packByWeight(
        media.withColumn("n_bytes",
          coalesce(length(col("bytes")).cast(LongType), lit(0L))),
        "media_id", "n_bytes", nShards, byteBudget)
      .withColumnRenamed("pack", "batch")

  /** Read a directory of raw media files as (path, bytes, length) — the
    * binaryFile source is the ingestion edge for multimodal data. */
  def readBinaryDir(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content").as("bytes"), col("length"))

  /** S11 write side — binary media sink (reference `cv_fetch_covers.py:
    * 116-126` download_image writes covers/<id>.jpg): write one file per
    * row under `dir`, named by `nameCol` (a relative path; subdirectories
    * are created), bytes from `bytesCol`. Round-trips readBinaryDir
    * byte-identically (asserted in MultimodalSpec).
    *
    * Scale: the write runs foreachPartition on the EXECUTORS — each task
    * opens its own FileSystem handle and streams its partition's rows, so
    * a 100 TB media dump fans out across the cluster with no driver
    * collect. Hadoop conf is rebuilt per task from the session's
    * serialized entries, so object stores configured on the session
    * (s3a/abfs credentials etc.) work unchanged.
    */
  def writeBinaryFiles(df: DataFrame, dir: String,
                       nameCol: String = "name", bytesCol: String = "bytes"): Unit = {
    val confEntries: Array[(String, String)] = {
      val c = df.sparkSession.sessionState.newHadoopConf()
      val it = c.iterator()
      val buf = Array.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += (e.getKey -> e.getValue) }
      buf.result()
    }
    df.select(col(nameCol).cast(StringType), col(bytesCol))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val base = new org.apache.hadoop.fs.Path(dir)
        val fsys = base.getFileSystem(conf)
        rows.foreach { r =>
          val name = r.getString(0)
          require(!name.startsWith("/") && !name.split("/").contains(".."),
            s"media file name must be a relative path without ..: $name")
          val out = fsys.create(new org.apache.hadoop.fs.Path(base, name), true)
          try out.write(r.getAs[Array[Byte]](1))
          finally out.close()
        }
      }
  }
}
