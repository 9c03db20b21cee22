package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, plus partition-batched feature extraction.
  *
  * The Spark-side shape is real (schema, partitioning, batch iteration,
  * output contract). IMAGE decode is real: the JDK ships `javax.imageio`
  * (PNG/BMP/GIF/JPEG), so `kind = "image"` payloads decode to true
  * width/height/pixel features with no external codec. AUDIO decode is
  * real for PCM containers: `javax.sound.sampled` (WAV/AIFF/AU, 8/16-bit)
  * yields true sample-rate/duration/energy features. VIDEO decode remains
  * a clearly-marked STUB — a deterministic fake standing in for demuxer
  * libraries this container does not ship (in PySpark the same seam is a
  * Pandas UDF under `mapInPandas`; in Scala the per-partition iterator
  * below is the equivalent batch boundary: one decoder init per
  * partition, streaming row batches through it).
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

  /** Real image decode via the JDK's `javax.imageio` (PNG/BMP/GIF/JPEG —
    * no external codec). Feature layout in `dim` floats:
    *
    *   [0] width   [1] height   [2..4] mean R/G/B in [0,1]
    *   [5..dim)    mean luma ((r+g+b)/3/255) per equal-width column
    *               stripe — a coarse spatial profile (stripes beyond the
    *               image width stay 0)
    *
    * One pass over the pixels; integer accumulation, so the result is
    * bit-deterministic. Returns None when the payload is not a decodable
    * image — the caller falls back to the deterministic stub, keeping the
    * plumbing contract intact for synthetic fixtures. */
  private[graft] def decodeImage(bytes: Array[Byte], dim: Int): Option[Array[Float]] = {
    if (bytes == null || bytes.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    val nStripes = math.max(dim - 5, 0)
    val stripeSum = new Array[Long](math.max(nStripes, 1))
    val stripeN = new Array[Long](math.max(nStripes, 1))
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        sr += r; sg += g; sb += b
        if (nStripes > 0) {
          val s = math.min(x * nStripes / w, nStripes - 1)
          stripeSum(s) += r + g + b
          stripeN(s) += 3
        }
        x += 1
      }
      y += 1
    }
    val out = new Array[Float](dim)
    def put(i: Int, v: Float): Unit = if (i < dim) out(i) = v
    put(0, w.toFloat); put(1, h.toFloat)
    val n = w.toLong * h * 255L
    if (n > 0) { put(2, sr.toFloat / n); put(3, sg.toFloat / n); put(4, sb.toFloat / n) }
    var s = 0
    while (s < nStripes) {
      if (stripeN(s) > 0) put(5 + s, stripeSum(s).toFloat / (stripeN(s) * 255L))
      s += 1
    }
    Some(out)
  }

  /** Real audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU
    * containers, PCM 8/16-bit — no external codec). Feature layout in
    * `dim` floats:
    *
    *   [0] sample rate   [1] channels   [2] frame count
    *   [3] RMS amplitude in [0,1]   [4] mean |amplitude| in [0,1]
    *   [5..dim)  RMS per equal-width TIME stripe — a coarse temporal
    *             energy profile (the audio analog of the image decoder's
    *             column stripes)
    *
    * Samples normalize to the signed-16-bit domain and accumulate as
    * exact integer sums (one pass), so results are bit-deterministic.
    * Returns None for non-PCM encodings or payloads no installed reader
    * accepts — the caller falls back to the deterministic stub. */
  /** One 16-bit PCM sample (high byte first) to the signed-16 domain.
    * Signed keeps b0's sign extension; unsigned must NOT sign-extend the
    * high byte (0xFF00 is 65280, not -256) before the midpoint shift —
    * sign-extending would decode samples >= 0x8000 a full 65536 too low. */
  private[graft] def pcm16Sample(b0: Byte, b1: Byte, signed: Boolean): Int =
    if (signed) (b0 << 8) | (b1 & 0xff)
    else (((b0 & 0xff) << 8) | (b1 & 0xff)) - 32768

  private[graft] def decodeAudio(bytes: Array[Byte], dim: Int): Option[Array[Float]] = {
    if (bytes == null || bytes.isEmpty) return None
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val ais =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (ais == null) return None
    try {
      val fmt = ais.getFormat
      val enc = fmt.getEncoding
      val bits = fmt.getSampleSizeInBits
      val signed = enc == AudioFormat.Encoding.PCM_SIGNED
      if ((!signed && enc != AudioFormat.Encoding.PCM_UNSIGNED) ||
        (bits != 8 && bits != 16)) return None
      val data = ais.readAllBytes()
      val channels = fmt.getChannels
      val frameSize = (bits / 8) * channels
      val nFrames = data.length / frameSize
      if (nFrames == 0) return None
      val big = fmt.isBigEndian
      val nStripes = math.max(dim - 5, 0)
      val stripeSq = new Array[Long](math.max(nStripes, 1))
      val stripeN = new Array[Long](math.max(nStripes, 1))
      var sumSq = 0L
      var sumAbs = 0L
      var f = 0
      while (f < nFrames) {
        val s = if (nStripes > 0) math.min(f * nStripes / nFrames, nStripes - 1) else 0
        var c = 0
        while (c < channels) {
          val off = f * frameSize + c * (bits / 8)
          // normalize every sample to the signed-16-bit domain
          val v =
            if (bits == 8) {
              val raw = if (signed) data(off).toInt else (data(off) & 0xff) - 128
              raw << 8
            } else {
              val (b0, b1) = if (big) (data(off), data(off + 1)) else (data(off + 1), data(off))
              pcm16Sample(b0, b1, signed)
            }
          sumSq += v.toLong * v
          sumAbs += math.abs(v.toLong)
          if (nStripes > 0) { stripeSq(s) += v.toLong * v; stripeN(s) += 1 }
          c += 1
        }
        f += 1
      }
      val n = nFrames.toLong * channels
      val out = new Array[Float](dim)
      def put(i: Int, v: Float): Unit = if (i < dim) out(i) = v
      put(0, fmt.getSampleRate)
      put(1, channels.toFloat)
      put(2, nFrames.toFloat)
      put(3, (math.sqrt(sumSq.toDouble / n) / 32768.0).toFloat)
      put(4, (sumAbs.toDouble / n / 32768.0).toFloat)
      var s = 0
      while (s < nStripes) {
        if (stripeN(s) > 0)
          put(5 + s, (math.sqrt(stripeSq(s).toDouble / stripeN(s)) / 32768.0).toFloat)
        s += 1
      }
      Some(out)
    } finally ais.close()
  }

  /** STUB decoder for VIDEO (and image/audio payloads no installed reader
    * accepts) — PERMANENTLY out of scope for real decode in this build
    * (see README "Out of scope"): the runtime is JDK-only, and the JDK
    * ships no video demuxer or codec (javax.imageio and javax.sound are
    * the only standard media stacks — both used for real above). The
    * contract here is the deterministic fake: `dim` floats derived from
    * the payload bytes, so every piece of Spark-side plumbing a real
    * codec would ride — schema, partition batching, ordering,
    * null-safety, join-back — is exercised end-to-end by MultimodalSpec.
    * Swapping in a real decoder on a cluster with codec jars is a local
    * change to this one function.
    */
  private[graft] def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
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
    * through without materializing the partition. Images decode for real
    * (javax.imageio), audio decodes for real (javax.sound PCM); video —
    * and any payload no installed reader accepts — falls back to the
    * deterministic stub. Returns a typed Dataset ready to join back on
    * media_id.
    */
  def featurize(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // decoder/session init would happen HERE, once per partition
      // (ImageIO reader instances are per-call; heavier codecs cache here)
      rows.map { r =>
        val feats = (r.kind match {
          case "image" => decodeImage(r.bytes, dim)
          case "audio" => decodeAudio(r.bytes, dim)
          case _ => None
        }).getOrElse(decodeStub(r.bytes, dim))
        MediaFeatures(r.media_id, r.kind,
          if (r.bytes == null) 0L else r.bytes.length.toLong,
          feats)
      }
    }
  }

  /** Nearest-neighbor resample to exactly (w2, h2): output pixel (x, y)
    * copies source pixel (x·w/w2, y·h/h2) — integer floor mapping, no
    * interpolation, so the result is bit-deterministic (Graphics2D's
    * scaling filters are implementation-defined; direct indexing is not).
    * Re-encodes as PNG (lossless — the pixels, not the encoder, are the
    * contract). None when the payload is not a decodable image. */
  private[graft] def resizeImageBytes(bytes: Array[Byte], w2: Int, h2: Int): Option[Array[Byte]] = {
    if (bytes == null || bytes.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return None
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0) return None
    val out = new java.awt.image.BufferedImage(w2, h2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h2) {
      val sy = (y.toLong * h / h2).toInt
      var x = 0
      while (x < w2) {
        out.setRGB(x, y, img.getRGB((x.toLong * w / w2).toInt, sy))
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", baos)
    Some(baos.toByteArray)
  }

  /** Map-only image resize over a media table: image payloads that decode
    * re-encode at (width, height) as PNG with meta `format = "png"`
    * marked `resized = true`; everything else (audio/video rows,
    * undecodable payloads) passes through unchanged with
    * `resized = false`. Same per-partition batch seam as featurize —
    * decoder init amortizes across each partition's rows, rows stream
    * through, nothing materializes. */
  def resizeImages(media: Dataset[MediaRow], width: Int, height: Int): DataFrame = {
    require(width > 0 && height > 0, s"target dims must be positive, got ${width}x$height")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val resized = if (r.kind == "image") resizeImageBytes(r.bytes, width, height) else None
        (r.media_id, r.kind, resized.getOrElse(r.bytes), resized.isDefined)
      }
    }.toDF("media_id", "kind", "bytes", "resized")
  }

  /** Frame sampling for video payloads: every `stride`-th fixed-size chunk
    * is treated as a frame (STUB chunking; a real demuxer yields frames).
    * Output explodes to one row per sampled frame — downstream image ops
    * apply uniformly.
    *
    * Output contract: (media_id, frame_idx, frame, frame_source) where
    * `frame_source` is the constant `"stub_chunk"` — the column marks, in
    * the data itself, that these frames are fixed-size byte chunks from
    * the stub chunker, not demuxed video frames; a real demuxer
    * implementation would emit `"demux"` here so downstream consumers can
    * tell the two apart (the same honesty contract as decodeStub). */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    media
      .filter(col("kind") === "video" && col("bytes").isNotNull)
      .select(col("media_id"),
        posexplode(expr(
          s"transform(sequence(0, CAST(floor((length(bytes) - 1) / $frameBytes) AS INT), $stride), " +
          s"i -> substring(bytes, i * $frameBytes + 1, $frameBytes))")).as(Seq("frame_idx", "frame")))
      .withColumn("frame_source", lit("stub_chunk"))
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
