package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    MediaRow(1L, "image", Array[Byte](0, 64, 127, -128)),
    MediaRow(2L, "image", Array[Byte](1, 2, 3)),
    MediaRow(3L, "audio", null)
  ).toDS()

  test("featurize produces fixed-dim features per row, null-safe") {
    val got = Multimodal.featurize(media, dim = 4).collect().sortBy(_.media_id)
    assert(got.length == 3)
    assert(got.forall(_.features.length == 4))
    assert(got(0).n_bytes == 4L)
    assert(got(2).n_bytes == 0L)
    // deterministic: same input -> same features
    val again = Multimodal.featurize(media, dim = 4).collect().sortBy(_.media_id)
    assert(got.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  private def encode(fmt: String): Array[Byte] = {
    // 2x2 image: top row red, bottom row blue
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0xff0000)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0x0000ff)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, baos), s"no $fmt writer in JDK")
    baos.toByteArray
  }

  test("featurize decodes real PNG and BMP payloads via javax.imageio") {
    val rows = Seq(
      MediaRow(1L, "image", encode("png")),
      MediaRow(2L, "image", encode("bmp")),
      MediaRow(3L, "image", Array[Byte](1, 2, 3)),     // not an image -> stub
      MediaRow(4L, "audio", Array[Byte](1, 2, 3))      // undecodable audio -> stub
    ).toDS()
    val got = Multimodal.featurize(rows, dim = 8).collect()
      .map(f => f.media_id -> f.features).toMap
    for (id <- Seq(1L, 2L)) {
      val f = got(id)
      assert(f(0) == 2.0f && f(1) == 2.0f, s"wrong dims for $id: ${f.toSeq}")
      // 2 red + 2 blue pixels: mean R = mean B = 0.5, mean G = 0
      assert(f(2) == 0.5f && f(3) == 0.0f && f(4) == 0.5f, s"wrong RGB for $id: ${f.toSeq}")
      // column-stripe luma profile: 3 stripes over width 2 -> stripes 0,1
      // hold mean (255+0+0)/3/255 = 1/3, stripe 2 is empty
      assert(math.abs(f(5) - 1f / 3) < 1e-6 && math.abs(f(6) - 1f / 3) < 1e-6)
      assert(f(7) == 0.0f)
    }
    // PNG and BMP decode to the same pixels -> identical features
    assert(got(1L).toSeq == got(2L).toSeq)
    // undecodable image payload falls back to the same stub as audio
    assert(got(3L).toSeq == got(4L).toSeq)
    val b0 = (1 - 128) / 128.0f // stub formula on first payload byte
    assert(got(4L)(0) == b0)
  }

  test("resizeImages: exact nearest-neighbor pixels, non-images pass through") {
    def pixels(bytes: Array[Byte]): Seq[Seq[Int]] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      (0 until img.getHeight).map(y =>
        (0 until img.getWidth).map(x => img.getRGB(x, y) & 0xffffff))
    }
    val rows = Seq(
      MediaRow(1L, "image", encode("png")),            // 2x2 red-over-blue
      MediaRow(2L, "image", Array[Byte](9, 9)),        // undecodable image
      MediaRow(3L, "audio", Array[Byte](1, 2, 3))      // non-image kind
    ).toDS()
    // upscale 2x2 -> 4x4: each source pixel tiles a 2x2 quadrant exactly
    val up = Multimodal.resizeImages(rows, 4, 4).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(up(1L).getBoolean(3))
    val px = pixels(up(1L).getAs[Array[Byte]](2))
    assert(px(0) == Seq(0xff0000, 0xff0000, 0xff0000, 0xff0000))
    assert(px(1) == Seq(0xff0000, 0xff0000, 0xff0000, 0xff0000))
    assert(px(2) == Seq(0x0000ff, 0x0000ff, 0x0000ff, 0x0000ff))
    assert(px(3) == Seq(0x0000ff, 0x0000ff, 0x0000ff, 0x0000ff))
    // undecodable / non-image payloads pass through byte-identical
    assert(!up(2L).getBoolean(3) && up(2L).getAs[Array[Byte]](2).toSeq == Seq[Byte](9, 9))
    assert(!up(3L).getBoolean(3) && up(3L).getAs[Array[Byte]](2).toSeq == Seq[Byte](1, 2, 3))
    // downscale 2x2 -> 1x1: floor mapping picks the top-left source pixel
    val down = Multimodal.resizeImages(rows, 1, 1).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(pixels(down(1L).getAs[Array[Byte]](2)) == Seq(Seq(0xff0000)))
    // deterministic: identical bytes across runs
    val again = Multimodal.resizeImages(rows, 4, 4).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](2).toSeq).toMap
    assert(again(1L) == up(1L).getAs[Array[Byte]](2).toSeq)
  }

  test("featurize decodes real WAV payloads via javax.sound: exact energy features") {
    // 800-sample mono 16-bit square wave at +-8192: RMS and mean|amp| are
    // EXACTLY 0.25 of full scale, in every time stripe
    val samples = Array.tabulate[Short](800)(i => if (i % 2 == 0) 8192 else -8192)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val data = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, samples.length),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val got = Multimodal.featurize(Seq(MediaRow(1L, "audio", bos.toByteArray)).toDS(), dim = 8)
      .collect().head.features
    assert(got(0) == 8000.0f && got(1) == 1.0f && got(2) == 800.0f,
      s"wrong rate/channels/frames: ${got.toSeq}")
    assert(got(3) == 0.25f && got(4) == 0.25f, s"wrong RMS/mean-abs: ${got.toSeq}")
    assert(got(5) == 0.25f && got(6) == 0.25f && got(7) == 0.25f,
      s"wrong stripe energies: ${got.toSeq}")
  }

  test("writeBinaryFiles round-trips readBinaryDir byte-identically (S11)") {
    val dir = java.nio.file.Files.createTempDirectory("mediaout").toFile.getAbsolutePath
    val payloads = Map(
      "covers/1.jpg" -> Array[Byte](-1, -40, 0, 127, -128, 13, 10, 26),  // JPEG-ish + binary-unsafe bytes
      "covers/2.png" -> Array[Byte](-119, 80, 78, 71),
      "flat.bin" -> Array.tabulate[Byte](4096)(i => (i * 31).toByte))
    Multimodal.writeBinaryFiles(
      payloads.toSeq.toDF("name", "bytes"), dir)
    val back = Multimodal.readBinaryDir(spark, dir + "/covers")
      .unionByName(Multimodal.readBinaryDir(spark, dir + "/flat.bin"))
      .select(col("path"), col("bytes")).collect()
      .map(r => r.getString(0).split("/").takeRight(1).head -> r.getAs[Array[Byte]](1))
    assert(back.length == 3)
    assert(back.forall { case (n, b) =>
      payloads(payloads.keys.find(_.endsWith(n)).get).toSeq == b.toSeq })
    // path traversal and absolute names are rejected
    intercept[org.apache.spark.SparkException] {
      Multimodal.writeBinaryFiles(Seq(("../evil", Array[Byte](1))).toDF("name", "bytes"), dir)
    }
  }

  test("sampleFrames chunks video payloads with a stride") {
    val video = Seq((10L, "video", Array.tabulate[Byte](16)(_.toByte)))
      .toDF("media_id", "kind", "bytes")
    val frames = Multimodal.sampleFrames(video, frameBytes = 4, stride = 2).collect()
    // 4 chunks of 4 bytes, stride 2 -> chunks 0 and 2
    assert(frames.length == 2)
    val first = frames.head.getAs[Array[Byte]]("frame")
    assert(first.toSeq == Seq[Byte](0, 1, 2, 3))
    // the output contract labels stub chunking in the data itself
    assert(frames.forall(_.getAs[String]("frame_source") == "stub_chunk"))
  }

  test("pcm16Sample: unsigned 16-bit does not sign-extend the high byte") {
    // signed: 0xFF00 is -256 (sign extension is the point)
    assert(Multimodal.pcm16Sample(0xff.toByte, 0x00, signed = true) == -256)
    assert(Multimodal.pcm16Sample(0x7f.toByte, 0xff.toByte, signed = true) == 32767)
    // unsigned: 0xFF00 is 65280 -> 65280 - 32768 = 32512 (the bug decoded
    // this as -256 - 32768 = -33024, outside the signed-16 domain)
    assert(Multimodal.pcm16Sample(0xff.toByte, 0x00, signed = false) == 32512)
    assert(Multimodal.pcm16Sample(0x80.toByte, 0x00, signed = false) == 0)
    assert(Multimodal.pcm16Sample(0x00, 0x00, signed = false) == -32768)
    // full unsigned range maps exactly onto [-32768, 32767]
    assert(Multimodal.pcm16Sample(0xff.toByte, 0xff.toByte, signed = false) == 32767)
  }
}
