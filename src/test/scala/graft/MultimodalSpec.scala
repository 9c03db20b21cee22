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
  }
}
