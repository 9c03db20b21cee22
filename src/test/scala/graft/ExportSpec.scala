package graft

import graft.core.Store
import graft.operators.Export
import org.apache.spark.sql.functions._

class ExportSpec extends SparkSpec {
  import spark.implicits._

  test("packAssignments fills budget windows in stable key order") {
    // 10 docs of 5 tokens each, one shard: starts 0,5,10,... -> //16
    val docs = (1 to 10).map(i => (i.toLong, "a b c d e")).toDF("doc_id", "text")
    val got = Export.packAssignments(docs, "doc_id", "text", nShards = 1, budget = 16)
      .select("doc_id", "pack").as[(Long, Long)].collect().toMap
    val want = (1 to 10).map(i => i.toLong -> (5L * (i - 1) / 16)).toMap
    assert(got == want)
    // rerun is byte-identical (no RNG, no partition-order dependence)
    val again = Export.packAssignments(docs, "doc_id", "text", nShards = 1, budget = 16)
      .select("doc_id", "pack").as[(Long, Long)].collect().toMap
    assert(again == got)
  }

  test("packAssignments packs are per-shard: one shard never sees another's docs") {
    val docs = (1 to 400).map(i => (i.toLong, "w " * 9 + "w")).toDF("doc_id", "text")
    val a = Export.packAssignments(docs, "doc_id", "text", nShards = 8, budget = 64)
    // pack ids within each shard are dense from 0 (contiguous fill)
    val byShard = a.groupBy("shard").agg(max(col("pack")).as("mx"),
        countDistinct(col("pack")).as("n")).as[(Long, Long, Long)].collect()
    byShard.foreach { case (sh, mx, n) => assert(n == mx + 1, s"shard $sh has gaps") }
    // shard assignment matches Store.shardId exactly
    assert(a.filter(col("shard") =!= Store.shardId(col("doc_id"), 8)).count() == 0)
  }

  test("packByWeight parallelism scales past 256 shards with stable pack ids") {
    // the old Store.shardId cap made 256 the packing parallelism ceiling;
    // the two-level (4-hex-char) band lifts it to 65536 — same pure
    // function of the key, so pack ids are stable across re-runs
    val docs = (1 to 4000).map(i => (i.toLong, "w " * 9 + "w")).toDF("doc_id", "text")
    val a = Export.packAssignments(docs, "doc_id", "text", nShards = 1024, budget = 64)
    val assigned = a.select("doc_id", "shard", "pack")
      .as[(Long, Long, Long)].collect()
    val nShardsSeen = assigned.map(_._2).distinct.length
    assert(nShardsSeen > 256, s"only $nShardsSeen effective shards — ceiling not lifted")
    assert(assigned.forall { case (_, sh, _) => sh >= 0 && sh < 1024 })
    // shard = first FOUR md5 hex chars % nShards for nShards > 256
    assigned.foreach { case (id, sh, _) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes).take(2).map("%02x".format(_)).mkString
      assert(sh == Integer.parseInt(hex, 16) % 1024, s"doc $id shard mismatch")
    }
    // byte-identical re-run (pack assignment is a pure function of the keys)
    val again = Export.packAssignments(docs, "doc_id", "text", nShards = 1024, budget = 64)
      .select("doc_id", "shard", "pack").as[(Long, Long, Long)].collect()
    assert(again.toSet == assigned.toSet)
    // the <= 256 layout is untouched: two-hex-char band as before
    assert(docs.filter(Store.shardId(col("doc_id"), 8) =!=
      Store.shardId(col("doc_id"), 256) % 8).count() == 0)
  }

  test("packAssignments rejects non-power-of-two budgets") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Export.packAssignments(docs, "doc_id", "text", nShards = 1, budget = 1000)
    }
  }

  test("writeShards shuffleOrder lays rows out in md5 order inside each file") {
    val dir = java.nio.file.Files.createTempDirectory("shuf").toFile.getAbsolutePath + "/t"
    val docs = (1 to 500).map(i => (i.toLong, s"d$i")).toDF("doc_id", "text")
    Store.writeShards(docs, dir, "doc_id", nShards = 4, shuffleOrder = true)
    val shard0 = new java.io.File(dir).listFiles().filter(_.getName.startsWith("shard="))
      .head.listFiles().filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    // a single parquet file reads back as one ordered partition
    val ids = spark.read.parquet(shard0).select("doc_id").as[Long].collect().toSeq
    assert(ids.length > 10)
    val md5Order = ids.sortBy(i => java.security.MessageDigest.getInstance("MD5")
      .digest(i.toString.getBytes).map("%02x".format(_)).mkString)
    assert(ids == md5Order, "rows not in md5 pseudo-shuffle order")
    assert(ids != ids.sorted, "md5 order degenerated to key order")
  }

  test("writeJsonlShards: parseable lines, stable layout, byte-identical re-runs") {
    val base = java.nio.file.Files.createTempDirectory("jsonl").toFile.getAbsolutePath
    val docs = (1 to 300).map(i => (i.toLong, s"text $i", s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    def md5Of(dir: String): Map[String, String] = {
      def files(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(files)
        else if (f.getName.endsWith(".txt")) Seq(f) else Nil
      files(new java.io.File(dir)).map { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        f.getParentFile.getName -> java.security.MessageDigest.getInstance("MD5")
          .digest(bytes).map("%02x".format(_)).mkString
      }.toMap  // keyed by shard dir: file names carry job UUIDs, content doesn't
    }
    Store.writeJsonlShards(docs, s"$base/a", "doc_id", nShards = 4, shuffleOrder = true)
    Store.writeJsonlShards(docs, s"$base/b", "doc_id", nShards = 4, shuffleOrder = true)
    assert(md5Of(s"$base/a") == md5Of(s"$base/b"), "re-export not byte-identical")
    // every row survives as one parseable JSON line with all fields
    val back = spark.read.schema("doc_id LONG, text STRING, source STRING")
      .json(spark.read.text(s"$base/a/shard=*").as[String])
    assert(back.count() == 300)
    assert(back.filter(col("doc_id").isNull || col("text").isNull).count() == 0)
    // shard assignment matches the parquet exporter's (same shardId)
    val ids0 = spark.read.text(s"$base/a/shard=0").as[String]
      .collect().map(s => ujsonField(s, "doc_id")).toSet
    val expected = docs.withColumn("s", Store.shardId(col("doc_id"), 4))
      .filter(col("s") === 0).select("doc_id").as[Long].collect().map(_.toString).toSet
    assert(ids0 == expected)
  }

  /** Tiny field extractor so the test doesn't depend on a JSON library:
    * pulls the numeric value of `"name":<digits>`. */
  private def ujsonField(line: String, name: String): String = {
    val m = ("\"" + name + "\":(\\d+)").r.findFirstMatchIn(line)
    m.map(_.group(1)).getOrElse(sys.error(s"no $name in $line"))
  }

  test("batchForInference bounds micro-batches by payload bytes, not rows") {
    val media = (1 to 60).map { i =>
      (i.toLong, "image", Array.fill[Byte](if (i % 3 == 0) 300 else 100)(i.toByte))
    }.toDF("media_id", "kind", "bytes")
    val b = graft.operators.Multimodal.batchForInference(media, byteBudget = 1024, nShards = 2)
    // every batch STARTS under the budget boundary: within a shard the
    // start offset of batch k is < (k+1)*budget by construction
    val perBatch = b.groupBy("shard", "batch")
      .agg(sum(col("n_bytes")).as("bytes"), count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long)].collect()
    assert(perBatch.nonEmpty)
    // no batch except a single-oversized-row one exceeds budget + max row
    assert(perBatch.forall { case (_, _, bytes, n) => bytes <= 1024 + 300 || n == 1 })
    // batches are dense per shard and deterministic across runs
    val again = graft.operators.Multimodal.batchForInference(media, 1024, 2)
      .select("media_id", "batch").as[(Long, Long)].collect().toMap
    val first = b.select("media_id", "batch").as[(Long, Long)].collect().toMap
    assert(again == first)
  }

  test("hashSplit: total partition, ~proportional, stable under corpus growth, validated rates") {
    import graft.operators.Export
    val small = (0L until 1000L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val splits = Seq("train" -> 0.8, "eval" -> 0.1, "test" -> 0.1)
    val lab = Export.hashSplit(small, "doc_id", splits)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    // total partition: every row labeled, only declared labels
    assert(lab.size == 1000 && lab.values.toSet.subsetOf(Set("train", "eval", "test")))
    // ~proportional (hash-uniform over 1000 ids: generous 25% relative slack)
    val counts = lab.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 800) <= 60, s"train share off: $counts")
    assert(math.abs(counts.getOrElse("eval", 0) - 100) <= 40, s"eval share off: $counts")
    // STABILITY: the same ids keep their split when the corpus grows 5x
    // (assignment is a pure function of the id — the property random /
    // row_number splits lack)
    val grown = (0L until 5000L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val lab5 = Export.hashSplit(grown, "doc_id", splits)
      .filter($"doc_id" < 1000).select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(lab5 == lab, "corpus growth must not reassign existing docs")
    // single-split degenerate: everything gets the one label
    assert(Export.hashSplit(small, "doc_id", Seq("all" -> 1.0))
      .select($"split").distinct().as[String].collect().toSeq == Seq("all"))
    // invalid rates fail loudly
    intercept[IllegalArgumentException] {
      Export.hashSplit(small, "doc_id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Export.hashSplit(small, "doc_id", Seq("a" -> 1.5, "b" -> -0.5))
    }
  }

  test("mixtureRepeat upsamples by epochs, downsamples fractions, is deterministic") {
    val docs = (1 to 200).map(i => (i.toLong, if (i <= 100) "A" else "B"))
      .toDF("doc_id", "source")
    val r = Export.mixtureRepeat(docs, "doc_id", "source",
        Map("A" -> 2.5, "B" -> 0.25))
      .select("doc_id", "source", "copy")
    val perDoc = r.groupBy("doc_id", "source").count()
      .as[(Long, String, Long)].collect()
    val aCounts = perDoc.filter(_._2 == "A").map(_._3)
    val bDocs = perDoc.filter(_._2 == "B")
    assert(aCounts.forall(c => c == 2 || c == 3), "A docs must appear 2 or 3 times")
    assert(aCounts.count(_ == 3) > 10 && aCounts.count(_ == 3) < 90,
      s"~half of A should get the 3rd copy, got ${aCounts.count(_ == 3)}")
    assert(bDocs.forall(_._3 == 1) && bDocs.length > 5 && bDocs.length < 60,
      s"~quarter of B kept once, got ${bDocs.length}")
    // stable across runs: identical exploded rows
    val again = Export.mixtureRepeat(docs, "doc_id", "source",
        Map("A" -> 2.5, "B" -> 0.25)).select("doc_id", "source", "copy")
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(again == r.as[(Long, String, Long)].collect().sorted.toSeq)
  }

  test("mixtureSample downsamples over-represented groups deterministically") {
    val docs = ((1 to 100).map(i => (i.toLong, "A")) ++
      (101 to 200).map(i => (i.toLong, "B")) ++
      (201 to 220).map(i => (i.toLong, "C"))).toDF("doc_id", "grp")
    val out = Export.mixtureSample(docs, "doc_id", "grp",
      Map("A" -> 0.25, "B" -> 0.5))
    // C is outside the target mix: dropped by the rate join
    assert(out.filter(col("grp") === "C").count() == 0)
    // B's rate caps at 1.0 -> everything kept
    val b = out.filter(col("grp") === "B")
    assert(b.count() == 100 && b.filter(!col("keep")).count() == 0)
    // A's rate = 0.25 * 220 / 100 = 0.55; kept = docs whose md5 band < 140.8
    val aKept = out.filter(col("grp") === "A" && col("keep"))
      .select("doc_id").as[Long].collect().toSet
    val wantKept = (1 to 100).map(_.toLong).filter { i =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes).take(1).map("%02x".format(_)).mkString
      Integer.parseInt(hex, 16) < 0.55 * 256.0
    }.toSet
    assert(aKept == wantKept)
    // stable across runs
    val again = Export.mixtureSample(docs, "doc_id", "grp",
        Map("A" -> 0.25, "B" -> 0.5))
      .filter(col("grp") === "A" && col("keep")).select("doc_id").as[Long].collect().toSet
    assert(again == aKept)
  }

  test("renderChatTemplate: loss mask is token-aligned with the rendering") {
    val rows = Seq(
      (1L, "what is spark", "a distributed engine"),
      (2L, "hi", "hello there")).toDF("doc_id", "prompt", "response")
    val got = Export.renderChatTemplate(rows, "prompt", "response")
      .select("doc_id", "rendered", "n_prefix_tokens", "n_total_tokens")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    val (_, rendered, nPrefix, nTotal) = got(1L)
    assert(rendered ==
      "<|user|> what is spark <|assistant|> a distributed engine <|end|>")
    val toks = rendered.split(" ")
    assert(nTotal == toks.length)
    // the masked prefix ends exactly at the assistant marker; loss tokens
    // are the response plus the end marker
    assert(toks(nPrefix.toInt - 1) == "<|assistant|>")
    assert(toks.slice(nPrefix.toInt, nTotal.toInt).toSeq ==
      Seq("a", "distributed", "engine", "<|end|>"))
    assert(got(2L)._3 == 3L && got(2L)._4 == 6L)
  }

  test("mixtureTemperatureShares: sqrt damping, shares sum to ~1, order preserved") {
    // 400 vs 100 vs 25 docs: sqrt weights 20:10:5 exactly (perfect squares,
    // so the quantized weights are exact integers) -> shares 4/7, 2/7, 1/7
    val rows = (1 to 400).map(i => (i.toLong, "big")) ++
      (1 to 100).map(i => (i.toLong + 1000, "mid")) ++
      (1 to 25).map(i => (i.toLong + 2000, "small"))
    val got = Export.mixtureTemperatureShares(rows.toDF("doc_id", "src"), "src")
      .select("src", "group_n", "share").as[(String, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("big") == (("big", 400L, 20e6 / 35e6)))
    assert(got("mid") == (("mid", 100L, 10e6 / 35e6)))
    assert(got("small") == (("small", 25L, 5e6 / 35e6)))
    val sum = got.values.map(_._3).sum
    assert(math.abs(sum - 1.0) < 1e-12)
    // the whole point: 16x the docs gets only 4x the share
    assert(math.abs(got("big")._3 / got("small")._3 - 4.0) < 1e-12)
  }

  test("curriculumBuckets: deterministic rank-cut quartiles, front buckets take the remainder") {
    // 10 docs, scores 10..1 keyed oppositely: rank order is by (score, key)
    val rows = (1 to 10).map(i => (i.toLong, "s", (11 - i).toLong))
    val got = Export.curriculumBuckets(rows.toDF("doc_id", "src", "score"),
        "doc_id", "src", col("score"), nBuckets = 4)
      .select("doc_id", "bucket").as[(Long, Int)].collect().toMap
    // ascending score => doc 10 (score 1) ranks first; sizes 3,3,2,2
    assert(got(10L) == 1 && got(9L) == 1 && got(8L) == 1)
    assert(got(7L) == 2 && got(6L) == 2 && got(5L) == 2)
    assert(got(4L) == 3 && got(3L) == 3)
    assert(got(2L) == 4 && got(1L) == 4)
  }
}
