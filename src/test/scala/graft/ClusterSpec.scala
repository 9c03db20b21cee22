package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels chains and disjoint pairs") {
    // components: {1,2,3} (chain), {7,9}, singleton edges never appear
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs)
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (9L, 7L)))
  }

  test("connectedComponents converges on a 50-deep dup chain in O(log n) rounds") {
    // A 51-node chain 0-1-2-...-50: plain min-label propagation needs 50
    // rounds (and the old default maxIter=20 would silently mislabel);
    // pointer doubling converges well inside maxIter, and per-round
    // localCheckpoint keeps lineage one round deep.
    val pairs = (0L until 50L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(pairs, maxIter = 12)
    val comps = labels.select("component").distinct().as[Long].collect()
    assert(comps.toSeq == Seq(0L))
    assert(labels.count() == 51)
    // lineage stays shallow: the returned frame is a checkpoint scan (an
    // RDD leaf), not a 50-join tower — structural assertion, not plan-text
    // rendering, so a Spark upgrade can't break it cosmetically
    val plan = labels.queryExecution.optimizedPlan
    assert(plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }.isEmpty,
      s"checkpointed labels still carry joins:\n$plan")
    assert(plan.collectLeaves().forall(_.getClass.getSimpleName == "LogicalRDD"),
      s"expected checkpoint-scan leaves:\n$plan")
  }

  test("dropNearDups keeps one canonical doc per duplicate cluster") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (4L, "completely different content about spark query engines and shuffles"),
      (5L, "another unrelated text regarding parquet pruning and predicate pushdown")
    ).toDF("doc_id", "text")
    val kept = Dedup.dropNearDups(docs, "doc_id", "text", k = 5,
        numHashes = 8, bandSize = 2, threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted
    // 1,2,3 form one near-dup cluster -> keep 1; 4 and 5 survive
    assert(kept.toSeq == Seq(1L, 4L, 5L))
  }

  test("keepBestPerCluster keeps the highest-quality member, not the least id") {
    val docs = Seq(
      (1L, "dup", 0.2), (2L, "dup", 0.9), (3L, "dup", 0.9), // cluster: best=2 (tie 2/3 -> lower id)
      (7L, "dup2", 0.1), (9L, "dup2", 0.8),                 // cluster: best=9
      (5L, "solo", 0.0)                                     // unclustered passthrough
    ).toDF("doc_id", "text", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val kept = Dedup.keepBestPerCluster(docs, pairs, "doc_id", col("quality"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 5L, 9L))
  }

  test("ivfTopK finds the planted nearest neighbor within probed cells") {
    // 40 vectors in 2 obvious clusters around (1,0) and (0,1); query is a
    // member of the first cluster.
    val vecs = (0 until 40).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0.0f) else Array(0.0f, 1.0f)
      (i.toLong, Array(base(0) + i * 0.001f, base(1) + i * 0.0005f))
    }.toDF("vec_id", "embedding")
    val got = Similarity.ivfTopK(vecs, vecs.filter(col("vec_id") === 0), "vec_id",
        "embedding", nCells = 4, nProbe = 2, k = 5)
      .orderBy("rank").select("cid", "dist").as[(Long, Double)].collect()
    assert(got.length == 5)
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.toSeq)  // ascending dist
    assert(got.head._1 % 2 == 0)  // nearest neighbor is from the same cluster
  }

  test("pageRank: hub of a star outranks leaves; mass is conserved; deterministic") {
    // star 1-{2,3,4} plus a disjoint pair {8,9}
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (8L, 9L)).toDF("doc_a", "doc_b")
    val pr = Dedup.pageRank(pairs).orderBy("doc_id").as[(Long, Double)].collect()
    val byId = pr.toMap
    assert(byId.keySet == Set(1L, 2L, 3L, 4L, 8L, 9L))
    assert(Seq(2L, 3L, 4L).forall(l => byId(1L) > byId(l)),
      s"star hub must outrank its leaves: ${byId.toSeq.sorted}")
    // leaves are symmetric: identical ranks
    assert(byId(2L) == byId(3L) && byId(3L) == byId(4L))
    assert(byId(8L) == byId(9L))
    // symmetric graph has no dangling mass: ranks stay a distribution
    // (up to 1e12 quantization slack per round)
    val total = pr.map(_._2).sum
    assert(math.abs(total - 1.0) < 1e-6, s"rank mass drifted: $total")
    val again = Dedup.pageRank(pairs).orderBy("doc_id").as[(Long, Double)].collect()
    assert(pr.toSeq == again.toSeq)
  }
}
