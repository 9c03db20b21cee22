package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact (hash
  * groupBy), n-gram Jaccard similarity join, MinHash+LSH near-dup
  * detection, SimHash banding. Generalizes the reference's fuzzy
  * title-resolution join (`etl/seed/seed_from_marvel.py:126-138`, SURVEY.md
  * §2.3 J7) to corpus scale.
  *
  * Scale design:
  *  - Shingling + MinHash signatures are NARROW per-row expressions
  *    (array ops, no explode/shuffle) — at 100 TB this is a single
  *    map-only pass over the corpus.
  *  - LSH banding shuffles only (doc_id, band_key) rows — numBands rows
  *    per document, not one row per shingle.
  *  - Candidate verification joins shingle SETS back onto the candidate
  *    pairs only, so the quadratic all-pairs Jaccard join is never
  *    materialized. The exact all-pairs variant below exists as the
  *    small-data oracle baseline; LSH is the scale path.
  *  - All hashes are md5-derived -> deterministic across runs/engines; no
  *    seed state to distribute.
  */
object Dedup {

  /** Distinct char-k-gram shingle set, as a narrow array expression. */
  def charShingles(text: Column, k: Int): Column =
    when(length(text) >= k,
      array_distinct(transform(
        sequence(lit(1), length(text) - lit(k - 1)),
        i => text.substr(i, lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** One MinHash value: min over shingles of md5("<seed>:" + shingle).
    * Lexicographic min over hex strings is a uniform permutation proxy. */
  def minhash(shingles: Column, seed: Int): Column =
    array_min(transform(shingles, g => md5(concat(lit(s"$seed:"), g))))

  /** (doc_id, shingle-set) projection. */
  def shingled(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), charShingles(col(textCol), k).as("sh"))

  /** Exact all-pairs n-gram Jaccard similarity join (the O(n·m) baseline:
    * explode shingles, equi-join on shingle, count per pair). Correct at
    * any scale but shuffle-heavy — use lshNearDups for large corpora.
    * Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String, k: Int,
                   threshold: Double): DataFrame = {
    val sh = shingled(docs, idCol, textCol, k)
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("g"))
    val sizes = sh.select(col("doc_id"), size(col("sh")).as("n"))
    val common = ex.as("a").join(ex.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.toDF("doc_a", "na"), "doc_a")
      .join(sizes.toDF("doc_b", "nb"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("common") / (col("na") + col("nb") - col("common"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash-LSH candidate pairs: numHashes signatures computed narrow,
    * grouped into bands of `bandSize`; docs sharing any band key are
    * candidates. Shuffles numBands rows per doc.
    */
  def lshCandidates(sh: DataFrame, numHashes: Int, bandSize: Int): DataFrame = {
    require(numHashes % bandSize == 0, "numHashes must be divisible by bandSize")
    val sigs = (0 until numHashes).map(s => minhash(col("sh"), s).as(s"sig_$s"))
    val withSig = sh.select((col("doc_id") +: sigs): _*)
    val nBands = numHashes / bandSize
    val bandKeys = (0 until nBands).map { b =>
      concat_ws(":", (lit(b.toString) +: (0 until bandSize).map(j => col(s"sig_${b * bandSize + j}"))): _*)
    }
    val bands = withSig.select(col("doc_id"), explode(array(bandKeys: _*)).as("band"))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: candidates, then exact Jaccard
    * verification restricted to candidate pairs (shingle sets join back by
    * doc id — two broadcast-or-shuffle hash joins over the candidate set,
    * never all-pairs).
    */
  def lshNearDups(docs: DataFrame, idCol: String, textCol: String, k: Int,
                  numHashes: Int, bandSize: Int, threshold: Double): DataFrame = {
    val sh = shingled(docs, idCol, textCol, k)
    val cands = lshCandidates(sh, numHashes, bandSize)
    cands
      .join(sh.toDF("doc_a", "sh_a"), "doc_a")
      .join(sh.toDF("doc_b", "sh_b"), "doc_b")
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .select(col("doc_a"), col("doc_b"),
        (col("common") / (size(col("sh_a")) + size(col("sh_b")) - col("common"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs with banded join: split the 64-bit signature
    * into 4 16-bit bands; by pigeonhole any pair within hamming distance
    * <= 3 shares at least one exact band, so the join fans out 4 rows/doc
    * instead of all-pairs, then verifies true hamming distance.
    */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-band banding only guarantees recall for hamming <= 3")
    val sig = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.simhash64(col(textCol)).as("sig"))
    val bands = sig.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map { i =>
        concat_ws(":", lit(i.toString), shiftright(col("sig"), i * 16).bitwiseAND(lit(65535L)))
      }: _*)).as("band"))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        TextAnalysis.hamming(col("a.sig"), col("b.sig")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact duplicate groups by content hash: one shuffle on the 16-byte
    * fingerprint (never on the full text). */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("first_doc"))
      .filter(col("n_copies") > 1)
}
