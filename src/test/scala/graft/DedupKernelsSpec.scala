package graft

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native one-pass dedup kernels (SimHash60, MinHashSig) vs their
  * composed explode+groupBy twins: identical output on varied docs,
  * identical absence semantics for degenerate docs, and identical
  * end-to-end near-dup pairs through the LSH pipeline.
  */
class DedupKernelsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-dedupkernels-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "pack my box with five dozen liquor jugs"),
      (4L, "pack my box with five dozen liquor jugs"),
      (5L, "the the the repeated repeated tokens tokens tokens here"),
      (6L, "one two"), // fewer than k=3 tokens: no shingles
      (7L, "   "), // whitespace only: no tokens at all
      (8L, "unicode é漢字 tokens mixed in the stream É again é漢字"),
      (9L, "a b c d e f g h i j k l m n o p q r s t u v w x y z")
    ).toDF("doc_id", "text")
  }

  test("native SimHash fingerprints equal the composed form") {
    val native = Dedup.simhashFingerprints(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val composed = Dedup.simhashFingerprintsComposed(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === composed)
    assert(!native.contains(7L)) // token-less doc absent from both
    assert(native.contains(6L)) // two tokens still fingerprint
  }

  test("native MinHash signatures equal the composed form") {
    val shingles = Dedup.shingleSets(docs, "doc_id", "text", k = 3)
    val composed = Dedup.minhashSignatures(shingles, numPerm = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val native = Dedup.minhashSignaturesNative(docs, "doc_id", "text", k = 3, numPerm = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native === composed)
    assert(!native.contains(6L) && !native.contains(7L)) // < k tokens: absent
    assert(native(3L) === native(4L)) // identical docs, identical sigs
  }

  test("native Jaccard pipeline equals the composed form when the cap binds nothing") {
    val composed = Dedup.jaccardPairs(
      Dedup.shingleSets(docs, "doc_id", "text", k = 3), num = 1, den = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val native = Dedup.jaccardPairsNative(
      docs, "doc_id", "text", k = 3, num = 1, den = 2, maxShingleFreq = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(native === composed)
    assert(native.exists { case (a, b, _, _) => (a, b) == (3L, 4L) })
  }

  test("the df-cap drops stop-shingles from pairs and set sizes") {
    val s = spark
    import s.implicits._
    // "x y z" appears in all 4 docs (df=4 > cap=3) and must be dropped;
    // docs 1/2 still pair through their private "p q r" shingles.
    val d = Seq(
      (1L, "x y z p q r s"),
      (2L, "x y z p q r s"),
      (3L, "x y z only here"),
      (4L, "x y z other text")
    ).toDF("doc_id", "text")
    val capped = Dedup.jaccardPairsNative(
      d, "doc_id", "text", k = 3, num = 1, den = 2, maxShingleFreq = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc1/doc2 share shingles {x y z, y z p, z p q, p q r, q r s};
    // "x y z" is hot → inter=4, sizes=4 → union=4, jaccard=1 > 0.5.
    assert(capped.toSeq === Seq((1L, 2L, 4L, 4L)))
    // the composed uncapped form additionally pairs nothing else here,
    // but counts the hot shingle: inter=5, union=5.
    val uncapped = Dedup.jaccardPairs(
      Dedup.shingleSets(d, "doc_id", "text", k = 3), num = 1, den = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(uncapped.toSeq === Seq((1L, 2L, 5L, 5L)))
  }

  test("blocked cosine pairs equal the all-pairs non-equi form") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val allPairs = pairs(graft.ops.Similarity.cosinePairs(emb, "vec_id", "embedding", 0.45))
    val blocked = pairs(graft.ops.Similarity.cosinePairsBlocked(emb, "vec_id", "embedding", 0.45, numBlocks = 4))
    assert(blocked === allPairs)
    // and the blocked plan must be free of non-equi joins
    val plan = graft.ops.Similarity.cosinePairsBlocked(emb, "vec_id", "embedding", 0.45)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"))
  }

  test("native LSH pipeline emits the same near-dup pairs") {
    val composed = Dedup.minhashLshPairs(
      Dedup.shingleSets(docs, "doc_id", "text", k = 3),
      numPerm = 16, bands = 4, num = 1, den = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val native = Dedup.minhashLshPairsNative(
      docs, "doc_id", "text", k = 3, numPerm = 16, bands = 4, num = 1, den = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native === composed)
    assert(native.contains((3L, 4L))) // exact dup pair must survive
  }

  test("delta dedup equals the full self-join restricted to cross pairs") {
    // The incremental contract: checking a new batch against the
    // standing corpus finds exactly the full pipeline's pairs that
    // span the two sides — nothing extra, nothing dropped (same band
    // scheme, same verify threshold). Delta = even ids.
    val delta = docs.filter(col("doc_id") % 2 === 0)
    val standing = docs.filter(col("doc_id") % 2 === 1)
    val incremental = Dedup.minhashLshDeltaPairsNative(
      standing, delta, "doc_id", "text", k = 3, numPerm = 64, bands = 16, num = 1, den = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val full = Dedup.minhashLshPairsNative(
      docs, "doc_id", "text", k = 3, numPerm = 64, bands = 16, num = 1, den = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val cross = full.collect {
      case (a, b, i, u) if a % 2 != b % 2 =>
        if (a % 2 == 0) (a, b, i, u) else (b, a, i, u)
    }.toSet
    assert(incremental === cross)
    assert(incremental.exists { case (d, c, _, _) => (d, c) == (4L, 3L) }) // exact dup spans the sides
  }

  test("delta dedup is safe when an id appears on both sides (re-ingest)") {
    val s = spark
    import s.implicits._
    // Doc 4 is re-ingested: the standing side holds a stale copy, the
    // delta the current one. The delta copy must be authoritative and
    // its (id, shingle) rows must not double-count in inter/union —
    // verdicts must match running the delta against a standing corpus
    // that never contained id 4.
    val staleFour = Seq((4L, "totally different stale content for doc four"))
      .toDF("doc_id", "text")
    val standingWithStale = docs.filter(col("doc_id") =!= 2 && col("doc_id") =!= 4)
      .unionByName(staleFour)
    val delta = docs.filter(col("doc_id") === 2 || col("doc_id") === 4)
    def run(standing: org.apache.spark.sql.DataFrame) =
      Dedup.minhashLshDeltaPairsNative(
        standing, delta, "doc_id", "text", k = 3, numPerm = 64, bands = 16, num = 1, den = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val withOverlap = run(standingWithStale)
    val clean = run(docs.filter(col("doc_id") % 2 === 1))
    assert(withOverlap === clean)
    assert(withOverlap.exists { case (d, c, _, _) => (d, c) == (4L, 3L) })
    withOverlap.find { case (d, c, _, _) => (d, c) == (4L, 3L) }.foreach {
      case (_, _, inter, union) => assert(inter === union) // exact dup, undoubled
    }
  }
}
