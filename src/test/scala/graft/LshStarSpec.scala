package graft

import graft.ops.{Components, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hot-bucket discipline for the text MinHash band join (round 15):
  * anchored star edges per (band, key) bucket are O(M) where the
  * all-pairs self-join is M²/2, and connected components over the star
  * graph equal components over the all-pairs bucket graph (every
  * member connects to its bucket's anchor, so any all-pairs edge u−v
  * is covered by u−anchor−v). The df-cap variant of the verified-pairs
  * path prunes hot buckets entirely (the q183 contract), and at cap 0
  * is byte-identical to the uncapped operator (the q32 contract).
  */
class LshStarSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-lsh-star-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  private val boiler =
    "subscribe to our newsletter terms of service privacy policy all rights reserved"

  /** documents ∪ 32 constant-boilerplate docs (one genuinely hot bucket). */
  private def augDocs = {
    val docs = Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"))
    docs.unionByName(docs.filter(col("doc_id") < 32).select(
      (col("doc_id") + lit(1000000L)).as("doc_id"), lit(boiler).as("text")))
  }

  test("star components equal all-pairs components on the hot-bucket corpus") {
    val docs = augDocs.localCheckpoint()
    val keys = Dedup.minhashBandKeys(docs, "doc_id", "text", k = 3, numPerm = 64, bands = 16)
      .localCheckpoint()
    val ids = docs.select(col("doc_id").as("id"))
    val star = Components.dedupClusters(ids, Dedup.lshStarEdges(keys))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val allPairs = keys.as("x").join(keys.as("y"), Seq("band", "key"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    val full = Components.dedupClusters(ids, allPairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(star === full)
    // the hot bucket actually clustered: every boilerplate doc shares
    // the min boilerplate id's component
    val hotLabels = star.filter(_._1 >= 1000000L).values.toSet
    assert(hotLabels === Set(1000000L))
  }

  test("star edges are linear in the hot bucket where all-pairs is quadratic") {
    val m = 32L
    val keys = Dedup.minhashBandKeys(
      augDocs.filter(col("doc_id") >= 1000000L), "doc_id", "text",
      k = 3, numPerm = 64, bands = 16)
    val starCount = Dedup.lshStarEdges(keys).count()
    assert(starCount === m - 1) // identical docs: every band yields the same edge set
    val pairCount = keys.as("x").join(keys.as("y"), Seq("band", "key"))
      .filter(col("x.id") < col("y.id"))
      .select("x.id", "y.id").distinct().count()
    assert(pairCount === m * (m - 1) / 2)
  }

  test("maxBandFreq prunes every boilerplate pair and nothing else survives pruning wrongly") {
    val docs = augDocs.localCheckpoint()
    def pairs(cap: Int): Set[(Long, Long)] =
      Dedup.minhashLshPairsNative(docs, "doc_id", "text",
          k = 3, numPerm = 64, bands = 16, num = 1, den = 2, maxBandFreq = cap)
        .select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(0)
    val capped = pairs(8)
    // the 32-doc bucket (df 32 > 8) prunes: no boilerplate pair remains
    assert(capped.forall { case (a, b) => a < 1000000L && b < 1000000L })
    assert(uncapped.exists { case (a, b) => a >= 1000000L && b >= 1000000L })
    // pruning only removes pairs, never invents them
    assert(capped.subsetOf(uncapped))
    assert(capped.nonEmpty, "organic pairs should survive the cap at this SF")
  }

  test("cap 0 is byte-identical to the uncapped operator (q32 contract)") {
    val docs = Tables.load(spark, dir, "documents")
    val a = Dedup.minhashLshPairsNative(docs, "doc_id", "text",
        k = 3, numPerm = 64, bands = 16, num = 1, den = 2)
      .collect().map(_.toString).sorted
    val b = Dedup.minhashLshPairsNative(docs, "doc_id", "text",
        k = 3, numPerm = 64, bands = 16, num = 1, den = 2, maxBandFreq = 0)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("delta candidates honor the standing-index df cap") {
    val docs = augDocs.localCheckpoint()
    val standing = docs.filter(col("doc_id") % 3 =!= 0)
    val delta = docs.filter(col("doc_id") % 3 === 0)
    val index = Dedup.minhashBandKeys(standing, "doc_id", "text",
      k = 3, numPerm = 64, bands = 16).localCheckpoint()
    val uncapped = Dedup.lshDeltaCandidates(index, delta, "doc_id", "text",
        k = 3, numPerm = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.lshDeltaCandidates(index, delta, "doc_id", "text",
        k = 3, numPerm = 64, bands = 16, maxBandFreq = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(uncapped))
    // the boilerplate bucket (standing df ≈ 21 > 8) never reaches the
    // candidate join under the cap
    assert(uncapped.exists { case (d, c) => d >= 1000000L && c >= 1000000L })
    assert(capped.forall { case (d, c) => d < 1000000L && c < 1000000L })
    assert(capped.nonEmpty)
  }
}
