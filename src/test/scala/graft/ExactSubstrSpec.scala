package graft

import graft.ops.{Components, Curation, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q95/q96 operators: exact-substring repetition (native window-hash
  * kernel vs the interpreted Catalyst twin) and the cluster-aware
  * leakage-free split (no near-dup pair may straddle train/test).
  */
class ExactSubstrSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-exact-substr-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  test("native rolling window hashes equal the interpreted per-window fold twin") {
    graft.functions.TextHashes.ensureRegistered(spark)
    val docs = Tables.load(spark, dir, "documents").limit(50)
    // The non-rolling form: each window folded from scratch — the
    // definition the rolling kernel must match, and the same fold the
    // DuckDB oracle runs.
    val interpreted = expr(
      """CASE WHEN length(text) < 40 THEN cast(array() as array<bigint>)
         ELSE transform(sequence(1, length(text) - 39),
           i -> aggregate(sequence(i, i + 39), cast(0 as bigint),
                  (acc, j) -> (acc * 31 + ascii(substring(text, j, 1))) % 1000000007)
                * 4294967296 +
                aggregate(sequence(i, i + 39), cast(0 as bigint),
                  (acc, j) -> (acc * 131 + ascii(substring(text, j, 1))) % 998244353))
         END""")
    val diff = docs.select(
        col("doc_id"),
        call_function("graft_window_hashes", col("text"), lit(40)).as("nat"),
        interpreted.as("itp"))
      .filter(not(col("nat") <=> col("itp")))
      .count()
    assert(diff === 0L)
  }

  test("repeated-window accounting on a constructed corpus") {
    import spark.implicits._
    val span = "A" * 25 + "shared span that is long" // 49 chars
    val docs = Seq(
      (1L, span + "X" + "u" * 31), // diverges from doc 2 at char 50
      (2L, span + "Y" + "v" * 31),
      (3L, "totally unrelated short doc"), // < 40 chars: zero windows
      (4L, "B" * 80) // self-repeating: every window identical
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstrRepeats(docs, "doc_id", "text", width = 40)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // Docs 1/2 share the 49-char prefix: its 10 windows repeat in both.
    assert(out(1L)._1 === 42L) // 81 chars → 42 windows
    assert(out(1L)._2 === 10L)
    assert(out(2L)._2 === 10L)
    assert(out(3L) === ((0L, 0L, 0L)))
    // Doc 4: 41 identical windows, all repeated (within-doc repeats count).
    assert(out(4L) === ((41L, 41L, 1000L)))
  }

  test("repeated-span trim merges stride-1 windows into maximal spans") {
    import spark.implicits._
    // Docs 1/2 share two separate 45-char blocks with 30 unique chars
    // between them: each block is ONE span of exactly 45 chars, so
    // removed_chars = 90, n_spans = 2.
    val blockA = "A" * 20 + "first shared block xyzzy_" // 45 chars
    val blockB = "B" * 21 + "second shared block qrst" // 45 chars
    def mid(tag: String) = tag * 6 // 30 unique chars
    val docs = Seq(
      (1L, blockA + mid("caeij") + blockB),
      (2L, blockA + mid("dbfkm") + blockB),
      (3L, "short unrelated") // no windows
    ).toDF("doc_id", "text")
    val out = Dedup.repeatedSpanTrim(docs, "doc_id", "text", width = 40)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) === ((120L, 2L, 90L, 30L)))
    assert(out(2L) === ((120L, 2L, 90L, 30L)))
    assert(out(3L) === ((15L, 0L, 0L, 15L)))
  }

  test("above-cap regime: the shuffle semi-join path returns identical results") {
    // broadcastRepCap=0 forces the non-broadcast membership join — the
    // boilerplate-heavy-corpus regime the default never exercises.
    val docs = Tables.load(spark, dir, "documents")
    val a = Dedup.exactSubstrRepeats(docs, "doc_id", "text", width = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val b = Dedup.exactSubstrRepeats(docs, "doc_id", "text", width = 40, broadcastRepCap = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(a === b)
  }

  test("delta exact-substr equals the full pass restricted to delta docs") {
    val docs = Tables.load(spark, dir, "documents")
    val standing = docs.filter(col("doc_id") % 7 =!= 0)
    val delta = docs.filter(col("doc_id") % 7 === 0)
    val full = Dedup.exactSubstrRepeats(docs, "doc_id", "text", width = 40)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val inc = Dedup.exactSubstrDeltaRepeats(standing, delta, "doc_id", "text", width = 40)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
    assert(inc.nonEmpty)
    inc.foreach { case (id, v) => assert(v === full(id), s"divergence at doc $id") }
    assert(inc.exists(_._2._2 > 0L), "delta batch found no repeats — vacuous at this SF")
  }

  test("delta WINNOWED exact-substr equals the full strided pass restricted to delta docs") {
    val docs = Tables.load(spark, dir, "documents")
    val standing = docs.filter(col("doc_id") % 7 =!= 0)
    val delta = docs.filter(col("doc_id") % 7 === 0)
    val full = Dedup.exactSubstrRepeatsStrided(docs, "doc_id", "text",
        width = 40, stride = 20)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val inc = Dedup.exactSubstrDeltaRepeatsStrided(standing, delta, "doc_id", "text",
        width = 40, stride = 20)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
    assert(inc.nonEmpty)
    inc.foreach { case (id, v) => assert(v === full(id), s"divergence at doc $id") }
    assert(inc.exists(_._2._2 > 0L), "delta batch found no repeats — vacuous at this SF")
    // the shuffle-fallback regime (caps = 0) must agree too
    val shuffled = Dedup.exactSubstrDeltaRepeatsStrided(standing, delta, "doc_id", "text",
        width = 40, stride = 20, broadcastDeltaCap = 0L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    inc.foreach { case (id, v) => assert(v === shuffled(id), s"regime divergence at doc $id") }
  }

  test("delta winnowed: misaligned planted copies at the guarantee length are detected") {
    import spark.implicits._
    // A repeat of width + stride − 1 = 59 chars planted at DIFFERENT
    // offsets in a standing and a delta doc: winnowing must select a
    // common fingerprint in both copies (content-determined selection),
    // so the delta doc flags — a naive every-S-th-window stride has no
    // such guarantee.
    val repeat = (1 to 59).map(i => ('a' + (i * 7) % 26).toChar).mkString
    val standing = Seq(
      (1L, "X" * 13 + repeat + "Y" * 40),
      (2L, "Q" * 90 + "R" * 30)).toDF("doc_id", "text")
    val delta = Seq(
      (7L, "Z" * 31 + repeat + "W" * 21),
      // aperiodic filler: no repeated 40-char window (a constant run
      // would self-repeat within the doc and flag)
      (14L, new scala.util.Random(99).alphanumeric.take(95).mkString)).toDF("doc_id", "text")
    val out = Dedup.exactSubstrDeltaRepeatsStrided(standing, delta, "doc_id", "text",
        width = 40, stride = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(7L) > 0L, "guarantee-length repeat missed by the delta winnowed pass")
    assert(out(14L) === 0L)
  }

  test("delta exact-substr: a re-ingested id pairs against the batch copy, not its stale twin") {
    import spark.implicits._
    // Standing doc 5 has OLD text; the delta re-ingests id 5 with new
    // text that matches nothing. If the stale standing twin were kept,
    // its windows would collide with delta doc 6 (same old text) AND
    // with the re-ingested 5 — the anti-join must drop it.
    val oldText = "C" * 30 + "stale shared body of this document" // 64 chars
    val standing = Seq((5L, oldText), (9L, "Z" * 45 + "unrelated standing text here"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (5L, "D" * 64), // re-ingest: new content, self-repeating windows only
      (6L, oldText)   // would match standing-5's stale copy if it survived
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstrDeltaRepeats(standing, delta, "doc_id", "text", width = 40)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // doc 5: "D"*64 → 25 identical windows → all repeated (within-doc)
    assert(out(5L) === 25L)
    // doc 6: stale standing-5 dropped; no other copy of oldText exists
    assert(out(6L) === 0L)
  }

  test("leakage-free split: no near-dup pair straddles a split boundary") {
    val docs = Tables.load(spark, dir, "documents")
    val pairs = Dedup.jaccardPairsNative(
      docs, "doc_id", "text", k = 3, num = 1, den = 2,
      maxShingleFreq = graft.queries.Pipelines.ShingleCap)
    val split = Curation.leakageFreeSplit(
      Components.dedupClusters(docs.select(col("doc_id").as("id")), pairs))
    val straddling = pairs
      .join(split.select(col("doc_id").as("id_a"), col("split").as("sa")), Seq("id_a"))
      .join(split.select(col("doc_id").as("id_b"), col("split").as("sb")), Seq("id_b"))
      .filter(col("sa") =!= col("sb"))
      .count()
    assert(straddling === 0L)
    // The corpus has enough clusters that all three splits are hit, and
    // train dominates (230/256 of buckets).
    val byName = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.keySet === Set("train", "val", "test"))
    assert(byName("train") > byName("val") + byName("test"))
  }

  test("winnowing guarantee: misaligned repeats of length width+stride-1 are detected") {
    import spark.implicits._
    val width = 40; val stride = 20
    val rnd = new scala.util.Random(11)
    def noise(n: Int): String =
      Array.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    // Repeats at EXACTLY the guarantee length, planted at offsets that
    // differ mod stride in every pairing — the case a naive
    // every-S-th-window stride provably misses.
    val repeat = noise(width + stride - 1) // 59 chars
    val docs = Seq(
      (1L, noise(7) + repeat + noise(160)),   // offset 7
      (2L, noise(113) + repeat + noise(40)),  // offset 113 (≠ 7 mod 20)
      (3L, noise(230)),                       // innocent
      // within-doc copy at two misaligned offsets
      (4L, noise(3) + repeat + noise(31) + repeat + noise(50)),
      (5L, noise(250))).toDF("doc_id", "text")
    val out = Dedup.exactSubstrRepeatsStrided(docs, "doc_id", "text", width, stride)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L)._2 >= 1, "doc 1 repeat not detected")
    assert(out(2L)._2 >= 1, "doc 2 repeat not detected")
    assert(out(4L)._2 >= 2, "within-doc misaligned copies not detected")
    assert(out(3L)._2 === 0 && out(5L)._2 === 0, "false positives")
  }

  test("winnowing samples ~2/stride of the window stream and handles edge lengths") {
    import spark.implicits._
    val width = 40; val stride = 20
    val rnd = new scala.util.Random(29)
    val docs = (0L until 40L).map { i =>
      (i, Array.fill(800)(('a' + rnd.nextInt(26)).toChar).mkString)
    }.toDF("doc_id", "text")
    val strided = Dedup.exactSubstrRepeatsStrided(docs, "doc_id", "text", width, stride)
      .agg(sum("n_selected")).head().getLong(0)
    val exact = Dedup.exactSubstrRepeats(docs, "doc_id", "text", width)
      .agg(sum("n_windows")).head().getLong(0)
    // Winnowing density on random text is ~2/(stride+1); allow 3/stride
    // as the bound (the 62x scale leg measures the real reduction).
    assert(strided * stride <= exact * 3,
      s"row reduction too weak: $strided selected vs $exact windows")
    assert(strided >= exact / (2 * stride),
      s"suspiciously few selections: $strided vs $exact")
    // Edge lengths: shorter than width -> 0 selected; window count
    // below stride -> exactly one full (clipped) window, one selection.
    val edges = Seq((100L, "tiny"), (101L, "z" * 39), (102L, "y" * 40),
      (103L, new scala.util.Random(5).alphanumeric.take(45).mkString))
      .toDF("doc_id", "text")
    val e = Dedup.exactSubstrRepeatsStrided(edges, "doc_id", "text", width, stride)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e(100L) === 0 && e(101L) === 0)
    assert(e(102L) === 1) // m=1 window
    assert(e(103L) === 1) // m=6 < stride: one clipped window, one argmin
  }

  test("winnowed kernel: leftmost tie, content-determined selection") {
    graft.functions.TextHashes.ensureRegistered(spark)
    import spark.implicits._
    // Identical content shifted by arbitrary offsets selects identical
    // fingerprint VALUES for the shared suffix region.
    val core = "the winnowing selection must be content determined not offset determined ok"
    val docs = Seq((1L, "xx" + core), (2L, "qqqqqqq" + core)).toDF("doc_id", "text")
    val sel = docs.select(col("doc_id"),
        call_function("graft_winnowed_hashes", col("text"), lit(40), lit(20)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((sel(1L) intersect sel(2L)).nonEmpty,
      "shifted copies selected no common fingerprint")
  }

  test("split buckets quantize 90/5/5 to the e6/f3 hex cuts") {
    import spark.implicits._
    // md5("3") = eccbc8...  → train; pick ids landing in each band by
    // direct computation of the same bucket the operator uses.
    val ids = (0L until 512L).toSeq
    val clusters = ids.map(i => (i, i)).toDF("doc_id", "component_id")
    val out = Curation.leakageFreeSplit(clusters).collect()
      .map(r => r.getLong(1) -> r.getString(2)).toMap
    ids.foreach { i =>
      val b = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .take(1).map(x => f"${x & 0xff}%02x").mkString
      val want = if (b < "e6") "train" else if (b < "f3") "val" else "test"
      assert(out(i) === want, s"id=$i bucket=$b")
    }
  }

  test("winnowed kernel fails loudly on non-positive stride/width") {
    // graft_winnowed_hashes is a registered SQL function — a direct
    // call must not silently return garbage (round-8 advice)
    val s = org.apache.spark.unsafe.types.UTF8String.fromString("abcdefgh")
    intercept[IllegalArgumentException] {
      graft.functions.WinnowedHashes.compute(s, 4, 0)
    }
    intercept[IllegalArgumentException] {
      graft.functions.WinnowedHashes.compute(s, 0, 2)
    }
  }
}
