package graft

import graft.functions.BpeTokenizer
import graft.ops.Curation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic byte-pair tokenizer (round-9 verdict task 3): fixed
  * merges in table order, one non-overlapping left-to-right pass per
  * merge over code points — semantics pinned here against hand-derived
  * token sequences; exact cross-engine parity is q118's oracle.
  */
class BpeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bpe-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def toks(s: String): List[String] =
    BpeTokenizer.tokens(UTF8String.fromString(s)).toList

  test("merges apply in table order, one pass each") {
    // "the": (t,h) rank 1 → th,e; (th,e) level 2 → the
    assert(toks("the") === List("the"))
    // "station": (a,t) rank 8 consumes the 'at' before (t,i) rank 11
    // could form 'ti' — order matters and is pinned
    assert(toks("station") === List("st", "at", "i", "on"))
    // space-prefixed function word: " the" is ONE token
    assert(toks("in the end") === List("in", " the", " ", "en", "d"))
  }

  test("pinned token sequences (the exact convention, not just counts)") {
    // hand-derived under the documented semantics
    assert(toks("") === Nil)
    assert(toks("a") === List("a"))
    // (a,a) is not a merge — no accidental self-merge
    assert(toks("aaa") === List("a", "a", "a"))
    assert(toks("and and") === List("and", " and"))
    assert(toks("to the of and a") ===
      List("to", " the", " of", " and", " a"))
  }

  test("within-pass non-overlap: a fresh merge result does not re-merge in the same pass") {
    // merge ("t","h"): "tth" → pass yields th? positions: t,t,h —
    // pair (0,1)=(t,t) no; (1,2)=(t,h) merge → t,th. Later ("th","e")
    // doesn't apply. Final: "t","h","e" chain check on "ththth":
    // one pass merges (0,1),(2,3),(4,5) → th,th,th
    assert(toks("ththth") === List("th", "th", "th"))
  }

  test("supplementary-plane code points are single start units") {
    val s = "a🎉b" // a 🎉 b
    assert(toks(s) === List("a", "🎉", "b"))
    assert(BpeTokenizer.count(UTF8String.fromString(s)) === 3L)
  }

  test("count equals token length; BPE compresses English text below char count") {
    val text = "the quick brown fox jumps over the lazy dog and the cat"
    val n = BpeTokenizer.count(UTF8String.fromString(text))
    assert(n === toks(text).length.toLong)
    assert(n < text.length, "no compression — merges not firing")
  }

  test("SQL builders reject wrong arity with a descriptive error") {
    val s = spark
    graft.functions.BpeFns.ensureRegistered(s)
    val e = intercept[Exception](s.sql("SELECT graft_bpe_count('a','b')").collect())
    assert(e.getMessage.contains("1 argument") || e.getMessage.contains("got 2"))
    val e0 = intercept[Exception](s.sql("SELECT graft_bpe_tokens()").collect())
    assert(e0.getMessage.contains("1 argument") || e0.getMessage.contains("got 0"))
  }

  test("shardPack/corpusStats accept the bpe tokenizer and count subwords") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the cat and the dog"),
      (2L, "station to the end of it"),
      (3L, "")).toDF("doc_id", "text")
    val packed = Curation.shardPack(docs, "doc_id", "text",
        tokensPerShard = 8L, tokenizer = "bpe")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.collect().foreach { r =>
      val want = BpeTokenizer.count(UTF8String.fromString(r.getString(1)))
      assert(packed(r.getLong(0)) === want, s"doc ${r.getLong(0)}")
    }
    val stats = Curation.corpusStats(
        docs.withColumn("lang", lit("en")), "lang", "doc_id", "text",
        tokenizer = "bpe")
      .collect()
    assert(stats.head.getAs[Long]("sum_tokens") ===
      docs.collect().map(r => BpeTokenizer.count(UTF8String.fromString(r.getString(1)))).sum)
    intercept[IllegalArgumentException] {
      Curation.shardPack(docs, "doc_id", "text", 8L, tokenizer = "nope")
    }
  }

  test("BPE training: learned merges, counts, tie-break, and dry stop on a constructed corpus") {
    val s = spark
    import s.implicits._
    // "ababab" has overlapping pairs (a,b)x3 (b,a)x2; "abab" adds
    // (a,b)x2 (b,a)x1 -> round 1 learns (a,b) at 5. Round 2 state
    // [ab,ab,ab]/[ab,ab] -> (ab,ab) at 3. Round 3's only pair
    // (abab,ab) has count 1 < 2 -> training runs DRY at 2 merges.
    val docs = Seq((1L, "ababab"), (2L, "abab")).toDF("doc_id", "text")
    val got = graft.ops.BpeTrain.learnMerges(docs, "text", rounds = 6)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, "a", "b", 5L), (2L, "ab", "ab", 3L)))
    // the learned table drops into the inference kernel unchanged
    val learned = got.map(g => g._2 -> g._3).toIndexedSeq
    assert(graft.functions.BpeTokenizer.tokensWith(learned, "ababab").toSeq ===
      Seq("abab", "ab"))
    assert(graft.functions.BpeTokenizer.tokensWith(learned, "abba").toSeq ===
      Seq("ab", "b", "a"))
    // tie-break: equal counts resolve by (a, b) binary order —
    // "xy xy" and "yz yz" both give 2 cross pairs? construct exact:
    // "xyxy" -> (x,y)x2 (y,x)x1; "yzyz" -> (y,z)x2 (z,y)x1 -> tie
    // between (x,y) and (y,z) at 2 -> (x,y) wins on a asc
    val tie = Seq((1L, "xyxy"), (2L, "yzyz")).toDF("doc_id", "text")
    val t1 = graft.ops.BpeTrain.learnMerges(tie, "text", rounds = 1)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(t1.head === (("x", "y")))
    // the fixed table and the generalized kernel agree (inference
    // parity: tokens() IS tokensWith(Merges, _))
    for (str <- Seq("the cat sat", "", "a", "threading the needle"))
      assert(graft.functions.BpeTokenizer.tokensWith(
        graft.functions.BpeTokenizer.Merges, str).toSeq ===
        graft.functions.BpeTokenizer.tokens(
          org.apache.spark.unsafe.types.UTF8String.fromString(str)).toSeq)
  }

  test("BATCHED training is merge-for-merge identical to sequential") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(1212)
    // small alphabets maximize pair collisions and count ties — the
    // regime where an unsound batch rule would diverge from the
    // sequential argmax chain
    for ((alpha, docsN, len, rounds) <- Seq(
        ("ab", 12, 24, 10),
        ("abc", 20, 30, 16),
        ("abcd", 30, 40, 24),
        ("aabb", 16, 28, 12))) {
      val docs = (1 to docsN).map { i =>
        (i.toLong, (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
      }.toDF("doc_id", "text")
      val seq = graft.ops.BpeTrain
        .learnMerges(docs, "text", rounds, maxBatchPerPass = 1)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      val bat = graft.ops.BpeTrain
        .learnMerges(docs, "text", rounds) // default batching
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      assert(bat.toSeq === seq.toSeq, s"alphabet '$alpha': batched diverged")
    }
    // and on English-ish text where counts are sparse
    val eng = Seq(
      (1L, "the cat sat on the mat and the cat sat again"),
      (2L, "the dog sat on the log and the dog sat again"),
      (3L, "a cat and a dog sat on a mat and a log")).toDF("doc_id", "text")
    val seqE = graft.ops.BpeTrain.learnMerges(eng, "text", 20, maxBatchPerPass = 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val batE = graft.ops.BpeTrain.learnMerges(eng, "text", 20)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(batE.toSeq === seqE.toSeq, "english corpus: batched diverged")
  }
}
