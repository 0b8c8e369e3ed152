package graft

import graft.index.Grams
import org.scalatest.funsuite.AnyFunSuite

/** Tokenizer semantics from assemblage_db/src/index.rs:826-835 and the
  * search-term trim at index.rs:195-200.
  */
class GramsSpec extends AnyFunSuite {

  test("indexText emits len(bytes)+3 grams with 3-zero-byte padding") {
    val g = Grams.indexText("ab")
    assert(g.length === 5)
    // windows over [0,0,0,'a','b',0,0,0]
    val a = 'a'.toInt
    val b = 'b'.toInt
    assert(g(0) === a) // 00 00 00 61
    assert(g(1) === ((a << 8) | b)) // 00 00 61 62
    assert(g(2) === ((a << 16) | (b << 8))) // 00 61 62 00
    assert(g(3) === ((a << 24) | (b << 16))) // 61 62 00 00
    assert(g(4) === (b << 24)) // 62 00 00 00
  }

  test("empty string still emits 3 (all-zero) grams") {
    assert(Grams.indexText("").toSeq === Seq(0, 0, 0))
  }

  test("non-ASCII text grams over UTF-8 bytes, not chars") {
    val s = "é" // 2 UTF-8 bytes
    assert(Grams.indexText(s).length === s.getBytes("UTF-8").length + 3)
  }

  test("chainCombine concatenated text indexes like contiguous text") {
    // index.rs:721-744 worked example: chain of "ab" + "cd" == index of "abcd"
    val combined = Grams.chainCombine(Seq(Grams.indexText("ab"), Grams.indexText("cd")))
    assert(combined.toSeq === Grams.indexText("abcd").toSeq)
  }

  test("chainCombine of many pieces equals contiguous index") {
    val pieces = Seq("hello ", "wor", "ld", "!")
    val combined = Grams.chainCombine(pieces.map(Grams.indexText))
    assert(combined.toSeq === Grams.indexText(pieces.mkString).toSeq)
  }

  test("chainCombine of empty child list is the [0,0,0] boundary") {
    assert(Grams.chainCombine(Seq.empty).toSeq === Seq(0, 0, 0))
  }

  test("trimForSearch drops up to 3 partial grams per end, bounded by (len-1)/2") {
    val g10 = Array.tabulate(10)(identity)
    assert(Grams.trimForSearch(g10).toSeq === (3 to 6)) // 10 grams -> drop 3 each end
    val g5 = Array.tabulate(5)(identity)
    assert(Grams.trimForSearch(g5).toSeq === Seq(2)) // (5-1)/2 = 2 per end
    val g1 = Array(7)
    assert(Grams.trimForSearch(g1).toSeq === Seq(7))
    assert(Grams.trimForSearch(Array.empty[Int]).isEmpty)
  }

  test("occurrences is the multiset histogram") {
    assert(Grams.occurrences(Array(1, 2, 1, 3, 1)) === Map(1 -> 3, 2 -> 1, 3 -> 1))
  }
}
