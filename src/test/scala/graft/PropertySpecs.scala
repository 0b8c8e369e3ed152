package graft

import graft.core.GraftDb
import graft.model.{Child, Gid, Layout, Node}
import graft.view.Markup
import org.scalacheck.{Gen, Prop, Properties}

/** Property-based invariants (the reference's test corpus is
  * example-based; these generalize its roundtrip and symmetry
  * guarantees over random inputs).
  */
object MarkupProps extends Properties("Markup") {

  // pure-JVM and fast — hammer harder than the default 100 (the round-4
  // serializer-escape bug needed ~60 random cases to surface, so 100
  // per run caught it only one run in several)
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(500)

  private val markupChar: Gen[Char] = Gen.frequency(
    8 -> Gen.alphaNumChar,
    1 -> Gen.oneOf(' ', '.', '!', '?'),
    2 -> Gen.oneOf('*', '_', '~', '`', '\\', '#', '>', '-', ','))
  private val markupLine: Gen[String] = Gen.listOf(markupChar).map(_.mkString)

  // serialize(parse(m)) is a normal form: parsing it again yields the
  // same block, and it is a fixpoint of serialize∘parse.
  property("parse-serialize normalization is stable") = Prop.forAll(markupLine) { m =>
    val block = Markup.toBlock(m)
    val normalized = Markup.fromBlock(block)
    val reparsed = Markup.toBlock(normalized)
    reparsed == block || Markup.fromBlock(reparsed) == normalized
  }

  // JSON exchange roundtrip: markup → block JSON → markup reproduces
  // the normal form (exercises the parser against every serializer
  // output shape: escapes, style arrays, empty spans).
  property("json_to_markup inverts markup_to_json on the normal form") =
    Prop.forAll(markupLine) { m =>
      val normalized = Markup.fromBlock(Markup.toBlock(m))
      graft.view.ViewJson.jsonToMarkup(graft.view.ViewJson.markupToJson(m)) == normalized
    }

  property("toNode never throws and text survives for plain lines") =
    Prop.forAll(Gen.listOf(Gen.frequency(9 -> Gen.alphaNumChar, 1 -> Gen.const(' '))).map(_.mkString)) { line =>
      Markup.toNode(line) match {
        case Node.List(Layout.Page, _) => true
        case Node.Styled(_, _)         => true
        case other                     => false
      }
    }
}

object OverlapProps extends Properties("Overlaps") {

  private val word: Gen[String] =
    Gen.oneOf("spark", "graft", "query", "table", "index", "merge", "value", "block")
  private val sentence: Gen[String] =
    Gen.chooseNum(3, 10).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  // The materialized overlap table keeps reverse rows consistent: if b
  // is in overlaps(a), then a.reverse is in overlaps(b) — maintained
  // incrementally through adds and swaps (index.rs:302-347).
  property("reverse-row symmetry under random adds and swaps") =
    Prop.forAll(Gen.chooseNum(2, 6).flatMap(n => Gen.listOfN(n, sentence)),
      Gen.chooseNum(0, 100), sentence) { (texts, swapPick, replacement) =>
      val db = new GraftDb
      val ids = texts.map { t =>
        val id = db.add(Node.Text(t))
        db.add(Node.List(Layout.Page, Vector(Child.Lazy(id))))
        id
      }
      // one random in-place swap to exercise the incremental path
      val victim = ids(swapPick % ids.length)
      db.swap(victim, Node.Text(replacement))

      val live = ids.filter(id => db.get(id).isDefined)
      live.forall { id =>
        db.overlaps(id).forall { o =>
          db.overlaps(o.id).contains(o.reverse(id))
        }
      }
    }

  // Incremental maintenance never drifts: after arbitrary edits, the
  // per-block gram count (slot 3) equals the sum of that block's
  // posting occurrences (slot 2) — i.e. the delta pipeline reproduces
  // what a from-scratch rebuild would store.
  property("postings/count consistency under random edits") =
    Prop.forAll(
      Gen.chooseNum(2, 5).flatMap(n => Gen.listOfN(n, sentence)),
      Gen.listOfN(3, Gen.zip(Gen.chooseNum(0, 100), sentence))) { (texts, edits) =>
      val db = new GraftDb
      val ids = texts.map { t =>
        val id = db.add(Node.Text(t))
        db.add(Node.List(Layout.Page, Vector(Child.Lazy(id))))
        id
      }
      edits.foreach { case (pick, replacement) =>
        db.swap(ids(pick % ids.length), Node.Text(replacement))
      }
      val occSums = scala.collection.mutable.HashMap.empty[graft.model.Gid, Int]
      db.gramsSlot.liveKeys.foreach { gram =>
        db.gramsSlot.get(gram).get.foreach { case (id, occ) =>
          if (occ > 0) occSums(id) = occSums.getOrElse(id, 0) + occ
        }
      }
      db.countsSlot.liveKeys.forall { id =>
        db.countsSlot.get(id).contains(occSums.getOrElse(id, 0))
      }
    }

  // search() finds every indexed block under its own full text with a
  // perfect score.
  property("self-search scores 1.0") = Prop.forAll(sentence) { text =>
    val db = new GraftDb
    val id = db.add(Node.Text(text))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(id))))
    val hits = db.search(text)
    hits.exists(o => o.id == id && o.score == 1.0f)
  }
}

/** The one-pass text kernels vs their java.util.regex reference forms,
  * over strings rich in Java-\s whitespace, ASCII classes, accented
  * BMP chars, and supplementary code points (emoji) — the exact inputs
  * where a char-wise loop would diverge from regex semantics.
  */
object TextKernelProps extends Properties("TextKernels") {

  // pure-JVM and fast — same rationale as MarkupProps
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(500)

  import org.apache.spark.unsafe.types.UTF8String

  private val textChar: Gen[String] = Gen.frequency(
    8 -> Gen.alphaNumChar.map(_.toString),
    3 -> Gen.oneOf(" ", "\t", "\n", "\u000B", "\f", "\r"),
    3 -> Gen.oneOf(".", "!", "-", "_", "#", "é", "ß", "漢"),
    1 -> Gen.const("😀"), // surrogate pair (emoji)
    2 -> Gen.oneOf("the", "la", "und", "des", "que"))
  private val text: Gen[String] = Gen.listOf(textChar).map(_.mkString)

  private def count(p: String, s: String): Long = {
    val m = java.util.regex.Pattern.compile(p).matcher(s)
    var n = 0L
    while (m.find()) n += 1
    n
  }

  property("TextStats equals the regex forms") = Prop.forAll(text) { s =>
    val row = graft.functions.TextStats.compute(UTF8String.fromString(s))
    val toks = {
      val m = java.util.regex.Pattern.compile("\\S+").matcher(s)
      val b = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find()) b += m.group()
      b.toSeq
    }
    row.getLong(0) == toks.length.toLong &&
      row.getLong(1) == toks.distinct.length.toLong &&
      row.getLong(2) == count("[^A-Za-z0-9\\s]", s) &&
      row.getLong(3) == count("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]", s)
  }

  property("LangHits equals the join+argmax form") = Prop.forAll(text) { raw =>
    val s = raw.toLowerCase
    val row = graft.functions.LangHits.compute(UTF8String.fromString(s))
    val hits = scala.collection.mutable.HashMap.empty[String, Long]
    val m = java.util.regex.Pattern.compile("\\S+").matcher(s)
    while (m.find()) {
      val tok = m.group()
      graft.functions.LangHits.stopwords.foreach { case (lang, w) =>
        if (w == tok) hits(lang) = hits.getOrElse(lang, 0L) + 1
      }
    }
    val expected =
      if (hits.isEmpty) ("und", 0L)
      else hits.toSeq.sortBy { case (lang, h) => (-h, lang) }.head
    row.getUTF8String(0).toString == expected._1 && row.getLong(1) == expected._2
  }
}

/** Winnowing kernel invariants over random inputs — the q106 scale
  * path's guarantee, generalized past the planted-repeat examples in
  * ExactSubstrSpec.
  */
object WinnowingProps extends Properties("WinnowedHashes") {
  import org.apache.spark.unsafe.types.UTF8String
  import graft.functions.{WindowHashes, WinnowedHashes}

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(300)

  private val width = 12
  private val stride = 6
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 200).flatMap(n => Gen.stringOfN(n, Gen.alphaChar))

  private def winnowed(s: String): Seq[Long] =
    WinnowedHashes.compute(UTF8String.fromString(s), width, stride).toLongArray().toSeq
  private def windows(s: String): Seq[Long] =
    WindowHashes.compute(UTF8String.fromString(s), width).toLongArray().toSeq

  // Selections are a SUBSET of the window-hash multiset, and every
  // full stride-window of positions contributes its minimum: any
  // stride consecutive window hashes contain at least one selected
  // value (the coverage half of the winnowing theorem).
  property("selected ⊆ windows and every full stride-window is covered") =
    Prop.forAll(textGen) { s =>
      val w = windows(s)
      val sel = winnowed(s)
      val subset = sel.forall(w.contains)
      val covered = (0 to math.max(w.length - stride, 0)).forall { j =>
        if (w.isEmpty) sel.isEmpty
        else {
          val win = w.slice(j, math.min(j + stride, w.length))
          win.isEmpty || sel.contains(win.min)
        }
      }
      subset && covered
    }

  // The detection guarantee at EXACTLY the bound: a shared substring of
  // length width+stride-1 planted at arbitrary offsets in two random
  // texts always yields a common selected fingerprint.
  private val plantedGen: Gen[(String, String, String)] = for {
    core <- Gen.stringOfN(width + stride - 1, Gen.alphaChar)
    pre1 <- Gen.stringOfN(7, Gen.numChar); suf1 <- Gen.stringOfN(40, Gen.numChar)
    preLen2 <- Gen.chooseNum(0, 50)
    pre2 <- Gen.stringOfN(preLen2, Gen.numChar); suf2 <- Gen.stringOfN(25, Gen.numChar)
  } yield (pre1 + core + suf1, pre2 + core + suf2, core)

  property("repeats of length width+stride-1 share a selected fingerprint at any offsets") =
    Prop.forAll(plantedGen) { case (a, b, _) =>
      (winnowed(a).toSet intersect winnowed(b).toSet).nonEmpty
    }
}
