package graft

import graft.ops.Curation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics of the curation operators (the driver oracle gates
  * the bulk behavior at sf0.01; these pin the corner cases that corpus
  * never exercises).
  */
class CurationSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-curation-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("decontaminate: sub-k docs can't collide; overlap counts distinct shared shingles") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps"), // shares 'the quick brown', 'quick brown fox'
      (2L, "too short"),                 // < 3 tokens: no shingles, never contaminated
      (3L, "completely unrelated words here")).toDF("doc_id", "text")
    val eval = Seq((100L, "the quick brown fox")).toDF("doc_id", "text")
    val out = Curation.decontaminate(corpus, eval, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) === (2L, true))
    assert(out(2L) === (0L, false))
    assert(out(3L) === (0L, false))
  }

  test("quotaSample: per-stratum quota, content-hash order, doc_id tie-break on dup text") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "alpha", "en", "web"), (2L, "beta", "en", "web"), (3L, "gamma", "en", "web"),
      (4L, "alpha", "en", "web"), // duplicate text of 1: md5 ties, doc_id breaks
      (5L, "delta", "fr", "web")).toDF("doc_id", "text", "lang", "source")
    val out = Curation.quotaSample(docs, Seq("lang", "source"), "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(out.size === 3) // 2 from (en,web), 1 from (fr,web)
    assert(out(5L) === 1L)
    // dup-text tie: if both alphas rank in top-2, 1 must precede 4
    if (out.contains(1L) && out.contains(4L)) assert(out(1L) < out(4L))
  }

  test("mixtureSample: sqrt-smoothed quotas, exhausted strata, and the T=2 flattening property") {
    val s = spark; import s.implicits._
    // head stratum 100 docs, tail stratum 4 docs: proportional sampling
    // at budget 26 gives the tail exactly 1; sqrt smoothing gives it 4/14.
    val docs = ((1L to 100L).map(i => (i, s"head doc number $i", "en")) ++
      (101L to 104L).map(i => (i, s"tail doc number $i", "sw")))
      .toDF("doc_id", "text", "lang")
    val out = Curation.mixtureSample(docs, "lang", "doc_id", "text", budget = 26L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toList
    val byLang = out.groupBy(_._2).view.mapValues(_.size).toMap
    // w = (10, 2), tw = 12 → quotas = 26*10//12 = 21, 26*2//12 = 4
    assert(byLang("en") === 21)
    assert(byLang("sw") === 4) // the whole tail survives; proportional would keep 1
    // budget below every stratum count: quota caps bind exactly
    val tiny = Curation.mixtureSample(docs, "lang", "doc_id", "text", budget = 12L)
      .collect().map(_.getString(1)).groupBy(identity).view.mapValues(_.size).toMap
    assert(tiny("en") === 10 && tiny("sw") === 2)
  }

  test("shardPack: two-level prefix sum equals the global cumsum, at any partition count") {
    val s = spark; import s.implicits._
    // 40 docs, token counts 1..8; shard budget 10 forces many boundary
    // crossings. The global order is md5(text) — opaque — so expected
    // values come from an independent driver-side fold over that order.
    val docs = (1L to 40L).map(i => (i, Seq.fill((i % 8 + 1).toInt)("w" + i).mkString(" ")))
      .toDF("doc_id", "text")
    val expected = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
      val ordered = (1L to 40L).map { i =>
        val text = Seq.fill((i % 8 + 1).toInt)("w" + i).mkString(" ")
        val key = md5.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
        (key, i, (i % 8 + 1))
      }.sortBy(t => (t._1, t._2))
      var cum = 0L
      ordered.map { case (_, id, n) =>
        val r = (id, cum / 10L, cum % 10L); cum += n; r
      }.toSet
    }
    for (parts <- Seq(1, 3, 16)) {
      val out = Curation.shardPack(docs.repartition(parts), "doc_id", "text", 10L)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
      assert(out === expected, s"at input partitions=$parts")
    }
  }

  test("corpusStats: exact discrete percentiles, incl. singleton and two-doc strata") {
    val s = spark; import s.implicits._
    // en: token counts 1..20 → p50 = 10th smallest = 10, p95 = ceil(19) = 19
    val docs = ((1L to 20L).map(i => (i, Seq.fill(i.toInt)("w").mkString(" "), "en")) ++
      Seq((100L, "one two three", "sw")) ++                      // singleton: p50 = p95 = 3
      Seq((200L, "a", "de"), (201L, "a b c d", "de")))           // n=2: p50 = 1st = 1, p95 = 2nd = 4
      .toDF("doc_id", "text", "lang")
    val out = Curation.corpusStats(docs, "lang", "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("en") === ((20L, 210L, 10L, 19L)))
    assert(out("sw") === ((1L, 3L, 3L, 3L)))
    assert(out("de") === ((2L, 5L, 1L, 4L)))
  }

  test("clusterCanonical: best quality wins, min doc_id breaks quality ties; singletons keep") {
    val s = spark; import s.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
      .toDF("doc_id", "component_id")
    val quality = Seq((1L, 10L), (2L, 99L), (3L, 99L), (9L, 1L))
      .toDF("doc_id", "quality_score")
    val out = Curation.clusterCanonical(clusters, quality)
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) === (2L, false)) // 2 and 3 tie at 99; min doc_id 2 wins
    assert(out(2L) === (2L, true))
    assert(out(3L) === (2L, false))
    assert(out(9L) === (9L, true)) // singleton is its own canonical
  }

  test("decontaminateFuzzy: catches the perturbed source and its near-dup, skips unrelated") {
    val s = spark; import s.implicits._
    val body = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val corpus = Seq(
      (1L, body + "lambda mu nu xi omicron pi rho sigma"),
      (2L, body + "lambda mu nu xi omicron pi rho tau"), // near-dup of 1
      (3L, "an entirely different document about something else whose words never overlap " * 4)
    ).toDF("doc_id", "text")
    // Eval doc = doc 1 with a short suffix: Jaccard >> 0.3 against
    // both 1 and its near-dup 2, but not against 3.
    val eval = Seq((1000001L, body + "lambda mu nu xi omicron pi rho sigma with eval tail"))
      .toDF("doc_id", "text")
    val out = Curation.decontaminateFuzzy(corpus, eval, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L)._3, s"source not flagged: ${out(1L)}")
    assert(out(2L)._3, s"near-dup of source not flagged: ${out(2L)}")
    assert(!out(3L)._3, s"unrelated doc flagged: ${out(3L)}")
    assert(out(1L)._2 > out(2L)._2, "source should out-overlap its near-dup")
    assert(out(3L) === ((0L, 0L, false)))
  }

  test("decontaminateFuzzy: a corpus doc sharing its raw id with an eval doc is still caught") {
    val s = spark; import s.implicits._
    // Independently-keyed corpus and eval sets both use id 1 — the
    // namespaced keys must prevent the delta machinery's re-ingest
    // anti-join from silently exempting corpus doc 1.
    val body = "one two three four five six seven eight nine ten " * 4
    val corpus = Seq((1L, body + "corpus tail")).toDF("doc_id", "text")
    val eval = Seq((1L, body + "eval tail")).toDF("doc_id", "text")
    val out = Curation.decontaminateFuzzy(corpus, eval, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out(1L) === true, "id-colliding contaminated doc escaped the gate")
  }

  test("curationPipelineDelta: standing digests win, shards append from the standing total") {
    val s = spark
    import s.implicits._
    // Gopher-passing text: >=50 words, sane lengths, stopwords, alpha.
    def body(seed: Int): String = {
      val rnd = new scala.util.Random(seed)
      (1 to 60).map(i => if (i % 7 == 0) "the" else if (i % 11 == 0) "with"
        else "word" + rnd.nextInt(1000)).mkString(" ")
    }
    val tA = body(1); val tB = body(2); val tC = body(3); val tD = body(4)
    val standing = Seq((10L, tA), (11L, tB)).toDF("doc_id", "text")
    // 20 duplicates standing tA -> dropped even though 20 > 10 would
    // never matter (standing wins regardless of id order); 21/22 dup
    // each other within the batch (21 survives); 23 novel.
    val delta = Seq((20L, tA), (21L, tC), (22L, tC), (23L, tD)).toDF("doc_id", "text")
    val eval = Seq((990L, "held out eval content entirely distinct")).toDF("doc_id", "text")
    val out = Curation.curationPipelineDelta(standing, delta, eval,
        "doc_id", "text", tokensPerShard = 16384L)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(!out.contains(20L), "standing-dup batch doc leaked through")
    assert(!out.contains(22L), "within-batch dup leaked through")
    assert(out.contains(21L) && out.contains(23L))
    // Standing train total: tA/tB have 60 tokens each; their split
    // depends on md5 — recompute the expected base as the operator
    // defines it and check batch train offsets continue from it.
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(t: String) =
      md.digest(t.getBytes("UTF-8")).take(1).map(b => f"${b & 0xff}%02x").mkString
    val standingTrainTokens = Seq(tA, tB).filter(bucket(_) < "e6").map(_ => 60L).sum
    val batchTrain = Seq(21L -> tC, 23L -> tD)
      .filter { case (id, t) => out(id)._1 == "train" }
      .sortBy { case (_, t) =>
        (md.digest(t.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString, t) }
    batchTrain.zipWithIndex.foreach { case ((id, _), i) =>
      val expectedCum = standingTrainTokens + i * 60L
      assert(out(id)._2 === expectedCum / 16384L, s"doc $id shard")
      assert(out(id)._3 === expectedCum % 16384L,
        s"doc $id offset: got ${out(id)._3}, want ${expectedCum % 16384L}")
    }
  }
}
