package graft

import graft.bulk.GramIndex
import graft.core.GraftDb
import graft.model.{Child, Gid, Layout, Node}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The bulk search kernel against the serving-path GraftDb as the
  * executable spec: identical overlaps (a, b, intersection) for the
  * same corpus and terms, including u8 quantization.
  */
class GramIndexParitySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-gramindex-parity")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val corpus = Seq(
    1L -> "This is the text foo",
    2L -> "This is the text bar",
    3L -> "Another text that is the text foo",
    4L -> "completely unrelated content here")

  test("bulk search equals serving-path search for every term") {
    val s = spark
    import s.implicits._

    val db = new GraftDb
    val servingIds: Map[Long, Gid] = corpus.map { case (k, text) =>
      val id = db.add(Node.Text(text))
      db.add(Node.List(Layout.Page, Vector(Child.Lazy(id))))
      k -> id
    }.toMap

    val docs = corpus.toDF("doc_id", "text")
    val postings = GramIndex.postings(docs, "doc_id", "text")

    for (term <- Seq("foo", "text foo", "This is the text foo", "unrelated", "zzz")) {
      val bulk = GramIndex.search(postings, term)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val serving = db.search(term)
        .map(o => (servingIds.map(_.swap).apply(o.id), o.a.toLong, o.b.toLong, o.intersection.toLong))
        .toSet
      assert(bulk === serving, s"mismatch for term '$term'")
    }
  }

  test("blank-term search has the same schema as a real search (union-safe)") {
    val s = spark
    import s.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val postings = GramIndex.postings(docs, "doc_id", "text")
    val blank = GramIndex.search(postings, "")
    val real = GramIndex.search(postings, "foo")
    assert(blank.schema.map(f => (f.name, f.dataType)) ===
      real.schema.map(f => (f.name, f.dataType)))
    // the regression: a Long-typed blank `id` broke this union when
    // postings carried a different id type
    assert(blank.unionByName(real).count() === real.count())
    assert(blank.count() === 0)
  }

  test("salted overlap join equals the plain overlap join") {
    val s = spark
    import s.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val postings = GramIndex.postings(docs, "doc_id", "text").persist()
    val counts = GramIndex.counts(docs, "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val plain = rows(GramIndex.overlapPairsFrom(postings, postings, counts))
    val salted = rows(GramIndex.overlapPairsSalted(postings, postings, counts, saltFactor = 4))
    assert(plain.nonEmpty)
    assert(salted === plain)
  }

  test("pruned postings drop only hot grams") {
    val s = spark
    import s.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val postings = GramIndex.postings(docs, "doc_id", "text")
    val pruned = GramIndex.prunedPostings(postings, maxDocFreq = 2)
    // grams present in all 4 docs (shared padding/space grams) are gone
    val dfs = postings.groupBy("gram").count()
    val hotCount = dfs.filter($"count" > 2).count()
    assert(hotCount > 0)
    assert(pruned.count() === postings.count() - dfs.filter($"count" > 2)
      .join(postings, "gram").count())
  }
}
