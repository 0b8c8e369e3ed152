package graft.queries

import graft.Tables
import graft.bulk.GramIndex
import graft.index.Grams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The engine's own query surface — gram inverted index, similarity
  * search, and materialized overlaps (SURVEY §2.4) — run over the
  * driver's `documents` table, with exact DuckDB SQL oracles (the gram
  * tokenizer is re-derived in SQL, so the whole pipeline is checked
  * bit-for-bit including the u8 quantization).
  */
object Engine {

  private val searchTerm = "hash value table"

  def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Slot-2 postings build: tokenize → explode → combine (1 shuffle).
    "q20_gram_postings" -> ((s, dir) => {
      GramIndex.postings(docs(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("gram"), col("occurrences"))
    }),

    // `search(term)` — index.rs:173-184: asymmetric find, end-trim,
    // score >= 0.3, u8-quantized.
    "q21_search_term" -> ((s, dir) => {
      val p = GramIndex.postings(docs(s, dir), "doc_id", "text")
      GramIndex.search(p, searchTerm)
        .select(col("id").as("doc_id"), col("a"), col("b"), col("intersection"))
    }),

    // Materialized symmetric overlaps — index.rs:302-347: all-pairs
    // similarity self-join at score > 0.5, forward + reverse rows.
    // Both sides are the full corpus (no broadcastable side), so the
    // hot-gram skew is handled by salting the join key — each hot
    // gram's pairs spread over 8 reducers instead of one.
    "q22_overlap_pairs" -> ((s, dir) => {
      val d = docs(s, dir)
      val p = GramIndex.postings(d, "doc_id", "text")
      val c = GramIndex.counts(d, "doc_id", "text")
      GramIndex.overlapPairsSalted(p, p, c, saltFactor = 8)
        .select(col("id").as("doc_id"), col("match_id"), col("a"), col("b"), col("intersection"))
    }),

    // The scale path for full overlap materialization: stop-gram
    // pruning (df > 50) bounds the self-join superlinearity — the
    // padding/space grams that appear in every doc contribute O(n²)
    // pairs and no signal. Deterministic, so exactly oracle-checkable;
    // unlike q22 this is bench-runnable at any SF.
    "q24_overlap_pruned" -> ((s, dir) => {
      val d = docs(s, dir)
      // localCheckpoint, not persist: blocks are reclaimed with the
      // frame, and the pruned frame materializes once for its three
      // consumers (sizes + both self-join sides) — measured faster
      // than persist at every leg (tools/Prof "pruned")
      val p = GramIndex.prunedPostings(
        GramIndex.postings(d, "doc_id", "text"), maxDocFreq = 50).localCheckpoint()
      // sizes relative to the SURVIVING (distinctive) grams — overlap
      // on rare content is the near-dup signal; common-gram mass is
      // noise at corpus scale anyway
      val c = p.groupBy("id").agg(sum(col("occurrences")).as("cnt"))
      GramIndex.overlapPairs(p, c)
        .select(col("id").as("doc_id"), col("match_id"), col("a"), col("b"), col("intersection"))
    }),

    // Incremental reindex for a write batch (Diff::new index.rs:768-813
    // + store_grams index.rs:286-300): a batch of updates, deletes and
    // inserts is applied to the index as a full-outer gram diff over
    // the DIRTY ids only, merged into the standing postings. The query
    // returns the delta-maintained postings table; the oracle builds
    // the post-write index FROM SCRATCH — hash equality proves
    // delta ≡ rebuild. Cost is one dirty-sized shuffle (the write
    // path's 100 TB story); the full `before` postings here exist only
    // because the oracle needs the whole table to compare.
    "q69_reindex_delta" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val updated = d.filter(col("doc_id") % 7 === 3 && col("doc_id") % 31 =!= 5)
        .select(col("doc_id"), concat(col("text"), lit(" EDITED")).as("text"))
      val inserted = d.filter(col("doc_id") % 41 === 1)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(lit("NEW "), col("text")).as("text"))
      val deletedIds = d.filter(col("doc_id") % 31 === 5)
        .select(col("doc_id").as("id"))
      val before = GramIndex.postings(d, "doc_id", "text")
      val dirtyOldIds = updated.select(col("doc_id").as("id"))
        .unionByName(deletedIds).distinct()
      val beforeDirty = before.join(broadcast(dirtyOldIds), Seq("id"))
      val afterDirty = GramIndex.postings(updated.unionByName(inserted), "doc_id", "text")
      GramIndex.applyGramDiff(before, GramIndex.gramDiff(beforeDirty, afterDirty))
        .select(col("id").as("doc_id"), col("gram"), col("occurrences"))
    }),

    // Incremental overlap refresh for a dirty-id set — the reference's
    // actual write-path operation (store_overlaps over Diff.ids,
    // index.rs:302-347): linear in the dirty set, not quadratic in the
    // corpus.
    "q23_overlap_dirty" -> ((s, dir) => {
      val d = docs(s, dir)
      val p = GramIndex.postings(d, "doc_id", "text")
      val c = GramIndex.counts(d, "doc_id", "text")
      // The dirty set is a write batch — small by construction — so its
      // postings BROADCAST: the corpus side never shuffles on gram and
      // hot-gram skew can't exist (measured 1.8 s vs 5.2 s for the
      // shuffle join at sf0.1). Map-side partial agg then shrinks the
      // pair stream before the only shuffle, on near-uniform (id,
      // match_id).
      val dirty = p.filter(col("id") % 50 === 0)
      GramIndex.overlapPairsFrom(broadcast(dirty), p, c)
        .select(col("id").as("doc_id"), col("match_id"), col("a"), col("b"), col("intersection"))
    }),

    // Storage-substrate version resolution (bulk/VersionedTable — the
    // DataFrame form of the reference KV store's version directory),
    // oracle-checked over a changelog derived from events: key =
    // user_id, version = event_id (unique, so resolution is
    // deterministic), 'error' events are tombstones.
    //   q75 latest    == kv get          (tombstoned keys absent)
    //   q76 asOf      == kv get_version  (snapshot at version 5000)
    //   q77 unremoved == kv get_unremoved (read through the trash)
    "q75_versioned_latest" -> ((s, dir) =>
      graft.bulk.VersionedTable.latest(changelog(s, dir), "key")
        .select(col("key").as("user_id"), col("version_ts").as("version"),
          col("event_type"), col("value"))),

    "q76_versioned_asof" -> ((s, dir) =>
      graft.bulk.VersionedTable.asOf(changelog(s, dir), ts = 5000L, "key")
        .select(col("key").as("user_id"), col("version_ts").as("version"),
          col("event_type"), col("value"))),

    "q77_versioned_unremoved" -> ((s, dir) =>
      graft.bulk.VersionedTable.unremoved(changelog(s, dir), "key")
        .select(col("key").as("user_id"), col("version_ts").as("version"),
          col("event_type"), col("value"))))

  /** Events as a versioned-table changelog (every event a version of
    * its user's row; errors are tombstones).
    */
  private def changelog(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events").select(
      col("user_id").as("key"),
      col("event_id").as("version_ts"),
      (col("event_type") === "error").as("is_removed"),
      col("event_type"), col("value"))

  private val changelogCte =
    """c AS (SELECT user_id AS key, event_id AS version_ts,
              (event_type = 'error') AS is_removed, event_type, value
         FROM events)"""

  /** DuckDB re-derivation of indexText (index.rs:826-835): byte k of the
    * zero-padded text, 4-byte big-endian windows as u32. Documents are
    * printable ASCII so ord(codepoint) == byte value. Parameterized by
    * the source relation so the reindex oracle can build postings over
    * a transformed corpus.
    */
  private def postingsCteFor(table: String) =
    s"""grams AS (
         SELECT doc_id,
           (CASE WHEN k-3 BETWEEN 1 AND len(text) THEN ord(substr(text,CAST(k-3 AS INT),1)) ELSE 0 END)*16777216 +
           (CASE WHEN k-2 BETWEEN 1 AND len(text) THEN ord(substr(text,CAST(k-2 AS INT),1)) ELSE 0 END)*65536 +
           (CASE WHEN k-1 BETWEEN 1 AND len(text) THEN ord(substr(text,CAST(k-1 AS INT),1)) ELSE 0 END)*256 +
           (CASE WHEN k   BETWEEN 1 AND len(text) THEN ord(substr(text,CAST(k   AS INT),1)) ELSE 0 END) AS gram
         FROM $table, UNNEST(range(1, len(text)+4)) AS t(k)
       ),
       postings AS (
         SELECT doc_id, gram, count(*) AS occurrences FROM grams GROUP BY doc_id, gram
       )"""

  private val postingsCte = postingsCteFor("documents")

  private def searchOracle(term: String): String = {
    val grams = Grams.trimForSearch(Grams.indexText(term))
    val srcCount = grams.length
    val values = Grams.occurrences(grams).toSeq.sorted
      .map { case (g, occ) => s"(${g & 0xffffffffL}, $occ)" }
      .mkString(", ")
    s"""WITH $postingsCte,
        src(gram, socc) AS (VALUES $values),
        matches AS (
          SELECT doc_id, sum(least(socc, occurrences)) AS inter
          FROM postings JOIN src USING (gram) GROUP BY doc_id
        )
        SELECT doc_id, CAST(255 AS BIGINT) AS a, CAST(255 AS BIGINT) AS b,
               CAST((255*inter)//$srcCount AS BIGINT) AS intersection
        FROM matches
        WHERE ((255*inter)//$srcCount)*1000 >= 300*255"""
  }

  val oracleSql: Map[String, String] = Map(
    "q20_gram_postings" ->
      s"WITH $postingsCte SELECT doc_id, CAST(gram AS BIGINT) AS gram, occurrences FROM postings",
    "q21_search_term" -> searchOracle(searchTerm),

    "q75_versioned_latest" ->
      s"""WITH $changelogCte,
         n AS (SELECT *, row_number() OVER (PARTITION BY key ORDER BY version_ts DESC) AS rn FROM c)
         SELECT key AS user_id, version_ts AS version, event_type, value
         FROM n WHERE rn = 1 AND NOT is_removed""",

    "q76_versioned_asof" ->
      s"""WITH $changelogCte,
         n AS (SELECT *, row_number() OVER (PARTITION BY key ORDER BY version_ts DESC) AS rn
               FROM c WHERE version_ts <= 5000)
         SELECT key AS user_id, version_ts AS version, event_type, value
         FROM n WHERE rn = 1 AND NOT is_removed""",

    "q77_versioned_unremoved" ->
      s"""WITH $changelogCte,
         n AS (SELECT *, row_number() OVER (PARTITION BY key ORDER BY version_ts DESC) AS rn
               FROM c WHERE NOT is_removed)
         SELECT key AS user_id, version_ts AS version, event_type, value
         FROM n WHERE rn = 1""",
    // rebuild-from-scratch over the post-write corpus: hash equality
    // with the Spark side's delta-maintained postings proves the
    // incremental path exact
    "q69_reindex_delta" ->
      s"""WITH afterdocs AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 3 THEN text || ' EDITED' ELSE text END AS text
            FROM documents WHERE doc_id % 31 <> 5
            UNION ALL
            SELECT doc_id + 1000000, 'NEW ' || text FROM documents WHERE doc_id % 41 = 1),
          ${postingsCteFor("afterdocs")}
          SELECT doc_id, CAST(gram AS BIGINT) AS gram, occurrences FROM postings""",
    "q22_overlap_pairs" ->
      s"""WITH $postingsCte,
          counts AS (SELECT doc_id, len(text)+3 AS cnt FROM documents),
          pairs AS (
            SELECT p1.doc_id AS doc_id, p2.doc_id AS match_id,
                   sum(least(p1.occurrences, p2.occurrences)) AS inter
            FROM postings p1 JOIN postings p2 USING (gram)
            WHERE p1.doc_id <> p2.doc_id
            GROUP BY 1, 2
          ),
          quantized AS (
            SELECT pairs.doc_id AS doc_id, match_id,
                   CAST((255*c1.cnt)//greatest(c1.cnt, c2.cnt) AS BIGINT) AS a,
                   CAST((255*c2.cnt)//greatest(c1.cnt, c2.cnt) AS BIGINT) AS b,
                   CAST((255*inter)//greatest(c1.cnt, c2.cnt) AS BIGINT) AS intersection
            FROM pairs
            JOIN counts c1 ON pairs.doc_id = c1.doc_id
            JOIN counts c2 ON pairs.match_id = c2.doc_id
          )
          SELECT doc_id, match_id, a, b, intersection FROM quantized
          WHERE intersection*2 > least(a, b)""",
    "q24_overlap_pruned" ->
      s"""WITH $postingsCte,
          df AS (SELECT gram, count(*) AS c FROM postings GROUP BY 1),
          pruned AS (SELECT p.doc_id, p.gram, p.occurrences
                     FROM postings p JOIN df USING (gram) WHERE df.c <= 50),
          counts AS (SELECT doc_id, sum(occurrences) AS cnt FROM pruned GROUP BY 1),
          pairs AS (
            SELECT p1.doc_id AS doc_id, p2.doc_id AS match_id,
                   sum(least(p1.occurrences, p2.occurrences)) AS inter
            FROM pruned p1 JOIN pruned p2 USING (gram)
            WHERE p1.doc_id <> p2.doc_id
            GROUP BY 1, 2
          ),
          quantized AS (
            SELECT pairs.doc_id AS doc_id, match_id,
                   CAST((255*c1.cnt)//greatest(c1.cnt, c2.cnt) AS BIGINT) AS a,
                   CAST((255*c2.cnt)//greatest(c1.cnt, c2.cnt) AS BIGINT) AS b,
                   CAST((255*inter)//greatest(c1.cnt, c2.cnt) AS BIGINT) AS intersection
            FROM pairs
            JOIN counts c1 ON pairs.doc_id = c1.doc_id
            JOIN counts c2 ON pairs.match_id = c2.doc_id
          )
          SELECT doc_id, match_id, a, b, intersection FROM quantized
          WHERE intersection*2 > least(a, b)""",
    "q23_overlap_dirty" ->
      s"""WITH $postingsCte,
          counts AS (SELECT doc_id, len(text)+3 AS cnt FROM documents),
          pairs AS (
            SELECT p1.doc_id AS doc_id, p2.doc_id AS match_id,
                   sum(least(p1.occurrences, p2.occurrences)) AS inter
            FROM postings p1 JOIN postings p2 USING (gram)
            WHERE p1.doc_id <> p2.doc_id AND p1.doc_id % 50 = 0
            GROUP BY 1, 2
          ),
          quantized AS (
            SELECT pairs.doc_id AS doc_id, match_id,
                   CAST((255*c1.cnt)//greatest(c1.cnt, c2.cnt) AS BIGINT) AS a,
                   CAST((255*c2.cnt)//greatest(c1.cnt, c2.cnt) AS BIGINT) AS b,
                   CAST((255*inter)//greatest(c1.cnt, c2.cnt) AS BIGINT) AS intersection
            FROM pairs
            JOIN counts c1 ON pairs.doc_id = c1.doc_id
            JOIN counts c2 ON pairs.match_id = c2.doc_id
          )
          SELECT doc_id, match_id, a, b, intersection FROM quantized
          WHERE intersection*2 > least(a, b)""")
}
