package graft.queries

import graft.Tables
import graft.ops.{AsOfJoin, Components, Curation, Dedup, Html, Media, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Training-data pipeline operators as driver-contract queries, each
  * with an exact DuckDB oracle: streaming-shaped event analytics
  * (windows, as-of, JSON), the dedup family (exact / Jaccard /
  * MinHash+LSH / SimHash / embedding-cosine), similarity search (brute
  * force + LSH), dedup clustering (GraphX), text analysis, and the
  * multimodal binary-column pipeline.
  */
object Pipelines {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Run `f` against a throwaway ManifestStore in a fresh temp dir,
    * deleting the dir afterwards — safe because gate resume eagerly
    * re-checkpoints every slot it reads (Ckpt.fresh), so the returned
    * gate holds no reference to the store's files. Used by the gate
    * replays' restart legs (q104/q114).
    */
  private def withGateStore[A](s: SparkSession)(f: graft.bulk.ManifestStore => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-gate-replay")
    try f(new graft.bulk.ManifestStore(s, dir.toString))
    finally {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(dir)) { st =>
        st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }

  /** [[withGateStore]] for the multimodal gate: one ManifestStore per
    * modality under a shared temp root, all cleaned up together. */
  private def withMixedGateStores[A](s: SparkSession)(
      f: (String => graft.bulk.ManifestStore) => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mixed-gate-replay")
    try f(m => new graft.bulk.ManifestStore(s, s"$dir/$m"))
    finally {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(dir)) { st =>
        st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }

  /** Stop-shingle df cap for the Jaccard family (q31/q37), mirrored in
    * their oracles. Shingles in more docs than this are dropped before
    * the inverted-index self-join (O(df²) pairs, no signal).
    */
  val ShingleCap = 100

  /** Constant boilerplate text for the q182/q183 hot-bucket legs —
    * ≥ 3 tokens so it shingles, single-quote-free so it inlines into
    * the DuckDB twin verbatim.
    */
  val LshHotBoiler =
    "subscribe to our newsletter terms of service privacy policy all rights reserved"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 1h windows over the event stream (batch form of the
    // Structured Streaming windowed agg in graft.streaming).
    "q16_hourly_events" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DecimalType(38, 2)).cast("double").as("sum_value"))
        .select(
          unix_micros(col("window.start")).as("hour_us"),
          col("event_type"), col("n_events"), col("sum_value"))
    }),

    // As-of join: each purchase matched to the user's latest preceding
    // click (inclusive) — the native AsOfJoinExec (custom plan node:
    // co-partitioned sort-merge, single pass). The composed
    // union+window form (graft.ops.AsOfJoin) is result-identical
    // (NativeAsOfSpec).
    "q17_asof_purchase_click" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(
          col("user_id").as("r_user"), col("ts").as("r_ts"),
          col("event_id").as("click_id"),
          unix_micros(col("ts")).as("click_ts_us"))
      graft.plans.NativeAsOf.leftAsOf(purchases, clicks,
        leftKey = "user_id", rightKey = "r_user", leftTs = "ts", rightTs = "r_ts")
        .select(
          col("event_id"), col("user_id"), col("click_id"),
          (unix_micros(col("ts")) - col("click_ts_us")).as("gap_us"))
    }),

    // JSON prop extraction + conditional aggregation.
    "q18_json_props" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(
          count(when(col("k") > 50, 1)).as("n_hi"),
          sum(col("k")).as("sum_k"))
    }),

    // Exact dedup: canonical (min-id) mapping per content digest.
    "q30_dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
        .select(col("id").as("doc_id"), col("canonical_id"), col("group_size"))
    }),

    // Near-dup pairs by exact word-3-gram Jaccard > 0.5 (integer-space
    // threshold) through the inverted shingle index. Native per-doc
    // shingle dedup (no distinct shuffle) with the df > 100 stop-
    // shingle cap always on — the cap is mirrored in the oracle, so
    // results agree at every SF (at bench SF max df is 25: no-op).
    "q31_dedup_jaccard" -> ((s, dir) => {
      Dedup.jaccardPairsNative(
        t(s, dir, "documents"), "doc_id", "text",
        k = 3, num = 1, den = 2, maxShingleFreq = ShingleCap)
    }),

    // MinHash(64) + LSH(16 bands × 4) candidates, verified by exact
    // Jaccard > 0.5 restricted to candidates — the sub-quadratic scale
    // path for q31. Native one-pass signature kernel; the shingle
    // explode runs only over candidate docs.
    "q32_dedup_minhash_lsh" -> ((s, dir) => {
      Dedup.minhashLshPairsNative(
        t(s, dir, "documents"), "doc_id", "text",
        k = 3, numPerm = 64, bands = 16, num = 1, den = 2)
    }),

    // SimHash(60-bit, tf-weighted) near-dup pairs within Hamming ≤ 3
    // via the 4-chunk pigeonhole join.
    "q33_dedup_simhash" -> ((s, dir) => {
      Dedup.simhashPairs(
        Dedup.simhashFingerprints(t(s, dir, "documents"), "doc_id", "text"), maxHamming = 3)
    }),

    // Embedding-cosine near-dup pairs at cosine ≥ 0.45 (exact), via
    // the block-symmetric equi-join — no non-equi self-join, no corpus
    // broadcast; every unordered pair evaluated once in one of the
    // evenly-sized block-pair tasks.
    "q34_dedup_embedding" -> ((s, dir) => {
      Similarity.cosinePairsBlocked(t(s, dir, "embeddings"), "vec_id", "embedding", threshold = 0.45)
    }),

    // Brute-force cosine top-10 for the query subset (vec_id % 100 = 0).
    "q35_ann_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queries = emb.filter(col("vec_id") % 100 === 0), k = 10)
    }),

    // LSH-bucketed ANN (4 deterministic hyperplanes → 16 buckets),
    // exact-cosine rerank inside the query's bucket.
    "q36_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopK(emb, "vec_id", "embedding",
        queries = emb.filter(col("vec_id") % 100 === 0), dim = 64, numPlanes = 4, k = 10)
    }),

    // Embedding near-dup pairs via LSH buckets + exact-cosine verify:
    // the sub-quadratic scale path whose exhaustive verifier is q34
    // (same 0.45 threshold; candidates = bucket-mates only). The plane
    // count auto-scales with the corpus (B = max(4, ceil(log2(n/125)))
    // in integer math, mirrored in the oracle) so bucket population —
    // and with it the per-bucket join cost — stays constant at any SF.
    "q74_dedup_embedding_lsh" -> ((s, dir) => {
      Similarity.cosinePairsLshAuto(t(s, dir, "embeddings"), "vec_id", "embedding",
        dim = 64, threshold = 0.45)
    }),

    // Incremental embedding near-dup: the vec_id%5==0 slice replayed as
    // an ingest batch against the rest — delta×standing bucket joins
    // only, delta broadcast (the embedding twin of q85).
    "q93_dedup_embedding_delta" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.cosinePairsLshDeltaAuto(
        emb.filter(col("vec_id") % 5 =!= 0), emb.filter(col("vec_id") % 5 === 0),
        "vec_id", "embedding", dim = 64, threshold = 0.30)
    }),

    // kNN label consistency: embedding-quality eval over the unused
    // label column — per query (vec_id%100=0), how many of its 10
    // exact-cosine neighbors share its label.
    "q94_knn_label_purity" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.knnLabelPurity(emb, "vec_id", "embedding", "label",
        queries = emb.filter(col("vec_id") % 100 === 0), k = 10)
    }),

    // int8 quantization QA: brute-force top-10 over scalar-quantized
    // vectors (integer dots), judged by recall against the exact float
    // top-10 — the accept gate for switching the store to int8.
    "q101_quantized_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.quantizedTopKRecall(emb, "vec_id", "embedding",
        queries = emb.filter(col("vec_id") % 100 === 0), k = 10)
    }),

    // Quantized IVF composition: the int8 store (q101's accept gate)
    // composed into the IVF probe (q38's budget) — quantized cells,
    // integer-dot shortlist, exact float rerank of the shortlist only;
    // gated on recall@10 vs the exact float ranking.
    "q109_ann_ivf_quantized" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopKQuantizedRecall(emb, "vec_id", "embedding",
        queries = emb.filter(col("vec_id") % 100 === 0),
        numCentroids = 16, nprobe = 2, shortlist = 40, k = 10)
    }),

    // Product quantization (round 12): the compression rung past int8
    // SQ — 8 subspaces × 256 integer codebooks (trained on the q39
    // deterministic capped sample, quantized to the q105 floor(x·1000)
    // lattice ONCE after Lloyd), corpus encoded to 8 bytes/vector,
    // queries scored by integer ADC lookup tables, recall-gated
    // against the exact float top-10 (the q101 judgment tail). The
    // codebooks are EXPORTED as parquet, so the DuckDB twin replays
    // encode (argmin integer L2, ties to the lowest index) and ADC
    // (integer dots) bit-for-bit — the q39/q109 discipline.
    "q160_pq_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.pqTopKRecallExport(emb, "vec_id", "embedding",
        queries = emb.filter(col("vec_id") % 100 === 0),
        m = 8, ksub = 256, trainIters = 2, k = 10,
        exportPath = PqExportPath)
    }),

    // SAMPLED PQ recall judge (round 13): q160's accept gate with the
    // exact-judge leg bounded by a DETERMINISTIC 256-query sample
    // (lowest md5(vec_id) — replayable verbatim in SQL, unlike the
    // xxhash64 training sample) instead of the %100 slice whose size
    // grows with the corpus. Per-query judgment is independent, so
    // sampled ≡ full restricted to the sample (PqSpec pins it) — and
    // the verifier cost is 256 × corpus at ANY scale, which puts the
    // PQ family back into the 62× cluster battery at bounded cost.
    "q169_pq_recall_sampled" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      // checkpoint the 256-row sample: it feeds four plan branches
      // (ADC broadcast, LUT build, exact judge, output join) and the
      // md5 global sort would otherwise re-run once per branch
      val qs = emb.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        .limit(256).localCheckpoint()
      Similarity.pqTopKRecallExport(emb, "vec_id", "embedding",
        queries = qs, m = 8, ksub = 256, trainIters = 2, k = 10,
        exportPath = PqSampleExportPath)
    }),

    // Variance-balanced PERMUTED PQ (round 14, the allocation idea
    // OPQ builds on — Ge et al. 2013, integer-lattice family): dims
    // greedy-allocate to subspaces balancing per-subspace variance so
    // no 8-bit sub-quantizer is overloaded; dots are permutation-
    // invariant so ADC scoring is unchanged. Both the permutation and
    // the permuted-lattice codebooks export for the oracle; judged by
    // the q169 sampled judge.
    "q179_pq_permuted_recall_sampled" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs = emb.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        .limit(256).localCheckpoint()
      Similarity.pqPermutedTopKRecallExport(emb, "vec_id", "embedding",
        queries = qs, m = 8, ksub = 256, trainIters = 2, k = 10,
        permExportPath = PqPermPath, cbExportPath = PqPermCbPath)
    }),

    // IVFADC proper (round 14, Jégou et al. 2011): codes quantize the
    // RESIDUAL to the assigned coarse centroid instead of the raw
    // vector — residuals concentrate near 0, so the same 8 bytes
    // quantize them tighter and recall rises at equal bytes (PqSpec
    // pins residual ≥ direct on a clustered corpus; BASELINE records
    // the measured lift). Serving scans only the nprobe probed cells;
    // score = dot(q, cent) + residual-ADC, all on the ×1000 integer
    // lattice; judged by the q169 sampled judge (256 lowest-md5
    // queries, SQL-replayable verbatim).
    "q175_ivfadc_recall_sampled" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs = emb.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        .limit(256).localCheckpoint()
      Similarity.ivfadcTopKRecallExport(emb, "vec_id", "embedding",
        queries = qs, numCells = 16, coarseIters = 3, m = 8, ksub = 256,
        pqIters = 2, nprobe = 4, k = 10,
        coarseExportPath = IvfAdcCoarsePath, cbExportPath = IvfAdcCbPath)
    }),

    // IVFADC + exact re-rank (round 14): the full production serving
    // stack — probe-bounded residual-ADC scan prunes the probed cells
    // to a 50-deep shortlist (9 B/vector hot), float cosine re-ranks
    // shortlist rows only (the sole float fetch). Completes the
    // compression ladder symmetrically with q163's flat-PQ re-rank.
    "q181_ivfadc_rerank" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs = emb.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        .limit(256).localCheckpoint()
      Similarity.ivfadcRerankTopKRecallExport(emb, "vec_id", "embedding",
        queries = qs, numCells = 16, coarseIters = 3, m = 8, ksub = 256,
        pqIters = 2, nprobe = 4, shortlist = 50, k = 10,
        coarseExportPath = IvfAdcRrCoarsePath, cbExportPath = IvfAdcRrCbPath)
    }),

    // PQ + exact re-rank: the two-stage PQ serving pattern — integer
    // ADC prunes to a 50-deep shortlist (compressed scan, 8 B/vector),
    // float cosine re-ranks shortlist rows only (the sole float fetch
    // on the serving path). Structurally recall@10 ≥ q160's raw ADC
    // per query (PqSpec pins dominance + shortlist monotonicity); the
    // DuckDB twin replays BOTH stages from the exported codebooks.
    "q163_pq_rerank" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.pqRerankTopKRecallExport(emb, "vec_id", "embedding",
        queries = emb.filter(col("vec_id") % 100 === 0),
        m = 8, ksub = 256, trainIters = 2, shortlist = 50, k = 10,
        exportPath = PqRerankExportPath)
    }),

    // IVF ANN: 16 nearest-centroid cells, 2-probe search, exact rerank.
    "q38_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb, "vec_id", "embedding",
        queries = emb.filter(col("vec_id") % 100 === 0),
        numCentroids = 16, nprobe = 2, k = 10)
    }),

    // Trained IVF: 3 Lloyd's iterations over the deterministic sample,
    // then the same probe/rerank machinery — recall@10 0.32 → 0.52 vs
    // q38's seed cells at the same probe budget (KMeansIvfSpec). The
    // trained centroids are bit-deterministic (ascending-id driver-side
    // accumulation), so they're EXPORTED as parquet and the DuckDB twin
    // replays probe+rerank over the exported table with the same
    // sequential-fold cosine and (sim DESC, cid) tie-break — a full
    // hash oracle, not rows-only.
    "q39_ann_ivf_trained" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopKTrainedExport(emb, "vec_id", "embedding",
        queries = emb.filter(col("vec_id") % 100 === 0),
        numCentroids = 16, trainIters = 3, nprobe = 2, k = 10,
        exportPath = CentroidExportPath)
    }),

    // Duplicate clusters: GraphX connected components over the Jaccard
    // near-dup pairs (native capped path, same as q31); every doc
    // mapped to its cluster's min id.
    "q37_dedup_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.jaccardPairsNative(
        docs, "doc_id", "text", k = 3, num = 1, den = 2, maxShingleFreq = ShingleCap)
      Components.dedupClusters(docs.select(col("doc_id").as("id")), pairs)
    }),

    // LSH bucket clustering via anchored STAR edges (round 15): the
    // hot-bucket-safe near-dup grouping — components of the band-bucket
    // co-membership graph, candidates emitted as (min-id anchor →
    // member) per bucket, O(M) edges where all-pairs is M²/2. The
    // corpus is augmented with a 32-doc constant-boilerplate block
    // (ids ≥ 10⁶) so the oracle exercises a genuinely hot bucket: the
    // DuckDB twin builds the ALL-PAIRS co-membership graph and runs
    // the q37 recursive CC over it — a hash match proves star ≡
    // all-pairs under connected components end-to-end, not just in
    // the spec.
    "q182_lsh_star_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val aug = docs.unionByName(docs.filter(col("doc_id") < 32).select(
        (col("doc_id") + lit(1000000L)).as("doc_id"), lit(LshHotBoiler).as("text")))
      Dedup.minhashLshClustersNative(aug, "doc_id", "text",
        k = 3, numPerm = 64, bands = 16)
    }),

    // HTML → text boilerplate extraction (round 15): every doc wrapped
    // in a deterministic realistic page (head/title with an entity,
    // style + script blocks, a comment, a nav div with inline links,
    // one <p> per raw line with &/</> entity-encoded), then run
    // through the single-pass state-machine extractor. Closed form:
    // extraction and every per-rule count are arithmetic in the
    // original text, so the DuckDB twin replays them exactly —
    // tag/script/style/comment drop, entity decode, block
    // segmentation, whitespace normalization all hash-gated.
    "q184_html_extract" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Html.htmlText(Html.asHtml(docs, "doc_id", "text"), "doc_id", "html")
    }),

    // URL operators (round 15): every capture stamped with a MESSY
    // deterministic URI (mixed-case scheme/host, default and explicit
    // ports, unsorted query params, fragments — all doc_id-derived, so
    // the DuckDB twin regenerates both the raw and the normalized form
    // analytically). The WARC roundtrip carries WARC-Target-URI
    // end-to-end; the profile normalizes (scheme/host lower, default
    // port strip, fragment strip, query sort) and extracts the
    // registered domain through the embedded second-level-suffix list
    // (co.uk-class hosts take three labels — a last-two-labels bug
    // hash-mismatches immediately).
    "q187_warc_url_profile" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("uri", messyUriCol(col("doc_id")))
      val caps = graft.ops.WarcStream.decodeWarcCaptures(
        graft.ops.WarcStream.asWarcShardsUri(docs, "doc_id", "text", "uri", 100)).toDF()
      graft.ops.Urls.urlProfile(caps, "target_uri")
        .select("doc_id", "target_uri", "url_norm", "host", "registered_domain")
    }),

    // Per-registered-domain quota (the CCNet-class domain budget):
    // first 5 docs of every domain in md5(text) order — composed from
    // the URL profile and the q84 quota machinery (map-side
    // WindowGroupLimit pre-truncation, so a mega-domain ships O(k)
    // per map task, not its crawl share).
    "q188_url_domain_quota" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("uri", messyUriCol(col("doc_id")))
      graft.ops.Urls.domainQuotaSample(
        graft.ops.Urls.urlProfile(docs, "uri"), "doc_id", "text", 5)
    }),

    // URL-level exact dedup with revisit-aware precedence (round 15):
    // %67 docs are re-crawled as REVISIT records (+1000001, same URL),
    // %53 docs re-crawled with CHANGED content (+3000001, same URL,
    // 'v2 ' prefix) — the two real re-crawl outcomes. Captures group
    // by normalized URL; the canonical capture is the lowest-id
    // NON-revisit (revisits carry no payload and resolve via the q178
    // equi-join, so they can never be the kept copy).
    "q189_url_revisit_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("revisit_of", lit(null).cast("long"))
        .withColumn("uri", messyUriCol(col("doc_id")))
      val revisits = docs.filter(col("doc_id") % 67 === 0).select(
        (col("doc_id") + 1000001L).as("doc_id"), col("text"),
        col("doc_id").as("revisit_of"), col("uri"))
      val changed = docs.filter(col("doc_id") % 53 === 0).select(
        (col("doc_id") + 3000001L).as("doc_id"),
        concat(lit("v2 "), col("text")).as("text"),
        lit(null).cast("long").as("revisit_of"), col("uri"))
      val corpus = docs.unionByName(revisits).unionByName(changed)
      graft.ops.Urls.urlDedupRevisitAware(
        graft.ops.WarcStream.warcRevisitDocsUri(
          graft.ops.WarcStream.asWarcShardsWithRevisits(
            corpus, "doc_id", "text", "revisit_of", 100, "uri")))
        .select("doc_id", "url_norm", "is_revisit", "url_canonical_id", "keep")
    }),

    // HTML through the crawl wrapper (round 15): every doc arrives as
    // a WARC capture — odd ids as text/plain raw text, even ids as a
    // text/html page (the q184 encoder). The mixed hash routes html
    // captures through EXTRACTION before the SimHash, so an HTML page
    // fingerprints from its extracted text (markup chrome never
    // pollutes the token stream); the DuckDB twin replays both the
    // extraction closed form and the q33 SimHash chain per route.
    // Token-less captures emit no row (the q33 null convention).
    "q186_warc_html_route" -> ((s, dir) => {
      import s.implicits._
      val rows = t(s, dir, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          if (id % 2 == 0)
            graft.ops.MediaRow(id, "text/html; charset=utf-8",
              graft.ops.Html.encodePage(text).getBytes("UTF-8"))
          else
            graft.ops.MediaRow(id, "text/plain; charset=utf-8",
              text.getBytes("UTF-8"))
        }
      Media.mixedMediaHash(graft.ops.WarcStream.asWarcOver(rows))
    }),

    // The crawl-shaped curation entry (round 15): HTML pages → text
    // extraction → the Gopher quality battery, i.e. q100 running on
    // what a real crawl actually feeds it. The DuckDB twin replays the
    // extraction closed form and the full rule chain over it — the
    // composition is hash-gated end to end.
    "q185_html_quality" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val extracted = Html.htmlText(Html.asHtml(docs, "doc_id", "text"), "doc_id", "html")
      TextAnalysis.gopherRules(extracted, "doc_id", "text")
    }),

    // Hot-bucket-capped LSH pairs (round 15): q32's verified-pairs
    // operator with the band-df cap engaged (maxBandFreq = 8) over the
    // same boilerplate-augmented corpus. The 32 identical docs share
    // EVERY band key (df = 32 > 8), so all their buckets prune and no
    // boilerplate pair is enumerated — the cap's contract is that mass
    // duplication belongs to the clustering path (q182), never to
    // pairwise O(M²) emission. Organic pairs ride through unchanged
    // unless their bucket also crosses the cap (the oracle mirrors the
    // df filter, so either way the sides agree).
    "q183_lsh_banded_capped" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val aug = docs.unionByName(docs.filter(col("doc_id") < 32).select(
        (col("doc_id") + lit(1000000L)).as("doc_id"), lit(LshHotBoiler).as("text")))
      Dedup.minhashLshPairsNative(aug, "doc_id", "text",
        k = 3, numPerm = 64, bands = 16, num = 1, den = 2, maxBandFreq = 8)
    }),

    // Language ID by stopword-hit argmax.
    "q40_lang_id" -> ((s, dir) =>
      TextAnalysis.langId(t(s, dir, "documents"), "doc_id", "text")),

    // Quality features + integer score.
    "q41_quality_score" -> ((s, dir) =>
      TextAnalysis.qualityScore(t(s, dir, "documents"), "doc_id", "text")),

    // Whitespace + BPE-ish token counts.
    "q42_token_counts" -> ((s, dir) =>
      TextAnalysis.tokenCounts(t(s, dir, "documents"), "doc_id", "text")),

    // Rolling-hash document fingerprints.
    "q43_fingerprints" -> ((s, dir) =>
      TextAnalysis.fingerprints(t(s, dir, "documents"), "doc_id", "text")),

    // Benchmark decontamination: corpus docs sharing any word-3-gram
    // with the eval set (doc_id % 97 = 0) are flagged; the eval
    // shingle vocabulary is broadcast, the corpus never repartitions.
    "q82_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Curation.decontaminate(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", k = 3)
    }),

    // Deterministic stratified quota sample: first 50 docs per
    // (lang, source) stratum in md5(text) order — reproducible
    // mixture curation; rank filter pushed map-side (WindowGroupLimit).
    "q83_quota_sample" -> ((s, dir) =>
      Curation.quotaSample(t(s, dir, "documents"),
        Seq("lang", "source"), "doc_id", "text", k = 50)),

    // Canonical representative per near-dup cluster: q37's components
    // + q41's quality score → keep the best-quality member, not the
    // lowest id.
    "q84_cluster_canonical" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.jaccardPairsNative(
        docs, "doc_id", "text", k = 3, num = 1, den = 2, maxShingleFreq = ShingleCap)
      Curation.clusterCanonical(
        Components.dedupClusters(docs.select(col("doc_id").as("id")), pairs),
        TextAnalysis.qualityScore(docs, "doc_id", "text"))
    }),

    // Incremental dedup: the new-batch (doc_id % 7 = 0, ~14% of the
    // corpus) near-dups
    // against the standing corpus — candidates are delta×standing band
    // joins only, never standing×standing.
    "q85_dedup_delta" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.minhashLshDeltaPairsNative(
        docs.filter(col("doc_id") % 7 =!= 0),
        docs.filter(col("doc_id") % 7 === 0),
        "doc_id", "text", k = 3, numPerm = 64, bands = 16, num = 1, den = 2)
    }),

    // Token-budget shard packing: 16384-token training shards over the
    // md5(text) order, via the distributed two-level prefix sum.
    "q86_shard_pack" -> ((s, dir) =>
      Curation.shardPack(t(s, dir, "documents"), "doc_id", "text",
        tokensPerShard = 16384L)),

    // Temperature-scaled mixture sample: 200-doc budget, per-lang
    // quotas ∝ √count (T=2 smoothing), md5-order within stratum.
    "q87_mixture_sample" -> ((s, dir) =>
      Curation.mixtureSample(t(s, dir, "documents"), "lang", "doc_id", "text",
        budget = 200L)),

    // PII scrub: sequential email → phone redaction with counts. The
    // synthetic corpus carries no PII, so every 5th doc gets a
    // deterministic contact line injected (mirrored in the oracle) —
    // otherwise the oracle would only prove the no-op path.
    "q89_redact_pii" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val aug = docs.withColumn("text",
        when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com or +1 (555) 010-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(col("text")))
      TextAnalysis.redactPii(aug, "doc_id", "text")
    }),

    // Repetition metrics: duplicated-bigram mass + top-token share
    // (the Gopher-style repetition filter), integer permille.
    "q90_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionMetrics(t(s, dir, "documents"), "doc_id", "text")),

    // Corpus profiling: per-lang doc/token mass + exact integer
    // p50/p95 token percentiles (discrete, ceil(q·n)-th smallest).
    "q88_corpus_stats" -> ((s, dir) =>
      Curation.corpusStats(t(s, dir, "documents"), "lang", "doc_id", "text")),

    // Sketched corpus stats: q88 + the vocabulary axis, with the 100 TB
    // path (HLL++ distinct + mergeable quantile sketch — map-side
    // partials, no sort/distinct shuffle) accuracy-gated against the
    // exact legs: sketch_ok=1 iff HLL vocab is within 5% and sketched
    // percentiles within max(2, 5%) — a sketch regression flips the
    // column and fails the hash compare (q109's recall-gate shape).
    "q125_sketch_stats" -> ((s, dir) =>
      Curation.corpusStatsSketched(t(s, dir, "documents"), "lang", "doc_id", "text")),

    // Bloom-membership decontamination: q82's split with the eval
    // vocabulary shipped as a constant-size Bloom filter instead of a
    // broadcast set — build is one mergeable agg, probe is a map-side
    // codegen'd expression, no corpus-side join. bloom_ok pins the
    // no-false-negative guarantee per doc, fp_ok pins the corpus-wide
    // FP rate within the sizing bound; both replayed as literal 1s.
    "q126_decontaminate_bloom" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Curation.decontaminateBloom(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", k = 3)
    }),

    // PRODUCTION sketch stats (round 10): the benched form of q125 —
    // sketch aggregations only (count/sum + quantile sketch + HLL), no
    // rank window, no DISTINCT shuffle. Sketch outputs aren't DuckDB-
    // reproducible, so this entry carries the driver's rows-only check;
    // accuracy is oracle-gated by q125 (verify-only), whose sketch_ok
    // column fails the hash compare if either sketch drifts its bound.
    "q134_sketch_stats_prod" -> ((s, dir) =>
      Curation.corpusStatsSketchOnly(
        t(s, dir, "documents"), "lang", "doc_id", "text")),

    // PRODUCTION Bloom decontamination (round 10): the benched form of
    // q126 — build the eval-vocabulary Bloom sketch, probe the corpus
    // map-side, emit (doc_id, n_bloom_hits, flagged). No exact legs,
    // no audit joins; rows-only driver check (flags include the
    // bounded FP superset), with q126 as the verify-only oracle twin
    // pinning no-false-negatives and the corpus-wide FP rate.
    "q135_bloom_prod" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Curation.decontaminateBloomProbeOnly(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", k = 3)
    }),

    // Leakage-free split: q37's near-dup clusters are hashed to
    // train/val/test AS UNITS (90/5/5 in 1/256ths), so no near-dup
    // pair can straddle the held-out boundary.
    "q95_cluster_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.jaccardPairsNative(
        docs, "doc_id", "text", k = 3, num = 1, den = 2, maxShingleFreq = ShingleCap)
      Curation.leakageFreeSplit(
        Components.dedupClusters(docs.select(col("doc_id").as("id")), pairs))
    }),

    // Exact-substring repetition: per-doc mass of 40-char windows that
    // occur more than once corpus-wide (the Lee et al. repeated-span
    // contamination pass), via the native window-hash kernel.
    "q96_exact_substr" -> ((s, dir) =>
      Dedup.exactSubstrRepeats(t(s, dir, "documents"), "doc_id", "text", width = 40)),

    // Repeated-span trim: q96's repeated windows merged into maximal
    // character spans (gaps-and-islands per doc) — the metrics of the
    // span-cut rewrite the exact-substring pass exists to drive.
    "q97_repeated_spans" -> ((s, dir) =>
      Dedup.repeatedSpanTrim(t(s, dir, "documents"), "doc_id", "text", width = 40)),

    // Winnowed exact-substring — q96's 100 TB scale path as a real
    // operator: content-defined fingerprint sampling (leftmost-argmin
    // per stride-window of rolling hashes) cuts the exploded row
    // stream ~stride×, with the winnowing guarantee that every repeat
    // of length ≥ width+stride−1 is still detected. stride=20 =
    // width/2, the documented scale setting.
    "q106_exact_substr_strided" -> ((s, dir) =>
      Dedup.exactSubstrRepeatsStrided(t(s, dir, "documents"), "doc_id", "text",
        width = 40, stride = 20)),

    // End-to-end curation capstone: exact dedup → Gopher filter →
    // decontamination → content-hash split → train shard packing, as
    // one composed DAG. Each stage is individually oracle-gated
    // (q30/q100/q82/q95/q86); this gates their composition.
    "q102_curation_pipeline" -> ((s, dir) =>
      Curation.curationPipeline(t(s, dir, "documents"), "doc_id", "text",
        tokensPerShard = 16384L)),

    // Incremental connected components: the CC member of the delta
    // family (q85 text / q93 embeddings / q99 substrings). Pairs are
    // computed once over the full corpus (q37's exact call) and split
    // by the q85 batch convention (doc_id % 7 = 0 is the new batch):
    // the standing labels come from the full contraction over
    // standing-only pairs, then the batch's ids and incident pairs
    // are FOLDED in via Components.dedupClustersDelta — touching only
    // the components the batch's edges reach. The oracle is q37's
    // full recursive-CTE CC over the UNION edge set, so a green row
    // proves delta fold ≡ full recompute.
    //
    // COST-MODEL NOTE (do not misread the bench number): q103's timed
    // seconds include the pair pipeline + the FULL standing
    // contraction, re-derived here only so the oracle can replay the
    // fold. The production incremental cost is the FOLD ALONE
    // (Components.fusedDeltaRelabel — one broadcast-restricted probe
    // + one fused single-task job per batch), measured flat per batch
    // by tools/DedupGateBench and pinned as the "q103 fold-only" row
    // in BASELINE.md next to this query's end-to-end number.
    "q103_dedup_clusters_delta" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.jaccardPairsNative(
          docs, "doc_id", "text", k = 3, num = 1, den = 2, maxShingleFreq = ShingleCap)
        .localCheckpoint() // consumed twice: standing/delta split
      val standingPairs = pairs.filter(col("id_a") % 7 =!= 0 && col("id_b") % 7 =!= 0)
      val deltaPairs = pairs.filter(col("id_a") % 7 === 0 || col("id_b") % 7 === 0)
      val standingLabels = Components.dedupClusters(
        docs.filter(col("doc_id") % 7 =!= 0).select(col("doc_id").as("id")),
        standingPairs)
        .localCheckpoint() // consumed twice (fold probe + final output
      // join); un-checkpointed, each consumer job re-executes the
      // serial single-task union-find stage (round 16)
      Components.dedupClustersDelta(
        standingLabels,
        docs.filter(col("doc_id") % 7 === 0).select(col("doc_id").as("id")),
        deltaPairs)
    }),

    // Text ingest-gate replay, oracle-gated END TO END: the corpus is
    // split into an initial corpus (doc_id%4=0) and three ordered
    // micro-batches (%4=1,2,3) replayed synchronously through
    // Streams.DedupGate — the operator a production ingest pipeline
    // actually runs. Output: each streamed doc's DECISION (accepted /
    // rejected with the gate's reason) plus its maintained CLUSTER
    // label. compactEvery=2 forces an LSM compaction (corpus, index,
    // labels, remap reset) mid-replay, so the oracle also proves the
    // fold-forward state survives compaction. The DuckDB twin replays
    // the same three folds as an unrolled CTE chain over the q85/q32
    // band-key reconstruction and labels clusters with the q37
    // recursive CTE over exactly the pairs the gate discovers.
    "q104_gate_replay" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val g1 = graft.streaming.Streams.newDedupGate(
        docs.filter(col("doc_id") % 4 === 0), "doc_id", "text", compactEvery = 2)
      (1 to 2).foreach(i => g1.ingest(docs.filter(col("doc_id") % 4 === i)))
      // RESTART leg (round-9): fold 2 fires the compactEvery=2 LSM
      // compaction; the gate is then persisted (ManifestStore CAS) and
      // a FRESH gate resumed from the committed manifest finishes the
      // replay — the oracle below is unchanged, so a green row proves
      // kill-after-compaction + restore is decision-identical to the
      // uninterrupted fold (the durable-gate contract, spec-pinned in
      // GatePersistenceSpec at every other kill point).
      val gate = withGateStore(s) { store =>
        g1.persist(store)
        // the abandoned pre-restart gate's checkpoints are released —
        // the resumed gate re-materializes from the store's parquet,
        // so nothing it holds references g1's blocks
        g1.release()
        graft.streaming.Streams.resumeDedupGate(store, "doc_id", "text", compactEvery = 2)
      }
      gate.ingest(docs.filter(col("doc_id") % 4 === 3))
      docs.filter(col("doc_id") % 4 =!= 0)
        .select(col("doc_id"), (col("doc_id") % 4).as("batch"))
        .join(gate.rejected.select(col("id").as("doc_id"), col("reason")),
          Seq("doc_id"), "left")
        .join(gate.clustersNow, Seq("doc_id"))
        .select(col("doc_id"), col("batch"),
          coalesce(col("reason"), lit("accepted")).as("status"),
          col("component_id"))
    }),

    // Embedding ingest-gate replay: the vector-modality twin of q104 —
    // vec_id%4=0 seeds the standing signature index, %4=1,2,3 stream
    // through Streams.EmbeddingDedupGate. targetBucket is pinned huge
    // so auto-B stays at its floor (B=4) for the whole replay and the
    // oracle can reconstruct one fixed signature per vector (B growth
    // itself is spec+bench-covered: EmbeddingGateSpec live rebuild).
    "q105_embedding_gate_replay" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val g1 = graft.streaming.Streams.newEmbeddingDedupGate(
        emb.filter(col("vec_id") % 4 === 0), "vec_id", "embedding",
        dim = 64, threshold = 0.30, targetBucket = 1L << 40, compactEvery = 2)
      (1 to 2).foreach(i => g1.ingest(emb.filter(col("vec_id") % 4 === i)))
      // RESTART leg (round-9, as q104/q114/q119): persist after the
      // fold-2 compaction, resume a fresh gate for fold 3 — unchanged
      // oracle, so a green row proves the signature index + plane
      // count + labels restore decision-identical.
      val gate = withGateStore(s) { store =>
        g1.persist(store)
        g1.release()
        graft.streaming.Streams.resumeEmbeddingDedupGate(store, "vec_id", "embedding",
          dim = 64, threshold = 0.30, targetBucket = 1L << 40, compactEvery = 2)
      }
      gate.ingest(emb.filter(col("vec_id") % 4 === 3))
      emb.filter(col("vec_id") % 4 =!= 0)
        .select(col("vec_id"), (col("vec_id") % 4).as("batch"))
        .join(gate.rejected.select(col("id").as("vec_id"), col("reason")),
          Seq("vec_id"), "left")
        .join(gate.clustersNow.withColumnRenamed("doc_id", "vec_id"), Seq("vec_id"))
        .select(col("vec_id"), col("batch"),
          coalesce(col("reason"), lit("accepted")).as("status"),
          col("component_id"))
    }),

    // Incremental curation — the delta-family capstone: the doc_id%7=0
    // batch flows through the q102 stages against STANDING state with
    // append-stream semantics (standing digests win exact dedup; kept
    // train docs pack CONTINUING from the standing cumulative token
    // total, so a batch doc may share the standing tail shard). The
    // standing side contributes one digest-index probe and one carried
    // scalar — O(delta) in production.
    "q111_curation_delta" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 97 =!= 0)
      Curation.curationPipelineDelta(
        standing = corpus.filter(col("doc_id") % 7 =!= 0),
        delta = corpus.filter(col("doc_id") % 7 === 0),
        evalSet = docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", tokensPerShard = 16384L)
    }),

    // Gopher rule battery: the published heuristic quality filter
    // (word count / mean word length / symbol ratio / stopword
    // presence / alpha-word ratio) as per-rule flags + keep, exact
    // integer fixed-point.
    "q100_gopher_rules" -> ((s, dir) =>
      TextAnalysis.gopherRules(t(s, dir, "documents"), "doc_id", "text")),

    // Incremental exact-substring: the doc_id%7=0 batch's windows vs
    // the standing corpus's window-multiplicity index + within-batch
    // repeats — the substring member of the delta family (q85/q93).
    // Result-identical to q96 over the union restricted to the delta.
    "q99_exact_substr_delta" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.exactSubstrDeltaRepeats(
        docs.filter(col("doc_id") % 7 =!= 0),
        docs.filter(col("doc_id") % 7 === 0),
        "doc_id", "text", width = 40)
    }),

    // Fuzzy decontamination: corpus docs within 0.3 Jaccard of any
    // eval doc, via eval-as-broadcast-delta banded MinHash — the
    // paraphrase-robust complement of q82's exact collision. The
    // synthetic corpus has no organic eval overlap at this SF, so the
    // eval set is constructed as PERTURBED COPIES of every 83rd corpus
    // doc (suffix-appended, ids negated — disjoint from any
    // non-negative corpus id at any SF) — mirrored in the oracle, as
    // with q89's PII injection — making the flag path non-vacuous:
    // each source doc (and any of its near-dups) must be caught.
    "q98_decontaminate_fuzzy" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val evalSet = docs.filter(col("doc_id") % 83 === 0)
        .select((-col("doc_id") - 1L).as("doc_id"),
          concat(col("text"), lit(" heldout eval variant marker")).as("text"))
      Curation.decontaminateFuzzy(docs, evalSet, "doc_id", "text")
    }),

    // SEMANTIC decontamination (round-9): the embedding-space third
    // leg next to q82 (exact collision) and q98 (lexical fuzzy) —
    // corpus vectors within 0.45 cosine of any eval vector, via the
    // q93 LSH bucket join with the eval set as the broadcast delta.
    // The eval set is injected paraphrase twins of every 83rd corpus
    // vector (ids negated; component 0 NEGATED — an exact FP-safe
    // perturbation with cosine ≈ 1 − 2v₀²/‖v‖² ≈ 0.97, mirrored
    // bit-for-bit by the oracle), making the flag path non-vacuous.
    "q117_decontaminate_semantic" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val evalEmb = emb.filter(col("vec_id") % 83 === 0)
        .select((-col("vec_id") - 1L).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === 0, -x).otherwise(x)).as("embedding"))
      Curation.decontaminateSemantic(emb, evalEmb, "vec_id", "embedding",
        dim = 64, threshold = 0.45)
    }),

    // Multimodal binary pipeline: text → binary blob → stub decode →
    // per-frame digests, via typed Dataset mapPartitions.
    "q50_media_features" -> ((s, dir) => {
      Media.extractFeatures(Media.asMedia(t(s, dir, "documents"), "doc_id", "text"))
        .toDF()
        .select("doc_id", "n_bytes", "n_frames", "frame_digest", "width", "height")
    }),

    // Frame sampling: every 4th fixed-size frame, digested — the
    // mapPartitions flatMap shape of a video frame-sample pass.
    "q51_media_frames" -> ((s, dir) => {
      Media.sampleFrames(Media.asMedia(t(s, dir, "documents"), "doc_id", "text"), every = 4)
        .toDF().select("doc_id", "frame_idx", "frame_md5")
    }),

    // REAL media decode: documents → deterministic P6 (binary PPM)
    // blobs → the real header parser → dimensions + pixel digest. The
    // oracle derives the expected dimensions from octet_length and the
    // expected digest from the cycled byte stream (md5 over DuckDB's
    // hex(BLOB) form), proving the parser recovers exactly what the
    // encoder wrote.
    "q107_media_decode" -> ((s, dir) =>
      Media.decodePpm(Media.asPpm(t(s, dir, "documents"), "doc_id", "text"))
        .toDF()
        .select("doc_id", "width", "height", "n_pixel_bytes", "pixel_md5")),

    // VIDEO decode (the third real container): YUV4MPEG2 — stream
    // header parse (W/H/C params, Cmono plane sizing) + FRAME-marker
    // walk slicing one luma plane per frame; the oracle proves
    // decode∘encode recovers dimensions, frame count, and the exact
    // concatenated plane bytes (hex-space md5, the q107 discipline).
    "q128_video_decode" -> ((s, dir) =>
      Media.decodeY4m(Media.asY4m(t(s, dir, "documents"), "doc_id", "text"))
        .toDF()
        .select("doc_id", "width", "height", "n_frames", "luma_md5")),

    // Cross-video near-dup FRAMES: per-frame aHash over the decoded
    // luma planes through the SHARED pigeonhole engine ((doc,frame)
    // packed into one key — nf < 8 — so image/audio/video ride one
    // band layout). Twins keep the flag path non-vacuous: exact copies
    // (id+4000004, every frame hamming 0) and '~~~'-perturbed copies
    // (id+5000005, length-preserving, so only the frames whose cycled
    // byte ranges cover positions 0-2 change — the rest stay exact).
    "q129_video_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val exactTwins = docs.filter(col("doc_id") % 67 === 0)
        .select((col("doc_id") + 4000004L).as("doc_id"), col("text"))
      val nearTwins = docs.filter(col("doc_id") % 61 === 0 &&
          octet_length(col("text")) === length(col("text")) &&
          length(col("text")) >= 300)
        .select((col("doc_id") + 5000005L).as("doc_id"),
          expr("concat('~~~', substring(text, 4))").as("text"))
      Media.videoNearDupFramePairs(Media.asY4m(
        docs.select("doc_id", "text")
          .unionByName(exactTwins).unionByName(nearTwins),
        "doc_id", "text"))
    }),

    // COMPRESSED video (round 11): MJPEG-in-AVI — a real RIFF chunk
    // walk (avih/strh/strf cross-checked against the stream, 'movi'
    // list, word-aligned '00dc' frames) where every frame is a
    // complete JPEG, alternating baseline and PROGRESSIVE framing per
    // frame index. Frame f encodes the source rotated by 13·f, so the
    // oracle rebuilds each frame's lossy raster from the q139 DC-only
    // closed form at a per-frame offset — the entropy bits (two
    // framings of them) never need an oracle, only what they decode to.
    "q150_avi_decode" -> ((s, dir) =>
      Media.decodeAvi(Media.asAvi(t(s, dir, "documents"), "doc_id", "text"))
        .toDF()
        .select("doc_id", "width", "height", "n_frames", "luma_md5")),

    // Cross-video frame near-dup THROUGH the compressed container:
    // RIFF walk → per-frame JPEG decode → frame aHash → the shared
    // pigeonhole engine (q129's contract on MJPEG). Exact twins
    // (+10000010, %67) share every frame at hamming 0; '~~~' twins
    // (+11000011, %61, length-preserving) shift a few block DCs —
    // mostly absorbed, the perceptual point.
    "q151_avi_frame_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val exactTwins = docs.filter(col("doc_id") % 67 === 0)
        .select((col("doc_id") + 10000010L).as("doc_id"), col("text"))
      val nearTwins = docs.filter(col("doc_id") % 61 === 0 &&
          octet_length(col("text")) === length(col("text")) &&
          length(col("text")) >= 300)
        .select((col("doc_id") + 11000011L).as("doc_id"),
          expr("concat('~~~', substring(text, 4))").as("text"))
      Media.aviNearDupFramePairs(Media.asAvi(
        docs.select("doc_id", "text")
          .unionByName(exactTwins).unionByName(nearTwins),
        "doc_id", "text"))
    }),

    // COMPRESSED-container decode (round 10): documents → real PNG
    // blobs (zlib DEFLATE IDAT, per-scanline filters cycling all five
    // types, CRC32 chunk framing) → the real parser (CRC-verified
    // chunk walk, inflate, filter reconstruction) → dimensions +
    // decoded-pixel digest. The encoder cycles the same byte payload
    // into the same dimension formula as PPM, so the oracle rebuilds
    // the DECODED raster from octet_length + the cycled hex stream —
    // proving decode ∘ encode is the identity THROUGH a genuine
    // compressed encoding (the compressed bytes themselves need no
    // oracle: only what they decode to does).
    "q132_png_decode" -> ((s, dir) =>
      Media.decodePng(Media.asPng(t(s, dir, "documents"), "doc_id", "text"))
        .toDF()
        .select("doc_id", "width", "height", "n_pixel_bytes", "pixel_md5")),

    // Perceptual near-dup over the COMPRESSED container: inflate →
    // defilter → the exact q120 aHash kernel → the shared pigeonhole
    // band engine. Same twin injections as q120, and — because the
    // decoded pixels are identical to the PPM path's — the same
    // pairs: container format and perceptual dedup are orthogonal.
    "q133_png_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val exactTwins = docs.filter(col("doc_id") % 67 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val nearTwins = docs.filter(col("doc_id") % 61 === 0 &&
          octet_length(col("text")) === length(col("text")) &&
          length(col("text")) >= 300)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          expr("concat('~~~', substring(text, 4))").as("text"))
      Media.pngNearDupPairs(Media.asPng(
        docs.select("doc_id", "text")
          .unionByName(exactTwins).unionByName(nearTwins),
        "doc_id", "text"))
    }),

    // LOSSY compressed container (round 10): documents → real baseline
    // JPEG (standard Annex-K Huffman tables, byte-stuffed entropy
    // coding, flat quant 16, DC-only blocks) → the real decoder
    // (marker walk, canonical Huffman decode, zigzag dequantization,
    // 2-D IDCT, clamp) → dimensions + decoded-raster digest. Unlike
    // PNG (q132), decode ∘ encode is NOT the identity — JPEG is lossy
    // — but the DC-only stream's decoded raster is CLOSED-FORM (every
    // pixel of block b is 2·trunc(S_b/128) + 128 with S_b the block's
    // level-shifted sum), so the oracle rebuilds the LOSSY result from
    // the cycled source bytes and pins the entire entropy-decode →
    // dequant → IDCT chain without ever seeing a Huffman bit.
    "q139_jpeg_decode" -> ((s, dir) =>
      Media.decodeJpeg(Media.asJpeg(t(s, dir, "documents"), "doc_id", "text"))
        .toDF()
        .select("doc_id", "width", "height", "n_pixel_bytes", "pixel_md5")),

    // PROGRESSIVE JPEG (round 11): the corpus arrives half baseline
    // (SOF0), half progressive (SOF2, by doc_id parity) — the
    // dominant real-world JPEG form a crawl corpus is mostly made of.
    // Progressive re-frames the same DC-only quantized values across
    // successive-approximation DC scans (Al = L mod 2 picks the
    // two-scan vs four-scan ladder) and EOB-run AC scans, with RSTn
    // markers threaded through every scan kind (ri = L mod 5) — so
    // the DECODED raster is framing-invariant and the q139 closed
    // form is the oracle for both halves at once. Any defect in the
    // multi-scan coefficient accumulation, the refinement bit
    // handling, or the EOB-run bookkeeping shifts a block's gray
    // level and breaks the digest.
    "q149_jpeg_progressive_decode" -> ((s, dir) =>
      Media.decodeJpeg(Media.asJpegMixed(t(s, dir, "documents"), "doc_id", "text"))
        .toDF()
        .select("doc_id", "width", "height", "n_pixel_bytes", "pixel_md5")),

    // HASH-GATED transcode (round 11): decode (mixed baseline +
    // progressive corpus) → DC-only re-encode at flat quant 32 →
    // re-decode through the validating parser → raster digest. The
    // input rasters are block-constant, so the DC-only re-encode is
    // EXACT (a constant block's forward DCT has only DC) and every
    // stage has a closed form: v2 = clamp(128 + 4·trunc((pv−128)/4))
    // on top of q139's pv — the whole decode→re-encode→re-decode
    // chain replays in SQL, closing the rows-only gap the float-DCT
    // transcodes (q147/q148, spec-gated) necessarily leave.
    "q152_jpeg_transcode_dc" -> ((s, dir) =>
      Media.transcodeJpegDc(
        Media.asJpegMixed(t(s, dir, "documents"), "doc_id", "text"), quant = 32)
        .toDF()
        .select("doc_id", "width", "height", "recoded_md5")),

    // HASH-GATED COLOR transcode (round 11, completing the q147/q148
    // closure): interleaved-MCU decode → DC-only 4:2:0 re-encode at
    // flat (32, 48) → validating re-decode → per-plane digests. The
    // decoded planes are block-constant, so the color round keeps a
    // closed form per plane (luma scale 4, chroma scale 6 on top of
    // q143's pv) and the WHOLE chain replays in SQL.
    "q155_jpeg_color_transcode_dc" -> ((s, dir) =>
      Media.transcodeJpegColorDc(
        Media.asJpegColor(t(s, dir, "documents"), "doc_id", "text"))
        .toDF()
        .select("doc_id", "width", "height", "cb_width", "cb_height",
          "y_md5", "cb_md5", "cr_md5")),

    // FOREIGN-ENCODER streams (round 12): the corpus blobs are encoded
    // by javax.imageio — the JDK's independent codec stack — and
    // decoded by THIS engine's validating parsers, breaking the
    // self-encoded-corpus circularity of q132/q139 with a full oracle:
    // PNG is lossless, so the q132 raster formula (and its SQL) apply
    // verbatim no matter what filters/DEFLATE framing the JDK picked.
    "q156_imageio_png_decode" -> ((s, dir) =>
      Media.decodePng(
        graft.ops.Interop.asImageIoPng(t(s, dir, "documents"), "doc_id", "text"))
        .toDF()
        .select("doc_id", "width", "height", "n_pixel_bytes", "pixel_md5")),

    // The LOSSY foreign-encoder leg: javax.imageio baseline JPEG at
    // compression quality 1.0 (all-ones quant tables) over BLOCK-
    // CONSTANT rasters — a constant block's forward DCT is exactly its
    // DC term and DC/1 quantizes losslessly, so the round is EXACT and
    // the oracle rebuilds the raster straight from the cycled source
    // bytes (the q139/q152 closed-form discipline, now with the JDK's
    // libjpeg-derived encoder on the other side of the stream).
    "q157_imageio_jpeg_decode" -> ((s, dir) =>
      Media.decodeJpeg(
        graft.ops.Interop.asImageIoJpeg(t(s, dir, "documents"), "doc_id", "text"))
        .toDF()
        .select("doc_id", "width", "height", "n_pixel_bytes", "pixel_md5")),

    // GZIP member-stream ingest (round 12): documents → multi-member
    // gzip (1 + l%3 members, optional header fields cycled so FEXTRA/
    // FNAME/FHCRC all occur in production data) → the full RFC 1952
    // member walk (header parse, raw-DEFLATE inflate, per-member
    // CRC32 + ISIZE trailer checks) → member count + decompressed
    // digest. decode ∘ encode is the identity on the text, so the
    // oracle needs only octet_length and the source bytes.
    // The AUDIO leg of the foreign-encoder family: the same corpus
    // envelope as q110 (identical PCM payload formulas, so q110's
    // oracle applies verbatim) but every container byte is written by
    // javax.sound.sampled — the JDK's independent RIFF/WAVE writer —
    // and parsed by this engine's strict binary-field validator.
    "q162_audiosystem_wav_decode" -> ((s, dir) =>
      Media.decodeWav(
        graft.ops.Interop.asAudioSystemWav(t(s, dir, "documents"), "doc_id", "text"))
        .toDF()
        .select("doc_id", "channels", "sample_rate", "n_samples", "pcm_md5")),

    "q158_gzip_decode" -> ((s, dir) =>
      graft.ops.GzipStream.decodeGzip(
        graft.ops.GzipStream.asGzip(t(s, dir, "documents"), "doc_id", "text"))
        .toDF()
        .select("doc_id", "n_members", "n_bytes", "text_md5")),

    // COMPOSED: compressed text straight into an existing curation
    // pipeline — gzip decompress map-side, then the full q100 Gopher
    // rule battery over the recovered text. The oracle is q100's SQL
    // verbatim: the container must be perfectly transparent to every
    // downstream text operator (the jsonl.gz-crawl ingest shape).
    "q159_gzip_gopher" -> ((s, dir) =>
      TextAnalysis.gopherRules(
        graft.ops.GzipStream.decompressText(
          graft.ops.GzipStream.asGzip(t(s, dir, "documents"), "doc_id", "text")),
        "doc_id", "text")),

    // WARC record walk (round 13): the crawl-corpus framing above the
    // gzip member stream — warcinfo + HTTP-enveloped response (+
    // metadata on even payloads) per document, decoded by the strict
    // ISO 28500 record walk (version line, mandatory headers,
    // Content-Length-bounded blocks, record separators) plus the
    // HTTP/1.1 envelope parse. decode ∘ encode is the identity, so
    // every feature column replays from the source text in closed
    // form (the q158 discipline).
    "q167_warc_decode" -> ((s, dir) =>
      graft.ops.WarcStream.decodeWarc(
        graft.ops.WarcStream.asWarc(t(s, dir, "documents"), "doc_id", "text"))
        .toDF()
        .select("doc_id", "n_records", "n_body_bytes", "text_md5")),

    // COMPOSED two-layer crawl unwrap: WARC response records whose
    // HTTP bodies are multi-member GZIP streams (the actual shape of
    // a compressed crawl capture) — record walk, then member walk,
    // then the full q100 Gopher battery over the recovered text. Both
    // containers must be perfectly transparent: the oracle is q100's
    // SQL verbatim (the q159 discipline, one layer deeper).
    "q168_warc_gzip_gopher" -> ((s, dir) =>
      TextAnalysis.gopherRules(
        graft.ops.WarcStream.warcGzipText(
          graft.ops.WarcStream.asWarcOver(
            graft.ops.GzipStream.asGzip(t(s, dir, "documents"), "doc_id", "text"))),
        "doc_id", "text")),

    // MULTI-RECORD WARC shards (round 14): the real crawl shape — one
    // WARC file per ~100 documents, one warcinfo + per-document
    // response (+ parity metadata) records — exploded back to ONE ROW
    // PER RESPONSE RECORD with capture identity from WARC-Record-ID.
    // n_shard_records is the whole stream's validated count repeated
    // on every capture row, so the oracle's window sum proves the
    // record walk saw the entire shard, not just the captures it kept.
    "q172_warc_shard_docs" -> ((s, dir) =>
      graft.ops.WarcStream.decodeWarcCaptures(
        graft.ops.WarcStream.asWarcShards(t(s, dir, "documents"), "doc_id", "text", 100))
        .toDF()
        .select("doc_id", "shard_id", "n_shard_records", "n_body_bytes", "text_md5")),

    // WARC REVISIT records (round 14): the crawl world's native dedup
    // — a re-crawled unchanged page stores NO payload, only a
    // WARC-Refers-To pointer at the original capture (ISO 28500
    // revisit, identical-payload-digest profile). Every %67 doc is
    // "re-crawled" at +1000001 as a revisit record; the +1000001
    // offset lands re-crawls in DIFFERENT shards than their
    // originals, so resolution exercises the cross-shard equi-join
    // (revisit rows probe the response-capture table), never an
    // in-stream lookup. Closed form: a revisit's canonical id and
    // resolved digest are its source row's.
    "q178_warc_revisit_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val base = docs.withColumn("revisit_of", lit(null).cast("long"))
      val recrawls = docs.filter(col("doc_id") % 67 === 0)
        .select((col("doc_id") + 1000001L).as("doc_id"), col("text"),
          col("doc_id").as("revisit_of"))
      graft.ops.WarcStream.warcRevisitDocs(
        graft.ops.WarcStream.asWarcShardsWithRevisits(
          base.unionByName(recrawls), "doc_id", "text", "revisit_of", 100))
    }),

    // HTTP envelope realism (round 14): captures cycle Content-
    // Encoding: gzip (the q158 member walk composed under the
    // envelope), Transfer-Encoding: chunked (strict chunk-size walk),
    // and both, by doc_id % 4. Every coding is transparent to the
    // recovered payload, so the q167 identity-envelope oracle is THIS
    // oracle verbatim (the q159 discipline on the envelope axis).
    "q174_warc_http_encodings" -> ((s, dir) =>
      graft.ops.WarcStream.decodeWarc(
        graft.ops.WarcStream.asWarcEnveloped(t(s, dir, "documents"), "doc_id", "text"))
        .toDF()
        .select("doc_id", "n_records", "n_body_bytes", "text_md5")),

    // QUARANTINE ingest (round 12): all eight containers (doc_id % 8
    // split) with GUARANTEED-REJECT corruption injected — half
    // truncation (doc_id % 11: every container's decoder validates a
    // total the cut falsifies — RIFF/PNG-IEND/EOI/STREAMINFO/frame
    // counts/CRC trailers), magic smash (% 13: sniff itself rejects),
    // and sub-sniff truncation (% 17: blob shorter than any magic).
    // gzip's truncation cuts INSIDE the final member trailer instead
    // of at half (a half-cut could in principle land exactly on a
    // member boundary and decode clean — the one container where
    // "half" is not provably fatal). Clean rows must aggregate with
    // their decoded unit counts; corrupt rows must quarantine — the
    // fail-loudly fuzz property, oracle-gated (ingest reality: some
    // fraction of a crawl is garbage and the pipeline must neither
    // crash nor silently absorb it).
    "q161_quarantine_ingest" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      def slot(r: Int) = docs.filter(col("doc_id") % 8 === r)
      val blobs = Media.asPpm(slot(0), "doc_id", "text")
        .unionByName(Media.asPng(slot(1), "doc_id", "text"))
        .unionByName(Media.asJpegMixed(slot(2), "doc_id", "text"))
        .unionByName(Media.asWav(slot(3), "doc_id", "text"))
        .unionByName(Media.asFlac(slot(4), "doc_id", "text"))
        .unionByName(Media.asY4m(slot(5), "doc_id", "text"))
        .unionByName(Media.asAvi(slot(6), "doc_id", "text"))
        .unionByName(graft.ops.GzipStream.asGzip(slot(7), "doc_id", "text"))
      import s.implicits._
      val corrupted = blobs.map { r =>
        val b = r.content
        val m =
          if (r.doc_id % 11 == 0) {
            val cut = if (r.doc_id % 8 == 7) math.max(1, b.length - 5)
              else math.max(1, b.length / 2)
            java.util.Arrays.copyOf(b, cut)
          } else if (r.doc_id % 13 == 0) {
            val c = b.clone(); c(0) = 0xDE.toByte; c(1) = 0xAD.toByte; c
          } else if (r.doc_id % 17 == 0) {
            java.util.Arrays.copyOf(b, math.min(b.length, 7))
          } else b
        graft.ops.MediaRow(r.doc_id, r.media_type, m)
      }
      Media.quarantineDecode(corrupted)
    }),

    // SHIFT-TOLERANT audio near-dup (round 13): winnowed envelope
    // anchoring — content-defined fingerprints over the frame-|PCM|
    // sequence, so a copy of the same audio time-shifted by whole
    // frames still collides (the q122 fixed-64-block hash is
    // offset-sensitive by construction and misses exactly these;
    // AudioWinnowSpec pins the contrast). Twins: docs with a
    // ≥256-byte tail-cycle get a 96-value-shifted WAV copy at
    // id+8000008 — offset ≢ 0 mod the q122 block size.
    "q170_audio_winnow" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val twins = docs.filter(octet_length(col("text")) % 512 >= 256)
        .select((col("doc_id") + 8000008L).as("doc_id"), col("text"))
      val shifted = Media.asWav(twins, "doc_id", "text")
        .map(r => graft.ops.MediaRow(r.doc_id, r.media_type,
          graft.ops.AudioWinnow.shiftWav(r.content, 96)))
      graft.ops.AudioWinnow.winnowPairs(
        Media.asWav(docs, "doc_id", "text").unionByName(shifted))
    }),

    // The delta twin: the shifted copies arrive as a batch probing the
    // STANDING corpus's winnowed-fingerprint index (standing audio
    // never rescanned) — result-identical to q170 restricted to pairs
    // with a delta member (the q121/q123 delta discipline).
    "q171_audio_winnow_delta" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val twins = docs.filter(octet_length(col("text")) % 512 >= 256)
        .select((col("doc_id") + 8000008L).as("doc_id"), col("text"))
      val shifted = Media.asWav(twins, "doc_id", "text")
        .map(r => graft.ops.MediaRow(r.doc_id, r.media_type,
          graft.ops.AudioWinnow.shiftWav(r.content, 96)))
      graft.ops.AudioWinnow.winnowDeltaPairs(
        Media.asWav(docs, "doc_id", "text"), shifted)
    }),

    // SUB-FRAME shift tolerance (round 14): q170's frame grid is
    // position-free only for shifts ≡ 0 mod 32 samples; here segment
    // BOUNDARIES are content-defined at SAMPLE granularity (landmark
    // samples, the LBFS content-defined-chunking discipline), so a
    // copy shifted by ANY whole number of samples — 7 here, which
    // BOTH q122's fixed blocks and q170's frame grid miss — keeps
    // every interior segment sum and collides. Prepended silence adds
    // no landmarks and no |amplitude|, so the shifted twin's segment
    // sequence IS the base's — the oracle copies base segments to the
    // twin id and replays the identical hash/winnow/pair chain.
    "q176_audio_winnow_subframe" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val twins = docs.filter(octet_length(col("text")) % 512 >= 256)
        .select((col("doc_id") + 9000009L).as("doc_id"), col("text"))
      val shifted = Media.asWav(twins, "doc_id", "text")
        .map(r => graft.ops.MediaRow(r.doc_id, r.media_type,
          graft.ops.AudioWinnow.shiftWavAny(r.content, 7)))
      graft.ops.AudioWinnow.winnowSamplePairs(
        Media.asWav(docs, "doc_id", "text").unionByName(shifted))
    }),

    // Perceptual near-dup THROUGH the lossy container: entropy decode
    // → IDCT → gray aHash → the shared pigeonhole band engine. Exact
    // twins (id+6000006, parity-preserving: same framing) survive at
    // hamming 0 (same bytes ⇒ same lossy raster); '~~~'-perturbed
    // twins (id+7000007, parity-FLIPPING: every near pair crosses the
    // baseline↔progressive framing boundary) shift a few block DCs by
    // ≤2 gray levels — mostly absorbed by the perceptual hash, which
    // is the point of hashing DECODED pixels, not container bytes.
    // Round 11: the corpus is MIXED-framing (asJpegMixed) — the
    // oracle is unchanged because decoded rasters are
    // framing-invariant, so one green row now drives near-dup through
    // BOTH entropy layouts.
    "q140_jpeg_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val exactTwins = docs.filter(col("doc_id") % 67 === 0)
        .select((col("doc_id") + 6000006L).as("doc_id"), col("text"))
      val nearTwins = docs.filter(col("doc_id") % 61 === 0 &&
          octet_length(col("text")) === length(col("text")) &&
          length(col("text")) >= 300)
        .select((col("doc_id") + 7000007L).as("doc_id"),
          expr("concat('~~~', substring(text, 4))").as("text"))
      Media.jpegNearDupPairs(Media.asJpegMixed(
        docs.select("doc_id", "text")
          .unionByName(exactTwins).unionByName(nearTwins),
        "doc_id", "text"))
    }),

    // COMPRESSED-audio container (round 10, completing the codec trio
    // next to PNG and JPEG): documents → real FLAC streams (Rice-coded
    // FIXED/VERBATIM/CONSTANT subframes, CRC-8/CRC-16 framing, PCM MD5
    // in STREAMINFO) → the real fixed-predictor-subset parser →
    // channels/rate/sample-count + decoded-PCM digest. FLAC is
    // LOSSLESS and the encoder reuses the WAV path's channel/rate/
    // count/payload formulas, so the q110 oracle IS the FLAC oracle:
    // DuckDB never sees a Rice bit, only what it must decode to.
    "q141_flac_decode" -> ((s, dir) =>
      Media.decodeFlac(Media.asFlac(t(s, dir, "documents"), "doc_id", "text"))
        .toDF()
        .select("doc_id", "channels", "sample_rate", "n_samples", "pcm_md5")),

    // Perceptual audio near-dup THROUGH the compressed container:
    // Rice decode → fixed-predictor reconstruction → envelope hash →
    // the shared pigeonhole band engine. Same twins as q122, and —
    // because the decoded PCM is bit-identical to the WAV path's —
    // the same pairs: container format and perceptual dedup stay
    // orthogonal on the audio axis too.
    "q142_flac_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val exactTwins = docs.filter(col("doc_id") % 67 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val nearTwins = docs.filter(col("doc_id") % 61 === 0 &&
          octet_length(col("text")) === length(col("text")) &&
          length(col("text")) >= 300)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          expr("concat('~~~', substring(text, 4))").as("text"))
      Media.flacNearDupPairs(Media.asFlac(
        docs.select("doc_id", "text")
          .unionByName(exactTwins).unionByName(nearTwins),
        "doc_id", "text"))
    }),

    // COLOR JPEG (round 10): 3-component YCbCr with 4:2:0 chroma
    // subsampling and interleaved MCUs — the scan structure real-world
    // JPEGs actually use (2×2 luma + Cb + Cr blocks per MCU, separate
    // quant + standard-chrominance Huffman tables, per-component DC
    // predictors). The decoder emits each plane at its NATURAL
    // subsampled resolution; per-plane DC-only closed forms (luma
    // 2·trunc(S/128)+128, chroma 3·trunc(S/192)+128 over phase-shifted
    // cycled bytes) let the oracle rebuild all three lossy planes.
    "q143_jpeg_color_decode" -> ((s, dir) =>
      Media.decodeJpegColor(Media.asJpegColor(t(s, dir, "documents"), "doc_id", "text"))
        .toDF()
        .select("doc_id", "width", "height", "cb_width", "cb_height",
          "y_md5", "cb_md5", "cr_md5")),

    // Perceptual near-dup over the COLOR container: interleaved-MCU
    // decode → LUMA aHash (chroma adds nothing a 64-bit 8×8-cell hash
    // can see) → the shared pigeonhole band engine. The oracle replays
    // the luma closed form at the color path's 16-multiple dimensions.
    "q144_jpeg_color_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val exactTwins = docs.filter(col("doc_id") % 67 === 0)
        .select((col("doc_id") + 8000008L).as("doc_id"), col("text"))
      val nearTwins = docs.filter(col("doc_id") % 61 === 0 &&
          octet_length(col("text")) === length(col("text")) &&
          length(col("text")) >= 300)
        .select((col("doc_id") + 9000009L).as("doc_id"),
          expr("concat('~~~', substring(text, 4))").as("text"))
      Media.jpegColorNearDupPairs(Media.asJpegColor(
        docs.select("doc_id", "text")
          .unionByName(exactTwins).unionByName(nearTwins),
        "doc_id", "text"))
    }),

    // JPEG TRANSCODE (round 10, rows-only like q134/q135): decode →
    // FULL re-encode (forward DCT, quality-scaled Annex-K quant,
    // run-length AC) at q35 → decode through the validating parser →
    // sizes + integer PSNR. The float DCT is not SQL-replayable, so
    // correctness rides the spec (exact block-constant round-trip at
    // q95, PSNR floor, monotone quality) and the in-query invariants
    // (the re-decoded dims must match, enforced inside the operator);
    // the driver records the rows-only check.
    "q147_jpeg_transcode" -> ((s, dir) =>
      Media.transcodeJpeg(
        Media.asJpeg(t(s, dir, "documents"), "doc_id", "text"), quality = 35)
        .toDF()
        .select("doc_id", "width", "height", "n_orig_bytes",
          "n_recoded_bytes", "psnr_permille")),

    // Color transcode (rows-only, the q147 discipline on the YCbCr
    // path): interleaved-MCU decode → FULL 4:2:0 re-encode (K.1/K.2
    // quality-scaled tables, chroma at natural half resolution) →
    // validating re-decode → sizes + PSNR over all three planes.
    "q148_jpeg_color_transcode" -> ((s, dir) =>
      Media.transcodeJpegColor(
        Media.asJpegColor(t(s, dir, "documents"), "doc_id", "text"), quality = 35)
        .toDF()
        .select("doc_id", "width", "height", "n_orig_bytes",
          "n_recoded_bytes", "psnr_permille")),

    // MIXED-container ingest (round 10): the corpus arrives half PPM,
    // half PNG (by doc_id parity), with BOTH twin offsets odd
    // (+1000001 exact, +2000001 near) so every twin lands on the
    // OPPOSITE parity — each twin pair crosses containers and only
    // magic-byte dispatch + decode can find it. One hash pipeline
    // over untrusted container bytes: the real ingest shape, where
    // content-type metadata lies and the bytes decide.
    "q146_container_sniff_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val exactTwins = docs.filter(col("doc_id") % 67 === 0)
        .select((col("doc_id") + 1000001L).as("doc_id"), col("text"))
      val nearTwins = docs.filter(col("doc_id") % 61 === 0 &&
          octet_length(col("text")) === length(col("text")) &&
          length(col("text")) >= 300)
        .select((col("doc_id") + 2000001L).as("doc_id"),
          expr("concat('~~~', substring(text, 4))").as("text"))
      val aug = docs.select("doc_id", "text")
        .unionByName(exactTwins).unionByName(nearTwins)
      val asMixed = Media.asPpm(aug.filter(col("doc_id") % 2 === 0), "doc_id", "text")
        .unionByName(Media.asPng(aug.filter(col("doc_id") % 2 =!= 0), "doc_id", "text"))
      Media.autoNearDupPairs(asMixed)
    }),

    // CRAWL-WRAPPER near-dup (round 14): q146's mixed PPM/PNG corpus,
    // but every TWIN arrives as a WARC capture of its container bytes
    // (the crawl shape: media responses inside WARC records). The
    // mixed hash re-sniffs each capture's HTTP payload by magic and
    // routes it into the IMAGE hash space, so a crawl capture of a
    // PNG flags against the standalone form — pairs are pixel-decided
    // and the q146/q120 oracle is THIS oracle verbatim (the wrapper,
    // like the containers, is transparent).
    "q173_warc_media_route" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val exactTwins = docs.filter(col("doc_id") % 67 === 0)
        .select((col("doc_id") + 1000001L).as("doc_id"), col("text"))
      val nearTwins = docs.filter(col("doc_id") % 61 === 0 &&
          octet_length(col("text")) === length(col("text")) &&
          length(col("text")) >= 300)
        .select((col("doc_id") + 2000001L).as("doc_id"),
          expr("concat('~~~', substring(text, 4))").as("text"))
      val base = docs.select("doc_id", "text")
      def containers(part: org.apache.spark.sql.DataFrame) =
        Media.asPpm(part.filter(col("doc_id") % 2 === 0), "doc_id", "text")
          .unionByName(Media.asPng(part.filter(col("doc_id") % 2 =!= 0), "doc_id", "text"))
      val standalone = containers(base)
      val wrapped = graft.ops.WarcStream.asWarcOver(
        containers(exactTwins.unionByName(nearTwins)))
      Media.mixedNearDupPairs(standalone.unionByName(wrapped), "image")
    }),

    // REAL pixel resize (round 10): decode P6 → 2× integer box
    // downsample (floor-mean per cell, true edge counts) → resized-
    // raster digest. Upgrades q52's dims-only resize contract to
    // actual raster work — the thumbnailing pass a media pipeline
    // runs after decode — while staying byte-exactly DuckDB-replayable
    // (all-integer arithmetic over the cycled source bytes).
    "q145_media_resize_pixels" -> ((s, dir) =>
      Media.resizePpmBox(Media.asPpm(t(s, dir, "documents"), "doc_id", "text"), 2)
        .toDF()
        .select("doc_id", "rs_width", "rs_height", "n_rs_bytes", "rs_md5")),

    // Media near-dup via byte frames: pairs of decoded blobs sharing
    // ≥1 exact 256-byte pixel frame (inverted frame-digest join — the
    // byte-sequence overlap the reference pitches its gram index for,
    // assemblage_db/src/lib.rs:49-53). Non-vacuous: ASCII docs with
    // doc_id%61=0 and ≥300 chars get a twin (id+1e6) with the last
    // char swapped — same byte length, so the twin's pixel stream
    // differs only where the swapped byte cycles through; the swap
    // position (≥299) lies outside pixel frame 0, so every twin pair
    // shares at least that frame and must be detected.
    "q108_media_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val twins = docs
        .filter(col("doc_id") % 61 === 0 &&
          octet_length(col("text")) === length(col("text")) &&
          length(col("text")) >= 300)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          expr("concat(substring(text, 1, length(text) - 1), '!')").as("text"))
      Media.mediaNearDupPairs(
        Media.asPpm(docs.select("doc_id", "text").unionByName(twins), "doc_id", "text"))
    }),

    // Perceptual (aHash) media near-dup: pairs whose 8×8 integer
    // average-hashes over the decoded pixels differ in ≤ 3 of 64 bits
    // — the near-dup axis q108's exact byte frames cannot see (a
    // brightness-nudged image shares NO exact frame but flips few
    // aHash bits). All-integer kernel (channel-sum gray, cross-
    // multiplied mean threshold), so the oracle replays it exactly in
    // hex space. Non-vacuous both ways: %67 docs get an IDENTICAL
    // twin (+1e6, hamming 0) and %61 ASCII docs ≥300 chars get a
    // first-3-chars→'~~~' twin (+2e6) — a ~60-gray nudge on three
    // adjacent cycled stream bytes, measured on this corpus to land
    // all twins at hamming 2: the 0 < hamming ≤ 3 path (a delta-1
    // nudge is absorbed entirely — the hash is built to ignore it).
    "q120_media_phash" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val exactTwins = docs.filter(col("doc_id") % 67 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val nearTwins = docs.filter(col("doc_id") % 61 === 0 &&
          octet_length(col("text")) === length(col("text")) &&
          length(col("text")) >= 300)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          expr("concat('~~~', substring(text, 4))").as("text"))
      Media.phashNearDupPairs(Media.asPpm(
        docs.select("doc_id", "text")
          .unionByName(exactTwins).unionByName(nearTwins),
        "doc_id", "text"))
    }),

    // Incremental perceptual near-dup: a delta batch (every 7th doc +
    // injected twins) pairs against the standing corpus and within
    // itself; the standing aHash table is maintained state in
    // production (8 bytes/blob, hashed once ever) and never
    // self-joins. Injected positives cover all three pair shapes:
    // +1e6 identical twins of %67 standing docs (cross, hamming 0),
    // +2e6 '~~~' twins of %61 standing docs (cross, hamming ≈2), and
    // +3e6 identical twins of %49 delta docs (within-delta).
    "q121_media_phash_delta" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val standing = docs.filter(col("doc_id") % 7 =!= 0)
      val deltaBase = docs.filter(col("doc_id") % 7 === 0)
      val crossExact = standing.filter(col("doc_id") % 67 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val crossNear = standing.filter(col("doc_id") % 61 === 0 &&
          octet_length(col("text")) === length(col("text")) &&
          length(col("text")) >= 300)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          expr("concat('~~~', substring(text, 4))").as("text"))
      val withinExact = deltaBase.filter(col("doc_id") % 49 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"), col("text"))
      val delta = deltaBase.unionByName(crossExact)
        .unionByName(crossNear).unionByName(withinExact)
      // MAINTAINED-STATE call shape (the q123 convention): standing
      // enters as the aHash table a BandHashGate carries (re-derived
      // here so the oracle can replay it); only the delta decodes
      // inside the operator.
      Media.phashNearDupDeltaPairsIndexed(
        Media.ppmAHash(Media.asPpm(standing, "doc_id", "text")).toDF(),
        Media.asPpm(delta, "doc_id", "text"))
    }),

    // Band-hash gate replay: the maintained perceptual-hash index as
    // durable gate state (the streaming form of q121) — batches
    // doc_id % 4 flow through Streams.BandHashGate (hash table + band
    // multiplicities in LSM segments, compaction forced mid-replay,
    // persist→resume restart leg after fold 2); every streamed doc's
    // annotation (n_partners, min_hamming vs everything seen so far +
    // own batch) is hash-matched against the q120 pipeline with a
    // batch(partner) ≤ batch(doc) restriction. Twin offsets +1000001 /
    // +2000002 SHIFT the twin's batch, so the oracle exercises
    // same-batch pairs, carried-standing partners (incl. batch-0
    // initial corpus), and decision immutability (a doc folded before
    // its twin arrives must NOT count it).
    "q124_media_gate_replay" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val exactTwins = docs.filter(col("doc_id") % 67 === 0)
        .select((col("doc_id") + 1000001L).as("doc_id"), col("text"))
      val nearTwins = docs.filter(col("doc_id") % 61 === 0 &&
          octet_length(col("text")) === length(col("text")) &&
          length(col("text")) >= 300)
        .select((col("doc_id") + 2000002L).as("doc_id"),
          expr("concat('~~~', substring(text, 4))").as("text"))
      val hashed = graft.ops.Media.ppmAHash(graft.ops.Media.asPpm(
        docs.select("doc_id", "text")
          .unionByName(exactTwins).unionByName(nearTwins),
        "doc_id", "text")).toDF()
      // The oracle prunes with the GLOBAL hot set while the gate
      // prunes each fold with counts-so-far; the two agree only while
      // no (band, key) df crosses maxBandFreq mid-stream. Make that
      // assumption load-bearing: fail if any band key even approaches
      // the cap (half of the gate's default 1000).
      val maxDf = graft.ops.Media.phashBandRows(hashed)
        .groupBy("band", "key").agg(count(lit(1)).as("c"))
        .agg(max("c")).head().getLong(0)
      require(maxDf <= 500L,
        s"q124 oracle's one-pass collapse needs every (band,key) df well " +
          s"under maxBandFreq=1000; corpus peaks at $maxDf")
      val g1 = graft.streaming.Streams.newBandHashGate(
        hashed.filter(col("doc_id") % 4 === 0), compactEvery = 2)
      (1 to 2).foreach(i => g1.ingest(hashed.filter(col("doc_id") % 4 === i)))
      val gate = withGateStore(s) { store =>
        g1.persist(store)
        g1.release() // resume re-checkpoints every slot (see q104)
        graft.streaming.Streams.resumeBandHashGate(store, compactEvery = 2)
      }
      gate.ingest(hashed.filter(col("doc_id") % 4 === 3))
      gate.decisions
    }),

    // UNIFIED multimodal ingest gate (round 11): one ORDERED stream of
    // ALL SEVEN containers this engine decodes — images (PPM even /
    // PNG odd ids), JPEG (every 5th image id, framing mixed by
    // parity), audio (WAV even / FLAC odd, incl. the 24-bit length
    // class), video (Y4M, with every 5th video id as MJPEG-AVI) —
    // folding through Streams.MixedMediaGate: one sniff+decode+hash
    // pass per batch routes rows into per-modality band-hash gates
    // (per-gate LSM segments, lockstep batch counters, persist→resume
    // restart after fold 3). Twin offsets +15000015 / +45000045 are
    // ≡ 0 mod 15 and ODD: they preserve doc_id % 3 (modality) and
    // doc_id % 5 (the jpeg/avi splits) while flipping % 2 — so image
    // twins cross PPM↔PNG, audio twins cross WAV↔FLAC, jpeg twins
    // cross the baseline↔progressive framing boundary (hash-
    // identical: pixels/PCM decide), and video twins stay within
    // their container class (an uncompressed plane can never
    // byte-match a lossy one — a fact about codecs, not a gap).
    // ONE audio class is excluded from the cross-container signal:
    // text lengths with l % 7 == 3 encode 24-bit FLAC but the WAV twin
    // stays 16-bit (asWav has no 24-bit mode), so the envelope hashes
    // differ and those twin pairs carry no dedup signal — the oracle
    // models this per doc, so the exclusion is deliberate, not drift.
    // Decisions: (doc_id, batch, n_partners, min_hamming, modality),
    // video rows at packed (doc·8+frame) keys.
    "q154_mixed_gate_replay" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val exactTwins = docs.filter(col("doc_id") % 67 === 0)
        .select((col("doc_id") + 15000015L).as("doc_id"), col("text"))
      val nearTwins = docs.filter(col("doc_id") % 61 === 0 &&
          octet_length(col("text")) === length(col("text")) &&
          length(col("text")) >= 300)
        .select((col("doc_id") + 45000045L).as("doc_id"),
          expr("concat('~~~', substring(text, 4))").as("text"))
      // text-slot twins (round 12): the %67/%61 moduli never hit the
      // text slot (doc_id ≡ 10 mod 15) below doc_id 610, so without
      // these the text modality's positive path would be VACUOUS at
      // verify SF (the q89 lesson). Offsets ≡ 0 mod 15 keep the slot.
      val exactTextTwins = docs.filter(col("doc_id") % 30 === 10)
        .select((col("doc_id") + 30000030L).as("doc_id"), col("text"))
      val nearTextTwins = docs.filter(col("doc_id") % 30 === 25 &&
          octet_length(col("text")) === length(col("text")) &&
          length(col("text")) >= 300)
        .select((col("doc_id") + 60000060L).as("doc_id"),
          expr("concat('~~~', substring(text, 4))").as("text"))
      val aug = docs.unionByName(exactTwins).unionByName(nearTwins)
        .unionByName(exactTextTwins).unionByName(nearTextTwins)
      def blobs(part: org.apache.spark.sql.DataFrame) = {
        val imgAll = part.filter(col("doc_id") % 3 === 0)
        val img = imgAll.filter(col("doc_id") % 5 =!= 0)
        val jpg = imgAll.filter(col("doc_id") % 5 === 0)
        val audAll = part.filter(col("doc_id") % 3 === 1)
        // round 12: the EIGHTH container — every 5th audio-slot id
        // ships multi-member gzip TEXT instead (the text modality:
        // decompress → SimHash60 → the q33 4×15-bit bands). Twin
        // offsets are ≡ 0 mod 15, so twins stay within the slot and
        // exact twins fingerprint identically through decompression.
        val aud = audAll.filter(col("doc_id") % 5 =!= 0)
        // round 13: the text slot itself splits across BOTH text
        // containers — even ids ship multi-member gzip, odd ids ship
        // WARC captures. Both are transparent to the SimHash
        // fingerprint (it hashes the recovered text), so the oracle
        // and the twin moduli are untouched; the gate now reads a
        // WARC source end-to-end.
        val txtAll = audAll.filter(col("doc_id") % 5 === 0)
        val txt = txtAll.filter(col("doc_id") % 2 === 0)
        val txtW = txtAll.filter(col("doc_id") % 2 =!= 0)
        val vidAll = part.filter(col("doc_id") % 3 === 2)
        val vidY = vidAll.filter(col("doc_id") % 5 =!= 0)
        val vidA = vidAll.filter(col("doc_id") % 5 === 0)
        // round 14: the WARC text slot ships as MULTI-RECORD SHARDS
        // (one stream per 100 consecutive ids within the batch — the
        // real crawl file shape); the hash pass explodes one capture
        // per response record at the SAME doc ids, so decisions and
        // the oracle are untouched while the gate now walks
        // thousand-record streams end-to-end.
        val raw = Media.asPpm(img.filter(col("doc_id") % 2 === 0), "doc_id", "text")
          .unionByName(Media.asPng(img.filter(col("doc_id") % 2 =!= 0), "doc_id", "text"))
          .unionByName(Media.asJpegMixed(jpg, "doc_id", "text"))
          .unionByName(Media.asWav(aud.filter(col("doc_id") % 2 === 0), "doc_id", "text"))
          .unionByName(Media.asFlac(aud.filter(col("doc_id") % 2 =!= 0), "doc_id", "text"))
          .unionByName(graft.ops.GzipStream.asGzip(txt, "doc_id", "text"))
          .unionByName(Media.asY4m(vidY, "doc_id", "text"))
          .unionByName(Media.asAvi(vidA, "doc_id", "text"))
        // round 14: every doc_id % 7 == 3 blob additionally arrives
        // inside MIXED-MEDIA WARC SHARDS — one multi-record crawl
        // stream per 100 consecutive ids whose captures span
        // modalities (PNG next to WAV next to AVI in the same file).
        // The hash pass explodes each shard per capture, re-sniffs
        // the HTTP payload by magic, and routes it into its own
        // modality's hash space at the same capture id — a crawl
        // capture of a PNG/WAV twin flags against standalone forms
        // and the oracle is untouched (the wrapper is transparent).
        raw.filter((r: graft.ops.MediaRow) => r.doc_id % 7 != 3)
          .union(graft.ops.WarcStream.asWarcShardsOver(
            raw.filter((r: graft.ops.MediaRow) => r.doc_id % 7 == 3), 100))
          .union(graft.ops.WarcStream.asWarcShards(txtW, "doc_id", "text", 100))
      }
      // The oracle's one-pass collapse needs every (modality, band,
      // key) df well under the gate's cap (the q124 caveat, per
      // modality).
      // union df across modalities: a conservative over-estimate of
      // any single modality's (band, key) df
      val maxDf = graft.ops.Media.phashBandRows(
          graft.ops.Media.mixedMediaHash(blobs(aug))
            .select("doc_id", "b0", "b1", "b2", "b3"))
        .groupBy("band", "key").agg(count(lit(1)).as("c"))
        .agg(max("c")).head().getLong(0)
      require(maxDf <= 500L,
        s"q154 oracle's one-pass collapse needs every (band,key) df well " +
          s"under maxBandFreq=1000; corpus peaks at $maxDf")
      val g1 = graft.streaming.Streams.newMixedMediaGate(s, compactEvery = 2)
      (0 to 2).foreach(i => g1.ingest(blobs(aug.filter(col("doc_id") % 4 === i))))
      val gate = withMixedGateStores(s) { storeFor =>
        g1.persist(storeFor)
        g1.release()
        graft.streaming.Streams.resumeMixedMediaGate(storeFor, compactEvery = 2)
      }
      gate.ingest(blobs(aug.filter(col("doc_id") % 4 === 3)))
      gate.decisions
    }),

    // Vector-index gate replay: the maintained quantized-IVF serving
    // index as durable gate state (the search-side complement of the
    // q105 embedding dedup gate) — batches vec_id % 4 flow through
    // Streams.VectorIndexGate (postings + fixed centroid closure in
    // LSM segments, compaction forced mid-replay, persist→resume
    // restart leg after fold 2); every streamed vector's top-10
    // annotation (integer-dot shortlist over probed cells, float
    // rerank) is hash-matched against the q109 chain restricted to
    // batch(neighbor) ≤ batch(query). Decisions are immutable at fold
    // time, so the fold-forward collapses into the one restricted
    // chain (the q124 discipline).
    "q127_vector_index_gate" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val g1 = graft.streaming.Streams.newVectorIndexGate(
        emb.filter(col("vec_id") % 4 === 0), "vec_id", "embedding",
        numCentroids = 16, nprobe = 2, shortlist = 40, k = 10,
        compactEvery = 2)
      (1 to 2).foreach(i => g1.foldRaw(
        emb.filter(col("vec_id") % 4 === i), "vec_id", "embedding"))
      val gate = withGateStore(s) { store =>
        g1.persist(store)
        g1.release() // resume re-checkpoints every slot (see q104)
        graft.streaming.Streams.resumeVectorIndexGate(store,
          nprobe = 2, shortlist = 40, k = 10, compactEvery = 2)
      }
      gate.foldRaw(emb.filter(col("vec_id") % 4 === 3), "vec_id", "embedding")
      gate.decisions
    }),

    // The PQ-serving gate (round 12): q127's maintained-IVF replay
    // with the 8-byte ADC sidecar live — codebooks train ONCE on the
    // initial batch (exported for the twin), every posting carries
    // its PQ codes, and each fold's shortlist is scored by integer
    // ADC lookup tables instead of the int8 dot (the compressed-scan
    // serving path; floats touched only at the exact re-rank). The
    // persist→resume mid-replay additionally rides the codebooks
    // through the manifest's pqcb slot.
    "q164_pq_vector_gate" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val g1 = graft.streaming.Streams.newVectorIndexGate(
        emb.filter(col("vec_id") % 4 === 0), "vec_id", "embedding",
        numCentroids = 16, nprobe = 2, shortlist = 40, k = 10,
        compactEvery = 2, pqM = 8, pqKsub = 256, pqIters = 2)
      val pqCbFrame = g1.pqFrame.get
      graft.OracleAux.register(PqGateExportPath) {
        pqCbFrame.coalesce(1).write.mode("overwrite").parquet(PqGateExportPath)
      }
      (1 to 2).foreach(i => g1.foldRaw(
        emb.filter(col("vec_id") % 4 === i), "vec_id", "embedding"))
      val gate = withGateStore(s) { store =>
        g1.persist(store)
        g1.release()
        graft.streaming.Streams.resumeVectorIndexGate(store,
          nprobe = 2, shortlist = 40, k = 10, compactEvery = 2)
      }
      gate.foldRaw(emb.filter(col("vec_id") % 4 === 3), "vec_id", "embedding")
      gate.decisions
    }),

    // PQ codebook DRIFT refresh (round 13): the q164 serving gate
    // with a distribution shift injected from batch 3 on (per-dim
    // scaling x_j ·(1+j) — cosine structure preserved, per-subspace
    // support moved far outside the initial codebooks' range) and the
    // drift gate live (floor 40): the fold-2 compaction measures
    // healthy recall and does NOT retrain (require pins it); the
    // fold-4 compaction measures the drifted dip, RETRAINS the
    // codebooks on the current corpus and re-derives every standing
    // code; the refreshed books ride the manifest's pqcb slot through
    // a persist→resume restart; batch 5 folds against them. The
    // two-phase oracle replays batches 1-4 from the INITIAL codebook
    // export and batch 5 from the REFRESHED export — decisions before
    // the refresh are immutable, decisions after it see the new code
    // space (the q136 reseed discipline, applied to the PQ sidecar).
    "q165_pq_drift_gate" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      def b(i: Int) = {
        val x = emb.filter(col("vec_id") % 6 === i)
        if (i >= 3)
          x.withColumn("embedding", transform(col("embedding"),
            (v, j) => v * (lit(1.0f) + j.cast("float"))))
        else x
      }
      val g1 = graft.streaming.Streams.newVectorIndexGate(
        b(0), "vec_id", "embedding",
        numCentroids = 16, nprobe = 2, shortlist = 40, k = 10,
        compactEvery = 2, pqM = 8, pqKsub = 256, pqIters = 2,
        pqRefreshMinRecallX100 = 40L)
      val cb0 = g1.pqFrame.get
      graft.OracleAux.register(PqDriftCb0Path) {
        cb0.coalesce(1).write.mode("overwrite").parquet(PqDriftCb0Path)
      }
      (1 to 2).foreach(i => g1.foldRaw(b(i), "vec_id", "embedding"))
      require(g1.pqRefreshCount == 0,
        "q165 oracle models NO refresh at the fold-2 compaction (no " +
          s"drift yet in the corpus); gate refreshed ${g1.pqRefreshCount}")
      (3 to 4).foreach(i => g1.foldRaw(b(i), "vec_id", "embedding"))
      require(g1.pqRefreshCount == 1,
        "q165 oracle models exactly ONE refresh, at the fold-4 " +
          s"compaction; gate refreshed ${g1.pqRefreshCount}")
      val cb1 = g1.pqFrame.get
      graft.OracleAux.register(PqDriftCb1Path) {
        cb1.coalesce(1).write.mode("overwrite").parquet(PqDriftCb1Path)
      }
      val gate = withGateStore(s) { store =>
        g1.persist(store)
        g1.release()
        graft.streaming.Streams.resumeVectorIndexGate(store,
          nprobe = 2, shortlist = 40, k = 10, compactEvery = 2,
          pqRefreshMinRecallX100 = 40L)
      }
      gate.foldRaw(b(5), "vec_id", "embedding")
      require(gate.pqRefreshCount == 0,
        "no compaction fires during batch 5 — the resumed gate must " +
          "not retrain again")
      gate.decisions
    }),

    // The RELATIVE auto-trigger, oracle-gated end-to-end (round 14):
    // q165's drift replay with NO absolute floor — the single-step
    // drop detector alone must stay silent at the healthy fold-2
    // compaction (first measurement seeds the baseline; the no-drift
    // decay here is ~12%/compaction, under the 20% margin) and fire
    // exactly once at the drifted fold-4 compaction (measured 34
    // against the fold-2 baseline 56 — a 39% drop). Same refresh
    // point as q165, so the two-phase oracle chain is q165's with
    // this run's own codebook exports.
    "q180_pq_drift_auto" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      def b(i: Int) = {
        val x = emb.filter(col("vec_id") % 6 === i)
        if (i >= 3)
          x.withColumn("embedding", transform(col("embedding"),
            (v, j) => v * (lit(1.0f) + j.cast("float"))))
        else x
      }
      val g1 = graft.streaming.Streams.newVectorIndexGate(
        b(0), "vec_id", "embedding",
        numCentroids = 16, nprobe = 2, shortlist = 40, k = 10,
        compactEvery = 2, pqM = 8, pqKsub = 256, pqIters = 2,
        pqRefreshDropFracX100 = 80L)
      val cb0 = g1.pqFrame.get
      graft.OracleAux.register(PqDrift2Cb0Path) {
        cb0.coalesce(1).write.mode("overwrite").parquet(PqDrift2Cb0Path)
      }
      (1 to 2).foreach(i => g1.foldRaw(b(i), "vec_id", "embedding"))
      require(g1.pqRefreshCount == 0,
        "q180 oracle models NO refresh at the fold-2 compaction (the " +
          s"first measurement only seeds the baseline); got ${g1.pqRefreshCount}")
      (3 to 4).foreach(i => g1.foldRaw(b(i), "vec_id", "embedding"))
      require(g1.pqRefreshCount == 1,
        "q180 oracle models exactly ONE refresh, at the fold-4 " +
          s"compaction; gate refreshed ${g1.pqRefreshCount}")
      val cb1 = g1.pqFrame.get
      graft.OracleAux.register(PqDrift2Cb1Path) {
        cb1.coalesce(1).write.mode("overwrite").parquet(PqDrift2Cb1Path)
      }
      val gate = withGateStore(s) { store =>
        g1.persist(store)
        g1.release()
        graft.streaming.Streams.resumeVectorIndexGate(store,
          nprobe = 2, shortlist = 40, k = 10, compactEvery = 2,
          pqRefreshDropFracX100 = 80L)
      }
      gate.foldRaw(b(5), "vec_id", "embedding")
      require(gate.pqRefreshCount == 0,
        "no compaction fires during batch 5 — the resumed gate must " +
          "not retrain again")
      gate.decisions
    }),

    // IVFADC serving gate (round 14): q164's maintained-IVF replay
    // with the RESIDUAL sidecar live — codes quantize each posting's
    // residual to its own cell's lattice centroid (centroids = the
    // initial batch's 16 lowest ids, so the oracle's centroid lattice
    // vectors are just those rows' floor(embedding×1000)), and every
    // fold's shortlist scores dot(q, cent) + residual-ADC. The
    // persist→resume mid-replay rides BOTH the residual codebooks
    // (pqcb) and the centroid table (pqcents) through the manifest.
    "q177_ivfadc_vector_gate" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val g1 = graft.streaming.Streams.newVectorIndexGate(
        emb.filter(col("vec_id") % 4 === 0), "vec_id", "embedding",
        numCentroids = 16, nprobe = 2, shortlist = 40, k = 10,
        compactEvery = 2, pqM = 8, pqKsub = 256, pqIters = 2,
        pqResidual = true)
      val pqCbFrame = g1.pqFrame.get
      graft.OracleAux.register(IvfAdcGateExportPath) {
        pqCbFrame.coalesce(1).write.mode("overwrite").parquet(IvfAdcGateExportPath)
      }
      (1 to 2).foreach(i => g1.foldRaw(
        emb.filter(col("vec_id") % 4 === i), "vec_id", "embedding"))
      val gate = withGateStore(s) { store =>
        g1.persist(store)
        g1.release()
        graft.streaming.Streams.resumeVectorIndexGate(store,
          nprobe = 2, shortlist = 40, k = 10, compactEvery = 2)
      }
      gate.foldRaw(emb.filter(col("vec_id") % 4 === 3), "vec_id", "embedding")
      gate.decisions
    }),

    // IVFADC gate in COMPRESSED-ONLY serving (round 15): q177's
    // replay with rerankFloat = false — decisions rank by the integer
    // residual-ADC score alone, the deployment shape where the hot
    // index is 8-16 B/vector codes and floats are cold storage. The
    // oracle is q177's chain with the float re-rank tail swapped for
    // the ADC-ordered top-10 (over this run's own codebook exports);
    // VectorIndexGateSpec pins recall(re-rank) >= recall(ADC-only) at
    // equal probes.
    "q190_ivfadc_gate_adconly" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val g1 = graft.streaming.Streams.newVectorIndexGate(
        emb.filter(col("vec_id") % 4 === 0), "vec_id", "embedding",
        numCentroids = 16, nprobe = 2, shortlist = 40, k = 10,
        compactEvery = 2, pqM = 8, pqKsub = 256, pqIters = 2,
        pqResidual = true, rerankFloat = false)
      val pqCbFrame = g1.pqFrame.get
      graft.OracleAux.register(IvfAdcGateAdcExportPath) {
        pqCbFrame.coalesce(1).write.mode("overwrite").parquet(IvfAdcGateAdcExportPath)
      }
      (1 to 2).foreach(i => g1.foldRaw(
        emb.filter(col("vec_id") % 4 === i), "vec_id", "embedding"))
      val gate = withGateStore(s) { store =>
        g1.persist(store)
        g1.release()
        graft.streaming.Streams.resumeVectorIndexGate(store,
          nprobe = 2, shortlist = 40, k = 10, compactEvery = 2,
          rerankFloat = false)
      }
      gate.foldRaw(emb.filter(col("vec_id") % 4 === 3), "vec_id", "embedding")
      gate.decisions
    }),

    // Vector-index gate with the OCCUPANCY AUTO-RESEED live (round
    // 10): q127's replay with targetCellOccupancy=16, so the fold-2
    // compaction doubles the closure 16 → 32 centroids (seeded from
    // the lowest 32 ids of the corpus at that fold — the
    // SQL-replayable rule), the reseeded closure rides the manifest
    // through a persist→resume restart, and batch 3 probes the WIDER
    // index. The oracle is two q109 chains: batches 1-2 against the
    // 16-centroid closure, batch 3 against the 32-centroid closure
    // over vec_id%4 <= 2 — decisions before the reseed are immutable,
    // decisions after it see the new coordinate system. The
    // centroidCount assert makes the oracle's LIMIT 32 load-bearing:
    // a corpus size that fired zero or two doublings fails here, not
    // silently in the hash compare.
    "q136_vector_gate_reseed" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val g1 = graft.streaming.Streams.newVectorIndexGate(
        emb.filter(col("vec_id") % 4 === 0), "vec_id", "embedding",
        numCentroids = 16, nprobe = 2, shortlist = 40, k = 10,
        compactEvery = 2, targetCellOccupancy = 16L)
      (1 to 2).foreach(i => g1.foldRaw(
        emb.filter(col("vec_id") % 4 === i), "vec_id", "embedding"))
      require(g1.centroidCount == 32,
        s"q136 oracle models exactly ONE doubling (16 -> 32) at the " +
          s"fold-2 compaction; gate reseeded to ${g1.centroidCount}")
      val gate = withGateStore(s) { store =>
        g1.persist(store)
        g1.release()
        graft.streaming.Streams.resumeVectorIndexGate(store,
          nprobe = 2, shortlist = 40, k = 10, compactEvery = 2,
          targetCellOccupancy = 16L)
      }
      require(gate.centroidCount == 32,
        "reseeded closure must survive persist -> resume")
      gate.foldRaw(emb.filter(col("vec_id") % 4 === 3), "vec_id", "embedding")
      gate.decisions
    }),

    // Frame-aware video sampling: every 2nd REAL frame (as found by
    // the parser, not a byte window) digested — the sampling unit a
    // pipeline captions/embeds; oracle slices the same frames out of
    // the cycled source in hex space.
    "q131_video_frame_sample" -> ((s, dir) =>
      Media.y4mSampleFrames(
        Media.asY4m(t(s, dir, "documents"), "doc_id", "text"), every = 2)
        .toDF()
        .select("doc_id", "frame_idx", "frame_md5")),

    // Incremental video frame near-dup: q129's detection for a DELTA
    // batch of videos vs the standing frame-hash table (probe-only,
    // q121/q123's restriction discipline) — cross-exact, cross-near,
    // and within-delta twin shapes all non-vacuous.
    "q130_video_neardup_delta" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val standing = docs.filter(col("doc_id") % 7 =!= 0)
      val deltaBase = docs.filter(col("doc_id") % 7 === 0)
      val crossExact = standing.filter(col("doc_id") % 67 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val crossNear = standing.filter(col("doc_id") % 61 === 0 &&
          octet_length(col("text")) === length(col("text")) &&
          length(col("text")) >= 300)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          expr("concat('~~~', substring(text, 4))").as("text"))
      val withinExact = deltaBase.filter(col("doc_id") % 49 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"), col("text"))
      val delta = deltaBase.unionByName(crossExact)
        .unionByName(crossNear).unionByName(withinExact)
      // MAINTAINED-STATE call shape: standing enters as the
      // frame-aHash table (re-derived here so the oracle can replay
      // it); only the delta's container bytes decode inside.
      Media.videoNearDupDeltaFramePairsIndexed(
        Media.y4mFrameAHash(Media.asY4m(standing, "doc_id", "text")),
        Media.asY4m(delta, "doc_id", "text"))
    }),

    // Perceptual AUDIO near-dup: the q120 axis over the OTHER real
    // container — 64-block |PCM| envelope hashes (little-endian signed
    // 16-bit samples, integer cross-multiplied threshold) banded into
    // the same pigeonhole join. Same twin scheme as q120 (identical
    // +1e6, '~~~' +2e6 — measured 3 of 4 twins in 0 < hamming ≤ 3 on
    // this corpus).
    "q122_audio_phash" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val exactTwins = docs.filter(col("doc_id") % 67 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val nearTwins = docs.filter(col("doc_id") % 61 === 0 &&
          octet_length(col("text")) === length(col("text")) &&
          length(col("text")) >= 300)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          expr("concat('~~~', substring(text, 4))").as("text"))
      Media.audioNearDupPairs(Media.asWav(
        docs.select("doc_id", "text")
          .unionByName(exactTwins).unionByName(nearTwins),
        "doc_id", "text"))
    }),

    // Incremental perceptual audio near-dup — q121's shape over the
    // envelope hash: delta batch vs the standing envelope table
    // (maintained state in production, probe-only) + within itself.
    "q123_audio_phash_delta" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val standing = docs.filter(col("doc_id") % 7 =!= 0)
      val deltaBase = docs.filter(col("doc_id") % 7 === 0)
      val crossExact = standing.filter(col("doc_id") % 67 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val crossNear = standing.filter(col("doc_id") % 61 === 0 &&
          octet_length(col("text")) === length(col("text")) &&
          length(col("text")) >= 300)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          expr("concat('~~~', substring(text, 4))").as("text"))
      val withinExact = deltaBase.filter(col("doc_id") % 49 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"), col("text"))
      val delta = deltaBase.unionByName(crossExact)
        .unionByName(crossNear).unionByName(withinExact)
      // the MAINTAINED-STATE call shape: standing enters as the hash
      // table a BandHashGate carries (re-derived here so the oracle
      // can replay it — the q121 convention); only the delta decodes
      // inside the operator
      Media.audioNearDupDeltaPairsIndexed(
        Media.wavEnvelopeHash(Media.asWav(standing, "doc_id", "text")).toDF(),
        Media.asWav(delta, "doc_id", "text"))
    }),

    // Second real container — RIFF/WAVE 16-bit PCM: little-endian
    // binary header fields (channels / sample rate / sample count all
    // validated for internal consistency) + PCM payload digest. Proves
    // the decode path handles genuine binary field layouts, not just
    // PPM's ASCII header.
    "q110_wav_decode" -> ((s, dir) =>
      Media.decodeWav(Media.asWav(t(s, dir, "documents"), "doc_id", "text"))
        .toDF()
        .select("doc_id", "channels", "sample_rate", "n_samples", "pcm_md5")),

    // Curation-gate replay: the stateful streaming form of q111
    // oracle-gated end-to-end — three ordered micro-batches flow
    // through Streams.CurationGate (carried digest index + train-token
    // counter + append-only shard stream, compaction forced
    // mid-replay); every streamed doc's decision (duplicate / quality
    // / contaminated / ok), split, and exact shard offset is
    // hash-matched against a DuckDB fold-forward reconstruction.
    // The synthetic slices carry no organic exact dups, so identical-
    // text twins are injected on BOTH sides (the vacuous-oracle rule):
    // +2e6 twins land in the SAME batch as their original (2e6 % 4 = 0
    // — the within-batch lower-id rule), +3000001 twins shift one
    // batch over (the carried-digest rule, both directions).
    "q114_curation_gate_replay" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpusBase = docs.filter(col("doc_id") % 97 =!= 0).select("doc_id", "text")
      val corpus = corpusBase
        .unionByName(corpusBase.filter(col("doc_id") % 89 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
        .unionByName(corpusBase.filter(col("doc_id") % 83 === 0)
          .select((col("doc_id") + 3000001L).as("doc_id"), col("text")))
      val evalSet = docs.filter(col("doc_id") % 97 === 0)
      val g1 = graft.streaming.Streams.newCurationGate(
        corpus.filter(col("doc_id") % 4 === 0), evalSet,
        "doc_id", "text", tokensPerShard = 16384L, compactEvery = 2)
      (1 to 2).foreach(i => g1.ingest(corpus.filter(col("doc_id") % 4 === i)))
      // RESTART leg (round-9): after fold 2's LSM compaction the gate
      // is persisted and a fresh gate resumed from the manifest folds
      // batch 3 — same unchanged oracle, so a green row proves the
      // durable state (digest index + decision log + train-token and
      // batch counters) restores decision- and shard-offset-identical.
      val gate = withGateStore(s) { store =>
        g1.persist(store)
        g1.release() // see q104 — the resumed gate holds no g1 blocks
        graft.streaming.Streams.resumeCurationGate(store, evalSet,
          "doc_id", "text", tokensPerShard = 16384L, compactEvery = 2)
      }
      gate.ingest(corpus.filter(col("doc_id") % 4 === 3))
      gate.decisions
    }),

    // COMPOSED curation-gate replay (round-9): q114's gate with the
    // near-dup stage enabled — each batch's exact-canonical reps are
    // additionally checked against the standing rep corpus via the q85
    // band-key machinery (and within the batch), rejecting
    // near-duplicates as a first-class status between 'duplicate' and
    // 'quality'. Injected twins make every path non-vacuous:
    //   +2000000 exact twins (id%89=0) land in the SAME batch →
    //     'duplicate' must win over 'near-dup' (precedence);
    //   +4000000 PERTURBED twins (id%79=0, suffix-appended) land in
    //     the same batch → 'near-dup within batch' (higher id loses);
    //   +5000001 perturbed twins (id%73=0) shift one batch →
    //     'near-dup' vs the carried rep corpus (both directions).
    // The oracle replays the fold chain with the near-dup relation
    // reconstructed exactly (band collisions ∩ exact jaccard > 1/2).
    "q115_curation_gate_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpusBase = docs.filter(col("doc_id") % 97 =!= 0).select("doc_id", "text")
      val corpus = corpusBase
        .unionByName(corpusBase.filter(col("doc_id") % 89 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
        .unionByName(corpusBase.filter(col("doc_id") % 79 === 0)
          .select((col("doc_id") + 4000000L).as("doc_id"),
            concat(col("text"), lit(" near twin appended marker")).as("text")))
        .unionByName(corpusBase.filter(col("doc_id") % 73 === 0)
          .select((col("doc_id") + 5000001L).as("doc_id"),
            concat(col("text"), lit(" shifted near twin marker")).as("text")))
      val gate = graft.streaming.Streams.newCurationGate(
        corpus.filter(col("doc_id") % 4 === 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", tokensPerShard = 16384L, compactEvery = 2,
        nearDup = Some(graft.streaming.Streams.NearDupParams()))
      (1 to 3).foreach(i => gate.ingest(corpus.filter(col("doc_id") % 4 === i)))
      gate.decisions
    }),

    // Two-stage exact-substring — the 100 TB production flow the
    // winnowed pass exists to drive: stage 1 (q106) flags candidate
    // docs at ~1/stride the row volume; stage 2 runs the EXACT window
    // pass over the flagged subset only. Semantics (documented trade):
    // multiplicities are within-subset — repeats ≥ width+stride−1
    // always have BOTH copies flagged (the winnowing guarantee), so
    // their exact counts survive; sub-guarantee repeats confined to
    // unflagged docs are the accepted loss.
    "q112_exact_substr_twostage" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // Checkpointed: stage 2 forces its input twice (the eager
      // repeated-set count + the final materialization); without this
      // the stage-1 winnow kernel would re-run over the full corpus.
      val flagged = graft.ops.Ckpt.fresh(Dedup.exactSubstrRepeatsStrided(
          docs, "doc_id", "text", width = 40, stride = 20)
        .filter(col("n_repeated") > 0)
        .select("doc_id"))
      Dedup.exactSubstrRepeats(
        docs.join(flagged, Seq("doc_id"), "left_semi"), "doc_id", "text", width = 40)
    }),

    // Deterministic subword (BPE) shard packing (round-9): q86's
    // two-level prefix-sum pack with the token unit switched to the
    // fixed-merges byte-pair tokenizer (graft_bpe_count) — the unit
    // real training-shard budgets are denominated in. The oracle
    // replays the merges deterministically (a replace-chain over a
    // separator-wrapped token encoding, GENERATED from the same
    // Merges table), so a green row proves exact subword counts AND
    // the pack arithmetic over them.
    "q118_bpe_shard_pack" -> ((s, dir) =>
      Curation.shardPack(t(s, dir, "documents"), "doc_id", "text",
        tokensPerShard = 16384L, tokenizer = "bpe")),

    // Distributed BPE TRAINING (round 11): learn 6 merges from the
    // corpus by iterated pair-count aggregation — one shuffle per
    // round (map-side partial agg), argmax with the (count DESC, a, b)
    // binary tie-break, then a map-side merge pass with the exact
    // inference semantics, state checkpointed per round. The oracle
    // unrolls the SAME 6 rounds in SQL over the q118 separator
    // encoding, DERIVING the merges rather than being told them — so
    // a green row pins the whole training loop: counting semantics
    // (overlapping pairs), the tie-break, and the pass semantics.
    "q153_bpe_train" -> ((s, dir) =>
      graft.ops.BpeTrain.learnMerges(t(s, dir, "documents"), "text", rounds = 6)),

    // WORD-HISTOGRAM BPE training (round 13): pre-tokenize on
    // whitespace, aggregate ONCE to a (word, count) histogram, learn
    // merges over the histogram with count-WEIGHTED pair statistics —
    // merge passes cost O(distinct words), independent of corpus
    // size (the true-32k-vocab rung past q153's stream trainer; see
    // BpeTrain.learnMergesHistogram for the exactness contract). The
    // oracle re-derives every weighted count and argmax from the SQL
    // word histogram — training is oracle-gated end to end, like q153.
    "q166_bpe_train_hist" -> ((s, dir) =>
      graft.ops.BpeTrain.learnMergesHistogram(
        t(s, dir, "documents"), "text", rounds = 8)),

    // Incremental WINNOWED exact-substring (round-9): the doc_id%7=0
    // batch's winnowed fingerprints probe the STANDING winnowed
    // multiplicity index — the index a 100 TB pipeline actually
    // maintains (q99's shape at ~1/stride the volume), within-batch
    // repeats included. Result-identical to q106 over the union
    // restricted to the delta (the oracle is q106's chain with that
    // restriction).
    "q116_winnowed_delta" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.exactSubstrDeltaRepeatsStrided(
        docs.filter(col("doc_id") % 7 =!= 0),
        docs.filter(col("doc_id") % 7 === 0),
        "doc_id", "text", width = 40, stride = 20)
    }),

    // WINNOW-GATE replay (round-9): the q116 standing winnowed index
    // as ACTUALLY-MAINTAINED durable gate state — doc_id%4=0 seeds the
    // multiplicity index, three ordered batches are annotated against
    // everything seen so far (plus themselves) and fold their
    // fingerprint counts in; compactEvery=2 forces an LSM merge
    // mid-replay, and the q104/q114-style RESTART leg persists the
    // index + decision log after fold 2 and resumes a fresh gate for
    // fold 3 — against an unchanged oracle (the q106 winnow chain with
    // per-batch cumulative multiplicities). Decisions are immutable:
    // an early doc is not re-flagged when a later copy arrives; the
    // copy itself flags.
    "q119_winnow_gate_replay" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val g1 = graft.streaming.Streams.newWinnowGate(
        docs.filter(col("doc_id") % 4 === 0), "doc_id", "text",
        width = 40, stride = 20, compactEvery = 2)
      (1 to 2).foreach(i => g1.ingest(docs.filter(col("doc_id") % 4 === i)))
      val gate = withGateStore(s) { store =>
        g1.persist(store)
        g1.release()
        graft.streaming.Streams.resumeWinnowGate(store, "doc_id", "text",
          width = 40, stride = 20, compactEvery = 2)
      }
      gate.ingest(docs.filter(col("doc_id") % 4 === 3))
      gate.decisions
    }),

    // Incremental media near-dup: the doc_id%7=0 blob batch tested
    // against the standing corpus's frame-digest index + within itself
    // — the MEDIA member of the delta family. Result-identical to q108
    // (sans twins) over the union restricted to delta-touching pairs.
    // MAINTAINED-STATE call shape (the q123 convention): standing
    // enters as the materialized frame-digest table a gate carries
    // (re-derived + checkpointed here so the oracle can replay it);
    // only the delta decodes inside the operator, and the operator
    // never re-writes a standing-sized intermediate.
    // COST MODEL (the q103 discipline): the timed number includes the
    // standing-index derivation (encode + decode + per-frame MD5 over
    // 6/7 of the corpus) solely so the oracle can replay it; in
    // production that table is the gate's durable state, amortized to
    // one write per blob ever, and a fold pays only the delta decode
    // plus index probes.
    "q113_media_dedup_delta" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val standingIdx = graft.ops.Ckpt.fresh(
        Media.ppmFrameDigests(
          Media.asPpm(docs.filter(col("doc_id") % 7 =!= 0), "doc_id", "text"))
          .toDF()
          .select(col("doc_id"), col("frame_md5").as("fh")).distinct())
      Media.mediaNearDupDeltaPairsIndexed(
        standingIdx,
        Media.asPpm(docs.filter(col("doc_id") % 7 === 0), "doc_id", "text"))
    }),

    // Resize metadata: fit (width, height) into 256px preserving aspect
    // ratio, integer-exact.
    "q52_media_resize" -> ((s, dir) => {
      Media.resizeStub(
        Media.extractFeatures(Media.asMedia(t(s, dir, "documents"), "doc_id", "text")),
        maxDim = 256)
    }))

  // ---------------------------------------------------------------------
  // DuckDB oracles. Shared CTE fragments re-derive the deterministic
  // hashes (md5-based hash60) and tokenization bit-for-bit.
  // ---------------------------------------------------------------------

  /** hash60 of a SQL string expression. */
  private def h60(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 15)) AS BIGINT)"

  private val shingleCte =
    """toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents),
       sh AS (SELECT DISTINCT doc_id, w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)] || ' ' || w[CAST(i+2 AS INT)] AS shingle
              FROM toks, UNNEST(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3)"""

  private val jaccardCte =
    s"""$shingleCte,
       shcnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
       inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
                 FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
       jac AS (SELECT id_a, id_b, inter, ca.c + cb.c - inter AS union_size
               FROM inter JOIN shcnt ca ON id_a = ca.doc_id JOIN shcnt cb ON id_b = cb.doc_id
               WHERE inter * 2 > ca.c + cb.c - inter)"""

  /** Unrolled fold-forward CTE chain for the gate replays (q104/q105):
    * given a symmetric near-dup relation `nd(u, v)` and the initial
    * accepted set `acc0(id)`, emits rej1/acc1 … rejN/accN — per batch
    * i (ids with id%4 = i, replayed in order), a doc is rejected if it
    * near-dups any ACCEPTED-SO-FAR doc ('near-dup of corpus') or a
    * LOWER-id doc of its own batch ('near-dup within batch'), exactly
    * the gate's one-shot flagging; survivors fold into acc_i.
    */
  private def gateFoldCtes(idExpr: String, table: String, nBatches: Int): String =
    (1 to nBatches).map { i =>
      s"""rej$i AS (SELECT id, min(reason) AS reason FROM (
           SELECT n.u AS id, 'near-dup of corpus' AS reason
           FROM nd n JOIN acc${i - 1} a ON n.v = a.id WHERE n.u % 4 = $i
           UNION ALL
           SELECT n.u AS id, 'near-dup within batch' AS reason
           FROM nd n WHERE n.u % 4 = $i AND n.v % 4 = $i AND n.u > n.v) GROUP BY id),
         acc$i AS (SELECT id FROM acc${i - 1} UNION ALL
           SELECT $idExpr FROM $table WHERE $idExpr % 4 = $i
             AND $idExpr NOT IN (SELECT id FROM rej$i))"""
    }.mkString(",\n")

  /** The rejection chain's union for the final per-doc status join. */
  private def gateRejUnion(nBatches: Int): String =
    (1 to nBatches).map(i => s"SELECT id, reason FROM rej$i").mkString(" UNION ALL ")

  /** Unrolled fold chain for the curation-gate replays (q114/q115):
    * per batch i, the decision against the carried digest set
    * (duplicate beats near-dup beats quality beats contamination), the
    * split of kept docs, append packing from the running train-token
    * total, and the state advance (digests grow by ALL batch digests —
    * a decision is immutable once made, so even a quality-rejected
    * doc's digest marks later copies as duplicates).
    *
    * With `nd = true` (q115, the composed near-dup gate) the chain
    * additionally folds the REP-corpus state: `ndq(u, v)` is the
    * symmetric verified near-dup relation (band collision + exact
    * jaccard, supplied by the caller) and `rep0` the standing rep ids;
    * per batch, a non-duplicate doc is 'near-dup' if it relates to any
    * carried rep or to a LOWER-id non-duplicate of its own batch
    * (exactly DedupGate's one-shot flagging), and unflagged
    * non-duplicates fold into rep_i — whatever their quality/
    * contamination outcome, matching the carried-digest rule.
    */
  private def curationFoldCtes(nBatches: Int, nd: Boolean = false): String =
    (1 to nBatches).map { i =>
      val ndCtes = if (!nd) "" else s"""
         dup$i AS (SELECT doc_id FROM bdg$i
             WHERE digest IN (SELECT digest FROM dig${i - 1}) OR rn > 1),
         nodup$i AS (SELECT doc_id FROM bdg$i
             WHERE doc_id NOT IN (SELECT doc_id FROM dup$i)),
         ndf$i AS (SELECT DISTINCT n.u AS doc_id FROM ndq n JOIN rep${i - 1} r ON n.v = r.doc_id
             WHERE n.u IN (SELECT doc_id FROM nodup$i)
             UNION
             SELECT DISTINCT n.u FROM ndq n
             WHERE n.u IN (SELECT doc_id FROM nodup$i)
               AND n.v IN (SELECT doc_id FROM nodup$i) AND n.u > n.v),
         rep$i AS (SELECT doc_id FROM rep${i - 1}
             UNION SELECT doc_id FROM nodup$i
             WHERE doc_id NOT IN (SELECT doc_id FROM ndf$i)),"""
      val statusCase =
        if (nd)
          s"""CASE WHEN doc_id IN (SELECT doc_id FROM dup$i) THEN 'duplicate'
                  WHEN doc_id IN (SELECT doc_id FROM ndf$i) THEN 'near-dup'
                  WHEN doc_id NOT IN (SELECT doc_id FROM gkq) THEN 'quality'
                  WHEN doc_id IN (SELECT doc_id FROM contq) THEN 'contaminated'
                  ELSE 'ok' END"""
        else
          s"""CASE WHEN digest IN (SELECT digest FROM dig${i - 1}) OR rn > 1 THEN 'duplicate'
                  WHEN doc_id NOT IN (SELECT doc_id FROM gkq) THEN 'quality'
                  WHEN doc_id IN (SELECT doc_id FROM contq) THEN 'contaminated'
                  ELSE 'ok' END"""
      s"""bdg$i AS (SELECT doc_id, text, md5(text) AS digest,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
           FROM corpusq WHERE doc_id % 4 = $i),$ndCtes
         st$i AS (SELECT doc_id, text, digest,
             $statusCase AS status
           FROM bdg$i),
         ks$i AS (SELECT doc_id, text, status,
             CASE WHEN status <> 'ok' THEN 'none'
                  WHEN substr(md5(text), 1, 2) < 'e6' THEN 'train'
                  WHEN substr(md5(text), 1, 2) < 'f3' THEN 'val'
                  ELSE 'test' END AS split
           FROM st$i),
         tk$i AS (SELECT doc_id,
             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
             md5(text) AS okey
           FROM ks$i WHERE split = 'train'),
         cum$i AS (SELECT doc_id,
             CAST((SELECT tot FROM tot${i - 1}) +
               coalesce(sum(n_tokens) OVER (ORDER BY okey, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
           FROM tk$i),
         tot$i AS (SELECT CAST((SELECT tot FROM tot${i - 1}) +
               coalesce((SELECT sum(n_tokens) FROM tk$i), 0) AS BIGINT) AS tot),
         dig$i AS (SELECT digest FROM dig${i - 1}
                   UNION SELECT DISTINCT digest FROM bdg$i),
         dec$i AS (SELECT k.doc_id, CAST($i AS BIGINT) AS batch, k.status, k.split,
             CAST(coalesce(c.cb // 16384, -1) AS BIGINT) AS shard_id,
             CAST(coalesce(c.cb % 16384, -1) AS BIGINT) AS offset_tokens
           FROM ks$i k LEFT JOIN cum$i c USING (doc_id))"""
    }.mkString(",\n")

  /** q102's Gopher-keep stage over `corpus$sfx`, suffix-parameterized
    * so q111 can replay it on the standing and batch subsets.
    */
  private def gopherKeepCte(sfx: String): String =
    s"""gw$sfx AS (SELECT doc_id, text, regexp_extract_all(text, '\\S+') AS w FROM corpus$sfx),
       gm$sfx AS (SELECT doc_id,
                CAST(len(w) AS BIGINT) AS n_words,
                CAST(coalesce(list_sum(list_transform(w, x -> len(x))), 0) AS BIGINT) AS word_chars,
                CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha_words,
                CAST(len(regexp_extract_all(text, '#')) +
                     len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT) AS symbols,
                CAST(len(list_filter(w, x -> lower(x) IN
                     ('the','be','to','of','and','that','have','with'))) AS BIGINT) AS stop_hits
              FROM gw$sfx),
       gk$sfx AS (SELECT doc_id FROM gm$sfx
              WHERE n_words >= 50 AND n_words <= 100000
                AND word_chars * 100 // greatest(n_words, 1) BETWEEN 300 AND 1000
                AND symbols * 1000 // greatest(n_words, 1) < 100
                AND stop_hits >= 2
                AND alpha_words * 1000 // greatest(n_words, 1) >= 800)"""

  private val minhashPermValues: String =
    graft.ops.Dedup.minhashCoeffs(64).zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")

  /** The q31/q37 variant: the index joins on 60-bit shingle hashes
    * (Dedup.jaccardPairsNative — same move as the reference's integer
    * gram index), stop-shingles (df > ShingleCap) dropped before the
    * self-join, set sizes counted over kept shingles.
    */
  private val cappedJaccardCte =
    s"""$shingleCte,
       shh AS (SELECT doc_id, ${h60("shingle")} AS h FROM sh),
       hot AS (SELECT h FROM shh GROUP BY h HAVING count(*) > $ShingleCap),
       shk AS (SELECT doc_id, h FROM shh WHERE h NOT IN (SELECT h FROM hot)),
       shcnt AS (SELECT doc_id, count(*) AS c FROM shk GROUP BY doc_id),
       inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
                 FROM shk a JOIN shk b ON a.h = b.h AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
       jac AS (SELECT id_a, id_b, inter, ca.c + cb.c - inter AS union_size
               FROM inter JOIN shcnt ca ON id_a = ca.doc_id JOIN shcnt cb ON id_b = cb.doc_id
               WHERE inter * 2 > ca.c + cb.c - inter)"""

  /** The q32 minhash band-key reconstruction, parameterized over a
    * `docsx(doc_id, text)` CTE (q182/q183 run it over the boilerplate-
    * augmented corpus). Emits shx (distinct string shingles — also the
    * Jaccard-verify input) and bk (doc_id, band, key).
    */
  private def bandKeyCtesOver(src: String): String =
    s"""toksx AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM $src),
       shx AS (SELECT DISTINCT doc_id, w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)] || ' ' || w[CAST(i+2 AS INT)] AS shingle
               FROM toksx, UNNEST(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3),
       perm(i, a, b) AS (VALUES $minhashPermValues),
       hhx AS (SELECT doc_id, ${h60("shingle")} % 2147483647 AS h FROM shx),
       mhx AS (SELECT doc_id, i, min((a * h + b) % 2147483647) AS h
               FROM hhx, perm GROUP BY doc_id, i),
       bk AS (SELECT doc_id, i // 4 AS band, md5(string_agg(h::VARCHAR, ',' ORDER BY i)) AS key
              FROM mhx GROUP BY doc_id, i // 4)"""

  /** The q184 closed form: what [[graft.ops.Html.extract]] returns
    * over [[graft.ops.Html.encodePage]]'d text, computed straight from
    * `documents.text` — head/nav suppress (boilerplate), so the
    * extracted text is EXACTLY the normalized input (space/tab/CR runs
    * collapse, trim, empties drop) and every count is arithmetic in
    * the input's line/char counts (15 fixed tags + 2 per raw line; one
    * entity per `&`/`<`/`>`; blocks = nonempty normalized lines; 2
    * boilerplate subtrees). Emits `hx(doc_id, text, n_tags,
    * n_script_blocks, n_style_blocks, n_comments, n_entities,
    * n_blocks, n_boilerplate)`.
    */
  private val htmlExtractCte: String =
    """hl AS (SELECT doc_id,
             string_split(text, chr(10)) AS rawlines,
             list_filter(list_transform(string_split(text, chr(10)),
               l -> trim(regexp_replace(l, '[ \t\r]+', ' ', 'g'))),
               l -> l <> '') AS normlines,
             CAST(len(regexp_extract_all(text, '[&<>]')) AS BIGINT) AS special_chars
             FROM documents),
       hx AS (SELECT doc_id,
              array_to_string(normlines, chr(10)) AS text,
              CAST(15 + 2 * len(rawlines) AS BIGINT) AS n_tags,
              CAST(1 AS BIGINT) AS n_script_blocks,
              CAST(1 AS BIGINT) AS n_style_blocks,
              CAST(1 AS BIGINT) AS n_comments,
              CAST(special_chars AS BIGINT) AS n_entities,
              CAST(len(normlines) AS BIGINT) AS n_blocks,
              CAST(2 AS BIGINT) AS n_boilerplate
              FROM hl)"""

  /** Deterministic MESSY URI for the URL-operator legs (q187-q189):
    * mixed-case scheme and host, default port when id%3=0 (strip),
    * explicit :8080 when id%3=1 (keep), no port otherwise, unsorted
    * query params, a fragment — every piece a doc_id residue so the
    * DuckDB twin regenerates raw and normalized forms analytically.
    */
  private def messyUriCol(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val tld = element_at(
      array(lit("com"), lit("org"), lit("co.uk"), lit("com.au")),
      ((id % 4) + 1).cast("int"))
    concat(
      when(id % 2 === 0, lit("HTTPS")).otherwise(lit("HTTP")),
      lit("://WWW.Site"), (id % 40).cast("string"), lit("."), tld,
      when(id % 3 === 0, when(id % 2 === 0, lit(":443")).otherwise(lit(":80")))
        .when(id % 3 === 1, lit(":8080")).otherwise(lit("")),
      lit("/Docs/"), (id % 25).cast("string"), lit("/"),
      lit("?b="), (id % 7).cast("string"), lit("&a="), (id % 5).cast("string"),
      lit("#s"), id.cast("string"))
  }

  /** SQL twins of [[messyUriCol]] and its normalized/derived forms,
    * over a BIGINT id expression.
    */
  private def sqlMessyUri(id: String): String =
    s"""CASE WHEN ($id) % 2 = 0 THEN 'HTTPS' ELSE 'HTTP' END ||
       '://WWW.Site' || (($id) % 40) || '.' ||
       (['com','org','co.uk','com.au'])[CAST(($id) % 4 + 1 AS INT)] ||
       CASE WHEN ($id) % 3 = 0 THEN (CASE WHEN ($id) % 2 = 0 THEN ':443' ELSE ':80' END)
            WHEN ($id) % 3 = 1 THEN ':8080' ELSE '' END ||
       '/Docs/' || (($id) % 25) || '/?b=' || (($id) % 7) || '&a=' || (($id) % 5) ||
       '#s' || ($id)"""

  private def sqlNormUri(id: String): String =
    s"""CASE WHEN ($id) % 2 = 0 THEN 'https' ELSE 'http' END ||
       '://www.site' || (($id) % 40) || '.' ||
       (['com','org','co.uk','com.au'])[CAST(($id) % 4 + 1 AS INT)] ||
       CASE WHEN ($id) % 3 = 1 THEN ':8080' ELSE '' END ||
       '/Docs/' || (($id) % 25) || '/?a=' || (($id) % 5) || '&b=' || (($id) % 7)"""

  private def sqlUriHost(id: String): String =
    s"""'www.site' || (($id) % 40) || '.' ||
       (['com','org','co.uk','com.au'])[CAST(($id) % 4 + 1 AS INT)]"""

  private def sqlUriDomain(id: String): String =
    s"""'site' || (($id) % 40) || '.' ||
       (['com','org','co.uk','com.au'])[CAST(($id) % 4 + 1 AS INT)]"""

  /** The boilerplate-augmented corpus CTE shared by q182/q183. */
  private val lshAugDocsCte: String =
    s"""docsx AS (SELECT doc_id, text FROM documents
                  UNION ALL
                  SELECT doc_id + 1000000, '$LshHotBoiler' FROM documents WHERE doc_id < 32)"""

  /** Sequential-fold double dot product of two DOUBLE[] exprs (same IEEE
    * op order as Similarity.dot).
    */
  private def sqlDot(a: String, b: String, dim: Int): String =
    s"list_reduce(list_prepend(0.0, [$a[CAST(i AS INT)] * $b[CAST(i AS INT)] for i in range(1, ${dim + 1})]), (x, y) -> x + y)"

  private def sqlCosine(a: String, b: String, dim: Int): String =
    s"(${sqlDot(a, b, dim)} / (sqrt(${sqlDot(a, a, dim)}) * sqrt(${sqlDot(b, b, dim)})))"

  /** Exact integer dot of two BIGINT[] exprs (the quantized-search
    * inner product — no FP until the caller normalizes).
    */
  private def sqlDotInt(a: String, b: String, dim: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), [$a[CAST(i AS INT)] * $b[CAST(i AS INT)] for i in range(1, ${dim + 1})]), (x, y) -> x + y)"

  private val embCte =
    "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)"

  /** The BPE kernel's DuckDB replay, generated from
    * [[graft.functions.BpeTokenizer.Merges]] (single source of truth):
    * each code point wrapped in chr(31) separators (`|c|` concatenated
    * → `|a||b||c|`), then ONE replace per merge — the pattern
    * `|a||b|` → `|ab|` consumes both wrapped tokens whole, so
    * left-to-right non-overlapping replace is exactly the kernel's
    * one-pass-per-merge scan. Token count = separators/2.
    *
    * PRECONDITION (oracle side only — the kernel handles any input):
    * the encoding is ambiguous for text containing a literal U+001F,
    * so the q118 oracle appends a poison row whenever any document
    * contains one — the gate then goes RED with a diagnosable row
    * instead of silently diverging. Real corpora with control chars
    * would need a different separator choice per corpus.
    */
  private val bpeEncodeSql: String = {
    val us = "chr(31)"
    def lit(x: String) = "'" + x.replace("'", "''") + "'"
    val init = s"CASE WHEN len(text) = 0 THEN '' ELSE $us || " +
      s"array_to_string(string_split(text, ''), $us || $us) || $us END"
    graft.functions.BpeTokenizer.Merges.foldLeft(init) { case (acc, (a, b)) =>
      s"replace($acc, $us || ${lit(a)} || $us || $us || ${lit(b)} || $us, " +
        s"$us || ${lit(a + b)} || $us)"
    }
  }

  /** The q153 oracle, GENERATED for `rounds` rounds: unrolled
    * (pair-count → argmax → separator-wrapped replace) chain over the
    * q118 encoding. Each round's top CTE derives the merge the engine
    * should have learned; the next state applies it via scalar
    * subqueries, so the oracle never sees the learned table — it
    * re-derives it.
    */
  private def bpeTrainSql(rounds: Int): String = {
    val us = "chr(31)"
    val sep = s"$us || $us"
    val init = s"CASE WHEN len(text) = 0 THEN '' ELSE $us || " +
      s"array_to_string(string_split(text, ''), $sep) || $us END"
    val sb = new StringBuilder
    sb ++= s"WITH s0 AS (SELECT doc_id, $init AS s FROM documents)"
    for (r <- 1 to rounds) {
      val prev = s"s${r - 1}"
      sb ++= s""",
         tk$r AS (SELECT string_split(substr(s, 2, len(s) - 2), $sep) AS t
                  FROM $prev WHERE len(s) > 0),
         pc$r AS (SELECT t[CAST(i AS INT)] AS a, t[CAST(i+1 AS INT)] AS b,
                    count(*) AS cnt
                  FROM tk$r, UNNEST(range(1, len(t))) u(i)
                  GROUP BY 1, 2 HAVING count(*) >= 2),
         t$r AS (SELECT a, b, cnt FROM pc$r ORDER BY cnt DESC, a, b LIMIT 1),
         s$r AS (SELECT doc_id,
                   replace(s,
                     $us || (SELECT a FROM t$r) || $sep || (SELECT b FROM t$r) || $us,
                     $us || (SELECT a || b FROM t$r) || $us) AS s
                 FROM $prev)"""
    }
    sb ++= (1 to rounds).map(r =>
      s"""
         SELECT CAST($r AS BIGINT) AS round, a, b, CAST(cnt AS BIGINT) AS pair_count
         FROM t$r""").mkString("", " UNION ALL", "")
    sb.toString
  }

  /** The q166 oracle: [[bpeTrainSql]]'s unrolled chain over the
    * whitespace word HISTOGRAM instead of raw documents — pair counts
    * are Σ word-multiplicity (weighted), matching
    * [[graft.ops.BpeTrain.learnMergesHistogram]]'s statistics exactly.
    */
  private def bpeTrainHistSql(rounds: Int): String = {
    val us = "chr(31)"
    val sep = s"$us || $us"
    val init = s"$us || array_to_string(string_split(word, ''), $sep) || $us"
    val sb = new StringBuilder
    sb ++= s"""WITH w0 AS (SELECT word, count(*) AS wc
           FROM (SELECT unnest(regexp_extract_all(text, '\\S+')) AS word
                 FROM documents)
           GROUP BY 1),
         s0 AS (SELECT wc, $init AS s FROM w0)"""
    for (r <- 1 to rounds) {
      val prev = s"s${r - 1}"
      // MATERIALIZED: each round's state is referenced several times
      // (tk + the scalar subqueries) — inlined CTEs would re-open the
      // base parquet ~4^rounds times and exhaust file handles.
      sb ++= s""",
         tk$r AS (SELECT wc, string_split(substr(s, 2, len(s) - 2), $sep) AS t
                  FROM $prev),
         pc$r AS (SELECT t[CAST(i AS INT)] AS a, t[CAST(i+1 AS INT)] AS b,
                    sum(wc) AS cnt
                  FROM tk$r, UNNEST(range(1, len(t))) u(i)
                  GROUP BY 1, 2 HAVING sum(wc) >= 2),
         t$r AS MATERIALIZED (SELECT a, b, cnt FROM pc$r ORDER BY cnt DESC, a, b LIMIT 1),
         s$r AS MATERIALIZED (SELECT wc,
                   replace(s,
                     $us || (SELECT a FROM t$r) || $sep || (SELECT b FROM t$r) || $us,
                     $us || (SELECT a || b FROM t$r) || $us) AS s
                 FROM $prev)"""
    }
    sb ++= (1 to rounds).map(r =>
      s"""
         SELECT CAST($r AS BIGINT) AS round, a, b, CAST(cnt AS BIGINT) AS pair_count
         FROM t$r""").mkString("", " UNION ALL", "")
    sb.toString
  }

  /** The q154 oracle, assembled per modality. Hash derivations reuse
    * the established chains (q124 image aHash, q142 audio envelope
    * with the 24-bit branch on FLAC-routed ids, q129 video frame
    * aHash at packed keys); each modality then runs the identical
    * band/pigeonhole/annotation tail with its own batch expression
    * (video batches derive from the UNPACKED doc id). The gate folds
    * batches doc % 4 = 0..3 as folds 1..4, so batch = doc % 4 + 1 and
    * a partner counts iff its batch ≤ the doc's.
    */
  private val mixedGateSql: String = {
    val hexb = (k: String) =>
      s"""(strpos('0123456789ABCDEF', substr(hx, CAST(2*($k)+1 AS INT), 1)) - 1) * 16
             + strpos('0123456789ABCDEF', substr(hx, CAST(2*($k)+2 AS INT), 1)) - 1"""
    // the shared cells -> bits -> 4x16-bit band packing over any
    // per-unit (doc [, f]) pixel-value stream named ${p}_vals(.., pv)
    def aHashBv4(p: String, unit: String): String = s"""
         ${p}_cells AS (SELECT $unit,
             (((p // w) * 8) // h) * 8 + ((p % w) * 8) // w AS cell,
             sum(pv) AS s, count(*) AS c
           FROM ${p}_vals GROUP BY ALL),
         ${p}_tot AS (SELECT $unit, sum(s) AS ts, sum(c) AS tc
                 FROM ${p}_cells GROUP BY ALL),
         ${p}_bits AS (SELECT $unit, cell,
             CASE WHEN s * tc > ts * c THEN 1 ELSE 0 END AS b
           FROM ${p}_cells JOIN ${p}_tot USING (${unit.replace(", ", ", ").split(", ").mkString(", ")})),
         ${p}_bv4 AS (SELECT $unit,
             sum(CASE WHEN cell // 16 = 0 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b0,
             sum(CASE WHEN cell // 16 = 1 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b1,
             sum(CASE WHEN cell // 16 = 2 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b2,
             sum(CASE WHEN cell // 16 = 3 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b3
           FROM ${p}_bits GROUP BY ALL)"""
    def tail(p: String, batchOf: String, modality: String): String = s"""
         ${p}_bands AS (SELECT doc_id, b0, b1, b2, b3, bnd,
             CASE bnd WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS key
           FROM ${p}_keys, UNNEST(range(4)) t(bnd)),
         ${p}_hot AS (SELECT bnd, key FROM ${p}_bands GROUP BY bnd, key HAVING count(*) > 1000),
         ${p}_kept AS (SELECT ${p}_bands.* FROM ${p}_bands ANTI JOIN ${p}_hot USING (bnd, key)),
         ${p}_fl AS (SELECT id_a, id_b, hamming FROM (
             SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
               CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
                 + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS BIGINT) AS hamming
             FROM ${p}_kept x JOIN ${p}_kept y
               ON x.bnd = y.bnd AND x.key = y.key AND x.doc_id < y.doc_id)
           WHERE hamming <= 3),
         ${p}_sym AS (SELECT id_a AS doc_id, id_b AS partner, hamming FROM ${p}_fl
                 UNION ALL SELECT id_b, id_a, hamming FROM ${p}_fl),
         ${p}_ann AS (SELECT doc_id, count(*) AS n, min(hamming) AS mh
                 FROM ${p}_sym s
                 WHERE ${batchOf.replace("doc_id", "s.partner")} <=
                       ${batchOf.replace("doc_id", "s.doc_id")}
                 GROUP BY 1),
         ${p}_out AS (SELECT d.doc_id,
             CAST(${batchOf.replace("doc_id", "d.doc_id")} + 1 AS BIGINT) AS batch,
             CAST(coalesce(a.n, 0) AS BIGINT) AS n_partners,
             CAST(coalesce(a.mh, -1) AS BIGINT) AS min_hamming,
             '$modality' AS modality
           FROM (SELECT doc_id FROM ${p}_keys) d
           LEFT JOIN ${p}_ann a USING (doc_id))"""
    s"""WITH aug AS (SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 15000015, text FROM documents WHERE doc_id % 67 = 0
           UNION ALL
           SELECT doc_id + 45000045, '~~~' || substr(text, 4)
           FROM documents
           WHERE doc_id % 61 = 0 AND octet_length(encode(text)) = length(text)
             AND length(text) >= 300
           UNION ALL
           SELECT doc_id + 30000030, text FROM documents WHERE doc_id % 30 = 10
           UNION ALL
           SELECT doc_id + 60000060, '~~~' || substr(text, 4)
           FROM documents
           WHERE doc_id % 30 = 25 AND octet_length(encode(text)) = length(text)
             AND length(text) >= 300),
         src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t FROM aug),

         im_dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             8 + octet_length(encode(t)) % 40 AS w,
             6 + octet_length(encode(t)) % 23 AS h
           FROM src WHERE doc_id % 3 = 0 AND doc_id % 5 <> 0),
         im_bytes AS (SELECT doc_id, w, h, p, hx, (3*p + ch) % l AS k
           FROM im_dims, UNNEST(range(0, w*h)) u(p), UNNEST(range(3)) v(ch)),
         im_vals0 AS (SELECT doc_id, w, h, p, ${hexb("k")} AS bv FROM im_bytes),
         im_vals AS (SELECT doc_id, w, h, p, sum(bv) AS pv
           FROM im_vals0 GROUP BY 1, 2, 3, 4),
         ${aHashBv4("im", "doc_id").drop(1)},
         im_keys AS (SELECT doc_id, b0, b1, b2, b3 FROM im_bv4),
         ${tail("im", "doc_id % 4", "image").drop(1)},

         jp_dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             8 * (1 + octet_length(encode(t)) % 5) AS w,
             8 * (1 + octet_length(encode(t)) % 4) AS h
           FROM src WHERE doc_id % 3 = 0 AND doc_id % 5 = 0),
         jp_bsum AS (SELECT doc_id, w, h, by, bx,
             sum(${hexb("((by*8 + i//8)*w + bx*8 + i%8) % l")}) - 8192 AS s
           FROM jp_dims, UNNEST(range(0, h//8)) u1(by), UNNEST(range(0, w//8)) u2(bx),
                UNNEST(range(64)) u3(i)
           GROUP BY 1, 2, 3, 4, 5),
         jp_blocks AS (SELECT doc_id, w, h, by, bx,
             greatest(0, least(255, 128 + 2 * CAST(trunc(s / 128.0) AS BIGINT))) AS pv
           FROM jp_bsum),
         jp_pixpos AS (SELECT doc_id, w, h, p
           FROM jp_dims, UNNEST(range(0, w*h)) u(p)),
         jp_vals AS (SELECT x.doc_id, x.w, x.h, x.p, b.pv
           FROM jp_pixpos x JOIN jp_blocks b
             ON b.doc_id = x.doc_id AND b.by = (x.p // x.w) // 8
             AND b.bx = (x.p % x.w) // 8),
         ${aHashBv4("jp", "doc_id").drop(1)},
         jp_keys AS (SELECT doc_id, b0, b1, b2, b3 FROM jp_bv4),
         ${tail("jp", "doc_id % 4", "jpeg").drop(1)},

         au_dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             (64 + octet_length(encode(t)) % 512)
               * (1 + octet_length(encode(t)) % 2) AS m,
             CASE WHEN doc_id % 2 = 1 AND octet_length(encode(t)) % 7 = 3
               THEN 3 ELSE 2 END AS st
           FROM src WHERE doc_id % 3 = 1 AND doc_id % 5 <> 0),
         au_bytes AS (SELECT doc_id, m, st, j, hx,
             (st*j) % l AS k0, (st*j + 1) % l AS k1, (st*j + 2) % l AS k2
           FROM au_dims, UNNEST(range(0, m)) u(j)),
         au_sv AS (SELECT doc_id, m, st, j,
             ${hexb("k0")}
             + 256 * (${hexb("k1")})
             + CASE WHEN st = 3 THEN 65536 * (${hexb("k2")}) ELSE 0 END AS v
           FROM au_bytes),
         au_cells AS (SELECT doc_id, (j*64) // m AS cell,
             sum(abs(CASE WHEN st = 2 AND v >= 32768 THEN v - 65536
                          WHEN st = 3 AND v >= 8388608 THEN v - 16777216
                          ELSE v END)) AS s,
             count(*) AS c
           FROM au_sv GROUP BY 1, 2),
         au_tot AS (SELECT doc_id, sum(s) AS ts, sum(c) AS tc FROM au_cells GROUP BY 1),
         au_bits AS (SELECT doc_id, cell,
             CASE WHEN s * tc > ts * c THEN 1 ELSE 0 END AS b
           FROM au_cells JOIN au_tot USING (doc_id)),
         au_bv4 AS (SELECT doc_id,
             sum(CASE WHEN cell // 16 = 0 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b0,
             sum(CASE WHEN cell // 16 = 1 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b1,
             sum(CASE WHEN cell // 16 = 2 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b2,
             sum(CASE WHEN cell // 16 = 3 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b3
           FROM au_bits GROUP BY 1),
         aa_dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             64 + octet_length(encode(t)) % 512 AS m
           FROM src WHERE doc_id % 3 = 2 AND doc_id % 5 = 0
             AND octet_length(encode(t)) % 4 = 1),
         aa_bytes AS (SELECT doc_id, m, j, hx,
             (2*j) % l AS k0, (2*j + 1) % l AS k1
           FROM aa_dims, UNNEST(range(0, m)) u(j)),
         aa_sv AS (SELECT doc_id, m, j,
             ${hexb("k0")} + 256 * (${hexb("k1")}) AS v
           FROM aa_bytes),
         aa_cells AS (SELECT doc_id, (j*64) // m AS cell,
             sum(abs(CASE WHEN v >= 32768 THEN v - 65536 ELSE v END)) AS s,
             count(*) AS c
           FROM aa_sv GROUP BY 1, 2),
         aa_tot AS (SELECT doc_id, sum(s) AS ts, sum(c) AS tc FROM aa_cells GROUP BY 1),
         aa_bits AS (SELECT doc_id, cell,
             CASE WHEN s * tc > ts * c THEN 1 ELSE 0 END AS b
           FROM aa_cells JOIN aa_tot USING (doc_id)),
         aa_bv4 AS (SELECT doc_id,
             sum(CASE WHEN cell // 16 = 0 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b0,
             sum(CASE WHEN cell // 16 = 1 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b1,
             sum(CASE WHEN cell // 16 = 2 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b2,
             sum(CASE WHEN cell // 16 = 3 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b3
           FROM aa_bits GROUP BY 1),
         au_keys AS (SELECT doc_id, b0, b1, b2, b3 FROM au_bv4
                 UNION ALL SELECT doc_id, b0, b1, b2, b3 FROM aa_bv4),
         ${tail("au", "doc_id % 4", "audio").drop(1)},

         vy_dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             8 + octet_length(encode(t)) % 24 AS w,
             6 + octet_length(encode(t)) % 17 AS h,
             2 + octet_length(encode(t)) % 5 AS nf
           FROM src WHERE doc_id % 3 = 2 AND doc_id % 5 <> 0),
         vy_bytes AS (SELECT doc_id, w, h, f, p, hx, (f*w*h + p) % l AS k
           FROM vy_dims, UNNEST(range(0, nf)) fr(f), UNNEST(range(0, w*h)) u(p)),
         vy_vals AS (SELECT doc_id, w, h, f, p, ${hexb("k")} AS pv FROM vy_bytes),
         ${aHashBv4("vy", "doc_id, f").drop(1)},

         va_dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             8 * (1 + octet_length(encode(t)) % 5) AS w,
             8 * (1 + octet_length(encode(t)) % 4) AS h,
             2 + octet_length(encode(t)) % 5 AS nf
           FROM src WHERE doc_id % 3 = 2 AND doc_id % 5 = 0),
         va_bsum AS (SELECT doc_id, w, h, f, by, bx,
             sum(${hexb("(((by*8 + i//8)*w + bx*8 + i%8) + 13*f) % l")}) - 8192 AS s
           FROM va_dims, UNNEST(range(0, nf)) fr(f),
                UNNEST(range(0, h//8)) u1(by), UNNEST(range(0, w//8)) u2(bx),
                UNNEST(range(64)) u3(i)
           GROUP BY 1, 2, 3, 4, 5, 6),
         va_blocks AS (SELECT doc_id, w, h, f, by, bx,
             greatest(0, least(255, 128 + 2 * CAST(trunc(s / 128.0) AS BIGINT))) AS pv
           FROM va_bsum),
         va_pixpos AS (SELECT doc_id, w, h, f, p
           FROM va_dims, UNNEST(range(0, nf)) fr(f), UNNEST(range(0, w*h)) u(p)),
         va_vals AS (SELECT x.doc_id, x.w, x.h, x.f, x.p, b.pv
           FROM va_pixpos x JOIN va_blocks b
             ON b.doc_id = x.doc_id AND b.f = x.f
             AND b.by = (x.p // x.w) // 8 AND b.bx = (x.p % x.w) // 8),
         ${aHashBv4("va", "doc_id, f").drop(1)},

         vi_keys AS (SELECT doc_id * 1048576 + f AS doc_id, b0, b1, b2, b3 FROM vy_bv4
                 UNION ALL SELECT doc_id * 1048576 + f, b0, b1, b2, b3 FROM va_bv4),
         ${tail("vi", "(doc_id // 1048576) % 4", "video").drop(1)},

         tx_tf AS (SELECT doc_id, token, count(*) AS cnt FROM
             (SELECT doc_id, unnest(regexp_extract_all(t, '\\S+')) AS token
              FROM src WHERE doc_id % 3 = 1 AND doc_id % 5 = 0)
             GROUP BY 1, 2),
         tx_th AS (SELECT doc_id, cnt, ${h60("token")} AS h FROM tx_tf),
         tx_sbits AS (SELECT doc_id, b,
             sum(CASE WHEN (h >> CAST(b AS INT)) & 1 = 1 THEN cnt ELSE -cnt END) AS s
           FROM tx_th, UNNEST(range(60)) AS t(b) GROUP BY 1, 2),
         tx_fp AS (SELECT doc_id,
             sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS f
           FROM tx_sbits GROUP BY 1),
         tx_keys AS (SELECT doc_id,
             f & 32767 AS b0, (f >> 15) & 32767 AS b1,
             (f >> 30) & 32767 AS b2, (f >> 45) & 32767 AS b3
           FROM tx_fp),
         ${tail("tx", "doc_id % 4", "text").drop(1)}
         SELECT doc_id, batch, n_partners, min_hamming, modality FROM im_out
         UNION ALL SELECT doc_id, batch, n_partners, min_hamming, modality FROM jp_out
         UNION ALL SELECT doc_id, batch, n_partners, min_hamming, modality FROM au_out
         UNION ALL SELECT doc_id, batch, n_partners, min_hamming, modality FROM vi_out
         UNION ALL SELECT doc_id, batch, n_partners, min_hamming, modality FROM tx_out"""
  }

  /** Where q39 exports its trained centroid table for the DuckDB twin.
    * SESSION-SCOPED (round 13): rooted at [[graft.OracleAux.dir]] —
    * Verify pins the root to its own outDir, every other JVM gets a
    * private temp dir, so concurrent sbt invocations cannot clobber
    * each other's exports; and the write itself is DEFERRED to
    * Verify's flush, so constructing the plan writes nothing. The
    * path is absolute either way, so the oracle SQL works regardless
    * of DuckDB's cwd (Verify dumps resolved SQL, then oracles run).
    */
  val CentroidExportPath = s"${graft.OracleAux.dir}/q39_centroids"

  /** q160's integer PQ codebook export — same contract as
    * [[CentroidExportPath]] (Verify flushes, then the oracle reads). */
  val PqExportPath = s"${graft.OracleAux.dir}/q160_pq_codebooks"

  /** q163's codebook export. Identical content to [[PqExportPath]]
    * (same deterministic training, same params) but its own path so
    * each query run satisfies its own oracle without ordering. */
  val PqRerankExportPath = s"${graft.OracleAux.dir}/q163_pq_codebooks"

  /** q164's gate-trained codebook export (initial batch = vec_id%4=0,
    * so the CONTENT differs from q160/q163's full-corpus training). */
  val PqGateExportPath = s"${graft.OracleAux.dir}/q164_pq_codebooks"

  /** q169's codebook export — the sampled-judge form of q160. */
  val PqSampleExportPath = s"${graft.OracleAux.dir}/q169_pq_codebooks"

  /** q175's TWO exports: the coarse quantizer (a one-subspace integer
    * codebook — numCells full-dim centroids) and the RESIDUAL
    * codebooks trained on sample residuals to the assigned centroid.
    */
  val IvfAdcCoarsePath = s"${graft.OracleAux.dir}/q175_ivfadc_coarse"
  val IvfAdcCbPath = s"${graft.OracleAux.dir}/q175_ivfadc_codebooks"

  /** q177's gate-trained RESIDUAL codebook export (trained on the
    * initial batch's residuals to its closure cells). */
  val IvfAdcGateExportPath = s"${graft.OracleAux.dir}/q177_ivfadc_gate_codebooks"

  /** q190's own codebook export (same training inputs as q177, but the
    * query must stay self-contained — it cannot ride q177's export).
    */
  val IvfAdcGateAdcExportPath = s"${graft.OracleAux.dir}/q190_ivfadc_gate_codebooks"

  /** q179's exports: the variance-balancing dimension permutation
    * (pos, src) and the codebooks trained on the permuted lattice. */
  val PqPermPath = s"${graft.OracleAux.dir}/q179_pq_permutation"
  val PqPermCbPath = s"${graft.OracleAux.dir}/q179_pq_codebooks"

  /** q181's exports (IVFADC + exact re-rank — its own training run). */
  val IvfAdcRrCoarsePath = s"${graft.OracleAux.dir}/q181_ivfadc_coarse"
  val IvfAdcRrCbPath = s"${graft.OracleAux.dir}/q181_ivfadc_codebooks"

  /** q165's TWO codebook exports: the initial training (phase 1,
    * batches 1-4 fold against these) and the drift-refresh retraining
    * (phase 2, batch 5) — the two-phase oracle reads both. */
  val PqDriftCb0Path = s"${graft.OracleAux.dir}/q165_pq_codebooks_initial"
  val PqDriftCb1Path = s"${graft.OracleAux.dir}/q165_pq_codebooks_refreshed"

  /** q180's two-phase exports (the RELATIVE auto-trigger twin of
    * q165's absolute-floor run — same drift corpus, same refresh
    * point, trigger fired by the single-step drop detector). */
  val PqDrift2Cb0Path = s"${graft.OracleAux.dir}/q180_pq_codebooks_initial"
  val PqDrift2Cb1Path = s"${graft.OracleAux.dir}/q180_pq_codebooks_refreshed"

  private val emailRe: String = graft.ops.TextAnalysis.EmailRe
  private val phoneRe: String = graft.ops.TextAnalysis.PhoneRe

  private val stopwordValues: String =
    TextAnalysis.stopwords.map { case (l, w) => s"('$l', '$w')" }.mkString(", ")

  private val oracleSqlBase: Map[String, String] = Map(
    "q16_hourly_events" ->
      """SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS hour_us, event_type,
         count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2""",

    "q17_asof_purchase_click" ->
      """SELECT p.event_id, p.user_id, c.event_id AS click_id,
         epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
         ON p.user_id = c.user_id AND p.ts >= c.ts""",

    "q18_json_props" ->
      """SELECT event_type,
         count(*) FILTER (CAST(json_extract_string(props, '$.k') AS BIGINT) > 50) AS n_hi,
         CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
         FROM events GROUP BY 1""",

    "q30_dedup_exact" ->
      """SELECT doc_id,
         min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
         count(*) OVER (PARTITION BY md5(text)) AS group_size
         FROM documents""",

    "q31_dedup_jaccard" ->
      s"WITH $cappedJaccardCte SELECT id_a, id_b, inter, union_size FROM jac",

    "q32_dedup_minhash_lsh" ->
      s"""WITH $jaccardCte,
         perm(i, a, b) AS (VALUES ${graft.ops.Dedup.minhashCoeffs(64).zipWithIndex
        .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")}),
         hh AS (SELECT doc_id, ${h60("shingle")} % 2147483647 AS h FROM sh),
         mh AS (SELECT doc_id, i, min((a * h + b) % 2147483647) AS h
                FROM hh, perm GROUP BY doc_id, i),
         bk AS (SELECT doc_id, i // 4 AS band, md5(string_agg(h::VARCHAR, ',' ORDER BY i)) AS key
                FROM mh GROUP BY doc_id, i // 4),
         cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                  FROM bk x JOIN bk y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)
         SELECT j.id_a, j.id_b, j.inter, j.union_size FROM jac j
         WHERE EXISTS (SELECT 1 FROM cand WHERE cand.id_a = j.id_a AND cand.id_b = j.id_b)""",

    "q33_dedup_simhash" ->
      s"""WITH tf AS (SELECT doc_id, token, count(*) AS cnt FROM
              (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token FROM documents)
              GROUP BY 1, 2),
         th AS (SELECT doc_id, cnt, ${h60("token")} AS h FROM tf),
         bits AS (SELECT doc_id, b,
                  sum(CASE WHEN (h >> CAST(b AS INT)) & 1 = 1 THEN cnt ELSE -cnt END) AS s
                  FROM th, UNNEST(range(60)) AS t(b) GROUP BY 1, 2),
         fp AS (SELECT doc_id,
                sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS f
                FROM bits GROUP BY 1),
         ch AS (SELECT doc_id, f, c, (f >> CAST(c*15 AS INT)) & 32767 AS ckey
                FROM fp, UNNEST(range(4)) AS t(c)),
         pr AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
                       CAST(bit_count(xor(x.f, y.f)) AS BIGINT) AS hamming
                FROM ch x JOIN ch y ON x.c = y.c AND x.ckey = y.ckey AND x.doc_id < y.doc_id)
         SELECT id_a, id_b, hamming FROM pr WHERE hamming <= 3""",

    "q34_dedup_embedding" ->
      s"""WITH $embCte
         SELECT a.vec_id AS id_a, b.vec_id AS id_b
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         WHERE ${sqlCosine("a.v", "b.v", 64)} >= 0.45""",

    "q35_ann_topk" ->
      s"""WITH $embCte,
         q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0),
         scored AS (SELECT query_id, e.vec_id AS neighbor_id,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY ${sqlCosine("qv", "e.v", 64)} DESC, e.vec_id) AS rank
                    FROM q JOIN e ON e.vec_id <> query_id)
         SELECT query_id, rank, neighbor_id FROM scored WHERE rank <= 10""",

    "q101_quantized_recall" ->
      s"""WITH $embCte,
         mx AS (SELECT vec_id, list_max(list_transform(v, x -> abs(x))) AS m FROM e),
         qt AS (SELECT e.vec_id,
                  CASE WHEN mx.m = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
                       ELSE list_transform(v, x -> CAST(trunc(x * (127.0 / mx.m)) AS BIGINT))
                  END AS qv
                FROM e JOIN mx USING (vec_id)),
         qn AS (SELECT vec_id, qv,
                  sqrt(CAST(${sqlDotInt("qv", "qv", 64)} AS DOUBLE)) AS nrm
                FROM qt),
         qq AS (SELECT vec_id AS query_id, qv AS aq, nrm AS an FROM qn WHERE vec_id % 100 = 0),
         qscored AS (SELECT query_id, qn.vec_id AS neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY CAST(${sqlDotInt("aq", "qn.qv", 64)} AS DOUBLE)
                                  / (an * qn.nrm) DESC, qn.vec_id) AS rank
                     FROM qq JOIN qn ON qn.vec_id <> query_id),
         qtop AS (SELECT query_id, neighbor_id FROM qscored WHERE rank <= 10),
         fq AS (SELECT vec_id AS query_id, v AS fqv FROM e WHERE vec_id % 100 = 0),
         fscored AS (SELECT query_id, e.vec_id AS neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY ${sqlCosine("fqv", "e.v", 64)} DESC, e.vec_id) AS rank
                     FROM fq JOIN e ON e.vec_id <> query_id),
         ftop AS (SELECT query_id, neighbor_id FROM fscored WHERE rank <= 10),
         ov AS (SELECT q.query_id, count(*) AS n
                FROM qtop q JOIN ftop f
                  ON q.query_id = f.query_id AND q.neighbor_id = f.neighbor_id
                GROUP BY 1)
         SELECT b.query_id,
                CAST(coalesce(ov.n, 0) AS BIGINT) AS n_overlap,
                CAST(coalesce(ov.n, 0) * 100 // 10 AS BIGINT) AS recall_x100
         FROM (SELECT DISTINCT query_id FROM fq) b LEFT JOIN ov USING (query_id)""",

    // Product quantization: integer codebooks from the export, encode
    // = argmin integer L2 per subspace (ties to the lowest j — the
    // row_number rule), ADC = per-query integer lookup dots summed
    // over the 8 codes — everything in BIGINT until the float recall
    // judge, so the replay is exact, not approximate.
    "q160_pq_recall" ->
      s"""WITH $embCte,
         cb AS (SELECT msub, j, cv FROM read_parquet('$PqExportPath/*.parquet')),
         eq AS (SELECT vec_id,
                [CAST(floor(x) AS BIGINT) for x in list_transform(embedding, x -> CAST(x AS DOUBLE) * 1000)] AS qv
                FROM embeddings),
         codes AS (SELECT vec_id, msub, j AS code FROM (
             SELECT eq.vec_id, cb.msub, cb.j,
                    row_number() OVER (PARTITION BY eq.vec_id, cb.msub
                      ORDER BY list_reduce(list_prepend(CAST(0 AS BIGINT),
                        [(qv[CAST(cb.msub*8 + i AS INT)] - cv[CAST(i AS INT)])
                         * (qv[CAST(cb.msub*8 + i AS INT)] - cv[CAST(i AS INT)])
                         for i in range(1, 9)]), (x, y) -> x + y) ASC, cb.j) AS rn
             FROM eq, cb) WHERE rn = 1),
         lut AS (SELECT q.vec_id AS query_id, cb.msub, cb.j,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  [q.qv[CAST(cb.msub*8 + i AS INT)] * cv[CAST(i AS INT)]
                   for i in range(1, 9)]), (x, y) -> x + y) AS d
                FROM eq q, cb WHERE q.vec_id % 100 = 0),
         adc AS (SELECT l.query_id, c.vec_id AS neighbor_id, sum(l.d) AS score
                FROM codes c JOIN lut l ON l.msub = c.msub AND l.j = c.code
                WHERE c.vec_id <> l.query_id
                GROUP BY 1, 2),
         qscored AS (SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY score DESC, neighbor_id) AS rank
                     FROM adc),
         qtop AS (SELECT query_id, neighbor_id FROM qscored WHERE rank <= 10),
         fq AS (SELECT vec_id AS query_id, v AS fqv FROM e WHERE vec_id % 100 = 0),
         fscored AS (SELECT query_id, e.vec_id AS neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY ${sqlCosine("fqv", "e.v", 64)} DESC, e.vec_id) AS rank
                     FROM fq JOIN e ON e.vec_id <> query_id),
         ftop AS (SELECT query_id, neighbor_id FROM fscored WHERE rank <= 10),
         ov AS (SELECT q.query_id, count(*) AS n
                FROM qtop q JOIN ftop f
                  ON q.query_id = f.query_id AND q.neighbor_id = f.neighbor_id
                GROUP BY 1)
         SELECT b.query_id,
                CAST(coalesce(ov.n, 0) AS BIGINT) AS n_overlap,
                CAST(coalesce(ov.n, 0) * 100 // 10 AS BIGINT) AS recall_x100
         FROM (SELECT DISTINCT query_id FROM fq) b LEFT JOIN ov USING (query_id)""",

    // sampled judge: q160's chain with the md5-ordered 256-row sample
    // as the query set on BOTH legs.
    "q169_pq_recall_sampled" ->
      s"""WITH $embCte,
         smp AS MATERIALIZED (SELECT vec_id FROM embeddings
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 256),
         cb AS (SELECT msub, j, cv FROM read_parquet('$PqSampleExportPath/*.parquet')),
         eq AS (SELECT vec_id,
                [CAST(floor(x) AS BIGINT) for x in list_transform(embedding, x -> CAST(x AS DOUBLE) * 1000)] AS qv
                FROM embeddings),
         codes AS (SELECT vec_id, msub, j AS code FROM (
             SELECT eq.vec_id, cb.msub, cb.j,
                    row_number() OVER (PARTITION BY eq.vec_id, cb.msub
                      ORDER BY list_reduce(list_prepend(CAST(0 AS BIGINT),
                        [(qv[CAST(cb.msub*8 + i AS INT)] - cv[CAST(i AS INT)])
                         * (qv[CAST(cb.msub*8 + i AS INT)] - cv[CAST(i AS INT)])
                         for i in range(1, 9)]), (x, y) -> x + y) ASC, cb.j) AS rn
             FROM eq, cb) WHERE rn = 1),
         lut AS (SELECT q.vec_id AS query_id, cb.msub, cb.j,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  [q.qv[CAST(cb.msub*8 + i AS INT)] * cv[CAST(i AS INT)]
                   for i in range(1, 9)]), (x, y) -> x + y) AS d
                FROM eq q, cb WHERE q.vec_id IN (SELECT vec_id FROM smp)),
         adc AS (SELECT l.query_id, c.vec_id AS neighbor_id, sum(l.d) AS score
                FROM codes c JOIN lut l ON l.msub = c.msub AND l.j = c.code
                WHERE c.vec_id <> l.query_id
                GROUP BY 1, 2),
         qscored AS (SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY score DESC, neighbor_id) AS rank
                     FROM adc),
         qtop AS (SELECT query_id, neighbor_id FROM qscored WHERE rank <= 10),
         fq AS (SELECT vec_id AS query_id, v AS fqv FROM e
                WHERE vec_id IN (SELECT vec_id FROM smp)),
         fscored AS (SELECT query_id, e.vec_id AS neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY ${sqlCosine("fqv", "e.v", 64)} DESC, e.vec_id) AS rank
                     FROM fq JOIN e ON e.vec_id <> query_id),
         ftop AS (SELECT query_id, neighbor_id FROM fscored WHERE rank <= 10),
         ov AS (SELECT q.query_id, count(*) AS n
                FROM qtop q JOIN ftop f
                  ON q.query_id = f.query_id AND q.neighbor_id = f.neighbor_id
                GROUP BY 1)
         SELECT b.query_id,
                CAST(coalesce(ov.n, 0) AS BIGINT) AS n_overlap,
                CAST(coalesce(ov.n, 0) * 100 // 10 AS BIGINT) AS recall_x100
         FROM (SELECT DISTINCT query_id FROM fq) b LEFT JOIN ov USING (query_id)""",

    // permuted PQ: q169's chain over the PERMUTED lattice (qv
    // re-indexed through the exported (pos, src) table); the exact
    // float judge is untouched — permutation only changes what the
    // codes see.
    "q179_pq_permuted_recall_sampled" ->
      s"""WITH $embCte,
         smp AS MATERIALIZED (SELECT vec_id FROM embeddings
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 256),
         cb AS (SELECT msub, j, cv FROM read_parquet('$PqPermCbPath/*.parquet')),
         perm AS (SELECT pos, src FROM read_parquet('$PqPermPath/*.parquet')),
         eq0 AS (SELECT vec_id,
                [CAST(floor(x) AS BIGINT) for x in list_transform(embedding, x -> CAST(x AS DOUBLE) * 1000)] AS qv0
                FROM embeddings),
         eq AS MATERIALIZED (SELECT vec_id,
                list(qv0[CAST(src + 1 AS INT)] ORDER BY pos) AS qv
                FROM eq0, perm GROUP BY vec_id),
         codes AS (SELECT vec_id, msub, j AS code FROM (
             SELECT eq.vec_id, cb.msub, cb.j,
                    row_number() OVER (PARTITION BY eq.vec_id, cb.msub
                      ORDER BY list_reduce(list_prepend(CAST(0 AS BIGINT),
                        [(qv[CAST(cb.msub*8 + i AS INT)] - cv[CAST(i AS INT)])
                         * (qv[CAST(cb.msub*8 + i AS INT)] - cv[CAST(i AS INT)])
                         for i in range(1, 9)]), (x, y) -> x + y) ASC, cb.j) AS rn
             FROM eq, cb) WHERE rn = 1),
         lut AS (SELECT q.vec_id AS query_id, cb.msub, cb.j,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  [q.qv[CAST(cb.msub*8 + i AS INT)] * cv[CAST(i AS INT)]
                   for i in range(1, 9)]), (x, y) -> x + y) AS d
                FROM eq q, cb WHERE q.vec_id IN (SELECT vec_id FROM smp)),
         adc AS (SELECT l.query_id, c.vec_id AS neighbor_id, sum(l.d) AS score
                FROM codes c JOIN lut l ON l.msub = c.msub AND l.j = c.code
                WHERE c.vec_id <> l.query_id
                GROUP BY 1, 2),
         qscored AS (SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY score DESC, neighbor_id) AS rank
                     FROM adc),
         qtop AS (SELECT query_id, neighbor_id FROM qscored WHERE rank <= 10),
         fq AS (SELECT vec_id AS query_id, v AS fqv FROM e
                WHERE vec_id IN (SELECT vec_id FROM smp)),
         fscored AS (SELECT query_id, e.vec_id AS neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY ${sqlCosine("fqv", "e.v", 64)} DESC, e.vec_id) AS rank
                     FROM fq JOIN e ON e.vec_id <> query_id),
         ftop AS (SELECT query_id, neighbor_id FROM fscored WHERE rank <= 10),
         ov AS (SELECT q.query_id, count(*) AS n
                FROM qtop q JOIN ftop f
                  ON q.query_id = f.query_id AND q.neighbor_id = f.neighbor_id
                GROUP BY 1)
         SELECT b.query_id,
                CAST(coalesce(ov.n, 0) AS BIGINT) AS n_overlap,
                CAST(coalesce(ov.n, 0) * 100 // 10 AS BIGINT) AS recall_x100
         FROM (SELECT DISTINCT query_id FROM fq) b LEFT JOIN ov USING (query_id)""",

    // IVFADC: coarse assignment (integer L2 to the one-subspace
    // coarse book, row_number ties to the lowest cell), residual
    // encode against the residual books, nprobe=4 probe order by the
    // SAME distance chain, score = dot(q, cent) + residual ADC —
    // every stage replayed from the two exports, judged by the q169
    // sampled-exact tail.
    "q175_ivfadc_recall_sampled" ->
      s"""WITH $embCte,
         smp AS MATERIALIZED (SELECT vec_id FROM embeddings
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 256),
         ccb AS (SELECT j, cv FROM read_parquet('$IvfAdcCoarsePath/*.parquet')),
         rcb AS (SELECT msub, j, cv FROM read_parquet('$IvfAdcCbPath/*.parquet')),
         eq AS (SELECT vec_id,
                [CAST(floor(x) AS BIGINT) for x in list_transform(embedding, x -> CAST(x AS DOUBLE) * 1000)] AS qv
                FROM embeddings),
         celld AS MATERIALIZED (SELECT eq.vec_id, ccb.j,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  [(qv[CAST(i AS INT)] - cv[CAST(i AS INT)])
                   * (qv[CAST(i AS INT)] - cv[CAST(i AS INT)])
                   for i in range(1, 65)]), (x, y) -> x + y) AS d
                FROM eq, ccb),
         cells AS (SELECT vec_id, j AS cell FROM (
             SELECT vec_id, j, row_number() OVER (PARTITION BY vec_id
                      ORDER BY d ASC, j) AS rn FROM celld) WHERE rn = 1),
         resid AS MATERIALIZED (SELECT eq.vec_id, cl.cell,
                [qv[CAST(i AS INT)] - ccb.cv[CAST(i AS INT)] for i in range(1, 65)] AS rv
                FROM eq JOIN cells cl USING (vec_id) JOIN ccb ON ccb.j = cl.cell),
         codes AS MATERIALIZED (SELECT vec_id, cell, msub, j AS code FROM (
             SELECT r.vec_id, r.cell, rcb.msub, rcb.j,
                    row_number() OVER (PARTITION BY r.vec_id, rcb.msub
                      ORDER BY list_reduce(list_prepend(CAST(0 AS BIGINT),
                        [(rv[CAST(rcb.msub*8 + i AS INT)] - cv[CAST(i AS INT)])
                         * (rv[CAST(rcb.msub*8 + i AS INT)] - cv[CAST(i AS INT)])
                         for i in range(1, 9)]), (x, y) -> x + y) ASC, rcb.j) AS rn
             FROM resid r, rcb) WHERE rn = 1),
         probes AS (SELECT vec_id AS query_id, j AS cell FROM (
             SELECT vec_id, j, row_number() OVER (PARTITION BY vec_id
                      ORDER BY d ASC, j) AS rn
             FROM celld WHERE vec_id IN (SELECT vec_id FROM smp)) WHERE rn <= 4),
         qdc AS MATERIALIZED (SELECT p.query_id, p.cell,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  [eq.qv[CAST(i AS INT)] * ccb.cv[CAST(i AS INT)] for i in range(1, 65)]),
                  (x, y) -> x + y) AS qc
                FROM probes p JOIN eq ON eq.vec_id = p.query_id
                JOIN ccb ON ccb.j = p.cell),
         lut AS MATERIALIZED (SELECT q.vec_id AS query_id, rcb.msub, rcb.j,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  [q.qv[CAST(rcb.msub*8 + i AS INT)] * cv[CAST(i AS INT)]
                   for i in range(1, 9)]), (x, y) -> x + y) AS d
                FROM eq q, rcb WHERE q.vec_id IN (SELECT vec_id FROM smp)),
         adcsum AS (SELECT p.query_id, c.cell, c.vec_id AS neighbor_id, sum(l.d) AS sd
                FROM codes c
                JOIN probes p ON p.cell = c.cell
                JOIN lut l ON l.query_id = p.query_id
                  AND l.msub = c.msub AND l.j = c.code
                WHERE c.vec_id <> p.query_id
                GROUP BY 1, 2, 3),
         adc AS (SELECT a.query_id, a.neighbor_id, q.qc + a.sd AS score
                FROM adcsum a JOIN qdc q
                  ON q.query_id = a.query_id AND q.cell = a.cell),
         qscored AS (SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY score DESC, neighbor_id) AS rank
                     FROM adc),
         qtop AS (SELECT query_id, neighbor_id FROM qscored WHERE rank <= 10),
         fq AS (SELECT vec_id AS query_id, v AS fqv FROM e
                WHERE vec_id IN (SELECT vec_id FROM smp)),
         fscored AS (SELECT query_id, e.vec_id AS neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY ${sqlCosine("fqv", "e.v", 64)} DESC, e.vec_id) AS rank
                     FROM fq JOIN e ON e.vec_id <> query_id),
         ftop AS (SELECT query_id, neighbor_id FROM fscored WHERE rank <= 10),
         ov AS (SELECT q.query_id, count(*) AS n
                FROM qtop q JOIN ftop f
                  ON q.query_id = f.query_id AND q.neighbor_id = f.neighbor_id
                GROUP BY 1)
         SELECT b.query_id,
                CAST(coalesce(ov.n, 0) AS BIGINT) AS n_overlap,
                CAST(coalesce(ov.n, 0) * 100 // 10 AS BIGINT) AS recall_x100
         FROM (SELECT DISTINCT query_id FROM fq) b LEFT JOIN ov USING (query_id)""",

    // PQ + re-rank: q160's integer chain widened to a 50-deep ADC
    // shortlist, then the exact float cosine re-ranks shortlist rows
    // (sim DESC, id — the row_number rule) down to 10.
    "q163_pq_rerank" ->
      s"""WITH $embCte,
         cb AS (SELECT msub, j, cv FROM read_parquet('$PqRerankExportPath/*.parquet')),
         eq AS (SELECT vec_id,
                [CAST(floor(x) AS BIGINT) for x in list_transform(embedding, x -> CAST(x AS DOUBLE) * 1000)] AS qv
                FROM embeddings),
         codes AS (SELECT vec_id, msub, j AS code FROM (
             SELECT eq.vec_id, cb.msub, cb.j,
                    row_number() OVER (PARTITION BY eq.vec_id, cb.msub
                      ORDER BY list_reduce(list_prepend(CAST(0 AS BIGINT),
                        [(qv[CAST(cb.msub*8 + i AS INT)] - cv[CAST(i AS INT)])
                         * (qv[CAST(cb.msub*8 + i AS INT)] - cv[CAST(i AS INT)])
                         for i in range(1, 9)]), (x, y) -> x + y) ASC, cb.j) AS rn
             FROM eq, cb) WHERE rn = 1),
         lut AS (SELECT q.vec_id AS query_id, cb.msub, cb.j,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  [q.qv[CAST(cb.msub*8 + i AS INT)] * cv[CAST(i AS INT)]
                   for i in range(1, 9)]), (x, y) -> x + y) AS d
                FROM eq q, cb WHERE q.vec_id % 100 = 0),
         adc AS (SELECT l.query_id, c.vec_id AS neighbor_id, sum(l.d) AS score
                FROM codes c JOIN lut l ON l.msub = c.msub AND l.j = c.code
                WHERE c.vec_id <> l.query_id
                GROUP BY 1, 2),
         slist AS (SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY score DESC, neighbor_id) AS rank
                FROM adc) WHERE rank <= 50),
         fq AS (SELECT vec_id AS query_id, v AS fqv FROM e WHERE vec_id % 100 = 0),
         rr AS (SELECT s.query_id, s.neighbor_id,
                row_number() OVER (PARTITION BY s.query_id
                  ORDER BY ${sqlCosine("fqv", "en.v", 64)} DESC, s.neighbor_id) AS rank
                FROM slist s
                JOIN fq ON fq.query_id = s.query_id
                JOIN e en ON en.vec_id = s.neighbor_id),
         qtop AS (SELECT query_id, neighbor_id FROM rr WHERE rank <= 10),
         fscored AS (SELECT query_id, e.vec_id AS neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY ${sqlCosine("fqv", "e.v", 64)} DESC, e.vec_id) AS rank
                     FROM fq JOIN e ON e.vec_id <> query_id),
         ftop AS (SELECT query_id, neighbor_id FROM fscored WHERE rank <= 10),
         ov AS (SELECT q.query_id, count(*) AS n
                FROM qtop q JOIN ftop f
                  ON q.query_id = f.query_id AND q.neighbor_id = f.neighbor_id
                GROUP BY 1)
         SELECT b.query_id,
                CAST(coalesce(ov.n, 0) AS BIGINT) AS n_overlap,
                CAST(coalesce(ov.n, 0) * 100 // 10 AS BIGINT) AS recall_x100
         FROM (SELECT DISTINCT query_id FROM fq) b LEFT JOIN ov USING (query_id)""",

    "q94_knn_label_purity" ->
      s"""WITH $embCte,
         q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0),
         scored AS (SELECT query_id, e.vec_id AS neighbor_id,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY ${sqlCosine("qv", "e.v", 64)} DESC, e.vec_id) AS rank
                    FROM q JOIN e ON e.vec_id <> query_id)
         SELECT s.query_id, eq.label,
                CAST(sum(CASE WHEN en.label = eq.label THEN 1 ELSE 0 END) AS BIGINT) AS n_same,
                CAST(sum(CASE WHEN en.label = eq.label THEN 1 ELSE 0 END) AS DOUBLE) / 10 AS purity
         FROM scored s
         JOIN embeddings eq ON eq.vec_id = s.query_id
         JOIN embeddings en ON en.vec_id = s.neighbor_id
         WHERE s.rank <= 10
         GROUP BY 1, 2""",

    "q36_ann_lsh" ->
      s"""WITH $embCte,
         eq AS (SELECT vec_id, v,
                [CAST(floor(x) AS BIGINT) for x in list_transform(embedding, x -> CAST(x AS DOUBLE) * 1000)] AS qv
                FROM embeddings JOIN e USING (vec_id)),
         pl AS (SELECT p, j, ${h60("p::VARCHAR || '_' || j::VARCHAR")} % 2001 - 1000 AS comp
                FROM range(4) t(p), range(64) u(j)),
         dots AS (SELECT eq.vec_id, pl.p, sum(eq.qv[CAST(pl.j+1 AS INT)] * pl.comp) AS d
                  FROM eq, pl GROUP BY 1, 2),
         sig AS (SELECT vec_id,
                 sum(CASE WHEN d > 0 THEN (CAST(1 AS BIGINT) << CAST(p AS INT)) ELSE 0 END) AS bucket
                 FROM dots GROUP BY 1),
         q AS (SELECT s.vec_id AS query_id, s.bucket, e.v AS qv
               FROM sig s JOIN e ON e.vec_id = s.vec_id WHERE s.vec_id % 100 = 0),
         scored AS (SELECT query_id, e.vec_id AS neighbor_id,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY ${sqlCosine("qv", "e.v", 64)} DESC, e.vec_id) AS rank
                    FROM q JOIN sig cs ON cs.bucket = q.bucket
                    JOIN e ON e.vec_id = cs.vec_id AND e.vec_id <> query_id)
         SELECT query_id, rank, neighbor_id FROM scored WHERE rank <= 10""",

    // nb re-derives Similarity.autoPlanes in the same integer math:
    // m = ceil(n/125); B = max(4, bit-length(m-1)) — length(bin(m-1))
    // is exactly ceil(log2(m)) for m >= 2, with no FP log2 boundary.
    "q74_dedup_embedding_lsh" ->
      s"""WITH $embCte,
         nb AS (SELECT greatest(4, CASE WHEN m <= 1 THEN 0 ELSE length(bin(m - 1)) END) AS b
                FROM (SELECT (count(*) + ${Similarity.LshTargetBucket} - 1) // ${Similarity.LshTargetBucket} AS m
                      FROM embeddings)),
         eq AS (SELECT vec_id, v,
                [CAST(floor(x) AS BIGINT) for x in list_transform(embedding, x -> CAST(x AS DOUBLE) * 1000)] AS qv
                FROM embeddings JOIN e USING (vec_id)),
         pl AS (SELECT p, j, ${h60("p::VARCHAR || '_' || j::VARCHAR")} % 2001 - 1000 AS comp
                FROM range(60) t(p), range(64) u(j)
                WHERE p < (SELECT b FROM nb)),
         dots AS (SELECT eq.vec_id, pl.p, sum(eq.qv[CAST(pl.j+1 AS INT)] * pl.comp) AS d
                  FROM eq, pl GROUP BY 1, 2),
         sig AS (SELECT vec_id,
                 sum(CASE WHEN d > 0 THEN (CAST(1 AS BIGINT) << CAST(p AS INT)) ELSE 0 END) AS bucket
                 FROM dots GROUP BY 1)
         SELECT sa.vec_id AS id_a, sb.vec_id AS id_b
         FROM sig sa JOIN sig sb ON sa.bucket = sb.bucket AND sa.vec_id < sb.vec_id
         JOIN e a ON a.vec_id = sa.vec_id
         JOIN e b ON b.vec_id = sb.vec_id
         WHERE ${sqlCosine("a.v", "b.v", 64)} >= 0.45""",

    // q93: the same signature pipeline, restricted to delta (vec_id%5=0)
    // × standing (vec_id%5<>0) pairs — B still derives from the FULL
    // count (standing + delta), as the Spark side does.
    "q93_dedup_embedding_delta" ->
      s"""WITH $embCte,
         nb AS (SELECT greatest(4, CASE WHEN m <= 1 THEN 0 ELSE length(bin(m - 1)) END) AS b
                FROM (SELECT (count(*) + ${Similarity.LshTargetBucket} - 1) // ${Similarity.LshTargetBucket} AS m
                      FROM embeddings)),
         eq AS (SELECT vec_id, v,
                [CAST(floor(x) AS BIGINT) for x in list_transform(embedding, x -> CAST(x AS DOUBLE) * 1000)] AS qv
                FROM embeddings JOIN e USING (vec_id)),
         pl AS (SELECT p, j, ${h60("p::VARCHAR || '_' || j::VARCHAR")} % 2001 - 1000 AS comp
                FROM range(60) t(p), range(64) u(j)
                WHERE p < (SELECT b FROM nb)),
         dots AS (SELECT eq.vec_id, pl.p, sum(eq.qv[CAST(pl.j+1 AS INT)] * pl.comp) AS d
                  FROM eq, pl GROUP BY 1, 2),
         sig AS (SELECT vec_id,
                 sum(CASE WHEN d > 0 THEN (CAST(1 AS BIGINT) << CAST(p AS INT)) ELSE 0 END) AS bucket
                 FROM dots GROUP BY 1)
         SELECT sd.vec_id AS delta_id, ss.vec_id AS corpus_id
         FROM sig sd JOIN sig ss ON sd.bucket = ss.bucket
         JOIN e a ON a.vec_id = sd.vec_id
         JOIN e b ON b.vec_id = ss.vec_id
         WHERE sd.vec_id % 5 = 0 AND ss.vec_id % 5 <> 0
           AND ${sqlCosine("a.v", "b.v", 64)} >= 0.30""",

    // Semantic decontamination: the q93 signature pipeline over the
    // combined corpus+eval set ("c:"/"e:" namespaced, B from the
    // combined count), eval twins perturbed by negating component 0
    // (exact in both float and double, so both engines see identical
    // vectors), bucket-collision candidates verified at cosine ≥ 0.45.
    "q117_decontaminate_semantic" ->
      s"""WITH $embCte,
         evv AS (SELECT -vec_id - 1 AS vec_id,
                 [CASE WHEN i = 1 THEN -CAST(embedding[CAST(i AS INT)] AS DOUBLE)
                       ELSE CAST(embedding[CAST(i AS INT)] AS DOUBLE) END
                  for i in range(1, 65)] AS v
                 FROM embeddings WHERE vec_id % 83 = 0),
         allv AS (SELECT 'c:' || vec_id::VARCHAR AS gid, v FROM e
                  UNION ALL SELECT 'e:' || vec_id::VARCHAR AS gid, v FROM evv),
         nb AS (SELECT greatest(4, CASE WHEN m <= 1 THEN 0 ELSE length(bin(m - 1)) END) AS b
                FROM (SELECT (count(*) + ${Similarity.LshTargetBucket} - 1) // ${Similarity.LshTargetBucket} AS m
                      FROM allv)),
         eq AS (SELECT gid, v,
                [CAST(floor(x) AS BIGINT) for x in list_transform(v, x -> x * 1000)] AS qv
                FROM allv),
         pl AS (SELECT p, j, ${h60("p::VARCHAR || '_' || j::VARCHAR")} % 2001 - 1000 AS comp
                FROM range(60) t(p), range(64) u(j)
                WHERE p < (SELECT b FROM nb)),
         dots AS (SELECT eq.gid, pl.p, sum(eq.qv[CAST(pl.j+1 AS INT)] * pl.comp) AS d
                  FROM eq, pl GROUP BY 1, 2),
         sig AS (SELECT gid,
                 sum(CASE WHEN d > 0 THEN (CAST(1 AS BIGINT) << CAST(p AS INT)) ELSE 0 END) AS bucket
                 FROM dots GROUP BY 1),
         hits AS (SELECT DISTINCT CAST(substr(sc.gid, 3) AS BIGINT) AS doc_id, se.gid AS egid
                  FROM sig sc JOIN sig se ON sc.bucket = se.bucket
                  JOIN allv a ON a.gid = sc.gid
                  JOIN allv b ON b.gid = se.gid
                  WHERE sc.gid LIKE 'c:%' AND se.gid LIKE 'e:%'
                    AND ${sqlCosine("a.v", "b.v", 64)} >= 0.45),
         flag AS (SELECT doc_id, count(*) AS n FROM hits GROUP BY doc_id)
         SELECT m.vec_id AS doc_id,
                CAST(coalesce(f.n, 0) AS BIGINT) AS n_eval_matches,
                coalesce(f.n, 0) > 0 AS contaminated
         FROM embeddings m LEFT JOIN flag f ON f.doc_id = m.vec_id""",

    // Quantized-IVF replay: q101's trunc-quantization + integer dots
    // for cells/probes/shortlist, q38's probe budget, float rerank of
    // the shortlist, judged against the exact float top-10.
    "q109_ann_ivf_quantized" ->
      s"""WITH $embCte,
         mx AS (SELECT vec_id, list_max(list_transform(v, x -> abs(x))) AS m FROM e),
         qt AS (SELECT e.vec_id,
                  CASE WHEN mx.m = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
                       ELSE list_transform(v, x -> CAST(trunc(x * (127.0 / mx.m)) AS BIGINT))
                  END AS qv
                FROM e JOIN mx USING (vec_id)),
         qn AS (SELECT vec_id, qv,
                  sqrt(CAST(${sqlDotInt("qv", "qv", 64)} AS DOUBLE)) AS nrm
                FROM qt),
         cents AS (SELECT vec_id AS cid, qv AS cqv, nrm AS cn FROM qn WHERE vec_id < 16),
         cells AS (SELECT vec_id, cell FROM (
             SELECT qn.vec_id, c.cid AS cell,
                    row_number() OVER (PARTITION BY qn.vec_id
                      ORDER BY CAST(${sqlDotInt("qn.qv", "c.cqv", 64)} AS DOUBLE)
                                 / (qn.nrm * c.cn) DESC, c.cid) AS rn
             FROM qn, cents c) WHERE rn = 1),
         probes AS (SELECT vec_id AS query_id, cell FROM (
             SELECT qn.vec_id, c.cid AS cell,
                    row_number() OVER (PARTITION BY qn.vec_id
                      ORDER BY CAST(${sqlDotInt("qn.qv", "c.cqv", 64)} AS DOUBLE)
                                 / (qn.nrm * c.cn) DESC, c.cid) AS rn
             FROM qn, cents c WHERE qn.vec_id % 100 = 0) WHERE rn <= 2),
         short AS (SELECT query_id, neighbor_id FROM (
             SELECT p.query_id, n.vec_id AS neighbor_id,
                    row_number() OVER (PARTITION BY p.query_id
                      ORDER BY CAST(${sqlDotInt("q.qv", "n.qv", 64)} AS DOUBLE)
                                 / (q.nrm * n.nrm) DESC, n.vec_id) AS srank
             FROM probes p
             JOIN cells cl ON cl.cell = p.cell
             JOIN qn n ON n.vec_id = cl.vec_id
             JOIN qn q ON q.vec_id = p.query_id
             WHERE n.vec_id <> p.query_id) WHERE srank <= 40),
         rer AS (SELECT query_id, neighbor_id FROM (
             SELECT s.query_id, s.neighbor_id,
                    row_number() OVER (PARTITION BY s.query_id
                      ORDER BY ${sqlCosine("qe.v", "ne.v", 64)} DESC, s.neighbor_id) AS rank
             FROM short s
             JOIN e qe ON qe.vec_id = s.query_id
             JOIN e ne ON ne.vec_id = s.neighbor_id) WHERE rank <= 10),
         fq AS (SELECT vec_id AS query_id, v AS fqv FROM e WHERE vec_id % 100 = 0),
         fscored AS (SELECT query_id, e.vec_id AS neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY ${sqlCosine("fqv", "e.v", 64)} DESC, e.vec_id) AS rank
                     FROM fq JOIN e ON e.vec_id <> query_id),
         ftop AS (SELECT query_id, neighbor_id FROM fscored WHERE rank <= 10),
         ov AS (SELECT r.query_id, count(*) AS n
                FROM rer r JOIN ftop f
                  ON r.query_id = f.query_id AND r.neighbor_id = f.neighbor_id
                GROUP BY 1)
         SELECT fq.query_id,
                CAST(coalesce(ov.n, 0) AS BIGINT) AS n_overlap,
                CAST(coalesce(ov.n, 0) * 100 // 10 AS BIGINT) AS recall_x100
         FROM fq LEFT JOIN ov USING (query_id)""",

    // Vector-index gate replay: the q109 quantized chain with the
    // centroid closure seeded from the initial batch's 16 lowest ids
    // and one extra predicate — batch(neighbor) ≤ batch(query), batch
    // = vec_id % 4 — which IS the entire fold-forward: the postings
    // are append-only and decisions immutable, so each query's top-10
    // at its fold time equals the restricted single-pass ranking.
    "q127_vector_index_gate" ->
      s"""WITH $embCte,
         mx AS (SELECT vec_id, list_max(list_transform(v, x -> abs(x))) AS m FROM e),
         qt AS (SELECT e.vec_id,
                  CASE WHEN mx.m = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
                       ELSE list_transform(v, x -> CAST(trunc(x * (127.0 / mx.m)) AS BIGINT))
                  END AS qv
                FROM e JOIN mx USING (vec_id)),
         qn AS (SELECT vec_id, qv,
                  sqrt(CAST(${sqlDotInt("qv", "qv", 64)} AS DOUBLE)) AS nrm
                FROM qt),
         cents AS (SELECT vec_id AS cid, qv AS cqv, nrm AS cn FROM qn
                   WHERE vec_id % 4 = 0 ORDER BY vec_id LIMIT 16),
         cells AS (SELECT vec_id, cell FROM (
             SELECT qn.vec_id, c.cid AS cell,
                    row_number() OVER (PARTITION BY qn.vec_id
                      ORDER BY CAST(${sqlDotInt("qn.qv", "c.cqv", 64)} AS DOUBLE)
                                 / (qn.nrm * c.cn) DESC, c.cid) AS rn
             FROM qn, cents c) WHERE rn = 1),
         probes AS (SELECT vec_id AS query_id, cell FROM (
             SELECT qn.vec_id, c.cid AS cell,
                    row_number() OVER (PARTITION BY qn.vec_id
                      ORDER BY CAST(${sqlDotInt("qn.qv", "c.cqv", 64)} AS DOUBLE)
                                 / (qn.nrm * c.cn) DESC, c.cid) AS rn
             FROM qn, cents c WHERE qn.vec_id % 4 <> 0) WHERE rn <= 2),
         short AS (SELECT query_id, neighbor_id FROM (
             SELECT p.query_id, n.vec_id AS neighbor_id,
                    row_number() OVER (PARTITION BY p.query_id
                      ORDER BY CAST(${sqlDotInt("q.qv", "n.qv", 64)} AS DOUBLE)
                                 / (q.nrm * n.nrm) DESC, n.vec_id) AS srank
             FROM probes p
             JOIN cells cl ON cl.cell = p.cell
             JOIN qn n ON n.vec_id = cl.vec_id
             JOIN qn q ON q.vec_id = p.query_id
             WHERE n.vec_id <> p.query_id
               AND n.vec_id % 4 <= p.query_id % 4) WHERE srank <= 40),
         rer AS (SELECT query_id, neighbor_id, rank FROM (
             SELECT s.query_id, s.neighbor_id,
                    row_number() OVER (PARTITION BY s.query_id
                      ORDER BY ${sqlCosine("qe.v", "ne.v", 64)} DESC, s.neighbor_id) AS rank
             FROM short s
             JOIN e qe ON qe.vec_id = s.query_id
             JOIN e ne ON ne.vec_id = s.neighbor_id) WHERE rank <= 10)
         SELECT query_id, CAST(query_id % 4 AS BIGINT) AS batch,
                CAST(rank AS BIGINT) AS rank, neighbor_id
         FROM rer""",

    // q127's chain with the mid-replay reseed modeled: batches 1-2
    // probe the 16-centroid closure (phase 1 = the q127 CTEs
    // restricted to query %4 <= 2), batch 3 probes the DOUBLED
    // closure — lowest 32 ids of the corpus at the fold-2 compaction
    // (vec_id % 4 <= 2), with every vector re-assigned to the new
    // cells. Re-quantization is lossless (packed doubles), so both
    // phases derive qv/norms from the same qt/qn CTEs.
    "q136_vector_gate_reseed" ->
      s"""WITH $embCte,
         mx AS (SELECT vec_id, list_max(list_transform(v, x -> abs(x))) AS m FROM e),
         qt AS (SELECT e.vec_id,
                  CASE WHEN mx.m = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
                       ELSE list_transform(v, x -> CAST(trunc(x * (127.0 / mx.m)) AS BIGINT))
                  END AS qv
                FROM e JOIN mx USING (vec_id)),
         qn AS (SELECT vec_id, qv,
                  sqrt(CAST(${sqlDotInt("qv", "qv", 64)} AS DOUBLE)) AS nrm
                FROM qt),
         cents AS (SELECT vec_id AS cid, qv AS cqv, nrm AS cn FROM qn
                   WHERE vec_id % 4 = 0 ORDER BY vec_id LIMIT 16),
         cells AS (SELECT vec_id, cell FROM (
             SELECT qn.vec_id, c.cid AS cell,
                    row_number() OVER (PARTITION BY qn.vec_id
                      ORDER BY CAST(${sqlDotInt("qn.qv", "c.cqv", 64)} AS DOUBLE)
                                 / (qn.nrm * c.cn) DESC, c.cid) AS rn
             FROM qn, cents c) WHERE rn = 1),
         probes AS (SELECT vec_id AS query_id, cell FROM (
             SELECT qn.vec_id, c.cid AS cell,
                    row_number() OVER (PARTITION BY qn.vec_id
                      ORDER BY CAST(${sqlDotInt("qn.qv", "c.cqv", 64)} AS DOUBLE)
                                 / (qn.nrm * c.cn) DESC, c.cid) AS rn
             FROM qn, cents c WHERE qn.vec_id % 4 IN (1, 2)) WHERE rn <= 2),
         short AS (SELECT query_id, neighbor_id FROM (
             SELECT p.query_id, n.vec_id AS neighbor_id,
                    row_number() OVER (PARTITION BY p.query_id
                      ORDER BY CAST(${sqlDotInt("q.qv", "n.qv", 64)} AS DOUBLE)
                                 / (q.nrm * n.nrm) DESC, n.vec_id) AS srank
             FROM probes p
             JOIN cells cl ON cl.cell = p.cell
             JOIN qn n ON n.vec_id = cl.vec_id
             JOIN qn q ON q.vec_id = p.query_id
             WHERE n.vec_id <> p.query_id
               AND n.vec_id % 4 <= p.query_id % 4) WHERE srank <= 40),
         rer AS (SELECT query_id, neighbor_id, rank FROM (
             SELECT s.query_id, s.neighbor_id,
                    row_number() OVER (PARTITION BY s.query_id
                      ORDER BY ${sqlCosine("qe.v", "ne.v", 64)} DESC, s.neighbor_id) AS rank
             FROM short s
             JOIN e qe ON qe.vec_id = s.query_id
             JOIN e ne ON ne.vec_id = s.neighbor_id) WHERE rank <= 10),
         cents2 AS (SELECT vec_id AS cid, qv AS cqv, nrm AS cn FROM qn
                   WHERE vec_id % 4 <= 2 ORDER BY vec_id LIMIT 32),
         cells2 AS (SELECT vec_id, cell FROM (
             SELECT qn.vec_id, c.cid AS cell,
                    row_number() OVER (PARTITION BY qn.vec_id
                      ORDER BY CAST(${sqlDotInt("qn.qv", "c.cqv", 64)} AS DOUBLE)
                                 / (qn.nrm * c.cn) DESC, c.cid) AS rn
             FROM qn, cents2 c) WHERE rn = 1),
         probes2 AS (SELECT vec_id AS query_id, cell FROM (
             SELECT qn.vec_id, c.cid AS cell,
                    row_number() OVER (PARTITION BY qn.vec_id
                      ORDER BY CAST(${sqlDotInt("qn.qv", "c.cqv", 64)} AS DOUBLE)
                                 / (qn.nrm * c.cn) DESC, c.cid) AS rn
             FROM qn, cents2 c WHERE qn.vec_id % 4 = 3) WHERE rn <= 2),
         short2 AS (SELECT query_id, neighbor_id FROM (
             SELECT p.query_id, n.vec_id AS neighbor_id,
                    row_number() OVER (PARTITION BY p.query_id
                      ORDER BY CAST(${sqlDotInt("q.qv", "n.qv", 64)} AS DOUBLE)
                                 / (q.nrm * n.nrm) DESC, n.vec_id) AS srank
             FROM probes2 p
             JOIN cells2 cl ON cl.cell = p.cell
             JOIN qn n ON n.vec_id = cl.vec_id
             JOIN qn q ON q.vec_id = p.query_id
             WHERE n.vec_id <> p.query_id) WHERE srank <= 40),
         rer2 AS (SELECT query_id, neighbor_id, rank FROM (
             SELECT s.query_id, s.neighbor_id,
                    row_number() OVER (PARTITION BY s.query_id
                      ORDER BY ${sqlCosine("qe.v", "ne.v", 64)} DESC, s.neighbor_id) AS rank
             FROM short2 s
             JOIN e qe ON qe.vec_id = s.query_id
             JOIN e ne ON ne.vec_id = s.neighbor_id) WHERE rank <= 10)
         SELECT query_id, CAST(query_id % 4 AS BIGINT) AS batch,
                CAST(rank AS BIGINT) AS rank, neighbor_id
         FROM rer
         UNION ALL
         SELECT query_id, CAST(query_id % 4 AS BIGINT) AS batch,
                CAST(rank AS BIGINT) AS rank, neighbor_id
         FROM rer2""",

    // PQ-serving gate replay: q127's chain with the shortlist scored
    // by integer ADC — cells/probes still come from the int8 closure
    // (coarse geometry is unchanged by the sidecar), the codes/LUTs
    // come from the EXPORTED gate-trained codebooks on the q160 floor
    // lattice, and the fold-forward is the same single predicate
    // batch(neighbor) ≤ batch(query).
    "q164_pq_vector_gate" ->
      s"""WITH $embCte,
         mx AS (SELECT vec_id, list_max(list_transform(v, x -> abs(x))) AS m FROM e),
         qt AS (SELECT e.vec_id,
                  CASE WHEN mx.m = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
                       ELSE list_transform(v, x -> CAST(trunc(x * (127.0 / mx.m)) AS BIGINT))
                  END AS qv
                FROM e JOIN mx USING (vec_id)),
         qn AS (SELECT vec_id, qv,
                  sqrt(CAST(${sqlDotInt("qv", "qv", 64)} AS DOUBLE)) AS nrm
                FROM qt),
         cents AS (SELECT vec_id AS cid, qv AS cqv, nrm AS cn FROM qn
                   WHERE vec_id % 4 = 0 ORDER BY vec_id LIMIT 16),
         cells AS (SELECT vec_id, cell FROM (
             SELECT qn.vec_id, c.cid AS cell,
                    row_number() OVER (PARTITION BY qn.vec_id
                      ORDER BY CAST(${sqlDotInt("qn.qv", "c.cqv", 64)} AS DOUBLE)
                                 / (qn.nrm * c.cn) DESC, c.cid) AS rn
             FROM qn, cents c) WHERE rn = 1),
         probes AS (SELECT vec_id AS query_id, cell FROM (
             SELECT qn.vec_id, c.cid AS cell,
                    row_number() OVER (PARTITION BY qn.vec_id
                      ORDER BY CAST(${sqlDotInt("qn.qv", "c.cqv", 64)} AS DOUBLE)
                                 / (qn.nrm * c.cn) DESC, c.cid) AS rn
             FROM qn, cents c WHERE qn.vec_id % 4 <> 0) WHERE rn <= 2),
         cb AS (SELECT msub, j, cv FROM read_parquet('$PqGateExportPath/*.parquet')),
         eq AS (SELECT vec_id,
                [CAST(floor(x) AS BIGINT) for x in list_transform(embedding, x -> CAST(x AS DOUBLE) * 1000)] AS pqv
                FROM embeddings),
         codes AS (SELECT vec_id, msub, j AS code FROM (
             SELECT eq.vec_id, cb.msub, cb.j,
                    row_number() OVER (PARTITION BY eq.vec_id, cb.msub
                      ORDER BY list_reduce(list_prepend(CAST(0 AS BIGINT),
                        [(pqv[CAST(cb.msub*8 + i AS INT)] - cv[CAST(i AS INT)])
                         * (pqv[CAST(cb.msub*8 + i AS INT)] - cv[CAST(i AS INT)])
                         for i in range(1, 9)]), (x, y) -> x + y) ASC, cb.j) AS rn
             FROM eq, cb) WHERE rn = 1),
         lut AS (SELECT q.vec_id AS query_id, cb.msub, cb.j,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  [q.pqv[CAST(cb.msub*8 + i AS INT)] * cv[CAST(i AS INT)]
                   for i in range(1, 9)]), (x, y) -> x + y) AS d
                FROM eq q, cb WHERE q.vec_id % 4 <> 0),
         cand AS (SELECT p.query_id, cl.vec_id AS neighbor_id
                  FROM probes p
                  JOIN cells cl ON cl.cell = p.cell
                  WHERE cl.vec_id <> p.query_id
                    AND cl.vec_id % 4 <= p.query_id % 4),
         adc AS (SELECT c.query_id, c.neighbor_id, sum(l.d) AS score
                 FROM cand c
                 JOIN codes k2 ON k2.vec_id = c.neighbor_id
                 JOIN lut l ON l.query_id = c.query_id
                   AND l.msub = k2.msub AND l.j = k2.code
                 GROUP BY 1, 2),
         short AS (SELECT query_id, neighbor_id FROM (
             SELECT query_id, neighbor_id,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY score DESC, neighbor_id) AS srank
             FROM adc) WHERE srank <= 40),
         rer AS (SELECT query_id, neighbor_id, rank FROM (
             SELECT s.query_id, s.neighbor_id,
                    row_number() OVER (PARTITION BY s.query_id
                      ORDER BY ${sqlCosine("qe.v", "ne.v", 64)} DESC, s.neighbor_id) AS rank
             FROM short s
             JOIN e qe ON qe.vec_id = s.query_id
             JOIN e ne ON ne.vec_id = s.neighbor_id) WHERE rank <= 10)
         SELECT query_id, CAST(query_id % 4 AS BIGINT) AS batch,
                CAST(rank AS BIGINT) AS rank, neighbor_id
         FROM rer""",

    // IVFADC gate: q164's chain with RESIDUAL codes — every vector's
    // rv = floor(v×1000) − floor(cent×1000) (the centroid lattice
    // vector is just eq of the cell's seed id), encoded against the
    // residual export; the ADC score gains the per-(query, cell)
    // dot(q, cent) offset. Cells, probes, fold predicate, shortlist
    // 40, float re-rank top 10 are q164's verbatim.
    "q177_ivfadc_vector_gate" ->
      s"""WITH $embCte,
         mx AS (SELECT vec_id, list_max(list_transform(v, x -> abs(x))) AS m FROM e),
         qt AS (SELECT e.vec_id,
                  CASE WHEN mx.m = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
                       ELSE list_transform(v, x -> CAST(trunc(x * (127.0 / mx.m)) AS BIGINT))
                  END AS qv
                FROM e JOIN mx USING (vec_id)),
         qn AS (SELECT vec_id, qv,
                  sqrt(CAST(${sqlDotInt("qv", "qv", 64)} AS DOUBLE)) AS nrm
                FROM qt),
         cents AS (SELECT vec_id AS cid, qv AS cqv, nrm AS cn FROM qn
                   WHERE vec_id % 4 = 0 ORDER BY vec_id LIMIT 16),
         cells AS (SELECT vec_id, cell FROM (
             SELECT qn.vec_id, c.cid AS cell,
                    row_number() OVER (PARTITION BY qn.vec_id
                      ORDER BY CAST(${sqlDotInt("qn.qv", "c.cqv", 64)} AS DOUBLE)
                                 / (qn.nrm * c.cn) DESC, c.cid) AS rn
             FROM qn, cents c) WHERE rn = 1),
         probes AS (SELECT vec_id AS query_id, cell FROM (
             SELECT qn.vec_id, c.cid AS cell,
                    row_number() OVER (PARTITION BY qn.vec_id
                      ORDER BY CAST(${sqlDotInt("qn.qv", "c.cqv", 64)} AS DOUBLE)
                                 / (qn.nrm * c.cn) DESC, c.cid) AS rn
             FROM qn, cents c WHERE qn.vec_id % 4 <> 0) WHERE rn <= 2),
         cb AS (SELECT msub, j, cv FROM read_parquet('$IvfAdcGateExportPath/*.parquet')),
         eq AS (SELECT vec_id,
                [CAST(floor(x) AS BIGINT) for x in list_transform(embedding, x -> CAST(x AS DOUBLE) * 1000)] AS pqv
                FROM embeddings),
         rcd AS MATERIALIZED (SELECT eq.vec_id, cl.cell,
                [eq.pqv[CAST(i AS INT)] - ec.pqv[CAST(i AS INT)] for i in range(1, 65)] AS rv
                FROM eq JOIN cells cl USING (vec_id)
                JOIN eq ec ON ec.vec_id = cl.cell),
         codes AS (SELECT vec_id, msub, j AS code FROM (
             SELECT r.vec_id, cb.msub, cb.j,
                    row_number() OVER (PARTITION BY r.vec_id, cb.msub
                      ORDER BY list_reduce(list_prepend(CAST(0 AS BIGINT),
                        [(rv[CAST(cb.msub*8 + i AS INT)] - cv[CAST(i AS INT)])
                         * (rv[CAST(cb.msub*8 + i AS INT)] - cv[CAST(i AS INT)])
                         for i in range(1, 9)]), (x, y) -> x + y) ASC, cb.j) AS rn
             FROM rcd r, cb) WHERE rn = 1),
         lut AS (SELECT q.vec_id AS query_id, cb.msub, cb.j,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  [q.pqv[CAST(cb.msub*8 + i AS INT)] * cv[CAST(i AS INT)]
                   for i in range(1, 9)]), (x, y) -> x + y) AS d
                FROM eq q, cb WHERE q.vec_id % 4 <> 0),
         qd AS (SELECT p.query_id, p.cell,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  [q.pqv[CAST(i AS INT)] * c.pqv[CAST(i AS INT)] for i in range(1, 65)]),
                  (x, y) -> x + y) AS qc
                FROM probes p
                JOIN eq q ON q.vec_id = p.query_id
                JOIN eq c ON c.vec_id = p.cell),
         cand AS (SELECT p.query_id, p.cell, cl.vec_id AS neighbor_id
                  FROM probes p
                  JOIN cells cl ON cl.cell = p.cell
                  WHERE cl.vec_id <> p.query_id
                    AND cl.vec_id % 4 <= p.query_id % 4),
         adc AS (SELECT c.query_id, c.neighbor_id, qd.qc + sum(l.d) AS score
                 FROM cand c
                 JOIN codes k2 ON k2.vec_id = c.neighbor_id
                 JOIN lut l ON l.query_id = c.query_id
                   AND l.msub = k2.msub AND l.j = k2.code
                 JOIN qd ON qd.query_id = c.query_id AND qd.cell = c.cell
                 GROUP BY 1, 2, qd.qc),
         short AS (SELECT query_id, neighbor_id FROM (
             SELECT query_id, neighbor_id,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY score DESC, neighbor_id) AS srank
             FROM adc) WHERE srank <= 40),
         rer AS (SELECT query_id, neighbor_id, rank FROM (
             SELECT s.query_id, s.neighbor_id,
                    row_number() OVER (PARTITION BY s.query_id
                      ORDER BY ${sqlCosine("qe.v", "ne.v", 64)} DESC, s.neighbor_id) AS rank
             FROM short s
             JOIN e qe ON qe.vec_id = s.query_id
             JOIN e ne ON ne.vec_id = s.neighbor_id) WHERE rank <= 10)
         SELECT query_id, CAST(query_id % 4 AS BIGINT) AS batch,
                CAST(rank AS BIGINT) AS rank, neighbor_id
         FROM rer""",

    // Two-phase PQ drift replay: q164's chain over the DRIFTED
    // embedding view (vec_id%6>=3 scales dim j by (1+j), with the
    // float rounding replayed exactly: the exact double product CAST
    // to REAL is IEEE float multiplication), scoring batches 1-4 from
    // the initial codebook export and batch 5 from the refreshed one.
    // Everything else — int8 cells from the initial batch's lowest 16
    // ids, 2-probe, ADC shortlist 40, float re-rank top 10, the
    // fold-forward predicate batch(n) <= batch(q) — is the q164
    // discipline at %6.
    "q165_pq_drift_gate" ->
      s"""WITH e AS (SELECT vec_id,
                CASE WHEN vec_id % 6 >= 3
                  THEN [CAST(CAST(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * i AS REAL) AS DOUBLE)
                        for i in range(1, 65)]
                  ELSE list_transform(embedding, x -> CAST(x AS DOUBLE)) END AS v
              FROM embeddings),
         mx AS (SELECT vec_id, list_max(list_transform(v, x -> abs(x))) AS m FROM e),
         qt AS (SELECT e.vec_id,
                  CASE WHEN mx.m = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
                       ELSE list_transform(v, x -> CAST(trunc(x * (127.0 / mx.m)) AS BIGINT))
                  END AS qv
                FROM e JOIN mx USING (vec_id)),
         qn AS (SELECT vec_id, qv,
                  sqrt(CAST(${sqlDotInt("qv", "qv", 64)} AS DOUBLE)) AS nrm
                FROM qt),
         cents AS (SELECT vec_id AS cid, qv AS cqv, nrm AS cn FROM qn
                   WHERE vec_id % 6 = 0 ORDER BY vec_id LIMIT 16),
         cells AS (SELECT vec_id, cell FROM (
             SELECT qn.vec_id, c.cid AS cell,
                    row_number() OVER (PARTITION BY qn.vec_id
                      ORDER BY CAST(${sqlDotInt("qn.qv", "c.cqv", 64)} AS DOUBLE)
                                 / (qn.nrm * c.cn) DESC, c.cid) AS rn
             FROM qn, cents c) WHERE rn = 1),
         probes AS (SELECT vec_id AS query_id, cell FROM (
             SELECT qn.vec_id, c.cid AS cell,
                    row_number() OVER (PARTITION BY qn.vec_id
                      ORDER BY CAST(${sqlDotInt("qn.qv", "c.cqv", 64)} AS DOUBLE)
                                 / (qn.nrm * c.cn) DESC, c.cid) AS rn
             FROM qn, cents c WHERE qn.vec_id % 6 <> 0) WHERE rn <= 2),
         cb0 AS (SELECT msub, j, cv FROM read_parquet('$PqDriftCb0Path/*.parquet')),
         cb1 AS (SELECT msub, j, cv FROM read_parquet('$PqDriftCb1Path/*.parquet')),
         eq AS (SELECT vec_id,
                [CAST(floor(x) AS BIGINT) for x in list_transform(v, x -> x * 1000)] AS pqv
                FROM e),
         codes0 AS (SELECT vec_id, msub, j AS code FROM (
             SELECT eq.vec_id, cb0.msub, cb0.j,
                    row_number() OVER (PARTITION BY eq.vec_id, cb0.msub
                      ORDER BY list_reduce(list_prepend(CAST(0 AS BIGINT),
                        [(pqv[CAST(cb0.msub*8 + i AS INT)] - cv[CAST(i AS INT)])
                         * (pqv[CAST(cb0.msub*8 + i AS INT)] - cv[CAST(i AS INT)])
                         for i in range(1, 9)]), (x, y) -> x + y) ASC, cb0.j) AS rn
             FROM eq, cb0) WHERE rn = 1),
         codes1 AS (SELECT vec_id, msub, j AS code FROM (
             SELECT eq.vec_id, cb1.msub, cb1.j,
                    row_number() OVER (PARTITION BY eq.vec_id, cb1.msub
                      ORDER BY list_reduce(list_prepend(CAST(0 AS BIGINT),
                        [(pqv[CAST(cb1.msub*8 + i AS INT)] - cv[CAST(i AS INT)])
                         * (pqv[CAST(cb1.msub*8 + i AS INT)] - cv[CAST(i AS INT)])
                         for i in range(1, 9)]), (x, y) -> x + y) ASC, cb1.j) AS rn
             FROM eq, cb1) WHERE rn = 1),
         lut0 AS (SELECT q.vec_id AS query_id, cb0.msub, cb0.j,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  [q.pqv[CAST(cb0.msub*8 + i AS INT)] * cv[CAST(i AS INT)]
                   for i in range(1, 9)]), (x, y) -> x + y) AS d
                FROM eq q, cb0 WHERE q.vec_id % 6 BETWEEN 1 AND 4),
         lut1 AS (SELECT q.vec_id AS query_id, cb1.msub, cb1.j,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  [q.pqv[CAST(cb1.msub*8 + i AS INT)] * cv[CAST(i AS INT)]
                   for i in range(1, 9)]), (x, y) -> x + y) AS d
                FROM eq q, cb1 WHERE q.vec_id % 6 = 5),
         cand AS (SELECT p.query_id, cl.vec_id AS neighbor_id
                  FROM probes p
                  JOIN cells cl ON cl.cell = p.cell
                  WHERE cl.vec_id <> p.query_id
                    AND cl.vec_id % 6 <= p.query_id % 6),
         adc AS (SELECT c.query_id, c.neighbor_id, sum(l.d) AS score
                 FROM cand c
                 JOIN codes0 k2 ON k2.vec_id = c.neighbor_id
                 JOIN lut0 l ON l.query_id = c.query_id
                   AND l.msub = k2.msub AND l.j = k2.code
                 WHERE c.query_id % 6 <= 4
                 GROUP BY 1, 2
                 UNION ALL
                 SELECT c.query_id, c.neighbor_id, sum(l.d) AS score
                 FROM cand c
                 JOIN codes1 k2 ON k2.vec_id = c.neighbor_id
                 JOIN lut1 l ON l.query_id = c.query_id
                   AND l.msub = k2.msub AND l.j = k2.code
                 WHERE c.query_id % 6 = 5
                 GROUP BY 1, 2),
         short AS (SELECT query_id, neighbor_id FROM (
             SELECT query_id, neighbor_id,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY score DESC, neighbor_id) AS srank
             FROM adc) WHERE srank <= 40),
         rer AS (SELECT query_id, neighbor_id, rank FROM (
             SELECT s.query_id, s.neighbor_id,
                    row_number() OVER (PARTITION BY s.query_id
                      ORDER BY ${sqlCosine("qe.v", "ne.v", 64)} DESC, s.neighbor_id) AS rank
             FROM short s
             JOIN e qe ON qe.vec_id = s.query_id
             JOIN e ne ON ne.vec_id = s.neighbor_id) WHERE rank <= 10)
         SELECT query_id, CAST(query_id % 6 AS BIGINT) AS batch,
                CAST(rank AS BIGINT) AS rank, neighbor_id
         FROM rer""",


    "q38_ann_ivf" ->
      s"""WITH $embCte,
         cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
         cells AS (SELECT vec_id, cell FROM (
             SELECT e.vec_id, c.cid AS cell,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY ${sqlCosine("e.v", "c.cv", 64)} DESC, c.cid) AS rn
             FROM e, cents c) WHERE rn = 1),
         probes AS (SELECT vec_id AS query_id, cell FROM (
             SELECT e.vec_id, c.cid AS cell,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY ${sqlCosine("e.v", "c.cv", 64)} DESC, c.cid) AS rn
             FROM e, cents c WHERE e.vec_id % 100 = 0) WHERE rn <= 2),
         scored AS (SELECT p.query_id, n.vec_id AS neighbor_id,
                    row_number() OVER (PARTITION BY p.query_id
                      ORDER BY ${sqlCosine("q.v", "n.v", 64)} DESC, n.vec_id) AS rank
                    FROM probes p
                    JOIN cells cl ON cl.cell = p.cell
                    JOIN e n ON n.vec_id = cl.vec_id
                    JOIN e q ON q.vec_id = p.query_id
                    WHERE n.vec_id <> p.query_id)
         SELECT query_id, rank, neighbor_id FROM scored WHERE rank <= 10""",

    // Same probe/rerank as q38, but over the TRAINED centroid table the
    // Spark run exports (bit-deterministic driver-side Lloyd's — see
    // Similarity.kmeansCentroids). Tie-breaks ((sim DESC, cid) for
    // assignment/probes, (sim DESC, vec_id) for rerank) mirror the
    // serving argmax exactly.
    "q39_ann_ivf_trained" ->
      s"""WITH $embCte,
         cents AS (SELECT cid, cv FROM read_parquet('$CentroidExportPath/*.parquet')),
         cells AS (SELECT vec_id, cell FROM (
             SELECT e.vec_id, c.cid AS cell,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY ${sqlCosine("e.v", "c.cv", 64)} DESC, c.cid) AS rn
             FROM e, cents c) WHERE rn = 1),
         probes AS (SELECT vec_id AS query_id, cell FROM (
             SELECT e.vec_id, c.cid AS cell,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY ${sqlCosine("e.v", "c.cv", 64)} DESC, c.cid) AS rn
             FROM e, cents c WHERE e.vec_id % 100 = 0) WHERE rn <= 2),
         scored AS (SELECT p.query_id, n.vec_id AS neighbor_id,
                    row_number() OVER (PARTITION BY p.query_id
                      ORDER BY ${sqlCosine("q.v", "n.v", 64)} DESC, n.vec_id) AS rank
                    FROM probes p
                    JOIN cells cl ON cl.cell = p.cell
                    JOIN e n ON n.vec_id = cl.vec_id
                    JOIN e q ON q.vec_id = p.query_id
                    WHERE n.vec_id <> p.query_id)
         SELECT query_id, rank, neighbor_id FROM scored WHERE rank <= 10""",

    "q37_dedup_clusters" ->
      s"""WITH RECURSIVE $cappedJaccardCte,
         edges AS (SELECT id_a AS a, id_b AS b FROM jac
                   UNION SELECT id_b, id_a FROM jac),
         reach(a, b) AS (SELECT doc_id, doc_id FROM documents
                         UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
         SELECT a AS doc_id, min(b) AS component_id FROM reach GROUP BY a""",

    // q182's twin deliberately builds the ALL-PAIRS bucket graph (the
    // Spark side emits star edges) — matching labels prove star ≡
    // all-pairs under connected components on a corpus with a
    // genuinely hot (32-doc) bucket.
    "q182_lsh_star_clusters" ->
      s"""WITH RECURSIVE $lshAugDocsCte,
         ${bandKeyCtesOver("docsx")},
         cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                  FROM bk x JOIN bk y ON x.band = y.band AND x.key = y.key
                    AND x.doc_id <> y.doc_id),
         reach(a, b) AS (SELECT doc_id, doc_id FROM docsx
                         UNION SELECT r.a, e.b FROM reach r JOIN cand e ON r.b = e.a)
         SELECT a AS doc_id, min(b) AS component_id FROM reach GROUP BY a""",

    "q184_html_extract" ->
      s"""WITH $htmlExtractCte
         SELECT doc_id, text, n_tags, n_script_blocks, n_style_blocks,
                n_comments, n_entities, n_blocks, n_boilerplate
         FROM hx""",

    "q187_warc_url_profile" ->
      s"""SELECT doc_id,
         ${sqlMessyUri("doc_id")} AS target_uri,
         ${sqlNormUri("doc_id")} AS url_norm,
         ${sqlUriHost("doc_id")} AS host,
         ${sqlUriDomain("doc_id")} AS registered_domain
         FROM documents""",

    "q188_url_domain_quota" ->
      s"""WITH p AS (SELECT doc_id, text,
             ${sqlUriDomain("doc_id")} AS registered_domain
           FROM documents),
         r AS (SELECT doc_id, registered_domain,
             CAST(row_number() OVER (PARTITION BY registered_domain
               ORDER BY md5(text), doc_id) AS BIGINT) AS sample_rank
           FROM p)
         SELECT doc_id, registered_domain, sample_rank FROM r
         WHERE sample_rank <= 5""",

    "q189_url_revisit_dedup" ->
      s"""WITH rows_ AS (
           SELECT doc_id, CAST(0 AS BIGINT) AS is_revisit, doc_id AS src FROM documents
           UNION ALL
           SELECT doc_id + 1000001, CAST(1 AS BIGINT), doc_id FROM documents WHERE doc_id % 67 = 0
           UNION ALL
           SELECT doc_id + 3000001, CAST(0 AS BIGINT), doc_id FROM documents WHERE doc_id % 53 = 0),
         urls AS (SELECT doc_id, is_revisit,
             ${sqlNormUri("src")} AS url_norm
           FROM rows_),
         canon AS (SELECT url_norm, min(doc_id) AS url_canonical_id
           FROM urls WHERE is_revisit = 0 GROUP BY 1)
         SELECT u.doc_id, u.url_norm, u.is_revisit, c.url_canonical_id,
                (u.is_revisit = 0 AND u.doc_id = c.url_canonical_id) AS keep
         FROM urls u LEFT JOIN canon c USING (url_norm)""",

    // route-dependent source text (extraction closed form for the html
    // captures, raw text for the plain ones), then the q33 SimHash
    // chain split into the 4×15-bit bands.
    "q186_warc_html_route" ->
      s"""WITH $htmlExtractCte,
         srcx AS (SELECT doc_id, text FROM hx WHERE doc_id % 2 = 0
                  UNION ALL
                  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
         tfx AS (SELECT doc_id, token, count(*) AS cnt FROM
             (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token FROM srcx)
             GROUP BY 1, 2),
         thx AS (SELECT doc_id, cnt, ${h60("token")} AS h FROM tfx),
         bitsx AS (SELECT doc_id, b,
             sum(CASE WHEN (h >> CAST(b AS INT)) & 1 = 1 THEN cnt ELSE -cnt END) AS s
             FROM thx, UNNEST(range(60)) AS t(b) GROUP BY 1, 2),
         fpx AS (SELECT doc_id,
             sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS f
             FROM bitsx GROUP BY 1)
         SELECT 'text' AS modality, doc_id,
                CAST(f & 32767 AS INT) AS b0,
                CAST((f >> 15) & 32767 AS INT) AS b1,
                CAST((f >> 30) & 32767 AS INT) AS b2,
                CAST((f >> 45) & 32767 AS INT) AS b3
         FROM fpx""",

    "q183_lsh_banded_capped" ->
      s"""WITH $lshAugDocsCte,
         ${bandKeyCtesOver("docsx")},
         hotb AS (SELECT band, key FROM bk GROUP BY band, key HAVING count(*) > 8),
         bkk AS (SELECT bk.doc_id, bk.band, bk.key FROM bk
                 WHERE NOT EXISTS (SELECT 1 FROM hotb
                   WHERE hotb.band = bk.band AND hotb.key = bk.key)),
         cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                  FROM bkk x JOIN bkk y ON x.band = y.band AND x.key = y.key
                    AND x.doc_id < y.doc_id),
         shcnt AS (SELECT doc_id, count(*) AS c FROM shx GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
                   FROM shx a JOIN shx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         jac AS (SELECT id_a, id_b, inter, ca.c + cb.c - inter AS union_size
                 FROM inter JOIN shcnt ca ON id_a = ca.doc_id JOIN shcnt cb ON id_b = cb.doc_id
                 WHERE inter * 2 > ca.c + cb.c - inter)
         SELECT j.id_a, j.id_b, j.inter, j.union_size FROM jac j
         WHERE EXISTS (SELECT 1 FROM cand WHERE cand.id_a = j.id_a AND cand.id_b = j.id_b)""",

    // Text gate replay: the same minhash/band/jaccard reconstruction
    // as q85/q32 feeding the unrolled 3-batch fold chain; decisions
    // from the chain, cluster labels from the q37 recursive CTE over
    // exactly the pairs the gate discovers (batch-incident near-dups
    // vs accepted-so-far, plus within-batch pairs).
    "q104_gate_replay" ->
      s"""WITH RECURSIVE $jaccardCte,
         perm(i, a, b) AS (VALUES $minhashPermValues),
         hh AS (SELECT doc_id, ${h60("shingle")} % 2147483647 AS h FROM sh),
         mh AS (SELECT doc_id, i, min((a * h + b) % 2147483647) AS h
                FROM hh, perm GROUP BY doc_id, i),
         bk AS (SELECT doc_id, i // 4 AS band, md5(string_agg(h::VARCHAR, ',' ORDER BY i)) AS key
                FROM mh GROUP BY doc_id, i // 4),
         ndp AS (SELECT DISTINCT x.doc_id AS u, y.doc_id AS v
                 FROM bk x JOIN bk y ON x.band = y.band AND x.key = y.key
                   AND x.doc_id <> y.doc_id),
         nd AS (SELECT p.u, p.v FROM ndp p JOIN jac j
                ON j.id_a = least(p.u, p.v) AND j.id_b = greatest(p.u, p.v)),
         acc0 AS (SELECT doc_id AS id FROM documents WHERE doc_id % 4 = 0),
         ${gateFoldCtes("doc_id", "documents", 3)},
         gedges AS (${(1 to 3).map(i =>
          s"""SELECT n.u, n.v FROM nd n JOIN acc${i - 1} a ON n.v = a.id WHERE n.u % 4 = $i
             UNION SELECT n.u, n.v FROM nd n WHERE n.u % 4 = $i AND n.v % 4 = $i""")
          .mkString("\n UNION\n ")}),
         sym AS (SELECT u AS a, v AS b FROM gedges UNION SELECT v, u FROM gedges),
         reach(a, b) AS (SELECT doc_id, doc_id FROM documents
                         UNION SELECT r.a, e.b FROM reach r JOIN sym e ON r.b = e.a),
         comp AS (SELECT a AS doc_id, min(b) AS component_id FROM reach GROUP BY a)
         SELECT d.doc_id, d.doc_id % 4 AS batch,
                coalesce(r.reason, 'accepted') AS status, c.component_id
         FROM documents d
         LEFT JOIN (${gateRejUnion(3)}) r ON r.id = d.doc_id
         JOIN comp c ON c.doc_id = d.doc_id
         WHERE d.doc_id % 4 <> 0""",

    // Embedding gate replay: fixed B=4 signatures (the replay pins
    // targetBucket huge, so auto-B sits at its floor throughout) over
    // the q93 quantized-hyperplane reconstruction, then the same fold
    // chain.
    "q105_embedding_gate_replay" ->
      s"""WITH RECURSIVE $embCte,
         eq AS (SELECT vec_id, v,
                [CAST(floor(x) AS BIGINT) for x in list_transform(embedding, x -> CAST(x AS DOUBLE) * 1000)] AS qv
                FROM embeddings JOIN e USING (vec_id)),
         pl AS (SELECT p, j, ${h60("p::VARCHAR || '_' || j::VARCHAR")} % 2001 - 1000 AS comp
                FROM range(4) t(p), range(64) u(j)),
         dots AS (SELECT eq.vec_id, pl.p, sum(eq.qv[CAST(pl.j+1 AS INT)] * pl.comp) AS d
                  FROM eq, pl GROUP BY 1, 2),
         sig AS (SELECT vec_id,
                 sum(CASE WHEN d > 0 THEN (CAST(1 AS BIGINT) << CAST(p AS INT)) ELSE 0 END) AS bucket
                 FROM dots GROUP BY 1),
         nd AS (SELECT sa.vec_id AS u, sb.vec_id AS v
                FROM sig sa JOIN sig sb ON sa.bucket = sb.bucket AND sa.vec_id <> sb.vec_id
                JOIN e a ON a.vec_id = sa.vec_id JOIN e b ON b.vec_id = sb.vec_id
                WHERE ${sqlCosine("a.v", "b.v", 64)} >= 0.30),
         acc0 AS (SELECT vec_id AS id FROM embeddings WHERE vec_id % 4 = 0),
         ${gateFoldCtes("vec_id", "embeddings", 3)},
         gedges AS (${(1 to 3).map(i =>
          s"""SELECT n.u, n.v FROM nd n JOIN acc${i - 1} a ON n.v = a.id WHERE n.u % 4 = $i
             UNION SELECT n.u, n.v FROM nd n WHERE n.u % 4 = $i AND n.v % 4 = $i""")
          .mkString("\n UNION\n ")}),
         sym AS (SELECT u AS a, v AS b FROM gedges UNION SELECT v, u FROM gedges),
         reach(a, b) AS (SELECT vec_id, vec_id FROM embeddings
                         UNION SELECT r.a, e.b FROM reach r JOIN sym e ON r.b = e.a),
         comp AS (SELECT a AS vec_id, min(b) AS component_id FROM reach GROUP BY a)
         SELECT m.vec_id, m.vec_id % 4 AS batch,
                coalesce(r.reason, 'accepted') AS status, c.component_id
         FROM embeddings m
         LEFT JOIN (${gateRejUnion(3)}) r ON r.id = m.vec_id
         JOIN comp c ON c.vec_id = m.vec_id
         WHERE m.vec_id % 4 <> 0""",

    // Delta fold ≡ full recompute: the oracle is the FULL CC over the
    // union edge set — q37's SQL verbatim — while the Spark side folds
    // the doc_id%7=0 batch into standing labels incrementally.
    "q103_dedup_clusters_delta" ->
      s"""WITH RECURSIVE $cappedJaccardCte,
         edges AS (SELECT id_a AS a, id_b AS b FROM jac
                   UNION SELECT id_b, id_a FROM jac),
         reach(a, b) AS (SELECT doc_id, doc_id FROM documents
                         UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
         SELECT a AS doc_id, min(b) AS component_id FROM reach GROUP BY a""",

    "q40_lang_id" ->
      s"""WITH hits AS (SELECT doc_id, lang, count(*) AS hits FROM
              (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS tok FROM documents) t
              JOIN (VALUES $stopwordValues) AS sw(lang, word) ON tok = word
              GROUP BY 1, 2),
         best AS (SELECT doc_id, lang, hits,
                  row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang) AS rn
                  FROM hits)
         SELECT d.doc_id,
                coalesce(b.lang, 'und') AS predicted_lang,
                coalesce(b.hits, 0) AS hits
         FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)""",

    "q41_quality_score" ->
      """WITH f AS (SELECT doc_id,
           length(text) AS n_chars,
           len(regexp_extract_all(text, '\S+')) AS n_tokens,
           len(list_distinct(regexp_extract_all(text, '\S+'))) AS n_uniq_tokens,
           len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct
           FROM documents)
         SELECT doc_id, n_chars, n_tokens, n_uniq_tokens, n_punct,
           (CAST(n_uniq_tokens AS BIGINT) * 1000) // greatest(n_tokens, 1) AS uniq_permille,
           (CAST(n_uniq_tokens AS BIGINT) * 500) // greatest(n_tokens, 1)
             + (CAST(least(n_tokens, 400) AS BIGINT) * 500) // 400 AS quality_score
         FROM f""",

    "q42_token_counts" ->
      """SELECT doc_id,
         len(regexp_extract_all(text, '\S+')) AS ws_tokens,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens,
         length(text) AS n_chars
         FROM documents""",

    "q43_fingerprints" ->
      s"""SELECT doc_id,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           [CAST(ord(substr(text, CAST(i AS INT), 1)) AS BIGINT) for i in range(1, len(text)+1)]),
           (acc, x) -> (acc * 31 + x) % 1000000007) AS poly_hash,
         CASE WHEN len(text) >= 8 THEN
           list_min([${h60("substr(text, CAST(i AS INT), 8)")} for i in range(1, len(text)-6)])
         ELSE NULL END AS min_window_hash
         FROM documents""",

    "q82_decontaminate" ->
      s"""WITH $shingleCte,
         shh AS (SELECT doc_id, ${h60("shingle")} AS h FROM sh),
         ev AS (SELECT DISTINCT h FROM shh WHERE doc_id % 97 = 0),
         hits AS (SELECT doc_id, count(*) AS n FROM shh
                  WHERE doc_id % 97 <> 0 AND h IN (SELECT h FROM ev)
                  GROUP BY doc_id)
         SELECT d.doc_id,
                CAST(coalesce(h.n, 0) AS BIGINT) AS n_contaminated_shingles,
                coalesce(h.n, 0) > 0 AS contaminated
         FROM documents d LEFT JOIN hits h USING (doc_id)
         WHERE d.doc_id % 97 <> 0""",

    "q83_quota_sample" ->
      """SELECT doc_id, lang, source, CAST(sample_rank AS BIGINT) AS sample_rank FROM (
           SELECT doc_id, lang, source,
                  row_number() OVER (PARTITION BY lang, source
                    ORDER BY md5(text), doc_id) AS sample_rank
           FROM documents) WHERE sample_rank <= 50""",

    "q84_cluster_canonical" ->
      s"""WITH RECURSIVE $cappedJaccardCte,
         cedges AS (SELECT id_a AS a, id_b AS b FROM jac
                    UNION SELECT id_b, id_a FROM jac),
         reach(a, b) AS (SELECT doc_id, doc_id FROM documents
                         UNION SELECT r.a, e.b FROM reach r JOIN cedges e ON r.b = e.a),
         comp AS (SELECT a AS doc_id, min(b) AS component_id FROM reach GROUP BY a),
         qs AS (SELECT doc_id,
                  (CAST(len(list_distinct(regexp_extract_all(text, '\\S+'))) AS BIGINT) * 500)
                    // greatest(len(regexp_extract_all(text, '\\S+')), 1)
                  + (CAST(least(len(regexp_extract_all(text, '\\S+')), 400) AS BIGINT) * 500) // 400
                  AS quality_score
                FROM documents),
         canon AS (SELECT component_id, doc_id AS canonical_id FROM (
                     SELECT c.component_id, c.doc_id,
                            row_number() OVER (PARTITION BY c.component_id
                              ORDER BY q.quality_score DESC, c.doc_id) AS rn
                     FROM comp c JOIN qs q USING (doc_id)) WHERE rn = 1)
         SELECT c.doc_id, c.component_id, n.canonical_id,
                c.doc_id = n.canonical_id AS keep
         FROM comp c JOIN canon n USING (component_id)""",

    "q85_dedup_delta" ->
      s"""WITH $jaccardCte,
         perm(i, a, b) AS (VALUES ${graft.ops.Dedup.minhashCoeffs(64).zipWithIndex
        .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")}),
         hh AS (SELECT doc_id, ${h60("shingle")} % 2147483647 AS h FROM sh),
         mh AS (SELECT doc_id, i, min((a * h + b) % 2147483647) AS h
                FROM hh, perm GROUP BY doc_id, i),
         bk AS (SELECT doc_id, i // 4 AS band, md5(string_agg(h::VARCHAR, ',' ORDER BY i)) AS key
                FROM mh GROUP BY doc_id, i // 4),
         cand AS (SELECT DISTINCT d.doc_id AS delta_id, s.doc_id AS corpus_id
                  FROM bk d JOIN bk s ON d.band = s.band AND d.key = s.key
                  WHERE d.doc_id % 7 = 0 AND s.doc_id % 7 <> 0)
         SELECT c.delta_id, c.corpus_id, j.inter, j.union_size
         FROM cand c JOIN jac j
           ON j.id_a = least(c.delta_id, c.corpus_id)
          AND j.id_b = greatest(c.delta_id, c.corpus_id)""",

    "q86_shard_pack" ->
      """WITH tk AS (SELECT doc_id,
             CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
             md5(text) AS okey
           FROM documents),
         c AS (SELECT doc_id, n_tokens,
                 CAST(coalesce(sum(n_tokens) OVER (ORDER BY okey, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
               FROM tk)
         SELECT doc_id, n_tokens, cb // 16384 AS shard_id, cb % 16384 AS offset_tokens
         FROM c""",

    // BPE shard pack: q86's pack arithmetic over the subword counts.
    // The BPE replay wraps every code point in chr(31) separators and
    // applies one replace() per merge — string replace's left-to-right
    // non-overlapping scan over the double-separator encoding is
    // EXACTLY the kernel's one-pass-per-merge semantics (each match
    // consumes both wrapped tokens whole; a fresh merge result cannot
    // re-merge in the same pass). The chain is generated from
    // BpeTokenizer.Merges, the single source of truth.
    "q118_bpe_shard_pack" ->
      s"""WITH enc AS (SELECT doc_id, text, $bpeEncodeSql AS s FROM documents),
         tk AS (SELECT doc_id,
             CAST(CASE WHEN len(text) = 0 THEN 0
                  ELSE (len(s) - len(replace(s, chr(31), ''))) // 2 END AS BIGINT) AS n_tokens,
             md5(text) AS okey
           FROM enc),
         c AS (SELECT doc_id, n_tokens,
                 CAST(coalesce(sum(n_tokens) OVER (ORDER BY okey, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
               FROM tk)
         SELECT doc_id, n_tokens, cb // 16384 AS shard_id, cb % 16384 AS offset_tokens
         FROM c
         UNION ALL
         SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
         WHERE EXISTS (SELECT 1 FROM documents WHERE contains(text, chr(31)))""",

    "q87_mixture_sample" ->
      """WITH n AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         w AS (SELECT lang, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w FROM n),
         q AS (SELECT lang,
                 (200 * w) // CAST((SELECT sum(w) FROM w) AS BIGINT) AS quota
               FROM w),
         r AS (SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS mix_rank
               FROM documents)
         SELECT r.doc_id, r.lang, CAST(r.mix_rank AS BIGINT) AS mix_rank
         FROM r JOIN q USING (lang) WHERE r.mix_rank <= q.quota""",

    "q89_redact_pii" ->
      s"""WITH aug AS (SELECT doc_id,
           CASE WHEN doc_id % 5 = 0
                THEN text || ' contact user' || CAST(doc_id AS VARCHAR) ||
                     '@example.com or +1 (555) 010-' ||
                     lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                ELSE text END AS text
         FROM documents)
         SELECT doc_id,
         regexp_replace(regexp_replace(text, '$emailRe', '<EMAIL>', 'g'),
                        '$phoneRe', '<PHONE>', 'g') AS clean_text,
         CAST(len(regexp_extract_all(text, '$emailRe')) AS BIGINT) AS n_emails,
         CAST(len(regexp_extract_all(
           regexp_replace(text, '$emailRe', '<EMAIL>', 'g'), '$phoneRe')) AS BIGINT) AS n_phones
         FROM aug""",

    "q90_repetition" ->
      """WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents),
         bg AS (SELECT doc_id, w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)] AS b
                FROM toks, UNNEST(range(1, len(w))) AS t(i) WHERE len(w) >= 2),
         bc AS (SELECT doc_id, b, count(*) AS n FROM bg GROUP BY 1, 2),
         bs AS (SELECT doc_id, sum(n) AS n_bigrams,
                       sum(CASE WHEN n >= 2 THEN n ELSE 0 END) AS dup_bigram_tokens
                FROM bc GROUP BY 1),
         tc AS (SELECT doc_id, tok, count(*) AS n FROM
                  (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok FROM documents)
                GROUP BY 1, 2),
         ts AS (SELECT doc_id, sum(n) AS n_tokens, max(n) AS max_token_freq FROM tc GROUP BY 1)
         SELECT d.doc_id,
                CAST(coalesce(bs.n_bigrams, 0) AS BIGINT) AS n_bigrams,
                CAST(coalesce(bs.dup_bigram_tokens, 0) AS BIGINT) AS dup_bigram_tokens,
                CAST(coalesce(bs.dup_bigram_tokens, 0) * 1000 //
                     greatest(coalesce(bs.n_bigrams, 0), 1) AS BIGINT) AS rep_permille,
                CAST(coalesce(ts.max_token_freq, 0) * 1000 //
                     greatest(coalesce(ts.n_tokens, 0), 1) AS BIGINT) AS top_token_permille
         FROM documents d LEFT JOIN bs USING (doc_id) LEFT JOIN ts USING (doc_id)""",

    "q88_corpus_stats" ->
      """WITH tk AS (SELECT doc_id, lang,
             CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS nt
           FROM documents),
         r AS (SELECT lang, nt,
                 row_number() OVER (PARTITION BY lang ORDER BY nt, doc_id) AS rn,
                 count(*) OVER (PARTITION BY lang) AS n
               FROM tk)
         SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
                CAST(sum(nt) AS BIGINT) AS sum_tokens,
                max(CASE WHEN rn = (n + 1) // 2 THEN nt END) AS p50_tokens,
                max(CASE WHEN rn = (19 * n + 19) // 20 THEN nt END) AS p95_tokens
         FROM r GROUP BY lang""",

    // q88's exact replay + exact vocabulary; the sketch gate column is
    // the literal 1 — the Spark side computes it from |sketch - exact|
    // against the documented bounds, so an out-of-bound sketch breaks
    // the hash match.
    "q125_sketch_stats" ->
      """WITH tk AS (SELECT doc_id, lang,
             CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS nt
           FROM documents),
         r AS (SELECT lang, nt,
                 row_number() OVER (PARTITION BY lang ORDER BY nt, doc_id) AS rn,
                 count(*) OVER (PARTITION BY lang) AS n
               FROM tk),
         ex AS (SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
                CAST(sum(nt) AS BIGINT) AS sum_tokens,
                max(CASE WHEN rn = (n + 1) // 2 THEN nt END) AS p50_tokens,
                max(CASE WHEN rn = (19 * n + 19) // 20 THEN nt END) AS p95_tokens
           FROM r GROUP BY lang),
         vb AS (SELECT lang, CAST(count(DISTINCT tok) AS BIGINT) AS n_vocab
           FROM (SELECT lang, unnest(regexp_extract_all(text, '\S+')) AS tok
                 FROM documents) GROUP BY lang)
         SELECT ex.lang, ex.n_docs, ex.sum_tokens, ex.p50_tokens,
                ex.p95_tokens, vb.n_vocab, CAST(1 AS BIGINT) AS sketch_ok
         FROM ex JOIN vb USING (lang)""",

    // q82's exact replay + the two sketch-gate literals: the Spark
    // side computes bloom_ok from per-doc Bloom coverage of the exact
    // flags (no false negatives) and fp_ok from the corpus-wide FP
    // rate vs the sizing bound — either regressing breaks the hash.
    "q126_decontaminate_bloom" ->
      s"""WITH $shingleCte,
         shh AS (SELECT doc_id, ${h60("shingle")} AS h FROM sh),
         ev AS (SELECT DISTINCT h FROM shh WHERE doc_id % 97 = 0),
         hits AS (SELECT doc_id, count(*) AS n FROM shh
                  WHERE doc_id % 97 <> 0 AND h IN (SELECT h FROM ev)
                  GROUP BY doc_id)
         SELECT d.doc_id,
                CAST(coalesce(h.n, 0) AS BIGINT) AS n_contaminated_shingles,
                coalesce(h.n, 0) > 0 AS contaminated,
                CAST(1 AS BIGINT) AS bloom_ok,
                CAST(1 AS BIGINT) AS fp_ok
         FROM documents d LEFT JOIN hits h USING (doc_id)
         WHERE d.doc_id % 97 <> 0""",

    "q95_cluster_split" ->
      s"""WITH RECURSIVE $cappedJaccardCte,
         edges AS (SELECT id_a AS a, id_b AS b FROM jac
                   UNION SELECT id_b, id_a FROM jac),
         reach(a, b) AS (SELECT doc_id, doc_id FROM documents
                         UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         comp AS (SELECT a AS doc_id, min(b) AS component_id FROM reach GROUP BY a)
         SELECT doc_id, component_id,
                CASE WHEN substr(md5(CAST(component_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
                     WHEN substr(md5(CAST(component_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
                     ELSE 'test' END AS split
         FROM comp""",

    "q96_exact_substr" ->
      s"""WITH pos AS (SELECT doc_id, text,
             unnest(range(1, greatest(len(text) - 38, 1))) AS i
           FROM documents),
         w AS (SELECT doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               [CAST(ord(substr(text, CAST(i + k AS INT), 1)) AS BIGINT) for k in range(0, 40)]),
               (acc, x) -> (acc * 31 + x) % 1000000007) * 4294967296 +
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               [CAST(ord(substr(text, CAST(i + k AS INT), 1)) AS BIGINT) for k in range(0, 40)]),
               (acc, x) -> (acc * 131 + x) % 998244353) AS h
           FROM pos),
         mult AS (SELECT h, count(*) AS c FROM w GROUP BY h),
         per AS (SELECT doc_id, count(*) AS n_windows,
                   sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS n_repeated
                 FROM w JOIN mult USING (h) GROUP BY doc_id)
         SELECT d.doc_id,
                CAST(coalesce(p.n_windows, 0) AS BIGINT) AS n_windows,
                CAST(coalesce(p.n_repeated, 0) AS BIGINT) AS n_repeated,
                CAST(coalesce(p.n_repeated, 0) * 1000 //
                     greatest(coalesce(p.n_windows, 0), 1) AS BIGINT) AS repeated_permille
         FROM documents d LEFT JOIN per p USING (doc_id)""",

    // Winnowing replay: the same per-position rolling-hash
    // reconstruction as q96 (1-based char positions; ord(substr) =
    // code point), then leftmost-argmin selection per full
    // stride-window via a HUGEINT (h, pos) lexicographic pack — the
    // kernel's deque tie rule, exactly. The pack reserves 2^40 for the
    // position (h < 2^62, so h·2^40 + pos < 2^102 fits HUGEINT): docs
    // up to a trillion windows order correctly, vs a 2^20 pack that
    // would corrupt the argmin past ~1M-char docs.
    "q106_exact_substr_strided" -> {
      val S = 20
      s"""WITH pos AS (SELECT doc_id, text,
             unnest(range(1, greatest(len(text) - 38, 1))) AS i
           FROM documents),
         w AS (SELECT doc_id, i,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               [CAST(ord(substr(text, CAST(i + k AS INT), 1)) AS BIGINT) for k in range(0, 40)]),
               (acc, x) -> (acc * 31 + x) % 1000000007) * 4294967296 +
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               [CAST(ord(substr(text, CAST(i + k AS INT), 1)) AS BIGINT) for k in range(0, 40)]),
               (acc, x) -> (acc * 131 + x) % 998244353) AS h
           FROM pos),
         mcnt AS (SELECT doc_id, count(*) AS m FROM w GROUP BY doc_id),
         key AS (SELECT doc_id, i, h,
                 CAST(h AS HUGEINT) * 1099511627776 + i AS k FROM w),
         wm AS (SELECT doc_id, i AS j,
                  min(k) OVER (PARTITION BY doc_id ORDER BY i
                    ROWS BETWEEN CURRENT ROW AND ${S - 1} FOLLOWING) AS mk
                FROM key),
         selpos AS (SELECT DISTINCT wm.doc_id,
                      CAST(wm.mk % 1099511627776 AS BIGINT) AS i
                    FROM wm JOIN mcnt USING (doc_id)
                    WHERE wm.j <= greatest(mcnt.m - $S + 1, 1)),
         sel AS (SELECT s.doc_id, k.h
                 FROM selpos s JOIN key k ON k.doc_id = s.doc_id AND k.i = s.i),
         mult AS (SELECT h, count(*) AS c FROM sel GROUP BY h),
         per AS (SELECT doc_id, count(*) AS n_selected,
                   sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS n_repeated
                 FROM sel JOIN mult USING (h) GROUP BY doc_id)
         SELECT d.doc_id,
                CAST(coalesce(p.n_selected, 0) AS BIGINT) AS n_selected,
                CAST(coalesce(p.n_repeated, 0) AS BIGINT) AS n_repeated,
                CAST(coalesce(p.n_repeated, 0) * 1000 //
                     greatest(coalesce(p.n_selected, 0), 1) AS BIGINT) AS selected_rep_permille
         FROM documents d LEFT JOIN per p USING (doc_id)"""
    },

    // Delta fold ≡ full winnowed recompute: q106's chain verbatim with
    // the final restriction to the doc_id%7=0 delta — the multiplicity
    // index is over the UNION, exactly what the Spark side's
    // standing-index probe + delta counts reconstruct.
    "q116_winnowed_delta" -> {
      val S = 20
      s"""WITH pos AS (SELECT doc_id, text,
             unnest(range(1, greatest(len(text) - 38, 1))) AS i
           FROM documents),
         w AS (SELECT doc_id, i,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               [CAST(ord(substr(text, CAST(i + k AS INT), 1)) AS BIGINT) for k in range(0, 40)]),
               (acc, x) -> (acc * 31 + x) % 1000000007) * 4294967296 +
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               [CAST(ord(substr(text, CAST(i + k AS INT), 1)) AS BIGINT) for k in range(0, 40)]),
               (acc, x) -> (acc * 131 + x) % 998244353) AS h
           FROM pos),
         mcnt AS (SELECT doc_id, count(*) AS m FROM w GROUP BY doc_id),
         key AS (SELECT doc_id, i, h,
                 CAST(h AS HUGEINT) * 1099511627776 + i AS k FROM w),
         wm AS (SELECT doc_id, i AS j,
                  min(k) OVER (PARTITION BY doc_id ORDER BY i
                    ROWS BETWEEN CURRENT ROW AND ${S - 1} FOLLOWING) AS mk
                FROM key),
         selpos AS (SELECT DISTINCT wm.doc_id,
                      CAST(wm.mk % 1099511627776 AS BIGINT) AS i
                    FROM wm JOIN mcnt USING (doc_id)
                    WHERE wm.j <= greatest(mcnt.m - $S + 1, 1)),
         sel AS (SELECT s.doc_id, k.h
                 FROM selpos s JOIN key k ON k.doc_id = s.doc_id AND k.i = s.i),
         mult AS (SELECT h, count(*) AS c FROM sel GROUP BY h),
         per AS (SELECT doc_id, count(*) AS n_selected,
                   sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS n_repeated
                 FROM sel JOIN mult USING (h) GROUP BY doc_id)
         SELECT d.doc_id,
                CAST(coalesce(p.n_selected, 0) AS BIGINT) AS n_selected,
                CAST(coalesce(p.n_repeated, 0) AS BIGINT) AS n_repeated,
                CAST(coalesce(p.n_repeated, 0) * 1000 //
                     greatest(coalesce(p.n_selected, 0), 1) AS BIGINT) AS selected_rep_permille
         FROM documents d LEFT JOIN per p USING (doc_id)
         WHERE d.doc_id % 7 = 0"""
    },

    // Winnow-gate fold-forward: the q106 selection chain computes each
    // doc's content-determined fingerprints ONCE (selection is
    // doc-local); the gate's per-batch rule — an occurrence is
    // repeated iff its fingerprint's multiplicity over seed ∪ batches
    // ≤ i exceeds 1 — is the cumulative multiplicity join `mb`.
    "q119_winnow_gate_replay" -> {
      val S = 20
      s"""WITH pos AS (SELECT doc_id, text,
             unnest(range(1, greatest(len(text) - 38, 1))) AS i
           FROM documents),
         w AS (SELECT doc_id, i,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               [CAST(ord(substr(text, CAST(i + k AS INT), 1)) AS BIGINT) for k in range(0, 40)]),
               (acc, x) -> (acc * 31 + x) % 1000000007) * 4294967296 +
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               [CAST(ord(substr(text, CAST(i + k AS INT), 1)) AS BIGINT) for k in range(0, 40)]),
               (acc, x) -> (acc * 131 + x) % 998244353) AS h
           FROM pos),
         mcnt AS (SELECT doc_id, count(*) AS m FROM w GROUP BY doc_id),
         key AS (SELECT doc_id, i, h,
                 CAST(h AS HUGEINT) * 1099511627776 + i AS k FROM w),
         wm AS (SELECT doc_id, i AS j,
                  min(k) OVER (PARTITION BY doc_id ORDER BY i
                    ROWS BETWEEN CURRENT ROW AND ${S - 1} FOLLOWING) AS mk
                FROM key),
         selpos AS (SELECT DISTINCT wm.doc_id,
                      CAST(wm.mk % 1099511627776 AS BIGINT) AS i
                    FROM wm JOIN mcnt USING (doc_id)
                    WHERE wm.j <= greatest(mcnt.m - $S + 1, 1)),
         sel AS (SELECT s.doc_id, k.h
                 FROM selpos s JOIN key k ON k.doc_id = s.doc_id AND k.i = s.i),
         mult AS (SELECT h, doc_id % 4 AS b, count(*) AS c FROM sel GROUP BY 1, 2),
         mb AS (SELECT m.h, t.i, sum(m.c) AS cm
                FROM mult m, range(1, 4) t(i) WHERE m.b <= t.i GROUP BY 1, 2),
         per AS (SELECT d.doc_id, count(*) AS n_selected,
                   sum(CASE WHEN mb.cm > 1 THEN 1 ELSE 0 END) AS n_repeated
                 FROM sel d JOIN mb ON mb.h = d.h AND mb.i = d.doc_id % 4
                 WHERE d.doc_id % 4 <> 0
                 GROUP BY 1)
         SELECT d.doc_id, CAST(d.doc_id % 4 AS BIGINT) AS batch,
                CAST(coalesce(p.n_selected, 0) AS BIGINT) AS n_selected,
                CAST(coalesce(p.n_repeated, 0) AS BIGINT) AS n_repeated,
                CAST(coalesce(p.n_repeated, 0) * 1000 //
                     greatest(coalesce(p.n_selected, 0), 1) AS BIGINT) AS selected_rep_permille
         FROM documents d LEFT JOIN per p USING (doc_id)
         WHERE d.doc_id % 4 <> 0"""
    },

    // PPM decode twin: dimensions from octet_length, pixel digest from
    // the cycled byte stream — all in hex space (DuckDB lacks
    // md5(BLOB); hex(BLOB) is the shared byte form, uppercase).
    "q107_media_decode" ->
      """WITH src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t
           FROM documents),
         dims AS (SELECT doc_id, t,
             octet_length(encode(t)) AS l,
             8 + octet_length(encode(t)) % 40 AS w,
             6 + octet_length(encode(t)) % 23 AS h
           FROM src)
         SELECT doc_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(w * h * 3 AS BIGINT) AS n_pixel_bytes,
           md5(substr(repeat(hex(encode(t)), CAST((w*h*3 + l - 1) // l AS INT)),
               1, 2 * w * h * 3)) AS pixel_md5
         FROM dims""",

    // Video decode∘encode identity: dimensions/frame count from
    // octet_length, concatenated luma planes = the cycled source
    // bytes — rebuilt in hex space (q107's repeat+substr discipline).
    "q128_video_decode" ->
      """WITH src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t
           FROM documents),
         dims AS (SELECT doc_id, t,
             octet_length(encode(t)) AS l,
             8 + octet_length(encode(t)) % 24 AS w,
             6 + octet_length(encode(t)) % 17 AS h,
             2 + octet_length(encode(t)) % 5 AS nf
           FROM src)
         SELECT doc_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(nf AS BIGINT) AS n_frames,
           md5(substr(repeat(hex(encode(t)), CAST((nf*w*h + l - 1) // l AS INT)),
               1, 2 * nf * w * h)) AS luma_md5
         FROM dims""",

    // JPEG decode: the container is LOSSY, so the oracle rebuilds the
    // decoder's output — not the source — from the closed form of the
    // DC-only encoder: pixel of block (by,bx) = 128 + 2·trunc(S/128),
    // S = Σ(block bytes) − 64·128, bytes cycled from the source. This
    // pins entropy decode → dequant → IDCT end-to-end (any Huffman or
    // IDCT defect shifts a block's gray level and breaks the digest).
    "q139_jpeg_decode" ->
      """WITH src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t
           FROM documents),
         dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             8 * (1 + octet_length(encode(t)) % 5) AS w,
             8 * (1 + octet_length(encode(t)) % 4) AS h
           FROM src),
         bsum AS (SELECT doc_id, w, h, by, bx,
             sum((strpos('0123456789ABCDEF', substr(hx,
                   CAST(2*(((by*8 + i//8)*w + bx*8 + i%8) % l)+1 AS INT), 1)) - 1) * 16
               + strpos('0123456789ABCDEF', substr(hx,
                   CAST(2*(((by*8 + i//8)*w + bx*8 + i%8) % l)+2 AS INT), 1)) - 1)
               - 8192 AS s
           FROM dims, UNNEST(range(0, h//8)) u1(by), UNNEST(range(0, w//8)) u2(bx),
                UNNEST(range(64)) u3(i)
           GROUP BY 1, 2, 3, 4, 5),
         blocks AS (SELECT doc_id, w, h, by, bx,
             greatest(0, least(255, 128 + 2 * CAST(trunc(s / 128.0) AS BIGINT))) AS pv
           FROM bsum),
         pixpos AS (SELECT doc_id, w, p FROM dims, UNNEST(range(0, w*h)) u(p)),
         pix AS (SELECT x.doc_id, x.p, b.pv
           FROM pixpos x JOIN blocks b
             ON b.doc_id = x.doc_id AND b.by = (x.p // x.w) // 8
             AND b.bx = (x.p % x.w) // 8),
         dig AS (SELECT doc_id,
             md5(string_agg(lpad(upper(to_hex(pv)), 2, '0'), '' ORDER BY p)) AS pixel_md5
           FROM pix GROUP BY 1)
         SELECT d.doc_id,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(w*h AS BIGINT) AS n_pixel_bytes, dig.pixel_md5
         FROM dims d JOIN dig USING (doc_id)""",

    // DC-only transcode: q139's pv chain, then the re-encode→re-decode
    // closed form v2 = clamp(128 + 4·trunc((pv−128)/4)) per block —
    // the only SQL a full lossy transcode round needs once the encoder
    // is DC-only at a flat multiple-of-8 quant.
    "q152_jpeg_transcode_dc" ->
      """WITH src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t
           FROM documents),
         dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             8 * (1 + octet_length(encode(t)) % 5) AS w,
             8 * (1 + octet_length(encode(t)) % 4) AS h
           FROM src),
         bsum AS (SELECT doc_id, w, h, by, bx,
             sum((strpos('0123456789ABCDEF', substr(hx,
                   CAST(2*(((by*8 + i//8)*w + bx*8 + i%8) % l)+1 AS INT), 1)) - 1) * 16
               + strpos('0123456789ABCDEF', substr(hx,
                   CAST(2*(((by*8 + i//8)*w + bx*8 + i%8) % l)+2 AS INT), 1)) - 1)
               - 8192 AS s
           FROM dims, UNNEST(range(0, h//8)) u1(by), UNNEST(range(0, w//8)) u2(bx),
                UNNEST(range(64)) u3(i)
           GROUP BY 1, 2, 3, 4, 5),
         blocks AS (SELECT doc_id, w, h, by, bx,
             greatest(0, least(255,
               128 + 4 * CAST(trunc((greatest(0, least(255,
                 128 + 2 * CAST(trunc(s / 128.0) AS BIGINT))) - 128) / 4.0) AS BIGINT)
             )) AS pv
           FROM bsum),
         pixpos AS (SELECT doc_id, w, p FROM dims, UNNEST(range(0, w*h)) u(p)),
         pix AS (SELECT x.doc_id, x.p, b.pv
           FROM pixpos x JOIN blocks b
             ON b.doc_id = x.doc_id AND b.by = (x.p // x.w) // 8
             AND b.bx = (x.p % x.w) // 8),
         dig AS (SELECT doc_id,
             md5(string_agg(lpad(upper(to_hex(pv)), 2, '0'), '' ORDER BY p)) AS recoded_md5
           FROM pix GROUP BY 1)
         SELECT d.doc_id,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           dig.recoded_md5
         FROM dims d JOIN dig USING (doc_id)""",

    // MJPEG-AVI decode: the q139 closed form with a FRAME dimension —
    // frame f encodes the source rotated by 13·f, so block (by,bx) of
    // frame f sums bytes at ((by·8+r)·w + bx·8 + c + 13·f) mod l; the
    // digest concatenates the per-frame block-constant rasters in
    // (f, p) order. Pins the RIFF walk + BOTH JPEG framings (frames
    // alternate baseline/progressive) end-to-end.
    "q150_avi_decode" ->
      """WITH src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t
           FROM documents),
         dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             8 * (1 + octet_length(encode(t)) % 5) AS w,
             8 * (1 + octet_length(encode(t)) % 4) AS h,
             2 + octet_length(encode(t)) % 5 AS nf
           FROM src),
         bsum AS (SELECT doc_id, w, h, nf, f, by, bx,
             sum((strpos('0123456789ABCDEF', substr(hx,
                   CAST(2*((((by*8 + i//8)*w + bx*8 + i%8) + 13*f) % l)+1 AS INT), 1)) - 1) * 16
               + strpos('0123456789ABCDEF', substr(hx,
                   CAST(2*((((by*8 + i//8)*w + bx*8 + i%8) + 13*f) % l)+2 AS INT), 1)) - 1)
               - 8192 AS s
           FROM dims, UNNEST(range(0, nf)) fr(f),
                UNNEST(range(0, h//8)) u1(by), UNNEST(range(0, w//8)) u2(bx),
                UNNEST(range(64)) u3(i)
           GROUP BY 1, 2, 3, 4, 5, 6, 7),
         blocks AS (SELECT doc_id, w, h, f, by, bx,
             greatest(0, least(255, 128 + 2 * CAST(trunc(s / 128.0) AS BIGINT))) AS pv
           FROM bsum),
         pixpos AS (SELECT doc_id, w, f, p
           FROM dims, UNNEST(range(0, nf)) fr(f), UNNEST(range(0, w*h)) u(p)),
         pix AS (SELECT x.doc_id, x.f, x.p, b.pv
           FROM pixpos x JOIN blocks b
             ON b.doc_id = x.doc_id AND b.f = x.f
             AND b.by = (x.p // x.w) // 8 AND b.bx = (x.p % x.w) // 8),
         dig AS (SELECT doc_id,
             md5(string_agg(lpad(upper(to_hex(pv)), 2, '0'), ''
                 ORDER BY f, p)) AS luma_md5
           FROM pix GROUP BY 1)
         SELECT d.doc_id,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(nf AS BIGINT) AS n_frames, dig.luma_md5
         FROM dims d JOIN dig USING (doc_id)""",

    // MJPEG-AVI frame near-dup: the q129 frame-aHash chain with the
    // cycled-byte luma swapped for the q150 closed-form pv raster —
    // lossiness cancels (both engines hash the DECODED frames), frame
    // keys pack as doc·8+f with same-doc pairs excluded.
    "q151_avi_frame_neardup" ->
      """WITH aug AS (SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 10000010, text FROM documents WHERE doc_id % 67 = 0
           UNION ALL
           SELECT doc_id + 11000011, '~~~' || substr(text, 4)
           FROM documents
           WHERE doc_id % 61 = 0 AND octet_length(encode(text)) = length(text)
             AND length(text) >= 300),
         src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t FROM aug),
         dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             8 * (1 + octet_length(encode(t)) % 5) AS w,
             8 * (1 + octet_length(encode(t)) % 4) AS h,
             2 + octet_length(encode(t)) % 5 AS nf
           FROM src),
         bsum AS (SELECT doc_id, w, h, f, by, bx,
             sum((strpos('0123456789ABCDEF', substr(hx,
                   CAST(2*((((by*8 + i//8)*w + bx*8 + i%8) + 13*f) % l)+1 AS INT), 1)) - 1) * 16
               + strpos('0123456789ABCDEF', substr(hx,
                   CAST(2*((((by*8 + i//8)*w + bx*8 + i%8) + 13*f) % l)+2 AS INT), 1)) - 1)
               - 8192 AS s
           FROM dims, UNNEST(range(0, nf)) fr(f),
                UNNEST(range(0, h//8)) u1(by), UNNEST(range(0, w//8)) u2(bx),
                UNNEST(range(64)) u3(i)
           GROUP BY 1, 2, 3, 4, 5, 6),
         blocks AS (SELECT doc_id, w, h, f, by, bx,
             greatest(0, least(255, 128 + 2 * CAST(trunc(s / 128.0) AS BIGINT))) AS pv
           FROM bsum),
         pixpos AS (SELECT doc_id, w, h, f, p
           FROM dims, UNNEST(range(0, nf)) fr(f), UNNEST(range(0, w*h)) u(p)),
         vals AS (SELECT x.doc_id, x.w, x.h, x.f, x.p, b.pv
           FROM pixpos x JOIN blocks b
             ON b.doc_id = x.doc_id AND b.f = x.f
             AND b.by = (x.p // x.w) // 8 AND b.bx = (x.p % x.w) // 8),
         cells AS (SELECT doc_id, f,
             (((p // w) * 8) // h) * 8 + ((p % w) * 8) // w AS cell,
             sum(pv) AS s, count(*) AS c
           FROM vals GROUP BY 1, 2, 3),
         tot AS (SELECT doc_id, f, sum(s) AS ts, sum(c) AS tc
                 FROM cells GROUP BY 1, 2),
         bits AS (SELECT doc_id, f, cell,
             CASE WHEN s * tc > ts * c THEN 1 ELSE 0 END AS b
           FROM cells JOIN tot USING (doc_id, f)),
         bv4 AS (SELECT doc_id, f,
             sum(CASE WHEN cell // 16 = 0 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b0,
             sum(CASE WHEN cell // 16 = 1 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b1,
             sum(CASE WHEN cell // 16 = 2 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b2,
             sum(CASE WHEN cell // 16 = 3 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b3
           FROM bits GROUP BY 1, 2),
         bands AS (SELECT doc_id, f, b0, b1, b2, b3, bnd,
             CASE bnd WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS key
           FROM bv4, UNNEST(range(4)) t(bnd)),
         hot AS (SELECT bnd, key FROM bands GROUP BY bnd, key HAVING count(*) > 1000),
         kept AS (SELECT bands.* FROM bands ANTI JOIN hot USING (bnd, key)),
         pr AS (SELECT DISTINCT x.doc_id AS id_a, x.f AS frame_a,
             y.doc_id AS id_b, y.f AS frame_b,
             CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
               + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS BIGINT) AS hamming
           FROM kept x JOIN kept y
             ON x.bnd = y.bnd AND x.key = y.key
             AND x.doc_id * 8 + x.f < y.doc_id * 8 + y.f)
         SELECT id_a, CAST(frame_a AS BIGINT) AS frame_a,
                id_b, CAST(frame_b AS BIGINT) AS frame_b, hamming
         FROM pr WHERE hamming <= 3 AND id_a <> id_b""",

    // JPEG near-dup: q120's aHash→band→pigeonhole chain, with the
    // byte-cycled RGB raster swapped for the closed-form DC-only gray
    // raster (per-block constant pv) — lossiness cancels because both
    // engines hash the DECODED image.
    "q140_jpeg_neardup" ->
      """WITH aug AS (SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 6000006, text FROM documents WHERE doc_id % 67 = 0
           UNION ALL
           SELECT doc_id + 7000007, '~~~' || substr(text, 4)
           FROM documents
           WHERE doc_id % 61 = 0 AND octet_length(encode(text)) = length(text)
             AND length(text) >= 300),
         src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t FROM aug),
         dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             8 * (1 + octet_length(encode(t)) % 5) AS w,
             8 * (1 + octet_length(encode(t)) % 4) AS h
           FROM src),
         bsum AS (SELECT doc_id, w, h, by, bx,
             sum((strpos('0123456789ABCDEF', substr(hx,
                   CAST(2*(((by*8 + i//8)*w + bx*8 + i%8) % l)+1 AS INT), 1)) - 1) * 16
               + strpos('0123456789ABCDEF', substr(hx,
                   CAST(2*(((by*8 + i//8)*w + bx*8 + i%8) % l)+2 AS INT), 1)) - 1)
               - 8192 AS s
           FROM dims, UNNEST(range(0, h//8)) u1(by), UNNEST(range(0, w//8)) u2(bx),
                UNNEST(range(64)) u3(i)
           GROUP BY 1, 2, 3, 4, 5),
         blocks AS (SELECT doc_id, w, h, by, bx,
             greatest(0, least(255, 128 + 2 * CAST(trunc(s / 128.0) AS BIGINT))) AS pv
           FROM bsum),
         pix AS (SELECT d.doc_id, d.w, d.h, u.p FROM dims d, UNNEST(range(0, w*h)) u(p)),
         vals AS (SELECT x.doc_id, x.w, x.h, x.p, b.pv
           FROM pix x JOIN blocks b
             ON b.doc_id = x.doc_id AND b.by = (x.p // x.w) // 8
             AND b.bx = (x.p % x.w) // 8),
         cells AS (SELECT doc_id,
             (((p // w) * 8) // h) * 8 + ((p % w) * 8) // w AS cell,
             sum(pv) AS s, count(*) AS c
           FROM vals GROUP BY 1, 2),
         tot AS (SELECT doc_id, sum(s) AS ts, sum(c) AS tc FROM cells GROUP BY 1),
         bits AS (SELECT doc_id, cell,
             CASE WHEN s * tc > ts * c THEN 1 ELSE 0 END AS b
           FROM cells JOIN tot USING (doc_id)),
         bv4 AS (SELECT doc_id,
             sum(CASE WHEN cell // 16 = 0 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b0,
             sum(CASE WHEN cell // 16 = 1 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b1,
             sum(CASE WHEN cell // 16 = 2 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b2,
             sum(CASE WHEN cell // 16 = 3 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b3
           FROM bits GROUP BY 1),
         bands AS (SELECT doc_id, b0, b1, b2, b3, bnd,
             CASE bnd WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS key
           FROM bv4, UNNEST(range(4)) t(bnd)),
         hot AS (SELECT bnd, key FROM bands GROUP BY bnd, key HAVING count(*) > 1000),
         kept AS (SELECT bands.* FROM bands ANTI JOIN hot USING (bnd, key)),
         pr AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
             CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
               + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS BIGINT) AS hamming
           FROM kept x JOIN kept y
             ON x.bnd = y.bnd AND x.key = y.key AND x.doc_id < y.doc_id)
         SELECT id_a, id_b, hamming FROM pr WHERE hamming <= 3""",

    // Cross-video near-dup frames: the q120 aHash chain with a frame
    // dimension — luma byte p of frame f is source byte (f·w·h+p) mod
    // l, cells/threshold/band packing identical, pairs keyed on the
    // packed (doc·8+frame) ordering with same-doc pairs excluded.
    "q129_video_neardup" ->
      """WITH aug AS (SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 4000004, text FROM documents WHERE doc_id % 67 = 0
           UNION ALL
           SELECT doc_id + 5000005, '~~~' || substr(text, 4)
           FROM documents
           WHERE doc_id % 61 = 0 AND octet_length(encode(text)) = length(text)
             AND length(text) >= 300),
         src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t FROM aug),
         dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             8 + octet_length(encode(t)) % 24 AS w,
             6 + octet_length(encode(t)) % 17 AS h,
             2 + octet_length(encode(t)) % 5 AS nf FROM src),
         bytes AS (SELECT doc_id, w, h, f, p, hx, (f*w*h + p) % l AS k
           FROM dims, UNNEST(range(0, nf)) fr(f), UNNEST(range(0, w*h)) u(p)),
         vals AS (SELECT doc_id, w, h, f, p,
             (strpos('0123456789ABCDEF', substr(hx, CAST(2*k+1 AS INT), 1)) - 1) * 16
             + strpos('0123456789ABCDEF', substr(hx, CAST(2*k+2 AS INT), 1)) - 1 AS bv
           FROM bytes),
         cells AS (SELECT doc_id, f,
             (((p // w) * 8) // h) * 8 + ((p % w) * 8) // w AS cell,
             sum(bv) AS s, count(*) AS c
           FROM vals GROUP BY 1, 2, 3),
         tot AS (SELECT doc_id, f, sum(s) AS ts, sum(c) AS tc
                 FROM cells GROUP BY 1, 2),
         bits AS (SELECT doc_id, f, cell,
             CASE WHEN s * tc > ts * c THEN 1 ELSE 0 END AS b
           FROM cells JOIN tot USING (doc_id, f)),
         bv4 AS (SELECT doc_id, f,
             sum(CASE WHEN cell // 16 = 0 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b0,
             sum(CASE WHEN cell // 16 = 1 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b1,
             sum(CASE WHEN cell // 16 = 2 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b2,
             sum(CASE WHEN cell // 16 = 3 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b3
           FROM bits GROUP BY 1, 2),
         bands AS (SELECT doc_id, f, b0, b1, b2, b3, bnd,
             CASE bnd WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS key
           FROM bv4, UNNEST(range(4)) t(bnd)),
         hot AS (SELECT bnd, key FROM bands GROUP BY bnd, key HAVING count(*) > 1000),
         kept AS (SELECT bands.* FROM bands ANTI JOIN hot USING (bnd, key)),
         pr AS (SELECT DISTINCT x.doc_id AS id_a, x.f AS frame_a,
             y.doc_id AS id_b, y.f AS frame_b,
             CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
               + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS BIGINT) AS hamming
           FROM kept x JOIN kept y
             ON x.bnd = y.bnd AND x.key = y.key
             AND x.doc_id * 8 + x.f < y.doc_id * 8 + y.f)
         SELECT id_a, CAST(frame_a AS BIGINT) AS frame_a,
                id_b, CAST(frame_b AS BIGINT) AS frame_b, hamming
         FROM pr WHERE hamming <= 3 AND id_a <> id_b""",

    // Every-2nd-frame digests: frame f of a video is bytes
    // f·w·h .. (f+1)·w·h−1 of the cycled source — sliced out of the
    // repeated hex stream and md5'd per sampled frame.
    "q131_video_frame_sample" ->
      """WITH src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t
           FROM documents),
         dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             8 + octet_length(encode(t)) % 24 AS w,
             6 + octet_length(encode(t)) % 17 AS h,
             2 + octet_length(encode(t)) % 5 AS nf
           FROM src)
         SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
           md5(substr(repeat(hx, CAST((nf*w*h + l - 1) // l AS INT)),
               CAST(2*f*w*h + 1 AS INT), CAST(2*w*h AS INT))) AS frame_md5
         FROM dims, UNNEST(range(0, nf)) fr(f)
         WHERE f % 2 = 0""",

    // Delta replay: q129's frame-aHash chain over standing ∪ delta,
    // restricted to pairs touching a delta VIDEO (doc % 7 = 0 or an
    // injected ≥1e6 twin) — the delta ∘ standing ≡ full-restricted
    // contract at frame granularity.
    "q130_video_neardup_delta" ->
      """WITH aug AS (SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, text FROM documents
           WHERE doc_id % 7 <> 0 AND doc_id % 67 = 0
           UNION ALL
           SELECT doc_id + 2000000, '~~~' || substr(text, 4)
           FROM documents
           WHERE doc_id % 7 <> 0 AND doc_id % 61 = 0
             AND octet_length(encode(text)) = length(text)
             AND length(text) >= 300
           UNION ALL
           SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 49 = 0),
         src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t FROM aug),
         dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             8 + octet_length(encode(t)) % 24 AS w,
             6 + octet_length(encode(t)) % 17 AS h,
             2 + octet_length(encode(t)) % 5 AS nf FROM src),
         bytes AS (SELECT doc_id, w, h, f, p, hx, (f*w*h + p) % l AS k
           FROM dims, UNNEST(range(0, nf)) fr(f), UNNEST(range(0, w*h)) u(p)),
         vals AS (SELECT doc_id, w, h, f, p,
             (strpos('0123456789ABCDEF', substr(hx, CAST(2*k+1 AS INT), 1)) - 1) * 16
             + strpos('0123456789ABCDEF', substr(hx, CAST(2*k+2 AS INT), 1)) - 1 AS bv
           FROM bytes),
         cells AS (SELECT doc_id, f,
             (((p // w) * 8) // h) * 8 + ((p % w) * 8) // w AS cell,
             sum(bv) AS s, count(*) AS c
           FROM vals GROUP BY 1, 2, 3),
         tot AS (SELECT doc_id, f, sum(s) AS ts, sum(c) AS tc
                 FROM cells GROUP BY 1, 2),
         bits AS (SELECT doc_id, f, cell,
             CASE WHEN s * tc > ts * c THEN 1 ELSE 0 END AS b
           FROM cells JOIN tot USING (doc_id, f)),
         bv4 AS (SELECT doc_id, f,
             sum(CASE WHEN cell // 16 = 0 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b0,
             sum(CASE WHEN cell // 16 = 1 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b1,
             sum(CASE WHEN cell // 16 = 2 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b2,
             sum(CASE WHEN cell // 16 = 3 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b3
           FROM bits GROUP BY 1, 2),
         bands AS (SELECT doc_id, f, b0, b1, b2, b3, bnd,
             CASE bnd WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS key
           FROM bv4, UNNEST(range(4)) t(bnd)),
         hot AS (SELECT bnd, key FROM bands GROUP BY bnd, key HAVING count(*) > 1000),
         kept AS (SELECT bands.* FROM bands ANTI JOIN hot USING (bnd, key)),
         pr AS (SELECT DISTINCT x.doc_id AS id_a, x.f AS frame_a,
             y.doc_id AS id_b, y.f AS frame_b,
             CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
               + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS BIGINT) AS hamming
           FROM kept x JOIN kept y
             ON x.bnd = y.bnd AND x.key = y.key
             AND x.doc_id * 8 + x.f < y.doc_id * 8 + y.f)
         SELECT id_a, CAST(frame_a AS BIGINT) AS frame_a,
                id_b, CAST(frame_b AS BIGINT) AS frame_b, hamming
         FROM pr WHERE hamming <= 3 AND id_a <> id_b
           AND (id_a % 7 = 0 OR id_a >= 1000000 OR id_b % 7 = 0 OR id_b >= 1000000)""",

    "q110_wav_decode" ->
      """WITH src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t
           FROM documents),
         dims AS (SELECT doc_id, t,
             octet_length(encode(t)) AS l,
             1 + octet_length(encode(t)) % 2 AS channels,
             8000 + (octet_length(encode(t)) % 8) * 1000 AS sample_rate,
             64 + octet_length(encode(t)) % 512 AS n_samples
           FROM src)
         SELECT doc_id,
           CAST(channels AS BIGINT) AS channels,
           CAST(sample_rate AS BIGINT) AS sample_rate,
           CAST(n_samples AS BIGINT) AS n_samples,
           md5(substr(repeat(hex(encode(t)),
                 CAST((n_samples * channels * 2 + l - 1) // l AS INT)),
               1, 2 * n_samples * channels * 2)) AS pcm_md5
         FROM dims""",

    "q108_media_dedup" ->
      """WITH aug AS (SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, substr(text, 1, length(text) - 1) || '!'
           FROM documents
           WHERE doc_id % 61 = 0 AND octet_length(encode(text)) = length(text)
             AND length(text) >= 300),
         src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t FROM aug),
         dims AS (SELECT doc_id, t, octet_length(encode(t)) AS l,
             8 + octet_length(encode(t)) % 40 AS w,
             6 + octet_length(encode(t)) % 23 AS h FROM src),
         pix AS (SELECT doc_id,
             substr(repeat(hex(encode(t)), CAST((w*h*3 + l - 1) // l AS INT)),
               1, 2 * w * h * 3) AS ph,
             w * h * 3 AS npix
           FROM dims),
         fr0 AS (SELECT DISTINCT doc_id,
             md5(substr(ph, CAST(512 * f + 1 AS INT), 512)) AS fh
           FROM pix, UNNEST(range(0, (npix + 255) // 256)) u(f)),
         hot AS (SELECT fh FROM fr0 GROUP BY fh HAVING count(*) > 100),
         fr AS (SELECT doc_id, fh FROM fr0 WHERE fh NOT IN (SELECT fh FROM hot)),
         cnt AS (SELECT doc_id, count(*) AS c FROM fr GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
                   FROM fr a JOIN fr b ON a.fh = b.fh AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
         SELECT id_a, id_b, inter,
                ca.c + cb.c - inter AS union_size
         FROM inter JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id""",

    // aHash replay in hex space: every pixel byte of the cycled
    // stream is read back out of hex(encode(t)) (byte k of the
    // payload = source byte k % l → hex chars 2(k%l)+1..2), summed
    // into 8×8 grid cells, thresholded by integer cross-
    // multiplication, packed into the same four 16-bit bands, then
    // the same pigeonhole join + exact hamming verify.
    "q120_media_phash" ->
      """WITH aug AS (SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 67 = 0
           UNION ALL
           SELECT doc_id + 2000000, '~~~' || substr(text, 4)
           FROM documents
           WHERE doc_id % 61 = 0 AND octet_length(encode(text)) = length(text)
             AND length(text) >= 300),
         src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t FROM aug),
         dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             8 + octet_length(encode(t)) % 40 AS w,
             6 + octet_length(encode(t)) % 23 AS h FROM src),
         bytes AS (SELECT doc_id, w, h, p, hx, (3*p + ch) % l AS k
           FROM dims, UNNEST(range(0, w*h)) u(p), UNNEST(range(3)) v(ch)),
         vals AS (SELECT doc_id, w, h, p,
             (strpos('0123456789ABCDEF', substr(hx, CAST(2*k+1 AS INT), 1)) - 1) * 16
             + strpos('0123456789ABCDEF', substr(hx, CAST(2*k+2 AS INT), 1)) - 1 AS bv
           FROM bytes),
         cells AS (SELECT doc_id,
             (((p // w) * 8) // h) * 8 + ((p % w) * 8) // w AS cell,
             sum(bv) AS s, count(*) // 3 AS c
           FROM vals GROUP BY 1, 2),
         tot AS (SELECT doc_id, sum(s) AS ts, sum(c) AS tc FROM cells GROUP BY 1),
         bits AS (SELECT doc_id, cell,
             CASE WHEN s * tc > ts * c THEN 1 ELSE 0 END AS b
           FROM cells JOIN tot USING (doc_id)),
         bv4 AS (SELECT doc_id,
             sum(CASE WHEN cell // 16 = 0 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b0,
             sum(CASE WHEN cell // 16 = 1 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b1,
             sum(CASE WHEN cell // 16 = 2 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b2,
             sum(CASE WHEN cell // 16 = 3 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b3
           FROM bits GROUP BY 1),
         bands AS (SELECT doc_id, b0, b1, b2, b3, bnd,
             CASE bnd WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS key
           FROM bv4, UNNEST(range(4)) t(bnd)),
         hot AS (SELECT bnd, key FROM bands GROUP BY bnd, key HAVING count(*) > 1000),
         kept AS (SELECT bands.* FROM bands ANTI JOIN hot USING (bnd, key)),
         pr AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
             CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
               + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS BIGINT) AS hamming
           FROM kept x JOIN kept y
             ON x.bnd = y.bnd AND x.key = y.key AND x.doc_id < y.doc_id)
         SELECT id_a, id_b, hamming FROM pr WHERE hamming <= 3""",

    // Color JPEG decode: the q139 closed form per PLANE — three legs
    // (Y at quant 16 / scale 2, Cb and Cr at quant 24 / scale 3,
    // phase offsets 0/17/41 into the same cycled hex stream), chroma
    // at half resolution, pivoted into one row per doc.
    "q143_jpeg_color_decode" ->
      """WITH src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t
           FROM documents),
         dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             16 * (1 + octet_length(encode(t)) % 3) AS w,
             16 * (1 + octet_length(encode(t)) % 2) AS h
           FROM src),
         pl AS (SELECT doc_id, hx, l, pli,
             CASE WHEN pli = 0 THEN w ELSE w // 2 END AS pw,
             CASE WHEN pli = 0 THEN h ELSE h // 2 END AS ph,
             CASE pli WHEN 0 THEN 0 WHEN 1 THEN 17 ELSE 41 END AS off,
             CASE WHEN pli = 0 THEN 128.0 ELSE 192.0 END AS dv,
             CASE WHEN pli = 0 THEN 2 ELSE 3 END AS sc
           FROM dims, UNNEST(range(3)) u(pli)),
         bsum AS (SELECT doc_id, pli, pw, sc, dv, by, bx,
             sum((strpos('0123456789ABCDEF', substr(hx,
                   CAST(2*((((by*8 + i//8)*pw + bx*8 + i%8) + off) % l)+1 AS INT), 1)) - 1) * 16
               + strpos('0123456789ABCDEF', substr(hx,
                   CAST(2*((((by*8 + i//8)*pw + bx*8 + i%8) + off) % l)+2 AS INT), 1)) - 1)
               - 8192 AS s
           FROM pl, UNNEST(range(0, ph//8)) u1(by), UNNEST(range(0, pw//8)) u2(bx),
                UNNEST(range(64)) u3(i)
           GROUP BY doc_id, pli, pw, sc, dv, by, bx),
         blocks AS (SELECT doc_id, pli, pw, by, bx,
             greatest(0, least(255, 128 + sc * CAST(trunc(s / dv) AS BIGINT))) AS pv
           FROM bsum),
         pixpos AS (SELECT doc_id, pli, pw, p
           FROM pl, UNNEST(range(0, pw*ph)) u(p)),
         pix AS (SELECT x.doc_id, x.pli, x.p, b.pv
           FROM pixpos x JOIN blocks b
             ON b.doc_id = x.doc_id AND b.pli = x.pli
             AND b.by = (x.p // x.pw) // 8 AND b.bx = (x.p % x.pw) // 8),
         dig AS (SELECT doc_id, pli,
             md5(string_agg(lpad(upper(to_hex(pv)), 2, '0'), '' ORDER BY p)) AS m
           FROM pix GROUP BY 1, 2)
         SELECT d.doc_id,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(w // 2 AS BIGINT) AS cb_width, CAST(h // 2 AS BIGINT) AS cb_height,
           max(CASE WHEN pli = 0 THEN m END) AS y_md5,
           max(CASE WHEN pli = 1 THEN m END) AS cb_md5,
           max(CASE WHEN pli = 2 THEN m END) AS cr_md5
         FROM dims d JOIN dig USING (doc_id)
         GROUP BY d.doc_id, w, h""",

    // Color DC transcode: q143's per-plane pv chain, then the
    // re-quant closed form (luma scale 4, chroma scale 6) — the q152
    // trick on all three planes.
    "q155_jpeg_color_transcode_dc" ->
      """WITH src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t
           FROM documents),
         dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             16 * (1 + octet_length(encode(t)) % 3) AS w,
             16 * (1 + octet_length(encode(t)) % 2) AS h
           FROM src),
         pl AS (SELECT doc_id, hx, l, pli,
             CASE WHEN pli = 0 THEN w ELSE w // 2 END AS pw,
             CASE WHEN pli = 0 THEN h ELSE h // 2 END AS ph,
             CASE pli WHEN 0 THEN 0 WHEN 1 THEN 17 ELSE 41 END AS off,
             CASE WHEN pli = 0 THEN 128.0 ELSE 192.0 END AS dv,
             CASE WHEN pli = 0 THEN 2 ELSE 3 END AS sc,
             CASE WHEN pli = 0 THEN 4 ELSE 6 END AS sc2
           FROM dims, UNNEST(range(3)) u(pli)),
         bsum AS (SELECT doc_id, pli, pw, sc, sc2, dv, by, bx,
             sum((strpos('0123456789ABCDEF', substr(hx,
                   CAST(2*((((by*8 + i//8)*pw + bx*8 + i%8) + off) % l)+1 AS INT), 1)) - 1) * 16
               + strpos('0123456789ABCDEF', substr(hx,
                   CAST(2*((((by*8 + i//8)*pw + bx*8 + i%8) + off) % l)+2 AS INT), 1)) - 1)
               - 8192 AS s
           FROM pl, UNNEST(range(0, ph//8)) u1(by), UNNEST(range(0, pw//8)) u2(bx),
                UNNEST(range(64)) u3(i)
           GROUP BY doc_id, pli, pw, sc, sc2, dv, by, bx),
         blocks AS (SELECT doc_id, pli, pw, by, bx,
             greatest(0, least(255,
               128 + sc2 * CAST(trunc((greatest(0, least(255,
                 128 + sc * CAST(trunc(s / dv) AS BIGINT))) - 128)
                 / CAST(sc2 AS DOUBLE)) AS BIGINT))) AS pv
           FROM bsum),
         pixpos AS (SELECT doc_id, pli, pw, p
           FROM pl, UNNEST(range(0, pw*ph)) u(p)),
         pix AS (SELECT x.doc_id, x.pli, x.p, b.pv
           FROM pixpos x JOIN blocks b
             ON b.doc_id = x.doc_id AND b.pli = x.pli
             AND b.by = (x.p // x.pw) // 8 AND b.bx = (x.p % x.pw) // 8),
         dig AS (SELECT doc_id, pli,
             md5(string_agg(lpad(upper(to_hex(pv)), 2, '0'), '' ORDER BY p)) AS m
           FROM pix GROUP BY 1, 2)
         SELECT d.doc_id,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(w // 2 AS BIGINT) AS cb_width, CAST(h // 2 AS BIGINT) AS cb_height,
           max(CASE WHEN pli = 0 THEN m END) AS y_md5,
           max(CASE WHEN pli = 1 THEN m END) AS cb_md5,
           max(CASE WHEN pli = 2 THEN m END) AS cr_md5
         FROM dims d JOIN dig USING (doc_id)
         GROUP BY d.doc_id, w, h""",

    // Real resize: per-channel floor-mean over 2×2 cells of the
    // decoded PPM raster (edge cells keep their true counts), digest
    // in resized row-major interleaved order.
    "q145_media_resize_pixels" ->
      """WITH src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t
           FROM documents),
         dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             8 + octet_length(encode(t)) % 40 AS w,
             6 + octet_length(encode(t)) % 23 AS h
           FROM src),
         vals AS (SELECT doc_id, w, h, p, ch,
             (strpos('0123456789ABCDEF', substr(hx, CAST(2*((3*p+ch) % l)+1 AS INT), 1)) - 1) * 16
             + strpos('0123456789ABCDEF', substr(hx, CAST(2*((3*p+ch) % l)+2 AS INT), 1)) - 1 AS bv
           FROM dims, UNNEST(range(0, w*h)) u(p), UNNEST(range(3)) v(ch)),
         cells AS (SELECT doc_id,
             ((p // w) // 2) * ((w + 1) // 2) + (p % w) // 2 AS cell, ch,
             sum(bv) AS s, count(*) AS c
           FROM vals GROUP BY 1, 2, 3),
         dig AS (SELECT doc_id,
             md5(string_agg(lpad(upper(to_hex(s // c)), 2, '0'),
                 '' ORDER BY cell * 3 + ch)) AS rs_md5
           FROM cells GROUP BY 1)
         SELECT d.doc_id,
           CAST((w + 1) // 2 AS BIGINT) AS rs_width,
           CAST((h + 1) // 2 AS BIGINT) AS rs_height,
           CAST(((w + 1) // 2) * ((h + 1) // 2) * 3 AS BIGINT) AS n_rs_bytes,
           dig.rs_md5
         FROM dims d JOIN dig USING (doc_id)""",

    // Color-JPEG near-dup: the q140 chain with the color path's
    // 16-multiple dimensions; only the luma closed form feeds the
    // aHash (the operator hashes the Y plane).
    "q144_jpeg_color_neardup" ->
      """WITH aug AS (SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 8000008, text FROM documents WHERE doc_id % 67 = 0
           UNION ALL
           SELECT doc_id + 9000009, '~~~' || substr(text, 4)
           FROM documents
           WHERE doc_id % 61 = 0 AND octet_length(encode(text)) = length(text)
             AND length(text) >= 300),
         src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t FROM aug),
         dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             16 * (1 + octet_length(encode(t)) % 3) AS w,
             16 * (1 + octet_length(encode(t)) % 2) AS h
           FROM src),
         bsum AS (SELECT doc_id, w, h, by, bx,
             sum((strpos('0123456789ABCDEF', substr(hx,
                   CAST(2*(((by*8 + i//8)*w + bx*8 + i%8) % l)+1 AS INT), 1)) - 1) * 16
               + strpos('0123456789ABCDEF', substr(hx,
                   CAST(2*(((by*8 + i//8)*w + bx*8 + i%8) % l)+2 AS INT), 1)) - 1)
               - 8192 AS s
           FROM dims, UNNEST(range(0, h//8)) u1(by), UNNEST(range(0, w//8)) u2(bx),
                UNNEST(range(64)) u3(i)
           GROUP BY 1, 2, 3, 4, 5),
         blocks AS (SELECT doc_id, w, h, by, bx,
             greatest(0, least(255, 128 + 2 * CAST(trunc(s / 128.0) AS BIGINT))) AS pv
           FROM bsum),
         pix AS (SELECT d.doc_id, d.w, d.h, u.p FROM dims d, UNNEST(range(0, w*h)) u(p)),
         vals AS (SELECT x.doc_id, x.w, x.h, x.p, b.pv
           FROM pix x JOIN blocks b
             ON b.doc_id = x.doc_id AND b.by = (x.p // x.w) // 8
             AND b.bx = (x.p % x.w) // 8),
         cells AS (SELECT doc_id,
             (((p // w) * 8) // h) * 8 + ((p % w) * 8) // w AS cell,
             sum(pv) AS s, count(*) AS c
           FROM vals GROUP BY 1, 2),
         tot AS (SELECT doc_id, sum(s) AS ts, sum(c) AS tc FROM cells GROUP BY 1),
         bits AS (SELECT doc_id, cell,
             CASE WHEN s * tc > ts * c THEN 1 ELSE 0 END AS b
           FROM cells JOIN tot USING (doc_id)),
         bv4 AS (SELECT doc_id,
             sum(CASE WHEN cell // 16 = 0 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b0,
             sum(CASE WHEN cell // 16 = 1 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b1,
             sum(CASE WHEN cell // 16 = 2 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b2,
             sum(CASE WHEN cell // 16 = 3 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b3
           FROM bits GROUP BY 1),
         bands AS (SELECT doc_id, b0, b1, b2, b3, bnd,
             CASE bnd WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS key
           FROM bv4, UNNEST(range(4)) t(bnd)),
         hot AS (SELECT bnd, key FROM bands GROUP BY bnd, key HAVING count(*) > 1000),
         kept AS (SELECT bands.* FROM bands ANTI JOIN hot USING (bnd, key)),
         pr AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
             CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
               + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS BIGINT) AS hamming
           FROM kept x JOIN kept y
             ON x.bnd = y.bnd AND x.key = y.key AND x.doc_id < y.doc_id)
         SELECT id_a, id_b, hamming FROM pr WHERE hamming <= 3""",

    // Gate replay: q120's hash pipeline over the shifted-twin aug,
    // then per-streamed-doc partner aggregation restricted to
    // batch(partner) ≤ batch(doc) — the append-only hash table makes
    // the whole fold-forward collapse into one symmetric-pairs query
    // (no per-batch CTE chain needed: decisions depend only on ids
    // seen so far, never on earlier DECISIONS).
    "q124_media_gate_replay" ->
      """WITH aug AS (SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000001, text FROM documents WHERE doc_id % 67 = 0
           UNION ALL
           SELECT doc_id + 2000002, '~~~' || substr(text, 4)
           FROM documents
           WHERE doc_id % 61 = 0 AND octet_length(encode(text)) = length(text)
             AND length(text) >= 300),
         src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t FROM aug),
         dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             8 + octet_length(encode(t)) % 40 AS w,
             6 + octet_length(encode(t)) % 23 AS h FROM src),
         bytes AS (SELECT doc_id, w, h, p, hx, (3*p + ch) % l AS k
           FROM dims, UNNEST(range(0, w*h)) u(p), UNNEST(range(3)) v(ch)),
         vals AS (SELECT doc_id, w, h, p,
             (strpos('0123456789ABCDEF', substr(hx, CAST(2*k+1 AS INT), 1)) - 1) * 16
             + strpos('0123456789ABCDEF', substr(hx, CAST(2*k+2 AS INT), 1)) - 1 AS bv
           FROM bytes),
         cells AS (SELECT doc_id,
             (((p // w) * 8) // h) * 8 + ((p % w) * 8) // w AS cell,
             sum(bv) AS s, count(*) // 3 AS c
           FROM vals GROUP BY 1, 2),
         tot AS (SELECT doc_id, sum(s) AS ts, sum(c) AS tc FROM cells GROUP BY 1),
         bits AS (SELECT doc_id, cell,
             CASE WHEN s * tc > ts * c THEN 1 ELSE 0 END AS b
           FROM cells JOIN tot USING (doc_id)),
         bv4 AS (SELECT doc_id,
             sum(CASE WHEN cell // 16 = 0 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b0,
             sum(CASE WHEN cell // 16 = 1 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b1,
             sum(CASE WHEN cell // 16 = 2 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b2,
             sum(CASE WHEN cell // 16 = 3 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b3
           FROM bits GROUP BY 1),
         bands AS (SELECT doc_id, b0, b1, b2, b3, bnd,
             CASE bnd WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS key
           FROM bv4, UNNEST(range(4)) t(bnd)),
         hot AS (SELECT bnd, key FROM bands GROUP BY bnd, key HAVING count(*) > 1000),
         kept AS (SELECT bands.* FROM bands ANTI JOIN hot USING (bnd, key)),
         pr AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
             CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
               + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS BIGINT) AS hamming
           FROM kept x JOIN kept y
             ON x.bnd = y.bnd AND x.key = y.key AND x.doc_id < y.doc_id),
         flagged AS (SELECT id_a, id_b, hamming FROM pr WHERE hamming <= 3),
         sym AS (SELECT id_a AS doc_id, id_b AS partner, hamming FROM flagged
                 UNION ALL
                 SELECT id_b, id_a, hamming FROM flagged),
         ann AS (SELECT doc_id, count(*) AS n, min(hamming) AS mh
                 FROM sym WHERE partner % 4 <= doc_id % 4 GROUP BY 1)
         SELECT d.doc_id,
           CAST(d.doc_id % 4 AS BIGINT) AS batch,
           CAST(coalesce(ann.n, 0) AS BIGINT) AS n_partners,
           CAST(coalesce(ann.mh, -1) AS BIGINT) AS min_hamming
         FROM (SELECT doc_id FROM bv4 WHERE doc_id % 4 <> 0) d
         LEFT JOIN ann USING (doc_id)""",

    // Envelope-hash replay in hex space: every PCM byte of the cycled
    // stream read back out of hex(encode(t)) (sample j = little-endian
    // signed 16-bit from payload bytes 2j, 2j+1 → source bytes
    // (2j) % l, (2j+1) % l), |amplitude| summed into 64 blocks,
    // thresholded by integer cross-multiplication, then the identical
    // band/pigeonhole tail as q120.
    "q122_audio_phash" ->
      """WITH aug AS (SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 67 = 0
           UNION ALL
           SELECT doc_id + 2000000, '~~~' || substr(text, 4)
           FROM documents
           WHERE doc_id % 61 = 0 AND octet_length(encode(text)) = length(text)
             AND length(text) >= 300),
         src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t FROM aug),
         dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             (64 + octet_length(encode(t)) % 512)
               * (1 + octet_length(encode(t)) % 2) AS m FROM src),
         bytes AS (SELECT doc_id, m, j, hx,
             (2*j) % l AS k0, (2*j + 1) % l AS k1
           FROM dims, UNNEST(range(0, m)) u(j)),
         vals AS (SELECT doc_id, m, j,
             (strpos('0123456789ABCDEF', substr(hx, CAST(2*k0+1 AS INT), 1)) - 1) * 16
             + strpos('0123456789ABCDEF', substr(hx, CAST(2*k0+2 AS INT), 1)) - 1
             + 256 * ((strpos('0123456789ABCDEF', substr(hx, CAST(2*k1+1 AS INT), 1)) - 1) * 16
               + strpos('0123456789ABCDEF', substr(hx, CAST(2*k1+2 AS INT), 1)) - 1) AS v
           FROM bytes),
         cells AS (SELECT doc_id, (j*64) // m AS cell,
             sum(abs(CASE WHEN v >= 32768 THEN v - 65536 ELSE v END)) AS s,
             count(*) AS c
           FROM vals GROUP BY 1, 2),
         tot AS (SELECT doc_id, sum(s) AS ts, sum(c) AS tc FROM cells GROUP BY 1),
         bits AS (SELECT doc_id, cell,
             CASE WHEN s * tc > ts * c THEN 1 ELSE 0 END AS b
           FROM cells JOIN tot USING (doc_id)),
         bv4 AS (SELECT doc_id,
             sum(CASE WHEN cell // 16 = 0 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b0,
             sum(CASE WHEN cell // 16 = 1 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b1,
             sum(CASE WHEN cell // 16 = 2 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b2,
             sum(CASE WHEN cell // 16 = 3 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b3
           FROM bits GROUP BY 1),
         bands AS (SELECT doc_id, b0, b1, b2, b3, bnd,
             CASE bnd WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS key
           FROM bv4, UNNEST(range(4)) t(bnd)),
         hot AS (SELECT bnd, key FROM bands GROUP BY bnd, key HAVING count(*) > 1000),
         kept AS (SELECT bands.* FROM bands ANTI JOIN hot USING (bnd, key)),
         pr AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
             CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
               + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS BIGINT) AS hamming
           FROM kept x JOIN kept y
             ON x.bnd = y.bnd AND x.key = y.key AND x.doc_id < y.doc_id)
         SELECT id_a, id_b, hamming FROM pr WHERE hamming <= 3""",

    // Winnowed-envelope replay: the q122 hex-space PCM chain grouped
    // into 32-value frame sums, twins derived by shifting the BASE
    // doc's frames (+3 zero frames — the 96-value silence prefix),
    // width-3 integer rolling hashes, leftmost-argmin winnowing
    // (row_number over (h, i) per sliding window; global argmin when
    // fewer than 3 hashes), df-capped fingerprint-bucket pairing.
    "q170_audio_winnow" ->
      """WITH tw AS (SELECT doc_id + 8000008 AS doc_id, doc_id AS src_id
           FROM documents WHERE octet_length(encode(text)) % 512 >= 256),
         src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t FROM documents),
         dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             (64 + octet_length(encode(t)) % 512)
               * (1 + octet_length(encode(t)) % 2) AS m FROM src),
         bytes AS (SELECT doc_id, j,
             (2*j) % l AS k0, (2*j + 1) % l AS k1, hx
           FROM dims, UNNEST(range(0, (m // 32) * 32)) u(j)),
         vals AS (SELECT doc_id, j,
             (strpos('0123456789ABCDEF', substr(hx, CAST(2*k0+1 AS INT), 1)) - 1) * 16
             + strpos('0123456789ABCDEF', substr(hx, CAST(2*k0+2 AS INT), 1)) - 1
             + 256 * ((strpos('0123456789ABCDEF', substr(hx, CAST(2*k1+1 AS INT), 1)) - 1) * 16
               + strpos('0123456789ABCDEF', substr(hx, CAST(2*k1+2 AS INT), 1)) - 1) AS v
           FROM bytes),
         bfr AS MATERIALIZED (SELECT doc_id, j // 32 AS f,
             sum(abs(CASE WHEN v >= 32768 THEN v - 65536 ELSE v END)) AS fs
           FROM vals GROUP BY 1, 2),
         frames AS MATERIALIZED (
           SELECT doc_id, f, fs FROM bfr
           UNION ALL
           SELECT tw.doc_id, b.f + 3, b.fs FROM bfr b JOIN tw ON b.doc_id = tw.src_id
           UNION ALL
           SELECT tw.doc_id, CAST(z.f AS BIGINT), CAST(0 AS HUGEINT)
           FROM tw, UNNEST(range(0, 3)) z(f)),
         hs AS MATERIALIZED (SELECT a.doc_id, a.f AS i,
             CAST(a.fs AS BIGINT)*1000003 + CAST(b.fs AS BIGINT)*9176
               + CAST(c.fs AS BIGINT)*31 AS h
           FROM frames a
           JOIN frames b ON b.doc_id = a.doc_id AND b.f = a.f + 1
           JOIN frames c ON c.doc_id = a.doc_id AND c.f = a.f + 2),
         hcnt AS (SELECT doc_id, count(*) AS nh FROM hs GROUP BY 1),
         wins AS (SELECT doc_id, u FROM hcnt,
                  UNNEST(range(0, greatest(nh - 2, 0))) t(u) WHERE nh >= 3),
         selw AS (SELECT DISTINCT doc_id, h FROM (
             SELECT w.doc_id, w.u, hs.h,
                    row_number() OVER (PARTITION BY w.doc_id, w.u
                      ORDER BY hs.h, hs.i) AS rn
             FROM wins w JOIN hs ON hs.doc_id = w.doc_id
               AND hs.i BETWEEN w.u AND w.u + 2) WHERE rn = 1),
         selg AS (SELECT DISTINCT doc_id, h FROM (
             SELECT hs.doc_id, hs.h,
                    row_number() OVER (PARTITION BY hs.doc_id
                      ORDER BY hs.h, hs.i) AS rn
             FROM hs JOIN hcnt USING (doc_id) WHERE nh < 3) WHERE rn = 1),
         fps AS (SELECT doc_id, h AS fh FROM selw
                 UNION SELECT doc_id, h FROM selg),
         hot AS (SELECT fh FROM fps GROUP BY fh HAVING count(*) > 1000),
         kept AS (SELECT fps.* FROM fps ANTI JOIN hot USING (fh)),
         pr AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS ns
                FROM kept x JOIN kept y
                  ON x.fh = y.fh AND x.doc_id < y.doc_id
                GROUP BY 1, 2 HAVING count(*) >= 2)
         SELECT id_a, id_b, CAST(ns AS BIGINT) AS n_shared FROM pr""",

    // the delta twin: q170's pair set restricted to pairs with a
    // shifted-batch member.
    "q171_audio_winnow_delta" ->
      """WITH tw AS (SELECT doc_id + 8000008 AS doc_id, doc_id AS src_id
           FROM documents WHERE octet_length(encode(text)) % 512 >= 256),
         src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t FROM documents),
         dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             (64 + octet_length(encode(t)) % 512)
               * (1 + octet_length(encode(t)) % 2) AS m FROM src),
         bytes AS (SELECT doc_id, j,
             (2*j) % l AS k0, (2*j + 1) % l AS k1, hx
           FROM dims, UNNEST(range(0, (m // 32) * 32)) u(j)),
         vals AS (SELECT doc_id, j,
             (strpos('0123456789ABCDEF', substr(hx, CAST(2*k0+1 AS INT), 1)) - 1) * 16
             + strpos('0123456789ABCDEF', substr(hx, CAST(2*k0+2 AS INT), 1)) - 1
             + 256 * ((strpos('0123456789ABCDEF', substr(hx, CAST(2*k1+1 AS INT), 1)) - 1) * 16
               + strpos('0123456789ABCDEF', substr(hx, CAST(2*k1+2 AS INT), 1)) - 1) AS v
           FROM bytes),
         bfr AS MATERIALIZED (SELECT doc_id, j // 32 AS f,
             sum(abs(CASE WHEN v >= 32768 THEN v - 65536 ELSE v END)) AS fs
           FROM vals GROUP BY 1, 2),
         frames AS MATERIALIZED (
           SELECT doc_id, f, fs FROM bfr
           UNION ALL
           SELECT tw.doc_id, b.f + 3, b.fs FROM bfr b JOIN tw ON b.doc_id = tw.src_id
           UNION ALL
           SELECT tw.doc_id, CAST(z.f AS BIGINT), CAST(0 AS HUGEINT)
           FROM tw, UNNEST(range(0, 3)) z(f)),
         hs AS MATERIALIZED (SELECT a.doc_id, a.f AS i,
             CAST(a.fs AS BIGINT)*1000003 + CAST(b.fs AS BIGINT)*9176
               + CAST(c.fs AS BIGINT)*31 AS h
           FROM frames a
           JOIN frames b ON b.doc_id = a.doc_id AND b.f = a.f + 1
           JOIN frames c ON c.doc_id = a.doc_id AND c.f = a.f + 2),
         hcnt AS (SELECT doc_id, count(*) AS nh FROM hs GROUP BY 1),
         wins AS (SELECT doc_id, u FROM hcnt,
                  UNNEST(range(0, greatest(nh - 2, 0))) t(u) WHERE nh >= 3),
         selw AS (SELECT DISTINCT doc_id, h FROM (
             SELECT w.doc_id, w.u, hs.h,
                    row_number() OVER (PARTITION BY w.doc_id, w.u
                      ORDER BY hs.h, hs.i) AS rn
             FROM wins w JOIN hs ON hs.doc_id = w.doc_id
               AND hs.i BETWEEN w.u AND w.u + 2) WHERE rn = 1),
         selg AS (SELECT DISTINCT doc_id, h FROM (
             SELECT hs.doc_id, hs.h,
                    row_number() OVER (PARTITION BY hs.doc_id
                      ORDER BY hs.h, hs.i) AS rn
             FROM hs JOIN hcnt USING (doc_id) WHERE nh < 3) WHERE rn = 1),
         fps AS (SELECT doc_id, h AS fh FROM selw
                 UNION SELECT doc_id, h FROM selg),
         hot AS (SELECT fh FROM fps GROUP BY fh HAVING count(*) > 1000),
         kept AS (SELECT fps.* FROM fps ANTI JOIN hot USING (fh)),
         pr AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS ns
                FROM kept x JOIN kept y
                  ON x.fh = y.fh AND x.doc_id < y.doc_id
                GROUP BY 1, 2 HAVING count(*) >= 2)
         SELECT id_a, id_b, CAST(ns AS BIGINT) AS n_shared FROM pr
         WHERE id_a >= 8000000 OR id_b >= 8000000""",

    // Sample-level content-defined segmentation: landmark samples
    // (|v| % 13 = 5) end segments; the segment-|amplitude|-sum
    // sequence feeds q170's identical hash/winnow/pair chain. The
    // 7-sample zero prefix adds no landmark and no amplitude, so the
    // twin's segment sequence equals the base's — copied outright.
    "q176_audio_winnow_subframe" ->
      """WITH tw AS (SELECT doc_id + 9000009 AS doc_id, doc_id AS src_id
           FROM documents WHERE octet_length(encode(text)) % 512 >= 256),
         src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t FROM documents),
         dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             (64 + octet_length(encode(t)) % 512)
               * (1 + octet_length(encode(t)) % 2) AS m FROM src),
         bytes AS (SELECT doc_id, j,
             (2*j) % l AS k0, (2*j + 1) % l AS k1, hx
           FROM dims, UNNEST(range(0, m)) u(j)),
         vals AS (SELECT doc_id, j,
             (strpos('0123456789ABCDEF', substr(hx, CAST(2*k0+1 AS INT), 1)) - 1) * 16
             + strpos('0123456789ABCDEF', substr(hx, CAST(2*k0+2 AS INT), 1)) - 1
             + 256 * ((strpos('0123456789ABCDEF', substr(hx, CAST(2*k1+1 AS INT), 1)) - 1) * 16
               + strpos('0123456789ABCDEF', substr(hx, CAST(2*k1+2 AS INT), 1)) - 1) AS v
           FROM bytes),
         avs AS (SELECT doc_id, j,
             abs(CASE WHEN v >= 32768 THEN v - 65536 ELSE v END) AS av FROM vals),
         sg AS MATERIALIZED (SELECT doc_id, j, av,
             coalesce(SUM(CASE WHEN av % 13 = 5 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY j
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS f
           FROM avs),
         bsg AS MATERIALIZED (SELECT doc_id, f, sum(av) AS fs FROM sg GROUP BY 1, 2),
         frames AS MATERIALIZED (
           SELECT doc_id, f, fs FROM bsg
           UNION ALL
           SELECT tw.doc_id, b.f, b.fs FROM bsg b JOIN tw ON b.doc_id = tw.src_id),
         hs AS MATERIALIZED (SELECT a.doc_id, a.f AS i,
             CAST(a.fs AS BIGINT)*1000003 + CAST(b.fs AS BIGINT)*9176
               + CAST(c.fs AS BIGINT)*31 AS h
           FROM frames a
           JOIN frames b ON b.doc_id = a.doc_id AND b.f = a.f + 1
           JOIN frames c ON c.doc_id = a.doc_id AND c.f = a.f + 2),
         hcnt AS (SELECT doc_id, count(*) AS nh FROM hs GROUP BY 1),
         wins AS (SELECT doc_id, u FROM hcnt,
                  UNNEST(range(0, greatest(nh - 2, 0))) t(u) WHERE nh >= 3),
         selw AS (SELECT DISTINCT doc_id, h FROM (
             SELECT w.doc_id, w.u, hs.h,
                    row_number() OVER (PARTITION BY w.doc_id, w.u
                      ORDER BY hs.h, hs.i) AS rn
             FROM wins w JOIN hs ON hs.doc_id = w.doc_id
               AND hs.i BETWEEN w.u AND w.u + 2) WHERE rn = 1),
         selg AS (SELECT DISTINCT doc_id, h FROM (
             SELECT hs.doc_id, hs.h,
                    row_number() OVER (PARTITION BY hs.doc_id
                      ORDER BY hs.h, hs.i) AS rn
             FROM hs JOIN hcnt USING (doc_id) WHERE nh < 3) WHERE rn = 1),
         fps AS (SELECT doc_id, h AS fh FROM selw
                 UNION SELECT doc_id, h FROM selg),
         hot AS (SELECT fh FROM fps GROUP BY fh HAVING count(*) > 1000),
         kept AS (SELECT fps.* FROM fps ANTI JOIN hot USING (fh)),
         pr AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS ns
                FROM kept x JOIN kept y
                  ON x.fh = y.fh AND x.doc_id < y.doc_id
                GROUP BY 1, 2 HAVING count(*) >= 2)
         SELECT id_a, id_b, CAST(ns AS BIGINT) AS n_shared FROM pr""",

    // q121's delta discipline over the envelope pipeline.
    "q123_audio_phash_delta" ->
      """WITH aug AS (SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, text FROM documents
           WHERE doc_id % 7 <> 0 AND doc_id % 67 = 0
           UNION ALL
           SELECT doc_id + 2000000, '~~~' || substr(text, 4)
           FROM documents
           WHERE doc_id % 7 <> 0 AND doc_id % 61 = 0
             AND octet_length(encode(text)) = length(text)
             AND length(text) >= 300
           UNION ALL
           SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 49 = 0),
         src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t FROM aug),
         dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             (64 + octet_length(encode(t)) % 512)
               * (1 + octet_length(encode(t)) % 2) AS m FROM src),
         bytes AS (SELECT doc_id, m, j, hx,
             (2*j) % l AS k0, (2*j + 1) % l AS k1
           FROM dims, UNNEST(range(0, m)) u(j)),
         vals AS (SELECT doc_id, m, j,
             (strpos('0123456789ABCDEF', substr(hx, CAST(2*k0+1 AS INT), 1)) - 1) * 16
             + strpos('0123456789ABCDEF', substr(hx, CAST(2*k0+2 AS INT), 1)) - 1
             + 256 * ((strpos('0123456789ABCDEF', substr(hx, CAST(2*k1+1 AS INT), 1)) - 1) * 16
               + strpos('0123456789ABCDEF', substr(hx, CAST(2*k1+2 AS INT), 1)) - 1) AS v
           FROM bytes),
         cells AS (SELECT doc_id, (j*64) // m AS cell,
             sum(abs(CASE WHEN v >= 32768 THEN v - 65536 ELSE v END)) AS s,
             count(*) AS c
           FROM vals GROUP BY 1, 2),
         tot AS (SELECT doc_id, sum(s) AS ts, sum(c) AS tc FROM cells GROUP BY 1),
         bits AS (SELECT doc_id, cell,
             CASE WHEN s * tc > ts * c THEN 1 ELSE 0 END AS b
           FROM cells JOIN tot USING (doc_id)),
         bv4 AS (SELECT doc_id,
             sum(CASE WHEN cell // 16 = 0 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b0,
             sum(CASE WHEN cell // 16 = 1 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b1,
             sum(CASE WHEN cell // 16 = 2 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b2,
             sum(CASE WHEN cell // 16 = 3 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b3
           FROM bits GROUP BY 1),
         bands AS (SELECT doc_id, b0, b1, b2, b3, bnd,
             CASE bnd WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS key
           FROM bv4, UNNEST(range(4)) t(bnd)),
         hot AS (SELECT bnd, key FROM bands GROUP BY bnd, key HAVING count(*) > 1000),
         kept AS (SELECT bands.* FROM bands ANTI JOIN hot USING (bnd, key)),
         pr AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
             CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
               + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS BIGINT) AS hamming
           FROM kept x JOIN kept y
             ON x.bnd = y.bnd AND x.key = y.key AND x.doc_id < y.doc_id)
         SELECT id_a, id_b, hamming FROM pr
         WHERE hamming <= 3
           AND (id_a % 7 = 0 OR id_a >= 1000000 OR id_b % 7 = 0 OR id_b >= 1000000)""",

    // Delta replay: the SAME aHash pipeline over standing ∪ delta,
    // restricted to pairs touching the delta (ids % 7 = 0 or the
    // injected ≥1e6 twins) — the delta ∘ standing ≡ full-restricted
    // contract every incremental operator here is held to.
    "q121_media_phash_delta" ->
      """WITH aug AS (SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, text FROM documents
           WHERE doc_id % 7 <> 0 AND doc_id % 67 = 0
           UNION ALL
           SELECT doc_id + 2000000, '~~~' || substr(text, 4)
           FROM documents
           WHERE doc_id % 7 <> 0 AND doc_id % 61 = 0
             AND octet_length(encode(text)) = length(text)
             AND length(text) >= 300
           UNION ALL
           SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 49 = 0),
         src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t FROM aug),
         dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             8 + octet_length(encode(t)) % 40 AS w,
             6 + octet_length(encode(t)) % 23 AS h FROM src),
         bytes AS (SELECT doc_id, w, h, p, hx, (3*p + ch) % l AS k
           FROM dims, UNNEST(range(0, w*h)) u(p), UNNEST(range(3)) v(ch)),
         vals AS (SELECT doc_id, w, h, p,
             (strpos('0123456789ABCDEF', substr(hx, CAST(2*k+1 AS INT), 1)) - 1) * 16
             + strpos('0123456789ABCDEF', substr(hx, CAST(2*k+2 AS INT), 1)) - 1 AS bv
           FROM bytes),
         cells AS (SELECT doc_id,
             (((p // w) * 8) // h) * 8 + ((p % w) * 8) // w AS cell,
             sum(bv) AS s, count(*) // 3 AS c
           FROM vals GROUP BY 1, 2),
         tot AS (SELECT doc_id, sum(s) AS ts, sum(c) AS tc FROM cells GROUP BY 1),
         bits AS (SELECT doc_id, cell,
             CASE WHEN s * tc > ts * c THEN 1 ELSE 0 END AS b
           FROM cells JOIN tot USING (doc_id)),
         bv4 AS (SELECT doc_id,
             sum(CASE WHEN cell // 16 = 0 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b0,
             sum(CASE WHEN cell // 16 = 1 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b1,
             sum(CASE WHEN cell // 16 = 2 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b2,
             sum(CASE WHEN cell // 16 = 3 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b3
           FROM bits GROUP BY 1),
         bands AS (SELECT doc_id, b0, b1, b2, b3, bnd,
             CASE bnd WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS key
           FROM bv4, UNNEST(range(4)) t(bnd)),
         hot AS (SELECT bnd, key FROM bands GROUP BY bnd, key HAVING count(*) > 1000),
         kept AS (SELECT bands.* FROM bands ANTI JOIN hot USING (bnd, key)),
         pr AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
             CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
               + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS BIGINT) AS hamming
           FROM kept x JOIN kept y
             ON x.bnd = y.bnd AND x.key = y.key AND x.doc_id < y.doc_id)
         SELECT id_a, id_b, hamming FROM pr
         WHERE hamming <= 3
           AND (id_a % 7 = 0 OR id_a >= 1000000 OR id_b % 7 = 0 OR id_b >= 1000000)""",

    // Delta-curation replay: standing stages re-derived to produce the
    // carried state (digest set + train-token total), then the batch's
    // decisions and append packing — shard ids continue from the
    // standing total.
    "q111_curation_delta" ->
      s"""WITH corpuss AS (SELECT doc_id, text FROM documents
             WHERE doc_id % 97 <> 0 AND doc_id % 7 <> 0),
         corpusb AS (SELECT doc_id, text FROM documents
             WHERE doc_id % 97 <> 0 AND doc_id % 7 = 0),
         ${gopherKeepCte("s")},
         ${gopherKeepCte("b")},
         toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
         sh AS (SELECT DISTINCT doc_id, w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)] || ' ' || w[CAST(i+2 AS INT)] AS shingle
                FROM toks, UNNEST(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3),
         shh AS (SELECT doc_id, ${h60("shingle")} AS h FROM sh),
         ev AS (SELECT DISTINCT h FROM shh WHERE doc_id % 97 = 0),
         conts AS (SELECT DISTINCT s.doc_id FROM shh s JOIN corpuss USING (doc_id)
                   WHERE s.h IN (SELECT h FROM ev)),
         contb AS (SELECT DISTINCT s.doc_id FROM shh s JOIN corpusb USING (doc_id)
                   WHERE s.h IN (SELECT h FROM ev)),
         dgs AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS cid FROM corpuss),
         canons AS (SELECT doc_id FROM dgs WHERE doc_id = cid),
         kepts AS (SELECT c.doc_id, c.text FROM corpuss c
                   JOIN canons USING (doc_id) JOIN gks USING (doc_id)
                   WHERE c.doc_id NOT IN (SELECT doc_id FROM conts)),
         kss AS (SELECT doc_id, text,
                  CASE WHEN substr(md5(text), 1, 2) < 'e6' THEN 'train'
                       WHEN substr(md5(text), 1, 2) < 'f3' THEN 'val'
                       ELSE 'test' END AS split
                 FROM kepts),
         stot AS (SELECT CAST(coalesce(sum(len(regexp_extract_all(text, '\\S+'))), 0) AS BIGINT) AS tot
                  FROM kss WHERE split = 'train'),
         sdig AS (SELECT DISTINCT md5(text) AS digest FROM corpuss),
         bdg AS (SELECT doc_id, text, md5(text) AS digest,
                  row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
                 FROM corpusb),
         canonb AS (SELECT doc_id, text FROM bdg
                    WHERE rn = 1 AND digest NOT IN (SELECT digest FROM sdig)),
         keptb AS (SELECT c.doc_id, c.text FROM canonb c
                   JOIN gkb ON gkb.doc_id = c.doc_id
                   WHERE c.doc_id NOT IN (SELECT doc_id FROM contb)),
         ksb AS (SELECT doc_id, text,
                  CASE WHEN substr(md5(text), 1, 2) < 'e6' THEN 'train'
                       WHEN substr(md5(text), 1, 2) < 'f3' THEN 'val'
                       ELSE 'test' END AS split
                 FROM keptb),
         tkb AS (SELECT doc_id,
                  CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
                  md5(text) AS okey
                 FROM ksb WHERE split = 'train'),
         cumb AS (SELECT doc_id,
                   CAST((SELECT tot FROM stot) +
                     coalesce(sum(n_tokens) OVER (ORDER BY okey, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
                  FROM tkb)
         SELECT ksb.doc_id, ksb.split,
                CAST(coalesce(cumb.cb // 16384, -1) AS BIGINT) AS shard_id,
                CAST(coalesce(cumb.cb % 16384, -1) AS BIGINT) AS offset_tokens
         FROM ksb LEFT JOIN cumb USING (doc_id)""",

    // Curation-gate fold-forward replay: batch-independent stage sets
    // (Gopher keep, contamination) once, then the unrolled three-batch
    // decision/packing/state chain; the seed state is the %4=0
    // standing corpus run through the q111 standing derivation.
    "q114_curation_gate_replay" ->
      s"""WITH corpusbase AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0),
         corpusq AS (SELECT doc_id, text FROM corpusbase
           UNION ALL SELECT doc_id + 2000000, text FROM corpusbase WHERE doc_id % 89 = 0
           UNION ALL SELECT doc_id + 3000001, text FROM corpusbase WHERE doc_id % 83 = 0),
         ${gopherKeepCte("q")},
         toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
         sh AS (SELECT DISTINCT doc_id, w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)] || ' ' || w[CAST(i+2 AS INT)] AS shingle
                FROM toks, UNNEST(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3),
         shh AS (SELECT doc_id, ${h60("shingle")} AS h FROM sh),
         ev AS (SELECT DISTINCT h FROM shh WHERE doc_id % 97 = 0),
         contbase AS (SELECT DISTINCT s.doc_id FROM shh s JOIN corpusbase USING (doc_id)
                      WHERE s.h IN (SELECT h FROM ev)),
         contq AS (SELECT doc_id FROM contbase
           UNION SELECT doc_id + 2000000 FROM contbase WHERE doc_id % 89 = 0
           UNION SELECT doc_id + 3000001 FROM contbase WHERE doc_id % 83 = 0),
         s0 AS (SELECT doc_id, text FROM corpusq WHERE doc_id % 4 = 0),
         dig0 AS (SELECT DISTINCT md5(text) AS digest FROM s0),
         dg0 AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS cid FROM s0),
         canon0 AS (SELECT doc_id FROM dg0 WHERE doc_id = cid),
         kept0 AS (SELECT c.doc_id, c.text FROM s0 c
                   JOIN canon0 USING (doc_id) JOIN gkq ON gkq.doc_id = c.doc_id
                   WHERE c.doc_id NOT IN (SELECT doc_id FROM contq)),
         tot0 AS (SELECT CAST(coalesce(sum(len(regexp_extract_all(text, '\\S+'))), 0) AS BIGINT) AS tot
                  FROM kept0 WHERE substr(md5(text), 1, 2) < 'e6'),
         ${curationFoldCtes(3)}
         SELECT doc_id, batch, status, split, shard_id, offset_tokens FROM dec1
         UNION ALL SELECT doc_id, batch, status, split, shard_id, offset_tokens FROM dec2
         UNION ALL SELECT doc_id, batch, status, split, shard_id, offset_tokens FROM dec3""",

    // Composed near-dup curation gate: q114's chain with nd=true — the
    // near-dup relation ndq is reconstructed exactly as q104's oracle
    // (minhash band collisions verified by exact jaccard > 1/2 over
    // the twin-injected corpus), rep0 seeds from the standing slice,
    // and per batch the rep corpus folds forward by the unflagged
    // exact-canonical reps.
    "q115_curation_gate_neardup" ->
      s"""WITH corpusbase AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0),
         corpusq AS (SELECT doc_id, text FROM corpusbase
           UNION ALL SELECT doc_id + 2000000, text FROM corpusbase WHERE doc_id % 89 = 0
           UNION ALL SELECT doc_id + 4000000, text || ' near twin appended marker' FROM corpusbase WHERE doc_id % 79 = 0
           UNION ALL SELECT doc_id + 5000001, text || ' shifted near twin marker' FROM corpusbase WHERE doc_id % 73 = 0),
         ${gopherKeepCte("q")},
         toksq AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM corpusq),
         shq AS (SELECT DISTINCT doc_id, w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)] || ' ' || w[CAST(i+2 AS INT)] AS shingle
                 FROM toksq, UNNEST(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3),
         etoks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents WHERE doc_id % 97 = 0),
         esh AS (SELECT DISTINCT w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)] || ' ' || w[CAST(i+2 AS INT)] AS shingle
                 FROM etoks, UNNEST(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3),
         ev AS (SELECT DISTINCT ${h60("shingle")} AS h FROM esh),
         contq AS (SELECT DISTINCT doc_id FROM
                   (SELECT doc_id, ${h60("shingle")} AS h FROM shq)
                   WHERE h IN (SELECT h FROM ev)),
         shcntq AS (SELECT doc_id, count(*) AS c FROM shq GROUP BY doc_id),
         interq AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
                    FROM shq a JOIN shq b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                    GROUP BY 1, 2),
         jacq AS (SELECT id_a, id_b FROM interq
                  JOIN shcntq ca ON id_a = ca.doc_id JOIN shcntq cb ON id_b = cb.doc_id
                  WHERE inter * 2 > ca.c + cb.c - inter),
         perm(i, a, b) AS (VALUES $minhashPermValues),
         hhq AS (SELECT doc_id, ${h60("shingle")} % 2147483647 AS h FROM shq),
         mhq AS (SELECT doc_id, i, min((a * h + b) % 2147483647) AS h
                 FROM hhq, perm GROUP BY doc_id, i),
         bkq AS (SELECT doc_id, i // 4 AS band, md5(string_agg(h::VARCHAR, ',' ORDER BY i)) AS key
                 FROM mhq GROUP BY doc_id, i // 4),
         ndpq AS (SELECT DISTINCT x.doc_id AS u, y.doc_id AS v
                  FROM bkq x JOIN bkq y ON x.band = y.band AND x.key = y.key
                    AND x.doc_id <> y.doc_id),
         ndq AS (SELECT p.u, p.v FROM ndpq p JOIN jacq j
                 ON j.id_a = least(p.u, p.v) AND j.id_b = greatest(p.u, p.v)),
         s0 AS (SELECT doc_id, text FROM corpusq WHERE doc_id % 4 = 0),
         dig0 AS (SELECT DISTINCT md5(text) AS digest FROM s0),
         rep0 AS (SELECT doc_id FROM s0),
         dg0 AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS cid FROM s0),
         canon0 AS (SELECT doc_id FROM dg0 WHERE doc_id = cid),
         kept0 AS (SELECT c.doc_id, c.text FROM s0 c
                   JOIN canon0 USING (doc_id) JOIN gkq ON gkq.doc_id = c.doc_id
                   WHERE c.doc_id NOT IN (SELECT doc_id FROM contq)),
         tot0 AS (SELECT CAST(coalesce(sum(len(regexp_extract_all(text, '\\S+'))), 0) AS BIGINT) AS tot
                  FROM kept0 WHERE substr(md5(text), 1, 2) < 'e6'),
         ${curationFoldCtes(3, nd = true)}
         SELECT doc_id, batch, status, split, shard_id, offset_tokens FROM dec1
         UNION ALL SELECT doc_id, batch, status, split, shard_id, offset_tokens FROM dec2
         UNION ALL SELECT doc_id, batch, status, split, shard_id, offset_tokens FROM dec3""",

    // Two-stage replay: the q106 winnow chain derives the flagged set,
    // then the q96 exact chain runs over the restricted window stream
    // (w is shared between the stages — positions kept for winnowing,
    // dropped for the exact multiplicity).
    "q112_exact_substr_twostage" -> {
      val S = 20
      s"""WITH pos AS (SELECT doc_id, text,
             unnest(range(1, greatest(len(text) - 38, 1))) AS i
           FROM documents),
         w AS (SELECT doc_id, i,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               [CAST(ord(substr(text, CAST(i + k AS INT), 1)) AS BIGINT) for k in range(0, 40)]),
               (acc, x) -> (acc * 31 + x) % 1000000007) * 4294967296 +
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               [CAST(ord(substr(text, CAST(i + k AS INT), 1)) AS BIGINT) for k in range(0, 40)]),
               (acc, x) -> (acc * 131 + x) % 998244353) AS h
           FROM pos),
         mcnt AS (SELECT doc_id, count(*) AS m FROM w GROUP BY doc_id),
         key AS (SELECT doc_id, i, h,
                 CAST(h AS HUGEINT) * 1099511627776 + i AS k FROM w),
         wm AS (SELECT doc_id, i AS j,
                  min(k) OVER (PARTITION BY doc_id ORDER BY i
                    ROWS BETWEEN CURRENT ROW AND ${S - 1} FOLLOWING) AS mk
                FROM key),
         selpos AS (SELECT DISTINCT wm.doc_id,
                      CAST(wm.mk % 1099511627776 AS BIGINT) AS i
                    FROM wm JOIN mcnt USING (doc_id)
                    WHERE wm.j <= greatest(mcnt.m - $S + 1, 1)),
         sel AS (SELECT s.doc_id, k.h
                 FROM selpos s JOIN key k ON k.doc_id = s.doc_id AND k.i = s.i),
         multw AS (SELECT h, count(*) AS c FROM sel GROUP BY h),
         flag AS (SELECT doc_id FROM sel JOIN multw USING (h)
                  GROUP BY doc_id HAVING sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) > 0),
         w2 AS (SELECT w.doc_id, w.h FROM w JOIN flag USING (doc_id)),
         mult2 AS (SELECT h, count(*) AS c FROM w2 GROUP BY h),
         per2 AS (SELECT doc_id, count(*) AS n_windows,
                    sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS n_repeated
                  FROM w2 JOIN mult2 USING (h) GROUP BY doc_id)
         SELECT f.doc_id,
                CAST(coalesce(p.n_windows, 0) AS BIGINT) AS n_windows,
                CAST(coalesce(p.n_repeated, 0) AS BIGINT) AS n_repeated,
                CAST(coalesce(p.n_repeated, 0) * 1000 //
                     greatest(coalesce(p.n_windows, 0), 1) AS BIGINT) AS repeated_permille
         FROM flag f LEFT JOIN per2 p USING (doc_id)"""
    },

    // Delta fold ≡ full recompute, media edition: the q108
    // reconstruction (sans twins) over ALL docs, restricted to pairs
    // with at least one endpoint in the doc_id%7=0 batch.
    "q113_media_dedup_delta" ->
      """WITH src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t
           FROM documents),
         dims AS (SELECT doc_id, t, octet_length(encode(t)) AS l,
             8 + octet_length(encode(t)) % 40 AS w,
             6 + octet_length(encode(t)) % 23 AS h FROM src),
         pix AS (SELECT doc_id,
             substr(repeat(hex(encode(t)), CAST((w*h*3 + l - 1) // l AS INT)),
               1, 2 * w * h * 3) AS ph,
             w * h * 3 AS npix
           FROM dims),
         fr0 AS (SELECT DISTINCT doc_id,
             md5(substr(ph, CAST(512 * f + 1 AS INT), 512)) AS fh
           FROM pix, UNNEST(range(0, (npix + 255) // 256)) u(f)),
         hot AS (SELECT fh FROM fr0 GROUP BY fh HAVING count(*) > 100),
         fr AS (SELECT doc_id, fh FROM fr0 WHERE fh NOT IN (SELECT fh FROM hot)),
         cnt AS (SELECT doc_id, count(*) AS c FROM fr GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
                   FROM fr a JOIN fr b ON a.fh = b.fh AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
         SELECT id_a, id_b, inter,
                ca.c + cb.c - inter AS union_size
         FROM inter JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
         WHERE id_a % 7 = 0 OR id_b % 7 = 0""",

    "q102_curation_pipeline" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0),
         dg AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS cid FROM corpus),
         canon AS (SELECT doc_id FROM dg WHERE doc_id = cid),
         gw AS (SELECT doc_id, text, regexp_extract_all(text, '\\S+') AS w FROM corpus),
         gm AS (SELECT doc_id,
                  CAST(len(w) AS BIGINT) AS n_words,
                  CAST(coalesce(list_sum(list_transform(w, x -> len(x))), 0) AS BIGINT) AS word_chars,
                  CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha_words,
                  CAST(len(regexp_extract_all(text, '#')) +
                       len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT) AS symbols,
                  CAST(len(list_filter(w, x -> lower(x) IN
                       ('the','be','to','of','and','that','have','with'))) AS BIGINT) AS stop_hits
                FROM gw),
         gk AS (SELECT doc_id FROM gm
                WHERE n_words >= 50 AND n_words <= 100000
                  AND word_chars * 100 // greatest(n_words, 1) BETWEEN 300 AND 1000
                  AND symbols * 1000 // greatest(n_words, 1) < 100
                  AND stop_hits >= 2
                  AND alpha_words * 1000 // greatest(n_words, 1) >= 800),
         toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
         sh AS (SELECT DISTINCT doc_id, w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)] || ' ' || w[CAST(i+2 AS INT)] AS shingle
                FROM toks, UNNEST(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3),
         shh AS (SELECT doc_id, ${h60("shingle")} AS h FROM sh),
         ev AS (SELECT DISTINCT h FROM shh WHERE doc_id % 97 = 0),
         cont AS (SELECT DISTINCT doc_id FROM shh
                  WHERE doc_id % 97 <> 0 AND h IN (SELECT h FROM ev)),
         kept AS (SELECT c.doc_id, c.text FROM corpus c
                  JOIN canon USING (doc_id) JOIN gk USING (doc_id)
                  WHERE c.doc_id NOT IN (SELECT doc_id FROM cont)),
         ks AS (SELECT doc_id, text,
                  CASE WHEN substr(md5(text), 1, 2) < 'e6' THEN 'train'
                       WHEN substr(md5(text), 1, 2) < 'f3' THEN 'val'
                       ELSE 'test' END AS split
                FROM kept),
         tk AS (SELECT doc_id,
                  CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
                  md5(text) AS okey
                FROM ks WHERE split = 'train'),
         cum AS (SELECT doc_id,
                   CAST(coalesce(sum(n_tokens) OVER (ORDER BY okey, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
                 FROM tk)
         SELECT ks.doc_id, ks.split,
                CAST(coalesce(cum.cb // 16384, -1) AS BIGINT) AS shard_id,
                CAST(coalesce(cum.cb % 16384, -1) AS BIGINT) AS offset_tokens
         FROM ks LEFT JOIN cum USING (doc_id)""",

    "q100_gopher_rules" ->
      """WITH f AS (SELECT doc_id, text, regexp_extract_all(text, '\S+') AS w FROM documents),
         m AS (SELECT doc_id,
                 CAST(len(w) AS BIGINT) AS n_words,
                 CAST(coalesce(list_sum(list_transform(w, x -> len(x))), 0) AS BIGINT) AS word_chars,
                 CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha_words,
                 CAST(len(regexp_extract_all(text, '#')) +
                      len(regexp_extract_all(text, '\.\.\.')) AS BIGINT) AS symbols,
                 CAST(len(list_filter(w, x -> lower(x) IN
                      ('the','be','to','of','and','that','have','with'))) AS BIGINT) AS stop_hits
               FROM f),
         r AS (SELECT doc_id, n_words,
                 word_chars * 100 // greatest(n_words, 1) AS mean_word_len_x100,
                 symbols * 1000 // greatest(n_words, 1) AS symbol_permille,
                 stop_hits,
                 alpha_words * 1000 // greatest(n_words, 1) AS alpha_word_permille
               FROM m)
         SELECT doc_id, n_words, mean_word_len_x100, symbol_permille, stop_hits,
                alpha_word_permille,
                n_words >= 50 AND n_words <= 100000 AS rule_word_count,
                mean_word_len_x100 >= 300 AND mean_word_len_x100 <= 1000 AS rule_word_len,
                symbol_permille < 100 AS rule_symbols,
                stop_hits >= 2 AS rule_stopwords,
                alpha_word_permille >= 800 AS rule_alpha,
                (n_words >= 50 AND n_words <= 100000)
                  AND (mean_word_len_x100 >= 300 AND mean_word_len_x100 <= 1000)
                  AND symbol_permille < 100 AND stop_hits >= 2
                  AND alpha_word_permille >= 800 AS keep
         FROM r""",

    "q99_exact_substr_delta" ->
      s"""WITH pos AS (SELECT doc_id, text,
             unnest(range(1, greatest(len(text) - 38, 1))) AS i
           FROM documents),
         w AS (SELECT doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               [CAST(ord(substr(text, CAST(i + k AS INT), 1)) AS BIGINT) for k in range(0, 40)]),
               (acc, x) -> (acc * 31 + x) % 1000000007) * 4294967296 +
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               [CAST(ord(substr(text, CAST(i + k AS INT), 1)) AS BIGINT) for k in range(0, 40)]),
               (acc, x) -> (acc * 131 + x) % 998244353) AS h
           FROM pos),
         mult AS (SELECT h FROM w GROUP BY h HAVING count(*) > 1),
         per AS (SELECT doc_id, count(*) AS n_repeated
                 FROM w WHERE h IN (SELECT h FROM mult) GROUP BY doc_id)
         SELECT d.doc_id,
                CAST(greatest(len(text) - 39, 0) AS BIGINT) AS n_windows,
                CAST(coalesce(p.n_repeated, 0) AS BIGINT) AS n_repeated,
                CAST(coalesce(p.n_repeated, 0) * 1000 //
                     greatest(greatest(len(text) - 39, 0), 1) AS BIGINT) AS repeated_permille
         FROM documents d LEFT JOIN per p USING (doc_id)
         WHERE d.doc_id % 7 = 0""",

    "q98_decontaminate_fuzzy" ->
      s"""WITH base AS (SELECT doc_id, text FROM documents
                  UNION ALL
                  SELECT -doc_id - 1, text || ' heldout eval variant marker'
                  FROM documents WHERE doc_id % 83 = 0),
         toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM base),
         sh AS (SELECT DISTINCT doc_id, w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)] || ' ' || w[CAST(i+2 AS INT)] AS shingle
                FROM toks, UNNEST(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3),
         shcnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
         finter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
                    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                    GROUP BY 1, 2),
         fjac AS (SELECT id_a, id_b, inter, ca.c + cb.c - inter AS union_size
                  FROM finter JOIN shcnt ca ON id_a = ca.doc_id JOIN shcnt cb ON id_b = cb.doc_id
                  WHERE inter * 10 > 3 * (ca.c + cb.c - inter)),
         perm(i, a, b) AS (VALUES ${graft.ops.Dedup.minhashCoeffs(64).zipWithIndex
        .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")}),
         hh AS (SELECT doc_id, ${h60("shingle")} % 2147483647 AS h FROM sh),
         mh AS (SELECT doc_id, i, min((a * h + b) % 2147483647) AS h
                FROM hh, perm GROUP BY doc_id, i),
         bk AS (SELECT doc_id, i // 4 AS band, md5(string_agg(h::VARCHAR, ',' ORDER BY i)) AS key
                FROM mh GROUP BY doc_id, i // 4),
         cand AS (SELECT DISTINCT d.doc_id AS eval_id, s.doc_id AS corpus_id
                  FROM bk d JOIN bk s ON d.band = s.band AND d.key = s.key
                  WHERE d.doc_id < 0 AND s.doc_id >= 0),
         fpairs AS (SELECT c.eval_id, c.corpus_id, j.inter, j.union_size
                    FROM cand c JOIN fjac j
                      ON j.id_a = least(c.eval_id, c.corpus_id)
                     AND j.id_b = greatest(c.eval_id, c.corpus_id)),
         fl AS (SELECT corpus_id AS doc_id, count(*) AS n,
                       max((inter * 1000) // union_size) AS mx
                FROM fpairs GROUP BY 1)
         SELECT d.doc_id,
                CAST(coalesce(f.n, 0) AS BIGINT) AS n_eval_matches,
                CAST(coalesce(f.mx, 0) AS BIGINT) AS max_overlap_permille,
                coalesce(f.n, 0) > 0 AS contaminated
         FROM documents d LEFT JOIN fl f ON d.doc_id = f.doc_id""",

    "q97_repeated_spans" ->
      s"""WITH pos AS (SELECT doc_id, text,
             unnest(range(1, greatest(len(text) - 38, 1))) AS i
           FROM documents),
         w AS (SELECT doc_id, i,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               [CAST(ord(substr(text, CAST(i + k AS INT), 1)) AS BIGINT) for k in range(0, 40)]),
               (acc, x) -> (acc * 31 + x) % 1000000007) * 4294967296 +
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               [CAST(ord(substr(text, CAST(i + k AS INT), 1)) AS BIGINT) for k in range(0, 40)]),
               (acc, x) -> (acc * 131 + x) % 998244353) AS h
           FROM pos),
         mult AS (SELECT h FROM w GROUP BY h HAVING count(*) > 1),
         rp AS (SELECT doc_id, i FROM w WHERE h IN (SELECT h FROM mult)),
         fl AS (SELECT doc_id, i,
                  CASE WHEN lag(i) OVER (PARTITION BY doc_id ORDER BY i) IS NULL
                        OR i > lag(i) OVER (PARTITION BY doc_id ORDER BY i) + 39
                       THEN 1 ELSE 0 END AS f
                FROM rp),
         isl AS (SELECT doc_id, i,
                   sum(f) OVER (PARTITION BY doc_id ORDER BY i ROWS UNBOUNDED PRECEDING) AS g
                 FROM fl),
         sp AS (SELECT doc_id, g, min(i) AS s, max(i) + 39 AS e FROM isl GROUP BY 1, 2),
         per AS (SELECT doc_id, count(*) AS n_spans, sum(e - s + 1) AS removed FROM sp GROUP BY 1)
         SELECT d.doc_id, CAST(len(text) AS BIGINT) AS n_chars,
                CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
                CAST(coalesce(p.removed, 0) AS BIGINT) AS removed_chars,
                CAST(len(text) - coalesce(p.removed, 0) AS BIGINT) AS kept_chars
         FROM documents d LEFT JOIN per p USING (doc_id)""",

    "q50_media_features" ->
      s"""WITH f AS (SELECT doc_id, text, len(text) AS nb, (len(text)+255) // 256 AS nf FROM documents),
         fr AS (SELECT doc_id, md5(string_agg(md5(substr(text, CAST(k*256+1 AS INT), 256)), '' ORDER BY k)) AS fd
                FROM f, UNNEST(range(nf)) AS t(k) GROUP BY doc_id),
         h AS (SELECT doc_id, ${h60("text")} AS h60, nb, nf FROM f)
         SELECT h.doc_id, nb AS n_bytes, nf AS n_frames, fr.fd AS frame_digest,
                64 + h60 % 1024 AS width, 64 + (h60 // 1024) % 1024 AS height
         FROM h JOIN fr USING (doc_id)""",

    "q51_media_frames" ->
      """WITH f AS (SELECT doc_id, text, (len(text)+255) // 256 AS nf FROM documents)
         SELECT doc_id, k AS frame_idx,
                md5(substr(text, CAST(k*256+1 AS INT), 256)) AS frame_md5
         FROM f, UNNEST(range(nf)) AS t(k) WHERE k % 4 = 0""",

    "q52_media_resize" ->
      s"""WITH h AS (SELECT doc_id, ${h60("text")} AS h60 FROM documents),
         d AS (SELECT doc_id, 64 + h60 % 1024 AS width, 64 + (h60 // 1024) % 1024 AS height FROM h)
         SELECT doc_id, width, height,
                CASE WHEN greatest(width, height) <= 256 THEN width
                     ELSE (width * 256) // greatest(width, height) END AS rs_width,
                CASE WHEN greatest(width, height) <= 256 THEN height
                     ELSE (height * 256) // greatest(width, height) END AS rs_height
         FROM d""")

  // PNG decodes to the exact raster the PPM path carries (same
  // dimension formula, same cycled payload), so the q107/q120 twins
  // ARE the PNG oracles — container-orthogonality made executable:
  // DuckDB never sees a DEFLATE stream, only what it must decode to.
  /** WARC decode-features oracle: every column replays from the
    * source text in closed form (decode ∘ encode identity; metadata
    * record per even payload). Shared by q167 (identity envelope) and
    * q174 (gzip/chunked envelopes — codings are payload-transparent).
    */
  private val warcDecodeSql: String =
    """SELECT doc_id,
         CAST(CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 3 ELSE 2 END AS BIGINT) AS n_records,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_body_bytes,
         md5(hex(encode(text))) AS text_md5
       FROM documents"""

  /** Exact-substring splice that fails loudly if the anchor drifted: a
   *  whitespace/text edit to the base SQL would otherwise silently no-op
   *  the replace and leave the derived oracle judging the wrong chain.
   */
  private def spliced(base: String, anchor: String, replacement: String): String = {
    require(base.contains(anchor),
      s"oracle splice anchor not found (base SQL drifted): ${anchor.take(80)}...")
    base.replace(anchor, replacement)
  }

  val oracleSql: Map[String, String] = oracleSqlBase ++ Map(
    // q177's chain over q190's own exports, with the float re-rank
    // tail swapped for the ADC-ordered top-10 (compressed-only
    // serving ranks by the integer residual-ADC score alone).
    "q190_ivfadc_gate_adconly" -> spliced(
      oracleSqlBase("q177_ivfadc_vector_gate")
        .replace(IvfAdcGateExportPath, IvfAdcGateAdcExportPath),
      s"""short AS (SELECT query_id, neighbor_id FROM (
             SELECT query_id, neighbor_id,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY score DESC, neighbor_id) AS srank
             FROM adc) WHERE srank <= 40),
         rer AS (SELECT query_id, neighbor_id, rank FROM (
             SELECT s.query_id, s.neighbor_id,
                    row_number() OVER (PARTITION BY s.query_id
                      ORDER BY ${sqlCosine("qe.v", "ne.v", 64)} DESC, s.neighbor_id) AS rank
             FROM short s
             JOIN e qe ON qe.vec_id = s.query_id
             JOIN e ne ON ne.vec_id = s.neighbor_id) WHERE rank <= 10)""",
      """rer AS (SELECT query_id, neighbor_id, srank AS rank FROM (
             SELECT query_id, neighbor_id,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY score DESC, neighbor_id) AS srank
             FROM adc) WHERE srank <= 10)"""),
    // q100's rule chain verbatim, fed by the q184 extraction closed
    // form (the crawl-shaped curation entry).
    // (FROM swap first — the extraction CTE itself reads documents, so
    // splicing it in first would make the swap hit the CTE too)
    "q185_html_quality" -> spliced(
      spliced(oracleSqlBase("q100_gopher_rules"),
        "FROM documents)", "FROM hx)"),
      "WITH f AS", s"WITH $htmlExtractCte,\n         f AS"),
    "q132_png_decode" -> oracleSqlBase("q107_media_decode"),
    "q133_png_neardup" -> oracleSqlBase("q120_media_phash"),
    // ImageIO-encoded PNG decodes to the SAME raster as the PPM/PNG
    // formula (lossless container, foreign encoder) — the q107 oracle
    // is the q156 oracle.
    "q156_imageio_png_decode" -> oracleSqlBase("q107_media_decode"),
    // ImageIO JPEG at quality 1.0 over block-constant rasters is an
    // EXACT round: pixel p of a w-wide raster is the source byte at
    // ((p//w)//8 · w/8 + (p%w)//8) mod l — no block sums, no trunc
    // chain: the lossy container behaves losslessly on this raster
    // class, which is precisely what makes a foreign float/int-DCT
    // encoder SQL-replayable.
    "q157_imageio_jpeg_decode" ->
      """WITH src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t
           FROM documents),
         dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             8 * (1 + octet_length(encode(t)) % 5) AS w,
             8 * (1 + octet_length(encode(t)) % 4) AS h
           FROM src),
         pix AS (SELECT doc_id, w, h, p,
             substr(hx,
               CAST(2*((((p//w)//8)*(w//8) + (p%w)//8) % l) + 1 AS INT), 2) AS hh
           FROM dims, UNNEST(range(0, w*h)) u(p)),
         dig AS (SELECT doc_id,
             md5(string_agg(hh, '' ORDER BY p)) AS pixel_md5
           FROM pix GROUP BY 1)
         SELECT d.doc_id,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(w*h AS BIGINT) AS n_pixel_bytes, dig.pixel_md5
         FROM dims d JOIN dig USING (doc_id)""",
    // AudioSystem-encoded WAVE carries the same PCM payload formulas
    // as the self-encoded corpus (foreign container, identical
    // content) — the q110 oracle is the q162 oracle.
    "q162_audiosystem_wav_decode" -> oracleSqlBase("q110_wav_decode"),
    // gzip decode ∘ encode is the identity: member count and payload
    // replay from octet_length and the source bytes alone (the
    // compressed framing needs no oracle — only what it decodes to).
    "q158_gzip_decode" ->
      """SELECT doc_id,
           CAST(1 + octet_length(encode(text)) % 3 AS BIGINT) AS n_members,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(hex(encode(text))) AS text_md5
         FROM documents""",
    // compressed corpus through the q100 curation battery: the
    // container is transparent, so q100's oracle IS the q159 oracle.
    "q159_gzip_gopher" -> oracleSqlBase("q100_gopher_rules"),
    "q167_warc_decode" -> warcDecodeSql,
    // both crawl containers are transparent, so q100's oracle IS the
    // q168 oracle (the q159 discipline, one layer deeper).
    "q168_warc_gzip_gopher" -> oracleSqlBase("q100_gopher_rules"),
    // multi-record shards: every capture replays from its source row;
    // the shard-level record count is a window sum over the shard's
    // members (1 warcinfo + 1 response + 1 metadata per even payload)
    // — it proves the walk saw the WHOLE shard on every capture row.
    "q172_warc_shard_docs" ->
      """SELECT doc_id,
           doc_id // 100 AS shard_id,
           CAST(1 + SUM(CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 2 ELSE 1 END)
                    OVER (PARTITION BY doc_id // 100) AS BIGINT) AS n_shard_records,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_body_bytes,
           md5(hex(encode(text))) AS text_md5
         FROM documents""",
    // revisit resolution: a response row resolves to itself, a
    // revisit to its source capture's digest.
    "q178_warc_revisit_dedup" ->
      """WITH caps AS (SELECT doc_id, md5(hex(encode(text))) AS m FROM documents),
         tw AS (SELECT doc_id + 1000001 AS doc_id, doc_id AS src
                FROM documents WHERE doc_id % 67 = 0)
         SELECT doc_id, doc_id AS canonical_id,
                CAST(0 AS BIGINT) AS is_revisit, m AS resolved_md5
         FROM caps
         UNION ALL
         SELECT tw.doc_id, tw.src AS canonical_id,
                CAST(1 AS BIGINT) AS is_revisit, c.m AS resolved_md5
         FROM tw JOIN caps c ON c.doc_id = tw.src""",
    // the crawl wrapper is transparent to the pixel-decided pairs, so
    // the q146 oracle (the q120 chain at q146's odd twin offsets) IS
    // the q173 oracle.
    "q173_warc_media_route" -> oracleSqlBase("q120_media_phash")
      .replace("doc_id + 1000000", "doc_id + 1000001")
      .replace("doc_id + 2000000", "doc_id + 2000001"),
    // gzip/chunked HTTP codings are transparent to the recovered
    // payload, so the q167 identity-envelope oracle IS this oracle.
    "q174_warc_http_encodings" -> warcDecodeSql,
    // quarantine: corruption is by-construction fatal, so status is a
    // pure doc_id predicate and clean units replay from the container
    // dimension formulas (pixel bytes / total samples / luma bytes /
    // decompressed bytes by the doc_id % 8 slot).
    "q161_quarantine_ingest" ->
      """WITH d AS (SELECT doc_id,
             octet_length(encode(CASE WHEN length(text) = 0 THEN ' ' ELSE text END)) AS l1,
             octet_length(encode(text)) AS l0
           FROM documents),
         u AS (SELECT doc_id,
             CASE doc_id % 8
               WHEN 0 THEN 3*(8 + l1%40)*(6 + l1%23)
               WHEN 1 THEN 3*(8 + l1%40)*(6 + l1%23)
               WHEN 2 THEN (8*(1 + l1%5))*(8*(1 + l1%4))
               WHEN 3 THEN (64 + l1%512)*(1 + l1%2)
               WHEN 4 THEN (64 + l1%512)*(1 + l1%2)
               WHEN 5 THEN (2 + l1%5)*(8 + l1%24)*(6 + l1%17)
               WHEN 6 THEN (2 + l1%5)*(8*(1 + l1%5))*(8*(1 + l1%4))
               ELSE l0 END AS units
           FROM d)
         SELECT doc_id,
           CASE WHEN doc_id % 11 = 0 OR doc_id % 13 = 0 OR doc_id % 17 = 0
                THEN 'quarantined' ELSE 'ok' END AS status,
           CAST(CASE WHEN doc_id % 11 = 0 OR doc_id % 13 = 0 OR doc_id % 17 = 0
                THEN -1 ELSE units END AS BIGINT) AS units
         FROM u""",
    // FLAC is lossless over the WAV path's exact PCM formulas, so the
    // WAV/audio-envelope twins ARE the FLAC oracles — the audio analog
    // of PNG riding the PPM oracles above. Round 11 widens the corpus
    // with a 24-bit share (every 7th length class): the PCM payload is
    // still the cycled source bytes, so the oracles only branch on the
    // per-sample byte width st (2 or 3).
    "q141_flac_decode" ->
      """WITH src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t
           FROM documents),
         dims AS (SELECT doc_id, t,
             octet_length(encode(t)) AS l,
             1 + octet_length(encode(t)) % 2 AS channels,
             8000 + (octet_length(encode(t)) % 8) * 1000 AS sample_rate,
             64 + octet_length(encode(t)) % 512 AS n_samples,
             CASE WHEN octet_length(encode(t)) % 7 = 3 THEN 3 ELSE 2 END AS st
           FROM src)
         SELECT doc_id,
           CAST(channels AS BIGINT) AS channels,
           CAST(sample_rate AS BIGINT) AS sample_rate,
           CAST(n_samples AS BIGINT) AS n_samples,
           md5(substr(repeat(hex(encode(t)),
                 CAST((n_samples * channels * st + l - 1) // l AS INT)),
               1, 2 * n_samples * channels * st)) AS pcm_md5
         FROM dims""",
    "q142_flac_neardup" ->
      """WITH aug AS (SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 67 = 0
           UNION ALL
           SELECT doc_id + 2000000, '~~~' || substr(text, 4)
           FROM documents
           WHERE doc_id % 61 = 0 AND octet_length(encode(text)) = length(text)
             AND length(text) >= 300),
         src AS (SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t FROM aug),
         dims AS (SELECT doc_id, hex(encode(t)) AS hx,
             octet_length(encode(t)) AS l,
             (64 + octet_length(encode(t)) % 512)
               * (1 + octet_length(encode(t)) % 2) AS m,
             CASE WHEN octet_length(encode(t)) % 7 = 3 THEN 3 ELSE 2 END AS st
           FROM src),
         bytes AS (SELECT doc_id, m, st, j, hx,
             (st*j) % l AS k0, (st*j + 1) % l AS k1, (st*j + 2) % l AS k2
           FROM dims, UNNEST(range(0, m)) u(j)),
         vals AS (SELECT doc_id, m, st, j,
             (strpos('0123456789ABCDEF', substr(hx, CAST(2*k0+1 AS INT), 1)) - 1) * 16
             + strpos('0123456789ABCDEF', substr(hx, CAST(2*k0+2 AS INT), 1)) - 1
             + 256 * ((strpos('0123456789ABCDEF', substr(hx, CAST(2*k1+1 AS INT), 1)) - 1) * 16
               + strpos('0123456789ABCDEF', substr(hx, CAST(2*k1+2 AS INT), 1)) - 1)
             + CASE WHEN st = 3 THEN
                 65536 * ((strpos('0123456789ABCDEF', substr(hx, CAST(2*k2+1 AS INT), 1)) - 1) * 16
                   + strpos('0123456789ABCDEF', substr(hx, CAST(2*k2+2 AS INT), 1)) - 1)
               ELSE 0 END AS v
           FROM bytes),
         cells AS (SELECT doc_id, (j*64) // m AS cell,
             sum(abs(CASE WHEN st = 2 AND v >= 32768 THEN v - 65536
                          WHEN st = 3 AND v >= 8388608 THEN v - 16777216
                          ELSE v END)) AS s,
             count(*) AS c
           FROM vals GROUP BY 1, 2),
         tot AS (SELECT doc_id, sum(s) AS ts, sum(c) AS tc FROM cells GROUP BY 1),
         bits AS (SELECT doc_id, cell,
             CASE WHEN s * tc > ts * c THEN 1 ELSE 0 END AS b
           FROM cells JOIN tot USING (doc_id)),
         bv4 AS (SELECT doc_id,
             sum(CASE WHEN cell // 16 = 0 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b0,
             sum(CASE WHEN cell // 16 = 1 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b1,
             sum(CASE WHEN cell // 16 = 2 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b2,
             sum(CASE WHEN cell // 16 = 3 THEN b * (1 << CAST(cell % 16 AS INT)) ELSE 0 END) AS b3
           FROM bits GROUP BY 1),
         bands AS (SELECT doc_id, b0, b1, b2, b3, bnd,
             CASE bnd WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS key
           FROM bv4, UNNEST(range(4)) t(bnd)),
         hot AS (SELECT bnd, key FROM bands GROUP BY bnd, key HAVING count(*) > 1000),
         kept AS (SELECT bands.* FROM bands ANTI JOIN hot USING (bnd, key)),
         pr AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
             CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
               + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS BIGINT) AS hamming
           FROM kept x JOIN kept y
             ON x.bnd = y.bnd AND x.key = y.key AND x.doc_id < y.doc_id)
         SELECT id_a, id_b, hamming FROM pr WHERE hamming <= 3""",
    // progressive JPEG: SOF2 re-FRAMES the same DC-only closed-form
    // streams (successive-approximation DC scans + EOB-run AC scans),
    // the decoded raster is invariant — so the q139 oracle transfers
    // unchanged over the mixed baseline/progressive corpus
    "q149_jpeg_progressive_decode" -> oracleSqlBase("q139_jpeg_decode"),
    "q153_bpe_train" -> bpeTrainSql(6),
    "q166_bpe_train_hist" -> bpeTrainHistSql(8),
    "q154_mixed_gate_replay" -> mixedGateSql,
    // mixed-container sniff: pixels are container-independent, so the
    // q120 chain IS the oracle — only the twin offsets differ (odd
    // shifts flip doc_id parity, making every twin pair cross the
    // PPM/PNG container boundary)
    "q146_container_sniff_neardup" -> oracleSqlBase("q120_media_phash")
      .replace("doc_id + 1000000", "doc_id + 1000001")
      .replace("doc_id + 2000000", "doc_id + 2000001"),
    // the relative auto-trigger refreshes at the SAME fold as q165's
    // absolute floor (builder-asserted), so the two-phase chain is
    // q165's over this run's own codebook exports.
    "q180_pq_drift_auto" -> oracleSqlBase("q165_pq_drift_gate")
      .replace(PqDriftCb0Path, PqDrift2Cb0Path)
      .replace(PqDriftCb1Path, PqDrift2Cb1Path),
    // IVFADC + re-rank: q175's chain with the ADC top-10 widened to a
    // 50-deep shortlist and q163's float-cosine re-rank tail spliced
    // in (fq hoisted above the re-rank CTE), over q181's own exports.
    "q181_ivfadc_rerank" -> spliced(
      oracleSqlBase("q175_ivfadc_recall_sampled")
        .replace(IvfAdcCoarsePath, IvfAdcRrCoarsePath)
        .replace(IvfAdcCbPath, IvfAdcRrCbPath),
        """qscored AS (SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY score DESC, neighbor_id) AS rank
                     FROM adc),
         qtop AS (SELECT query_id, neighbor_id FROM qscored WHERE rank <= 10),
         fq AS (SELECT vec_id AS query_id, v AS fqv FROM e
                WHERE vec_id IN (SELECT vec_id FROM smp)),""",
        s"""slist AS (SELECT query_id, neighbor_id FROM (
             SELECT query_id, neighbor_id,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY score DESC, neighbor_id) AS srank
             FROM adc) WHERE srank <= 50),
         fq AS (SELECT vec_id AS query_id, v AS fqv FROM e
                WHERE vec_id IN (SELECT vec_id FROM smp)),
         rr AS (SELECT s.query_id, s.neighbor_id,
                row_number() OVER (PARTITION BY s.query_id
                  ORDER BY ${sqlCosine("fqv", "ne.v", 64)} DESC, s.neighbor_id) AS rank
                FROM slist s
                JOIN fq ON fq.query_id = s.query_id
                JOIN e ne ON ne.vec_id = s.neighbor_id),
         qtop AS (SELECT query_id, neighbor_id FROM rr WHERE rank <= 10),"""))
}
