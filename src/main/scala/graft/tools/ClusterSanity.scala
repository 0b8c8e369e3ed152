package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cluster-shaped sanity run: execute the job-count-bound paths (batch
  * tile fixpoints, frontier BFS) and the shuffle-heavy scale-leg
  * queries under `local-cluster[workers,cores,mem]` — separate worker
  * JVMs, real closure/task serialization, shuffle blocks fetched over
  * the network stack instead of sharing one block manager. Everything
  * else in this repo is benchmarked on `local[32]`, which shortcuts
  * exactly the costs a 1000-executor cluster pays; this main checks
  * that no plan here depends on that shortcut (BASELINE.md records the
  * numbers).
  *
  * Usage:
  *   sbt package   # executors need the graft classes
  *   SPARK_SCALA_VERSION=2.13 \
  *     sbt "runMain graft.tools.ClusterSanity <jar> [sfDir] [scaleDir]"
  * `scaleDir` (optional) points at a ScaleGen output for the big-leg
  * queries; when absent the scale legs are skipped.
  *
  * SPARK_SCALA_VERSION matters: local-cluster's in-JVM Worker launches
  * executors through the launcher's command builder WITHOUT sourcing
  * load-spark-env.sh, and without that env var the builder falls back
  * to source-build directory probing and dies with "Cannot find any
  * build directories." before the executor JVM even starts (empty
  * work/<app>/<n>/ dirs are the telltale).
  */
object ClusterSanity {
  def main(args: Array[String]): Unit = {
    val jar = args.headOption.getOrElse(sys.error(
      "first arg: path to the packaged graft jar (sbt package)"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val scaleDir = if (args.length > 2) Some(args(2)) else None
    // JDK17 module opens for the executor JVMs (the launcher injects
    // them for spark-submit; local-cluster workers launched from a
    // plain JVM need them spelled out).
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
    val spark = SparkSession.builder()
      .master("local-cluster[2,16,16384]")
      .appName("graft-cluster-sanity")
      .config("spark.jars", jar)
      .config("spark.executor.memory", "14g")
      .config("spark.executor.extraJavaOptions", opens)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      try { f; println(f"[cluster-sanity] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s") }
      catch { case e: Throwable =>
        println(s"[cluster-sanity] $name FAILED: ${e.getMessage}") }
      finally spark.sharedState.cacheManager.clearCache()
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup: FS listing + executor registration + first codegen
    graft.Tables.names.foreach(n => graft.Tables.load(spark, sfDir, n).count())

    // 1. The job-count-bound path: batch tiles over every page root of
    // the derived graph (~10 serial fixpoints × depth rounds). On
    // local[32] this times the scheduler (~50 s); here every round also
    // pays real task serialization + remote shuffle reads.
    val (nodes, edges) = graft.queries.GraphQueries.graphTables(spark, sfDir)
    val nodesC = nodes.persist(); val edgesC = edges.persist()
    nodesC.count(); edgesC.count()
    val roots = nodesC.filter(col("kind") === "LIST" && col("layout") === "PAGE").select("id")
    // pin the DISTRIBUTED fixpoints here: this battery exists to prove
    // the above-cap plans survive real serialization — the sub-cap
    // fused regime would route around them on this graph
    spark.conf.set("spark.graft.fusedGraphCap", "0")
    time("tile_skeletons(all page roots, distributed)")(noop(
      graft.bulk.TileOps.tileSkeletons(nodesC, edgesC, roots)))

    // 2. Representative fixpoints (frontier BFS down, bottom-up class)
    for (q <- Seq("q61_descendants", "q60_span_class", "q68_preview")) {
      val fn = graft.SparkEntry.queries(q)
      time(q)(noop(fn(spark, sfDir)))
      time(s"$q (steady)")(noop(fn(spark, sfDir)))
    }
    spark.conf.unset("spark.graft.fusedGraphCap")
    // 2b. The FUSED regime under the cluster: the broadcast compact
    // graph + serving kernel must serialize to the worker JVMs (the
    // GraftDb/View closure is executor-side here, not in-process)
    time("tile_skeletons(all page roots, fused)")(noop(
      graft.bulk.TileOps.tileSkeletons(nodesC, edgesC, roots)))
    time("subsection_markup(fused)")(noop(
      graft.SparkEntry.queries("q81_tile_markup")(spark, sfDir)))
    nodesC.unpersist(); edgesC.unpersist()

    // 3. Shuffle-heavy scale legs: real shuffle transport between
    // worker JVMs at the 62x document scale. Round-9 adds the
    // two-stage winnow→exact flow (q112 — the stage-1/stage-2
    // checkpoint interlock crosses executor boundaries), the media
    // delta (q113 — decode-vs-probe split: decode is map-side flat on
    // the workers, the probe is the broadcast-semi frame join), and
    // the winnowed delta (q116 — the standing winnowed index probe).
    scaleDir.foreach { sd =>
      for (q <- Seq("q20_gram_postings", "q31_dedup_jaccard",
          "q32_dedup_minhash_lsh", "q36_ann_lsh")) {
        val fn = graft.SparkEntry.queries(q)
        time(s"$q @62x")(noop(fn(spark, sd)))
        time(s"$q @62x (steady)")(noop(fn(spark, sd)))
      }
      for (q <- Seq("q112_exact_substr_twostage", "q113_media_dedup_delta",
          "q116_winnowed_delta", "q114_curation_gate_replay",
          "q120_media_phash", "q121_media_phash_delta",
          "q122_audio_phash", "q123_audio_phash_delta",
          "q125_sketch_stats", "q126_decontaminate_bloom",
          "q128_video_decode", "q129_video_neardup",
          // round-10 codec trio: entropy decode is map-side worker
          // work (Media closures + Huffman/Rice state serialize to
          // executors); the near-dup tails shuffle band keys
          "q139_jpeg_decode", "q140_jpeg_neardup",
          "q141_flac_decode", "q142_flac_neardup",
          "q143_jpeg_color_decode", "q144_jpeg_color_neardup",
          "q145_media_resize_pixels", "q146_container_sniff_neardup",
          "q147_jpeg_transcode",
          // round-11: progressive decode, RIFF video, DC transcodes,
          // BPE training (k driver rounds of one shuffle each)
          "q149_jpeg_progressive_decode", "q150_avi_decode",
          "q151_avi_frame_neardup", "q152_jpeg_transcode_dc",
          "q155_jpeg_color_transcode_dc", "q153_bpe_train",
          // round-12: foreign-encoder (ImageIO) streams through this
          // repo's decoders, gzip member walks + the composed Gopher
          // battery, PQ/ADC scoring with its broadcast codebooks, and
          // the eight-container quarantine sniff-dispatch — all
          // map-side codec/closure work that must serialize to
          // executors, plus q160's broadcast-query exact side
          // q160/q163 are EXCLUDED here: their recall JUDGE is the
          // deliberate corpus×queries brute-force exact side (the
          // q22/q34 verifier class — measured once at 404 s @62x,
          // completing without failure); the serving-path cost at
          // scale is the 8-byte ADC codes scan those rows gate, and
          // the sf0.1 leg in 3d covers the full judged form.
          "q156_imageio_png_decode", "q157_imageio_jpeg_decode",
          "q158_gzip_decode", "q159_gzip_gopher",
          "q161_quarantine_ingest",
          "q162_audiosystem_wav_decode",
          // round-13: q169 puts the PQ recall family back in this
          // battery — its exact judge is bounded by the 256-query md5
          // sample, so the leg costs 256 x corpus, not corpus x
          // corpus/100 (the exclusion note above stops applying to
          // the sampled form). q166 is the histogram BPE trainer
          // (merge passes O(distinct words)); q167/q168 the WARC
          // walks; q170/q171 the winnowed audio fingerprints.
          "q166_bpe_train_hist", "q167_warc_decode",
          "q168_warc_gzip_gopher", "q169_pq_recall_sampled",
          "q170_audio_winnow", "q171_audio_winnow_delta",
          // round-14: q172 multi-record shard walks (groupBy-shard
          // assembly shuffles once, decode explodes map-side); q173
          // crawl-wrapper near-dup (WARC re-sniff + band shuffle);
          // q174 gzip/chunked envelope walks; q175 the sampled IVFADC
          // judge (bounded like q169); q176 the sample-level winnow
          // (segment kernel + fingerprint bucket join)
          "q172_warc_shard_docs", "q173_warc_media_route",
          "q174_warc_http_encodings", "q175_ivfadc_recall_sampled",
          "q176_audio_winnow_subframe",
          // q178: revisit-bearing shards + the cross-shard resolution
          // equi-join (revisit rows probe the response-capture table)
          "q178_warc_revisit_dedup",
          // q179: the permuted-lattice sampled PQ judge (bounded,
          // q169's class; the permutation is a 64-int broadcast)
          "q179_pq_permuted_recall_sampled",
          // q181: IVFADC shortlist + float re-rank (bounded judge)
          "q181_ivfadc_rerank")) {
        val fn = graft.SparkEntry.queries(q)
        time(s"$q @62x")(noop(fn(spark, sd)))
      }
    }

    // 3b. Round-7 additions: the union-find CC fast path runs its
    // single task ON AN EXECUTOR (LongMap closure + result iterator
    // cross the serialization boundary — local[32] shortcuts both),
    // and the exact-substring family ships the rolling window-hash
    // kernel + a broadcast repeated-set to the workers.
    for (q <- Seq("q37_dedup_clusters", "q96_exact_substr",
        "q98_decontaminate_fuzzy")) {
      val fn = graft.SparkEntry.queries(q)
      time(q)(noop(fn(spark, sfDir)))
    }

    // 3c. Round-8 additions: the fused delta-CC fold's single
    // union-find task (tagged-union shuffle + LongMap kernel on an
    // executor), the winnowing kernel + its broadcast repeated set,
    // the gate replays (three synchronous folds with cluster
    // maintenance, crossing executor boundaries every fold), the real
    // container decodes (binary payloads shipped to executors), and
    // the quantized-IVF recall gate (int8 closure UDFs + the
    // broadcast-query BNLJ exact side).
    for (q <- Seq("q103_dedup_clusters_delta", "q106_exact_substr_strided",
        "q104_gate_replay", "q107_media_decode", "q110_wav_decode",
        "q108_media_dedup", "q109_ann_ivf_quantized",
        "q160_pq_recall", "q163_pq_rerank",
        "q111_curation_delta", "q112_exact_substr_twostage",
        "q113_media_dedup_delta", "q114_curation_gate_replay")) {
      val fn = graft.SparkEntry.queries(q)
      time(q)(noop(fn(spark, sfDir)))
    }

    // 3d. Round-9 additions: the composed near-dup curation gate
    // (q115 — band-key rep-index probes per fold across executors),
    // the winnowed delta (q116), semantic decontamination (q117 —
    // eval-as-broadcast-delta bucket join), and BPE shard packing
    // (q118 — the merge-scan kernel on executors + the two-level
    // prefix sum). q104/q114 in 3c now ALSO exercise the durable-gate
    // restart leg here: persist stages parquet from executor tasks and
    // the resumed gate re-checkpoints across the worker JVMs.
    for (q <- Seq("q115_curation_gate_neardup", "q116_winnowed_delta",
        "q117_decontaminate_semantic", "q118_bpe_shard_pack",
        "q119_winnow_gate_replay", "q124_media_gate_replay",
        "q127_vector_index_gate", "q164_pq_vector_gate")) {
      val fn = graft.SparkEntry.queries(q)
      time(q)(noop(fn(spark, sfDir)))
    }

    // 4. Streaming-shaped operators under separate worker JVMs: the
    // flatMapGroupsWithState sessionizer (stateful-operator + state
    // store serialization — local[32] shares one JVM and shortcuts
    // it) via the q91 replay, and the dedup gate's foreachBatch fold
    // (kernel UDFs, broadcast builds and loop-carried checkpoints
    // crossing executor boundaries).
    time("q91_stream_sessions (streaming replay)")(noop(
      graft.SparkEntry.queries("q91_stream_sessions")(spark, sfDir)))
    time("dedup_gate(5 batches)") {
      val docs = graft.Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      val gate = graft.streaming.Streams.newDedupGate(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text")
      (1 to 5).foreach(i => gate.ingest(docs.filter(col("doc_id") % 10 === i)))
      val cl = gate.clustersNow
        .agg(count(lit(1)), countDistinct(col("component_id"))).head()
      println(s"[cluster-sanity]   gate rejected=${gate.rejected.count()} corpus=${gate.corpusNow.count()} labeled=${cl.getLong(0)} clusters=${cl.getLong(1)}")
    }
    spark.stop()
  }
}
