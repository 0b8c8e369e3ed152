package graft.tools

import org.apache.spark.sql.functions._

/** Degenerate-bucket skew leg for the TEXT MinHash band join (round 15,
  * verdict task 2): half the corpus replaced by ONE constant
  * boilerplate payload — the templated-page mass every real web crawl
  * carries — with exact twins injected into the cold half. Two
  * disciplines are timed against the same corpus:
  *
  *  1. star clusters ([[graft.ops.Dedup.minhashLshClustersNative]],
  *     UNCAPPED): the mass bucket contributes O(M) anchored edges, so
  *     the clustering path survives the skew with no prune at all —
  *     the mass must land in ONE cluster and cold twins in theirs;
  *  2. capped verified pairs ([[graft.ops.Dedup.minhashLshPairsNative]]
  *     maxBandFreq = cap): the mass bucket (df = M >> cap) prunes
  *     before the self-join, twins in the cold half still pair.
  *
  * Unpruned all-pairs over the mass alone would be M²/2 candidates in
  * one bucket — the straggler task this leg exists to prove dead. The
  * printed max_surviving_df pins the candidate bound; BASELINE.md
  * records the row.
  *
  * Usage: runMain graft.tools.TextBandSkewBench [docsDir] [cap]
  */
object TextBandSkewBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfscale62")
    val cap = if (args.length > 1) args(1).toInt else 1000
    val spark = graft.GraftSession.getOrCreate("graft-text-band-skew")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val massText =
      "subscribe to our newsletter terms of service privacy policy all rights reserved"
    val skewed = docs.select(col("doc_id"),
      when(col("doc_id") % 2 === 0, lit(massText)).otherwise(col("text")).as("text"))
    val twins = skewed.filter(col("doc_id") % 2 === 1 && col("doc_id") % 67 === 0)
      .select((col("doc_id") + 100000000L).as("doc_id"), col("text"))
    val corpus = skewed.unionByName(twins).localCheckpoint()
    val keys = graft.ops.Dedup.minhashBandKeys(
      corpus, "doc_id", "text", k = 3, numPerm = 64, bands = 16)
    val dfs = keys.groupBy("band", "key").count().localCheckpoint()
    val massDf = dfs.agg(max("count")).head().getLong(0)
    val hotKeys = dfs.filter(col("count") > cap).count()
    val maxSurviving = dfs.filter(col("count") <= cap)
      .agg(max("count")).head().getLong(0)
    val nDocs = corpus.count()

    // discipline 1: star clustering, NO cap — linear in the mass
    val t0 = System.nanoTime()
    val clusters = graft.ops.Dedup.minhashLshClustersNative(
      corpus, "doc_id", "text", k = 3, numPerm = 64, bands = 16).localCheckpoint()
    val starWall = (System.nanoTime() - t0) / 1e9
    val massClusters = clusters
      .join(corpus.filter(col("doc_id") % 2 === 0), Seq("doc_id"), "left_semi")
      .select("component_id").distinct().count()
    val twinClustered = clusters.as("t")
      .filter(col("doc_id") >= 100000000L)
      .join(clusters.as("o"), col("t.component_id") === col("o.component_id") &&
        col("o.doc_id") === col("t.doc_id") - 100000000L, "left_semi")
      .count()
    val nTwins = corpus.filter(col("doc_id") >= 100000000L).count()

    // discipline 2: capped verified pairs — mass pruned, cold twins pair
    val t1 = System.nanoTime()
    val pairs = graft.ops.Dedup.minhashLshPairsNative(
      corpus, "doc_id", "text", k = 3, numPerm = 64, bands = 16,
      num = 1, den = 2, maxBandFreq = cap).localCheckpoint()
    val cappedWall = (System.nanoTime() - t1) / 1e9
    val nPairs = pairs.count()
    val twinPairs = pairs.filter(col("id_b") >= 100000000L).count()

    println(s"""{"summary":"text-band-skew","docs":$nDocs,"cap":$cap,"mass_df":$massDf,"hot_keys_pruned":$hotKeys,"max_surviving_df":$maxSurviving,"star_wall_sec":${graft.Bench.fmt(starWall, 2)},"mass_clusters":$massClusters,"twins_clustered":$twinClustered,"n_twins":$nTwins,"capped_wall_sec":${graft.Bench.fmt(cappedWall, 2)},"pairs":$nPairs,"twin_pairs":$twinPairs}""")
    require(massClusters == 1L, s"mass should form one cluster, got $massClusters")
    require(twinClustered == nTwins, "every cold twin must cluster with its original")
    require(maxSurviving <= cap, "candidate bound violated")
    spark.stop()
  }
}
