package graft.tools

import org.apache.spark.sql.functions._

/** Degenerate-band skew leg for the pigeonhole band engine (round 10,
  * verdict task 8): a deliberately skewed corpus — half the docs
  * replaced by ONE near-constant payload (the letterbox/solid-frame
  * mass every real media corpus carries), exact twins injected into
  * the cold half — driven through the q120 perceptual near-dup at
  * scale. The stop-band df prune is the only guard between this
  * corpus and a |mass|² candidate blow-up; the leg prints the numbers
  * that pin the bound: mass size, hot keys pruned, the max SURVIVING
  * band df (must be <= cap), wall, and the found-pair count (twin
  * recall through cold bands). BASELINE.md records the row.
  *
  * Usage: runMain graft.tools.BandSkewBench [docsDir] [cap]
  */
object BandSkewBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfscale62")
    val cap = if (args.length > 1) args(1).toLong else 1000L
    val spark = graft.GraftSession.getOrCreate("graft-band-skew")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // letterbox mass: every even doc becomes the same near-constant
    // frame; odd docs keep organic content; %67 odd docs get an exact
    // twin so recall through cold bands is observable
    val massText = "#" * 140
    val skewed = docs.select(col("doc_id"),
      when(col("doc_id") % 2 === 0, lit(massText)).otherwise(col("text")).as("text"))
    val twins = skewed.filter(col("doc_id") % 2 === 1 && col("doc_id") % 67 === 0)
      .select((col("doc_id") + 100000000L).as("doc_id"), col("text"))
    val corpus = skewed.unionByName(twins)
    val media = graft.ops.Media.asPpm(corpus, "doc_id", "text")
    val hashes = graft.ops.Media.ppmAHash(media).toDF().localCheckpoint()
    val dfs = graft.ops.Media.phashBandRows(hashes)
      .groupBy("band", "key").count().localCheckpoint()
    val massDf = dfs.agg(max("count")).head().getLong(0)
    val hotKeys = dfs.filter(col("count") > cap).count()
    val maxSurviving = dfs.filter(col("count") <= cap)
      .agg(max("count")).head().getLong(0)
    val nDocs = corpus.count()
    val t0 = System.nanoTime()
    val pairs = graft.ops.Media.phashNearDupPairs(media, maxBandFreq = cap)
    pairs.write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    val nPairs = pairs.count()
    val twinPairs = pairs.filter(col("id_b") >= 100000000L).count()
    println(s"""{"summary":"band-skew","docs":$nDocs,"cap":$cap,"mass_df":$massDf,"hot_keys_pruned":$hotKeys,"max_surviving_df":$maxSurviving,"wall_sec":${graft.Bench.fmt(wall, 2)},"pairs":$nPairs,"twin_pairs":$twinPairs}""")
    require(maxSurviving <= cap, "candidate bound violated")
    spark.stop()
  }
}
