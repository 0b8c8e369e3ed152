package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.Engine.queries ++
      graft.queries.Pipelines.queries ++ graft.queries.GraphQueries.queries ++
      graft.queries.StreamingQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++ graft.queries.Engine.oracleSql ++
      graft.queries.Pipelines.oracleSql ++ graft.queries.GraphQueries.oracleSql ++
      graft.queries.StreamingQueries.oracleSql

  /** Headline queries Bench times. Excludes q22: full all-pairs overlap
    * materialization is inherently quadratic on this self-similar corpus
    * (the reference never runs it either — its write path refreshes
    * overlaps per dirty id, which q23 represents). Excludes the q6x
    * graph traversals: point-root BFS walks are request-path operations
    * (sub-ms on the serving GraftDb); their bulk forms run one Spark
    * job PER ROUND, so a bench at this SF would time the job-scheduling
    * floor (~0.3 s × depth), not the operators — they stay correctness-
    * gated via their recursive-CTE oracles.
    */
  def benchQueries: Seq[String] = {
    val graphPoint = Set("q70_markup_roundtrip", "q71_swap_obsolete",
      "q72_dirty_propagation", "q73_tile_sections", "q78_tile_branches",
      "q79_tile_parent_branches", "q80_import_namespaced", "q81_tile_markup",
      "q137_restore", "q138_broadcast_roundtrip")
    // q91/q92 replay events through MemoryStream micro-batches — a
    // correctness harness for the streaming operators; timing it would
    // measure driver-side replay feeding, not the engine (their batch
    // twins q13/q16 carry the bench signal). q104/q105 replay the
    // ingest gates batch-by-batch — their per-fold cost is measured by
    // the dedicated DedupGateBench/EmbeddingGateBench state-growth
    // runs (BASELINE.md), and their kernels are benched via
    // q85/q93/q31; a 3-fold replay at bench SF would time the
    // job-scheduling floor.
    val streamReplay = Set("q91_stream_sessions", "q92_stream_hourly",
      "q104_gate_replay", "q105_embedding_gate_replay",
      "q114_curation_gate_replay", "q115_curation_gate_neardup",
      "q119_winnow_gate_replay", "q124_media_gate_replay",
      "q127_vector_index_gate", "q136_vector_gate_reseed",
      "q154_mixed_gate_replay", "q164_pq_vector_gate",
      "q165_pq_drift_gate", "q177_ivfadc_vector_gate",
      "q180_pq_drift_auto",
      // q190 is q177's replay with rerankFloat=false — the SAME
      // batch-by-batch gate replay (persist→resume restart leg, two PQ
      // trainings) whose wall time is replay feeding + training, not
      // the serving kernel. q177 has been excluded since round 14 for
      // exactly that reason; q190 joins it (round 15 — it was added
      // mid-build without the exclusion). Its serving path stays
      // timed via the q175/q181 IVFADC rows and its correctness stays
      // oracle-gated in Verify.
      "q190_ivfadc_gate_adconly")
    // q125/q126 carry EXACT oracle legs (rank-window percentiles,
    // countDistinct, semi-join FP audits) inside the query purely to
    // gate their sketches — verify-only twins. The benched entries are
    // the production sketch-only forms (q134/q135), so the suite times
    // the constant-state paths a 100 TB run would execute.
    val verifyOnlyTwins = Set("q125_sketch_stats", "q126_decontaminate_bloom")
    // Round 12: a REPRESENTATIVE graph/tile subset IS timed (one
    // traversal per shape class — descendants fixpoint, sibling walk,
    // preview recursion, tile fixpoint, markup render), closing the
    // one operator family without machine-checked round-over-round
    // timing drift. Their absolute numbers sit near the per-round
    // job-scheduling floor at this SF (the exclusion rationale above
    // still holds for the other twelve point-root walks) — the value
    // is the DRIFT signal, not the magnitude.
    val graphTimed = Set("q61_descendants", "q64_siblings", "q68_preview",
      "q73_tile_sections", "q81_tile_markup")
    (queries.keySet - "q22_overlap_pairs")
      .filterNot(q => !graphTimed(q) &&
        (q.startsWith("q6") || graphPoint(q) || streamReplay(q) ||
          verifyOnlyTwins(q)))
      .toSeq.sorted
  }
}
