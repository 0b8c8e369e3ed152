package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape audit over the ENTIRE driver-contract query surface: the
  * 100 TB-safety claims (no accidental cross products, no corpus-sized
  * nested-loop joins, pushdown reaching the parquet scans) asserted as
  * a regression guard, not just argued in prose. Plans are built (and
  * for the operators with eager construction steps, partially executed)
  * against the tiny sf0.001 tables — the physical plan SHAPE is what is
  * under test, and it is scale-invariant for these queries.
  */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-plan-audit")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("no query plan contains a cartesian product or a nested-loop join outside the allowlist") {
    // BroadcastNestedLoopJoin always carries a BroadcastExchange (the
    // build side IS a broadcast), so "has BroadcastExchange" cannot
    // distinguish safe from unsafe — instead, every BNLJ occurrence
    // must be explicitly allowlisted with its smallness argument.
    // q35 brute-force top-k: pure non-equi condition (qid =!= nid)
    // against the BROADCAST QUERY side — the corpus is the streamed
    // side and never broadcasts; safe at any corpus size. q94 wraps
    // the same top-k (label-purity aggregation on top), q101 runs it
    // twice (quantized + float sides), and q109's recall gate contains
    // it as the EXACT side of the comparison (the composed quantized
    // IVF under test is all equi-joins) — all inheriting the identical
    // join with the identical smallness argument.
    // q160 adds the flat PQ-ADC scan: codes crossJoin broadcast(query
    // LUTs) — the QUERY side broadcasts (tiny by construction), the
    // 8-byte-code corpus streams; plus the recall judge's exact side
    // (the q35 join again). Same smallness argument as q35/q101.
    // q163 is q160's scan feeding an exact re-rank whose joins are
    // broadcast-shortlist equi-joins — the BNLJ occurrences are the
    // same ADC scan + recall judge, nothing new.
    // q169 is q160's scan+judge with the bounded sample as the query
    // side — the identical smallness argument.
    // q175's IVFADC serving side is all equi-joins (codes join the
    // broadcast probe rows on cell); its only BNLJ is the q169-class
    // recall judge's exact side over the same bounded 256-query
    // sample — the identical smallness argument.
    // q179 is q169's scan+judge over the permuted lattice — the
    // identical smallness argument.
    // q111's sole BNLJ is the standing-train-token shift: a crossJoin
    // against a broadcast GLOBAL AGGREGATE — exactly one row by
    // construction (round-15 fusion: the scalar stays a frame instead
    // of a driver-collected literal, saving a blocking job).
    val bnljAllowed = Set("q35_ann_topk", "q94_knn_label_purity",
      "q101_quantized_recall", "q109_ann_ivf_quantized", "q160_pq_recall",
      "q163_pq_rerank", "q169_pq_recall_sampled", "q175_ivfadc_recall_sampled",
      "q179_pq_permuted_recall_sampled", "q181_ivfadc_rerank",
      "q111_curation_delta")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      val bad = Seq("CartesianProduct").filter(plan.contains) ++
        (if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
           Seq("unallowlisted BroadcastNestedLoopJoin") else Nil)
      if (bad.nonEmpty) Some(s"$name: ${bad.mkString(", ")}") else None
    }
    assert(offenders.isEmpty, s"scale-unsafe join shapes:\n${offenders.mkString("\n")}")
  }

  test("selective relational filters push down to the parquet scan") {
    // Representative: q05's region filter must reach the region scan as
    // a pushed parquet filter, not a post-scan Filter over a full read.
    // NB "PushedFilters: [" alone is vacuous — it is a substring of the
    // empty-pushdown "PushedFilters: []"; require actual content.
    val plan = SparkEntry.queries("q05_semi_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined,
      plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }

  test("scans project only the referenced columns (column pruning)") {
    // q42 touches doc_id + text only; the scan schema must not include
    // other document columns.
    val plan = SparkEntry.queries("q42_token_counts")(spark, dir)
      .queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"), readSchema)
    assert(!readSchema.contains("lang"), s"unpruned column in: $readSchema")
  }

  test("small dimension joins broadcast instead of shuffling the fact side") {
    val plan = SparkEntry.queries("q03_revenue_by_brand")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("quota sample's rank filter is rewritten to a map-side WindowGroupLimit") {
    // The 100 TB claim for q83: a skewed stratum ships O(k × maps)
    // rows into the window exchange, not its full size — that is
    // Spark's WindowGroupLimit rewrite, asserted here so a refactor
    // that breaks rewrite eligibility (e.g. rank used beyond the
    // filter) fails loudly.
    val plan = SparkEntry.queries("q83_quota_sample")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
    // q87 ranks against the literal budget BEFORE the per-stratum
    // quota column precisely so the same rewrite keeps firing
    val p87 = SparkEntry.queries("q87_mixture_sample")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p87.contains("WindowGroupLimit"), p87.take(2000))
  }

  test("embedding delta dedup broadcasts the delta side (standing stays probe-only)") {
    // q93's 100 TB shape: the ingest slice is the broadcast build of
    // both the bucket join and the re-ingest anti-join; the standing
    // embeddings contribute scans, never a shuffle for the join.
    val plan = SparkEntry.queries("q93_dedup_embedding_delta")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(plan.contains("LeftAnti"), plan.take(2000))
  }

  test("exact-substr repeats semi-join the window stream against a BROADCAST repeated set") {
    // q96's 100 TB shape: the window stream is never sorted or
    // reshuffled for the membership check — the repeated-hash set
    // (materialized, counted, under the cap) is the broadcast build of
    // a left-semi join.
    val plan = SparkEntry.queries("q96_exact_substr")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      plan.linesIterator.filter(_.contains("Join")).mkString("\n"))
  }

  test("decontamination joins the corpus against a BROADCAST eval vocabulary") {
    // The corpus side must never repartition: the eval shingle
    // vocabulary is the build side of a broadcast semi-join.
    val plan = SparkEntry.queries("q82_decontaminate")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      plan.linesIterator.filter(_.contains("Join")).mkString("\n"))
  }
}
