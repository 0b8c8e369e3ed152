package graft.bulk

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed export / XOR-namespace import (SURVEY §2.1; reference
  * `assemblage_db/src/index.rs:456-655`, semantics pinned by
  * `assemblage_db/tests/import_export.rs:16-93`).
  *
  * The serving path ([[graft.core.GraftDb.exportSince]] /
  * [[graft.core.GraftDb.importBlob]]) walks the subtree node-by-node
  * and rewrites ids one at a time; at 100 TB an import IS a
  * distributed job, so these forms state the same semantics over the
  * (nodes, edges) tables:
  *
  *   - '''export''': the subtree closure is the frontier-BFS
  *     [[GraphOps.descendantsFrom]] (per-round shuffle = frontier ×
  *     matching edges); node rows and edges then filter against the
  *     closure with left-semi joins — no row of the corpus outside the
  *     subtree is ever shuffled.
  *   - '''import''': the XOR remap is a pure per-row projection
  *     (map-side, zero shuffle, whole-stage codegen for Long ids);
  *     appending into a target store is a union. Collision-freedom is
  *     structural: two imports of the same blob under namespaces n1 ≠
  *     n2 produce disjoint id sets because xor is a bijection.
  *
  * Index maintenance after an import (reference index.rs:602-628:
  * gram diff, counts, overlaps, parent index) is the write-batch
  * reindex pipeline — [[GramIndex.gramDiff]] / applyGramDiff, the
  * oracle-gated q69 path — applied to the imported node rows; it
  * composes and is not re-stated here.
  */
object ImportExport {

  /** Exported subgraph: `(nodes, children, parents)`.
    *
    *   - `nodes`: the input node schema, rows restricted to closure
    *     members modified after `since` (plus the synthetic root).
    *   - `children`: `(parent_id, child_id, child_index)` — the child
    *     lists of the exported node rows (complete by closure
    *     construction: a child of a closure member is in the closure).
    *   - `parents`: `(id, parent_id, child_index)` — the parent sets
    *     of the exported node rows, filtered to closure members
    *     (index.rs:489-497: a parent outside the exported subtree is
    *     dropped). Under `since`, children hang only from modified
    *     nodes while parents of a modified node may point at
    *     unmodified closure members — the two relations genuinely
    *     differ, hence both are carried (exactly the reference's
    *     node-rows + parents-slot split).
    */
  final case class Exported(nodes: DataFrame, children: DataFrame, parents: DataFrame)

  /** Distributed `export` / `export_since` (index.rs:456-531).
    *
    * `seed` is a one-column `id` frame (normally a single export
    * root). When the nodes table carries a `last_ts` column, node rows
    * at `last_ts <= since` are omitted (incremental export — the
    * closure is still the full subtree, mirroring exportSince). When
    * the closure does not contain `rootId`, a synthetic root —
    * `rootId` as a PAGE list over the seed — is injected and the
    * seed's parent set is overridden to `{(rootId, 0)}`
    * (index.rs:512-528), so an import always hangs off the target's
    * root.
    *
    * Faithfulness note (mirrors the serving override): the parent-set
    * override REPLACES closure-internal parents of the seed, which
    * only exist when the seed is reachable from itself (a cycle
    * through the export root); on DAGs the override only adds.
    */
  def exportSubgraph(
      nodes: DataFrame,
      edges: DataFrame,
      seed: DataFrame,
      rootId: Column,
      since: Long = Long.MinValue): Exported = {
    val closure = GraphOps.descendantsFrom(edges, seed.select(col("id"))).localCheckpoint()
    val modified =
      if (nodes.columns.contains("last_ts")) nodes.filter(col("last_ts") > since)
      else nodes
    val expNodes = modified.join(closure, Seq("id"), "left_semi")
    val children = edges.join(
      expNodes.select(col("id").as("parent_id")), Seq("parent_id"), "left_semi")
      .select(col("parent_id"), col("child_id"), col("child_index"))
    val parents = edges
      .join(expNodes.select(col("id").as("child_id")), Seq("child_id"), "left_semi")
      .join(closure.select(col("id").as("parent_id")), Seq("parent_id"), "left_semi")
      .select(col("child_id").as("id"), col("parent_id"), col("child_index"))
    val rootInClosure = !closure.filter(col("id") === rootId).isEmpty
    if (rootInClosure) Exported(expNodes, children, parents)
    else {
      val rootEdges = seed.select(
        rootId.cast(edges.schema("parent_id").dataType).as("parent_id"),
        col("id").cast(edges.schema("child_id").dataType).as("child_id"),
        lit(0).cast(edges.schema("child_index").dataType).as("child_index"))
      val spark = nodes.sparkSession
      // One synthetic row in the caller's node schema: rootId as an
      // empty-attribute PAGE list (index.rs:521-524); every column is a
      // literal, so the schema drives the projection.
      val rootNode = spark.range(1).select(nodes.schema.fields.map { f =>
        val v: Column = f.name match {
          case "id"     => rootId
          case "kind"   => lit("LIST")
          case "layout" => lit("PAGE")
          case "aside"  => lit(false)
          case "styles" => array()
          case _        => lit(null)
        }
        v.cast(f.dataType).as(f.name)
      }.toIndexedSeq: _*)
      Exported(
        expNodes.unionByName(rootNode),
        children.unionByName(rootEdges),
        parents
          .join(seed.select(col("id")), Seq("id"), "left_anti")
          .unionByName(rootEdges.select(
            col("child_id").as("id"), col("parent_id"), col("child_index"))))
    }
  }

  /** Distributed `import` (index.rs:551-629): rewrite every id — node
    * ids, child references, parent references — through `xorId`. The
    * remap is a stateless projection; appending into a target graph is
    * `unionByName` on each relation (new versions of the imported
    * ids), after which the q69 reindex pipeline restores the gram /
    * count / overlap indices for the imported rows.
    */
  def importNamespaced(exported: Exported, xorId: Column => Column): Exported =
    Exported(
      exported.nodes.withColumn("id", xorId(col("id"))),
      exported.children.select(
        xorId(col("parent_id")).as("parent_id"),
        xorId(col("child_id")).as("child_id"),
        col("child_index")),
      // The reference import iterates the blob's NODE rows and reads
      // each one's parent set (index.rs:558-612) — a parents entry
      // whose id has no node row (an incremental export's synthetic
      // override for an unmodified seed) is exported but never
      // imported, hence the semi-join.
      exported.parents
        .join(exported.nodes.select(col("id")), Seq("id"), "left_semi")
        .select(
          xorId(col("id")).as("id"),
          xorId(col("parent_id")).as("parent_id"),
          col("child_index")))

  /** xor remap for Long-keyed graphs — pure Catalyst (codegen'd):
    * `id ^ namespace` (index.rs:653-655 on 64-bit ids).
    */
  def xorLong(namespace: Long): Column => Column = c => c.bitwiseXOR(lit(namespace))

  /** xor remap for uuid-string-keyed graphs ([[GraphOps.tablesFrom]]
    * frames): parse, xor the 128-bit value, re-render
    * (index.rs:653-655). A UDF — acceptable off the hot path; Long /
    * binary ids are the scale representation.
    */
  def xorGidString(namespace: graft.model.Gid): Column => Column = {
    val f = udf { (s: String) => graft.model.Gid.parse(s).xor(namespace).toString }
    c => f(c)
  }
}
