package graft.ops

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-cluster resolution: near-dup pairs (from any dedup
  * operator) form an undirected graph; connected components give the
  * transitive duplicate clusters; every doc maps to its cluster's min
  * id as the canonical representative.
  *
  * The production path is a pure-DataFrame alternating large-star /
  * small-star contraction (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14): O(log n) rounds, each round a
  * handful of hash aggregations and equi-joins that stay inside
  * whole-stage codegen and AQE. Compared to the GraphX Pregel CC it
  * replaces, this (a) never leaves Tungsten rows for Java vertex/edge
  * objects, (b) handles high-degree skew by construction — large-star
  * is the published remedy for the hub-vertex problem, and AQE
  * skew-join covers the joins — and (c) contracts long chains in
  * logarithmic rounds where plain min-label propagation is O(diameter).
  * The GraphX form is retained as `dedupClustersGraphX`, a parity
  * verifier exercised by ComponentsSpec on random graphs.
  *
  * Only vertices that appear in a pair enter the contraction: a
  * singleton is its own component BY DEFINITION, so shipping the whole
  * corpus through every round is pure waste — the iterated edge set is
  * O(dup pairs), corpus-size independent; singletons join back in one
  * final left join.
  */
object Components {

  /** @param allIds  one row per doc (`id`: long) — singletons included
    * @param pairs   near-dup pairs (`id_a`, `id_b`)
    * @return (doc_id, component_id) for every input doc; component_id
    *         is the minimum doc id of the component (GraphX-compatible
    *         labeling, and what the DuckDB recursive-CTE oracle emits)
    */
  def dedupClusters(allIds: DataFrame, pairs: DataFrame): DataFrame = {
    val edges = pairs
      .select(col("id_a").cast("long").as("u"), col("id_b").cast("long").as("v"))
      .where(col("u") =!= col("v"))
    val labels = starContract(edges)
    allIds.select(col("id").cast("long").as("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component_id"), col("doc_id")).as("component_id"))
  }

  /** Edge-count threshold below which the contraction collapses to a
    * single-task union-find (executor-side mapPartitions, NOT a driver
    * collect): 4M edges ≈ 64 MB of longs — far under a task's memory,
    * and one narrow job where the star loop pays several shuffle
    * rounds. Every dedup pipeline here feeds CC a CAPPED pair stream
    * (df-capped Jaccard, banded LSH), so this is the common regime;
    * the log-round star contraction is the unbounded-scale path and
    * stays spec-covered via the cap=0 hook.
    */
  final val SingleTaskEdgeCap: Long = 1L << 22

  /** Alternating star contraction to a fixpoint. Returns one row per
    * vertex that appears in `edges`: (doc_id, component_id = min id of
    * its component).
    *
    * Convergence detection: the edge set is a star forest (large-star
    * and small-star both map it to itself) iff one full round leaves
    * the (count, xxhash64-sum) pair unchanged — an O(|E|) scan over the
    * checkpointed frame, no driver-side collect of the edges. Each
    * round halves component depth, so rounds = O(log n); every round
    * localCheckpoints to cut lineage (the same loop-carried-frame
    * discipline as the dedup gate).
    */
  private[graft] def starContract(
      edges: DataFrame,
      singleTaskCap: Long = SingleTaskEdgeCap): DataFrame = {
    // The contraction loop's frames are O(dup pairs) — tiny next to the
    // corpus — but each round is several shuffles, and under a fixed
    // shuffle-partition count those degenerate into fleets of empty
    // tasks (the bench runs AQE-off globally). Scope AQE ON for the
    // loop's materializations only: every loop frame is
    // localCheckpointed (eager, on THIS thread), so all its planning
    // and execution happens inside the `withExistingConf` window, and
    // AQE coalesces each round to as many partitions as the edge
    // volume actually needs — the same mechanism that sizes these
    // rounds correctly at 100 TB. The override lives in a thread-local
    // CLONE of the session conf (`SQLConf.withExistingConf`), so
    // concurrent queries on the same SparkSession never observe it and
    // nested/concurrent starContract calls cannot restore a stale
    // value — the shared conf is never written.
    val scopedConf = edges.sparkSession.sessionState.conf.clone()
    scopedConf.setConfString("spark.sql.adaptive.enabled", "true")
    var e = edges
    val singleTask = org.apache.spark.sql.internal.SQLConf.withExistingConf(scopedConf) {
      e = edges.select(
          least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
        .distinct()
        .transform(Ckpt.fresh)
      var sig = signature(e)
      val small = sig._1 <= singleTaskCap
      if (!small) {
        var converged = false
        while (!converged) {
          val next = smallStar(largeStar(e)).transform(Ckpt.fresh)
          val nextSig = signature(next)
          converged = nextSig == sig
          sig = nextSig
          e = next
        }
      }
      small
    }
    if (singleTask) return unionFindSingleTask(e)
    // Fixpoint edges are (member, root); roots label themselves.
    e.select(col("u").as("doc_id"), col("v").as("component_id"))
      .unionByName(e.select(col("v").as("doc_id"), col("v").as("component_id")))
      .distinct()
  }

  /** Small-graph fast path: min-root union-find over the whole
    * (checkpointed, ≤ cap) edge set in ONE executor task — a narrow
    * coalesce(1) over already-materialized partitions, so the whole
    * labeling is a single shuffle-free job instead of per-round
    * shuffle fleets. Unboxed LongMap state; path-halving find.
    */
  private def unionFindSingleTask(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    e.select(col("u"), col("v")).as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val parent = new scala.collection.mutable.LongMap[Long]()
        def find(x0: Long): Long = {
          var x = x0
          var p = parent.getOrElse(x, x)
          while (p != x) {
            val g = parent.getOrElse(p, p)
            parent(x) = g // path halving
            x = g
            p = parent.getOrElse(x, x)
          }
          x
        }
        it.foreach { case (u, v) =>
          parent.getOrElseUpdate(u, u) // every touched node gets an
          parent.getOrElseUpdate(v, v) // entry, so roots are emitted too
          val ru = find(u); val rv = find(v)
          if (ru != rv) {
            // union by min: the smaller id becomes the root, so labels
            // are the component minimum with no extra relabeling pass
            if (ru < rv) parent(rv) = ru else parent(ru) = rv
          }
        }
        parent.keysIterator.toArray.iterator.map(k => (k, find(k)))
      }
      .toDF("doc_id", "component_id")
  }

  /** (row count, bit_xor of per-edge xxhash64) — equality across a
    * round is the fixpoint test; xor is order-independent and cannot
    * overflow (the edge frame is distinct, so xor self-cancellation
    * cannot occur). A 64-bit collision that ALSO preserves the count is
    * vanishingly unlikely and only ever costs an extra round or an
    * early stop on a non-star set; ComponentsSpec pins parity with
    * GraphX on randomized graphs.
    */
  private[graft] def signature(e: DataFrame): (Long, Long) = {
    val row = e.agg(count(lit(1)),
      coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L))).head()
    (row.getLong(0), row.getLong(1))
  }

  /** large-star: for each vertex u, link every strictly-larger neighbor
    * to m = min(N(u) ∪ {u}). Expressed as groupBy(u).min + an equi-join
    * back on u — the join reuses the aggregation's exchange, so the
    * round costs one shuffle of the symmetrized edges plus the distinct.
    * No collect_list: hub vertices never materialize their neighbor
    * set on one task.
    */
  private[graft] def largeStar(e: DataFrame): DataFrame = {
    val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u")
      .agg(min("v").as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    sym.join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** small-star: orient edges (hi → lo); for each u link every non-min
    * lower neighbor, and u itself, to m = min(N(u)). All emitted edges
    * keep the (hi → lo) orientation (v > m always, since m is the min).
    */
  private[graft] def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(
      greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    val mins = dir.groupBy("u").agg(min("v").as("m"))
    dir.join(mins, "u")
      .where(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .unionByName(mins.select(col("u"), col("m").as("v")))
      .distinct()
  }

  /** Result of one incremental CC fold ([[deltaRelabel]]):
    *
    * @param rootMap      (old_root, new_root) — ONLY components whose
    *                     canonical label changed this fold. Bounded by
    *                     the delta's endpoint count, so always
    *                     broadcastable alongside the delta.
    *                     localCheckpoint-materialized.
    * @param newDocLabels (doc_id, component_id) for exactly the delta
    *                     ids — their final labels after the fold.
    * @param knownIds     (id) — the delta-bounded subset of endpoints
    *                     already present in the standing labeling
    *                     (re-ingest detection without another corpus
    *                     probe).
    * @param scratch      per-fold localCheckpoints `newDocLabels`
    *                     still depends on; a long-running caller (the
    *                     ingest gate) releases them once it has
    *                     materialized the outputs it keeps.
    */
  final case class DeltaLabels(
      rootMap: DataFrame,
      newDocLabels: DataFrame,
      knownIds: DataFrame,
      deltaSmall: Boolean,
      private[graft] val scratch: Seq[DataFrame])

  /** Incremental connected components — the CC member of the delta
    * family (q85 text, q93 embeddings, q99 substrings): fold one
    * batch's near-dup pairs into STANDING cluster labels, touching
    * only the components the batch's edges reach. The reference's
    * whole index philosophy is this delta-maintenance shape — fold a
    * diff forward instead of rebuilding (`assemblage_db/src/index.rs:768-813`
    * gram-postings diff fold; `index.rs:242-284` update_parent_index).
    *
    * Standing labels are a compressed star forest (doc → component
    * min): new edges can only MERGE standing components or attach new
    * docs, so CC over the union ≡ CC over the CONTRACTED graph whose
    * vertices are the standing roots + new ids the delta touches —
    * O(|delta edges|) work regardless of corpus size. Because each
    * standing root IS its component's min id, the contracted
    * component's min vertex is the merged component's global min doc
    * id, so labels stay canonical with no relabeling pass.
    *
    * Plan shape per fold (the 100 TB contract):
    *  - ONE probe of the standing label table, semi-restricted by the
    *    broadcast delta endpoint set (in production a bucket-pruned
    *    lookup on the doc_id-bucketed label table, like the gate's
    *    band-key index probe) — the standing side never shuffles;
    *  - star contraction / union-find over the delta-bounded
    *    contracted edge set only;
    *  - outputs are delta-bounded: the changed-root map and the new
    *    docs' labels. Untouched components are never read past the
    *    label probe.
    *
    * @param standingLabels (doc_id, component_id) full standing
    *                       labeling, component_id = component min id
    *                       (i.e. [[dedupClusters]] output)
    * @param deltaIds       (id) — the batch's doc ids
    * @param deltaPairs     (id_a, id_b) — near-dup pairs incident to
    *                       the batch (delta×standing ∪ delta×delta)
    */
  def deltaRelabel(
      standingLabels: DataFrame,
      deltaIds: DataFrame,
      deltaPairs: DataFrame,
      broadcastDeltaCap: Long = 4000000L,
      singleTaskCap: Long = SingleTaskEdgeCap): DeltaLabels = {
    // Session override for the broadcast/fused gating — the ops knob
    // that lets a deploy (or a bench leg) force the DISTRIBUTED
    // relabel regime without touching gate signatures: a backfill
    // operator sets it once per session. When set it wins over
    // parameter caps (it also lowers the single-task cap, so cap 0
    // exercises the full shuffle path end-to-end).
    val capOverride = standingLabels.sparkSession.conf
      .getOption("spark.graft.relabelBroadcastCap").map(_.toLong)
    // The override wins over the caller's explicit caps, which is easy
    // to forget when a stale session still carries a bench setting —
    // surface it so regime flips are attributable from the logs.
    capOverride.foreach { c =>
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"deltaRelabel: spark.graft.relabelBroadcastCap=$c overrides " +
          s"caller caps (broadcastDeltaCap=$broadcastDeltaCap, " +
          s"singleTaskCap=$singleTaskCap)")
    }
    val bCap = capOverride.getOrElse(broadcastDeltaCap)
    val sCap = capOverride.fold(singleTaskCap)(c => math.min(c, singleTaskCap))
    val edges = deltaPairs
      .select(col("id_a").cast("long").as("u"), col("id_b").cast("long").as("v"))
      .where(col("u") =!= col("v"))
    val ids = deltaIds.select(col("id").cast("long").as("id"))
    // One count over the (delta-bounded) pair stream bounds the
    // working set (vertices <= 2*edges + batch ids) and decides both
    // broadcast gating and fused single-task eligibility. ONE job for
    // both counts (round 16, guide §1.2 — two sequential count jobs
    // paid two scheduling floors per fold): bound = Σ weights with
    // edge rows weighted 2 and id rows 1.
    val bound = edges.select(lit(2L).as("w"))
      .unionByName(ids.select(lit(1L).as("w")))
      .agg(coalesce(sum("w"), lit(0L)))
      .head().getLong(0)
    if (bound <= math.min(bCap, sCap))
      fusedDeltaRelabel(standingLabels, ids, edges)
    else
      distributedDeltaRelabel(
        standingLabels, ids, edges, bound <= bCap, sCap)
  }

  /** The micro-batch regime of [[deltaRelabel]]: the whole fold runs
    * as ONE Spark job. The standing-label probe (broadcast endpoint
    * semi-restriction — the only corpus-sized input, scanned in
    * parallel) and the delta's edges and ids flow, tagged, through a
    * single repartition(1) exchange into one reducer task that
    * contracts edges onto standing roots and min-root union-finds them
    * — the same kernel as [[unionFindSingleTask]], plus the root
    * mapping. Versus materializing each intermediate separately this
    * saves ~8 driver job round-trips per fold, which DOMINATE a
    * micro-batch fold's wall time (the per-job floor is ~0.5 s at 32
    * shuffle partitions; measured on the round-8 gate bench). Output
    * rows are tagged: 0 = changed-root map, 1 = delta labels,
    * 2 = standing-known endpoint ids.
    */
  private def fusedDeltaRelabel(
      standingLabels: DataFrame,
      ids: DataFrame,
      edges: DataFrame): DeltaLabels = {
    val spark = standingLabels.sparkSession
    import spark.implicits._
    val endpoints = edges.select(col("u").as("id"))
      .unionByName(edges.select(col("v").as("id")))
      .unionByName(ids)
      .distinct()
    val present = standingLabels
      .join(broadcast(endpoints.select(col("id").as("doc_id"))), Seq("doc_id"))
      .select(col("doc_id").as("id"), col("component_id").as("root"))
    val tagged = present
      .select(lit(0).as("t"), col("id").as("a"), col("root").as("b"))
      .unionByName(edges.select(lit(1).as("t"), col("u").as("a"), col("v").as("b")))
      .unionByName(ids.select(lit(2).as("t"), col("id").as("a"), col("id").as("b")))
    val out = tagged.as[(Int, Long, Long)]
      .repartition(1)
      .mapPartitions { it =>
        val rootOf = new scala.collection.mutable.LongMap[Long]()
        val es = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        val batch = scala.collection.mutable.ArrayBuffer.empty[Long]
        it.foreach {
          case (0, id, r) => rootOf(id) = r
          case (1, u, v)  => es += ((u, v))
          case (_, id, _) => batch += id
        }
        val parent = new scala.collection.mutable.LongMap[Long]()
        def find(x0: Long): Long = {
          var x = x0
          var p = parent.getOrElse(x, x)
          while (p != x) {
            val g = parent.getOrElse(p, p)
            parent(x) = g // path halving
            x = g
            p = parent.getOrElse(x, x)
          }
          x
        }
        def rootKey(id: Long): Long = rootOf.getOrElse(id, id)
        es.foreach { case (u, v) =>
          val ru = rootKey(u); val rv = rootKey(v)
          if (ru != rv) {
            parent.getOrElseUpdate(ru, ru)
            parent.getOrElseUpdate(rv, rv)
            val a = find(ru); val b = find(rv)
            if (a != b) {
              // union by min: labels stay the component minimum, the
              // same invariant starContract converges to
              if (a < b) parent(b) = a else parent(a) = b
            }
          }
        }
        val outRows = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
        parent.keysIterator.toArray.foreach { r =>
          val f = find(r)
          if (f != r) outRows += ((0, r, f)) // changed roots only
        }
        batch.foreach { id => outRows += ((1, id, find(rootKey(id)))) }
        rootOf.keysIterator.foreach { id => outRows += ((2, id, id)) }
        outRows.iterator
      }
    val outCk = Ckpt.fresh(out.toDF("t", "a", "b"))
    DeltaLabels(
      rootMap = outCk.where(col("t") === 0)
        .select(col("a").as("old_root"), col("b").as("new_root")),
      newDocLabels = outCk.where(col("t") === 1)
        .select(col("a").as("doc_id"), col("b").as("component_id")),
      knownIds = outCk.where(col("t") === 2).select(col("a").as("id")),
      deltaSmall = true,
      scratch = Seq(outCk))
  }

  /** The unbounded-scale regime of [[deltaRelabel]] (delta above the
    * single-task cap): every intermediate is a distributed frame and
    * the contraction is [[starContract]]'s log-round loop. Result-
    * identical to the fused path (ComponentsSpec runs both via the
    * cap hook).
    */
  private def distributedDeltaRelabel(
      standingLabels: DataFrame,
      ids: DataFrame,
      edges: DataFrame,
      deltaSmall: Boolean,
      singleTaskCap: Long): DeltaLabels = {
    def sized(df: DataFrame): DataFrame = if (deltaSmall) broadcast(df) else df
    // Standing-root lookup: inner-join the big label table against the
    // (broadcast when small) endpoint set — delta-bounded output —
    // then self-root the endpoints the corpus has never seen (new
    // docs, or connector ids outside the labeled set: mirroring
    // dedupClusters, where edge endpoints outside allIds still connect
    // and still compete for the min).
    val endpoints = edges.select(col("u").as("id"))
      .unionByName(edges.select(col("v").as("id")))
      .unionByName(ids)
      .distinct()
      .transform(Ckpt.fresh)
    val present = standingLabels
      .join(sized(endpoints.select(col("id").as("doc_id"))), Seq("doc_id"))
      .select(col("doc_id").as("id"), col("component_id").as("root"))
      .transform(Ckpt.fresh)
    val selfRooted = endpoints.join(present.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("root"))
    val epRoots = present.unionByName(selfRooted).transform(Ckpt.fresh)
    val rootEdges = edges
      .join(sized(epRoots.select(col("id").as("u"), col("root").as("ru"))), Seq("u"))
      .join(sized(epRoots.select(col("id").as("v"), col("root").as("rv"))), Seq("v"))
      .select(col("ru").as("u"), col("rv").as("v"))
      .where(col("u") =!= col("v"))
    val contracted =
      if (rootEdges.isEmpty) epRoots.limit(0)
        .select(col("id").as("doc_id"), col("root").as("component_id"))
      else starContract(rootEdges, singleTaskCap)
    val rootMap = contracted
      .where(col("doc_id") =!= col("component_id"))
      .select(col("doc_id").as("old_root"), col("component_id").as("new_root"))
      .transform(Ckpt.fresh)
    val newDocLabels = ids
      .join(epRoots, Seq("id"))
      .join(sized(rootMap), col("root") === col("old_root"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("new_root"), col("root")).as("component_id"))
    DeltaLabels(rootMap, newDocLabels,
      knownIds = present.select("id"),
      deltaSmall = deltaSmall,
      scratch = Seq(endpoints, present, epRoots, rootMap))
  }

  /** Full-labeling wrapper over [[deltaRelabel]]: the updated
    * (doc_id, component_id) table for standing ∪ delta ids —
    * result-identical to [[dedupClusters]] over the union of the
    * standing edge set and `deltaPairs` (ComponentsSpec parity; q103's
    * driver oracle proves it against the recursive-CTE full CC).
    * In the micro-batch regime the standing table is scanned once and
    * broadcast-joined against the changed-root map — never shuffled;
    * at 100 TB this is the label table's delta-update write, not a
    * recompute. A backfill-sized delta (above `broadcastDeltaCap`)
    * falls back to shuffle joins for the delta-derived build sides —
    * the standing labels then shuffle once on component_id, the
    * correct trade when the "delta" is itself corpus-scale.
    */
  def dedupClustersDelta(
      standingLabels: DataFrame,
      deltaIds: DataFrame,
      deltaPairs: DataFrame,
      broadcastDeltaCap: Long = 4000000L,
      singleTaskCap: Long = SingleTaskEdgeCap): DataFrame = {
    val d = deltaRelabel(
      standingLabels, deltaIds, deltaPairs, broadcastDeltaCap, singleTaskCap)
    // Re-ingested ids keep their standing row (labels agree by
    // construction: both sides resolve through the same root map).
    // knownIds already holds the delta-bounded standing membership —
    // no further corpus probe. Both build sides inherit deltaRelabel's
    // broadcast-regime decision: a backfill-sized delta falls back to
    // shuffle joins instead of collecting a delta-endpoint-sized
    // frame on the driver.
    def sized(df: DataFrame): DataFrame = if (d.deltaSmall) broadcast(df) else df
    val newOnly = d.newDocLabels.join(
      sized(d.knownIds.select(col("id").as("doc_id"))),
      Seq("doc_id"), "left_anti")
    standingLabels
      .join(sized(d.rootMap), col("component_id") === col("old_root"), "left")
      .select(col("doc_id"),
        coalesce(col("new_root"), col("component_id")).as("component_id"))
      .unionByName(newOnly)
  }

  /** GraphX Pregel CC — the pre-round-7 production path, kept as the
    * independent parity verifier for `dedupClusters` (ComponentsSpec
    * random-graph cases). Not on any query/bench path.
    */
  def dedupClustersGraphX(allIds: DataFrame, pairs: DataFrame): DataFrame = {
    val spark = allIds.sparkSession
    import spark.implicits._
    val edgeDf = pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .transform(Ckpt.fresh)
    val vertices = edgeDf.select(col("id_a").as("id"))
      .unionByName(edgeDf.select(col("id_b").as("id")))
      .distinct()
      .as[Long].rdd.map(id => (id: VertexId, ()))
    val edges = edgeDf.as[(Long, Long)].rdd.map { case (a, b) => Edge(a, b, ()) }
    val graph = Graph(vertices, edges, (),
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
    val cc = graph.connectedComponents().vertices
      .toDF("doc_id", "component_id")
    allIds.select(col("id").cast("long").as("doc_id"))
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("component_id"), col("doc_id")).as("component_id"))
  }
}
