package graft.bulk

import graft.core.{GraftDb, Parent}
import graft.model.{Child, Gid, Layout, Node, Overlap, Styles}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.immutable.SortedSet

/** Durable storage for the document DB: one parquet table per slot
  * (nodes, parents, grams, counts, overlaps) — the engine's analog of
  * the reference's append-only KV log, in the compacted form (latest
  * live versions; the full-history variant is the same schema plus
  * `(version_ts, is_removed)` columns resolved by
  * [[VersionedTable]]).
  *
  * At scale these directories ARE the engine's tables: the serving
  * path loads them into slot stores, the bulk pipelines read them
  * directly (`spark.read.parquet`), and compaction is an idempotent
  * rewrite.
  */
object Persistence {

  /** Write a compacted snapshot of the DB (latest live versions). */
  def save(db: GraftDb, spark: SparkSession, dir: String): Unit = {
    import spark.implicits._

    val nodeRows = db.nodes.liveKeys.map { id =>
      db.get(id).get match {
        case Node.Text(l) =>
          (id.toString, "TEXT", null: String, null: String, Seq.empty[String], l, Seq.empty[String])
        case Node.List(layout, cs) =>
          (id.toString, "LIST", if (layout == Layout.Chain) "CHAIN" else "PAGE",
            null, Seq.empty[String], null, cs.map(c => c.idOpt.get.toString))
        case Node.Styled(styles, c) =>
          val (kind, st) = styles match {
            case Styles.Block(s) => ("BLOCK", s.toSeq)
            case Styles.Span(s)  => ("SPAN", s.toSeq)
          }
          (id.toString, "STYLED", null, kind, st, null, Seq(c.idOpt.get.toString))
      }
    }.toVector
    nodeRows.toDF("id", "kind", "layout", "style_kind", "styles", "text", "children")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/nodes")

    db.parentsOf.liveKeys.flatMap { id =>
      val ps = db.parentsOf.get(id).get
      if (ps.isEmpty) Seq((id.toString, null: String, -1))
      else ps.toSeq.map(p => (id.toString, p.id.toString, p.index))
    }.toVector.toDF("id", "parent_id", "parent_index")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/parents")

    db.gramsSlot.liveKeys.flatMap { gram =>
      db.gramsSlot.get(gram).get.map { case (id, occ) => (gram, id.toString, occ) }
    }.toVector.toDF("gram", "id", "occurrences")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/grams")

    db.countsSlot.liveKeys.map(id => (id.toString, db.countsSlot.get(id).get))
      .toVector.toDF("id", "cnt")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/counts")

    db.overlapsSlot.liveKeys.flatMap { id =>
      val os = db.overlapsSlot.get(id).get
      if (os.isEmpty) Seq((id.toString, null: String, 0, 0, 0, -1))
      else os.zipWithIndex.map { case (o, i) =>
        (id.toString, o.id.toString, o.a, o.b, o.intersection, i)
      }
    }.toVector.toDF("id", "match_id", "a", "b", "intersection", "rank")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/overlaps")
  }

  /** Hard cap on the node count [[load]] will pull to the driver. The
    * serving GraftDb is an in-memory single-process store — its whole
    * role is the executable spec and interactive serving of SMALL
    * graphs; rehydrating a bulk-scale slot dir through collect() would
    * OOM the driver long after this bound. Raise deliberately via
    * [[load]]'s `maxNodes` if a bigger serving store is truly wanted.
    */
  val DefaultMaxLoadNodes: Long = 2_000_000L

  /** Load a snapshot back into a serving-path DB.
    *
    * Guarded: fails fast when the snapshot exceeds `maxNodes` instead
    * of silently collect()ing a bulk-scale table into the driver —
    * big slot dirs belong to the DataFrame pipelines
    * ([[postingsFrom]], GraphOps), not the serving store.
    */
  def load(spark: SparkSession, dir: String,
      maxNodes: Long = DefaultMaxLoadNodes): GraftDb = {
    val db = new GraftDb

    val nodeCount = spark.read.parquet(s"$dir/nodes").count()
    require(nodeCount <= maxNodes,
      s"snapshot at $dir has $nodeCount nodes > maxNodes=$maxNodes: " +
        "rehydrating it into the in-memory serving store would collect() " +
        "a bulk-scale table to the driver; use the bulk DataFrame " +
        "pipelines instead, or raise maxNodes deliberately")

    val parents = spark.read.parquet(s"$dir/parents").collect()
      .groupBy(_.getString(0))
      .map { case (id, rows) =>
        Gid.parse(id) -> rows.filter(!_.isNullAt(1))
          .map(r => Parent(Gid.parse(r.getString(1)), r.getInt(2))).toSet
      }

    spark.read.parquet(s"$dir/nodes").collect().foreach { r =>
      val id = Gid.parse(r.getString(0))
      val node = r.getString(1) match {
        case "TEXT" => Node.Text(r.getString(5))
        case "LIST" =>
          val layout = if (r.getString(2) == "CHAIN") Layout.Chain else Layout.Page
          Node.List(layout, r.getSeq[String](6).toVector.map(s => Child.Lazy(Gid.parse(s)): Child))
        case "STYLED" =>
          val styles = SortedSet.empty[String] ++ r.getSeq[String](4)
          val s = if (r.getString(3) == "BLOCK") Styles.Block(styles) else Styles.Span(styles)
          Node.Styled(s, Child.Lazy(Gid.parse(r.getSeq[String](6).head)))
      }
      db.restoreRaw(id, node, parents.getOrElse(id, Set.empty))
    }

    spark.read.parquet(s"$dir/grams").collect()
      .groupBy(_.getInt(0))
      .foreach { case (gram, rows) =>
        db.restoreGrams(gram, rows.map(r => Gid.parse(r.getString(1)) -> r.getInt(2)).toMap)
      }

    spark.read.parquet(s"$dir/counts").collect()
      .foreach(r => db.restoreCount(Gid.parse(r.getString(0)), r.getInt(1)))

    spark.read.parquet(s"$dir/overlaps").collect()
      .groupBy(_.getString(0))
      .foreach { case (id, rows) =>
        val os = rows.filter(!_.isNullAt(1)).sortBy(_.getInt(5)).map(r =>
          Overlap(Gid.parse(r.getString(1)), r.getInt(2), r.getInt(3), r.getInt(4))).toVector
        db.restoreOverlaps(Gid.parse(id), os)
      }
    db
  }

  /** The postings table as a bulk DataFrame (id as string) — the bridge
    * from a persisted DB to the distributed search pipelines.
    */
  def postingsFrom(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/grams")
      .select(col("id"), col("gram").cast("long").as("gram"), col("occurrences").cast("long"))

  /** `storage::purge(name)` (assemblage_kv/src/storage.rs:32-40):
    * delete the storage backing entirely — every slot table, manifest
    * and staging file under `dir`. A subsequent [[save]]/[[load]]
    * starts from a fresh store. Idempotent on a missing dir.
    */
  def purge(dir: String): Unit = {
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      val paths = scala.util.Using.resource(java.nio.file.Files.walk(root))(
        _.iterator().asScala.toVector)
      paths.reverseIterator.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
