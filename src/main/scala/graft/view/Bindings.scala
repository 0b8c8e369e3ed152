package graft.view

import graft.core.{BroadcastClient, GraftDb}
import graft.model.{Child, Gid, Layout, Node}

/** A section of a tile to persist (reference:
  * assemblage_view/src/bindings.rs SyncedSection).
  */
sealed trait SyncedSection
object SyncedSection {
  /** Reuse the stored version — no changes. */
  final case class Existing(id: Gid) extends SyncedSection
  /** Become a new link to an existing node. */
  final case class Linked(id: Gid) extends SyncedSection
  /** Replace with edited markup blocks. */
  final case class Edited(blocks: Vector[String]) extends SyncedSection
}

/** The frontend entry points (bindings.rs:214-359): refresh renders a
  * tile; sync persists an edited tile — Existing sections stay lazy
  * children, Linked sections wrap into chain links, Edited sections
  * parse markup into fresh pages — assembled into a replacement Page
  * that is added (new) or swapped (existing), then re-rendered.
  */
final class Bindings(db: GraftDb, broadcasts: Option[BroadcastClient] = None) {
  private val view = new View(db)

  /** Render the tile for a node (or a subscribed broadcast root),
    * including its live broadcast list (lib.rs:460-463).
    */
  def refresh(id: Gid): Tile =
    view.tile(id, broadcasts.map(_.listBroadcasts(id)).getOrElse(Vector.empty))

  /** Subscribe-and-render a broadcast's namespaced root. */
  def refreshBroadcast(broadcastId: Gid): Tile = {
    val client = broadcasts.getOrElse(
      throw new IllegalStateException("no broadcast client configured"))
    client.subscribeToBroadcast(broadcastId)
    view.tile(client.namespacedId(broadcastId, Gid.root))
  }

  /** Persist edited sections and return the re-rendered tile. */
  def sync(id: Option[Gid], sections: Vector[SyncedSection]): Tile = {
    val children: Vector[Child] = sections.map {
      case SyncedSection.Existing(sid) => Child.Lazy(sid)
      case SyncedSection.Linked(sid) =>
        Child.Eager(Node.List(Layout.Chain, Vector(Child.Lazy(sid))))
      case SyncedSection.Edited(blocks) =>
        Child.Eager(Node.List(Layout.Page,
          blocks.map(m => Child.Eager(Markup.toNode(m)): Child)))
    }
    val replacement = Node.List(Layout.Page, children)
    val targetId = id match {
      case None      => db.add(replacement)
      case Some(tid) => db.swap(tid, replacement); tid
    }
    val result = view.tile(targetId,
      broadcasts.map(_.listBroadcasts(targetId)).getOrElse(Vector.empty))
    broadcasts.foreach(_.updateBroadcasts(targetId))
    result
  }
}
