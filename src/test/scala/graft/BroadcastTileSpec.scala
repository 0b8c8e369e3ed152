package graft

import graft.core.{BroadcastClient, BroadcastHub, GraftDb}
import graft.model.{Child, Gid, Node}
import graft.view.{Bindings, Section, Subsection, VBlock, VSpan}
import org.scalatest.funsuite.AnyFunSuite

/** Ported from assemblage_view/tests/broadcast.rs: tiles carry their
  * live broadcast list; broadcast consumers render the namespaced root
  * with identical content and an empty broadcast list.
  */
class BroadcastTileSpec extends AnyFunSuite {

  private def textBlock(t: String) = VBlock.text(Vector(VSpan.text(t)))

  test("broadcast tile round-trip") {
    val hub = new BroadcastHub
    val db = new GraftDb
    val client = new BroadcastClient(db, hub)
    val bindings = new Bindings(db, Some(client))

    val id1 = db.add(Node.text("foo"))
    db.push(Gid.root, Child.Lazy(id1))
    val id2 = db.add(Node.text("foobar"))
    db.push(Gid.root, Child.Lazy(id2))
    val lastUpdated = db.lastUpdated.get
    val meta = client.publishBroadcast(Gid.root)

    assert(meta.expiration.exists(_ >= lastUpdated + 60L * 60 * 24))

    val tile = bindings.refresh(Gid.root)
    assert(tile.id === Gid.root)
    assert(tile.preview === textBlock("foo"))
    assert(tile.broadcasts.map(b => (b.broadcastId, b.nodeId, b.lastUpdated)) ===
      Vector((meta.broadcastId, Gid.root, lastUpdated)))
    assert(tile.sections === Vector(
      Section(None, hasMultipleParents = false,
        Vector(Subsection(id1, textBlock("foo"), Vector.empty, Vector.empty))),
      Section(None, hasMultipleParents = false,
        Vector(Subsection(id2, textBlock("foobar"), Vector.empty, Vector.empty)))))
    assert(tile.branches.isEmpty)

    // consumer side: same content under the namespace, no broadcasts
    val other = new GraftDb
    val otherClient = new BroadcastClient(other, hub)
    val otherBindings = new Bindings(other, Some(otherClient))
    val otherTile = otherBindings.refreshBroadcast(meta.broadcastId)
    val namespaced = otherClient.namespacedId(meta.broadcastId, Gid.root)
    assert(otherTile.id === namespaced)
    assert(otherTile.preview === tile.preview)
    assert(otherTile.broadcasts.isEmpty)
    assert(otherTile.branches === tile.branches)
    assert(otherTile.sections.length === tile.sections.length)
    otherTile.sections.zip(tile.sections).foreach { case (found, expected) =>
      assert(found.subsections.map(_.block) === expected.subsections.map(_.block))
    }
  }

  test("consumer sees publisher updates after refetch") {
    val hub = new BroadcastHub
    val db = new GraftDb
    val client = new BroadcastClient(db, hub)
    val id1 = db.add(Node.text("first episode"))
    db.push(Gid.root, Child.Lazy(id1))
    val meta = client.publishBroadcast(Gid.root)

    val other = new GraftDb
    val otherClient = new BroadcastClient(other, hub)
    val otherBindings = new Bindings(other, Some(otherClient))
    val t1 = otherBindings.refreshBroadcast(meta.broadcastId)
    assert(t1.sections.length === 1)

    db.push(Gid.root, Child.Eager(Node.Text("second episode")))
    client.publishBroadcast(Gid.root)
    otherClient.fetchBroadcast(meta.broadcastId)
    val t2 = otherBindings.refreshBroadcast(meta.broadcastId)
    assert(t2.sections.length === 2)
    assert(t2.sections(1).subsections.head.block === textBlock("second episode"))
  }
}
