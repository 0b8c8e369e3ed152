package graft

import graft.core.{BroadcastClient, BroadcastHub, GraftDb}
import graft.model.{Child, Gid, Node}
import graft.view.{Bindings, SyncedSection, VBlock, VSpan}
import org.scalatest.funsuite.AnyFunSuite

/** Ported from assemblage_view/tests/bindings.rs: the refresh/sync
  * entry points end-to-end (markup → nodes → swap → tile), and
  * broadcast tiles over the local hub.
  */
class BindingsSpec extends AnyFunSuite {

  private def textBlock(t: String) = VBlock.text(Vector(VSpan.text(t)))

  test("refresh of a broadcast renders the namespaced root tile") {
    val hub = new BroadcastHub
    val publisher = new GraftDb
    val pubClient = new BroadcastClient(publisher, hub)
    val id1 = publisher.add(Node.text("foo"))
    publisher.push(Gid.root, Child.Lazy(id1))
    val id2 = publisher.add(Node.text("foobar"))
    publisher.push(Gid.root, Child.Lazy(id2))
    val meta = pubClient.publishBroadcast(Gid.root)

    val consumer = new GraftDb
    val bindings = new Bindings(consumer, Some(new BroadcastClient(consumer, hub)))
    val tile = bindings.refreshBroadcast(meta.broadcastId)
    assert(tile.preview === textBlock("foo"))
  }

  test("sync: edited, existing, and linked sections round-trip") {
    val db = new GraftDb
    val bindings = new Bindings(db)
    val id1 = db.add(Node.text("foo"))
    db.push(Gid.root, Child.Lazy(id1))
    val id2 = db.add(Node.page(Node.Text("foo"), Node.Text("bar")))
    db.push(Gid.root, Child.Lazy(id2))

    // Replace root with an edited markup section + the existing page.
    val tile1 = bindings.sync(Some(Gid.root), Vector(
      SyncedSection.Edited(Vector("baz")),
      SyncedSection.Existing(id2)))
    assert(tile1.id === Gid.root)
    assert(tile1.preview === textBlock("baz"))
    assert(tile1.sections.head.id === None)
    assert(tile1.sections.head.subsections.length === 1)
    val section1Id = tile1.sections.head.subsections.head.id

    // Reorder: existing page first, then the baz section.
    val tile2 = bindings.sync(Some(Gid.root), Vector(
      SyncedSection.Existing(id2),
      SyncedSection.Existing(section1Id)))
    assert(tile2.preview === textBlock("foo"))

    // Link the "bar" subsection instead of embedding it.
    val subsection2Id = tile2.sections(1).subsections.head.id
    val tile3 = bindings.sync(Some(Gid.root), Vector(
      SyncedSection.Linked(subsection2Id),
      SyncedSection.Existing(id2)))
    assert(tile3.preview === textBlock("bar"))
  }

  test("sync without an id adds a fresh page") {
    val db = new GraftDb
    val bindings = new Bindings(db)
    val tile = bindings.sync(None, Vector(
      SyncedSection.Edited(Vector("# A Heading", "and some text"))))
    // preview renders the first block's own content (lib.rs:591-599
    // reads subsections of the previewed id, not the styled wrapper)
    assert(tile.preview === textBlock("A Heading"))
    assert(db.get(tile.id).isDefined)
    assert(tile.sections.length === 2)
  }

  test("sync republishes intersecting broadcasts") {
    val hub = new BroadcastHub
    val db = new GraftDb
    val client = new BroadcastClient(db, hub)
    val bindings = new Bindings(db, Some(client))
    val id1 = db.add(Node.text("foo"))
    db.push(Gid.root, Child.Lazy(id1))
    val meta = client.publishBroadcast(Gid.root)
    assert(hub.episodeTimestamps(meta.broadcastId).length === 1)

    bindings.sync(Some(Gid.root), Vector(
      SyncedSection.Existing(id1),
      SyncedSection.Edited(Vector("appended line"))))
    assert(hub.episodeTimestamps(meta.broadcastId).length === 2)
  }
}
