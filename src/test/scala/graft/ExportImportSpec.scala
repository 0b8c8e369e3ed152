package graft

import graft.core.{BroadcastClient, BroadcastHub, GraftDb, Parent}
import graft.model.{Child, Gid, Layout, Node}
import org.scalatest.funsuite.AnyFunSuite

/** Ported from assemblage_db/tests/import_export.rs plus broadcast
  * pub/sub episode flow (broadcast.rs/index.rs semantics over the
  * local hub).
  */
class ExportImportSpec extends AnyFunSuite {

  private def str(db: GraftDb, id: Gid): String =
    db.get(id).get.asInstanceOf[Node.Text].line

  test("export captures exactly the subtree; import under nil namespace restores it") {
    val db = new GraftDb
    val notExported1 = db.add(Node.text("not exported"))
    val exportedChild1 = db.add(Node.text("should be exported"))
    val exportedDescendant = db.add(Node.text("exported"))
    val exportedChild2 = db.add(Node.List(Layout.Chain, Vector(
      Child.Eager(Node.Text("should ")),
      Child.Eager(Node.Text("also ")),
      Child.Eager(Node.Text("be ")),
      Child.Eager(Node.List(Layout.Chain, Vector(Child.Lazy(exportedDescendant)))))))
    val exportedId = db.add(Node.List(Layout.Page,
      Vector(Child.Lazy(exportedChild1), Child.Lazy(exportedChild2))))
    val notExportedParent = db.add(Node.List(Layout.Page, Vector(Child.Lazy(exportedChild2))))
    val notExported2 = db.add(Node.text("also not exported"))

    assert(db.parents(exportedId).isEmpty)
    assert(db.parents(exportedChild1).size === 1)
    assert(db.parents(exportedChild2).size === 2)

    val (blob, ids) = db.exportBlob(exportedId)
    assert(ids.contains(exportedId))
    assert(ids.contains(exportedChild1))
    assert(ids.contains(exportedChild2))
    assert(ids.contains(exportedDescendant))
    assert(!ids.contains(notExported1))
    assert(!ids.contains(notExported2))
    assert(!ids.contains(notExportedParent))

    val fresh = new GraftDb
    fresh.importBlob(blob, Gid.root)

    assert(fresh.get(exportedId).get.children.length === 2)
    assert(str(fresh, exportedChild1) === "should be exported")
    assert(fresh.get(exportedChild2).get.children.length === 4)
    assert(str(fresh, exportedDescendant) === "exported")
    assert(fresh.get(notExported1).isEmpty)
    assert(fresh.get(notExported2).isEmpty)
    assert(fresh.get(notExportedParent).isEmpty)
    // synthetic root wires the exported subtree under the nil root
    assert(fresh.parents(exportedId) === Set(Parent(Gid.root, 0)))
    assert(fresh.parents(exportedChild1).size === 1)
    assert(fresh.parents(exportedChild2).size === 1)
  }

  test("imported content is reindexed: overlaps only within the imported set") {
    val db = new GraftDb
    db.add(Node.page(Node.Text("not exported, some paragraph of text")))
    val exportedChild1 = db.add(Node.text("is exported, some paragraph of text"))
    val exportedChild2 = db.add(Node.List(Layout.Chain, Vector(
      Child.Eager(Node.Text("this ")),
      Child.Eager(Node.List(Layout.Chain, Vector(Child.Lazy(exportedChild1)))))))
    val exportedId = db.add(Node.List(Layout.Page,
      Vector(Child.Lazy(exportedChild1), Child.Lazy(exportedChild2))))
    db.add(Node.page(Node.Text("also not exported, some paragraph of text")))

    val overlaps = db.overlaps(exportedChild1)
    assert(overlaps.length === 3)
    assert(overlaps.map(_.id).contains(exportedChild2))

    val (blob, ids) = db.exportBlob(exportedId)
    assert(ids.contains(exportedId))

    val fresh = new GraftDb
    fresh.importBlob(blob, Gid.root)
    val freshOverlaps = fresh.overlaps(exportedChild1)
    assert(freshOverlaps.length === 1)
    assert(freshOverlaps.head.id === exportedChild2)
  }

  test("incremental export_since ships only newer nodes and updates overlaps") {
    val db = new GraftDb
    val id1 = db.add(Node.text("foo"))
    db.push(Gid.root, Child.Lazy(id1))
    val (blob1, ids1) = db.exportBlob(Gid.root)
    assert(ids1 === Set(Gid.root, id1))

    val other = new GraftDb
    other.importBlob(blob1, Gid.root)

    val otherId1 = other.add(Node.text("some text with overlap"))
    other.push(Gid.root, Child.Lazy(otherId1))
    assert(other.overlaps(otherId1).isEmpty)

    val lastExported = db.lastUpdated.get
    val (empty, ids2) = db.exportSince(Gid.root, lastExported)
    assert(ids2 === Set(Gid.root, id1))
    assert(empty.isEmpty)

    db.swap(id1, Node.text("some text with overlap"))
    val (blob2, ids3) = db.exportSince(Gid.root, lastExported)
    assert(ids3 === Set(Gid.root, id1))
    assert(!blob2.isEmpty)

    other.importBlob(blob2, Gid.root)
    assert(str(other, id1) === "some text with overlap")
    assert(other.overlaps(id1).map(_.id) === Vector(otherId1))
    assert(other.overlaps(otherId1).map(_.id) === Vector(id1))
  }

  test("import under a random namespace remaps every id") {
    val db = new GraftDb
    val textId = db.add(Node.text("namespaced"))
    val pageId = db.add(Node.List(Layout.Page, Vector(Child.Lazy(textId))))
    val (blob, _) = db.exportBlob(pageId)

    val ns = Gid.random()
    val fresh = new GraftDb
    fresh.importBlob(blob, ns)
    assert(fresh.get(pageId).isEmpty)
    assert(str(fresh, textId.xor(ns)) === "namespaced")
    assert(fresh.get(pageId.xor(ns)).get.children === Vector(Child.Lazy(textId.xor(ns))))
  }

  test("broadcast pub/sub: publish, subscribe, incremental episode fetch") {
    val hub = new BroadcastHub
    val publisher = new GraftDb
    val pubClient = new BroadcastClient(publisher, hub)

    val page = publisher.add(Node.page(Node.Text("broadcast me")))
    val meta = pubClient.publishBroadcast(page)
    assert(pubClient.listBroadcasts(page).map(_.broadcastId) === Vector(meta.broadcastId))

    val subscriber = new GraftDb
    val subClient = new BroadcastClient(subscriber, hub)
    val imported = subClient.subscribeToBroadcast(meta.broadcastId)
    assert(imported > 0)
    // fetch-once: second subscribe is a no-op
    assert(subClient.subscribeToBroadcast(meta.broadcastId) === 0)

    val localPage = subClient.namespacedId(meta.broadcastId, page)
    assert(subscriber.get(localPage).get.children.length === 1)
    val localText = subscriber.get(localPage).get.children.head.idOpt.get
    assert(subscriber.get(localText).get === Node.Text("broadcast me"))

    // publisher appends content → new episode → subscriber fetches the delta
    publisher.push(page, Child.Eager(Node.Text("second line")))
    pubClient.publishBroadcast(page)
    assert(subClient.fetchBroadcast(meta.broadcastId) > 0)
    val updated = subscriber.get(localPage).get.children
    assert(updated.length === 2)

    // no new episodes → nothing imported
    assert(subClient.fetchBroadcast(meta.broadcastId) === 0)
  }

  test("broadcast TTL: expiration fixed at creation; expired manifests vanish, blobs outlive by keep-alive") {
    // hub-side TTL arithmetic under a controlled clock
    var t = 1000L
    val hub = new BroadcastHub(() => t)
    val db = new GraftDb
    val text = db.add(Node.text("ttl"))
    val page = db.add(Node.List(Layout.Page, Vector(Child.Lazy(text))))
    val (blob, _) = db.exportBlob(page)
    val (bid, token, exp1) = hub.post(blob, 1L)
    assert(exp1 === 1000L + hub.BroadcastTtlMs)
    t = 500000L
    // activity does NOT extend a broadcast's life: the reference
    // re-puts the manifest with its ORIGINAL expiration (lib.rs:152-168)
    assert(hub.put(bid, token, 2L, blob) === exp1)

    // server-side TTL: past the expiration the MANIFEST is absent —
    // put cannot revive it, timestamps are empty — but stored blobs
    // keep serving for the keep-alive window (lib.rs:191-199)
    t = exp1 + 1
    assert(hub.episodeTimestamps(bid).isEmpty)
    intercept[NoSuchElementException](hub.put(bid, token, 3L, blob))
    assert(hub.episode(bid, 1L) === blob)
    t = exp1 + hub.EpisodeKeepAliveMs + 1
    intercept[NoSuchElementException](hub.episode(bid, 1L))

    // client-side expiry: a hub whose clock is epoch-0 grants 1970
    // expirations — liveness checks against the wall clock drop them
    val pastHub = new BroadcastHub(() => 0L)
    val client = new BroadcastClient(db, pastHub)
    val meta = client.publishBroadcast(page)
    assert(meta.expiration.exists(_ < System.currentTimeMillis()))
    assert(client.listBroadcasts(text).isEmpty)
    client.updateBroadcasts(page)
    assert(client.published.liveKeys.isEmpty) // expired → removed
  }

  test("updateBroadcasts re-pushes only intersecting live broadcasts") {
    val hub = new BroadcastHub
    val db = new GraftDb
    val client = new BroadcastClient(db, hub)
    val pageA = db.add(Node.page(Node.Text("A content")))
    val pageB = db.add(Node.page(Node.Text("B content")))
    val metaA = client.publishBroadcast(pageA)
    client.publishBroadcast(pageB)

    db.push(pageA, Child.Eager(Node.Text("A update")))
    client.updateBroadcasts(pageA)

    val sub = new BroadcastClient(new GraftDb, hub)
    sub.subscribeToBroadcast(metaA.broadcastId)
    assert(hub.episodeTimestamps(metaA.broadcastId).length === 2)
  }
}
