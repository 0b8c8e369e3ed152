package graft

import graft.core.{BlobCodec, BroadcastClient, BroadcastHub, BroadcastService, ExportBlob, GraftDb, HttpBroadcastEndpoint, Parent}
import graft.model.{Child, Gid, Layout, Node, Styles}
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.immutable.SortedSet

/** The worker REST surface over a real loopback socket: codec
  * round-trips, route/status/auth parity with the reference service
  * (assemblage_broadcast/src/lib.rs:42-228), and the full
  * publish → HTTP → subscribe replication loop.
  */
class BroadcastServiceSpec extends AnyFunSuite {

  private def withService(f: (BroadcastService, HttpBroadcastEndpoint) => Unit): Unit = {
    val service = new BroadcastService(new BroadcastHub).start()
    try f(service, new HttpBroadcastEndpoint(service.baseUrl))
    finally service.stop()
  }

  private val sampleBlob: ExportBlob = {
    val a = Gid.random(); val b = Gid.random(); val c = Gid.random()
    ExportBlob(
      nodes = Vector(
        a -> Node.Text("hello é漢"),
        b -> Node.List(Layout.Chain, Vector(Child.Lazy(a))),
        c -> Node.Styled(Styles.Span(SortedSet("bold", "code")), Child.Lazy(b))),
      parents = Map(
        a -> Set(Parent(b, 0)),
        b -> Set(Parent(c, 0)),
        c -> Set.empty[Parent]))
  }

  test("blob codec round-trips every node kind") {
    assert(BlobCodec.decode(BlobCodec.encode(sampleBlob)) === sampleBlob)
    val empty = ExportBlob(Vector.empty, Map.empty)
    assert(BlobCodec.decode(BlobCodec.encode(empty)) === empty)
  }

  test("REST routes: post/get/put/delete with bearer auth and status parity") {
    withService { (_, ep) =>
      val (bid, token, exp1) = ep.post(sampleBlob, episodeTs = 100L)
      assert(exp1 > 0)
      assert(ep.episodeTimestamps(bid) === Vector(100L))
      assert(ep.episode(bid, 100L) === sampleBlob)

      // append with the right token; reject the wrong one (401)
      ep.put(bid, token, 200L, sampleBlob)
      assert(ep.episodeTimestamps(bid) === Vector(100L, 200L))
      intercept[IllegalArgumentException](ep.put(bid, "wrong-token", 300L, sampleBlob))
      // unknown broadcast → 404
      intercept[NoSuchElementException](ep.put(Gid.random(), token, 1L, sampleBlob))
      // unknown broadcast episode list → empty (404 on the wire)
      assert(ep.episodeTimestamps(Gid.random()) === Vector.empty)

      intercept[IllegalArgumentException](ep.delete(bid, "wrong-token"))
      ep.delete(bid, token)
      assert(ep.episodeTimestamps(bid) === Vector.empty)
    }
  }

  test("publish -> HTTP -> subscribe replicates a subtree between two DBs") {
    withService { (_, ep) =>
      val publisher = new GraftDb
      val textId = publisher.add(Node.Text("replicate me"))
      val pageId = publisher.add(Node.List(Layout.Page, Vector(Child.Lazy(textId))))

      val pubClient = new BroadcastClient(publisher, ep)
      val meta = pubClient.publishBroadcast(pageId)

      val subscriber = new GraftDb
      val subClient = new BroadcastClient(subscriber, ep)
      val imported = subClient.subscribeToBroadcast(meta.broadcastId)
      assert(imported > 0)

      // the replicated page renders the same text under the namespace
      val localPage = subClient.namespacedId(meta.broadcastId, pageId)
      val kids = subscriber.get(localPage).get.children.collect { case Child.Lazy(id) => id }
      assert(kids.map(id => subscriber.get(id).get) === Vector(Node.Text("replicate me")))

      // incremental publish: a second episode arrives over the wire
      publisher.push(pageId, Child.Eager(Node.Text("second line")))
      pubClient.publishBroadcast(pageId)
      assert(ep.episodeTimestamps(meta.broadcastId).size >= 1)
      subClient.fetchBroadcast(meta.broadcastId)
      val kids2 = subscriber.get(localPage).get.children.collect { case Child.Lazy(id) => id }
      assert(kids2.map(id => subscriber.get(id).get).contains(Node.Text("second line")))
    }
  }
}
