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

  private def rawClient = java.net.http.HttpClient.newHttpClient()

  test("concurrent PUTs land atomically: all episodes listed, 201 for new / 200 for overwrite") {
    withService { (svc, ep) =>
      val (bid, token, _) = ep.post(sampleBlob, 0L)
      val http = rawClient
      def rawPut(ts: Long): Int = http.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"${svc.baseUrl}/broadcast/$bid/$ts"))
          .header("Authorization", s"Bearer $token")
          .PUT(java.net.http.HttpRequest.BodyPublishers.ofByteArray(BlobCodec.encode(sampleBlob)))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        import scala.jdk.CollectionConverters._
        // 32 writers on distinct episodes + 8 racing on the SAME episode
        val tasks: Seq[java.util.concurrent.Callable[Int]] =
          (1 to 32).map(i => (() => rawPut(i.toLong)): java.util.concurrent.Callable[Int]) ++
            (1 to 8).map(_ => (() => rawPut(999L)): java.util.concurrent.Callable[Int])
        val results = pool.invokeAll(tasks.asJava).asScala.map(_.get()).toVector
        // distinct-ts writers each create their episode (201); of the 8
        // same-ts racers exactly ONE creates, the rest overwrite (200) —
        // the reference's contains-check split (lib.rs:153-160), atomic
        // under concurrency
        assert(results.take(32).forall(_ === 201), results.take(32).toString)
        assert(results.drop(32).count(_ === 201) === 1, results.drop(32).toString)
        assert(results.drop(32).forall(c => c == 200 || c == 201))
        assert(ep.episodeTimestamps(bid) === ((0L to 32L).toVector :+ 999L))
        assert(ep.episode(bid, 999L) === sampleBlob)
      } finally pool.shutdown()
    }
  }

  test("delete during concurrent fetches: no torn reads; blobs survive, the list empties, the owner can re-append") {
    withService { (svc, ep) =>
      val (bid, token, _) = ep.post(sampleBlob, 1L)
      val http = rawClient
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val anomalies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      def rawGetEpisode(): Unit = {
        val resp = http.send(
          java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"${svc.baseUrl}/broadcast/$bid/1")).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofByteArray())
        resp.statusCode() match {
          case 200 =>
            if (BlobCodec.decode(resp.body()) != sampleBlob) anomalies.add("torn blob")
          case 404 => () // acceptable once the blob is TTL-reaped
          case c   => anomalies.add(s"status $c")
        }
      }
      val readers = (1 to 4).map(_ => new Thread(() => while (!stop.get()) rawGetEpisode()))
      readers.foreach(_.start())
      Thread.sleep(50)
      ep.delete(bid, token)
      Thread.sleep(50)
      stop.set(true)
      readers.foreach(_.join())
      assert(anomalies.isEmpty, anomalies.toString)
      // DELETE clears the manifest list only: the wire shows a LIVE
      // empty broadcast (200 []), not 404 — and blobs stay fetchable
      // (immutable + TTL-reaped, lib.rs:204-228)
      val listResp = http.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"${svc.baseUrl}/broadcast/$bid")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(listResp.statusCode() === 200)
      assert(listResp.body() === "[]")
      assert(ep.episode(bid, 1L) === sampleBlob)
      // the owner's token still works: delete is not a revocation
      ep.put(bid, token, 2L, sampleBlob)
      assert(ep.episodeTimestamps(bid) === Vector(2L))
      // unknown broadcast DELETE → 404 (NoSuchElement on the endpoint)
      intercept[NoSuchElementException](ep.delete(Gid.random(), token))
    }
  }

  test("POST without an episode creates an empty live broadcast (reference lib.rs:110-121)") {
    withService { (svc, ep) =>
      val http = rawClient
      val resp = http.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"${svc.baseUrl}/broadcast"))
          .POST(java.net.http.HttpRequest.BodyPublishers.noBody()).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() === 201)
      val bid = graft.model.Gid.parse(
        "\"broadcast_id\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(resp.body()).get.group(1))
      val token = "\"token\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(resp.body()).get.group(1)
      // live with an empty list: 200 [], and the token appends normally
      val listResp = http.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"${svc.baseUrl}/broadcast/$bid")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(listResp.statusCode() === 200)
      assert(listResp.body() === "[]")
      ep.put(bid, token, 7L, sampleBlob)
      assert(ep.episodeTimestamps(bid) === Vector(7L))
      // malformed episode param is still 400, not an empty create
      val bad = http.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"${svc.baseUrl}/broadcast?episode=xyz"))
          .POST(java.net.http.HttpRequest.BodyPublishers.noBody()).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(bad.statusCode() === 400)
    }
  }

  test("expired broadcast over the wire: PUT 404s (no revival), blobs serve through keep-alive then 404") {
    @volatile var now = 1000L
    val service = new BroadcastService(new BroadcastHub(() => now)).start()
    try {
      val ep = new HttpBroadcastEndpoint(service.baseUrl)
      val (bid, token, exp) = ep.post(sampleBlob, 1L)
      now = exp + 1
      // expired manifest: PUT is 404 (NoSuchElement), NOT 401 — a valid
      // token cannot revive a dead broadcast; the episode list 404s
      intercept[NoSuchElementException](ep.put(bid, token, 2L, sampleBlob))
      assert(ep.episodeTimestamps(bid) === Vector.empty)
      // the stored blob outlives the manifest by the keep-alive window
      assert(ep.episode(bid, 1L) === sampleBlob)
      now = exp + new BroadcastHub().EpisodeKeepAliveMs + 1
      intercept[IllegalArgumentException](ep.episode(bid, 1L)) // 404 → require fails
    } finally service.stop()
  }
}
