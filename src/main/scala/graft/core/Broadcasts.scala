package graft.core

import graft.model.Gid

import scala.collection.mutable

/** Public broadcast metadata (reference: broadcast.rs Broadcast),
  * ordered latest-updated first.
  */
final case class BroadcastMeta(
    broadcastId: Gid,
    nodeId: Gid,
    lastUpdated: Long,
    expiration: Option[Long])
object BroadcastMeta {
  implicit val ordering: Ordering[BroadcastMeta] =
    Ordering.by((b: BroadcastMeta) => (-b.lastUpdated, b.expiration.map(-_)))
}

/** Publisher-side broadcast state (slot 5; broadcast.rs OwnedBroadcast). */
final case class OwnedBroadcast(
    broadcastId: Gid,
    root: Gid,
    exported: Set[Gid],
    token: String,
    lastUpdated: Long,
    expiration: Option[Long]) {
  def meta: BroadcastMeta = BroadcastMeta(broadcastId, root, lastUpdated, expiration)
}

/** Subscriber-side broadcast state (slot 6). */
final case class BroadcastSubscription(lastUpdated: Long, namespace: Gid)

/** The broadcast worker's operation surface (assemblage_broadcast):
  * implemented in-process by [[BroadcastHub]] and over real HTTP by
  * [[HttpBroadcastEndpoint]] against a [[BroadcastService]] — the
  * publish/fetch client is generic over the two.
  */
trait BroadcastEndpoint {
  def post(blob: ExportBlob, episodeTs: Long): (Gid, String, Long)
  def put(bid: Gid, token: String, episodeTs: Long, blob: ExportBlob): Long
  def episodeTimestamps(bid: Gid): Vector[Long]
  def episode(bid: Gid, ts: Long): ExportBlob
  def delete(bid: Gid, token: String): Unit
}

/** In-process form of the broadcast REST service
  * (assemblage_broadcast): per-broadcast manifest {token, expiration,
  * episodes}, episode blobs keyed by timestamp, bearer-token auth for
  * appends. At scale this is an object-store prefix per broadcast with
  * episode files — which is exactly how the Spark streaming source
  * (graft.streaming.EpisodeStream) consumes it; [[BroadcastService]]
  * serves these same operations over HTTP.
  */
final class BroadcastHub(clock: () => Long = () => System.currentTimeMillis())
    extends BroadcastEndpoint {
  val BroadcastTtlMs: Long = 24L * 60 * 60 * 1000

  private final class State(val token: String, var expiration: Long) {
    val episodes: mutable.TreeMap[Long, ExportBlob] = mutable.TreeMap.empty
  }
  private val broadcasts = mutable.HashMap.empty[Gid, State]

  /** Server-side TTL: an expired broadcast is ABSENT — the reference
    * worker's KV TTL makes expired entries 404, so put can't revive
    * one and reads don't serve stale data to subscribers that skip the
    * client-side liveness check.
    */
  private def liveState(bid: Gid): Option[State] =
    broadcasts.get(bid).filter(_.expiration > clock())

  def post(blob: ExportBlob, episodeTs: Long): (Gid, String, Long) = synchronized {
    val bid = Gid.random()
    val token = Gid.random().toString
    val st = new State(token, clock() + BroadcastTtlMs)
    st.episodes(episodeTs) = blob
    broadcasts(bid) = st
    (bid, token, st.expiration)
  }

  def put(bid: Gid, token: String, episodeTs: Long, blob: ExportBlob): Long = synchronized {
    val st = liveState(bid).getOrElse(throw new NoSuchElementException(s"broadcast $bid"))
    require(st.token == token, "invalid broadcast token")
    st.episodes(episodeTs) = blob
    st.expiration = math.max(st.expiration, clock() + BroadcastTtlMs)
    st.expiration
  }

  def episodeTimestamps(bid: Gid): Vector[Long] = synchronized {
    liveState(bid).map(_.episodes.keys.toVector).getOrElse(Vector.empty)
  }

  def episode(bid: Gid, ts: Long): ExportBlob = synchronized {
    liveState(bid).getOrElse(throw new NoSuchElementException(s"broadcast $bid")).episodes(ts)
  }

  def delete(bid: Gid, token: String): Unit = synchronized {
    broadcasts.get(bid).foreach { st =>
      require(st.token == token, "invalid broadcast token")
      broadcasts -= bid
    }
  }
}

/** Pub/sub replication client over a GraftDb and a hub (reference:
  * index.rs:25-171 + broadcast.rs push/pull): publish exports the
  * subtree as timestamped episodes (incremental via export_since with
  * the last-pushed watermark); fetch imports episodes newer than the
  * subscription watermark under a random XOR namespace.
  */
final class BroadcastClient(db: GraftDb, hub: BroadcastEndpoint) {
  val published = new SlotStore[Gid, OwnedBroadcast]
  val subscribed = new SlotStore[Gid, BroadcastSubscription]

  private def push(id: Gid, existing: Option[OwnedBroadcast]): OwnedBroadcast = {
    val ts = db.lastUpdated.getOrElse(0L)
    existing match {
      case Some(b) =>
        val lastPushed = hub.episodeTimestamps(b.broadcastId).lastOption.getOrElse(0L)
        if (ts > lastPushed) {
          val (blob, ids) = db.exportSince(id, lastPushed)
          if (blob.isEmpty) b
          else {
            val expiration = hub.put(b.broadcastId, b.token, ts, blob)
            b.copy(exported = ids, lastUpdated = ts, expiration = Some(expiration))
          }
        } else b
      case None =>
        val (blob, ids) = db.exportBlob(id)
        val (bid, token, expiration) = hub.post(blob, ts)
        OwnedBroadcast(bid, id, ids, token, ts, Some(expiration))
    }
  }

  /** Publish (or incrementally update) the subtree at `id`. */
  def publishBroadcast(id: Gid): BroadcastMeta = {
    val existing = published.get(id)
    val b = push(id, existing)
    published.append(id, b, db.nowTs())
    b.meta
  }

  /** Fetch-once-if-new subscription. */
  def subscribeToBroadcast(bid: Gid): Int =
    if (subscribed.get(bid).isEmpty) fetchBroadcast(bid) else 0

  /** Pull episodes newer than the watermark and import them under the
    * subscription's XOR namespace (allocated on first fetch).
    */
  def fetchBroadcast(bid: Gid): Int = {
    var sub = subscribed.get(bid).getOrElse(BroadcastSubscription(0L, Gid.root))
    val timestamps = hub.episodeTimestamps(bid)
    val lastPushed = timestamps.maxOption.getOrElse(0L)
    val fresh = timestamps.filter(_ > sub.lastUpdated).sorted
    if (sub.namespace.isRoot) sub = sub.copy(namespace = Gid.random())
    var imported = 0
    fresh.foreach { ts =>
      val blob = hub.episode(bid, ts)
      db.importBlob(blob, sub.namespace)
      imported += blob.nodes.length
    }
    subscribed.append(bid, sub.copy(lastUpdated = lastPushed), db.nowTs())
    imported
  }

  /** All live published broadcasts containing `id`. */
  def listBroadcasts(id: Gid): Vector[BroadcastMeta] = {
    val now = db.nowTs()
    published.liveKeys.toVector
      .flatMap(published.get)
      .filter(b => b.exported.contains(id) && b.expiration.forall(_ > now))
      .map(_.meta)
      .sorted
  }

  /** Re-push all live broadcasts whose exported set intersects the
    * dirty subtree; drop expired ones.
    */
  def updateBroadcasts(id: Gid): Unit = {
    val descendants = db.descendantsUntilLinks(id)
    val now = db.nowTs()
    published.liveKeys.toVector.foreach { key =>
      val b = published.get(key).get
      val live = b.expiration.forall(_ > now)
      if (live && b.exported.exists(descendants.contains)) {
        published.append(key, push(id, Some(b)), db.nowTs())
      } else if (!live) {
        published.remove(key, db.nowTs())
      }
    }
  }

  /** Map a pre-import id to its local namespaced id (index.rs:631-650). */
  def namespacedId(bid: Gid, id: Gid): Gid = {
    val sub = subscribed.get(bid)
      .getOrElse(throw new NoSuchElementException(s"broadcast $bid not subscribed"))
    id.xor(sub.namespace)
  }
}
