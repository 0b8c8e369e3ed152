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
  /** Episode blobs outlive the manifest by this much — the reference's
    * store_episode keep-alive (lib.rs:197: blob KV entries get
    * expiration + 12 h). */
  val EpisodeKeepAliveMs: Long = 12L * 60 * 60 * 1000

  private final class State(val token: String, val expiration: Long) {
    val episodes: mutable.SortedSet[Long] = mutable.SortedSet.empty
  }
  private val broadcasts = mutable.HashMap.empty[Gid, State]
  // Episode blobs keyed (bid, ts) with their OWN, longer TTL — the
  // reference's KV layout: blobs are immutable once stored; DELETE
  // clears only the manifest's episode list, and reaping is TTL-driven.
  // This is also why a fetch racing a delete never sees torn state.
  private val blobs = mutable.HashMap.empty[(Gid, Long), (ExportBlob, Long)]

  /** Server-side TTL: an expired broadcast is ABSENT — the reference
    * worker's KV TTL makes expired entries 404, so put can't revive
    * one and reads don't serve stale data to subscribers that skip the
    * client-side liveness check.
    */
  private def liveState(bid: Gid): Option[State] =
    broadcasts.get(bid).filter(_.expiration > clock())

  /** Amortized in-process stand-in for the KV's TTL reaper. */
  private def purgeExpired(): Unit = {
    val now = clock()
    broadcasts.filterInPlace((_, st) => st.expiration > now)
    blobs.filterInPlace((_, v) => v._2 > now)
  }

  /** Create a broadcast with no initial episode — the reference's POST
    * without `?episode=` (lib.rs:110-121: the body is ignored and the
    * manifest starts with an empty episode list).
    */
  def postEmpty(): (Gid, String, Long) = synchronized {
    purgeExpired()
    val bid = Gid.random()
    val token = Gid.random().toString
    val expiration = clock() + BroadcastTtlMs
    broadcasts(bid) = new State(token, expiration)
    (bid, token, expiration)
  }

  def post(blob: ExportBlob, episodeTs: Long): (Gid, String, Long) = synchronized {
    val (bid, token, expiration) = postEmpty()
    broadcasts(bid).episodes += episodeTs
    blobs((bid, episodeTs)) = (blob, expiration + EpisodeKeepAliveMs)
    (bid, token, expiration)
  }

  /** Append/overwrite an episode. Returns (expiration, isNew). The
    * expiration is FIXED at creation — the reference re-puts the
    * manifest with its original expiration (lib.rs:152-168), so
    * activity does not extend a broadcast's life; `isNew` drives the
    * service's 201-created vs 200-ok status split.
    */
  def putEpisode(bid: Gid, token: String, episodeTs: Long, blob: ExportBlob): (Long, Boolean) = synchronized {
    val st = liveState(bid).getOrElse(throw new NoSuchElementException(s"broadcast $bid"))
    require(st.token == token, "invalid broadcast token")
    val isNew = !st.episodes.contains(episodeTs)
    st.episodes += episodeTs
    blobs((bid, episodeTs)) = (blob, st.expiration + EpisodeKeepAliveMs)
    (st.expiration, isNew)
  }

  def put(bid: Gid, token: String, episodeTs: Long, blob: ExportBlob): Long =
    putEpisode(bid, token, episodeTs, blob)._1

  def episodeTimestamps(bid: Gid): Vector[Long] = synchronized {
    liveState(bid).map(_.episodes.toVector).getOrElse(Vector.empty)
  }

  /** Live-manifest episode list: None for unknown/expired (wire 404),
    * Some — possibly empty — for a live broadcast (wire 200): a
    * DELETEd broadcast is a live manifest with an empty list.
    */
  def episodeList(bid: Gid): Option[Vector[Long]] = synchronized {
    liveState(bid).map(_.episodes.toVector)
  }

  def episode(bid: Gid, ts: Long): ExportBlob = synchronized {
    // direct blob fetch, no manifest liveness check: blobs serve for
    // EpisodeKeepAliveMs past the manifest and survive DELETE, exactly
    // like the reference's per-blob KV entries (lib.rs:191-199)
    blobs.get((bid, ts)).filter(_._2 > clock()).map(_._1)
      .getOrElse(throw new NoSuchElementException(s"episode $bid/$ts"))
  }

  def delete(bid: Gid, token: String): Unit = synchronized {
    val st = liveState(bid).getOrElse(throw new NoSuchElementException(s"broadcast $bid"))
    require(st.token == token, "invalid broadcast token")
    st.episodes.clear()
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
