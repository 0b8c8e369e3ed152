package graft.core

import graft.model.Gid

import scala.collection.mutable

/** Reverse edge: this node is child number `index` of parent `id`
  * (reference: assemblage_db/src/data.rs:490-508).
  */
final case class Parent(id: Gid, index: Int)

/** One stored version of a key: tombstones ("trash") keep the previous
  * value readable (assemblage_kv/src/lib.rs:955-976).
  */
final case class Version[+V](value: V, isRemoved: Boolean, ts: Long)

/** Monotonic ms clock guarding against regression
  * (assemblage_kv/src/timestamp.rs:36-38); strictly increasing per call
  * so commit timestamps are unique and deterministic to order by.
  */
final class MonotonicClock {
  private var last = 0L
  def now(): Long = synchronized {
    val t = math.max(System.currentTimeMillis(), last + 1)
    last = t
    t
  }
}

/** In-memory versioned key directory for one slot — the serving-path
  * analog of the reference's log + in-memory directory
  * (assemblage_kv/src/lib.rs:170-175, 602-652). Bulk state lives in the
  * versioned DataFrame tables (graft.bulk); this store backs the
  * driver-orchestrated OLTP path and is the executable spec the bulk
  * pipelines are tested against.
  */
final class SlotStore[K, V] {
  private[core] val data = mutable.HashMap.empty[K, Vector[Version[V]]]

  def versions(k: K): Vector[Version[V]] = data.getOrElse(k, Vector.empty)
  def latestVersion(k: K): Option[Version[V]] = versions(k).lastOption

  /** Latest value unless tombstoned (kv get, lib.rs:337-344). */
  def get(k: K): Option[V] = latestVersion(k).collect { case Version(v, false, _) => v }

  /** Latest non-tombstone version — reads "from the trash"
    * (kv get_unremoved, lib.rs:355-363).
    */
  def getUnremoved(k: K): Option[V] =
    versions(k).reverseIterator.collectFirst { case Version(v, false, _) => v }

  def append(k: K, v: V, ts: Long): Unit =
    data(k) = versions(k) :+ Version(v, isRemoved = false, ts)

  /** Tombstone write ("move to trash", kv remove lib.rs:505-512): keeps
    * the latest value in the version but marks it removed.
    */
  def remove(k: K, ts: Long): Unit = versions(k).lastOption.foreach { last =>
    data(k) = versions(k) :+ Version(last.value, isRemoved = true, ts)
  }

  /** All keys whose latest version is live (kv keys, lib.rs:449-465). */
  def liveKeys: Iterator[K] =
    data.iterator.collect { case (k, vs) if !vs.last.isRemoved => k }

  /** Every key ever written, trash included (the version directory's
    * full key set — what a bulk snapshot of the slot contains).
    */
  def allKeys: Iterator[K] = data.keysIterator

  def lastUpdated: Option[Long] =
    if (data.isEmpty) None else Some(data.valuesIterator.map(_.last.ts).max)

  /** Compaction (kv merge, lib.rs:233-277): rewrite only latest live
    * versions, purging history and trash.
    */
  def merge(): Unit = {
    val compacted = data.iterator.collect {
      case (k, vs) if !vs.last.isRemoved => k -> Vector(vs.last)
    }.toVector
    data.clear()
    data ++= compacted
  }
}
