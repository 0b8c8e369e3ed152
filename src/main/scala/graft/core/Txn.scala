package graft.core

import scala.collection.mutable

/** Transaction conflict (reference: Error::TransactionConflict). */
final class TxnConflict extends RuntimeException("transaction conflict")

/** Serializable optimistic transactions over a slot store, mirroring
  * the reference's snapshot semantics (assemblage_kv/src/lib.rs:286-323,
  * 528-546): reads are cached (and record the key's version height);
  * writes buffer in memory and are only applied on commit; commit fails
  * with [[TxnConflict]] if any key this transaction READ was overwritten
  * by another commit in the meantime — including keys read as absent
  * (write-after-read-of-missing conflicts too, transactions.rs:492-537).
  *
  * In the distributed engine the same protocol guards the single-writer
  * commit of the parquet slot tables: the "version height" is the table
  * snapshot id, and the conflict check is compare-and-swap on the
  * manifest.
  */
final class Txn[K, V](store: SlotStore[K, V], clock: MonotonicClock) {
  private val readHeights = mutable.HashMap.empty[K, Int]
  private val readCache = mutable.HashMap.empty[K, Option[V]]
  private val writes = mutable.LinkedHashMap.empty[K, Option[V]]
  private var done = false

  private def liveRead(k: K): Option[V] =
    readCache.getOrElseUpdate(k, {
      readHeights(k) = store.versions(k).length
      store.get(k)
    })

  /** Read through own writes, then the cached snapshot. */
  def get(k: K): Option[V] = writes.get(k) match {
    case Some(w) => w
    case None    => liveRead(k)
  }

  def insert(k: K, v: V): Unit = { require(!done); writes(k) = Some(v) }
  def remove(k: K): Unit = { require(!done); writes(k) = None }

  /** Apply buffered writes atomically; conflict if any read key gained
    * versions since it was read. All writes carry ONE commit timestamp
    * (the reference's group-commit entry, timestamps.rs:163-186).
    */
  def commit(): Unit = {
    require(!done, "transaction already finished")
    done = true
    val conflicted = readHeights.exists { case (k, h) => store.versions(k).length != h }
    if (conflicted) throw new TxnConflict
    val ts = clock.now()
    writes.foreach {
      case (k, Some(v)) => store.append(k, v, ts)
      case (k, None)    => store.remove(k, ts)
    }
  }

  /** Discard buffered writes (kv abort). */
  def abort(): Unit = done = true
}

object Txn {
  def begin[K, V](store: SlotStore[K, V], clock: MonotonicClock): Txn[K, V] =
    new Txn(store, clock)
}
