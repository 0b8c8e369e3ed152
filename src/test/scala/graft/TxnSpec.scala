package graft

import graft.core.{MonotonicClock, SlotStore, Txn, TxnConflict}
import org.scalatest.funsuite.AnyFunSuite

/** Ported from assemblage_kv/tests/transactions.rs:385-537 — optimistic
  * serializable commit semantics.
  */
class TxnSpec extends AnyFunSuite {

  private def fixture() = (new SlotStore[String, Int], new MonotonicClock)

  test("concurrent transactions without conflict (disjoint keys)") {
    val (store, clock) = fixture()
    val t0 = Txn.begin(store, clock)
    t0.insert("foo", 0)
    t0.insert("bar", 0)
    t0.commit()

    val t1 = Txn.begin(store, clock)
    val valFoo = t1.get("foo").get

    val t2 = Txn.begin(store, clock)
    val valBar = t2.get("bar").get
    t2.insert("bar", valBar + 10)
    t2.commit()

    t1.insert("foo", valFoo + 1)
    t1.commit() // t2 touched a different key → no conflict

    assert(store.get("foo") === Some(1))
    assert(store.get("bar") === Some(10))
    store.merge()
    assert(store.get("foo") === Some(1))
    assert(store.get("bar") === Some(10))
  }

  test("concurrent transactions with conflict (same key)") {
    val (store, clock) = fixture()
    val t0 = Txn.begin(store, clock)
    t0.insert("foo", 0)
    t0.commit()

    val t1 = Txn.begin(store, clock)
    val valFoo = t1.get("foo").get

    val t2 = Txn.begin(store, clock)
    t2.insert("foo", t2.get("foo").get + 10)
    t2.commit()

    t1.insert("foo", valFoo + 1)
    assertThrows[TxnConflict](t1.commit())

    // the losing write is not applied; a retry sees the winner's value
    val t3 = Txn.begin(store, clock)
    assert(t3.get("foo") === Some(10))
    t3.insert("foo", t3.get("foo").get + 1)
    t3.commit()
    assert(store.get("foo") === Some(11))
    store.merge()
    assert(store.get("foo") === Some(11))
  }

  test("reading an absent key conflicts with a concurrent first write") {
    val (store, clock) = fixture()
    val t1 = Txn.begin(store, clock)
    val valFoo = t1.get("foo").getOrElse(0)

    val t2 = Txn.begin(store, clock)
    t2.insert("foo", t2.get("foo").getOrElse(0) + 10)
    t2.commit()

    t1.insert("foo", valFoo + 1)
    assertThrows[TxnConflict](t1.commit())
    assert(store.get("foo") === Some(10))
  }

  test("a transaction's writes share one commit timestamp") {
    val (store, clock) = fixture()
    val t = Txn.begin(store, clock)
    t.insert("a", 1)
    t.insert("b", 2)
    t.insert("c", 3)
    t.commit()
    val stamps = Seq("a", "b", "c").map(k => store.versions(k).last.ts)
    assert(stamps.head > 0)
    assert(stamps.distinct.length === 1)
  }

  test("version history keeps tombstones until merge (kv get_versions)") {
    val (store, clock) = fixture()
    def commitOne(f: Txn[String, Int] => Unit): Unit = {
      val t = Txn.begin(store, clock); f(t); t.commit()
    }
    commitOne(_.insert("key foo", 1))
    commitOne(_.insert("key foo", 2))
    commitOne(_.remove("key foo"))
    commitOne(_.insert("key foo", 4))

    val versions = store.versions("key foo")
    assert(versions.length === 4)
    assert(versions.map(v => if (v.isRemoved) None else Some(v.value)) ===
      Vector(Some(1), Some(2), None, Some(4)))
    assert(versions.map(_.ts) === versions.map(_.ts).sorted)

    store.merge()
    assert(store.versions("key foo").length === 1)
    assert(store.get("key foo") === Some(4))
  }

  test("lastUpdated tracks the latest commit timestamp") {
    val (store, clock) = fixture()
    assert(store.lastUpdated === None)
    val t = Txn.begin(store, clock)
    t.insert("k", 1)
    t.commit()
    assert(store.lastUpdated === Some(store.versions("k").last.ts))
  }

  test("abort discards buffered writes") {
    val (store, clock) = fixture()
    val t = Txn.begin(store, clock)
    t.insert("foo", 42)
    t.abort()
    assert(store.get("foo") === None)
  }

  test("reads see own buffered writes and removes") {
    val (store, clock) = fixture()
    val t0 = Txn.begin(store, clock)
    t0.insert("k", 1)
    t0.commit()
    val t = Txn.begin(store, clock)
    assert(t.get("k") === Some(1))
    t.insert("k", 2)
    assert(t.get("k") === Some(2))
    t.remove("k")
    assert(t.get("k") === None)
    t.commit()
    assert(store.get("k") === None)
    assert(store.getUnremoved("k") === Some(1)) // buffered writes are last-write-wins; only the remove applied
  }
}
