package graft

import graft.core.{MonotonicClock, SlotStore}
import org.scalatest.funsuite.AnyFunSuite

/** Versioned-store semantics mirrored from assemblage_kv tests
  * (basics.rs trash reads, transactions.rs merge persistence).
  */
class StoreSpec extends AnyFunSuite {

  test("get returns latest version; versions keep full history") {
    val s = new SlotStore[String, Int]
    s.append("k", 1, ts = 1)
    s.append("k", 2, ts = 2)
    assert(s.get("k") === Some(2))
    assert(s.versions("k").map(_.value) === Vector(1, 2))
  }

  test("remove tombstones but get_unremoved still reads from trash") {
    val s = new SlotStore[String, Int]
    s.append("k", 42, ts = 1)
    s.remove("k", ts = 2)
    assert(s.get("k") === None)
    assert(s.getUnremoved("k") === Some(42))
    assert(!s.liveKeys.contains("k"))
  }

  test("re-append after remove restores liveness") {
    val s = new SlotStore[String, Int]
    s.append("k", 1, ts = 1)
    s.remove("k", ts = 2)
    s.append("k", 3, ts = 3)
    assert(s.get("k") === Some(3))
    assert(s.liveKeys.toSeq === Seq("k"))
  }

  test("merge purges history and trash, keeps latest live versions") {
    val s = new SlotStore[String, Int]
    s.append("a", 1, ts = 1)
    s.append("a", 2, ts = 2)
    s.append("b", 9, ts = 3)
    s.remove("b", ts = 4)
    s.merge()
    assert(s.get("a") === Some(2))
    assert(s.versions("a").length === 1)
    assert(s.versions("b").isEmpty)
    assert(s.getUnremoved("b") === None) // trash emptied
  }

  test("lastUpdated is the max version timestamp") {
    val s = new SlotStore[String, Int]
    assert(s.lastUpdated === None)
    s.append("a", 1, ts = 5)
    s.remove("a", ts = 9)
    assert(s.lastUpdated === Some(9))
  }

  test("MonotonicClock is strictly increasing") {
    val c = new MonotonicClock
    val ts = (1 to 100).map(_ => c.now())
    assert(ts === ts.sorted && ts.distinct.length === 100)
  }
}
