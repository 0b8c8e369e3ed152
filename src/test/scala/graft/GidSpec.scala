package graft

import graft.model.Gid
import org.scalatest.funsuite.AnyFunSuite

/** Gid (UUID) semantics: XOR namespacing, byte/string roundtrips,
  * unsigned ordering (reference: data.rs:59-74, index.rs:653-655).
  */
class GidSpec extends AnyFunSuite {

  test("xor is self-inverse and nil-neutral") {
    val a = Gid.random()
    val ns = Gid.random()
    assert(a.xor(ns).xor(ns) === a)
    assert(a.xor(Gid.root) === a)
    assert(a.xor(a) === Gid.root)
  }

  test("bytes and string roundtrips") {
    val a = Gid.random()
    assert(Gid.fromBytes(a.bytes) === a)
    assert(Gid.parse(a.toString) === a)
    assert(a.bytes.length === 16)
  }

  test("root is the nil uuid") {
    assert(Gid.root.toString === "00000000-0000-0000-0000-000000000000")
    assert(Gid.root.isRoot)
    assert(!Gid.random().isRoot)
  }

  test("ordering is unsigned on both halves") {
    val neg = Gid(-1L, 0L) // high bit set = largest unsigned
    val pos = Gid(1L, 0L)
    assert(neg > pos)
    assert(Gid(0L, -1L) > Gid(0L, Long.MaxValue))
  }
}
