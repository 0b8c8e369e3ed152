package graft

import graft.ops.GzipStream
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** RFC 1952 member-stream codec: multi-member identity, every optional
  * header field, checksum/trailer validation, and the fail-loudly
  * contract under corruption — including streams produced by the
  * JDK's own GZIPOutputStream (foreign-encoder leg) and decoded by the
  * JDK's GZIPInputStream (foreign-decoder leg).
  */
class GzipSpec extends AnyFunSuite {

  test("multi-member round-trip is the identity for every member-count class") {
    // lengths covering members = 1, 2, 3 and the empty payload
    Seq(0, 1, 2, 3, 4, 5, 99, 100, 101, 500).foreach { n =>
      val src = Array.tabulate(n)(i => ((i * 37 + 11) % 256).toByte)
      val blob = GzipStream.encodeGzipMembers(src)
      val (members, out) = GzipStream.decodeGzipMembers(blob)
      assert(members == 1 + n % 3, s"len $n")
      assert(java.util.Arrays.equals(out, src), s"len $n payload")
    }
  }

  test("optional header fields (FEXTRA/FNAME/FHCRC) all occur and all parse") {
    // variants l+i cover all residues: some member in this length
    // range carries each flag
    val src = Array.tabulate(120)(i => (i % 251).toByte)
    val blob = GzipStream.encodeGzipMembers(src)
    val (members, out) = GzipStream.decodeGzipMembers(blob)
    assert(members == 1)
    assert(java.util.Arrays.equals(out, src))
    // and across a spread of lengths, decode stays the identity
    (100 to 130).foreach { n =>
      val s2 = Array.tabulate(n)(i => ((i * 7) % 256).toByte)
      val (_, o2) = GzipStream.decodeGzipMembers(GzipStream.encodeGzipMembers(s2))
      assert(java.util.Arrays.equals(o2, s2), s"len $n")
    }
  }

  test("JDK GZIPOutputStream streams (incl. concatenated members) decode exact") {
    val rnd = new Random(1952)
    (0 until 20).foreach { _ =>
      val parts = (0 until 1 + rnd.nextInt(3)).map(_ =>
        Array.fill(rnd.nextInt(400))(rnd.nextInt(256).toByte))
      val out = new java.io.ByteArrayOutputStream()
      parts.foreach { p =>
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(p); gz.finish()
      }
      val (members, got) = GzipStream.decodeGzipMembers(out.toByteArray)
      assert(members == parts.length)
      assert(java.util.Arrays.equals(got, parts.toArray.flatten))
    }
  }

  test("this codec's streams decode exact under the JDK's GZIPInputStream") {
    val rnd = new Random(8191)
    (0 until 20).foreach { _ =>
      val src = Array.fill(1 + rnd.nextInt(500))(rnd.nextInt(256).toByte)
      val blob = GzipStream.encodeGzipMembers(src)
      // GZIPInputStream handles member concatenation natively
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(blob))
      val got = in.readAllBytes()
      assert(java.util.Arrays.equals(got, src))
    }
  }

  test("corrupt payload CRC fails loudly") {
    val src = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val blob = GzipStream.encodeGzipMembers(src)
    // flip a bit in the trailer CRC32 (last 8 bytes = CRC + ISIZE)
    val m = blob.clone()
    m(m.length - 8) = (m(m.length - 8) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException](GzipStream.decodeGzipMembers(m))
    assert(e.getMessage.contains("CRC32"))
  }

  test("wrong ISIZE fails loudly") {
    val src = "payload".getBytes("UTF-8")
    val blob = GzipStream.encodeGzipMembers(src)
    val m = blob.clone()
    m(m.length - 4) = (m(m.length - 4) ^ 0x10).toByte
    val e = intercept[IllegalArgumentException](GzipStream.decodeGzipMembers(m))
    assert(e.getMessage.contains("ISIZE"))
  }

  test("truncation anywhere fails loudly") {
    val src = Array.tabulate(300)(i => (i % 256).toByte)
    val blob = GzipStream.encodeGzipMembers(src)
    (1 until blob.length).foreach { cut =>
      intercept[IllegalArgumentException](
        GzipStream.decodeGzipMembers(java.util.Arrays.copyOf(blob, cut)))
    }
  }

  test("trailing garbage fails loudly (it must parse as a next member)") {
    val src = "clean stream".getBytes("UTF-8")
    val blob = GzipStream.encodeGzipMembers(src)
    val m = java.util.Arrays.copyOf(blob, blob.length + 3)
    m(blob.length) = 0x00
    intercept[IllegalArgumentException](GzipStream.decodeGzipMembers(m))
  }

  test("reserved FLG bits are rejected") {
    val src = "flags".getBytes("UTF-8")
    val blob = GzipStream.encodeGzipMembers(src)
    val m = blob.clone()
    m(3) = (m(3) | 0x80).toByte // set a reserved bit
    val e = intercept[IllegalArgumentException](GzipStream.decodeGzipMembers(m))
    assert(e.getMessage.contains("reserved"))
  }

  test("FHCRC mismatch is rejected") {
    // length 99 → members=1, variant 99: no FHCRC; length 102 → variant
    // 102 % 3 == 0 → FHCRC present. Corrupt a header byte the CRC16
    // covers (the OS byte) on such a stream.
    val src = Array.tabulate(102)(i => (i % 256).toByte)
    val blob = GzipStream.encodeGzipMembers(src)
    val m = blob.clone()
    m(9) = (m(9) ^ 0x01).toByte // OS byte, covered by FHCRC
    val e = intercept[IllegalArgumentException](GzipStream.decodeGzipMembers(m))
    assert(e.getMessage.contains("FHCRC"))
  }
}
