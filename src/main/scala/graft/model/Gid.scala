package graft.model

import java.nio.ByteBuffer
import java.util.UUID

/** Node id: a UUID v4 carried as (hi, lo) longs; nil UUID is the root
  * (reference: assemblage_db/src/data.rs:59-74).
  *
  * In DataFrames ids are 16-byte BinaryType columns; driver-side code
  * uses this value type. XOR namespacing for imports mirrors
  * assemblage_db/src/index.rs:653-655.
  */
final case class Gid(hi: Long, lo: Long) extends Ordered[Gid] {
  def xor(other: Gid): Gid = Gid(hi ^ other.hi, lo ^ other.lo)
  def isRoot: Boolean = hi == 0L && lo == 0L
  def bytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(hi); bb.putLong(lo)
    bb.array()
  }
  def uuid: UUID = new UUID(hi, lo)
  override def toString: String = uuid.toString
  override def compare(that: Gid): Int = {
    val c = java.lang.Long.compareUnsigned(hi, that.hi)
    if (c != 0) c else java.lang.Long.compareUnsigned(lo, that.lo)
  }
}

object Gid {
  val root: Gid = Gid(0L, 0L)
  def random(): Gid = fromUuid(UUID.randomUUID())
  def fromUuid(u: UUID): Gid = Gid(u.getMostSignificantBits, u.getLeastSignificantBits)
  def fromBytes(b: Array[Byte]): Gid = {
    require(b.length == 16, s"id must be 16 bytes, got ${b.length}")
    val bb = ByteBuffer.wrap(b)
    Gid(bb.getLong(), bb.getLong())
  }
  def parse(s: String): Gid = fromUuid(UUID.fromString(s))
}
