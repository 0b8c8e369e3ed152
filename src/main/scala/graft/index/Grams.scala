package graft.index

/** Byte-4-gram tokenization, the reference's index unit
  * (assemblage_db/src/index.rs:826-835): the UTF-8 bytes are padded with
  * 3 zero bytes on each side and every 4-byte window becomes one
  * big-endian u32 gram — `len(bytes) + 3` grams per string. General
  * enough to find overlaps between arbitrary byte sequences
  * (assemblage_db/src/lib.rs:47-53).
  */
object Grams {

  /** index.rs:826-835. Grams carried as Int (bit-identical to u32). */
  def indexText(s: String): Array[Int] = {
    val bytes = s.getBytes("UTF-8")
    val padded = new Array[Byte](bytes.length + 6)
    System.arraycopy(bytes, 0, padded, 3, bytes.length)
    val out = new Array[Int](bytes.length + 3)
    var i = 0
    while (i < out.length) {
      out(i) = ((padded(i) & 0xff) << 24) | ((padded(i + 1) & 0xff) << 16) |
        ((padded(i + 2) & 0xff) << 8) | (padded(i + 3) & 0xff)
      i += 1
    }
    out
  }

  /** Chain combination (index.rs:721-744): the accumulated sequence's
    * last 3 grams are OR-overlaid with the next child's first 3 grams,
    * then the rest is appended — so concatenated text indexes exactly
    * like contiguous text.
    */
  def chainCombine(children: Seq[Array[Int]]): Array[Int] = {
    var acc = Array(0, 0, 0)
    for (grams <- children) {
      val accLen = acc.length
      var i = 0
      while (i < 3) {
        acc(accLen - 3 + i) |= (if (i < grams.length) grams(i) else 0)
        i += 1
      }
      acc = acc ++ grams.drop(3)
    }
    acc
  }

  /** Grams of a child that closes a cycle (index.rs:683). */
  val cyclicGrams: Array[Int] = Array(0, 0, 0)
  /** Grams stored for a Page list / Styled-block node itself (index.rs:750). */
  val blockBoundaryGrams: Array[Int] = Array(0, 0, 0)

  /** Search-term end trim (index.rs:195-200): up to 3 partial boundary
    * grams are dropped from each end, bounded by (len-1)/2.
    */
  def trimForSearch(grams: Array[Int]): Array[Int] = {
    if (grams.isEmpty) return grams
    val drop = math.min((grams.length - 1) / 2, 3)
    grams.slice(drop, grams.length - drop)
  }

  /** Multiset histogram of a gram sequence. */
  def occurrences(grams: Array[Int]): Map[Int, Int] =
    grams.groupBy(identity).map { case (g, a) => g -> a.length }
}
