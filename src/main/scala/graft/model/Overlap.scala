package graft.model

/** Similarity-search result with u8-quantized relative sizes, exactly
  * mirroring the reference's integer math (assemblage_db/src/data.rs:510-596):
  * a = 255*source/max, b = 255*match/max, intersection = 255*inter/max
  * (all integer division); score = intersection / min(a, b) in Float.
  */
final case class Overlap(id: Gid, a: Int, b: Int, intersection: Int) {
  def score: Float = intersection.toFloat / math.min(a, b).toFloat
  def sourceSize: Float = a.toFloat / 255.0f
  def matchSize: Float = b.toFloat / 255.0f
  def intersectionSize: Float = intersection.toFloat / 255.0f
  /** Same intersection, source/match sizes swapped (data.rs:570-579). */
  def reverse(newId: Gid): Overlap = Overlap(newId, a = b, b = a, intersection = intersection)
}

object Overlap {
  /** data.rs:521-529 — u32 integer division then u8 narrow. */
  def create(id: Gid, sourceCount: Long, matchCount: Long, intersection: Long): Overlap = {
    val maxCount = math.max(sourceCount, matchCount)
    Overlap(
      id,
      a = (255L * sourceCount / maxCount).toInt,
      b = (255L * matchCount / maxCount).toInt,
      intersection = (255L * intersection / maxCount).toInt)
  }

  /** Result ordering: intersection desc, then a desc, then b desc
    * (data.rs:582-596).
    */
  implicit val ordering: Ordering[Overlap] =
    Ordering.by((o: Overlap) => (-o.intersection, -o.a, -o.b))
}
