package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native kernels for the document-fingerprint column
  * (TextAnalysis.fingerprints). Both replace interpreted Catalyst
  * higher-order pipelines that re-evaluated per element:
  *
  *   - PolyHash ≡ aggregate(transform(sequence(1, len), i →
  *     ascii(substr(text, i, 1))), 0, (acc, x) → (acc*31 + x) mod 1e9+7)
  *   - MinWindowHash ≡ array_min(transform(sequence(1, len-7), i →
  *     conv(substr(md5(substr(text, i, 8)), 1, 15), 16, 10)))
  *
  * Bit-identical results (same arithmetic, same md5-prefix value — the
  * first 15 hex chars of a digest are its first 8 bytes shifted right
  * one nibble), ~10× cheaper (one MessageDigest, no per-window hex
  * strings, no lambda interpretation).
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"
  override protected def nullSafeEval(input: Any): Any =
    PolyHash.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.PolyHash.compute($c);")
  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val Mod = 1000000007L

  def compute(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      acc = (acc * 31 + str.charAt(i).toInt) % Mod
      i += 1
    }
    acc
  }

  val functionName: FunctionIdentifier = FunctionIdentifier("graft_poly_hash")
  val info: ExpressionInfo = new ExpressionInfo(classOf[PolyHash].getCanonicalName, "graft_poly_hash")
  val builder: Seq[Expression] => Expression = c => PolyHash(Cast(c.head, StringType))
}

case class MinWindowHash(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_min_window_hash"
  // CodegenFallback: the per-window md5 loop dominates; one virtual
  // call per row is noise. Result is null for short strings, so the
  // non-null-safe fallback path is the correct shape.
  override def nullSafeEval(input: Any): Any =
    MinWindowHash.compute(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): MinWindowHash =
    copy(child = newChild)
}

object MinWindowHash {
  val Width = 8

  /** Min over all 8-char-window md5-prefix hashes; null for texts
    * shorter than the window.
    */
  def compute(s: UTF8String): java.lang.Long = {
    val str = s.toString
    val n = str.length
    if (n < Width) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    var min = Long.MaxValue
    var i = 0
    while (i <= n - Width) {
      md.reset()
      val bytes = str.substring(i, i + Width).getBytes("UTF-8")
      val d = md.digest(bytes)
      // first 15 hex chars == first 8 bytes >>> 4 (drop the last nibble)
      val h = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
        ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      if (h < min) min = h
      i += 1
    }
    min
  }

  val functionName: FunctionIdentifier = FunctionIdentifier("graft_min_window_hash")
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[MinWindowHash].getCanonicalName, "graft_min_window_hash")
  val builder: Seq[Expression] => Expression = c => MinWindowHash(Cast(c.head, StringType))
}

/** All character-window hashes of a text at stride 1: the candidate
  * stream for exact-substring repetition analysis
  * (Dedup.exactSubstrRepeats). A Rabin–Karp ROLLING double-polynomial
  * hash: two independent mod-prime states (bases 31/131, moduli
  * 1e9+7 / 998244353) packed as h1·2³² + h2 — O(1) per position where
  * a per-window digest (the md5 form this replaced) is O(width), a
  * ~7× kernel win at the 10× scale leg. Both folds are plain integer
  * mod arithmetic over UNICODE CODE POINTS (surrogate pairs decoded
  * first), so the DuckDB oracle — ord()/substr/len are all
  * code-point-based — reproduces them bit-for-bit on ANY input, not
  * just the BMP, and window counts agree with Spark's length().
  *
  * Collision budget, honestly: expected colliding pairs ≈ n²/2M over
  * the ~2⁵⁹ packed space — ~10⁻⁶ of windows at 10⁹ windows, and at a
  * full 100 TB corpus (~10¹⁴ windows) ≈ 10¹⁰ pairs, i.e. a ~10⁻⁴
  * RELATIVE error on repeated-window mass. Fine for contamination
  * metrics (q96/q97/q99 are per-mille statistics); a pipeline needing
  * exact spans at that scale should run two independent instances of
  * this kernel (different base pairs) and intersect — the same
  * list_reduce oracle extends to the second pair.
  */
case class WindowHashes(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_window_hashes"
  // CodegenFallback: the O(1)-per-position rolling fold dominates row
  // overhead — the eval cost is the codepoint decode plus the result
  // array build, so one virtual call per row is noise (same rationale
  // as MinWindowHash).
  override def nullSafeEval(text: Any, width: Any): Any =
    WindowHashes.compute(text.asInstanceOf[UTF8String], width.asInstanceOf[Int])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WindowHashes =
    copy(left = newLeft, right = newRight)
}

object WindowHashes {
  final val Mod1 = 1000000007L
  final val Mod2 = 998244353L
  final val Base1 = 31L
  final val Base2 = 131L

  /** Hashes of every `width`-char window; empty for shorter texts.
    * Fold semantics per window (identical in the DuckDB oracle):
    * h1 = fold(0, (acc, c) → (acc·31 + c) mod 1e9+7), h2 likewise with
    * base 131 mod 998244353; value = h1·2³² + h2. The loop maintains
    * both folds incrementally (subtract the outgoing char's
    * base^(width-1) term, multiply, add the incoming char).
    */
  def compute(s: UTF8String, width: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    // Code-point decode: windows are `width` CODE POINTS, and the fold
    // consumes code-point values — identical to the oracle's
    // ord(substr(...)) and to Spark's length() (numChars) semantics,
    // so supplementary-plane text neither breaks the
    // n_windows-from-length shortcut nor diverges from the oracle.
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < width)
      return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array.empty[Long])
    // base^(width-1) mod M for the outgoing-char term
    var pw1 = 1L; var pw2 = 1L
    var k = 1
    while (k < width) { pw1 = pw1 * Base1 % Mod1; pw2 = pw2 * Base2 % Mod2; k += 1 }
    val out = new Array[Long](n - width + 1)
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < width) {
      val c = cps(i).toLong
      h1 = (h1 * Base1 + c) % Mod1
      h2 = (h2 * Base2 + c) % Mod2
      i += 1
    }
    out(0) = (h1 << 32) + h2
    var p = 1
    while (p <= n - width) {
      val cOut = cps(p - 1).toLong
      val cIn = cps(p + width - 1).toLong
      h1 = ((h1 - cOut * pw1 % Mod1 + Mod1) % Mod1 * Base1 + cIn) % Mod1
      h2 = ((h2 - cOut * pw2 % Mod2 + Mod2) % Mod2 * Base2 + cIn) % Mod2
      out(p) = (h1 << 32) + h2
      p += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  val functionName: FunctionIdentifier = FunctionIdentifier("graft_window_hashes")
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[WindowHashes].getCanonicalName, "graft_window_hashes")
  val builder: Seq[Expression] => Expression =
    c => WindowHashes(Cast(c.head, StringType), Cast(c(1), org.apache.spark.sql.types.IntegerType))
}

/** Winnowed window fingerprints — the exact-substring pass's 100 TB
  * scale path (Dedup.exactSubstrRepeatsStrided, q106): instead of
  * emitting every width-char window hash, emit the hash at each
  * DISTINCT leftmost-argmin position over the sliding stride-window of
  * [[WindowHashes]]' rolling hashes (Schleimer/Wilkerson/Aiken
  * winnowing, SIGMOD'03). Selection depends only on the hash sequence
  * — i.e. on CONTENT — so two copies of a repeated substring select
  * the same fingerprints regardless of their byte offsets, which is
  * why a naive "every S-th window" stride cannot work (misaligned
  * copies sample different windows) and this can: every repeat of
  * length ≥ width + stride − 1 spans a full stride-window of hashes in
  * both copies, and that window's minimum is selected in both. Row
  * stream shrinks to ~2/(stride+1) of the window count.
  * CodegenFallback: same rationale as [[WindowHashes]] — the O(1)
  * amortized deque fold dominates row overhead.
  */
case class WinnowedHashes(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnowed_hashes"
  override def nullSafeEval(text: Any, width: Any, stride: Any): Any =
    WinnowedHashes.compute(text.asInstanceOf[UTF8String],
      width.asInstanceOf[Int], stride.asInstanceOf[Int])
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): WinnowedHashes =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object WinnowedHashes {
  /** One hash per distinct selected position: for every full
    * stride-window of consecutive window hashes (starts j = 0 ..
    * max(m − stride, 0); the lone window of an m < stride text is its
    * clipped prefix), the LEFTMOST minimal hash position is selected;
    * consecutive windows sharing an argmin emit once. Equal hash
    * values at different positions are genuinely repeated content and
    * are all kept — multiplicity semantics survive sampling. Monotonic
    * deque (pop strictly-greater from the back, so ties keep the
    * earlier index at the front), O(m) total.
    */
  def compute(s: UTF8String, width: Int, stride: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    // Loud guard at the kernel, not just the operator wrapper:
    // graft_winnowed_hashes is a registered SQL function, and a direct
    // call with stride <= 0 would read an uninitialized deque slot and
    // silently return garbage fingerprints (round-8 advice).
    require(width >= 1, s"width must be >= 1 (got $width)")
    require(stride >= 1, s"stride must be >= 1 (got $stride)")
    val hashes = WindowHashes.compute(s, width)
    val m = hashes.numElements()
    if (m == 0)
      return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array.empty[Long])
    val h = hashes.toLongArray()
    val lastStart = math.max(m - stride, 0)
    val idx = new Array[Int](m) // deque of candidate argmin indices
    var head = 0; var tail = 0  // [head, tail)
    val out = new Array[Long](math.min(m, lastStart + 1))
    var nOut = 0
    var lastSel = -1
    var p = 0
    var j = 0
    while (j <= lastStart) {
      val windowEnd = math.min(j + stride - 1, m - 1)
      while (p <= windowEnd) {
        while (tail > head && h(idx(tail - 1)) > h(p)) tail -= 1
        idx(tail) = p; tail += 1
        p += 1
      }
      while (idx(head) < j) head += 1
      val sel = idx(head)
      if (sel != lastSel) {
        out(nOut) = h(sel); nOut += 1
        lastSel = sel
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      java.util.Arrays.copyOf(out, nOut))
  }

  val functionName: FunctionIdentifier = FunctionIdentifier("graft_winnowed_hashes")
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[WinnowedHashes].getCanonicalName, "graft_winnowed_hashes")
  val builder: Seq[Expression] => Expression = c =>
    WinnowedHashes(Cast(c.head, StringType),
      Cast(c(1), org.apache.spark.sql.types.IntegerType),
      Cast(c(2), org.apache.spark.sql.types.IntegerType))
}

object TextHashes {
  /** Idempotent per-session registration of the fingerprint kernels. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(PolyHash.functionName))
      registry.registerFunction(PolyHash.functionName, PolyHash.info, PolyHash.builder)
    if (!registry.functionExists(MinWindowHash.functionName))
      registry.registerFunction(MinWindowHash.functionName, MinWindowHash.info, MinWindowHash.builder)
    if (!registry.functionExists(WindowHashes.functionName))
      registry.registerFunction(WindowHashes.functionName, WindowHashes.info, WindowHashes.builder)
    if (!registry.functionExists(WinnowedHashes.functionName))
      registry.registerFunction(
        WinnowedHashes.functionName, WinnowedHashes.info, WinnowedHashes.builder)
  }
}
