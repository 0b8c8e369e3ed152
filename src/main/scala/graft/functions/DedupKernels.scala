package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native kernels for the dedup family. Both replace
  * explode → groupBy pipelines whose aggregate fan-out dominated the
  * suite (60 conditional sums for SimHash, 64 min() aggregates for
  * MinHash — 28 s of a 70 s sf0.1 run):
  *
  *   - SimHash60 ≡ tokens → tf counts → per-bit signed sums →
  *     60-bit fingerprint, previously 2 shuffles + 60 aggregates,
  *     now a single projection (zero shuffles for the fingerprint
  *     phase — the whole doc never leaves its input partition).
  *   - MinHashSig ≡ distinct word k-shingles → md5-based 60-bit hash →
  *     numPerm affine-permutation minima, previously shingle explode +
  *     distinct shuffle + 64-aggregate groupBy, now one projection.
  *
  * Bit-identical to the composed forms (same \S+ tokenization, same
  * md5-prefix hash60, same mod-P affine arithmetic) — parity-tested in
  * DedupKernelsSpec and oracle-checked by q32/q33.
  */
object DedupHash {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit md5-prefix hash: first 15 hex chars of md5(utf8) == first
    * 8 digest bytes big-endian >>> 4. Bit-identical to
    * graft.ops.Hashing.hash60 / hash60Jvm.
    */
  def hash60(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  private val tokenPattern = java.util.regex.Pattern.compile("\\S+")

  /** Whitespace tokens (same regex class as Hashing.tokens). */
  def tokenize(s: String): scala.collection.mutable.ArrayBuffer[String] = {
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    val m = tokenPattern.matcher(s)
    while (m.find()) toks += m.group()
    toks
  }
}

/** 60-bit tf-weighted SimHash of a text column in one pass. Null for
  * token-less docs (they are absent from the composed form's groupBy
  * output — filter nulls to keep parity).
  */
case class SimHash60(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash60"
  // CodegenFallback: one virtual call per row; the per-token md5 loop
  // dominates by orders of magnitude.
  override def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  def compute(s: UTF8String): java.lang.Long = {
    val counts = new java.util.HashMap[String, Long]()
    val toks = DedupHash.tokenize(s.toString)
    var t = 0
    while (t < toks.length) {
      counts.merge(toks(t), 1L, (a, b) => a + b)
      t += 1
    }
    if (counts.isEmpty) return null
    val sums = new Array[Long](60)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h = DedupHash.hash60(e.getKey.getBytes("UTF-8"))
      val cnt: Long = e.getValue
      var b = 0
      while (b < 60) {
        sums(b) += (if (((h >> b) & 1L) == 1L) cnt else -cnt)
        b += 1
      }
    }
    var fp = 0L
    var b = 0
    while (b < 60) {
      if (sums(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  val functionName: FunctionIdentifier = FunctionIdentifier("graft_simhash60")
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[SimHash60].getCanonicalName, "graft_simhash60")
  val builder: Seq[Expression] => Expression = c => SimHash60(Cast(c.head, StringType))
}

/** MinHash signature (numPerm affine-permutation minima over the
  * distinct word k-shingle set) of a text column in one pass. Null for
  * docs with fewer than k tokens (no shingles — absent from the
  * composed form).
  */
case class MinHashSig(child: Expression, k: Int, numPerm: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"
  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String], k, numPerm)
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Same prime as Dedup.MinhashPrime: keeps a*h + b < 2^63. */
  final val Prime = 2147483647L

  /** Affine coefficients, identical derivation to Dedup.minhashCoeffs
    * (md5-based hash60 of "a$i"/"b$i") so signatures are reproducible
    * by any engine with md5.
    */
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  def coeffs(numPerm: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(numPerm, { n =>
      val as = Array.tabulate(n)(i => DedupHash.hash60(s"a$i".getBytes("UTF-8")) % (Prime - 1) + 1)
      val bs = Array.tabulate(n)(i => DedupHash.hash60(s"b$i".getBytes("UTF-8")) % Prime)
      (as, bs)
    })

  def compute(s: UTF8String, k: Int, numPerm: Int): ArrayData = {
    val toks = DedupHash.tokenize(s.toString)
    if (toks.length < k) return null
    val shingles = new java.util.HashSet[String]()
    var i = 0
    while (i <= toks.length - k) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = i + 1
      while (j < i + k) { sb.append(' '); sb.append(toks(j)); j += 1 }
      shingles.add(sb.toString)
      i += 1
    }
    val (as, bs) = coeffs(numPerm)
    val mins = Array.fill(numPerm)(Long.MaxValue)
    val it = shingles.iterator()
    while (it.hasNext) {
      val h = DedupHash.hash60(it.next().getBytes("UTF-8")) % Prime
      var p = 0
      while (p < numPerm) {
        val v = (h * as(p) + bs(p)) % Prime
        if (v < mins(p)) mins(p) = v
        p += 1
      }
    }
    new GenericArrayData(mins)
  }

  val functionName: FunctionIdentifier = FunctionIdentifier("graft_minhash_sig")
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[MinHashSig].getCanonicalName, "graft_minhash_sig")
  /** SQL form: graft_minhash_sig(text, k, numPerm) with literal ints. */
  val builder: Seq[Expression] => Expression = { c =>
    def lit(e: Expression): Int = e.eval().asInstanceOf[Number].intValue()
    MinHashSig(Cast(c.head, StringType), lit(c(1)), lit(c(2)))
  }
}

/** Distinct word k-shingles of a text column in one pass: the
  * per-doc dedup happens in memory inside the kernel, so the
  * inverted-index build needs NO distinct() shuffle (the composed
  * form explodes raw shingles and dedups with a full shuffle). Null
  * for docs with fewer than k tokens — explode drops them for free.
  */
case class ShingleSet(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingle_set"
  override def nullSafeEval(input: Any): Any =
    ShingleSet.compute(input.asInstanceOf[UTF8String], k)
  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

object ShingleSet {
  def compute(s: UTF8String, k: Int): ArrayData = {
    val toks = DedupHash.tokenize(s.toString)
    if (toks.length < k) return null
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= toks.length - k) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = i + 1
      while (j < i + k) { sb.append(' '); sb.append(toks(j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var n = 0
    while (it.hasNext) { out(n) = UTF8String.fromString(it.next()); n += 1 }
    new GenericArrayData(out)
  }

  val functionName: FunctionIdentifier = FunctionIdentifier("graft_shingle_set")
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[ShingleSet].getCanonicalName, "graft_shingle_set")
  val builder: Seq[Expression] => Expression = { c =>
    ShingleSet(Cast(c.head, StringType), c(1).eval().asInstanceOf[Number].intValue())
  }
}

/** The distinct k-shingle set as 60-bit md5-prefix HASHES — the
  * inverted-index form that joins on 8-byte longs instead of shingle
  * strings (the reference's gram index joins on integer grams for the
  * same reason: narrower shuffles, cheap equality). Per-doc dedup at
  * the string level, then hashed — the oracle's
  * `SELECT DISTINCT doc_id, h60(shingle)` ordering exactly.
  */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingle_hashes"
  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], k)
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  def compute(s: UTF8String, k: Int): ArrayData = {
    val strings = ShingleSet.compute(s, k)
    if (strings == null) return null
    val out = new Array[Long](strings.numElements())
    var i = 0
    while (i < out.length) {
      out(i) = DedupHash.hash60(strings.getUTF8String(i).getBytes)
      i += 1
    }
    new GenericArrayData(out)
  }

  val functionName: FunctionIdentifier = FunctionIdentifier("graft_shingle_hashes")
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[ShingleHashes].getCanonicalName, "graft_shingle_hashes")
  val builder: Seq[Expression] => Expression = { c =>
    ShingleHashes(Cast(c.head, StringType), c(1).eval().asInstanceOf[Number].intValue())
  }
}

/** LSH band keys (md5 hex of the comma-joined signature slice per
  * band) straight from the text in one pass. Returning the BAND KEYS
  * rather than the signature matters for the plan: a downstream
  * band-explode references this expression ONCE (Catalyst would inline
  * a signature-returning kernel into every per-band element_at —
  * 64 recomputes per row). Null for docs with fewer than k tokens.
  */
case class MinHashBands(child: Expression, k: Int, numPerm: Int, bands: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_bands"
  override def nullSafeEval(input: Any): Any =
    MinHashBands.compute(input.asInstanceOf[UTF8String], k, numPerm, bands)
  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashBands {
  def compute(s: UTF8String, k: Int, numPerm: Int, bands: Int): ArrayData = {
    val sig = MinHashSig.compute(s, k, numPerm)
    if (sig == null) return null
    val rowsPerBand = numPerm / bands
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[UTF8String](bands)
    var j = 0
    while (j < bands) {
      val sb = new java.lang.StringBuilder()
      var r = 0
      while (r < rowsPerBand) {
        if (r > 0) sb.append(',')
        sb.append(sig.getLong(j * rowsPerBand + r))
        r += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes("UTF-8"))
      val hex = new java.lang.StringBuilder(32)
      var b = 0
      while (b < 16) {
        hex.append(Character.forDigit((d(b) >> 4) & 0xf, 16))
        hex.append(Character.forDigit(d(b) & 0xf, 16))
        b += 1
      }
      out(j) = UTF8String.fromString(hex.toString)
      j += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[AnyRef]])
  }

  val functionName: FunctionIdentifier = FunctionIdentifier("graft_minhash_bands")
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[MinHashBands].getCanonicalName, "graft_minhash_bands")
  val builder: Seq[Expression] => Expression = { c =>
    def lit(e: Expression): Int = e.eval().asInstanceOf[Number].intValue()
    MinHashBands(Cast(c.head, StringType), lit(c(1)), lit(c(2)), lit(c(3)))
  }
}

object DedupKernels {
  /** Idempotent per-session registration of the dedup kernels. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(SimHash60.functionName))
      registry.registerFunction(SimHash60.functionName, SimHash60.info, SimHash60.builder)
    if (!registry.functionExists(MinHashSig.functionName))
      registry.registerFunction(MinHashSig.functionName, MinHashSig.info, MinHashSig.builder)
    if (!registry.functionExists(MinHashBands.functionName))
      registry.registerFunction(MinHashBands.functionName, MinHashBands.info, MinHashBands.builder)
    if (!registry.functionExists(ShingleSet.functionName))
      registry.registerFunction(ShingleSet.functionName, ShingleSet.info, ShingleSet.builder)
    if (!registry.functionExists(ShingleHashes.functionName))
      registry.registerFunction(ShingleHashes.functionName, ShingleHashes.info, ShingleHashes.builder)
  }
}
