package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native kernels for the text-analysis operators
  * (TextAnalysis.qualityScore / tokenCounts / langId). Each replaces a
  * pipeline that materialized per-row match ARRAYS just to count them:
  *
  *   - TextStats ≡ { size(regexp_extract_all(text, '\S+')),
  *       size(array_distinct(regexp_extract_all(text, '\S+'))),
  *       size(regexp_extract_all(text, '[^A-Za-z0-9\s]')),
  *       size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) }
  *     — four regex passes, three transient arrays → two scalar scans,
  *     zero allocations beyond the distinct-token set.
  *   - LangHits ≡ explode(tokens) ⋈ broadcast(stopwords) → groupBy(doc,
  *     lang) → row_number window → left join back — i.e. TWO shuffles
  *     and a corpus-tokens-sized intermediate — as one projection:
  *     per-row stopword counting against a baked hash map, argmax with
  *     the same (hits desc, lang asc) tie-break. Zero shuffles.
  *
  * Semantics are bit-identical to the regex forms: token boundaries are
  * Java regex `\s` (space, \t, \n, \x0B, \f, \r), letter/digit classes
  * are ASCII, and iteration is by code point (Java regex matches
  * supplementary characters as single code points, so a char-based loop
  * would double-count them).
  */
case class TextStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TextStats.schema
  override def prettyName: String = "graft_text_stats"
  override protected def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.TextStats.compute($c);")
  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_uniq_tokens", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("bpe_tokens", LongType, nullable = false)))

  @inline private[functions] def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'
  @inline private def isLetter(cp: Int): Boolean =
    (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')
  @inline private def isDigit(cp: Int): Boolean = cp >= '0' && cp <= '9'

  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val n = str.length
    // Pass 1: whitespace tokens (\S+ runs) + distinct-token count.
    // Whitespace is BMP-only, so char-wise run detection is exact.
    var i = 0
    var nTok = 0L
    val uniq = new java.util.HashSet[String]
    while (i < n) {
      if (isWs(str.charAt(i))) i += 1
      else {
        val start = i
        while (i < n && !isWs(str.charAt(i))) i += 1
        nTok += 1
        uniq.add(str.substring(start, i))
      }
    }
    // Pass 2: BPE-ish segmentation [A-Za-z]+|[0-9]+|[^A-Za-z0-9\s] and
    // punctuation count (the third alternative, one per code point).
    var bpe = 0L
    var punct = 0L
    i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      if (isLetter(cp)) {
        while (i < n && isLetter(str.charAt(i))) i += 1
        bpe += 1
      } else if (isDigit(cp)) {
        while (i < n && isDigit(str.charAt(i))) i += 1
        bpe += 1
      } else if (isWs(cp)) i += 1
      else {
        bpe += 1; punct += 1
        i += Character.charCount(cp)
      }
    }
    new GenericInternalRow(Array[Any](nTok, uniq.size.toLong, punct, bpe))
  }

  val functionName: FunctionIdentifier = FunctionIdentifier("graft_text_stats")
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[TextStats].getCanonicalName, "graft_text_stats")
  val builder: Seq[Expression] => Expression = c => TextStats(Cast(c.head, StringType))
}

/** Stopword-hit language ID as a single scalar kernel: tokenize (\S+),
  * count hits per language against the baked stopword map, argmax with
  * (hits desc, lang asc) tie-break; zero hits → ("und", 0).
  */
case class LangHits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LangHits.schema
  override def prettyName: String = "graft_lang_hits"
  override protected def nullSafeEval(input: Any): Any =
    LangHits.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.LangHits.compute($c);")
  override protected def withNewChildInternal(newChild: Expression): LangHits =
    copy(child = newChild)
}

object LangHits {
  val schema: StructType = StructType(Seq(
    StructField("predicted_lang", StringType, nullable = false),
    StructField("hits", LongType, nullable = false)))

  /** Minimal per-language stopword lists. Deliberately small: the
    * operator SHAPE (one narrow projection; at cluster scale, per-row
    * lookup against a broadcast-able map) is what scales, not the lists.
    * A word may belong to several languages — it counts for each.
    */
  val stopwords: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "of", "en" -> "and", "en" -> "to",
    "en" -> "in", "en" -> "is", "en" -> "it", "en" -> "for", "en" -> "on",
    "de" -> "der", "de" -> "die", "de" -> "das", "de" -> "und", "de" -> "ist",
    "de" -> "nicht", "de" -> "mit", "de" -> "ein", "de" -> "zu", "de" -> "den",
    "fr" -> "le", "fr" -> "la", "fr" -> "les", "fr" -> "et", "fr" -> "est",
    "fr" -> "un", "fr" -> "une", "fr" -> "des", "fr" -> "du", "fr" -> "pas",
    "es" -> "el", "es" -> "la", "es" -> "los", "es" -> "las", "es" -> "es",
    "es" -> "un", "es" -> "una", "es" -> "y", "es" -> "de", "es" -> "que")

  /** Languages in ascending order — argmax scans in this order with a
    * strict `>`, so the first maximum IS the lexicographically-smallest
    * tied language (the row_number tie-break of the join form).
    */
  private val langs: Array[String] = stopwords.map(_._1).distinct.sorted.toArray
  private val und: UTF8String = UTF8String.fromString("und")
  private val langUtf8: Array[UTF8String] = langs.map(UTF8String.fromString)

  private val wordLangs: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]
    stopwords.groupBy(_._2).foreach { case (w, ls) =>
      m.put(w, ls.map(p => langs.indexOf(p._1)).sorted.toArray)
    }
    m
  }

  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val n = str.length
    val counts = new Array[Long](langs.length)
    var i = 0
    while (i < n) {
      if (TextStats.isWs(str.charAt(i))) i += 1
      else {
        val start = i
        while (i < n && !TextStats.isWs(str.charAt(i))) i += 1
        val ls = wordLangs.get(str.substring(start, i))
        if (ls != null) {
          var j = 0
          while (j < ls.length) { counts(ls(j)) += 1; j += 1 }
        }
      }
    }
    var best = -1
    var bestHits = 0L
    var l = 0
    while (l < counts.length) {
      if (counts(l) > bestHits) { bestHits = counts(l); best = l }
      l += 1
    }
    if (best < 0) new GenericInternalRow(Array[Any](und, 0L))
    else new GenericInternalRow(Array[Any](langUtf8(best), bestHits))
  }

  val functionName: FunctionIdentifier = FunctionIdentifier("graft_lang_hits")
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[LangHits].getCanonicalName, "graft_lang_hits")
  val builder: Seq[Expression] => Expression = c => LangHits(Cast(c.head, StringType))
}

object TextStatsFns {
  /** Idempotent per-session registration of the text-analysis kernels. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(TextStats.functionName))
      registry.registerFunction(TextStats.functionName, TextStats.info, TextStats.builder)
    if (!registry.functionExists(LangHits.functionName))
      registry.registerFunction(LangHits.functionName, LangHits.info, LangHits.builder)
  }
}
