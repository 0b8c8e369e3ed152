package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic byte-pair-encoding tokenizer over a FIXED public
  * merges table — the subword token counter real training-shard
  * budgets are denominated in (whitespace tokens undercount code,
  * CJK, and URLs by multiples). This is the standard BPE inference
  * shape (Sennrich et al. 2016, "Neural Machine Translation of Rare
  * Words with Subword Units") with two deliberately pinned conventions
  * so an external engine can replay it EXACTLY:
  *
  *  1. The unit is the Unicode CODE POINT (matching Spark's length()
  *     and DuckDB's per-character string_split), not the UTF-8 byte —
  *     byte-level start symbols would need a byte↔char table on the
  *     oracle side for non-ASCII.
  *  2. Merges apply in FIXED TABLE ORDER, one full left-to-right pass
  *     per merge; within a pass, matches are non-overlapping and the
  *     scan continues after each merged pair (so a freshly merged
  *     token never re-merges with its right neighbor in the same
  *     pass). This is exactly the semantics of a chained string
  *     `replace` over a separator-wrapped token encoding, which is how
  *     the DuckDB oracle replays it (q118) — no iteration or priority
  *     queue an engine could implement differently.
  *
  * The merges table is a fixed 47-entry English-leaning list
  * (frequent bigrams, a second level of common words, then
  * space-prefixed function words — the GPT-2-style "space travels
  * with the word" convention). It is engine configuration, not
  * learned state: the POINT is determinism, and a production
  * deployment swaps in its model's real merges file unchanged.
  */
case class BpeCount(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"
  // CodegenFallback: the per-merge scan loop dominates row overhead
  // (same rationale as SimHash60).
  override def nullSafeEval(input: Any): Any =
    BpeTokenizer.count(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}

case class BpeTokens(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_tokens"
  override def nullSafeEval(input: Any): Any = {
    val toks = BpeTokenizer.tokens(input.asInstanceOf[UTF8String])
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      toks.map(UTF8String.fromString))
  }
  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}

object BpeTokenizer {

  /** The fixed merges table, applied strictly in this order. Level 1:
    * frequent English character bigrams; level 2: completions of
    * common words/suffixes over level-1 tokens; level 3:
    * space-prefixed function words (the leading space joins the word
    * token, GPT-2 style). Single source of truth — the q118 oracle SQL
    * is GENERATED from this list, so the two sides cannot drift.
    */
  val Merges: IndexedSeq[(String, String)] = IndexedSeq(
    // level 1: character bigrams
    "t" -> "h", "h" -> "e", "i" -> "n", "e" -> "r", "a" -> "n", "r" -> "e",
    "o" -> "n", "a" -> "t", "e" -> "n", "n" -> "d", "t" -> "i", "e" -> "s",
    "o" -> "r", "t" -> "e", "o" -> "f", "e" -> "d", "i" -> "s", "i" -> "t",
    "a" -> "l", "a" -> "r", "s" -> "t", "t" -> "o", "n" -> "t", "n" -> "g",
    "s" -> "e", "h" -> "a", "a" -> "s", "o" -> "u", "i" -> "o", "l" -> "e",
    "v" -> "e", "c" -> "o", "m" -> "e", "d" -> "e", "h" -> "i", "r" -> "i",
    "r" -> "o", "i" -> "c",
    // level 2: common completions over level-1 tokens
    "th" -> "e", "an" -> "d", "in" -> "g", "ti" -> "on",
    // level 3: space-prefixed function words
    " " -> "the", " " -> "and", " " -> "to", " " -> "of", " " -> "a")

  /** Apply the merges to `s`'s code-point sequence; returns the token
    * array (empty for the empty string).
    */
  def tokens(s: UTF8String): Array[String] = tokensWith(Merges, s.toString)

  /** [[tokens]] over an ARBITRARY merges table — the form the
    * distributed BPE trainer feeds its learned merges into (q153):
    * identical pass semantics (fixed table order, one left-to-right
    * non-overlapping pass per merge), so a learned table behaves
    * exactly like the fixed one.
    */
  def tokensWith(merges: IndexedSeq[(String, String)], str: String): Array[String] = {
    if (str.isEmpty) return Array.empty
    val cps = str.codePoints().toArray
    var toks = new Array[String](cps.length)
    var n = cps.length
    var i = 0
    while (i < n) { toks(i) = new String(Character.toChars(cps(i))); i += 1 }
    var m = 0
    while (m < merges.length) {
      val (a, b) = merges(m)
      n = mergePass(toks, n, a, b)
      m += 1
    }
    java.util.Arrays.copyOf(toks, n)
  }

  /** One left-to-right non-overlapping merge pass over `toks(0..n)`,
    * in place; returns the new length. A freshly merged token never
    * re-merges with its right neighbor in the same pass — the exact
    * semantics of the oracle's separator-wrapped `replace`. */
  private[graft] def mergePass(toks: Array[String], n: Int, a: String, b: String): Int = {
    var w = 0
    var i = 0
    while (i < n) {
      if (i + 1 < n && toks(i) == a && toks(i + 1) == b) {
        toks(w) = a + b
        i += 2
      } else {
        toks(w) = toks(i)
        i += 1
      }
      w += 1
    }
    w
  }

  def count(s: UTF8String): Long = tokens(s).length.toLong
}

object BpeCount {
  val functionName: FunctionIdentifier = FunctionIdentifier("graft_bpe_count")
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[BpeCount].getCanonicalName, "graft_bpe_count")
  val builder: Seq[Expression] => Expression = {
    case Seq(child) => BpeCount(Cast(child, StringType))
    case other => throw new IllegalArgumentException(
      s"graft_bpe_count(text) takes 1 argument, got ${other.length}")
  }
}

object BpeTokens {
  val functionName: FunctionIdentifier = FunctionIdentifier("graft_bpe_tokens")
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[BpeTokens].getCanonicalName, "graft_bpe_tokens")
  val builder: Seq[Expression] => Expression = {
    case Seq(child) => BpeTokens(Cast(child, StringType))
    case other => throw new IllegalArgumentException(
      s"graft_bpe_tokens(text) takes 1 argument, got ${other.length}")
  }
}

object BpeFns {
  /** Idempotent per-session registration of the BPE kernels. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(BpeCount.functionName))
      registry.registerFunction(BpeCount.functionName, BpeCount.info, BpeCount.builder)
    if (!registry.functionExists(BpeTokens.functionName))
      registry.registerFunction(BpeTokens.functionName, BpeTokens.info, BpeTokens.builder)
  }
}
