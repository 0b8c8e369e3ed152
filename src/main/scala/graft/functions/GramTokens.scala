package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the byte-4-gram tokenizer
  * (reference: assemblage_db/src/index.rs:826-835): UTF-8 bytes padded
  * with 3 zero bytes per side, each 4-byte big-endian window emitted as
  * an unsigned-u32-in-long. One row-level call per value with full
  * whole-stage-codegen participation — unlike a Scala UDF there is no
  * encoder round-trip, null handling is free, and the generated code
  * calls the static kernel directly.
  */
case class GramTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_grams"

  override protected def nullSafeEval(input: Any): Any =
    GramTokens.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramTokens.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): GramTokens =
    copy(child = newChild)
}

object GramTokens {

  /** THE byte-4-gram window rule (zero padding, big-endian u32-in-Long)
    * — the single tokenizer both kernels build on, so the
    * GramTokens/GramPostings parity contract is structural, not two
    * hand-synchronized loops.
    */
  def gramsOf(bytes: Array[Byte]): Array[Long] = {
    val n = bytes.length
    val out = new Array[Long](n + 3)
    var i = 0
    while (i < n + 3) {
      var g = 0L
      var j = 0
      while (j < 4) {
        val idx = i + j - 3
        val b = if (idx >= 0 && idx < n) bytes(idx) & 0xffL else 0L
        g = (g << 8) | b
        j += 1
      }
      out(i) = g
      i += 1
    }
    out
  }

  /** The tokenizer kernel, shared by interpreted eval and codegen. */
  def compute(s: UTF8String): ArrayData =
    new GenericArrayData(gramsOf(s.getBytes))

  val functionName: FunctionIdentifier = FunctionIdentifier("graft_grams")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[GramTokens].getCanonicalName, "graft_grams")
  // input coerced to string so any argument type is accepted
  val builder: Seq[Expression] => Expression =
    children => GramTokens(Cast(children.head, StringType))

  /** Idempotent per-session registration (for sessions not launched
    * with the extensions config).
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(functionName))
      registry.registerFunction(functionName, info, builder)
  }
}

/** Per-doc aggregated postings: the byte-4-gram multiset of one text as
  * an array of (gram, occurrences) structs, sorted by gram. Every
  * occurrence of a gram within a document comes from that document's
  * single input row, so the slot-2 postings aggregation
  * (`groupBy(id, gram).count`) can run entirely inside this kernel —
  * the postings table becomes a pure map-side projection with ZERO
  * shuffles, where the composed explode+groupBy form shuffles the full
  * (id, gram) stream. Result-identical to exploding [[GramTokens]] and
  * counting (GramTokensSpec parity).
  */
case class GramPostings(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("gram", LongType, nullable = false),
      StructField("occurrences", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_gram_postings"

  override protected def nullSafeEval(input: Any): Any =
    GramPostings.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramPostings.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): GramPostings =
    copy(child = newChild)
}

object GramPostings {

  /** Tokenize ([[GramTokens.gramsOf]]) + sort + run-length encode in
    * one pass over the row.
    */
  def compute(s: UTF8String): ArrayData = {
    val grams = GramTokens.gramsOf(s.getBytes)
    java.util.Arrays.sort(grams)
    var runs = 1
    var i = 1
    while (i < grams.length) {
      if (grams(i) != grams(i - 1)) runs += 1
      i += 1
    }
    val rows = new Array[Any](runs)
    var r = 0
    i = 0
    while (i < grams.length) {
      var j = i + 1
      while (j < grams.length && grams(j) == grams(i)) j += 1
      rows(r) = InternalRow(grams(i), (j - i).toLong)
      r += 1
      i = j
    }
    new GenericArrayData(rows)
  }

  val functionName: FunctionIdentifier = FunctionIdentifier("graft_gram_postings")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[GramPostings].getCanonicalName, "graft_gram_postings")
  val builder: Seq[Expression] => Expression =
    children => GramPostings(Cast(children.head, StringType))

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(functionName))
      registry.registerFunction(functionName, info, builder)
  }
}

/** SparkSessionExtensions entry point: launch with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` to get
  * the engine's ENTIRE native-function surface in every session —
  * `spark.sql("SELECT graft_simhash60(text) ...")` works with no Scala
  * imports. The same kernels self-register lazily through each
  * object's `ensureRegistered` when used via the DataFrame operators.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((GramTokens.functionName, GramTokens.info, GramTokens.builder))
    ext.injectFunction((GramPostings.functionName, GramPostings.info, GramPostings.builder))
    ext.injectFunction((SimHash60.functionName, SimHash60.info, SimHash60.builder))
    ext.injectFunction((MinHashSig.functionName, MinHashSig.info, MinHashSig.builder))
    ext.injectFunction((MinHashBands.functionName, MinHashBands.info, MinHashBands.builder))
    ext.injectFunction((ShingleSet.functionName, ShingleSet.info, ShingleSet.builder))
    ext.injectFunction((ShingleHashes.functionName, ShingleHashes.info, ShingleHashes.builder))
    ext.injectFunction((PolyHash.functionName, PolyHash.info, PolyHash.builder))
    ext.injectFunction((MinWindowHash.functionName, MinWindowHash.info, MinWindowHash.builder))
    ext.injectFunction((TextStats.functionName, TextStats.info, TextStats.builder))
    ext.injectFunction((LangHits.functionName, LangHits.info, LangHits.builder))
    ext.injectFunction((WindowHashes.functionName, WindowHashes.info, WindowHashes.builder))
    ext.injectFunction((WinnowedHashes.functionName, WinnowedHashes.info, WinnowedHashes.builder))
    ext.injectFunction((BpeCount.functionName, BpeCount.info, BpeCount.builder))
    ext.injectFunction((BpeTokens.functionName, BpeTokens.info, BpeTokens.builder))
  }
}
