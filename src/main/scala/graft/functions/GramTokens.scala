package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
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

  /** The tokenizer kernel, shared by interpreted eval and codegen. */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
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
    new GenericArrayData(out)
  }

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

/** SparkSessionExtensions entry point: launch with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` to get
  * the engine's native functions in every session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((GramTokens.functionName, GramTokens.info, GramTokens.builder))
}
