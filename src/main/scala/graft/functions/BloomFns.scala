package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.LongType

/** Session registration for Spark's native Bloom-filter expressions —
  * the constant-size set-membership sketch Catalyst uses for its own
  * runtime row-group filtering, surfaced as callable functions:
  *
  *  - `graft_bloom_agg(h, n_items, n_bits)` — a mergeable aggregate
  *    (per-partition bitsets OR together) producing the serialized
  *    filter as BINARY; constant state per partition, so building a
  *    membership sketch over 10^9+ keys is one map-side-partial
  *    aggregation, never a distinct shuffle.
  *  - `graft_bloom_contains(bloom, h)` — membership probe against a
  *    FOLDABLE (literal) serialized filter: evaluates map-side inside
  *    whole-stage codegen'd stages with zero join.
  *
  * Both are deterministic (fixed internal hashing, order-independent
  * bitset merge) — same keys + same sizing = bit-identical filter —
  * which is what lets [[graft.ops.Curation.decontaminateBloom]] gate
  * the sketch against the exact leg inside a hash-compared oracle
  * query.
  */
object BloomFns {

  val aggName: FunctionIdentifier = FunctionIdentifier("graft_bloom_agg")
  private val aggInfo: ExpressionInfo = new ExpressionInfo(
    classOf[BloomFilterAggregate].getCanonicalName, "graft_bloom_agg")
  private val aggBuilder: Seq[Expression] => Expression = {
    case Seq(child, nItems, nBits) =>
      new BloomFilterAggregate(Cast(child, LongType), nItems, nBits)
    case other => throw new IllegalArgumentException(
      s"graft_bloom_agg(h, n_items, n_bits) takes 3 arguments, got ${other.size}")
  }

  val containsName: FunctionIdentifier = FunctionIdentifier("graft_bloom_contains")
  private val containsInfo: ExpressionInfo = new ExpressionInfo(
    classOf[BloomFilterMightContain].getCanonicalName, "graft_bloom_contains")
  private val containsBuilder: Seq[Expression] => Expression = {
    case Seq(bloom, value) =>
      BloomFilterMightContain(bloom, Cast(value, LongType))
    case other => throw new IllegalArgumentException(
      s"graft_bloom_contains(bloom, h) takes 2 arguments, got ${other.size}")
  }

  /** Idempotent per-session registration. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(aggName))
      registry.registerFunction(aggName, aggInfo, aggBuilder)
    if (!registry.functionExists(containsName))
      registry.registerFunction(containsName, containsInfo, containsBuilder)
  }
}
