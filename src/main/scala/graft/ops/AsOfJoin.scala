package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: for each left row, the latest right row with
  * `right.ts <= left.ts` on the same key (inclusive, DuckDB ASOF
  * semantics). Spark has no built-in as-of join; composing it as
  * union + keyed window avoids both a broadcast (right side can be any
  * size) and a range cross-join: one shuffle on the key, then a single
  * ordered pass per key — the plan that survives a 100× scale-up.
  */
object AsOfJoin {

  /** @param rightVals right columns carried onto matching left rows
    *   (unmatched left rows keep them null — left-join semantics).
    *   Genuinely-null right values are skipped by the running `last`,
    *   so carry only non-null value columns.
    * @param rightTieBreak extra ordering columns after ts (determinism
    *   when right timestamps collide within a key).
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String],
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns.toSeq
    val carriedCols = rightVals ++ rightTieBreak
    val leftStructType = left.select(struct(leftCols.map(col): _*)).schema.head.dataType

    val leftSide: Seq[Column] =
      Seq(col(leftKey).as("__k"), col(leftTs).as("__ts"), lit(1).as("__src"),
        struct(leftCols.map(col): _*).as("__left")) ++
        carriedCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))
    val rightSide: Seq[Column] =
      Seq(col(rightKey).as("__k"), col(rightTs).as("__ts"), lit(0).as("__src"),
        lit(null).cast(leftStructType).as("__left")) ++
        carriedCols.map(col)
    val tagged = left.select(leftSide: _*).unionByName(right.select(rightSide: _*))

    // Right rows sort before left rows at equal ts (inclusive match).
    val order: Seq[Column] = Seq(col("__ts").asc, col("__src").asc) ++
      rightTieBreak.map(c => col(c).asc_nulls_first)
    val w = Window.partitionBy("__k").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.map(c =>
      last(when(col("__src") === 0, col(c)), ignoreNulls = true).over(w).as(c))

    tagged
      .select(Seq(col("__src"), col("__left")) ++ carried: _*)
      .filter(col("__src") === 1)
      .select(leftCols.map(c => col(s"__left.$c").as(c)) ++ rightVals.map(col): _*)
  }
}
