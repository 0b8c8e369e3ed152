package graft.bulk

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The engine's storage substrate at scale (SURVEY §1.5): each slot is
  * an append-only table of `(key, version_ts, is_removed, payload…)`
  * rows. Version resolution is a window over the key — the DataFrame
  * form of the reference KV store's in-memory version directory:
  *
  *   - latest        == kv get        (tombstones resolve to absent)
  *   - unremoved     == kv get_unremoved ("read from the trash")
  *   - asOf          == kv get_version / MVCC snapshot read
  *   - liveKeys      == kv keys
  *   - compact       == kv merge ("empty the trash")
  *
  * Scale notes: the window shuffles once on `key` (hash partition,
  * near-uniform); at 100 TB this is the same plan per partition with
  * no driver involvement, and compaction is an idempotent rewrite job
  * whose output can replace the directory atomically.
  */
object VersionedTable {

  private def keyWindow(keyCols: Seq[String]) =
    Window.partitionBy(keyCols.map(col): _*).orderBy(col("version_ts").desc)

  private def newest(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.withColumn("__rn", row_number().over(keyWindow(keyCols)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** Latest live version per key (kv get): absent if tombstoned. */
  def latest(df: DataFrame, keyCols: String*): DataFrame =
    newest(df, keyCols).filter(!col("is_removed"))

  /** Latest non-tombstone version per key (kv get_unremoved). */
  def unremoved(df: DataFrame, keyCols: String*): DataFrame =
    newest(df.filter(!col("is_removed")), keyCols)

  /** Snapshot read: latest live version as of `ts` (MVCC time travel). */
  def asOf(df: DataFrame, ts: Long, keyCols: String*): DataFrame =
    latest(df.filter(col("version_ts") <= ts), keyCols: _*)

  /** All keys whose latest version is live (kv keys). */
  def liveKeys(df: DataFrame, keyCols: String*): DataFrame =
    latest(df, keyCols: _*).select(keyCols.map(col): _*)

  /** Compaction (kv merge): only latest live versions survive; history
    * and trash are purged. The result is a valid versioned table.
    */
  def compact(df: DataFrame, keyCols: String*): DataFrame =
    latest(df, keyCols: _*)

  /** Full version history of a key set, earliest → latest (kv versions). */
  def versionsOf(df: DataFrame, keyCols: String*): DataFrame =
    df.orderBy((keyCols.map(col) :+ col("version_ts")): _*)
}
