package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.Engine.queries ++
      graft.queries.Pipelines.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++ graft.queries.Engine.oracleSql ++
      graft.queries.Pipelines.oracleSql

  /** Headline queries Bench times. Excludes q22: full all-pairs overlap
    * materialization is inherently quadratic on this self-similar corpus
    * (the reference never runs it either — its write path refreshes
    * overlaps per dirty id, which q23 represents).
    */
  def benchQueries: Seq[String] =
    (queries.keySet - "q22_overlap_pairs").toSeq.sorted
}
