package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.execution.LogicalRDD

/** Loop-carried checkpointing that does not compound Catalyst size
  * statistics.
  *
  * `Dataset.localCheckpoint` deliberately carries the ORIGIN plan's
  * statistics into the resulting LogicalRDD — a good default when a
  * checkpoint feeds one further query. For LOOP-CARRIED frames it is
  * pathological: Catalyst's size-only estimator multiplies child sizes
  * at joins, so a frame that is checkpointed, joined against carried
  * state, and re-checkpointed every iteration roughly SQUARES its
  * (arbitrary-precision) size estimate per round. After k folds the
  * estimate has ~2^k digits and every subsequent planning pass burns
  * its time in BigInteger multiplication — measured on the round-8
  * dedup gate as 5 s → 63 s per batch by fold 9, with the driver
  * thread pinned inside SizeInBytesOnlyStatsPlanVisitor, and
  * reproduced in a 5-line join⇄checkpoint loop whose digit count
  * doubles per iteration.
  *
  * [[fresh]] checkpoints eagerly, then rebuilds the frame around the
  * SAME materialized RDD minus the carried statistics: consumers plan
  * against `spark.sql.defaultSizeInBytes`, as for any opaque RDD scan.
  * That is the right model for loop state whose size the planner
  * cannot know — every join against these frames here carries an
  * explicit broadcast()/probe-side decision anyway, so nothing is
  * lost. `Streams.releaseCheckpoint` keeps working: the wrapper's plan
  * is a LogicalRDD over the same checkpointed RDD.
  */
object Ckpt {
  /** [[fresh]] over two INDEPENDENT frames, materialized concurrently
    * from two driver threads (guide §2.6: actions are only sequential
    * because driver code calls them sequentially — while one
    * materialization's task tail drains, the other's tasks back-fill
    * the freed cores). Use only when neither frame's plan reads the
    * other's checkpoint. Each Future inherits the session via the
    * captured Dataset; job-description thread-locals are per-thread,
    * which is exactly what the UI wants for concurrent jobs.
    */
  def freshPar(a: DataFrame, b: DataFrame): (DataFrame, DataFrame) = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fa = pool.submit(new java.util.concurrent.Callable[DataFrame] {
        def call(): DataFrame = fresh(a)
      })
      val fb = pool.submit(new java.util.concurrent.Callable[DataFrame] {
        def call(): DataFrame = fresh(b)
      })
      (fa.get(), fb.get())
    } finally pool.shutdown()
  }

  def fresh(df: DataFrame): DataFrame = {
    val ckpt = df.localCheckpoint()
    ckpt.queryExecution.logical match {
      case lr: LogicalRDD =>
        val spark =
          ckpt.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        new org.apache.spark.sql.classic.Dataset[Row](
          spark,
          LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming)(spark),
          Encoders.row(ckpt.schema)).toDF()
      case other =>
        // A silent fallthrough would quietly reintroduce the per-fold
        // stats-squaring pathology this object exists to prevent (a
        // Spark upgrade changing localCheckpoint's plan shape) — warn
        // loudly so the regression is detectable; CkptSpec asserts the
        // stripped-stats path actually fires on the current Spark.
        System.err.println(
          s"[graft] WARNING: Ckpt.fresh expected LogicalRDD from localCheckpoint, " +
            s"got ${other.getClass.getSimpleName} — carried statistics NOT stripped; " +
            "loop-carried folds will re-compound size estimates")
        ckpt
    }
  }
}
