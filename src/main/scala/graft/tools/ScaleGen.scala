package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-curve data generator: replicate the sf0.1 documents and
  * embeddings `reps`× with per-replica decorrelation, so the dedup/ANN
  * family can be timed at ~sf1 without driver-provided data.
  *
  * Decorrelation preserves the distributions that drive the operators'
  * cost model while keeping replicas dissimilar (so dup rates and
  * posting-list shapes scale like organically larger corpora, not like
  * 10 exact copies):
  *   - documents: per-replica rotation over the 62-char [a-zA-Z0-9]
  *     alphabet (whitespace/punctuation fixed, so tokenization shape
  *     is preserved). Within-replica near-dup structure is preserved
  *     exactly (rotation is a bijection on shingles); cross-replica
  *     shingles are disjoint for reps ≤ 62, so document frequencies
  *     and the df-cap behave as in a corpus with reps× the vocabulary
  *     mass.
  *   - embeddings: per-replica circular component shift — norms and
  *     pairwise within-replica cosines are preserved, cross-replica
  *     similarity decorrelates.
  *
  * Ids offset by replica (multiples of 100 so `id % 100` query-subset
  * predicates keep their selectivity); replica 0 is the original data,
  * so IVF's deterministic `vec_id < 16` centroids stay meaningful.
  *
  * Usage: runMain graft.tools.ScaleGen [srcDir] [outDir] [reps]
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/sfscale"
    val reps = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val alphabet = (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).toArray
    val alphaIdx: Map[Char, Int] = alphabet.zipWithIndex.toMap
    val rot = udf { (text: String, k: Int) =>
      if (text == null) null
      else {
        val sb = new StringBuilder(text.length)
        text.foreach { c =>
          sb.append(alphaIdx.get(c) match {
            case Some(i) => alphabet((i + k) % alphabet.length)
            case None    => c
          })
        }
        sb.toString
      }
    }
    val shift = udf { (v: Seq[Float], k: Int) =>
      if (v == null) null
      else { val n = v.length; Seq.tabulate(n)(i => v((i + k) % n)) }
    }

    val replicas = spark.range(reps).select(col("id").cast("int").as("k"))

    val docs = spark.read.parquet(s"$src/documents.parquet")
    docs.crossJoin(broadcast(replicas))
      .select(
        (col("doc_id") + col("k").cast("long") * 1000000L).as("doc_id"),
        rot(col("text"), col("k")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    emb.crossJoin(broadcast(replicas))
      .select(
        (col("vec_id") + col("k").cast("long") * 100000L).as("vec_id"),
        shift(col("embedding"), col("k")).as("embedding"),
        col("label"))
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")

    // ── relational fact tables (round 11): KEY-SHIFTED replicas ──
    // The shift is applied consistently across every foreign key, so
    // per-entity join cardinalities are preserved exactly: each
    // replica's orders reference that replica's customers, lineitems
    // reference that replica's orders, events keep their per-user
    // session shapes. Dimension tables (nation/region/part/supplier)
    // are NOT replicated — the realistic large-corpus shape is a fixed
    // catalog with reps× the fact mass, so per-dim fan-in grows reps×
    // (exactly what a broadcast-join plan must absorb) while per-fact
    // chains stay identical. Timestamps and dates are untouched, so
    // event-time distributions (hourly buckets, session gaps, as-of
    // orderings) scale in DENSITY, not in span.
    val custShift = 1000000L
    val orderShift = 10000000L
    val userShift = 1000000L
    val eventShift = 10000000L

    // The replica arithmetic is only collision-free while every base
    // key stays below its shift (at TPC-H sf>=10 the 15M orders would
    // silently alias replica 0 of order 15000001 with replica 1 of
    // order 5000001, breaking the preserved-cardinality invariant the
    // scale legs rely on) — fail loudly instead of writing a corrupt
    // scale corpus.
    def assertBelow(table: String, key: String, shift: Long): Unit = {
      val mx = spark.read.parquet(s"$src/$table.parquet")
        .agg(org.apache.spark.sql.functions.max(col(key).cast("long")))
        .head().getLong(0)
      require(mx < shift,
        s"scalegen: max($table.$key)=$mx >= shift $shift — replicas would " +
          "collide; raise the shift (or derive it from max(key)+1)")
    }
    assertBelow("customer", "c_custkey", custShift)
    assertBelow("orders", "o_orderkey", orderShift)
    assertBelow("orders", "o_custkey", custShift)
    assertBelow("lineitem", "l_orderkey", orderShift)
    assertBelow("events", "event_id", eventShift)
    assertBelow("events", "user_id", userShift)

    val cust = spark.read.parquet(s"$src/customer.parquet")
    cust.crossJoin(broadcast(replicas))
      .select(
        (col("c_custkey") + col("k").cast("long") * custShift).as("c_custkey"),
        col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/customer.parquet")

    val ord = spark.read.parquet(s"$src/orders.parquet")
    ord.crossJoin(broadcast(replicas))
      .select(
        (col("o_orderkey") + col("k").cast("long") * orderShift).as("o_orderkey"),
        (col("o_custkey") + col("k").cast("long") * custShift).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/orders.parquet")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    li.crossJoin(broadcast(replicas))
      .select(
        (col("l_orderkey") + col("k").cast("long") * orderShift).as("l_orderkey"),
        col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/lineitem.parquet")

    val ev = spark.read.parquet(s"$src/events.parquet")
    ev.crossJoin(broadcast(replicas))
      .select(
        (col("event_id") + col("k").cast("long") * eventShift).as("event_id"),
        col("ts"),
        (col("user_id") + col("k").cast("long") * userShift).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/events.parquet")

    // fixed catalog dims: copied through unchanged
    Seq("nation", "region", "part", "supplier").foreach { d =>
      spark.read.parquet(s"$src/$d.parquet")
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/$d.parquet")
    }

    println(s"[scalegen] wrote ${reps}x documents+embeddings+facts (+fixed dims) to $out")
    spark.stop()
  }
}
