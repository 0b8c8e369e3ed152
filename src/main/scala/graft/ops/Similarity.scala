package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a deterministic
  * random-hyperplane LSH variant as the scale path.
  *
  * FP discipline: cosine is computed in double with a fixed sequential
  * fold (`aggregate` over `zip_with`), so the identical expression in an
  * external engine (DuckDB `list_reduce`) produces bit-identical IEEE
  * results — required for oracle hash-parity. LSH sign bits use
  * integer-quantized embeddings (floor(x*1000)) so bucketing is exact
  * integer math with zero FP boundary risk.
  *
  * Scale design (100 TB): queries are broadcast (they are the small
  * side by construction); the corpus side never shuffles for the
  * brute-force scan. The LSH path prunes the scan to one bucket per
  * query — the candidate join is an equi-join on the signature.
  */
object Similarity {

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Sequential left-fold dot product — order-deterministic IEEE. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a)
    val bd = asDouble(b)
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  /** Near-dup pairs at cosine ≥ threshold (id_a < id_b). All-pairs —
    * exact but quadratic; the LSH path below is the scale variant.
    */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** Exact brute-force cosine top-k for a query subset: queries are
    * broadcast against the full corpus; rank ties broken by id so the
    * result is fully deterministic. Emits (query_id, rank, neighbor_id).
    */
  def bruteForceTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      k: Int): DataFrame = {
    val corpus = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    corpus.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** Integer-quantized embedding: floor(x*1000) per component — exact
    * in any engine, used for LSH sign bits.
    */
  private def quantized(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 1000).cast("long"))

  /** Deterministic hyperplane component p,j in [-1000, 1000]:
    * hash60("p_j") % 2001 - 1000. Reproducible anywhere md5 exists.
    */
  private def planeComponent(p: Int, j: Int): Column =
    Hashing.hash60(lit(s"${p}_$j")) % 2001 - 1000

  /** `numPlanes`-bit signature: bit p set iff the integer dot product
    * with deterministic hyperplane p is positive. Exact integer math.
    */
  def lshSignature(vec: Column, dim: Int, numPlanes: Int): Column =
    (0 until numPlanes).map { p =>
      val d = (0 until dim)
        .map(j => element_at(quantized(vec), j + 1) * planeComponent(p, j))
        .reduce(_ + _)
      when(d > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)

  /** LSH-bucketed ANN: candidates share the query's full signature
    * bucket, reranked by exact cosine. Trades recall for a pruned scan;
    * with B planes the corpus scan shrinks ~2^B-fold in expectation.
    */
  def lshTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      dim: Int,
      numPlanes: Int,
      k: Int): DataFrame = {
    val sig = lshSignature(col("v"), dim, numPlanes)
    val corpus = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("v"))
      .withColumn("bucket", sig)
      .withColumnRenamed("v", "nv")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("v"))
      .withColumn("bucket", sig)
      .withColumnRenamed("v", "qv")
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    corpus.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }
}
