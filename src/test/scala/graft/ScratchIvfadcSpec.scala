package graft

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScratchIvfadcSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]").appName("scratch-ivfadc")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("recall ladder: direct vs residual at nprobe 4/8/16") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    println(s"DEBUG corpus rows=${emb.count()}")
    val qs = emb.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(256).localCheckpoint()
    def mean(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(avg("recall_x100")).head().getDouble(0)
    val direct = Similarity.pqTopKRecallExport(emb, "vec_id", "embedding",
      queries = qs, m = 8, ksub = 256, trainIters = 2, k = 10,
      exportPath = s"${graft.OracleAux.dir}/scratch_direct")
    println(s"DEBUG direct=${mean(direct)}")
    for (np <- Seq(16, 8, 4)) {
      val r = Similarity.ivfadcTopKRecallExport(emb, "vec_id", "embedding",
        queries = qs, numCells = 16, coarseIters = 3, m = 8, ksub = 256,
        pqIters = 2, nprobe = np, k = 10,
        coarseExportPath = s"${graft.OracleAux.dir}/scratch_c$np",
        cbExportPath = s"${graft.OracleAux.dir}/scratch_r$np")
      println(s"DEBUG ivfadc nprobe=$np recall=${mean(r)}")
    }
  }
}
