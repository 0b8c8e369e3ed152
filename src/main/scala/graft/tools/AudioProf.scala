package graft.tools

import org.apache.spark.sql.functions._

/** One-off: where does the q123 audio delta spend its wall? */
object AudioProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.getOrCreate("graft-audio-prof")
    val docs = graft.Tables.load(spark, dir, "documents").select("doc_id", "text")
    val standing = docs.filter(col("doc_id") % 7 =!= 0)
    val delta = docs.filter(col("doc_id") % 7 === 0)
    def time(n: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[audio-prof] $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val sH = graft.ops.Media.wavEnvelopeHash(
      graft.ops.Media.asWav(standing, "doc_id", "text")).toDF()
    val dH = graft.ops.Media.wavEnvelopeHash(
      graft.ops.Media.asWav(delta, "doc_id", "text")).toDF()
    time("standing encode+decode+hash")(sH.write.format("noop").mode("overwrite").save())
    time("delta encode+decode+hash")(dH.write.format("noop").mode("overwrite").save())
    time("full q123 op")(graft.ops.Media.audioNearDupDeltaPairs(
      graft.ops.Media.asWav(standing, "doc_id", "text"),
      graft.ops.Media.asWav(delta, "doc_id", "text"))
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
