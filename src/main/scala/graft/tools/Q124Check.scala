package graft.tools

/** One-off: run a single SparkEntry query by name (default sf0.01). */
object QueryCheck {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = graft.GraftSession.getOrCreate("graft-querycheck")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    println(s"QUERYCHECK $name rows=" + df.count())
    spark.stop()
  }
}
