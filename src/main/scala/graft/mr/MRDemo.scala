package graft.mr

/** CLI driver for the generic MR surface: run a named app over an input
  * glob, write nReduce text partitions — the mrcoordinator/mrworker
  * entry points collapsed into one spark-submit-able main.
  *
  * Usage: MRDemo <wc|indexer|credit|metadata|filecount> <inputGlob> <outDir> [nReduce]
  */
object MRDemo {
  val apps: Map[String, MRApp] = Map(
    "wc" -> Apps.WordCount,
    "indexer" -> Apps.Indexer,
    "credit" -> Apps.Credit,
    "metadata" -> Apps.MetadataAgg,
    "filecount" -> Apps.FileCount)

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      s"usage: MRDemo <${apps.keys.mkString("|")}> <inputGlob> <outDir> [nReduce]")
    val app = apps.getOrElse(args(0),
      throw new IllegalArgumentException(
        s"unknown app '${args(0)}' — one of ${apps.keys.mkString(", ")}"))
    val nReduce = if (args.length > 3) args(3).toInt else 10
    val spark = graft.Session.build(s"mr-${args(0)}")
    try MRJob.run(spark, app, args(1), args(2), nReduce)
    finally spark.stop()
  }
}
