package graft.tools

/** Dumps `.explain("formatted")` for named queries to files — the
  * optimization-round evidence trail (plans/r12/<query>_<tag>.txt).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <tag> <query...>
  * Data dir comes from SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  * so the dumped plan is the plan the bench actually runs. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <query...>")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val tag = args(1)
    val names = args.drop(2).toSeq
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Session.build("graft-plandump")
    for (n <- names) {
      val p = graft.SparkEntry.queries(n)(spark, d)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(outDir.resolve(s"${n}_$tag.txt"), p)
      println(s"[plandump] wrote ${n}_$tag.txt (${p.length} chars)")
    }
    spark.stop()
  }
}
