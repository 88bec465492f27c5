package graft
/** Dumps formatted physical plans for the headline queries — run with
  * an output file arg to regenerate PLANS.md. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = Session.build("plans")
    val d = "/root/testdata/sf0.01"
    val names = Seq("q1_pricing_summary", "q3_shipping_priority",
      "q5_local_supplier_volume", "q6_revenue_forecast", "doc_wordcount",
      "emb_cosine_topk", "asof_native", "dedup_lsh_pairs", "sort_topk")
    val out = new StringBuilder
    out ++= "# PLANS — formatted physical plans for headline queries\n\n"
    out ++= "Regenerate: `sbt \"runMain graft.PlanCheck PLANS.md\"` " +
      "(sf0.01; plan shapes are pinned by PlanSpec).\n"
    for (n <- names) {
      val p = SparkEntry.queries(n)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      out ++= s"\n## $n\n\n```\n$p```\n"
      println(s"===== $n")
      println(p)
    }
    if (args.nonEmpty)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(args(0)), out.toString)
    spark.stop()
  }
}
