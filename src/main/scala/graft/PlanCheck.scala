package graft
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = Session.build("plans")
    val d = "/root/testdata/sf0.01"
    for (n <- Seq("q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume", "q6_revenue_forecast", "doc_wordcount", "emb_cosine_topk")) {
      println(s"===== $n")
      println(SparkEntry.queries(n)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
