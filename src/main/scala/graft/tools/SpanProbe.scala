package graft.queries
// measurement scratch for the r12 wave-6 regression bisect (tools/)

import org.apache.spark.sql.functions._

object SpanProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.Session.build("graft-span-probe")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def narrowPlan = graft.Tables.documents(s, d).select(col("doc_id"),
        size(Documents.tokens(col("text"))).as("n"),
        posexplode(Documents.shingles3(col("text"))).as(Seq("p", "g")))
      .select(col("doc_id"), col("n"),
        (col("p") + 1).cast("int").as("pos"), col("g"))
    def widePlan = {
      val base = graft.Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .withColumn("n", size(Documents.tokens(col("text"))))
      base.select(col("doc_id"), col("n"),
          posexplode(Documents.shingles3(col("text"))).as(Seq("p", "g")))
        .withColumn("pos", (col("p") + 1).cast("int"))
    }
    for (r <- 1 to 2) {
      println(s"--- round $r ---")
      val a = time("eager(narrow)") {
        graft.operators.Materialize.eager(narrowPlan) }
      val b = time("eagerPinned(narrow)") {
        graft.operators.Materialize.eagerPinned(narrowPlan) }
      val c = time("eager(wide r11 form)") {
        graft.operators.Materialize.eager(widePlan) }
      val e = time("eager(wide form + narrow projection)") {
        graft.operators.Materialize.eager(widePlan.select(
          col("doc_id"), col("n"), col("pos"), col("g"))) }
      println(s"[probe] rows ${a.count()} ${b.count()} ${c.count()}")
      println(s"[probe] partitions a=${a.rdd.getNumPartitions} " +
        s"b=${b.rdd.getNumPartitions} c=${c.rdd.getNumPartitions}")
      graft.operators.Materialize.unpin(b)
      graft.operators.Materialize.freeAll(s)
    }
    s.stop()
  }
}
