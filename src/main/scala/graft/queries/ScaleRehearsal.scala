package graft.queries

// SCRATCH rehearsal main (not registered; used by SCALING.md waves):
// times each named query once at the 1x dir and once at the Nx dir in
// ONE JVM — matched probes by construction — and prints per-query
// [rehearsal] lines. args: <oneXDir> <nXDir> <query,query,...>
import org.apache.spark.sql.functions._

object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val (one, big, qs) = (args(0), args(1), args(2).split(",").toSeq)
    val spark = graft.Session.build("graft-rehearsal")
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      graft.operators.Materialize.releaseShared(spark)
      graft.operators.Materialize.freeAll(spark)
      System.gc(); Thread.sleep(250)
    }
    def run(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      cleanup()
      dt
    }
    // JVM/codegen warm so the first measured query isn't paying startup
    run(qs.head, one)
    qs.foreach { q =>
      val t1 = run(q, one)
      val tN = run(q, big)
      println(f"[rehearsal] $q 1x=$t1%.2f Nx=$tN%.2f ratio=${tN / t1}%.2f")
    }
    spark.stop()
  }
}
