package graft

import org.apache.spark.sql.SparkSession

/** One shared session for every suite (SparkContext is JVM-singleton).
  * local[4,4]: 4 threads, 4 task-failure retries — the retry budget is
  * what the fault-tolerance suite exercises. */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4,4]")
      .appName("graft-test")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      // mirror Session.build's AQE posture so plan pins (PlanSpec's
      // adaptive/skew-join assertions) test what the driver runs with
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val booksDir: String = getClass.getResource("/books").getPath
  val creditDir: String = getClass.getResource("/credit-score").getPath

  /** Load the book fixtures driver-side for sequential oracles. */
  def booksLocal(): Seq[(String, String)] = {
    val dir = new java.io.File(booksDir)
    dir.listFiles().sortBy(_.getName).toSeq.map { f =>
      (f.getName, new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    }
  }
}
