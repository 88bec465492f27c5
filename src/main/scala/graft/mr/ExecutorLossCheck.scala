package graft.mr

import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession

/** Executor-loss recovery check — the Spark analog of the reference's
  * worker-crash-with-respawn test (/root/reference/mr-main/
  * test-mr.sh:222-271, mrapps/crash.go): the reference kills whole
  * WORKER PROCESSES mid-job and respawns them; the task-retry spec
  * (InvariantsSpec "crash") only throws inside a task, which exercises
  * task re-attempt, not executor loss. Here a map task kills its
  * entire executor JVM (System.exit — the process dies, taking every
  * concurrently-running task with it), and the job must still finish
  * with output equal to the fault-free sequential oracle: Spark marks
  * the executor lost, re-schedules its tasks on the surviving /
  * relaunched executor, and the standalone worker respawns the dead
  * one.
  *
  * Runs as a MAIN in its own JVM because `local-cluster[2,1,1024]`
  * needs multi-process executors and a fresh SparkContext — the test
  * suite's shared local[4] context is JVM-singleton and must not be
  * stopped. ExecutorLossSpec forks this main and asserts on the
  * EXECUTOR_LOSS_OK marker; exit code 0 ⇔ output matched the oracle.
  */
object ExecutorLossCheck {
  def main(args: Array[String]): Unit = {
    val booksDir = args(0)
    // executor processes are spawned by the in-JVM standalone worker:
    // hand them this driver's classpath and the JDK-17 opens Spark
    // needs (spark-submit would inject both; a bare java launch must)
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
    val spark = SparkSession.builder()
      .master(sys.props.getOrElse("graft.test.master", "local-cluster[2,1,1024]"))
      .appName("graft-executor-loss")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.extraJavaOptions", addOpens)
      // the kill below is app-caused, so it counts against
      // spark.task.maxFailures — the default 4 gives the retried
      // attempt plenty of budget
      .getOrCreate()
    val killer = new MRApp {
      def map(f: String, c: String): Seq[KV] = {
        if (f.contains("sherlock") && TaskContext.get().attemptNumber() == 0) {
          // kill the WHOLE executor process, not the task: this is the
          // reference's worker-process crash, not a task exception
          System.err.println("[executor-loss] killing executor " +
            s"${org.apache.spark.SparkEnv.get.executorId} mid-job")
          Runtime.getRuntime.halt(137) // no shutdown hooks — a real crash
        }
        Apps.WordCount.map(f, c)
      }
      def reduce(k: String, v: Seq[String]): String =
        Apps.WordCount.reduce(k, v)
    }
    val got = MRJob.result(spark, killer, s"$booksDir/*.txt")
      .collect().toSeq.sorted
    val inputs = new java.io.File(booksDir).listFiles()
      .sortBy(_.getName).toSeq.map { f =>
        (f.getName,
          new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
      }
    val expected = MRJob.sequential(Apps.WordCount, inputs).sorted
    spark.stop()
    if (got == expected) {
      println(s"EXECUTOR_LOSS_OK ${got.size}")
    } else {
      println(s"EXECUTOR_LOSS_MISMATCH got=${got.size} expected=${expected.size}")
      sys.exit(1)
    }
  }
}
