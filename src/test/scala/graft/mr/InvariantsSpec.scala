package graft.mr

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.util.LongAccumulator
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Behavioral invariants from the reference harness, re-expressed
  * against Spark's scheduler (SURVEY.md §5.1):
  *  - jobcount  → exactly one map execution per input when fault-free
  *  - mtiming   → ≥2 map tasks run concurrently
  *  - crash     → a first-attempt-throwing map still yields correct
  *                output via task retry (spark.task.maxFailures = 4
  *                from the local[4,4] master)
  *  - early_exit→ output visible ⇒ output complete (commit protocol)
  */
class InvariantsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("jobcount: each input mapped exactly once when fault-free") {
    val calls: LongAccumulator = spark.sparkContext.longAccumulator("mapCalls")
    val counting = new MRApp {
      def map(f: String, c: String): Seq[KV] = {
        calls.add(1); Apps.WordCount.map(f, c)
      }
      def reduce(k: String, v: Seq[String]): String =
        Apps.WordCount.reduce(k, v)
    }
    val n = MRJob.result(spark, counting, s"$booksDir/*.txt").count()
    assert(n > 0)
    assert(calls.value == 8, s"expected 8 map invocations, got ${calls.value}")
  }

  test("mtiming: >=2 map tasks overlap in time") {
    val intervals = new ConcurrentLinkedQueue[(Long, Long)]()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val info = t.taskInfo
        intervals.add((info.launchTime, info.finishTime))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val slowed = new MRApp {
        def map(f: String, c: String): Seq[KV] = {
          Thread.sleep(300); Apps.WordCount.map(f, c)
        }
        def reduce(k: String, v: Seq[String]): String =
          Apps.WordCount.reduce(k, v)
      }
      MRJob.result(spark, slowed, s"$booksDir/*.txt").count()
      // listener events are async; poll until the 8 map + reduce task
      // ends have been delivered (bounded wait)
      val deadline = System.currentTimeMillis() + 10000
      while (intervals.size() < 8 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val iv = intervals.toArray(Array.empty[(Long, Long)])
      val overlapping = iv.exists { a =>
        iv.exists(b => (a ne b) && a._1 < b._2 && b._1 < a._2)
      }
      assert(overlapping, s"no concurrent tasks among ${iv.length}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("crash: first-attempt map failure is retried to correct output") {
    val crashy = new MRApp {
      def map(f: String, c: String): Seq[KV] = {
        // Deterministic single-file crash on first attempt — the
        // crash.go probe without the randomness (retry must mask it).
        if (f.contains("sherlock") && TaskContext.get().attemptNumber() == 0)
          throw new RuntimeException("injected map fault")
        Apps.MetadataAgg.map(f, c)
      }
      def reduce(k: String, v: Seq[String]): String =
        Apps.MetadataAgg.reduce(k, v)
    }
    val expected = MRJob.sequential(Apps.MetadataAgg, booksLocal()).sorted
    val got = MRJob.result(spark, crashy, s"$booksDir/*.txt")
      .collect().toSeq.sorted
    assert(got == expected, "crashy run must equal fault-free oracle")
  }

  test("early_exit: written output is complete and atomic") {
    val out = java.nio.file.Files.createTempDirectory("earlyexit").toString
    MRJob.run(spark, Apps.FileCount, s"$booksDir/*.txt", out)
    // write() returned -> _SUCCESS present, no in-progress temp files,
    // content equals oracle (visible == complete).
    val files = new java.io.File(out).listFiles().map(_.getName)
    assert(files.contains("_SUCCESS"))
    assert(!files.exists(_.startsWith("_temporary")))
    val got = spark.read.text(out).collect().map(_.getString(0)).toSeq.sorted
    assert(got == MRJob.sequential(Apps.FileCount, booksLocal()).sorted)
  }
}
