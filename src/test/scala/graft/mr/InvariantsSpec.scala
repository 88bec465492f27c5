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

  test("rtiming: >=2 REDUCE-stage tasks overlap in time") {
    // The reference's rtiming app demands reduce-phase parallelism
    // specifically (/root/reference/mr-main/test-mr.sh:132-151,
    // mrapps/rtiming.go:64-86) — mtiming's any-two-tasks overlap is
    // satisfiable by map-only concurrency, so this test filters the
    // listener intervals by STAGE and asserts the overlap within the
    // post-shuffle (mapGroups) stage. 16 fixed keys spread over the 4
    // shuffle partitions; each reduce sleeps long enough that serial
    // execution could not interleave. AQE partition coalescing is
    // disabled for the job — it would legitimately fuse the tiny test
    // shuffle into ONE reduce task, which is exactly the degenerate
    // case the reference's probe exists to rule out.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prior = spark.conf.get(coalesceKey)
    val tasks = new ConcurrentLinkedQueue[(Int, Long, Long)]()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.add((t.stageId, t.taskInfo.launchTime, t.taskInfo.finishTime))
    }
    spark.conf.set(coalesceKey, "false")
    spark.sparkContext.addSparkListener(listener)
    try {
      val slowReduce = new MRApp {
        def map(f: String, c: String): Seq[KV] =
          (0 until 16).map(i => KV(s"k$i", "1"))
        def reduce(k: String, v: Seq[String]): String = {
          Thread.sleep(200); v.size.toString
        }
      }
      MRJob.result(spark, slowReduce, s"$booksDir/*.txt").count()
      // 8 map + 4 reduce task ends, delivered async — bounded wait
      val deadline = System.currentTimeMillis() + 10000
      while (tasks.size() < 12 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val all = tasks.toArray(Array.empty[(Int, Long, Long)])
      assert(all.nonEmpty)
      // the map stage launches first, so it owns the minimum stage id;
      // the reduce stage is the LATER stage whose tasks spent the
      // slept reduce time (max summed duration disambiguates it from
      // count()'s final single-task agg stage)
      val mapStage = all.map(_._1).min
      val later = all.filter(_._1 > mapStage).groupBy(_._1)
      assert(later.nonEmpty, s"no post-shuffle stage observed in ${all.toSeq}")
      val reduceTasks = later.maxBy(_._2.map(t => t._3 - t._2).sum)._2
      assert(reduceTasks.length >= 2,
        s"reduce stage ran ${reduceTasks.length} task(s) — no parallelism")
      val overlapping = reduceTasks.exists { a =>
        reduceTasks.exists(b => (a ne b) && a._2 < b._3 && b._2 < a._3)
      }
      assert(overlapping,
        s"no concurrent reduce tasks among ${reduceTasks.toSeq}")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.conf.set(coalesceKey, prior)
    }
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
