package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class KvTextSourceSpec extends AnyFunSuite {
  import SparkTestSession._

  private def stage(): String = {
    val dir = java.nio.file.Files.createTempDirectory("kvtext")
    java.nio.file.Files.writeString(dir.resolve("m-a-0.txt"),
      "the|1\nfox|1\nmalformed line no pipe\nthe|1\n")
    java.nio.file.Files.writeString(dir.resolve("m-b-0.txt"),
      "dog|1\nthe|1\ntoo|many|pipes\n")
    dir.toString
  }

  test("reads key|value lines, drops malformed, one partition per file") {
    val dir = stage()
    val df = spark.read.format("graft.sources.KvTextSource").load(dir)
    assert(df.schema.fieldNames.toSeq == Seq("key", "value"))
    assert(df.rdd.getNumPartitions == 2)
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(rows.toSeq == Seq(("dog", "1"), ("fox", "1"),
      ("the", "1"), ("the", "1"), ("the", "1")))
  }

  test("column pruning reaches the reader") {
    val dir = stage()
    val slim = spark.read.format("graft.sources.KvTextSource").load(dir)
      .select("key")
    val scan = slim.queryExecution.executedPlan.toString
    assert(scan.contains("readSchema=key"), scan.take(600))
    assert(slim.distinct().count() == 3)
  }

  test("feeds the MR pipeline: group-count equals the wc reduce") {
    val dir = stage()
    val counts = spark.read.format("graft.sources.KvTextSource").load(dir)
      .groupBy("key").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(counts == Map("the" -> 3L, "fox" -> 1L, "dog" -> 1L))
  }
}
