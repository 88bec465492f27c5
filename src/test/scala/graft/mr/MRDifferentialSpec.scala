package graft.mr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Reference test strategy §5: three-way differential — distributed
  * runJob ≡ sequential oracle ≡ idiomatic DataFrame twin, compared as
  * sorted line bags (mirroring `sort mr-out* | cmp`,
  * /root/reference/mr-main/test-mr.sh:58-66). */
class MRDifferentialSpec extends AnyFunSuite {
  import SparkTestSession._

  private def distributed(app: MRApp): Seq[String] =
    MRJob.result(spark, app, s"$booksDir/*.txt").collect().toSeq.sorted

  private def seqOracle(app: MRApp): Seq[String] =
    MRJob.sequential(app, booksLocal()).sorted

  test("wordcount: distributed == sequential oracle") {
    assert(distributed(Apps.WordCount) == seqOracle(Apps.WordCount))
  }

  test("wordcount: DataFrame twin agrees") {
    val df = spark.read.option("wholetext", "true").text(s"$booksDir/*.txt")
      .select(explode(split(col("value"), "[^\\p{L}]+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).count()
      .select(concat_ws(" ", col("word"), col("count")))
      .as(spark.implicits.newStringEncoder)
    assert(df.collect().toSeq.sorted == seqOracle(Apps.WordCount))
  }

  test("indexer: distributed == sequential oracle") {
    assert(distributed(Apps.Indexer) == seqOracle(Apps.Indexer))
  }

  test("indexer: DataFrame twin agrees") {
    val df = spark.read.option("wholetext", "true").text(s"$booksDir/*.txt")
      .select(
        element_at(split(input_file_name(), "/"), -1).as("doc"),
        explode(split(col("value"), "[^\\p{L}]+")).as("word"))
      .filter(length(col("word")) > 0)
      .distinct()
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"),
        concat_ws(",", sort_array(collect_set(col("doc")))).as("docs"))
      .select(concat_ws(" ", col("word"), col("n"), col("docs")))
      .as(spark.implicits.newStringEncoder)
    assert(df.collect().toSeq.sorted == seqOracle(Apps.Indexer))
  }

  test("metadata agg (crash/nocrash payload): three-way agreement") {
    assert(distributed(Apps.MetadataAgg) == seqOracle(Apps.MetadataAgg))
  }

  test("file count (early_exit payload): distributed == sequential") {
    assert(distributed(Apps.FileCount) == seqOracle(Apps.FileCount))
  }

  test("runJob output is invariant under nReduce") {
    import java.nio.file.Files
    val lines = (for (n <- Seq(1, 5, 10)) yield {
      val out = Files.createTempDirectory(s"mrout$n").toString
      MRJob.run(spark, Apps.WordCount, s"$booksDir/*.txt", out, nReduce = n)
      val read = spark.read.text(out).collect().map(_.getString(0)).toSeq.sorted
      assert(new java.io.File(out, "_SUCCESS").exists(),
        "atomic commit marker missing")
      read
    }).distinct
    assert(lines.size == 1, "output must not depend on reduce fan-in")
  }
}
