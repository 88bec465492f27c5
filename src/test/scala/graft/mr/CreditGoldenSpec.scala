package graft.mr

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The reference's one "real" relational query (credit.go +
  * test-mr-app.sh): filter year==2023 && score>400, group by agency,
  * count. Golden is the sequential oracle over the checked-in CSVs;
  * distributed MRJob and the idiomatic DataFrame query must both match. */
class CreditGoldenSpec extends AnyFunSuite {
  import SparkTestSession._

  private def creditLocal(): Seq[(String, String)] = {
    val dir = new java.io.File(creditDir)
    dir.listFiles().sortBy(_.getName).toSeq.map { f =>
      (f.getName, new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    }
  }

  test("credit: distributed MRJob == sequential golden") {
    val golden = MRJob.sequential(Apps.Credit, creditLocal()).sorted
    assert(golden.nonEmpty, "fixture must produce non-empty golden")
    val got = MRJob.result(spark, Apps.Credit, s"$creditDir/*.csv")
      .collect().toSeq.sorted
    assert(got == golden)
  }

  test("credit: DataFrame query (csv reader, DROPMALFORMED) agrees") {
    val schema = StructType(Seq(
      StructField("user_id", IntegerType),
      StructField("agency", StringType),
      StructField("year", IntegerType),
      StructField("credit_score", IntegerType)))
    val golden = MRJob.sequential(Apps.Credit, creditLocal()).sorted
    val got = spark.read
      .option("header", "true").option("mode", "DROPMALFORMED")
      .schema(schema)
      .csv(s"$creditDir/*.csv")
      .filter(col("year") === 2023 && col("credit_score") > 400)
      .groupBy(col("agency")).count()
      .select(concat_ws(" ", col("agency"), col("count")))
      .as(spark.implicits.newStringEncoder)
      .collect().toSeq.sorted
    assert(got == golden)
  }
}
