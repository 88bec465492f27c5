package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins for the matryoshka truncation audit: retained energy must be
  * monotone in k and bounded by the full-vector mass. */
class TruncationEnergySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val d = "/root/testdata/sf0.01"

  test("truncation energy: monotone in k, bounded by 1000 permille, " +
      "covers every label") {
    val rows = Embeddings.truncationEnergy(spark, d)
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (label, n, p16, p32, p48) =>
      assert(n > 0)
      assert(p16 <= p32 && p32 <= p48,
        s"label $label: retained energy must grow with k")
      // per-row snaps round to nearest, so a mean can exceed the true
      // fraction by at most the rounding — never the 1000 ceiling
      assert(p48 <= 1000, s"label $label: energy above total")
      assert(p16 >= 0)
    }
    val nLabels = graft.Tables.embeddings(spark, d)
      .select("label").distinct().count()
    assert(rows.length == nLabels, "every label must be audited")
  }
}
