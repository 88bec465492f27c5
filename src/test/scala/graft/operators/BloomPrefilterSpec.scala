package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class BloomPrefilterSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def keyed(ids: Seq[Int], tag: String) =
    ids.map(i => (i.toLong, s"$tag-$i")).toDF("id", "k")

  test("semiJoin equals the plain semi join — false positives confirmed away") {
    // corpus keys c-0..c-499; batch carries 50 true members (same key
    // text) + 450 non-members
    val corpus = keyed(0 until 500, "c")
    val batch = keyed(0 until 50, "c")
      .union(keyed(0 until 450, "x"))
    val got = BloomPrefilter.semiJoin(batch, col("k"), corpus, col("k"),
      expectedItems = 1000L, fpp = 0.05)
      .select("id", "k").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val exact = batch.join(corpus.select(col("k")).distinct(), Seq("k"), "left_semi")
      .select("id", "k").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(got.toSeq == exact.toSeq)
    assert(got.length == 50)
  }

  test("prefilter never loses a true member and prunes most non-members") {
    val corpus = keyed(0 until 500, "c")
    val members = keyed(0 until 100, "c")
    val strangers = keyed(0 until 2000, "z")
    // no false negatives — every true member survives the sketch
    assert(BloomPrefilter.prefilter(members, col("k"), corpus, col("k"),
      1000L, 0.01).count() == 100L)
    // pruning actually happens: at fpp=1% the 2000 strangers shrink to
    // ~20; the sketch build is deterministic for fixed input, so this
    // bound is stable, not flaky (generous 5x headroom regardless)
    val survivors = BloomPrefilter.prefilter(strangers, col("k"),
      corpus, col("k"), 1000L, 0.01).count()
    assert(survivors <= 100L, s"bloom pruned too little: $survivors/2000")
  }

  test("probe is the native might_contain expression, not a UDF") {
    // the pre-filter's point is keeping rows OUT of the shuffle at scan
    // speed — the probe must sit inside the scan's codegen span as
    // Spark's native BloomFilterMightContain, not a boxed Scala UDF.
    // range-backed sides: a LocalRelation fixture would let
    // ConvertToLocalRelation fold the entire probe at planning time
    // and leave nothing to pin
    def ranged(n: Int) = spark.range(n.toLong)
      .select(col("id"), concat(lit("c-"), col("id")).as("k"))
    val plan = BloomPrefilter.prefilter(ranged(50), col("k"),
      ranged(500), col("k"), 1000L, 0.01)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no native probe in:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython") &&
      !plan.contains("UDF"), s"UDF probe leaked into:\n$plan")
  }

  test("null batch keys never probe (and never crash) the sketch") {
    val corpus = keyed(0 until 10, "c")
    val batch = Seq((1L, "c-1"), (2L, null.asInstanceOf[String]))
      .toDF("id", "k")
    val got = BloomPrefilter.semiJoin(batch, col("k"), corpus, col("k"),
      100L, 0.01).select("id").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }
}
