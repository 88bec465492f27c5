package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class SkewJoinSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("salted count equals plain count under heavy skew") {
    val skewed = (Seq.fill(5000)("hot") ++ (1 to 500).map(i => s"k$i"))
      .toDF("key")
    val got = SkewJoin.saltedCount(skewed, col("key"), buckets = 8)
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exp = skewed.groupBy(col("key").as("k")).agg(count(lit(1)).as("n"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exp)
  }

  test("salted join equals plain join under heavy skew") {
    val big = (Seq.fill(3000)(("hot", 1)) ++ (1 to 200).map(i => (s"k$i", i)))
      .toDF("key", "v")
    val small = (Seq(("hot", 99)) ++ (1 to 200).map(i => (s"k$i", i * 10)))
      .toDF("key", "w")
    val got = SkewJoin.saltedJoin(big, small, "key", buckets = 8)
      .groupBy("key").agg(count(lit(1)).as("n"), sum("w").as("sw"))
      .orderBy("key").collect().toSeq
    val exp = big.join(small, "key")
      .groupBy("key").agg(count(lit(1)).as("n"), sum("w").as("sw"))
      .orderBy("key").collect().toSeq
    assert(got == exp)
  }
}
