package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the JL audit's arithmetic: a 1-hot vector projects to EXACTLY
  * 1000 permille (every Rademacher entry is ±1, so ‖Rx‖² = k·x_i²),
  * scale invariance, and concentration bounds on the real table. */
class JlDistortionSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def audit(rows: Seq[(Int, Array[Float])]) =
    Embeddings.jlDistortionOn(rows.toDF("label", "embedding"))
      .as[(Int, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("1-hot vectors hit exactly 1000 permille — entries are ±1, " +
      "never 0") {
    // one basis vector per position: ‖Re_i‖² = Σ_p r²_{p,i} = 16
    // exactly iff NO entry degenerates to 0 (the +0.5 offset claim)
    val rows = (0 until 64).map { i =>
      val v = Array.fill(64)(0f); v(i) = 1f; (i % 4, v)
    }
    audit(rows).values.foreach { case (_, mean, min, max) =>
      assert((mean, min, max) == ((1000L, 1000L, 1000L)))
    }
  }

  test("ratio is scale-invariant (R is linear)") {
    val v = Array.tabulate(64)(i => (i + 1).toFloat)
    val m = audit(Seq((1, v), (2, v.map(_ * 100f))))
    assert(m(1) == m(2))
  }

  test("zero vectors are excluded, not divided by") {
    val m = audit(Seq((1, Array.fill(64)(0f)),
      (2, Array.tabulate(64)(_.toFloat))))
    assert(!m.contains(1) && m.contains(2))
  }

  test("real table: every label concentrates near 1000 permille") {
    val rows = Embeddings.jlDistortion(spark, "/root/testdata/sf0.001")
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (label, n, mean, min, max) =>
      assert(n > 0)
      // k=16 concentration: loose but meaningful bounds — a broken
      // projection (wrong k, dropped entries) lands far outside
      assert(mean > 500 && mean < 1500, s"label $label mean $mean")
      // per-vector tails are chi-square-ish with k=16 dof — wide; the
      // observed sf0.001 extreme is ~4.0× (label 3), so bound at 8×
      assert(min > 0 && max < 8000, s"label $label range [$min,$max]")
    }
  }
}
