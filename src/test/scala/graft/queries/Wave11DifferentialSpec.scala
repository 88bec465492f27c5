package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Differential tests for the wave-11 math: the engine's integer-grid
  * Gini and isotropy are recomputed by independent brute-force Scala
  * mirrors (O(n log n) sort formula; O(n²·d) literal pair loop) on
  * seeded random fixtures — the planted-fixture specs pin hand-sized
  * cases, these pin the formulas at arbitrary shapes. */
class Wave11DifferentialSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("gini: engine matches the BigInt rank-formula brute force on " +
      "3 seeded random event fixtures") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val rows = (1 to 25).flatMap { u =>
        val n = 1 + rnd.nextInt(9)
        (0 until n).map { i =>
          val isBuy = rnd.nextInt(4) == 0
          (u * 100L + i,
            new java.sql.Timestamp((u * 3600L + i * 60) * 1000L),
            u.toLong,
            if (isBuy) "purchase" else "view",
            if (isBuy) (1 + rnd.nextInt(500)) / 100.0 else 0.0,
            "{}")
        }
      }
      val dir = java.nio.file.Files.createTempDirectory(s"gd$trial").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

      def brute(xs: Seq[Long]): (Long, Long, Long) = {
        val s = xs.sorted
        val n = BigInt(s.size)
        val tot = BigInt(s.map(BigInt(_)).sum.toLong)
        val ix = s.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
        val g = (BigInt(2) * ix - (n + 1) * tot) * 1000000 / (n * tot)
        (n.toLong, tot.toLong, g.toLong)
      }
      val evCounts = rows.groupBy(_._3).values.map(_.size.toLong).toSeq
      val spend = rows.filter(_._4 == "purchase")
        .groupBy(_._3).values
        .map(_.map(r => math.floor(r._5 * 100 + 0.5).toLong).sum)
        .filter(_ > 0).toSeq
      val got = ProductAnalytics.giniConcentration(spark, dir)
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      assert(got("events") == brute(evCounts), s"trial $trial events")
      if (spend.nonEmpty)
        assert(got("purchase_cents") == brute(spend), s"trial $trial spend")
    }
  }

  test("isotropy: engine matches a literal O(n^2 d) pair loop on the " +
      "same integer grid, per label and ALL, on a seeded fixture") {
    val rnd = new scala.util.Random(7)
    val dim = 4
    val vecs = (0L until 30L).map { id =>
      (id, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat),
        (id % 3).toInt)
    }
    val dir = java.nio.file.Files.createTempDirectory("iso2").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // mirror the engine's grid: e3 components -> exact norm -> e3 unit
    def unit(v: Array[Float]): Option[Array[Long]] = {
      val xe3 = v.map(x => math.floor(x.toDouble * 1e3 + 0.5).toLong)
      val n2 = xe3.map(x => x * x).sum
      if (n2 <= 0) None
      else Some(xe3.map(x =>
        math.floor(x.toDouble * 1000.0 / math.sqrt(n2.toDouble) + 0.5).toLong))
    }
    def brute(us: Seq[Array[Long]]): (Long, Long, Long) = {
      val n = us.size
      var pairSum = BigInt(0)
      for (i <- us.indices; j <- us.indices if i != j)
        pairSum += (0 until dim).map(k => BigInt(us(i)(k)) * us(j)(k)).sum
      val mean = pairSum / (BigInt(n) * (n - 1))
      val s = (0 until dim).map(k => us.map(_(k)).sum)
      val ss = s.map(x => BigInt(x) * x).sum
      val norm = math.floor(
        math.sqrt(ss.toDouble) / n).toLong
      (n.toLong, mean.toLong, norm)
    }
    val units = vecs.flatMap { case (_, v, l) => unit(v).map(l -> _) }
    val expect = (units.groupBy(_._1)
      .map { case (l, vs) => l.toString -> brute(vs.map(_._2)) } +
      ("ALL" -> brute(units.map(_._2)))).toMap
    val got = EmbeddingAudit.isotropy(spark, dir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (l, e) => assert(got(l) == e, s"label $l") }
  }
}
