package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins for the sign-plane (portable) ANN tier:
  *  - dedup_embedding_lsh's candidate set is a subset of brute-force
  *    pairs and loses nothing at the 0.99 threshold on the fixture
  *    (same-bucket ⊂ all-pairs; the oracle re-checks exact values);
  *  - searchSign probes a strict subset of cells yet keeps recall.
  */
class SignAnnSpec extends AnyFunSuite {
  import SparkTestSession._

  private val d = "/root/testdata/sf0.001"

  test("LSH embedding dedup = brute-force pairs at threshold (fixture)") {
    val lsh = graft.queries.Embeddings.dedupEmbeddingLsh(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = graft.queries.Embeddings.dedupEmbeddingCosine(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute), s"LSH found non-brute pairs: ${lsh -- brute}")
    assert(lsh == brute,
      s"bucketing dropped qualifying pairs on this fixture: ${brute -- lsh}")
  }

  test("LSH embedding dedup finds planted near-duplicates") {
    import SparkTestSession.spark.implicits._
    // 30 random unit-ish vectors + 5 near-copies (1e-4 perturbation of
    // ids 0..4, as ids 100..104): cosine(orig, copy) ≈ 1 >> 0.99, and
    // the perturbation can't flip a sign-plane margin, so the LSH path
    // must find exactly those 5 pairs — a non-vacuous positive check.
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0L until 30L).map(i => (i, s"l${i % 3}", vec()))
    val dups = base.take(5).map { case (i, l, v) =>
      (i + 100L, l, v.map(x => x + 1e-4f)) }
    val e = (base ++ dups).toDF("vec_id", "label", "embedding")
    val got = graft.queries.Embeddings.dedupEmbeddingLshOn(spark, e)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 5L).map(i => (i, i + 100L)).toSet
    assert(got == expected, s"got $got")
    val brute = graft.queries.Embeddings.dedupEmbeddingCosineOn(spark, e)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute)
  }

  test("sign-quantized IVF: 8 cells, multi-probe recall vs brute top-k") {
    val e = graft.Tables.embeddings(spark, d)
    val index = IvfIndex.buildSign(e)
    assert(index.select("cell").distinct().count() <= 8)
    val queries = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val approx = IvfIndex.searchSign(index, queries, k = 5, nProbe = 3,
      excludeSelf = true)
      .select("q_id", "c_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exact = graft.queries.Embeddings.cosineTopK(spark, d)
      .select("q_id", "c_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recalls = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.5, f"mean recall@5 = $meanRecall%.2f")
    assert(approx.keySet == exact.keySet)
  }

  test("int8-quantized bucket ANN: recall vs brute top-k, and integer " +
      "scores bounded by 64*127^2") {
    val approx = graft.queries.Embeddings.annQuantized(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(approx.nonEmpty)
    assert(approx.forall(r => math.abs(r._3) <= 64L * 127 * 127))
    val byQ = approx.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val exact = graft.queries.Embeddings.cosineTopK(spark, d)
      .select(col("q_id"), col("c_id")).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recalls = exact.map { case (q, truth) =>
      byQ.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val meanRecall = recalls.sum / recalls.size
    // single-probe 4-cell coarse quantizer + int8 scores: recall is
    // the approximation knob, pinned so a regression (e.g. a broken
    // quantizer collapsing buckets) fails loudly
    assert(meanRecall >= 0.4, f"mean recall@5 = $meanRecall%.2f")
  }
}
