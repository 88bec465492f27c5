package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the simplified silhouette on planted 2-d points at
  * hand-computable distances from the seed centers (vec_id 0 and 64
  * under the every-64th-below-512 seeding rule): the s = 1 − a/b
  * milli snap, the equidistant tie (s = 0, counted ambiguous), the
  * centers themselves (s = 1000), and the integer mean. */
class SilhouetteSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("planted two-center corpus: exact milli scores per cell") {
    // centers: 0 → (0,0), 64 → (10,0)
    // id 1 (1,0): a=1, b=9  → 1 − 1/9  = 0.8889 → 889
    // id 2 (5,0): a=b=5 (tie → cell 0) → 0 (ambiguous)
    // id 3 (4,0): a=4, b=6  → 1 − 4/6  = 0.3333 → 333
    // centers score 1000 in their own cells
    val e = Seq(
      (0L, Array(0f, 0f)), (64L, Array(10f, 0f)),
      (1L, Array(1f, 0f)), (2L, Array(5f, 0f)), (3L, Array(4f, 0f))
    ).toDF("vec_id", "embedding")
    val r = Embeddings.silhouetteOn(e)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      // cell 0: sm {1000, 889, 0, 333} → mean 2222 DIV 4 = 555
      (0L, 4L, 555L, 0L, 1L),
      (64L, 1L, 1000L, 1000L, 0L)))
  }

  test("single center: b is undefined, every score guards to 0") {
    val e = Seq((0L, Array(0f, 0f)), (1L, Array(3f, 4f)))
      .toDF("vec_id", "embedding")
    val r = Embeddings.silhouetteOn(e)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 2L, 0L, 0L, 2L)))
  }

  test("ivf incremental: a drifting ingest batch shifts share into " +
      "the cell it lands in, exactly") {
    // centers (old-side seeds): 0 → (0,0), 64 → (100,0).
    // old: ids 0,1,2 near center 0; 64,65,66 near center 64 → 3/3,
    // shares 500/500. new batch (ids %10==9): 9,19,29 all near center
    // 64 → 0/3, shares 0/1000 → shift −500/+500.
    val e = Seq(
      (0L, Array(0f, 0f)), (1L, Array(1f, 0f)), (2L, Array(2f, 0f)),
      (64L, Array(100f, 0f)), (65L, Array(99f, 0f)),
      (66L, Array(101f, 0f)),
      (9L, Array(98f, 0f)), (19L, Array(102f, 0f)),
      (29L, Array(100f, 1f))
    ).toDF("vec_id", "embedding")
    val r = Embeddings.ivfIncrementalAssignOn(e)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (0L, 3L, 0L, 500L, 0L, -500L),
      (64L, 3L, 3L, 500L, 1000L, 500L)))
  }

  test("reciprocal knn: only mutual pairs survive — the hub's " +
      "one-directional admirers are rejected") {
    // cell 0: center 0 at origin, A(5,0), B(6,0), C(20,0).
    // NN: 0->A, A->B, B->A, C->B. Only (A,B) reciprocates (d2=1).
    // cell 64: a single point has no neighbor at all.
    val e = Seq(
      (0L, Array(0f, 0f)), (1L, Array(5f, 0f)), (2L, Array(6f, 0f)),
      (3L, Array(20f, 0f)), (64L, Array(100f, 0f))
    ).toDF("vec_id", "embedding")
    val r = Embeddings.reciprocalKnnOn(e)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 1L, 2L, 1000000L, 0L)))
  }

  test("cell purity: majority shares per cell plus the weighted " +
      "corpus row; count ties break on the smaller label") {
    // cell 0 (center at origin): labels {7, 7, 8} -> purity 666;
    // cell 64: labels {9, 9} -> 1000; corpus: 4 of 5 -> 800
    val e = Seq(
      (0L, Array(0f, 0f), 7), (1L, Array(1f, 0f), 7),
      (2L, Array(2f, 0f), 8),
      (64L, Array(100f, 0f), 9), (65L, Array(99f, 0f), 9)
    ).toDF("vec_id", "embedding", "label")
    val r = Embeddings.cellPurityOn(e)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (-1L, 5L, 3L, -1L, 4L, 800L),
      (0L, 3L, 2L, 7L, 2L, 666L),
      (64L, 2L, 1L, 9L, 2L, 1000L)))
  }

  test("cell NMI: perfect cell/label alignment scores 1000 milli, an " +
      "orthogonal split scores 0") {
    val aligned = Seq(
      (0L, Array(0f, 0f), 7), (1L, Array(1f, 0f), 7),
      (64L, Array(100f, 0f), 9), (65L, Array(99f, 0f), 9)
    ).toDF("vec_id", "embedding", "label")
    val a = Embeddings.cellNmiOn(aligned)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    // every I and H term is the same ln2 floor, so NMI is EXACTLY 1000
    assert(a._1 == 4L && a._2 == 2L && a._3 == 2L && a._7 == 1000L, a)
    // both labels split evenly across both cells: I = ln(1) = 0
    val ortho = Seq(
      (0L, Array(0f, 0f), 7), (1L, Array(1f, 0f), 8),
      (64L, Array(100f, 0f), 7), (65L, Array(99f, 0f), 8)
    ).toDF("vec_id", "embedding", "label")
    val o = Embeddings.cellNmiOn(ortho)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(o._4 == 0L && o._7 == 0L, o)
  }
}
