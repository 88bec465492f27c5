package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the asymmetry that justifies containment NEXT TO Jaccard: a
  * short doc fully embedded in a long one is flagged by containment
  * and invisible to the symmetric resemblance filter. */
class NgramContainmentSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("nc").toString
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("a short doc embedded in a long doc: containment flags the " +
      "pair, Jaccard (>= 0.5 gate) does not") {
    val short = "alpha beta gamma delta epsilon"
    val long0 = ("zeta eta theta iota kappa lam mu nu xi omicron pi rho " +
      "sigma tau upsilon phi chi psi omega uno dos tres cuatro cinco " +
      short + " seis siete ocho nueve diez once doce trece catorce")
    val dir = writeDocs(Seq(
      (0L, short), (1L, long0),
      (2L, "completely different words here nothing shared at all")))
    val cont = Documents.ngramContainment(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(cont.map(p => (p._1, p._2)).toSeq == Seq((0L, 1L)),
      "exactly the embedded pair must be flagged")
    assert(cont.head._4 == 1000,
      "every shingle of the short doc is in the long one")
    val jac = Documents.ngramJaccard(spark, dir).collect()
    assert(jac.isEmpty,
      "the Jaccard >= 0.5 gate must NOT see the embedded pair " +
        "(that asymmetry is the reason this operator exists)")
  }

  test("self-containment of near-identical docs still fires, and " +
      "cross-source pairs never pair") {
    val t = "one two three four five six seven eight nine ten"
    val dir = java.nio.file.Files.createTempDirectory("nc2").toString
    Seq((0L, t, "en", "srcA", 10L), (1L, t + " eleven", "en", "srcA", 11L),
      (2L, t, "en", "srcB", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cont = Documents.ngramContainment(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(cont.map(p => (p._1, p._2)).toSeq == Seq((0L, 1L)),
      "same-source near-dup pairs; the srcB twin must stay unpaired")
  }
}
