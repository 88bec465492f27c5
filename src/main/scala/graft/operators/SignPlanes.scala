package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE definition of the fixed seedless hyperplane family used by
  * every sign-LSH operator (ANN buckets, embedding dedup, sign-IVF):
  * plane p component i = sin(p*1000 + i), dotted with the vector as an
  * in-order double fold. This exact arithmetic is re-expressed in the
  * DuckDB oracle SQL (`Embeddings.planesSql`, `annIvfSql`) — any change
  * here must change those strings too, which is why there is only one
  * Scala copy.
  *
  * Cross-engine sin() caveat, audited: libm/StrictMath sin agree to
  * ~1 ulp, so a sign or probe-order decision could only diverge if a
  * |margin| (or gap between two |margins|) were ~1e-16. Swept at
  * sf0.01: min |margin| = 4.0e-4 across all vectors × 8 planes, min
  * probe-order gap = 2.3e-3 — 12 orders of magnitude of headroom.
  */
object SignPlanes {
  def planeDot(emb: Column, p: Int): Column =
    aggregate(
      zip_with(emb, sequence(lit(0), lit(63)),
        (x, i) => x.cast("double") * sin(lit(p * 1000).cast("double") + i.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
}
