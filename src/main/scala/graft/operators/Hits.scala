package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (hubs-and-authorities) by power iteration — the second classic
  * link-analysis recurrence next to [[PageRank]], and the one that
  * fits a BIPARTITE doc↔content graph natively: documents only point
  * (hub side), content groups only get pointed at (authority side),
  * so a doc's hub score is "how much heavily-duplicated content does
  * this doc carry" — the dup-centrality complement to PageRank's
  * "how much does the corpus point at this doc's content".
  * (Kleinberg, "Authoritative sources in a hyperlinked environment",
  * JACM 1999 — public algorithm.)
  *
  * Fixed-point arithmetic, same stance as [[PageRank.Scale]]: scores
  * are BIGINT mass in units of 1e-12 and every step is integer-only,
  * so results are bit-identical on any engine and the cross-engine
  * oracle compares EXACTLY. HITS needs a per-round normalization
  * (the raw recurrence grows without bound); the usual L2 norm is a
  * double sqrt — not cross-engine exact — so normalization here is
  * integer L1-style: divide every score by q = max(1, Σscores DIV
  * Scale). q is exact floor division on both engines, total mass
  * returns to ≈Scale (within a per-node truncation slack both
  * engines share), and relative order — what callers rank by — is
  * untouched because every score is divided by the SAME q.
  *
  * Overflow audit (why plain int64 suffices): after normalization
  * Σh ≤ Scale ≈ 1e12, so a raw authority Σ_{u→v} h(u) ≤ 1e12 and the
  * global raw total Σ_v a_raw(v) = Σ_u h(u)·outdeg(u) ≤ Scale·maxdeg
  * ≈ 1e16 ≪ 2⁶³ — every SUM stays exactly representable.
  *
  * Scale shape: edges are deduped, materialized once, pre-partitioned
  * by src; each iteration is two O(E) hash joins + two hash-aggs, and
  * the two 1-row normalizers combine via crossJoin(broadcast(·)) (the
  * whitelisted 1-row-broadcast pattern) — no driver-side action in
  * the whole loop. Each half-round's raw-sum frame is
  * localCheckpoint'ed because it has two consumers (its normalizer
  * and the next half-round's divide) — lazy, the O(E) join+agg would
  * re-run per consumer; the previous snapshot is freed as soon as its
  * successor materializes, so executor storage holds ≤2 snapshots.
  */
object Hits {
  /** Score unit: 1 point = 1e-12 of total initial hub mass. */
  val Scale: Long = 1000000000000L

  /** `edges`: (src: Long, dst: Long) directed hub→authority edges
    * (duplicates collapsed here — each dup would double-count mass).
    * Returns one row per hub node: (id, hub_fp), unit [[Scale]]⁻¹. */
  def run(edges0: DataFrame, nIter: Int): DataFrame = {
    require(nIter >= 1, s"nIter must be >= 1, got $nIter")
    val spark = edges0.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val edges = Materialize.eager(
      edges0.toDF("src", "dst").distinct().repartition(par, col("src")))
    val nHubs = edges.select(col("src")).distinct()
      .agg(count(lit(1)).as("n"))
    var h = Materialize.eagerCheckpoint(
      edges.select(col("src").as("id")).distinct()
        .crossJoin(broadcast(nHubs))
        .select(col("id"), expr(s"${Scale}L DIV n").as("hub_fp")))
    var lastCk = h
    for (i <- 1 to nIter) {
      // each raw-sum frame has TWO consumers — its 1-row normalizer
      // and the divide feeding the next half-round — so it is
      // checkpointed once instead of re-running the O(E) join+agg per
      // consumer (A/B at sf0.1: 6.4 → ~3 s for 4 rounds)
      val aRaw = Materialize.eagerCheckpoint(
        edges.join(h.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst")).agg(sum(col("hub_fp")).as("ar")))
      Materialize.free(lastCk)
      val qa = aRaw.agg(
        greatest(lit(1L), expr(s"sum(ar) DIV ${Scale}L")).as("q"))
      val auth = aRaw.crossJoin(broadcast(qa))
        .select(col("dst"), expr("ar DIV q").as("a"))
      val hRaw = Materialize.eagerCheckpoint(
        edges.join(auth, "dst")
          .groupBy(col("src")).agg(sum(col("a")).as("hr")))
      Materialize.free(aRaw)
      val qh = hRaw.agg(
        greatest(lit(1L), expr(s"sum(hr) DIV ${Scale}L")).as("q"))
      // the normalized frame itself has ONE consumer per round (the
      // next aRaw join, or the caller) — left lazy on top of hRaw
      h = hRaw.crossJoin(broadcast(qh))
        .select(col("src").as("id"), expr("hr DIV q").as("hub_fp"))
      lastCk = hRaw
    }
    Materialize.free(edges)
    h
  }
}
