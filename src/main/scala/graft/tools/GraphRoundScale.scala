package graft.tools

import org.apache.spark.sql.functions._

/** Per-round scaling rehearsal for the iterative graph family
  * (round-11 verdict #3): the FULL queries exceed the container past
  * 10× (SCALING.md wave 24 — 8–32 chained rounds of checkpointed
  * state on a single-JVM heap/disk), but the cluster-scale claim is
  * per-round O(E), and ONE round is an ordinary shuffle that fits.
  * This main measures exactly the marginal round the claims are made
  * of, on one scale dir at a time (run 1×/10×/30× in separate JVMs
  * with spill cleanup between — same discipline as make_scale runs):
  *
  *   - kcore peel round: degrees hash-agg → keep filter → two-sided
  *     edge semi-filter (the body of GraphRank.kcoreOn's loop);
  *   - LPA round: neighbor-label join → the two chained hash-aggs
  *     argmax (the body of GraphRank.lpaLabelsOn's loop).
  *
  * The candidate-pair graph build is UNTIMED setup (it has its own
  * measured rows); each round is timed twice, min reported. Prints
  * one JSON line. */
object GraphRoundScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Session.build("graft-graph-round")
    // Probe bracket (same trio as Bench) so the SCALING.md row this
    // run becomes carries its window's host state in-artifact.
    graft.Probes.warm()
    val busyStart = math.min(graft.Probes.busy32(), graft.Probes.busy32())
    val streamStart = graft.Probes.stream32()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // PINNED: the between-attempt freeAll must drop only each timed
    // round's own products, never the shared setup
    val pairs = graft.operators.Materialize.eagerPinned(
      graft.queries.Documents.lshCandidatePairsAmong(docs))
    val edges = graft.operators.Materialize.eagerPinned(
      pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .union(pairs.select(col("doc_b").as("u"), col("doc_a").as("v"))))
    val nEdges = edges.count()

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime
      f
      (System.nanoTime - t0) / 1e9
    }

    // kcore peel round (mirrors kcoreOn's loop body, K=3)
    def peelRound(): Unit = {
      val deg = pairs
        .select(col("doc_a").as("id")).union(pairs.select(col("doc_b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("dg"))
      val keep = graft.operators.Materialize.eager(
        deg.filter(col("dg") >= 3).select(col("id")))
      keep.count()
      val next = graft.operators.Materialize.eager(
        pairs.join(keep.select(col("id").as("doc_a")), "doc_a")
          .join(keep.select(col("id").as("doc_b")), "doc_b")
          .select(col("doc_a"), col("doc_b")))
      next.count()
    }

    // LPA round (mirrors lpaLabelsOn's loop body: join + two chained
    // hash-aggs argmax by (cnt desc, label asc))
    def lpaRound(): Unit = {
      val labels = docs.select(col("doc_id").as("id"),
        col("doc_id").as("label"))
      val nbr = edges
        .join(labels.select(col("id").as("u"), col("label")), "u")
        .select(col("v").as("id"), col("label"))
      val counted = nbr.union(labels)
        .groupBy(col("id"), col("label")).agg(count(lit(1)).as("cnt"))
      val next = graft.operators.Materialize.eagerCheckpoint(
        counted.groupBy(col("id"))
          .agg(min(struct((-col("cnt")).as("nc"), col("label")))
            .as("best"))
          .select(col("id"), col("best.label").as("label")))
      next.count()
    }

    def minOf2(f: () => Unit): Double = {
      val a = timed(f())
      graft.operators.Materialize.freeAll(spark)
      val b = timed(f())
      graft.operators.Materialize.freeAll(spark)
      math.min(a, b)
    }

    val peel = minOf2(() => peelRound())
    val lpa = minOf2(() => lpaRound())
    val busyEnd = math.min(graft.Probes.busy32(), graft.Probes.busy32())
    val streamEnd = graft.Probes.stream32()
    val sched = math.min(graft.Probes.sched16(spark),
      graft.Probes.sched16(spark))
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"dir":"$dir","n_edges":$nEdges,""" +
      s""""peel_round_sec":${fmt(peel)},"lpa_round_sec":${fmt(lpa)},""" +
      s""""busy32":[${fmt(busyStart)},${fmt(busyEnd)}],""" +
      s""""stream32":[${fmt(streamStart)},${fmt(streamEnd)}],""" +
      s""""sched16":${fmt(sched)}}""")
    spark.stop()
  }
}
