package graft.tools

import org.apache.spark.sql.DataFrame
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
  * measured rows) and is staged to PARQUET, not pinned blocks: at 30×
  * the pair+edge tables held as deserialized block-store rows plus a
  * timed round's shuffle exceeded any single-JVM heap tried (24–56 g
  * OOM), while on a cluster the pair table of a 100 TB corpus is a
  * TABLE read per round, not resident memory. Timing the round
  * against a columnar scan is therefore the faithful shape, and it
  * makes the three scales comparable under one memory policy. The
  * explicit repartition before the write matters for the same reason
  * it does in [[graft.queries.Documents.lshCandidatePairs]]: the band
  * join's AQE-coalesced output (sized by its tiny shuffle INPUT, not
  * the sum-of-bucket² expansion) landed the 10× table in ~4 partitions
  * of 3.9 GiB, and every timed round paid a 4-task disk scan of the
  * big side (LPA round measured 132 s vs ~18 s with a sane layout).
  *
  * The optional second arg sets spark.sql.shuffle.partitions for the
  * timed rounds — pass it proportional to the scale factor (32 at 1×,
  * 320 at 10×, 960 at 30×) so per-partition work stays CONSTANT
  * across scales, which is the cluster invariant the exponent is
  * supposed to test: a 1000-executor cluster sizes partitions to the
  * data, while a fixed 32 here pushes the 10×+ hash-aggs over the
  * spill cliff (4.7 M rows/partition) and reads as a fake
  * superlinearity that no cluster deployment would see (AQE coalesces
  * the small scales back down, so the 1× setting is cosmetic).
  *
  * Each round is timed `attempts` times (third arg, default 4) with a
  * freeAll between draws; the min AND the full spread are printed, so
  * the artifact shows how noisy the window was. One JSON line. */
object GraphRoundScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Session.build("graft-graph-round")
    args.drop(1).headOption.foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n.toInt))
    // Pin the SHUFFLE-join plan for the timed rounds: at bench SF the
    // label side (one row per doc) sits near the broadcast threshold
    // and the plan flips run-to-run on estimate jitter (measured LPA
    // round 1.7 s broadcast vs 6.4 s SMJ at 1×). At the 100 TB scale
    // these exponents argue about, a per-doc frame never broadcasts —
    // the shuffle join IS the claimed shape, so measure that one at
    // every scale.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // Probe bracket (same trio as Bench) so the SCALING.md row this
    // run becomes carries its window's host state in-artifact.
    graft.Probes.warm()
    val busyStart = math.min(graft.Probes.busy32(), graft.Probes.busy32())
    val streamStart = graft.Probes.stream32()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val stage = java.nio.file.Files
      .createTempDirectory("graft-round-scale").toString
    val par = spark.sparkContext.defaultParallelism * 4
    graft.queries.Documents.lshCandidatePairsAmong(docs)
      .repartition(par)
      .write.mode("overwrite").parquet(s"$stage/pairs.parquet")
    val pairs = spark.read.parquet(s"$stage/pairs.parquet")
    pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .repartition(par)
      .write.mode("overwrite").parquet(s"$stage/edges.parquet")
    val edges = spark.read.parquet(s"$stage/edges.parquet")
    val nEdges = edges.count()
    val nPart = edges.rdd.getNumPartitions

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime
      f
      (System.nanoTime - t0) / 1e9
    }

    // ONE peel-round body (mirrors kcoreOn's loop: degree agg →
    // keep-filter → both semi-filter joins, K=3), shared by both timed
    // variants so the full-vs-join-only A/B can never drift into
    // measuring two different rounds.
    def peelFiltered(): DataFrame = {
      val deg = pairs
        .select(col("doc_a").as("id")).union(pairs.select(col("doc_b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("dg"))
      val keep = graft.operators.Materialize.eager(
        deg.filter(col("dg") >= 3).select(col("id")))
      keep.count()
      pairs.join(keep.select(col("id").as("doc_a")), "doc_a")
        .join(keep.select(col("id").as("doc_b")), "doc_b")
        .select(col("doc_a"), col("doc_b"))
    }

    // kcore peel round, full: compute + materialize the filtered pairs
    def peelRound(): Unit = {
      graft.operators.Materialize.eager(peelFiltered()).count(); ()
    }

    // The peel round's COMPUTE alone (counted but not materialized):
    // the full round above also pays the localCheckpoint of the ~O(E)
    // filtered pair table — the part that crosses a single JVM's
    // storage cliff at 30× (225 M rows >> the heap's block store,
    // ~20 GB spilled to ONE local disk) while a cluster spreads the
    // same blocks across executors. Timing both separates the
    // shuffle/agg scaling claim from the container's materialization
    // ceiling.
    def peelJoinOnly(): Unit = { peelFiltered().count(); () }

    // The full round with PARQUET-staged materialization: what a
    // cluster round actually does between iterations at 100 TB — the
    // peeled pair table is WRITTEN as the next round's input table
    // (exactly how this tool stages its own per-scale inputs), not
    // held as deserialized executor block-store rows. The
    // localCheckpoint variant above is the in-memory engine loop's
    // shape (GraphRank's 8-round queries); this one is the
    // checkpoint-to-storage shape an iterative 100 TB job uses, and
    // it keeps the materialization on the columnar/compressed path
    // instead of the single-JVM block-store cliff.
    def peelRoundParquet(): Unit =
      peelFiltered().write.mode("overwrite")
        .parquet(s"$stage/peel_out.parquet")

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

    // min over N attempts, every attempt in the artifact: on a host
    // whose bandwidth oscillates in ~minutes-long waves (today's
    // BASELINE.md post-mortems), two attempts can BOTH land in a sick
    // window — more draws make the min a healthy-window statistic,
    // and the printed spread shows exactly how noisy the window was.
    val attempts = args.drop(2).headOption.map(_.toInt).getOrElse(4)
    def minOfN(f: () => Unit): Seq[Double] =
      (1 to attempts).map { _ =>
        val t = timed(f())
        graft.operators.Materialize.freeAll(spark)
        t
      }

    val peels = minOfN(() => peelRound())
    val peelJoins = minOfN(() => peelJoinOnly())
    val peelParquets = minOfN(() => peelRoundParquet())
    val lpas = minOfN(() => lpaRound())
    val peel = peels.min
    val peelJoin = peelJoins.min
    val peelParquet = peelParquets.min
    val lpa = lpas.min
    val busyEnd = math.min(graft.Probes.busy32(), graft.Probes.busy32())
    val streamEnd = graft.Probes.stream32()
    val sched = math.min(graft.Probes.sched16(spark),
      graft.Probes.sched16(spark))
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"dir":"$dir","n_edges":$nEdges,"edge_partitions":$nPart,""" +
      s""""peel_round_sec":${fmt(peel)},"lpa_round_sec":${fmt(lpa)},""" +
      s""""peel_join_only_sec":${fmt(peelJoin)},""" +
      s""""peel_parquet_sec":${fmt(peelParquet)},""" +
      s""""peel_parquet_attempts":${peelParquets.map(fmt).mkString("[", ",", "]")},""" +
      s""""peel_join_attempts":${peelJoins.map(fmt).mkString("[", ",", "]")},""" +
      s""""peel_attempts":${peels.map(fmt).mkString("[", ",", "]")},""" +
      s""""lpa_attempts":${lpas.map(fmt).mkString("[", ",", "]")},""" +
      s""""busy32":[${fmt(busyStart)},${fmt(busyEnd)}],""" +
      s""""stream32":[${fmt(streamStart)},${fmt(streamEnd)}],""" +
      s""""sched16":${fmt(sched)}}""")
    // stage dir is a tmpdir: best-effort cleanup
    try {
      def rm(p: java.io.File): Unit = {
        if (p.isDirectory) p.listFiles().foreach(rm)
        p.delete()
      }
      rm(new java.io.File(stage))
    } catch { case _: Throwable => }
    spark.stop()
  }
}
