package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** The single policy point for eagerly materializing a multi-consumer
  * intermediate (LSH signature tables, banded fingerprints, CC label
  * snapshots): every dedup query routes through here, so the
  * storage/fault-tolerance trade-off is swappable in one place.
  *
  * Default policy is `localCheckpoint(eager = true)`:
  *   - blocks never enter the session `CacheManager`, so a library
  *     caller running one query does not leak a cached table into the
  *     session (freed when the plan is GC'd) — `persist()` would
  *     require every caller to know to `unpersist`;
  *   - lineage is truncated, so iterative consumers (connected
  *     components) do not accumulate an analysis-time plan blowup.
  *
  * Exception to the freed-when-GC'd contract: the session-scoped
  * compute-once registry ([[sharedPinned]]) and its sibling caches
  * hold STRONG refs for reuse across queries. Those are released by
  * [[releaseShared]] or automatically when the SparkContext stops —
  * a library caller cycling many data dirs through one long-lived
  * session should call [[releaseShared]] between corpora.
  *
  * The trade-off (know it before running on a preemptible fleet):
  * localCheckpoint stores blocks ONLY on executors and DISCARDS the
  * lineage needed to recompute them. Losing an executor — preemption,
  * dynamic-allocation scale-down, OOM kill — fails the query with a
  * missing-block error instead of recomputing the partition. On a
  * static cluster (and local mode) that is the right trade; on spot /
  * dynamically-scaled fleets set `spark.graft.materialize=persist`
  * (recomputable, but the caller owns `unpersist`/[[free]]) or use a
  * reliable `spark.checkpoint.dir` checkpoint outside this library.
  */
object Materialize {
  val ConfKey = "spark.graft.materialize"

  // Weak registry of every checkpoint RDD this helper materialized:
  // [[freeAll]] lets a harness (Verify/Bench) drop all surviving
  // blocks deterministically between queries instead of waiting on
  // the JVM GC + async ContextCleaner (whose cleanup otherwise lands
  // inside the NEXT query's timed window). The key is the underlying
  // RDD, not the Dataset wrapper: consumers hold the RDD through
  // their LogicalRDD plan nodes long after the wrapper frame is
  // garbage, and weak keys keep the default contract for library
  // callers — once every consumer drops the plan, normal GC +
  // ContextCleaner free the blocks, registry or not.
  private val tracked =
    new java.util.WeakHashMap[org.apache.spark.rdd.RDD[_], AnyRef]()

  // Strong set of PINNED checkpoint RDDs: session-scoped shared
  // intermediates (e.g. the LPA label table both
  // graph_label_propagation and graph_modularity consume) that a
  // harness's between-query [[freeAll]] must NOT drop — the whole
  // point of the pin is surviving until the next query reuses the
  // blocks. Strong refs are deliberate: the owning cache (not the
  // GC) decides the lifetime, released via [[unpin]].
  private val pinned =
    java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[org.apache.spark.rdd.RDD[_], java.lang.Boolean]())

  private def leafRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectLeaves().collect {
      case l: LogicalRDD => l.rdd
    }

  private def track(df: DataFrame): DataFrame = {
    tracked.synchronized { leafRdds(df).foreach(tracked.put(_, None)) }
    df
  }

  /** Materialize `df` now and return a frame whose consumers reuse the
    * stored blocks instead of recomputing the plan. */
  def eager(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(ConfKey, "localCheckpoint") match {
      case "persist" =>
        val p = df.persist()
        p.count() // materialize now: consumers must never race the fill
        track(p)
      case _ => track(df.localCheckpoint(true))
    }

  /** Lineage-PRESERVING materialization for the static side of a
    * long-lived streaming query. localCheckpoint-backed frames
    * ([[eager]]) are non-recomputable: a harness [[freeAll]] (or any
    * free) while the stream is live would drop the blocks and fail
    * every subsequent micro-batch unrecoverably. This variant uses
    * `persist` + fill, keeping the plan: a concurrent
    * `clearCache`/unpersist merely degrades later micro-batches to a
    * recompute. The frame is registered with [[onRelease]], so
    * [[releaseShared]] / application end unpersists it — callers that
    * stop the stream early and want the memory back sooner unpersist
    * the returned frame themselves. */
  def eagerStatic(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    p.count()
    onRelease(df.sparkSession.sparkContext)(() =>
      p.unpersist(blocking = false))
    p
  }

  /** Always-localCheckpoint variant for iterative loops whose plans
    * MUST truncate lineage regardless of the [[ConfKey]] policy
    * (compounding analysis plans OOM past ~20 rounds). */
  def eagerCheckpoint(df: DataFrame): DataFrame =
    track(df.localCheckpoint(true))

  /** [[eagerCheckpoint]] plus a PIN: the stored blocks survive
    * [[freeAll]] so a session-scoped cache (one query computing a
    * table a later query reuses) keeps working across a harness's
    * between-query cleanup. The caller owns the lifetime — pair every
    * pin with an eventual [[unpin]] when the cache entry is evicted. */
  def eagerPinned(df: DataFrame): DataFrame = {
    val out = eagerCheckpoint(df)
    pinned.synchronized { leafRdds(out).foreach(pinned.add) }
    out
  }

  /** Release a pinned frame: drop the pin AND free its blocks now.
    * After this the frame is NOT recomputable (localCheckpoint) — only
    * safe when the caller KNOWS no consumer retains the frame. */
  def unpin(df: DataFrame): Unit = {
    leafRdds(df).foreach { r =>
      pinned.synchronized { pinned.remove(r) }
      r.unpersist(blocking = true)
      tracked.synchronized { tracked.remove(r) }
    }
  }

  /** Drop a frame's pin WITHOUT freeing its blocks: the frame reverts
    * to the ordinary weak-tracked lifetime (freed by the next harness
    * [[freeAll]], or by GC + ContextCleaner once every consumer drops
    * the plan). This is the only safe release when another thread may
    * have just fetched the frame from a shared registry — a blocking
    * free here would hand that thread a plan over missing,
    * non-recomputable blocks. */
  def unpinKeep(df: DataFrame): Unit =
    pinned.synchronized { leafRdds(df).foreach(pinned.remove) }

  // Session-scoped compute-once registry of pinned shared scans: a
  // subtree several REGISTERED queries pay standalone (the LSH
  // candidate-pair table under 9 dedup/graph queries, the distinct
  // token table under the sweep family) is materialized by the FIRST
  // consumer in a session and reused by the rest — the
  // dedup_cluster_density share-the-scan discipline lifted to the
  // session (round-9 verdict #6), generalizing GraphRank's LPA cache.
  // Keyed by (SparkContext, key) so test sessions / Verify / Bench
  // never cross-contaminate; determinism of every shared subtree makes
  // reuse value-identical to a recompute.
  private val shared = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.SparkContext, String), DataFrame]()

  // Per-context release hooks: other session-scoped caches holding
  // pinned frames (GraphRank's LPA core) register here so ONE call —
  // [[releaseShared]] or the context-stop listener — evicts every
  // strong reference the library holds for that context.
  private val releaseHooks = new java.util.concurrent.ConcurrentHashMap[
    org.apache.spark.SparkContext,
    List[() => Unit]]()

  // Contexts whose end-of-application listener is already installed —
  // without it, a long-lived JVM cycling through SparkSessions would
  // accumulate permanently-pinned registries per dead context (the
  // strong refs outlive the blocks they guard).
  private val endListenerOn = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[
      org.apache.spark.SparkContext, java.lang.Boolean]())

  private def ensureEndListener(sc: org.apache.spark.SparkContext): Unit =
    if (endListenerOn.add(sc))
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          releaseContext(sc)
      })

  /** Register a cleanup hook run when `sc`'s registries are released
    * (explicit [[releaseShared]] or application end). */
  def onRelease(sc: org.apache.spark.SparkContext)(hook: () => Unit): Unit = {
    ensureEndListener(sc)
    releaseHooks.merge(sc, List(hook), (a, b) => b ++ a)
  }

  private def releaseContext(sc: org.apache.spark.SparkContext): Unit = {
    val it = shared.keySet().iterator()
    val mine = scala.collection.mutable.ArrayBuffer[
      (org.apache.spark.SparkContext, String)]()
    while (it.hasNext) { val k = it.next(); if (k._1 eq sc) mine += k }
    mine.foreach { k =>
      val df = shared.remove(k)
      if (df != null) unpinKeep(df) // blocks follow the weak-tracked lifetime
    }
    val hooks = releaseHooks.remove(sc)
    if (hooks != null) hooks.foreach(h => h())
    endListenerOn.remove(sc)
  }

  /** Public release path for the compute-once registry: drops every
    * shared entry (and registered sibling cache) of this session's
    * context. Library callers cycling many data dirs through one
    * session call this to stop pinned executor storage accumulating;
    * it also runs automatically when the SparkContext stops. Blocks
    * are not force-freed — frames still referenced by a live consumer
    * stay readable and are reclaimed by GC + ContextCleaner (or a
    * harness [[freeAll]]) once dropped. */
  def releaseShared(spark: org.apache.spark.sql.SparkSession): Unit =
    releaseContext(spark.sparkContext)

  /** Compute-once pinned materialization of a deterministic shared
    * subtree. First caller per (session-context, key) pays and pins;
    * later callers get the stored blocks. `build` must be a pure
    * function of the key's inputs (all graft scans are: parquet dir +
    * deterministic plan), and the key's inputs are assumed IMMUTABLE
    * for the registry entry's lifetime — a caller that rewrites the
    * parquet under a registered dir mid-session must [[releaseShared]]
    * first or non-owner consumers serve the stale pinned snapshot.
    *
    * `refresh = true` marks the key's OWNER query: it always rebuilds
    * and re-pins, so in a min-of-two-passes benchmark the scan's true
    * build cost stays attributed to exactly one registered query
    * instead of vanishing into "already pinned" on every second pass —
    * the LPA-core honesty discipline. The DISPLACED frame is unpinned
    * but not freed ([[unpinKeep]]): a concurrent reader that fetched
    * it just before the swap keeps working; the blocks fall back to
    * the weak-tracked lifetime. */
  def sharedPinned(spark: org.apache.spark.sql.SparkSession, key: String,
      refresh: Boolean = false)(build: => DataFrame): DataFrame = {
    val k = (spark.sparkContext, key)
    if (!refresh) {
      val hit = shared.get(k)
      if (hit != null) return hit
    }
    shared.synchronized {
      if (!refresh) {
        val again = shared.get(k)
        if (again != null) return again
      }
      ensureEndListener(spark.sparkContext)
      val df = eagerPinned(build)
      val old = shared.put(k, df)
      if (old != null) unpinKeep(old)
      df
    }
  }

  /** Free every tracked checkpoint of `spark`'s context that is still
    * strongly reachable — for harnesses running many queries in one
    * session; call only between queries (after the action completed).
    * Persist-policy frames live in the CacheManager instead — a
    * harness clears those with `spark.catalog.clearCache()`. */
  def freeAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val live = tracked.synchronized {
      val buf = scala.collection.mutable
        .ArrayBuffer[org.apache.spark.rdd.RDD[_]]()
      val it = new java.util.ArrayList(tracked.keySet()).iterator()
      while (it.hasNext) { val r = it.next(); if (r != null) buf += r }
      buf.toSeq
    }
    live.filter { r =>
      (r.sparkContext eq spark.sparkContext) &&
        !pinned.synchronized(pinned.contains(r))
    }.foreach { r =>
      // blocking: the whole point is that removal completes BEFORE the
      // caller's next timed window starts — unpersist(false) merely
      // dispatches the removal to block-manager threads
      r.unpersist(blocking = true)
      tracked.synchronized { tracked.remove(r) }
    }
  }

  /** Drop the stored blocks behind an [[eager]]-materialized frame
    * once no live consumer remains. Safe on any frame: non-materialized
    * inputs are a no-op. After `free`, a localCheckpoint-backed frame
    * is NOT recomputable — only call when the result (or a downstream
    * materialization of it) is no longer needed. */
  def free(df: DataFrame): Unit = {
    leafRdds(df).foreach { r =>
      r.unpersist(blocking = true)
      tracked.synchronized { tracked.remove(r) }
    }
    df.unpersist(true) // persist-policy frames: drop the cache entry too
  }
}
