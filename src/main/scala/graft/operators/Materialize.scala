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

  /** Always-localCheckpoint variant for iterative loops whose plans
    * MUST truncate lineage regardless of the [[ConfKey]] policy
    * (compounding analysis plans OOM past ~20 rounds). */
  def eagerCheckpoint(df: DataFrame): DataFrame =
    track(df.localCheckpoint(true))

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
    live.filter(_.sparkContext eq spark.sparkContext).foreach { r =>
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
