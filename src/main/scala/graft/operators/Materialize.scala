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

  /** Materialize `df` now and return a frame whose consumers reuse the
    * stored blocks instead of recomputing the plan. */
  def eager(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(ConfKey, "localCheckpoint") match {
      case "persist" =>
        val p = df.persist()
        p.count() // materialize now: consumers must never race the fill
        p
      case _ => df.localCheckpoint(true)
    }

  /** Drop the stored blocks behind an [[eager]]-materialized frame
    * once no live consumer remains. Safe on any frame: non-materialized
    * inputs are a no-op. After `free`, a localCheckpoint-backed frame
    * is NOT recomputable — only call when the result (or a downstream
    * materialization of it) is no longer needed. */
  def free(df: DataFrame): Unit = {
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
    df.unpersist(false) // persist-policy frames: drop the cache entry too
  }
}
