package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Materialize is the single policy point behind every dedup
  * intermediate: default localCheckpoint (no CacheManager leak, at
  * the cost of executor-loss recoverability), persist policy for
  * preemptible fleets. Pin both policies and the free() contract. */
class MaterializeSpec extends AnyFunSuite {
  import graft.SparkTestSession._

  test("default policy: no CacheManager entry, blocks reusable, free drops them") {
    spark.sharedState.cacheManager.clearCache()
    val df = Materialize.eager(spark.range(1000).toDF("id")
      .withColumn("x", col("id") * 2))
    assert(spark.sharedState.cacheManager.isEmpty,
      "localCheckpoint must not register a cached table")
    assert(df.agg(sum(col("x"))).head().getLong(0) == 999000L)
    val before = spark.sparkContext.getPersistentRDDs.size
    assert(before > 0, "eager checkpoint should hold persisted blocks")
    Materialize.free(df)
    assert(spark.sparkContext.getPersistentRDDs.size < before,
      "free() must drop the checkpoint blocks")
  }

  test("persist policy: cached + recomputable, free unpersists") {
    spark.conf.set(Materialize.ConfKey, "persist")
    try {
      val df = Materialize.eager(spark.range(100).toDF("id"))
      assert(!spark.sharedState.cacheManager.isEmpty,
        "persist policy must register the frame in the CacheManager")
      assert(df.count() == 100)
      Materialize.free(df)
      assert(spark.sharedState.cacheManager.isEmpty,
        "free() must remove the persist-policy cache entry")
      // persist-policy frames keep lineage: still computable after free
      assert(df.count() == 100)
    } finally {
      spark.conf.unset(Materialize.ConfKey)
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("sharedPinned: survives freeAll; refresh keeps the displaced frame; releaseShared evicts") {
    val key = s"spec_shared_${System.nanoTime()}"
    var builds = 0
    def get(refresh: Boolean, n: Long) =
      Materialize.sharedPinned(spark, key, refresh) {
        builds += 1; spark.range(n).toDF("id")
      }
    val baseline = spark.sparkContext.getPersistentRDDs.size
    val v1 = get(refresh = false, 500L)
    assert(builds == 1 && v1.count() == 500L)
    // second consumer: registry hit, no rebuild
    assert(get(refresh = false, 999L).count() == 500L && builds == 1)
    // a harness freeAll between queries must NOT drop the pin
    Materialize.freeAll(spark)
    assert(v1.count() == 500L, "pinned blocks must survive freeAll")
    // owner refresh: rebuilds AND leaves the displaced frame readable
    // (unpinned, not freed) for any concurrent holder
    val v2 = get(refresh = true, 600L)
    assert(builds == 2 && v2.count() == 600L)
    assert(v1.count() == 500L,
      "refresh must not free the displaced frame under a live holder")
    // public release: registry evicted (next get rebuilds), blocks
    // revert to the weak-tracked lifetime so freeAll reclaims them
    Materialize.releaseShared(spark)
    Materialize.freeAll(spark)
    assert(spark.sparkContext.getPersistentRDDs.size <= baseline,
      "releaseShared + freeAll must reclaim all spec-pinned blocks")
    assert(get(refresh = false, 700L).count() == 700L && builds == 3)
    Materialize.releaseShared(spark)
    Materialize.freeAll(spark)
  }

  test("dedup queries leave no persistent RDD residue (CC snapshots freed)") {
    val d = "/root/testdata/sf0.001"
    // CC's per-iteration label snapshots must be freed as the loop
    // advances; only the FINAL snapshot (backing the returned frame),
    // the frames materialized by the query builder itself, and the
    // session-shared pinned scan (minhash_sig) may remain until plan
    // GC / release. Run the full clustering query and check the
    // executor-storage watermark stays bounded.
    val baseline = spark.sparkContext.getPersistentRDDs.size
    val out = graft.queries.Documents.dedupClusters(spark, d)
    assert(out.count() > 0)
    // residue is bounded by the per-query materializations (sig2,
    // withHubs, final CC snapshot, the pinned shared signature scan)
    // — NOT maxIter label snapshots (freed in-loop) and not CC's sym
    // (unpersisted on exit)
    val residue = spark.sparkContext.getPersistentRDDs.size - baseline
    assert(residue <= 5,
      s"unexpected RDD residue ($residue new): " +
        spark.sparkContext.getPersistentRDDs.keys.toSeq.sorted)
    // release the pinned registry, then the harness hook drops even
    // that bounded residue synchronously (freeAll alone must NOT drop
    // the pinned scan — the sharedPinned spec above covers that)
    Materialize.releaseShared(spark)
    Materialize.freeAll(spark)
    assert(spark.sparkContext.getPersistentRDDs.size <= baseline,
      "releaseShared + freeAll must release every materialization")
  }
}
