package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter pre-filtered semi/anti join — the membership-check
  * shape for incremental dedup at corpus scale: instead of shuffling
  * the 100 TB corpus against every daily batch, build a compact bloom
  * sketch of the corpus keys ONCE, embed it in the plan, and let the
  * batch discard every key the sketch rules out before any join runs.
  * The sketch admits false positives but never false negatives, so a
  * cheap EXACT confirm join over the few survivors restores exact
  * semantics — output is deterministic and oracle-checkable even
  * though a probabilistic structure sits in the middle.
  *
  * Cost model: the corpus side is read once to build the sketch
  * (distributed partial aggregation; the driver holds only the final
  * serialized bit array) and once more by the confirm join — but the
  * confirm join's batch side has already shrunk from |batch| to
  * |true dups| + fpp·|batch|, so the shuffle it pays is proportional
  * to the MATCH volume, not the batch. Sketch sizing is the caller's
  * lever: ~9.6 bits/key at 1% fpp (1e9 keys ≈ 1.2 GB — embeddable,
  * but budget executor memory for it; for larger corpora raise fpp,
  * the confirm join absorbs the extra survivors).
  *
  * Build and probe are the NATIVE Catalyst pair Spark's own runtime
  * row-level filtering uses — `BloomFilterAggregate` to build (one
  * partial-agg pass, filters merged executor-side) and
  * `BloomFilterMightContain` to probe (participates in whole-stage
  * codegen; the earlier Scala-UDF probe broke the batch scan's
  * codegen span and deserialized a boxed String per row). Both sides
  * key on `xxhash64(key AS STRING)` — one explicit cast + hash makes
  * the sketch's input bytes identical for every key type, preserving
  * the no-false-negative contract for e.g. BIGINT keys (an xxhash64
  * collision can only ADD a false positive, which the confirm join
  * removes).
  */
object BloomPrefilter {

  /** Rows of `batch` whose `key` is (exactly) present among `corpus`
    * keys — `batch SEMI JOIN corpus` with the bloom pre-filter in
    * front. `expectedItems`/`fpp` size the sketch. */
  def semiJoin(batch: DataFrame, batchKey: Column,
               corpus: DataFrame, corpusKey: Column,
               expectedItems: Long, fpp: Double): DataFrame = {
    val survivors = prefilter(batch, batchKey, corpus, corpusKey,
      expectedItems, fpp)
    survivors.join(corpus.select(corpusKey.as("_bloom_key")).distinct(),
      batchKey === col("_bloom_key"), "left_semi")
  }

  /** The pre-filter alone (no confirm join): batch rows whose key the
    * corpus sketch might contain. Exposed for specs and for callers
    * composing anti-join semantics (NOT-in-corpus = batch minus
    * [[semiJoin]] output — the bloom cannot serve anti directly, its
    * false positives would DROP genuinely-new rows). */
  def prefilter(batch: DataFrame, batchKey: Column,
                corpus: DataFrame, corpusKey: Column,
                expectedItems: Long, fpp: Double): DataFrame = {
    require(expectedItems > 0, s"expectedItems must be > 0: $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1): $fpp")
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    // the serialized sketch comes to the driver once (one binary blob,
    // ~numBits/8 bytes) and re-enters the plan as a foldable literal —
    // stage task binaries are broadcast, so executors receive it once
    // per stage, same distribution cost as the old explicit broadcast
    val bf = corpus
      .select(graft.functions.GraftFunctions.bloomFilterAgg(
        xxhash64(corpusKey.cast("string")), expectedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]](0)
    // empty corpus ⇒ null sketch ⇒ null probe ⇒ every batch row drops,
    // matching an always-false membership test; null batch keys hash
    // to null and drop the same way (never probe, never crash)
    val bfLit = if (bf == null) lit(null).cast("binary") else lit(bf)
    batch.filter(graft.functions.GraftFunctions.mightContain(
      bfLit, xxhash64(batchKey.cast("string"))))
  }
}
