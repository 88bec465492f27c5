package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter pre-filtered semi/anti join — the membership-check
  * shape for incremental dedup at corpus scale: instead of shuffling
  * the 100 TB corpus against every daily batch, build a compact bloom
  * sketch of the corpus keys ONCE, broadcast it, and let the batch
  * discard every key the sketch rules out before any join runs. The
  * sketch admits false positives but never false negatives, so a
  * cheap EXACT confirm join over the few survivors restores exact
  * semantics — output is deterministic and oracle-checkable even
  * though a probabilistic structure sits in the middle.
  *
  * Cost model: the corpus side is read once to build the sketch
  * (distributed treeAggregate; the driver holds only the final bit
  * array) and once more by the confirm join — but the confirm join's
  * batch side has already shrunk from |batch| to
  * |true dups| + fpp·|batch|, so the shuffle it pays is proportional
  * to the MATCH volume, not the batch. Sketch sizing is the caller's
  * lever: ~9.6 bits/key at 1% fpp (1e9 keys ≈ 1.2 GB — broadcastable,
  * but budget executor memory for it; for larger corpora raise fpp,
  * the confirm join absorbs the extra survivors).
  *
  * The membership probe is a Scala UDF (BloomFilter.mightContain) —
  * deliberately: it runs OUTSIDE the join's codegen hot path, as a
  * pre-shuffle filter whose whole job is to keep rows out of the
  * shuffle; a non-codegen boolean probe per batch row is noise next
  * to the shuffle it avoids.
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
    val spark = batch.sparkSession
    // build AND probe on the stringified key: stat.bloomFilter hashes
    // by the column's runtime type (putLong vs putString), so a typed
    // build probed through the String UDF would hash different bytes
    // and silently break the no-false-negative contract for e.g.
    // BIGINT keys — one explicit cast on both sides makes the hash
    // input identical for every key type
    val bf = corpus.select(corpusKey.cast("string").as("k")).stat
      .bloomFilter("k", expectedItems, fpp)
    val bcast = spark.sparkContext.broadcast(bf)
    val might = udf((k: String) => k != null && bcast.value.mightContainString(k))
    batch.filter(might(batchKey.cast("string")))
  }
}
