package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at scale.
  *
  * AQE's skew-join splitting (on in Session.build) handles most cases
  * at runtime; these are the explicit forms for when the skew is known
  * ahead of time (a handful of mega-keys in a 100 TB fact table) or
  * the operation is an aggregation (AQE doesn't salt aggregates).
  */
object SkewJoin {

  /** Salted aggregation: two-phase count/sum-style aggregate where the
    * first phase spreads each hot key over `buckets` shuffle partitions.
    * aggs are (alias -> partial expression on the raw rows); the merge
    * phase must re-aggregate the partials (sum/min/max/count→sum). */
  def saltedCount(df: DataFrame, key: Column, buckets: Int): DataFrame =
    df.groupBy(key.as("k"), (rand(seed = 7) * buckets).cast("int").as("salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("k"))
      .agg(sum(col("partial")).as("n"))

  /** Broadcast-salted join: replicate the SMALL side `buckets` times
    * with an explicit salt column, salt the big side's hot rows
    * randomly, join on (key, salt). Every partition of a hot key gets
    * its own copy of the build row — no single reducer takes the
    * whole key. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", (rand(seed = 7) * buckets).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
