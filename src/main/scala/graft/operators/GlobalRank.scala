package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact GLOBAL row numbering and NTILE without a single-partition
  * sort.
  *
  * `row_number()/ntile(k) OVER (ORDER BY ...)` — no PARTITION BY —
  * requires Spark to funnel the whole input through ONE partition for
  * one task's sort: harmless on a 60k-row user frame, a guaranteed
  * straggler on the 10^8–10^9-row user table a 100 TB event corpus
  * produces. This helper computes the identical numbers distributed:
  *
  *  1. `repartitionByRange` on the ordering key (sampled range
  *     boundaries — the doc_global_shuffle idiom) + per-partition
  *     sort: a TOTAL order across partition indexes, every partition
  *     sized 1/N of the frame;
  *  2. `zipWithIndex`: one bounded count-per-partition job (N scalars
  *     to the driver, never data), then each partition stamps
  *     offset + local position.
  *
  * The input is materialized once ([[Materialize.eager]]) so the
  * count job and the stamping job read the same stored blocks instead
  * of recomputing the upstream aggregate twice — and so the sampled
  * range boundaries cannot disagree between the two passes.
  *
  * Correctness contract: `order` must be a TOTAL order (append a
  * unique key as the last column — every caller here ties on a
  * user/doc id). Under a total order the result is exactly
  * `row_number() OVER (ORDER BY ...)`, independent of the sampled
  * partition boundaries; [[ntileFromRank]] then reproduces
  * SQL-standard NTILE bucket-by-bucket, so swapping a global-window
  * NTILE for this pair is hash-invariant. */
object GlobalRank {

  /** `df` plus column `out` = 1-based exact global row number under
    * `order`. One range shuffle + one bounded count job; never a
    * single-partition sort. */
  def withRowNumber(df: DataFrame, order: Seq[Column], out: String)
      : DataFrame = {
    val spark = df.sparkSession
    val np = spark.sparkContext.defaultParallelism
    val sorted = Materialize.eager(
      df.repartitionByRange(np, order: _*).sortWithinPartitions(order: _*))
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** SQL-standard NTILE(k) from an exact 1-based rank and the total
    * row count: the first `n % k` buckets hold `n DIV k + 1` rows,
    * the rest `n DIV k` — bit-identical to the window function on
    * both engines. All-integer arithmetic; `rank`/`n` must be longs
    * (n typically arrives as a 1-row broadcast). The ELSE branch's
    * divisor `n DIV k` is only zero when n < k, in which case every
    * rank satisfies the THEN guard (rank <= 1 * n), so the CASE never
    * divides by zero. */
  def ntileFromRank(rank: String, n: String, k: Int): Column =
    expr(s"""CASE WHEN $rank <= (($n DIV $k) + 1) * ($n % $k)
            |  THEN ($rank - 1) DIV (($n DIV $k) + 1) + 1
            |  ELSE ($rank - 1 - $n % $k) DIV ($n DIV $k) + 1
            |END""".stripMargin)
}
