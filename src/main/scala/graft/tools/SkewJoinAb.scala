package graft.tools

import org.apache.spark.sql.functions._

/** A/B: the explicit salted join (operators.SkewJoin.saltedJoin,
  * pre-dates AQE skew handling) vs AQE's own runtime skew-split, on a
  * planted mega-key workload at 10× scale (round-11 verdict #7).
  *
  * Workload: scale-dir events with a synthetic 90%-hot key (key 0
  * carries ~90% of rows — the "handful of mega-keys in a 100 TB fact
  * table" case SkewJoin documents), joined to a key-level dim.
  * Broadcast is disabled so the join actually shuffles — with a
  * broadcastable dim neither mitigation is needed and the comparison
  * is vacuous. Both variants compute the same aggregate (checked);
  * each is timed twice, min reported. One JSON line. */
object SkewJoinAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale10")
    val spark = graft.Session.build("graft-skew-ab")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val ev = graft.operators.Materialize.eager(
      spark.read.parquet(s"$dir/events.parquet")
        .select(
          when(pmod(col("user_id"), lit(100)) < 90, 0L)
            .otherwise(col("user_id")).as("k"),
          col("value")))
    val dim = graft.operators.Materialize.eager(
      ev.select(col("k")).distinct()
        .withColumn("w", pmod(col("k"), lit(97)) + 1))
    val nRows = ev.count(); dim.count()

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime
      val v = f
      ((System.nanoTime - t0) / 1e9, v)
    }
    def agg(df: org.apache.spark.sql.DataFrame): Long =
      df.select(sum(col("w")).cast("long")).head().getLong(0)

    def aqe(): Long = agg(ev.join(dim, "k"))
    def salted(): Long =
      agg(graft.operators.SkewJoin.saltedJoin(ev, dim, "k", 32))
    def minOf2(f: () => Long): (Double, Long) = {
      val a = timed(f()); val b = timed(f())
      (math.min(a._1, b._1), a._2)
    }
    val (tA, vA) = minOf2(() => aqe())
    val (tS, vS) = minOf2(() => salted())
    require(vA == vS, s"variants disagree: aqe=$vA salted=$vS")
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"dir":"$dir","n_rows":$nRows,"checksum":$vA,""" +
      s""""aqe_skew_sec":${fmt(tA)},"salted_sec":${fmt(tS)}}""")
    spark.stop()
  }
}
