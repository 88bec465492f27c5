package graft.tools

/** Print one probe-trio reading and exit — the cheap way to ask "is
  * this host window healthy?" before launching a timed rehearsal
  * (healthy bands on this container: busy32 ~0.45, stream32 ~0.020,
  * sched16 ~1.5–2.3; see BASELINE.md). Pass `nosched` to skip the
  * SparkSession (ALU + bandwidth only, ~3 s). */
object ProbeCheck {
  def main(args: Array[String]): Unit = {
    graft.Probes.warm()
    val busy = math.min(graft.Probes.busy32(), graft.Probes.busy32())
    val stream = graft.Probes.stream32()
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    if (args.contains("nosched"))
      println(s"""{"busy32":${fmt(busy)},"stream32":${fmt(stream)}}""")
    else {
      val spark = graft.Session.build("graft-probe")
      spark.range(64).repartition(2).count() // session warm
      val sched = math.min(graft.Probes.sched16(spark),
        graft.Probes.sched16(spark))
      println(s"""{"busy32":${fmt(busy)},"stream32":${fmt(stream)},""" +
        s""""sched16":${fmt(sched)}}""")
      spark.stop()
    }
  }
}
