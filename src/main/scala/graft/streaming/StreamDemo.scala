package graft.streaming

import org.apache.spark.sql.streaming.OutputMode

/** CLI driver for the streaming + multimodal surfaces.
  *
  * Usage: StreamDemo <tumbling|sliding|sessions|ssjoin|dedup|userstats|media> <eventsPathOrSfDir>
  * Streams the parquet through the chosen transform to an in-memory
  * sink, then prints the drained result (media: runs the multimodal
  * batch pipeline and prints per-kind stats).
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: StreamDemo <tumbling|sliding|sessions|ssjoin|dedup|userstats|media> <path>")
    val spark = graft.Session.build(s"stream-${args(0)}")
    try {
      args(0) match {
        case "media" =>
          graft.multimodal.Multimodal.mediaStats(spark, args(1)).show(20, false)
        case "userstats" =>
          val q = EventStreams
            .runningUserStats(spark, EventStreams.readEventStream(spark, args(1)))
            .writeStream.format("memory").queryName("out")
            .outputMode(OutputMode.Update()).start()
          q.processAllAvailable(); q.stop()
          spark.table("out").groupBy("user_id")
            .agg(org.apache.spark.sql.functions.max("n_events").as("n_events"))
            .orderBy("user_id").show(10)
        case name =>
          val transform = name match {
            case "tumbling" => EventStreams.tumblingHourly _
            case "sliding" => EventStreams.slidingTwoHour _
            case "sessions" => EventStreams.sessionWindows _
            case "dedup" => EventStreams.dedupStream _
            case "ssjoin" => EventStreams.purchaseClickJoin _
            case other => throw new IllegalArgumentException(
              s"unknown mode '$other' — one of tumbling, sliding, sessions, ssjoin, dedup, userstats, media")
          }
          val df = transform(EventStreams.readEventStream(spark, args(1)))
          val mode =
            if (name == "dedup" || name == "ssjoin") OutputMode.Append()
            else OutputMode.Complete()
          EventStreams.runToMemory(spark, df, "out", mode)
          println(s"rows=${spark.table("out").count()}")
          spark.table("out").show(10, false)
      }
    } finally spark.stop()
  }
}
