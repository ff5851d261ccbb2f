package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Streaming queries surfaced through the batch Verify contract: each
  * runs a Structured Streaming job with Trigger.AvailableNow to
  * completion and returns the drained memory table. st01's oracle is
  * the same SQL as the batch q16 — streaming/batch parity is the check.
  */
object StreamQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // watermarked event-time hourly window, streaming == batch parity
    "st01_stream_hourly" -> ((s, dir) => {
      val agg = Streams.hourlyAgg(Streams.eventsStream(s, dir))
      Streams.runAvailableNow(agg, s"st01_${math.abs(dir.hashCode)}")
        .orderBy("hour", "event_type")
    }),

    // custom sessionization state machine (30-minute inactivity gap),
    // aggregated to keep the result dimension-sized
    "st02_sessions" -> ((s, dir) => {
      import s.implicits._
      val ev = RelQueries.events(s, dir)
        .select(col("user_id"), col("ts"), col("value"))
        .as[Streams.Event]
      Streams.sessionizeBatch(ev, gapMs = 30 * 60 * 1000L)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum("n_events").as("n_events"),
          round(sum("total_value"), 4).as("total_value"))
        .filter(col("user_id") < 50)
        .orderBy("user_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "st01_stream_hourly" -> """
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY hour, event_type"""
  )
}
