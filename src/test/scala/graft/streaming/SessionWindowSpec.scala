package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming sessionization with the built-in session_window: gap-based
  * sessions close when the watermark passes their end, so state stays
  * bounded — the streaming form of the batch ev_sessions query. */
class SessionWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("gap-based session windows aggregate per user and close on watermark") {
    implicit val sql = spark.sqlContext
    val events = MemoryStream[(Long, Timestamp)]
    val sessions = events.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "1 minute")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))

    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    try {
      // user 1: events at t0,t10 (one session) then t60 (new session);
      // user 2: single event. A far-future event advances the watermark
      // so every session closes and emits.
      events.addData((1L, ts(0)), (1L, ts(10)), (1L, ts(60)), (2L, ts(5)))
      q.processAllAvailable()
      events.addData((99L, ts(1000)))
      q.processAllAvailable()

      val got = spark.table("sessions")
        .select(col("user_id"), col("n_events")).as[(Long, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      assert(got(1L) == Seq(1L, 2L), s"user 1 sessions: $got")
      assert(got(2L) == Seq(1L))
    } finally q.stop()
  }
}
