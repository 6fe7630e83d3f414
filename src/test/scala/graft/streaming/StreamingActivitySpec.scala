package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Streaming exact distinct-user counts per event-time bin: duplicate
  * events inside a bin count once, bins emit append-once after the
  * watermark closes them. */
class StreamingActivitySpec extends SparkSpec {
  import spark.implicits._

  private val hour = 3600000L
  private def ts(h: Int, m: Int = 0) =
    new Timestamp(1700000000000L / hour * hour + h * hour + m * 60000L)

  test("duplicates within a bin collapse; finalized bins emit exactly once") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val out = StreamingActivity.distinctUsersPerBin(
      in.toDF().toDF("user_id", "ts"), bin = "1 hour", lateness = "30 minutes")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("activity_stream").start()
    try {
      // hour 1: users 1,1,1,2 (heavy duplication) -> dcount 2
      in.addData((1L, ts(1, 5)), (1L, ts(1, 10)), (1L, ts(1, 20)), (2L, ts(1, 25)))
      q.processAllAvailable()
      assert(spark.table("activity_stream").count() == 0L,
        "nothing finalizes before the watermark passes the bin")
      // hour 3 advances the watermark past hour 1 + 30 min
      in.addData((9L, ts(3, 45)))
      q.processAllAvailable()
      val rows = spark.table("activity_stream").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1))).toMap
      assert(rows == Map(ts(1, 0) -> 2L))
      // replay adds nothing (append-once)
      q.processAllAvailable()
      assert(spark.table("activity_stream").count() == 1L)
    } finally q.stop()
  }
}
