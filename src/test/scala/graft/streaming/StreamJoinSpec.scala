package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stream-stream interval join (the streaming form of the as-of
  * analysis): purchases join views of the same user within a bounded
  * look-back, both sides watermarked so join state is dropped once the
  * interval can no longer match — bounded state at any stream length. */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("purchases match prior views within the interval; state is watermark-bounded") {
    implicit val sql = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp)]

    val v = views.toDF().toDF("user_id", "v_ts").withWatermark("v_ts", "10 minutes")
    val p = purchases.toDF().toDF("p_user", "p_ts").withWatermark("p_ts", "10 minutes")

    val joined = p.join(v,
      col("user_id") === col("p_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
        col("v_ts") < col("p_ts"))
      .select(col("p_user"), col("p_ts"), col("v_ts"))

    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join").start()
    try {
      views.addData((1L, ts(0)), (1L, ts(5)), (2L, ts(0)), (3L, ts(0)))
      purchases.addData((1L, ts(8)), (2L, ts(20)), (3L, ts(2)))
      q.processAllAvailable()
      val got = spark.table("ss_join")
        .select(col("p_user"), col("v_ts")).as[(Long, Timestamp)]
        .collect().toSet
      // user 1: both views within [t-2, t8); user 2: view at t0 outside
      // [t10, t20); user 3: view at t0 within [t-8, t2)
      assert(got == Set((1L, ts(0)), (1L, ts(5)), (3L, ts(0))))
    } finally q.stop()
  }
}
