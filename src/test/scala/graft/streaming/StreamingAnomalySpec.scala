package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming k-sigma anomaly detection end-to-end: a static baseline
  * learned from historical batch data, a live stream with one planted
  * traffic spike, append-mode emission after the watermark closes each
  * window. */
class StreamingAnomalySpec extends SparkSpec {
  import spark.implicits._

  private val hour = 3600000L
  private def ts(h: Int, m: Int = 0) =
    new Timestamp(1700000000000L / hour * hour + h * hour + m * 60000L)

  test("planted spike flags; normal windows pass; emission is append-once") {
    // history: 'click' runs at exactly 4/hour for 6 hours -> mean 4, sd 0;
    // 'view' alternates 2 and 4 -> mean 3, sd 1
    val history = (
      (0 until 6).flatMap(h => Seq.fill(4)(("click", ts(h, 10)))) ++
      (0 until 6).flatMap(h => Seq.fill(if (h % 2 == 0) 2 else 4)(("view", ts(h, 20))))
    ).toDF("event_type", "ts")
    val baseline = StreamingAnomaly.hourlyBaseline(history)
    val b = baseline.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(b("click") == ((4.0, 0.0)))
    assert(b("view") == ((3.0, 1.0)))

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val out = StreamingAnomaly.detect(
      in.toDF().toDF("event_type", "ts"), baseline, k = 3.0, lateness = "30 minutes")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("anomaly_stream").start()
    try {
      // hour 10: click at baseline rate (4), view spiking to 30
      in.addData(Seq.fill(4)(("click", ts(10, 5))) ++ Seq.fill(30)(("view", ts(10, 15))): _*)
      q.processAllAvailable()
      // nothing emitted yet: the watermark has not passed hour 10's end
      assert(spark.table("anomaly_stream").count() == 0L)
      // events in hour 12 push the watermark past hour 10 + 30 min
      in.addData(("click", ts(12, 45)), ("view", ts(12, 45)))
      q.processAllAvailable()
      val rows = spark.table("anomaly_stream").collect()
        .map(r => (r.getString(0), r.getLong(2), r.getBoolean(5))).toSet
      // click 4 ~ mean 4 sd 0: |0| > 0 is false -> normal;
      // view 30 vs mean 3 sd 1: |27| > 3 -> anomaly
      assert(rows == Set(("click", 4L, false), ("view", 30L, true)))
      // replaying processAllAvailable adds nothing (append-once)
      q.processAllAvailable()
      assert(spark.table("anomaly_stream").count() == 2L)
    } finally q.stop()
  }
}
