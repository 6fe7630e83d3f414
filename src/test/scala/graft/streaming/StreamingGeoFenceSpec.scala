package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming S2 geofence end-to-end: a static site dim fanned out to
  * cell ∪ neighbors, a live located-event stream, stateless
  * broadcast-join alerting. Pins: within-R events alert (including
  * from a NEIGHBOR cell — the fan-out is what makes the equi-join
  * complete), far events stay silent, the plan carries no streaming
  * state, and results equal the batch formulation on the same data. */
class StreamingGeoFenceSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("geofence alerts: near fires (same + neighbor cell), far silent, stateless plan") {
    graft.functions.GraftFunctions.register(spark)
    val sites = Seq(("dak", -17.45, 14.69)).toDF("site", "slon", "slat")

    // level-7 cells span ~0.6 deg; 0.3 deg east stays within R=50km? no —
    // 0.3 deg lon at lat 14.7 is ~32 km: inside R, likely a NEIGHBOR cell.
    val dim = StreamingGeoFence.fencedSites(sites, 7)
    assert(dim.count() == 9, "interior site must fan out to 9 cells")

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Double, Double, Timestamp)]
    val out = StreamingGeoFence.alerts(
      in.toDF().toDF("event_id", "lon", "lat", "ts"), sites, radiusMeters = 50000.0)
    // stateless: no watermark, no aggregation => no state store in the plan
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("geofence_stream").start()
    try {
      in.addData(
        (1L, -17.45, 14.69, ts(0)),   // at the site
        (2L, -17.15, 14.69, ts(1)),   // ~32 km east: inside R, neighbor-cell class
        (3L, -16.98, 14.69, ts(2)),   // ~51 km east: outside R (cell candidate, circle rejects)
        (4L, -14.00, 14.69, ts(3)))   // ~370 km east: no shared cell at all
      q.processAllAvailable()
      val rows = spark.table("geofence_stream")
        .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3))).sortBy(_._1)
      assert(rows.map(_._1).toSeq == Seq(1L, 2L), s"got $rows")
      assert(rows.forall(_._2 == "dak"))
      assert(rows(0)._3 == 0L && rows(1)._3 > 30000L && rows(1)._3 <= 50000L)
      // the 32 km event is genuinely the neighbor-cell case: its own
      // cell differs from the site's home cell
      val cellOf = (lon: Double) => spark.range(1)
        .selectExpr(s"graft_s2_cell(CAST($lon AS DOUBLE), CAST(14.69 AS DOUBLE), 7)")
        .head().getString(0)
      assert(cellOf(-17.15) != cellOf(-17.45),
        "test point must exercise the neighbor fan-out, not the home cell")
      assert(!q.lastProgress.toString.contains("stateOperators\" : [ {"),
        "geofence must be stateless")
    } finally q.stop()

    // batch equivalence: the same rows through a plain DataFrame
    val batch = StreamingGeoFence.alerts(
      Seq((1L, -17.45, 14.69, ts(0)), (2L, -17.15, 14.69, ts(1)),
        (3L, -16.98, 14.69, ts(2)), (4L, -14.00, 14.69, ts(3)))
        .toDF("event_id", "lon", "lat", "ts"),
      sites, radiusMeters = 50000.0)
      .collect().map(r => (r.getLong(0), r.getString(2))).sortBy(_._1).toSeq
    assert(batch == Seq((1L, "dak"), (2L, "dak")))
  }
}
