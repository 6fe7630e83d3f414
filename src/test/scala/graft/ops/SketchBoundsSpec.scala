package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Accuracy bounds for the sketch estimates behind `sketch_approx`.
  * Since r16 the registered query IS an oracle-checked error-bound
  * audit (the driver hash-compares the audit flags against DuckDB's
  * exact sides); these assertions additionally pin the TIGHTER
  * documented envelopes directly on the raw estimates
  * ([[AdvancedAnalytics.sketchEstimates]]), on the same sf0.01 events
  * the driver verifies against. Both sketches are deterministic for
  * fixed input, so the bounds are stable, not flaky. */
class SketchBoundsSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  test("approx_count_distinct within its documented rsd of the exact count, per group") {
    // default relativeSD = 0.05; allow 4 standard errors of slack
    val approx = AdvancedAnalytics.sketchEstimates(spark, sf01)
      .select(col("event_type"), col("approx_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf01)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e) <= math.max(1.0, 4 * 0.05 * e),
        s"$k: approx_count_distinct=$a vs exact=$e exceeds 4×rsd")
    }
  }

  test("percentile_approx(0.5, 1000): returned value's exact rank stays near the median") {
    // KLL-style guarantee: rank error ≤ N/accuracy = 0.1% of rows;
    // assert a 10× slack band (±1 percentile point) on the exact rank.
    val p50 = AdvancedAnalytics.sketchEstimates(spark, sf01)
      .select(col("event_type"), col("p50_value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ev = Tables.events(spark, sf01).select(col("event_type"), col("value")).cache()
    try p50.foreach { case (k, v) =>
      val grp = ev.filter(col("event_type") === k)
      val n = grp.count().toDouble
      val below = grp.filter(col("value") < v).count() / n
      val atOrBelow = grp.filter(col("value") <= v).count() / n
      assert(below <= 0.51 && atOrBelow >= 0.49,
        s"$k: p50=$v has exact rank range [$below, $atOrBelow], outside 0.5 ± 0.01")
    } finally ev.unpersist()
  }
}
