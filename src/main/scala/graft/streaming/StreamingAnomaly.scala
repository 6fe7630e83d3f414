package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming k-sigma anomaly detection — the continuous form of the
  * batch `ev_daily_anomaly` query and the serving side of the KQL
  * `series_decompose_anomalies` tier: hourly event-time windows per
  * event type, each FINALIZED window flagged against a static
  * historical baseline (per-type mean/stdev of hourly counts).
  *
  * Plan shape (pure streaming, no foreachBatch): the baseline is tiny
  * (one row per event type), so it broadcast-enriches the raw stream
  * BEFORE the windowed aggregation — Structured Streaming forbids
  * joins after a streaming aggregation in append mode, but a stateless
  * stream-static enrich followed by ONE aggregation is fully
  * supported; the flag is a stateless projection on the aggregate.
  * Watermarking bounds window state, and append mode emits each window
  * exactly once, after the watermark passes its end — the semantics a
  * downstream alerting sink wants (no retractions).
  *
  * 100 TB/day shape: state is (types × open windows) rows — O(100s),
  * independent of event volume; the baseline refresh is an offline
  * batch job ([[hourlyBaseline]]) swapped in at stream restart.
  */
object StreamingAnomaly {

  /** Per-type baseline from HISTORICAL batch events: mean and
    * population stdev of hourly counts (stdev 0 for a single bucket —
    * any deviation then flags, the right cold-start bias). */
  def hourlyBaseline(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("event_type"))
      .agg(avg(col("cnt")).as("mean"),
        coalesce(stddev_pop(col("cnt")), lit(0.0)).as("sd"))

  /** The detector: `stream` must carry (event_type, ts); emits one row
    * per finalized (event_type, hour window) with the observed count,
    * the baseline, and the k-sigma flag. */
  def detect(stream: DataFrame, baseline: DataFrame, k: Double = 3.0,
             lateness: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", lateness)
      .join(broadcast(baseline), Seq("event_type"))
      .groupBy(col("event_type"), window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("cnt"),
        first(col("mean")).as("mean"), first(col("sd")).as("sd"))
      .select(col("event_type"), col("w.start").as("window_start"),
        col("cnt"), col("mean"), col("sd"),
        (abs(col("cnt") - col("mean")) > lit(k) * col("sd")).as("is_anomaly"))
}
