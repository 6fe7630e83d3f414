package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming per-bin EXACT distinct-user counts — the continuous form
  * of the KQL `activity_counts_metrics` plugin's count/dcount columns
  * (the live DAU dashboard): event-time bins, each finalized bin
  * emitting its row count and exact distinct-id count once.
  *
  * Exact streaming dcount without unbounded driver state is a
  * two-stage pipeline: `dropDuplicatesWithinWatermark` on (id, bin)
  * first — its state is one row per DISTINCT (id, bin) inside the
  * watermark horizon, evicted as the watermark passes — then a plain
  * windowed count over the deduplicated stream. Both stages are
  * watermark-bounded; append mode emits each bin exactly once after
  * the watermark passes its end (no retractions — the sink-friendly
  * contract, same as [[StreamingAnomaly]]).
  *
  * This operator emits DCOUNT only: Structured Streaming allows one
  * aggregation per streaming query, and the dedup stage has already
  * consumed the raw multiplicities — a deployment that also wants raw
  * row counts runs the plain windowed-count query alongside (one
  * aggregation each), which is the documented cost of exact
  * dedup-then-count composition.
  *
  * 100 TB/day shape: state = distinct (id, bin) pairs within the
  * watermark horizon — bounded by active users × open bins, not event
  * volume.
  */
object StreamingActivity {

  /** `stream` must carry (user_id, ts); emits one row per finalized
    * bin with the exact distinct-user count. */
  def distinctUsersPerBin(stream: DataFrame, bin: String = "1 day",
                          lateness: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", lateness)
      .withColumn("bin", window(col("ts"), bin))
      // the window column inherits the event-time role; the raw ts must
      // leave the stream (Spark allows one event-time column per stream)
      .drop("ts")
      .dropDuplicatesWithinWatermark("user_id", "bin")
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("dcount_users"))
      .select(col("bin.start").as("bin_start"), col("dcount_users"))
}
