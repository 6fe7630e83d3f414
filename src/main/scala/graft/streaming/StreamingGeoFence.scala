package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming geofence alerting — the continuous form of the batch S2
  * cell join (`kql_geo_s2_join`): a stream of located events is keyed
  * by its S2 cell ([[graft.functions.S2CellToken]] — one codegen
  * expression per row, no state), equi-joined against a STATIC site
  * dim fanned out to each site's cell ∪ 8-neighborhood (cross-face
  * wrapping as of r13), and the exact haversine circle test verifies
  * candidates. Emits one alert row per (event, site) hit.
  *
  * Plan shape (pure streaming, stateless): cell derivation is a
  * map-side projection; the fanned-out site dim is tiny (≤ 9 rows per
  * site) and broadcasts, so the join adds NO streaming state and NO
  * shuffle — every micro-batch is scan → project → broadcast-join →
  * filter, the cheapest possible continuous shape. Watermarking is
  * unnecessary (no aggregation); exactly-once is the sink's idempotence
  * contract as in [[Materializer]].
  *
  * 100 TB/day shape: per-event cost is one trig chain + one broadcast
  * hash probe; the site dim refresh is a batch job swapped in at
  * restart. Coverage contract (same as the batch query, verified there
  * by the independent oracle): R ≤ the level's minimum cell span (face
  * boundaries are covered by the cross-face neighbor wrap).
  */
object StreamingGeoFence {

  /** Site dim → (site, slon, slat, cell) fanned out to the site's cell
    * and its 8-neighborhood (cross-face wrapped) at `level`. */
  def fencedSites(sites: DataFrame, level: Int): DataFrame =
    sites
      .withColumn("c0", expr(s"graft_s2_cell(CAST(slon AS DOUBLE), CAST(slat AS DOUBLE), $level)"))
      .withColumn("cell", explode(concat(array(col("c0")),
        expr("graft_s2_neighbors(c0)"))))
      .select(col("site"), col("slon"), col("slat"), col("cell"))

  /** The alert stream: `stream` carries (event_id, lon, lat, ts);
    * emits (event_id, ts, site, dist_m floored) per within-R hit. */
  def alerts(stream: DataFrame, sites: DataFrame, radiusMeters: Double,
             level: Int = 7): DataFrame = {
    val dim = broadcast(fencedSites(sites, level))
    val dist =
      "2.0 * 6371000.0 * asin(sqrt(least(1.0, " +
        "sin((radians(slat) - radians(lat)) / 2) * sin((radians(slat) - radians(lat)) / 2) " +
        "+ cos(radians(lat)) * cos(radians(slat)) " +
        "* sin((radians(slon) - radians(lon)) / 2) * sin((radians(slon) - radians(lon)) / 2))))"
    stream
      .withColumn("cell", expr(s"graft_s2_cell(CAST(lon AS DOUBLE), CAST(lat AS DOUBLE), $level)"))
      .join(dim, Seq("cell"))
      // filter on the RAW haversine (the batch twin's exact circle
      // test); floor() is presentation only on the emitted column —
      // filtering on the floored value admitted events up to ~1 m past R
      .filter(expr(dist) <= radiusMeters)
      .withColumn("dist_m", expr(s"CAST(floor($dist) AS BIGINT)"))
      .select(col("event_id"), col("ts"), col("site"), col("dist_m"))
  }
}
