package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Library façade — the entry point for a user replacing the reference
  * pipeline (SURVEY.md §0) with this engine:
  *
  * {{{
  * val spark = Graft.sessionBuilder(cores = 32).getOrCreate()
  * // production: Sources.kafkaEnvelopes(spark, brokers, topic)
  * val envelopes = graft.sources.Sources.envelopeFileStream(spark, landing)
  * // append-only Orders table (reference parity):
  * graft.streaming.Materializer.start(envelopes, outPath, ckpt)
  * // or the current-state upsert table:
  * graft.streaming.Materializer.startUpsert(envelopes, tablePath, ckpt)
  * // analytics (KQL dialect or plain DataFrame/SQL):
  * import graft.kql.Kql._
  * ordersDf.summarize(Seq("avg_sales" -> avg(col("amount"))), col("city"))
  * }}}
  */
object Graft {

  /** A session builder with the engine's defaults: native functions
    * registered via extensions, UTC semantics, shuffle parallelism
    * sized to the given core count (AQE coalesces downward at runtime). */
  def sessionBuilder(cores: Int, appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", math.max(cores, 1).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", classOf[functions.GraftExtensions].getName)

  /** Decode + unwrap an envelope frame to flat rows (batch or stream). */
  def unwrapped(envelopes: DataFrame, dropDeletes: Boolean = true): DataFrame =
    cdc.Cdc.unwrap(cdc.Cdc.decode(envelopes), dropDeletes)

  /** The latest-state view of a CDC log (batch form). */
  def latestState(envelopes: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    cdc.Cdc.latestState(cdc.Cdc.decode(envelopes),
      keyCol = coalesce(col("payload.after.orderid"), col("payload.before.orderid")),
      orderCol = col("payload.source.lsn"))
  }
}
