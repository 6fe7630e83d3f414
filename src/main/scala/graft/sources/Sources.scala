package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingress boundary (SURVEY.md §2.A): the engine's contract starts at
  * the CDC topic — a frame with a string `value` column holding Debezium
  * envelope JSON (+ an optional string `key`). Three interchangeable
  * ingress implementations produce that contract:
  *
  *  - [[kafkaEnvelopes]] — production path, maps the reference's sink
  *    consumer (adx-sink-config.json:7-8: subscribed topic, tracked
  *    offsets → checkpointLocation; parallelism = topic partitions).
  *    Requires the spark-sql-kafka connector jar at deploy time (not in
  *    this container, so exercised only as configuration).
  *  - [[envelopeFileStream]] — file-watch streaming ingress with the
  *    same output schema; used by tests and usable as a real landing-
  *    zone tap.
  *  - [[envelopeFiles]] — batch backfill over the same files (the
  *    snapshot side of snapshot-then-stream, §2.A-S3).
  *
  * Relational side-inputs load with EXPLICIT schemas only ([[csvTable]],
  * [[jsonTable]], [[parquetTable]]) — schema-on-read, never inference,
  * matching the reference's declared-DDL-everywhere model (§1.3). At
  * 100 TB inference is also a full extra scan; explicit schemas keep
  * ingestion single-pass.
  */
object Sources {

  /** The wire schema `format("kafka")` emits (Spark's Kafka source
    * contract — kafka-0-10-sql's fixed output columns). A substituted
    * test source must reproduce it exactly so [[kafkaEnvelopes]]'
    * projection exercises the same cast-from-binary path it runs
    * against a live broker. */
  val kafkaWireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Streaming Kafka ingress (production). `key`/`value` cast to string
    * exactly as the reference's converters declare
    * (adx-sink-config.json:13-14).
    *
    * The source is INJECTABLE: `format`/`options`/`schema` default to
    * the live-broker configuration, and a test substitutes a
    * file-backed source carrying [[kafkaWireSchema]] (unknown options —
    * the kafka.* ones — are ignored by other sources, per Spark's
    * option-passing contract), so the binary→string projection below
    * runs end-to-end in-sandbox even though no kafka connector jar nor
    * broker exists here. The live path has still never executed against
    * a real broker (S1/S4 stays `partial`) — but the code shape past
    * `.load()` is the exercised one. */
  def kafkaEnvelopes(spark: SparkSession, bootstrapServers: String,
                     topic: String,
                     startingOffsets: String = "earliest",
                     format: String = "kafka",
                     options: Map[String, String] = Map.empty,
                     schema: Option[StructType] = None): DataFrame = {
    var reader = spark.readStream
      .format(format)
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
    schema.foreach(s => reader = reader.schema(s))
    options.foreach { case (k, v) => reader = reader.option(k, v) }
    reader.load()
      .selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")
  }

  /** Streaming file ingress: newline-delimited envelope JSON under
    * `path`, picked up per micro-batch. */
  def envelopeFileStream(spark: SparkSession, path: String,
                         maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .text(path)
      .select(col("value"))

  /** Batch ingress over the same landing files (backfill/snapshot). */
  def envelopeFiles(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).select(col("value"))

  /** CSV with declared schema (header tolerated, never trusted). */
  def csvTable(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** Newline-delimited JSON with declared schema. */
  def jsonTable(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Parquet with schema assertion: fails fast if the file schema does
    * not contain the declared columns (name + type), instead of
    * surfacing nulls downstream. */
  def parquetTable(spark: SparkSession, path: String, schema: StructType): DataFrame =
    assertColumns(spark.read.parquet(path), path, schema, "parquet")

  /** ORC with the same schema assertion as [[parquetTable]] — Spark's
    * native ORC reader (no extra connector jar), same columnar
    * pushdown/pruning contract as parquet, for lakes standardized on
    * ORC (classic Hive/Hadoop estates). */
  def orcTable(spark: SparkSession, path: String, schema: StructType): DataFrame =
    assertColumns(spark.read.orc(path), path, schema, "orc")

  private def assertColumns(df: DataFrame, path: String,
                            schema: StructType, fmt: String): DataFrame = {
    val have = df.schema.map(f => f.name -> f.dataType).toMap
    val missing = schema.filterNot(f => have.get(f.name).contains(f.dataType))
    require(missing.isEmpty,
      s"$fmt at $path is missing/mistyped columns: ${missing.map(_.name).mkString(", ")}")
    df.select(schema.map(f => col(f.name)): _*)
  }
}
