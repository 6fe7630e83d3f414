package graft.model

import org.apache.spark.sql.types._

/** Fixed, declared schemas for the CDC pipeline (schema-on-write at both
  * ends, schema-on-read in flight) — see SURVEY.md §1.
  *
  * Shapes derive from the reference pipeline:
  *  - source table `inventory.orders_info`: orders-generator/main.go:15-20
  *  - Debezium change envelope: README.md:264-293
  *  - analytical sink table `Orders`: README.md:121
  */
object Schemas {

  /** D1 — relational source row (orders-generator/main.go:15-20).
    * Fields are nullable: schema-on-read via `from_json` always yields
    * nullable fields, and `before`/`after` are struct-null per op anyway. */
  val orderRow: StructType = StructType(Seq(
    StructField("orderid", IntegerType),
    StructField("custid", IntegerType),
    StructField("amount", IntegerType),
    StructField("city", StringType),
  ))

  /** Debezium `source` block (README.md:275-287). `lsn` is the total-order
    * token within the source DB; `txId` groups rows per transaction;
    * `snapshot` distinguishes snapshot reads from live stream. */
  val source: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("connector", StringType),
    StructField("name", StringType),
    StructField("ts_ms", LongType),
    StructField("snapshot", StringType),
    StructField("db", StringType),
    StructField("schema", StringType),
    StructField("table", StringType),
    StructField("txId", LongType),
    StructField("lsn", LongType),
    StructField("xmin", LongType),
  ))

  /** D2 — Debezium change-event payload (README.md:264-293).
    * `before` is null for inserts/reads, `after` is null for deletes. */
  val payload: StructType = StructType(Seq(
    StructField("before", orderRow),
    StructField("after", orderRow),
    StructField("source", source),
    StructField("op", StringType),          // "c" | "u" | "d" | "r" (README.md:288)
    StructField("ts_ms", LongType),
    StructField("transaction", StringType), // null in the reference (README.md:290)
  ))

  /** Full envelope as shipped by JsonConverter: the embedded Connect
    * `schema` blob (README.md:262) is represented as an opaque string and
    * dropped on unwrap, matching the ExtractNewRecordState SMT
    * (adx-sink-config.json:15-16). */
  val envelope: StructType = StructType(Seq(
    StructField("schema", StringType),
    StructField("payload", payload),
  ))

  /** Pruned read schemas — projection pushdown INTO the JSON parser.
    * `from_json` costs scale with the fields it materializes, and
    * Catalyst does NOT narrow the parse schema through the
    * `event.payload` projection [[graft.cdc.Cdc.decode]] makes
    * (measured: the full 25-field envelope was parsed for queries
    * consuming only `after` + `op`). Operators that statically know
    * their field set pass the matching pruned schema; the JSON parser
    * skips everything else. Decode/dead-letter semantics are unchanged:
    * a malformed document still fails the whole-row parse. */
  val envelopeUnwrap: StructType = StructType(Seq(
    StructField("payload", StructType(Seq(
      StructField("after", orderRow),
      StructField("op", StringType)))),
  ))

  /** [[envelopeUnwrap]] plus the `source.lsn` ordering token — the
    * latest-state operators' field set. */
  val envelopeLatest: StructType = StructType(Seq(
    StructField("payload", StructType(Seq(
      StructField("before", orderRow),
      StructField("after", orderRow),
      StructField("source", StructType(Seq(StructField("lsn", LongType)))),
      StructField("op", StringType)))),
  ))

  /** D3 — analytical sink table `Orders` DDL (README.md:121). Note the
    * deliberate int→string cast of orderid/custid and the reordered
    * columns (city before amount) relative to the source. */
  val sinkOrders: StructType = StructType(Seq(
    StructField("orderid", StringType),
    StructField("custid", StringType),
    StructField("city", StringType),
    StructField("amount", IntegerType),
  ))
}

/** Typed views, where compile-time field checks help (SURVEY.md §1.3). */
case class Order(orderid: Int, custid: Int, amount: Int, city: String)

case class CdcSource(version: String, connector: String, name: String,
                     ts_ms: Long, snapshot: String, db: String,
                     schema: String, table: String, txId: Long, lsn: Long,
                     xmin: Option[Long])

case class CdcPayload(before: Option[Order], after: Option[Order],
                      source: CdcSource, op: String, ts_ms: Long,
                      transaction: Option[String])
