package graft.cdc

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Schemas

/** Envelope decode / unwrap / latest-state semantics against the
  * documented Debezium contract (README.md:264-293): op coverage c/u/d/r,
  * delete-drop compat mode, sink casts, and idempotence under
  * at-least-once replay. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  /** Hand-built envelope JSON matching README.md:264-293. */
  private def env(op: String, before: Option[(Int, Int, Int, String)],
                  after: Option[(Int, Int, Int, String)], lsn: Long): String = {
    def row(r: Option[(Int, Int, Int, String)]) = r match {
      case Some((o, c, a, ci)) =>
        s"""{"orderid":$o,"custid":$c,"amount":$a,"city":"$ci"}"""
      case None => "null"
    }
    s"""{"schema":null,"payload":{"before":${row(before)},"after":${row(after)},
       |"source":{"version":"1.9.5","connector":"postgresql","name":"myserver",
       |"ts_ms":${lsn * 1000},"snapshot":"false","db":"inventory","schema":"inventory",
       |"table":"orders_info","txId":$lsn,"lsn":$lsn,"xmin":null},
       |"op":"$op","ts_ms":${lsn * 1000},"transaction":null}}""".stripMargin.replace("\n", "")
  }

  private val fixture = Seq(
    env("r", None, Some((1, 10, 100, "Seattle")), 1),   // snapshot read
    env("c", None, Some((2, 20, 150, "Austin")), 2),    // insert
    env("u", Some((1, 10, 100, "Seattle")), Some((1, 10, 120, "Seattle")), 3), // update
    env("d", Some((2, 20, 150, "Austin")), None, 4),    // delete
    env("c", None, Some((2, 20, 150, "Austin")), 2),    // replayed duplicate insert
  )

  private def decoded = Cdc.decode(fixture.toDF("value"))

  test("decode parses the full envelope struct") {
    val rows = decoded.select("payload.op", "payload.source.lsn").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("c", "c", "d", "r", "u"))
  }

  test("unwrap default drops deletes (ExtractNewRecordState compat)") {
    val flat = Cdc.unwrap(decoded).collect()
    assert(flat.length == 4) // r, c, u, duplicate c — no d
    assert(!flat.exists(_.anyNull))
  }

  test("unwrap with dropDeletes=false keeps null-after delete rows") {
    val flat = Cdc.unwrap(decoded, dropDeletes = false).collect()
    assert(flat.length == 5)
    assert(flat.count(_.anyNull) == 1)
  }

  test("sink projection applies int→string casts and column order (README.md:121)") {
    val sink = Cdc.sinkProjection(Cdc.unwrap(decoded))
    assert(sink.schema == Schemas.sinkOrders)
    val r = sink.filter(col("orderid") === "2").head()
    assert(r == Row("2", "20", "Austin", 150))
  }

  test("latest-state view: update wins, delete removes, replay collapses") {
    val ls = Cdc.latestState(decoded,
      keyCol = coalesce(col("payload.after.orderid"), col("payload.before.orderid")),
      orderCol = col("payload.source.lsn")).collect()
    // key 1: update applied (amount 120); key 2: deleted; duplicate ignored
    assert(ls.toSeq == Seq(Row(1, 10, 120, "Seattle")))
  }

  test("latest-state is idempotent under full replay (at-least-once)") {
    val doubled = (fixture ++ fixture).toDF("value")
    val ls = Cdc.latestState(Cdc.decode(doubled),
      keyCol = coalesce(col("payload.after.orderid"), col("payload.before.orderid")),
      orderCol = col("payload.source.lsn")).collect()
    assert(ls.toSeq == Seq(Row(1, 10, 120, "Seattle")))
  }

  test("encode∘decode round-trips insert rows") {
    val rows = Seq((7, 70, 199, "Chicago")).toDF("orderid", "custid", "amount", "city")
    val encoded = Cdc.encodeInserts(rows, tsMs = lit(1000L), lsn = lit(5L))
    val back = Cdc.unwrap(Cdc.decode(encoded)).collect()
    assert(back.toSeq == Seq(Row(7, 70, 199, "Chicago")))
  }

  test("decode survives the literal reference envelope with an embedded schema OBJECT") {
    // README.md:264-293 verbatim (the reference elides the Connect schema
    // blob as {....} "for brevity" but states it is embedded in every
    // message, README.md:262): `schema` arrives as a JSON *object*, while
    // Schemas.envelope types the field as an opaque string. Spark's
    // JacksonParser stringifies a non-string token targeted at StringType
    // instead of corrupting the record — this pin proves real Debezium
    // traffic does not land in deadLetters on that type mismatch.
    val literal =
      """{
        |    "schema": {"type":"struct","fields":[{"type":"struct","fields":[
        |      {"type":"int32","optional":false,"field":"orderid"},
        |      {"type":"int32","optional":false,"field":"custid"},
        |      {"type":"int32","optional":false,"field":"amount"},
        |      {"type":"string","optional":false,"field":"city"}],
        |      "optional":true,"name":"myserver.inventory.orders_info.Value","field":"after"}],
        |      "optional":false,"name":"myserver.inventory.orders_info.Envelope"},
        |    "payload": {
        |        "before": null,
        |        "after": {
        |            "orderid": 51,
        |            "custid": 306,
        |            "amount": 183,
        |            "city": "city1"
        |        },
        |        "source": {
        |            "version": "1.2.1.Final",
        |            "connector": "postgresql",
        |            "name": "myserver",
        |            "ts_ms": 1602057392691,
        |            "snapshot": "false",
        |            "db": "postgres",
        |            "schema": "inventory",
        |            "table": "orders_info",
        |            "txId": 653,
        |            "lsn": 34220200,
        |            "xmin": null
        |        },
        |        "op": "c",
        |        "ts_ms": 1602057392818,
        |        "transaction": null
        |    }
        |}""".stripMargin
    val raw = Seq(literal).toDF("value")
    assert(Cdc.deadLetters(raw).count() == 0,
      "the embedded-schema-object envelope must not be dead-lettered")
    val flat = Cdc.unwrap(Cdc.decode(raw)).collect()
    assert(flat.toSeq == Seq(Row(51, 306, 183, "city1")))
    val src = Cdc.decode(raw)
      .select("payload.source.lsn", "payload.source.txId", "payload.op").head()
    assert(src == Row(34220200L, 653L, "c"))
  }

  test("decode tolerates source-side schema evolution: extra fields ignored, missing fields null") {
    // ADDITIVE evolution upstream (a new column lands in `after`, a new
    // envelope block appears): the fixed read schema must skip unknown
    // fields, not dead-letter or corrupt the row. SUBTRACTIVE drift (a
    // field the schema expects is absent) must read as null, not fail —
    // together these are the tolerance contract that lets reader and
    // writer deploy independently.
    val evolved =
      """{"payload":{"before":null,
        |"after":{"orderid":7,"custid":70,"amount":120,"city":"Austin",
        |  "loyalty_tier":"gold","discount":0.15},
        |"source":{"version":"2.0","connector":"postgresql","name":"m","ts_ms":1,
        |  "snapshot":"false","db":"d","schema":"s","table":"t","txId":1,"lsn":9,"xmin":null,
        |  "sequence":"[\"1\",\"2\"]"},
        |"op":"c","ts_ms":1,"transaction":null,"new_block":{"a":1}}}""".stripMargin.replace("\n", "")
    val missing = // no custid, no source.lsn
      """{"payload":{"before":null,
        |"after":{"orderid":8,"amount":130,"city":"Seattle"},
        |"source":{"version":"2.0","connector":"postgresql","name":"m","ts_ms":2,
        |  "snapshot":"false","db":"d","schema":"s","table":"t","txId":2,"xmin":null},
        |"op":"c","ts_ms":2,"transaction":null}}""".stripMargin.replace("\n", "")
    val raw = Seq(evolved, missing).toDF("value")
    assert(Cdc.deadLetters(raw).count() == 0,
      "schema-evolved envelopes must not be quarantined")
    val rows = Cdc.unwrap(Cdc.decode(raw)).collect().toSeq
    assert(rows.contains(Row(7, 70, 120, "Austin")))
    assert(rows.contains(Row(8, null, 130, "Seattle"))) // missing custid → null
    val lsn = Cdc.decode(raw).filter(col("payload.after.orderid") === 8)
      .select("payload.source.lsn").head()
    assert(lsn.isNullAt(0), "absent ordering token reads as null, not a parse failure")
  }

  test("op router partitions events completely") {
    val byOp = Cdc.byOp(decoded)
    assert(byOp("c").count() == 2 && byOp("u").count() == 1 &&
      byOp("d").count() == 1 && byOp("r").count() == 1)
  }
}
