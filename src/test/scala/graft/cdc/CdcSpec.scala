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

  test("op router partitions events completely") {
    val byOp = Cdc.byOp(decoded)
    assert(byOp("c").count() == 2 && byOp("u").count() == 1 &&
      byOp("d").count() == 1 && byOp("r").count() == 1)
  }
}
