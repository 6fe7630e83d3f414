package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Schema drift at the ingress boundary: the fixed-StructType decode
  * must degrade predictably when producers drift — unknown fields are
  * ignored, missing fields surface as nulls, and undecodable lines drop
  * out of the unwrap path instead of failing the stream. */
class SchemaDriftSpec extends SparkSpec {
  import spark.implicits._

  test("unknown envelope fields are ignored; missing fields become null") {
    val drifted = Seq(
      // extra top-level + payload fields
      """{"schema":null,"new_field":true,"payload":{"before":null,"after":{"orderid":1,"custid":10,"amount":100,"city":"Seattle","surprise":"x"},"source":{"version":"1.9.5","connector":"postgresql","name":"m","ts_ms":1,"snapshot":"false","db":"d","schema":"s","table":"t","txId":1,"lsn":1,"xmin":null},"op":"c","ts_ms":1,"transaction":null}}""",
      // missing amount
      """{"schema":null,"payload":{"before":null,"after":{"orderid":2,"custid":20,"city":"Austin"},"source":{"version":"1.9.5","connector":"postgresql","name":"m","ts_ms":2,"snapshot":"false","db":"d","schema":"s","table":"t","txId":2,"lsn":2,"xmin":null},"op":"c","ts_ms":2,"transaction":null}}""")
    val flat = Cdc.unwrap(Cdc.decode(drifted.toDF("value")))
      .select("orderid", "amount").collect()
    assert(flat.length == 2)
    assert(flat.find(_.getInt(0) == 1).get.getInt(1) == 100)
    assert(flat.find(_.getInt(0) == 2).get.isNullAt(1))
  }

  test("undecodable lines drop out of unwrap instead of failing the job") {
    val mixed = Seq(
      "this is not json",
      """{"schema":null,"payload":{"before":null,"after":{"orderid":3,"custid":30,"amount":130,"city":"Chicago"},"source":{"version":"1.9.5","connector":"postgresql","name":"m","ts_ms":3,"snapshot":"false","db":"d","schema":"s","table":"t","txId":3,"lsn":3,"xmin":null},"op":"c","ts_ms":3,"transaction":null}}""")
    val flat = Cdc.unwrap(Cdc.decode(mixed.toDF("value")))
    assert(flat.count() == 1)
    assert(flat.select("orderid").head().getInt(0) == 3)
    // and the raw decode keeps the bad line visible for a dead-letter path
    assert(Cdc.decode(mixed.toDF("value")).filter(col("payload").isNull).count() == 1)
    // the dead-letter view returns exactly the undecodable raw line
    assert(Cdc.deadLetters(mixed.toDF("value")).as[String].collect().toSeq ==
      Seq("this is not json"))
  }
}
