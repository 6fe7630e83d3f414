package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** End-to-end upsert materialization: envelope stream → stateful
  * latest-state → versioned MERGE table. The queryable snapshot always
  * reflects every processed change, across micro-batches. */
class UpsertPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def env(orderid: Int, amount: Int, lsn: Long, op: String = "c"): String = {
    val after =
      if (op == "d") "null"
      else s"""{"orderid":$orderid,"custid":${orderid * 10},"amount":$amount,"city":"Austin"}"""
    val before = if (op == "c") "null"
      else s"""{"orderid":$orderid,"custid":${orderid * 10},"amount":0,"city":"Austin"}"""
    s"""{"schema":null,"payload":{"before":$before,"after":$after,"source":{"version":"1.9.5","connector":"postgresql","name":"m","ts_ms":$lsn,"snapshot":"false","db":"d","schema":"s","table":"t","txId":$lsn,"lsn":$lsn,"xmin":null},"op":"$op","ts_ms":$lsn,"transaction":null}}"""
  }

  test("stream -> stateful upserts -> versioned table, across micro-batches") {
    implicit val sql = spark.sqlContext
    val source = MemoryStream[String]
    val table = Files.createTempDirectory("graft-upsert-e2e").toString + "/orders"
    val ckpt = Files.createTempDirectory("graft-upsert-ckpt").toString

    val q = Materializer.startUpsert(
      source.toDF().select(col("value")),
      tablePath = table, checkpointPath = ckpt,
      trigger = Trigger.ProcessingTime(0))
    try {
      source.addData(env(1, 100, 10), env(2, 150, 20))
      q.processAllAvailable()
      assert(Sinks.readLatest(spark, table)
        .select("orderid", "amount").as[(Int, Int)].collect().sorted.toSeq ==
        Seq((1, 100), (2, 150)))

      source.addData(env(1, 120, 11, op = "u"), env(2, 0, 21, op = "d"),
        env(3, 170, 30))
      q.processAllAvailable()
      assert(Sinks.readLatest(spark, table)
        .select("orderid", "amount").as[(Int, Int)].collect().sorted.toSeq ==
        Seq((1, 120), (3, 170)))
    } finally q.stop()
  }

  test("restart from checkpoint: per-key state survives, lsn guard holds across restarts") {
    implicit val sql = spark.sqlContext
    val source = MemoryStream[String]
    val table = Files.createTempDirectory("graft-upsert-restart").toString + "/orders"
    val ckpt = Files.createTempDirectory("graft-upsert-restart-ckpt").toString
    def start() = Materializer.startUpsert(
      source.toDF().select(col("value")),
      tablePath = table, checkpointPath = ckpt,
      trigger = Trigger.ProcessingTime(0))

    val q1 = start()
    try {
      source.addData(env(1, 100, 10), env(2, 0, 20, op = "d"))
      q1.processAllAvailable()
    } finally q1.stop()

    // Restart on the same checkpoint. The flatMapGroupsWithState store
    // must come back: a STALE lower-lsn replay of key 1 and a
    // resurrection attempt of tombstoned key 2 must both lose to the
    // recovered state, while a genuine update lands.
    val q2 = start()
    try {
      source.addData(env(1, 55, 9), env(2, 999, 19), env(1, 130, 11, op = "u"))
      q2.processAllAvailable()
      assert(Sinks.readLatest(spark, table)
        .select("orderid", "amount").as[(Int, Int)].collect().sorted.toSeq ==
        Seq((1, 130)))
    } finally q2.stop()
  }
}
