package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stateful streaming latest-state: upserts, lsn-guarded idempotence,
  * tombstoned deletes, and parity with the batch materialization. */
class StatefulLatestStateSpec extends SparkSpec {
  import spark.implicits._

  private def env(orderid: Int, amount: Int, city: String, lsn: Long,
                  op: String = "c", tsMs: Long = -1L): String = {
    val ts = if (tsMs >= 0) tsMs else lsn * 1000
    val after =
      if (op == "d") "null"
      else s"""{"orderid":$orderid,"custid":${orderid * 10},"amount":$amount,"city":"$city"}"""
    val before =
      if (op == "c") "null"
      else s"""{"orderid":$orderid,"custid":${orderid * 10},"amount":0,"city":"$city"}"""
    s"""{"schema":null,"payload":{"before":$before,"after":$after,
       |"source":{"version":"1.9.5","connector":"postgresql","name":"myserver",
       |"ts_ms":$ts,"snapshot":"false","db":"inventory","schema":"inventory",
       |"table":"orders_info","txId":$lsn,"lsn":$lsn,"xmin":null},
       |"op":"$op","ts_ms":$ts,"transaction":null}}""".stripMargin.replace("\n", "")
  }

  test("per-key state upserts, deletes tombstone, replay cannot resurrect") {
    implicit val sql = spark.sqlContext
    val source = MemoryStream[String]
    val q = StatefulLatestState.latestState(source.toDF().select(col("value")))
      .writeStream.outputMode("update").format("memory").queryName("latest").start()
    try {
      source.addData(env(1, 100, "Seattle", 10), env(2, 150, "Austin", 20))
      q.processAllAvailable()
      source.addData(
        env(1, 120, "Seattle", 11, op = "u"), // update wins (higher lsn)
        env(2, 0, "Austin", 21, op = "d"),    // delete -> tombstone
        env(2, 150, "Austin", 20))            // replayed insert below lsn: ignored
      q.processAllAvailable()

      // latest emission per key (max lsn in the memory sink's append log)
      val rows = spark.table("latest")
        .withColumn("rn", expr(
          "row_number() over (partition by orderid order by lsn desc)"))
        .filter(col("rn") === 1).drop("rn")
        .as[StatefulLatestState.KeyState].collect().sortBy(_.orderid)
      assert(rows.map(r => (r.orderid, r.amount, r.deleted)).toSeq ==
        Seq((1, 120, false), (2, 150, true)))
    } finally q.stop()
  }

  test("TTL variant expires tombstones after retention (documented resurrection tradeoff)") {
    implicit val sql = spark.sqlContext
    val source = MemoryStream[String]
    val q = StatefulLatestState.latestStateWithTtl(
        source.toDF().select(col("value")),
        retentionMs = 60000L, watermark = "0 seconds")
      .writeStream.outputMode("update").format("memory").queryName("ttl").start()
    try {
      // key 1 inserted then deleted; far-future traffic on key 2 pushes
      // the watermark past key 1's retention window -> tombstone expires
      source.addData(env(1, 100, "Seattle", 10), env(1, 0, "Seattle", 11, op = "d"))
      q.processAllAvailable()
      source.addData(env(2, 150, "Austin", 1000))
      q.processAllAvailable()
      source.addData(env(2, 151, "Austin", 1001, op = "u"))
      q.processAllAvailable()
      // a redelivery of key 1's insert with a CURRENT event timestamp but
      // the old lsn: the tombstone (and its lsn guard) has expired, so the
      // stale change re-applies - the documented retention tradeoff. (A
      // replay with its ORIGINAL old timestamp would be cut by the
      // watermark filter before reaching state at all.)
      source.addData(env(1, 100, "Seattle", 10, tsMs = 1100 * 1000L))
      q.processAllAvailable()
      // batch 1 emitted key 1's tombstone (lsn 11); this emission can only
      // exist if that tombstone (and its lsn guard) expired in between
      assert(spark.table("ttl")
        .filter("orderid = 1 AND lsn = 10 AND NOT deleted").count() == 1,
        spark.table("ttl").collect().mkString("; "))
    } finally q.stop()
  }

  test("TTL clock is monotone: a late-but-valid replay cannot shorten retention") {
    // retention runs from the MAX event time seen per key; if the clock
    // instead followed the latest batch's timestamps, the late lsn-11
    // update (event_ts 500s < the earlier 1000s) would pull key 1's
    // timeout back below the watermark, expire its state, and let the
    // stale lsn-5 replay resurrect with no lsn guard.
    implicit val sql = spark.sqlContext
    val source = MemoryStream[String]
    val q = StatefulLatestState.latestStateWithTtl(
        source.toDF().select(col("value")),
        retentionMs = 60000L, watermark = "600 seconds")
      .writeStream.outputMode("update").format("memory").queryName("ttlmono").start()
    try {
      source.addData(env(1, 100, "Seattle", 10, tsMs = 1000 * 1000L))
      q.processAllAvailable()
      // late but above-watermark update: higher lsn, OLDER event time
      source.addData(env(1, 120, "Seattle", 11, op = "u", tsMs = 500 * 1000L))
      q.processAllAvailable()
      // unrelated traffic pushes the watermark to 600s, then another
      // batch with no key-1 data gives the timeout a chance to fire
      source.addData(env(2, 150, "Austin", 20, tsMs = 1200 * 1000L))
      q.processAllAvailable()
      source.addData(env(2, 151, "Austin", 21, op = "u", tsMs = 1210 * 1000L))
      q.processAllAvailable()
      // stale replay (lsn 5) with a current timestamp: the still-alive
      // state's lsn guard must ignore it
      source.addData(env(1, 90, "Seattle", 5, tsMs = 1150 * 1000L))
      q.processAllAvailable()
      assert(spark.table("ttlmono").filter("orderid = 1 AND lsn = 5").count() == 0,
        spark.table("ttlmono").collect().mkString("; "))
      assert(spark.table("ttlmono")
        .filter("orderid = 1 AND lsn = 11 AND amount = 120").count() >= 1)
    } finally q.stop()
  }

  test("streaming state matches the batch latest-state materialization") {
    implicit val sql = spark.sqlContext
    val envs = Seq(
      env(1, 100, "Seattle", 10), env(1, 130, "Seattle", 12, op = "u"),
      env(2, 150, "Austin", 20), env(3, 170, "Chicago", 30),
      env(3, 0, "Chicago", 31, op = "d"), env(2, 150, "Austin", 20))

    val source = MemoryStream[String]
    val q = StatefulLatestState.latestState(source.toDF().select(col("value")))
      .writeStream.outputMode("update").format("memory").queryName("parity").start()
    try {
      source.addData(envs: _*)
      q.processAllAvailable()
      val streaming = spark.table("parity")
        .withColumn("rn", expr(
          "row_number() over (partition by orderid order by lsn desc)"))
        .filter(col("rn") === 1 && !col("deleted"))
        .select("orderid", "custid", "amount", "city")

      val batch = graft.cdc.Cdc.latestState(
        graft.cdc.Cdc.decode(envs.toDF("value")),
        keyCol = coalesce(col("payload.after.orderid"), col("payload.before.orderid")),
        orderCol = col("payload.source.lsn"))
        .select("orderid", "custid", "amount", "city")

      assert(streaming.exceptAll(batch).isEmpty && batch.exceptAll(streaming).isEmpty)
    } finally q.stop()
  }
}
