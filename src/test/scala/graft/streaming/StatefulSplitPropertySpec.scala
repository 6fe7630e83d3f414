package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Micro-batch-split invariance for the stateful latest-state operator:
  * for a randomized mixed-op CDC log (creates/updates/deletes/replays
  * across keys), EVERY partitioning of the events into micro-batches
  * must produce the identical final per-key state — and its live rows
  * must equal the batch `Cdc.latestState` materialization of the same
  * log. This is the property that makes the operator deployable: batch
  * boundaries are an accident of trigger timing, never semantics. */
class StatefulSplitPropertySpec extends SparkSpec {
  import spark.implicits._

  private def env(orderid: Int, amount: Int, lsn: Long, op: String): String = {
    val city = s"C${orderid % 3}"
    val after =
      if (op == "d") "null"
      else s"""{"orderid":$orderid,"custid":${orderid * 10},"amount":$amount,"city":"$city"}"""
    val before =
      if (op == "c") "null"
      else s"""{"orderid":$orderid,"custid":${orderid * 10},"amount":0,"city":"$city"}"""
    s"""{"schema":null,"payload":{"before":$before,"after":$after,
       |"source":{"version":"1.9.5","connector":"postgresql","name":"myserver",
       |"ts_ms":${lsn * 1000},"snapshot":"false","db":"inventory","schema":"inventory",
       |"table":"orders_info","txId":$lsn,"lsn":$lsn,"xmin":null},
       |"op":"$op","ts_ms":${lsn * 1000},"transaction":null}}""".stripMargin.replace("\n", "")
  }

  /** A randomized event log: 40 events over 8 keys with increasing lsn
    * and ~25% replayed duplicates appended out of order. */
  private def randomLog(seed: Long): Seq[String] = {
    val gen = Gen.listOfN(40, for {
      key <- Gen.chooseNum(1, 8)
      op <- Gen.frequency(5 -> Gen.const("c"), 3 -> Gen.const("u"), 2 -> Gen.const("d"))
      amt <- Gen.chooseNum(1, 999)
    } yield (key, op, amt))
    val base = gen.pureApply(Gen.Parameters.default, Seed(seed))
      .zipWithIndex.map { case ((k, op, a), i) => env(k, a, i + 1L, op) }
    val replays = Gen.listOfN(10, Gen.chooseNum(0, base.length - 1))
      .pureApply(Gen.Parameters.default, Seed(seed + 1)).map(base)
    base ++ replays
  }

  /** Run the stateful stream over `events` delivered in the given
    * batches; return the final (orderid, amount, deleted) per key. */
  private def finalState(batches: Seq[Seq[String]], name: String): Set[(Int, Int, Boolean)] = {
    implicit val sql = spark.sqlContext
    val source = MemoryStream[String]
    val q = StatefulLatestState.latestState(source.toDF().select(col("value")))
      .writeStream.outputMode("update").format("memory").queryName(name).start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) { source.addData(b); q.processAllAvailable() }
      }
      spark.table(name)
        .withColumn("rn", expr(
          "row_number() over (partition by orderid order by lsn desc)"))
        .filter(col("rn") === 1)
        .select("orderid", "amount", "deleted")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getBoolean(2))).toSet
    } finally q.stop()
  }

  test("final state is invariant under micro-batch partitioning; live rows match batch") {
    for (seed <- Seq(41L, 42L)) {
      val log = randomLog(seed)
      // three partitionings: one batch, one event per batch, random cuts
      val oneShot = Seq(log)
      val perEvent = log.map(Seq(_))
      val cuts = Gen.listOfN(5, Gen.chooseNum(1, log.length - 1))
        .pureApply(Gen.Parameters.default, Seed(seed + 2))
        .distinct.sorted
      val random = (Seq(0) ++ cuts ++ Seq(log.length)).sliding(2).map {
        case Seq(a, b) => log.slice(a, b) }.toSeq
      val s1 = finalState(oneShot, s"split_a_$seed")
      val s2 = finalState(perEvent, s"split_b_$seed")
      val s3 = finalState(random, s"split_c_$seed")
      assert(s1 == s2, s"one-shot vs per-event diverged (seed $seed)")
      assert(s1 == s3, s"one-shot vs random cuts diverged (seed $seed)")

      // live rows must equal the batch materialization of the same log
      val batch = graft.cdc.Cdc.latestState(
        graft.cdc.Cdc.decode(log.toDF("value")),
        keyCol = coalesce(col("payload.after.orderid"), col("payload.before.orderid")),
        orderCol = col("payload.source.lsn"))
        .select("orderid", "amount")
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      val live = s1.collect { case (k, a, false) => (k, a) }
      assert(live == batch, s"streaming live rows != batch view (seed $seed)")
    }
  }
}
