package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Load number for the streaming materialization path (K1–K3): 105k
  * envelopes (100k distinct + 5k at-least-once replays) through
  * decode → watermark dedup → unwrap → idempotent parquet sink, fed as
  * four MemoryStream chunks so multiple micro-batches execute. Asserts
  * exactly-once output counts and records rows/s plus per-batch wall
  * times from the query's progress log — the 30 s-trigger design's
  * first measured throughput figure (local[4]; envelope parse is
  * stateless map work, so production scales with source partitions).
  * The floor assertion is deliberately conservative (≥ 2000 rows/s) so
  * the spec pins "not pathologically slow" without becoming flaky on a
  * loaded machine.
  */
class ThroughputSpec extends SparkSpec {
  import spark.implicits._

  /** ts_ms = lsn (1 ms apart): the whole stream spans ~105 s of event
    * time, far inside the 10-minute dedup watermark, so no replay is
    * ever dropped as "late" — every dedup is a true lsn+op duplicate. */
  private def env(orderid: Int, lsn: Long): String =
    s"""{"schema":null,"payload":{"before":null,""" +
      s""""after":{"orderid":$orderid,"custid":${orderid % 1000},"amount":${100 + orderid % 100},"city":"Seattle"},""" +
      s""""source":{"version":"1.9.5","connector":"postgresql","name":"myserver","ts_ms":$lsn,""" +
      s""""snapshot":"false","db":"inventory","schema":"inventory","table":"orders_info","txId":$lsn,"lsn":$lsn,"xmin":null},""" +
      s""""op":"c","ts_ms":$lsn,"transaction":null}}"""

  test("100k-envelope run: exactly-once counts, recorded rows/s and batch times") {
    implicit val sql = spark.sqlContext
    val source = MemoryStream[String]
    val out = Files.createTempDirectory("graft-tp-out").toString
    val ckpt = Files.createTempDirectory("graft-tp-ckpt").toString
    val nDistinct = 100000
    val nReplay = 5000

    val chunks = (0 until nDistinct).map(i => env(i, i.toLong + 1))
      .grouped(nDistinct / 4).toSeq
    // replays: the first 5k envelopes re-delivered in the LAST chunk —
    // cross-micro-batch duplicates, the at-least-once worst case
    val replays = (0 until nReplay).map(i => env(i, i.toLong + 1))

    val q = Materializer.start(
      source.toDF().select(col("value")),
      outPath = out, checkpointPath = ckpt,
      trigger = Trigger.ProcessingTime(0))
    val t0 = System.nanoTime()
    try {
      chunks.dropRight(1).foreach { c => source.addData(c); q.processAllAvailable() }
      source.addData(chunks.last ++ replays)
      q.processAllAvailable()
    } finally q.stop()
    val wallSec = (System.nanoTime() - t0) / 1e9

    val outDf = spark.read.parquet(s"$out/batch=*")
    assert(outDf.count() == nDistinct.toLong, "replays must dedup to exactly-once output")
    assert(outDf.select(col("orderid").cast("long")).distinct().count() == nDistinct.toLong)

    val progresses = q.recentProgress.filter(_.numInputRows > 0)
    val batchMs = progresses.map(p => p.durationMs.get("triggerExecution").toLong)
    val rowsPerSec = (nDistinct + nReplay) / wallSec
    info(f"${nDistinct + nReplay} envelopes in $wallSec%.1f s = $rowsPerSec%.0f rows/s " +
      f"(${progresses.length} batches, max batch ${batchMs.max} ms, " +
      f"mean ${batchMs.sum / batchMs.length} ms)")
    assert(rowsPerSec >= 2000,
      f"throughput $rowsPerSec%.0f rows/s below the 2000 rows/s sanity floor")
    // every micro-batch must finish far inside the 30 s production
    // trigger at this volume — the batching design's latency contract
    assert(batchMs.max < 30000, s"a micro-batch took ${batchMs.max} ms (>= 30 s trigger)")
  }
}
