package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ingest-time chunk-level dedup: the SAME stateless chunker as the
  * batch path ([[graft.ext.TextAnalysis.chunkOverlapOn]]) runs over a
  * document stream, chained with dropDuplicatesWithinWatermark on the
  * chunk fingerprint — repeated boilerplate chunks are dropped at
  * ingest while state stays WATERMARK-BOUNDED (the fingerprint store
  * is evicted once the watermark passes, so an unbounded stream cannot
  * accumulate unbounded dedup state; a duplicate arriving after
  * eviction is readmitted — the documented at-most-window guarantee,
  * exactly Spark's contract for the operator). */
class StreamingChunkDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("repeated chunk fingerprints drop within the watermark window; state evicts after") {
    implicit val sql = spark.sqlContext
    val source = MemoryStream[(Long, String, Timestamp)]
    val docs = source.toDF().toDF("doc_id", "text", "ts")

    val chunks = graft.ext.TextAnalysis.chunkOverlapOn(docs, window = 4, stride = 2)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("chunk_hash")

    val q = chunks.writeStream.outputMode("append")
      .format("memory").queryName("chunk_dedup").start()
    try {
      // batch 1: docs 1 and 2 share the exact 4-token chunk (classic
      // boilerplate); doc 3 is unique
      source.addData(
        (1L, "terms of service apply", ts(0)),
        (2L, "terms of service apply", ts(1)),
        (3L, "completely novel content here", ts(1)))
      q.processAllAvailable()
      def docsOut: Set[Long] =
        spark.table("chunk_dedup").select("doc_id").as[Long].collect().toSet
      assert(docsOut == Set(1L, 3L), s"batch1 -> $docsOut")

      // batch 2: another copy inside the watermark window -> dropped
      source.addData((4L, "terms of service apply", ts(5)))
      q.processAllAvailable()
      assert(docsOut == Set(1L, 3L), s"batch2 -> $docsOut")

      // advance the watermark far past the window, then replay the
      // boilerplate: the fingerprint state was evicted -> readmitted
      source.addData((5L, "watermark advancing sentinel text", ts(120)))
      q.processAllAvailable()
      source.addData((6L, "terms of service apply", ts(125)))
      q.processAllAvailable()
      assert(docsOut == Set(1L, 3L, 5L, 6L), s"post-eviction -> $docsOut")
    } finally q.stop()
  }
}
