package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Streaming incremental near-dedup: a document stream deduped against
  * a static curated base via the SAME operator body as the batch path
  * ([[graft.ext.Dedup.dedupAgainstIndex]]) — the base index (bands +
  * broadcast Bloom) is built once at stream start and probed by every
  * micro-batch. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val baseText = "spark shuffle partition join filter merge sort window batch agg"
  private def doc(id: Long, text: String, source: String = "stream") =
    (id, text, "en", source)

  test("per-batch dedup against the static base; uniques survive, near-dups drop") {
    implicit val sql = spark.sqlContext
    val base = Seq(doc(0L, baseText, "base")).toDF("doc_id", "text", "lang", "source")
    val source = MemoryStream[(Long, String, String, String)]
    val docs = source.toDF().toDF("doc_id", "text", "lang", "source")
    val out = Files.createTempDirectory("graft-sdd-out").toString
    val ckpt = Files.createTempDirectory("graft-sdd-ckpt").toString
    val running = StreamingDedup.start(docs, base, out, ckpt,
      trigger = Trigger.ProcessingTime(0))
    val q = running.query
    try {
      // batch 1: one exact near-dup of the base (identical word set →
      // jaccard 1.0) and one unique doc
      source.addData(
        doc(100L, baseText),
        doc(101L, "entirely unrelated vocabulary with nothing shared at all"))
      q.processAllAvailable()
      // batch 2: another dup (word-set permutation — same SET, so the
      // minhash signature and jaccard are identical) and another unique
      source.addData(
        doc(200L, "batch window sort merge filter join partition shuffle spark agg"),
        doc(201L, "second unique document with completely fresh words only"))
      q.processAllAvailable()
      val kept = spark.read.parquet(s"$out/batch=*")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(kept == Seq(101L, 201L))
    } finally running.stop() // stops the query AND releases the base index
  }
}
