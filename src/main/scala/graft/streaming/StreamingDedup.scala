package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.Dedup

/** Streaming incremental near-dedup — the continuous-ingest form of
  * [[graft.ext.Dedup.incrementalCleanedOn]]: a stream of new documents
  * is deduplicated against a STATIC curated base corpus, micro-batch by
  * micro-batch, using the exact same operator body as the batch path
  * ([[Dedup.dedupAgainstIndex]] — Catalyst re-plans it per batch inside
  * foreachBatch).
  *
  * Why foreachBatch rather than a pure stream-static join: collapsing
  * "has NO verified near-dup in the base" back to one row per document
  * needs an aggregation/anti-join over the stream side, which append-mode
  * stream-static plans cannot express without watermark state the
  * operator doesn't otherwise need. foreachBatch gives each micro-batch
  * full batch semantics — the canonical Spark shape for per-batch
  * set-difference work — while the stream still owns offsets/exactly-once.
  *
  * Scale notes: the base index (LSH band relation + broadcast Bloom
  * filter over band keys) is built ONCE at stream start, not per batch;
  * each micro-batch pays only its own band-key computation, a Bloom
  * row-filter (most new docs miss and never reach the join), and a
  * candidate-sized verify join. Batch writes are batch-id-keyed
  * overwrites, so replayed batches land idempotently — the same
  * exactly-once contract as [[Materializer]].
  */
object StreamingDedup {

  /** A running dedup stream plus the base index it probes. The index
    * (persisted bands + broadcast Bloom) lives as long as the stream;
    * [[stop]] stops the query AND releases the index — callers that
    * stop the query directly own the cleanup via [[index]]. */
  final case class Running(query: StreamingQuery, index: Dedup.BaseIndex) {
    def stop(): Unit = { query.stop(); index.unpersist() }
  }

  /** Start deduplicating `docs` (a streaming frame with doc_id, text,
    * lang, source columns) against `base`; survivors of each micro-batch
    * are appended under `outPath/batch=<id>`. */
  def start(docs: DataFrame, base: DataFrame, outPath: String,
            checkpointPath: String,
            trigger: Trigger = Trigger.ProcessingTime("30 seconds"),
            threshold: Double = 0.9): Running = {
    val index = Dedup.buildBaseIndex(base)
    val q = docs.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val kept = batch.join(
          Dedup.dedupAgainstIndex(batch, index, threshold),
          Seq("doc_id"), "left_anti")
        kept.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
      }
      .start()
    Running(q, index)
  }
}
