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

  // --- restart-from-checkpoint -------------------------------------------

  private def copyDir(from: String, to: String): Unit = {
    val src = java.nio.file.Paths.get(from)
    val dst = java.nio.file.Paths.get(to)
    val walk = java.nio.file.Files.walk(src)
    try walk.forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally walk.close()
  }

  private def deleteDir(dir: String): Unit = {
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
      finally walk.close()
    }
  }

  test("restart from checkpoint replays the in-flight batch idempotently") {
    // The exactly-once contract under crash/restart: offsets come from
    // the checkpoint WAL, writes are batch-id-keyed overwrites. A file
    // source is fully replayable (unlike MemoryStream, which prunes
    // committed data), so rolling the checkpoint back to a pre-batch
    // snapshot forces Spark to REPLAY that batch on restart — the
    // overwrite must land it exactly once, and nothing may be dropped.
    val inDir = Files.createTempDirectory("graft-sdd-rin").toString
    val out = Files.createTempDirectory("graft-sdd-rout").toString
    val ckpt = Files.createTempDirectory("graft-sdd-rckpt").toString
    val snap = Files.createTempDirectory("graft-sdd-rsnap").toString
    val base = Seq(doc(0L, baseText, "base")).toDF("doc_id", "text", "lang", "source")
    def input() = spark.readStream.schema(base.schema).parquet(inDir)

    // file A → batch 0: one near-dup of the base, one unique
    Seq(doc(100L, baseText),
        doc(101L, "entirely unrelated vocabulary with nothing shared at all"))
      .toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.mode("append").parquet(inDir)
    val r1 = StreamingDedup.start(input(), base, out, ckpt,
      trigger = Trigger.ProcessingTime(0))
    try {
      r1.query.processAllAvailable()
      copyDir(ckpt, snap) // checkpoint state: batch 0 committed, batch 1 unknown

      // file B → batch 1: another dup (word-set permutation) + unique
      Seq(doc(200L, "batch window sort merge filter join partition shuffle spark agg"),
          doc(201L, "second unique document with completely fresh words only"))
        .toDF("doc_id", "text", "lang", "source")
        .coalesce(1).write.mode("append").parquet(inDir)
      r1.query.processAllAvailable()
    } finally r1.stop()
    assert(spark.read.parquet(s"$out/batch=*")
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(101L, 201L))

    // crash simulation: the process died after batch 1's sink write but
    // before its commit survived — restart from the rolled-back WAL
    deleteDir(ckpt)
    copyDir(snap, ckpt)
    assert(!new java.io.File(s"$ckpt/commits/1").exists()) // rollback really lost batch 1
    val r2 = StreamingDedup.start(input(), base, out, ckpt,
      trigger = Trigger.ProcessingTime(0))
    try r2.query.processAllAvailable() finally r2.stop()
    // guard against a vacuous pass: the restarted query must have
    // RE-planned and RE-committed batch 1, not skipped it
    assert(new java.io.File(s"$ckpt/commits/1").exists(),
      "restart did not replay the rolled-back batch")

    // batch 1 was re-planned and re-delivered: still exactly one copy of
    // every survivor, no drops, and the batch dirs are exactly {0, 1}
    val kept = spark.read.parquet(s"$out/batch=*")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(101L, 201L), s"restart broke exactly-once: $kept")
    val batchDirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(batchDirs == Seq("batch=0", "batch=1"), s"unexpected batches: $batchDirs")
  }
}
