package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sources.Sources

/** Trigger.AvailableNow backfill: drain everything currently in the
  * landing area through the same streaming pipeline (checkpointed, so a
  * later run resumes incrementally), then stop — the snapshot side of
  * snapshot-then-stream operations (SURVEY.md §2.A-S3) run through the
  * STREAMING engine rather than a separate batch path. */
class BackfillSpec extends SparkSpec {

  private val envs = (1 to 4).map { i =>
    s"""{"schema":null,"payload":{"before":null,"after":{"orderid":$i,"custid":${i * 10},"amount":${100 + i},"city":"Austin"},"source":{"version":"1.9.5","connector":"postgresql","name":"m","ts_ms":$i,"snapshot":"true","db":"d","schema":"s","table":"t","txId":$i,"lsn":$i,"xmin":null},"op":"r","ts_ms":$i,"transaction":null}}"""
  }

  test("AvailableNow drains the landing area and terminates; resume picks up only new files") {
    val dir = Files.createTempDirectory("graft-backfill")
    val out = Files.createTempDirectory("graft-backfill-out").toString
    val ckpt = Files.createTempDirectory("graft-backfill-ckpt").toString
    Files.write(dir.resolve("a.jsonl"), envs.take(2).mkString("\n").getBytes)
    Files.write(dir.resolve("b.jsonl"), envs.drop(2).mkString("\n").getBytes)

    def run(): Unit = {
      val q = Materializer.start(
        Sources.envelopeFileStream(spark, dir.toString),
        outPath = out, checkpointPath = ckpt,
        trigger = Trigger.AvailableNow())
      q.awaitTermination(60000)
      assert(!q.isActive, "AvailableNow must terminate on its own")
    }

    run()
    assert(spark.read.parquet(s"$out/batch=*").count() == 4)

    // new file lands; a new AvailableNow run processes ONLY it
    Files.write(dir.resolve("c.jsonl"),
      envs.head.replace("\"orderid\":1", "\"orderid\":9")
        .replace("\"lsn\":1", "\"lsn\":9").getBytes)
    run()
    val all = spark.read.parquet(s"$out/batch=*")
    assert(all.count() == 5)
    assert(all.filter("orderid = '9'").count() == 1)
  }
}
