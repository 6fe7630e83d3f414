package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sink layout: partition pruning actually prunes, and compaction
  * collapses micro-batch small files without changing the data. */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned write prunes non-matching partitions at the scan") {
    val out = Files.createTempDirectory("graft-part").toString + "/t"
    val df = Seq((1, "Seattle"), (2, "Austin"), (3, "Seattle"))
      .toDF("orderid", "city")
    Sinks.writePartitioned(df, out, "city")
    assert(new java.io.File(s"$out/city=Seattle").exists())

    val pruned = spark.read.parquet(out).filter(col("city") === "Seattle")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == 2)
    assert(!plan.contains("city=Austin"), "pruned partition must not be scanned")
  }

  test("compaction collapses many small files, preserving rows exactly") {
    val in = Files.createTempDirectory("graft-small").toString + "/in"
    val out = Files.createTempDirectory("graft-compact").toString + "/out"
    spark.range(1000).toDF("id").repartition(20).write.parquet(in)
    assert(parquetFiles(in) == 20)

    Sinks.compact(spark, in, out, targetFiles = 2)
    assert(parquetFiles(out) <= 2)
    assert(spark.read.parquet(out).agg(sum("id")).head().getLong(0) == 499500L)
  }

  private def parquetFiles(dir: String): Int =
    new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))

  test("keyed upsert sink: updates win by lsn, tombstones delete, replay is idempotent") {
    val table = Files.createTempDirectory("graft-upsert").toString + "/orders"
    def batch(rows: (Int, Long, Boolean, Int)*) =
      rows.toDF("orderid", "lsn", "deleted", "amount")

    Sinks.upsertByKey(spark, batch((1, 10L, false, 100), (2, 20L, false, 150)),
      table, newVersion = 1)
    Sinks.upsertByKey(spark, batch((1, 11L, false, 120), (2, 21L, true, 0),
      (3, 30L, false, 170)), table, newVersion = 2)

    val latest = Sinks.readLatest(spark, table)
      .select("orderid", "amount").as[(Int, Int)].collect().sorted.toSeq
    assert(latest == Seq((1, 120), (3, 170))) // 1 updated, 2 deleted, 3 inserted

    // replayed stale batch (at-least-once): merges to the same state
    Sinks.upsertByKey(spark, batch((1, 10L, false, 100)), table, newVersion = 3)
    val after = Sinks.readLatest(spark, table)
      .select("orderid", "amount").as[(Int, Int)].collect().sorted.toSeq
    assert(after == latest, "stale replay must not regress state")

    // old snapshot still readable (versioned dirs)
    assert(spark.read.parquet(s"$table/v=1").count() == 2)
  }

  test("upsert sink survives additive schema evolution (new column backfills null)") {
    val table = Files.createTempDirectory("graft-evolve").toString + "/orders"
    Sinks.upsertByKey(spark,
      Seq((1, 10L, false, 100)).toDF("orderid", "lsn", "deleted", "amount"),
      table, newVersion = 1)
    // producer adds a column mid-stream
    Sinks.upsertByKey(spark,
      Seq((2, 20L, false, 150, "web")).toDF("orderid", "lsn", "deleted", "amount", "channel"),
      table, newVersion = 2)
    val latest = Sinks.readLatest(spark, table)
    assert(latest.columns.contains("channel"))
    assert(latest.filter(col("orderid") === 1).select("channel").head().isNullAt(0))
    assert(latest.filter(col("orderid") === 2).select("channel").head().getString(0) == "web")
  }
}
