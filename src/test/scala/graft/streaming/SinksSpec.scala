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
}
