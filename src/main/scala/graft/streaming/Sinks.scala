package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sink-side data layout (SURVEY.md §2.F): the materialized table's
  * physical organization, which decides read cost at 100 TB.
  *
  *  - [[writePartitioned]] — hive-style directory partitioning: queries
  *    filtering on the partition column scan only their directories
  *    (partition pruning), the ADX-table analog of per-column layout.
  *  - [[compact]] — micro-batch sinks (30 s triggers, K1/K2) produce a
  *    small file per batch per partition; compaction rewrites a landing
  *    area into few large files. Uses coalesce (narrow, no shuffle):
  *    compaction is I/O-bound, and at scale it runs per partition as an
  *    OPTIMIZE-style maintenance job.
  */
object Sinks {

  /** Write an analytical table partitioned by the given columns. */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Rewrite `inPath` (e.g. the materializer's `batch=*` landing area)
    * into at most `targetFiles` files at `outPath`. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetFiles: Int): Unit =
    spark.read.parquet(inPath).coalesce(targetFiles)
      .write.mode("overwrite").parquet(outPath)
}
