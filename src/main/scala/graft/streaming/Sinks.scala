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

  /** MERGE-style keyed upsert onto a versioned parquet table — the
    * materialize-latest sink the upsert stream
    * ([[StatefulLatestState]], OutputMode.Update) feeds. Each call
    * merges a batch of upserts/tombstones into the current snapshot by
    * (key, max ordCol) and writes a NEW immutable version directory
    * (`v=<version>`); readers always see a complete snapshot
    * ([[readLatest]] picks the max version), old versions remain
    * readable, and a re-delivered batch merges idempotently (the lsn
    * guard makes replay a no-op). With a transactional table format
    * (Delta/Iceberg) this call becomes MERGE INTO; the contract —
    * idempotent keyed upsert with tombstones — is identical, which is
    * the point. At 100 TB the rewrite is partition-scoped (hash-bucket
    * the key space and rewrite only buckets containing updated keys),
    * not a full-table pass. */
  def upsertByKey(spark: SparkSession, updates: DataFrame, tablePath: String,
                  newVersion: Long, keyCol: String = "orderid",
                  ordCol: String = "lsn",
                  tombstoneCol: String = "deleted"): Unit = {
    import org.apache.spark.sql.functions._
    val existing = latestVersion(spark, tablePath, below = newVersion) match {
      case Some(v) => spark.read.parquet(s"$tablePath/v=$v")
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], updates.schema)
    }
    // allowMissingColumns: an additively-evolved batch (new column)
    // merges against the old snapshot with nulls backfilled, instead of
    // failing the pipeline on the first post-migration micro-batch
    existing.unionByName(updates, allowMissingColumns = true)
      .groupBy(col(keyCol))
      .agg(max_by(struct(updates.columns.map(col).toIndexedSeq: _*), col(ordCol)).as("s"))
      .select(col("s.*"))
      // null-safe: a pre-evolution snapshot row whose (newly added)
      // tombstone column reads back null is a LIVE row, not a delete —
      // bare `!col` would three-value-logic it out of the snapshot
      .filter(!coalesce(col(tombstoneCol), lit(false)))
      .write.mode("overwrite").parquet(s"$tablePath/v=$newVersion")
  }

  /** Read the table's newest complete snapshot. */
  def readLatest(spark: SparkSession, tablePath: String): DataFrame = {
    val v = latestVersion(spark, tablePath).getOrElse(
      sys.error(s"no versions at $tablePath"))
    spark.read.parquet(s"$tablePath/v=$v")
  }

  /** Highest committed version — when merging batch `newVersion`, only
    * versions strictly below it count, so a RETRIED batch that left a
    * partial `v=N` behind re-merges from `v=N-1` and overwrites its own
    * debris (exactly-once on at-least-once delivery).
    *
    * Listed through the Hadoop FileSystem API, so the versioned table
    * works on HDFS/S3A/ABFS paths, not just the local filesystem; and a
    * version only counts once its `_SUCCESS` marker exists (written by
    * the committer after all part files), so a concurrent [[readLatest]]
    * can never observe a half-written snapshot as "latest". */
  private def latestVersion(spark: SparkSession, tablePath: String,
                            below: Long = Long.MaxValue): Option[Long] = {
    val path = new org.apache.hadoop.fs.Path(tablePath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else fs.listStatus(path).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v=\\d+"))
      .filter(s => fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .filter(_ < below)
      .maxOption
  }
}
