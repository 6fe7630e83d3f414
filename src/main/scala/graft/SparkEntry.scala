package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full CDC path end-to-end: derived source rows → Debezium
    * JSON envelopes → decode → latest-state materialization → the
    * reference's A1 aggregate (README.md:363-367). */
  def entry(spark: SparkSession): DataFrame = {
    import graft.kql.Kql._
    import org.apache.spark.sql.functions._
    CdcQueries.latestState(spark, "/root/testdata/sf0.001")
      .summarize(Seq("avg_sales" -> avg(col("amount"))), col("city"))
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ §2.G
    * extensions). Keys are stable; each maps (spark, sfDir) → result. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CdcQueries.queries ++
    ReferenceQueries.queries ++
    Analytics.queries ++
    AdvancedAnalytics.queries ++
    SqlQueries.queries ++
    Layout.queries ++
    graft.ext.Dedup.queries ++
    graft.ext.TextAnalysis.queries ++
    graft.ext.Similarity.queries ++
    graft.ext.Sketches.queries ++
    graft.ext.GraphAnalytics.queries ++
    graft.ext.Search.queries ++
    graft.ext.Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CdcQueries.oracleSql ++
    ReferenceQueries.oracleSql ++
    Analytics.oracleSql ++
    AdvancedAnalytics.oracleSql ++
    SqlQueries.oracleSql ++
    Layout.oracleSql ++
    graft.ext.Dedup.oracleSql ++
    graft.ext.TextAnalysis.oracleSql ++
    graft.ext.Similarity.oracleSql ++
    graft.ext.Sketches.oracleSql ++
    graft.ext.GraphAnalytics.oracleSql ++
    graft.ext.Search.oracleSql ++
    graft.ext.Multimodal.oracleSql
}
