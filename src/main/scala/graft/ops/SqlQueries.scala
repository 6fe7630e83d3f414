package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** [extension] SQL-surface coverage: queries whose text is written ONCE
  * in the dialect intersection of Spark SQL and DuckDB and executed
  * verbatim by both engines — the Spark side through `spark.sql` over
  * registered temp views, the oracle side through the driver's DuckDB
  * run. This exercises the engine's SQL entry point (parser → analyzer →
  * Catalyst) rather than the DataFrame builder, and pins the dialect
  * features the reference's KQL analog would desugar to: grouping sets
  * with GROUPING(), IN-subqueries, correlated scalar subqueries, and
  * CTE-with-scalar-subquery plans (all decorrelated/planned by Catalyst
  * — SURVEY.md §4's "rely on Catalyst" verdict, exercised end-to-end).
  */
object SqlQueries {

  private val tableNames =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  /** Register the corpus tables as temp views (idempotent, lazy). */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach(n => Tables.table(spark, sfDir, n).createOrReplaceTempView(n))

  /** The shared-dialect SQL texts (also the oracles, verbatim). */
  val sql: Map[String, String] = Map(
    "sql_grouping_sets" ->
      """SELECT c_mktsegment, c_nationkey,
        |  CAST(GROUPING(c_mktsegment) AS INTEGER) AS g_seg,
        |  CAST(GROUPING(c_nationkey) AS INTEGER) AS g_nat,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        |FROM customer
        |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())""".stripMargin,
    "sql_in_subquery" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |GROUP BY o_orderpriority""".stripMargin,
    "sql_scalar_subquery" ->
      """SELECT c_custkey, c_name,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        |FROM customer WHERE c_custkey <= 200""".stripMargin,
    "sql_exists_agg" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin,
    "sql_not_in" ->
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
        |FROM customer
        |WHERE c_nationkey NOT IN (SELECT s_nationkey FROM supplier WHERE s_nationkey < 5)
        |GROUP BY c_mktsegment""".stripMargin,
    "sql_cte" ->
      """WITH seg_rev AS (
        |  SELECT c_mktsegment AS seg,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_mktsegment)
        |SELECT seg, rev, n_orders FROM seg_rev
        |WHERE rev > (SELECT AVG(rev) FROM seg_rev)""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    sql.map { case (name, text) =>
      name -> ((s: SparkSession, d: String) => { registerViews(s, d); s.sql(text) })
    }

  val oracleSql: Map[String, String] = sql
}
