package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [extension] Analytics breadth over the TPC-H-ish corpus (SURVEY.md §2.G
  * / §7.3-4): joins of every flavor, window functions, set ops, grouping
  * sets, scalar-function coverage, and event-log analytics. All built-in
  * Catalyst operators — zero custom rules needed (SURVEY.md §4).
  *
  * Float-parity discipline (vs the DuckDB oracle): sums over fractional
  * doubles go through an exact DECIMAL(18,2/6) cast, then the final sum is
  * cast back to double — decimal addition is associative, so the result is
  * independent of partitioning/aggregation order on BOTH engines. Sums of
  * whole-number doubles (l_quantity) and int sums/avgs are exact in IEEE
  * double anyway. This is also the right 100 TB design: a 1000-executor
  * partial+final aggregate must not depend on combine order.
  */
object Analytics {

  private def dec2(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  // ---- aggregations -------------------------------------------------------

  /** TPC-H Q1-shaped pricing summary: scan-heavy partial+final hash agg;
    * the filter and the 7-column projection push down to the parquet scan. */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)"))
          .cast("double").as("sum_disc_price"),
        avg(col("l_quantity")).as("avg_qty"),
        (sum(dec2(col("l_extendedprice"))).cast("double") / count(lit(1)))
          .as("avg_price"),
        count(lit(1)).as("count_order"))

  /** ROLLUP over (mktsegment, nationkey): subtotals + grand total. */
  def rollupAcctbal(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .rollup(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("c_acctbal"))).cast("double").as("bal"))

  /** DISTINCT aggregate + HAVING. */
  def distinctHaving(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_cust"))
      .filter(col("n_cust") > 10)

  // ---- joins --------------------------------------------------------------

  /** Star join through two broadcast dims (region←nation←customer): the
    * 100 TB-correct plan is two BroadcastHashJoins with zero shuffle on the
    * fact side; `broadcast()` pins that regardless of stats. */
  def joinBroadcastStar(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val n = broadcast(Tables.nation(spark, sfDir))
    val r = broadcast(Tables.region(spark, sfDir))
    c.join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        sum(dec2(col("c_acctbal"))).cast("double").as("bal"))
  }

  /** Large fact-fact join (lineitem ⋈ orders on orderkey): shuffle-hash /
    * sort-merge territory at scale; both sides hash-partition on the key. */
  def joinLargeRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)"))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Semi join (EXISTS): customers having at least one order. */
  def joinSemi(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
  }

  /** Anti join (NOT EXISTS): customers with no orders. */
  def joinAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** Left outer join keeping empty groups (nations with zero customers). */
  def joinOuterNationCust(spark: SparkSession, sfDir: String): DataFrame = {
    val n = Tables.nation(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    n.join(c, n("n_nationkey") === c("c_nationkey"), "left_outer")
      .groupBy(col("n_name"))
      .agg(count(col("c_custkey")).as("n_cust"))
  }

  // ---- window functions ---------------------------------------------------

  /** Top-3 orders per customer by price (rank with deterministic tiebreak).
    * Scale note: partition-local sort after one hash shuffle on custkey. */
  def winTopOrdersPerCust(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, sfDir)
      .withColumn("rk", rank().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
  }

  /** Running total of spend per customer over time (cumulative frame).
    * Integer-exact via long cents: prices are 2dp, so round(x·100) is an
    * exact long and the window sum stays in primitive long arithmetic —
    * the decimal(18,2) phrasing pushed every frame update through boxed
    * Decimal adds (9× slower at bench scale) for identical results.
    * Both engines compute the same double product, the same rounded
    * cents, the same long running sum, and the same /100.0 division. */
  def winRunningTotal(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"),
        (sum(round(col("o_totalprice") * 100).cast("long")).over(w) / 100.0)
          .as("running_spend"),
        row_number().over(w).as("order_seq"))
  }

  /** lag(): days since the customer's previous order (null for first). */
  def winOrderGaps(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
          .as("days_since_prev"))
  }

  // ---- set operations -----------------------------------------------------

  private def custNations(s: SparkSession, d: String) =
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
  private def suppNations(s: SparkSession, d: String) =
    Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))

  /** UNION (distinct): nations having customers or suppliers. */
  def setUnion(spark: SparkSession, sfDir: String): DataFrame =
    custNations(spark, sfDir).union(suppNations(spark, sfDir)).distinct()

  /** INTERSECT: nations having both. */
  def setIntersect(spark: SparkSession, sfDir: String): DataFrame =
    custNations(spark, sfDir).intersect(suppNations(spark, sfDir))

  /** EXCEPT: nations with customers but no suppliers. */
  def setExcept(spark: SparkSession, sfDir: String): DataFrame =
    custNations(spark, sfDir).except(suppNations(spark, sfDir))

  /** EXCEPT ALL — multiset difference: each nationkey survives
    * (customer-count − supplier-count) times, aggregated to counts so
    * the oracle comparison is order-free. */
  def setExceptAll(spark: SparkSession, sfDir: String): DataFrame =
    custNations(spark, sfDir).exceptAll(suppNations(spark, sfDir))
      .groupBy(col("nationkey")).agg(count(lit(1)).as("n"))

  /** INTERSECT ALL — multiset intersection, aggregated to counts. */
  def setIntersectAll(spark: SparkSession, sfDir: String): DataFrame =
    custNations(spark, sfDir).intersectAll(suppNations(spark, sfDir))
      .groupBy(col("nationkey")).agg(count(lit(1)).as("n"))

  // ---- scalar function coverage ------------------------------------------

  /** String function battery over part. */
  def scalarStrings(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir).select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_u"),
      lower(col("p_type")).as("type_l"),
      length(col("p_name")).as("name_len"),
      substring(col("p_type"), 1, 5).as("type_pfx"),
      concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
      regexp_replace(col("p_name"), " ", "_").as("name_snake"),
      trim(col("p_name")).as("name_trim"))

  /** Date/time function battery over orders. */
  def scalarDates(spark: SparkSession, sfDir: String): DataFrame = {
    val d = col("o_orderdate").cast("date")
    Tables.orders(spark, sfDir).select(
      col("o_orderkey"),
      year(d).as("y"), month(d).as("m"), dayofmonth(d).as("dom"),
      date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
      date_add(d, 30).as("due_date"),
      datediff(lit("1998-01-01").cast("date"), d).as("age_days"))
  }

  /** Math function battery over lineitem (IEEE-exact ops only: sqrt/abs/
    * floor/ceil/round — transcendentals are libm-dependent and excluded). */
  def scalarMath(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_linenumber") === 1)
      .select(
        col("l_orderkey"),
        abs(col("l_quantity") - 25).as("qty_dev"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        round(col("l_discount") * 100).cast("int").as("disc_pct"),
        (col("l_partkey") % 7).as("pk_mod"))

  // ---- event-log analytics -----------------------------------------------

  /** Hourly event counts + value sums per type (time-bucketed agg —
    * the batch shape of a streaming tumbling window). */
  def eventsHourly(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))

  /** Daily active users (distinct-count per day). */
  def eventsDailyActive(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(countDistinct(col("user_id")).as("dau"))

  /** JSON extraction from the props column (T4 analog on real data). */
  def eventsJsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"))

  /** Sessionization: a >30 min silence starts a new session; sessions per
    * user. Timestamps compared in epoch-millis so µs- vs ns-precision
    * engines agree bit-for-bit. */
  def eventsSessions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, sfDir)
      .select(col("user_id"),
        (unix_millis(col("ts")) - lag(unix_millis(col("ts")), 1).over(w))
          .as("gap_ms"))
      .groupBy(col("user_id"))
      .agg((sum(when(col("gap_ms") > 1800000L, 1).otherwise(0)) + 1)
        .cast("bigint").as("n_sessions"))
  }

  /** Conversion funnel: users whose first view < first click < first
    * purchase (min-per-type then ordered comparison, epoch-millis). */
  def eventsFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ms = unix_millis(col("ts"))
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", ms)).as("t_view"),
        min(when(col("event_type") === "click", ms)).as("t_click"),
        min(when(col("event_type") === "purchase", ms)).as("t_purchase"))
      .filter(col("t_view") < col("t_click") && col("t_click") < col("t_purchase"))
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"))
  }

  /** D1 retention: per first-seen-day cohort, how many users return the
    * next day — min-date cohort assignment + one self-join on
    * (user, day+1); both sides pre-aggregated to distinct (user, day)
    * so the join is key-unique at any scale. */
  def retentionD1(spark: SparkSession, sfDir: String): DataFrame = {
    val days = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("date").as("d")).distinct()
    val first = days.groupBy(col("user_id")).agg(min(col("d")).as("d0"))
    val cohorts = first.groupBy(col("d0")).agg(count(lit(1)).as("cohort"))
    val retained = first.join(days,
        first("user_id") === days("user_id") &&
          days("d") === date_add(first("d0"), 1))
      .groupBy(col("d0")).agg(count(lit(1)).as("retained"))
    cohorts.join(retained, Seq("d0"), "left_outer")
      .select(col("d0"), col("cohort"),
        coalesce(col("retained"), lit(0L)).as("retained_d1"))
  }

  /** Event-type transition counts (first-order Markov pairs) per the
    * per-user event order — one lag window, one count aggregate. */
  def eventTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Top 3-step event paths (the product-analytics "common journeys"
    * report): two leads over each user's event order, one count
    * aggregate, TakeOrdered top-20. */
  def eventPaths(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type").as("e1"),
        lead(col("event_type"), 1).over(w).as("e2"),
        lead(col("event_type"), 2).over(w).as("e3"))
      .filter(col("e3").isNotNull)
      .groupBy(col("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1").asc, col("e2").asc, col("e3").asc)
      .limit(20)
  }

  /** Per-segment Gini coefficient of (non-negative) account balances —
    * the inequality metric, computed EXACTLY: integer cents, the
    * single-division form of the sorted-rank formula
    * G = (2Σi·xᵢ − (n+1)Σx) / (nΣx), floored into micro-units by
    * TWO-STAGE long division (×10³ twice) so the numerator never
    * multiplies past BIGINT even at 1000× this corpus — the oracle
    * replays the identical integer ops. The rank window partitions by
    * segment — bounded groups, no global sort; tied balances contribute
    * the same Σi·x whatever their relative rank order, so the id
    * tiebreak is for determinism of the intermediate, not the result. */
  def giniBySegment(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("cents").asc, col("c_custkey").asc)
    Tables.customer(spark, sfDir)
      .filter(col("c_acctbal") >= 0)
      .select(col("c_mktsegment"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"), col("c_custkey"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sx"),
        sum(col("rk") * col("cents")).as("sxi"))
      .withColumn("q", expr("2 * sxi - (n + 1) * sx"))
      .withColumn("d", expr("n * sx"))
      .select(col("c_mktsegment"), col("n"),
        expr("(q * 1000 DIV d) * 1000 + ((q * 1000 % d) * 1000) DIV d")
          .as("gini_micro"))
  }

  /** Bitwise-operator battery (AND/OR/XOR/shifts) over order keys. */
  def bitwiseOps(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir).select(
      col("o_orderkey"),
      (col("o_orderkey").bitwiseAND(lit(255L))).as("and_mask"),
      (col("o_orderkey").bitwiseOR(lit(4096L))).as("or_mask"),
      (col("o_orderkey").bitwiseXOR(col("o_custkey"))).as("xor_cust"),
      shiftright(col("o_orderkey"), 4).as("shr4"),
      bit_count(col("o_orderkey")).cast("int").as("popcount"))

  /** Null-semantics pins: COUNT(*) vs COUNT(expr), aggregates over
    * empty/null-only inputs, and null-safe comparison — the corners
    * where engines historically diverge, fixed by oracle. */
  def nullSemantics(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_all"),
        count(when(col("c_acctbal") > 0, 1)).as("n_pos"),
        sum(when(col("c_acctbal") > 9999998, 1)).as("sum_never"),
        max(when(col("c_acctbal") > 9999998, col("c_acctbal"))).as("max_never"),
        count(when(col("c_nationkey") <=> lit(3), 1)).as("n_nation3"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_retention_d1" -> retentionD1 _,
    "ev_transitions" -> eventTransitions _,
    "ev_paths" -> eventPaths _,
    "agg_gini_by_segment" -> giniBySegment _,
    "fn_bitwise" -> bitwiseOps _,
    "fn_null_semantics" -> nullSemantics _,
    "agg_pricing_summary" -> pricingSummary _,
    "agg_rollup" -> rollupAcctbal _,
    "agg_distinct_having" -> distinctHaving _,
    "join_broadcast_star" -> joinBroadcastStar _,
    "join_large_revenue" -> joinLargeRevenue _,
    "join_semi" -> joinSemi _,
    "join_anti" -> joinAnti _,
    "join_outer_nation" -> joinOuterNationCust _,
    "win_top_orders" -> winTopOrdersPerCust _,
    "win_running_total" -> winRunningTotal _,
    "win_order_gaps" -> winOrderGaps _,
    "set_union" -> setUnion _,
    "set_intersect" -> setIntersect _,
    "set_except" -> setExcept _,
    "set_except_all" -> setExceptAll _,
    "set_intersect_all" -> setIntersectAll _,
    "fn_strings" -> scalarStrings _,
    "fn_dates" -> scalarDates _,
    "fn_math" -> scalarMath _,
    "ev_hourly" -> eventsHourly _,
    "ev_daily_active" -> eventsDailyActive _,
    "ev_json_extract" -> eventsJsonExtract _,
    "ev_sessions" -> eventsSessions _,
    "ev_funnel" -> eventsFunnel _,
  )

  val oracleSql: Map[String, String] = Map(
    "ev_paths" ->
      """SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT event_type AS e1,
        |    LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS e2,
        |    LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS e3
        |  FROM events)
        |WHERE e3 IS NOT NULL
        |GROUP BY e1, e2, e3
        |ORDER BY n DESC, e1 ASC, e2 ASC, e3 ASC LIMIT 20""".stripMargin,
    "agg_gini_by_segment" ->
      """WITH c AS (
        |  SELECT c_mktsegment, CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
        |    c_custkey
        |  FROM customer WHERE c_acctbal >= 0),
        |r AS (
        |  SELECT c_mktsegment, cents,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |      ORDER BY cents ASC, c_custkey ASC) AS BIGINT) AS rk
        |  FROM c),
        |a AS (
        |  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(cents) AS BIGINT) AS sx, CAST(SUM(rk * cents) AS BIGINT) AS sxi
        |  FROM r GROUP BY 1),
        |b AS (
        |  SELECT c_mktsegment, n,
        |    2 * sxi - (n + 1) * sx AS q, n * sx AS d
        |  FROM a)
        |SELECT c_mktsegment, n,
        |  CAST((q * 1000 // d) * 1000 + ((q * 1000 % d) * 1000) // d AS BIGINT) AS gini_micro
        |FROM b""".stripMargin,
    "ev_transitions" ->
      """SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT event_type,
        |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_type
        |  FROM events)
        |WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, event_type""".stripMargin,
    "fn_bitwise" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS and_mask,
        |  o_orderkey | 4096 AS or_mask,
        |  xor(o_orderkey, o_custkey) AS xor_cust,
        |  o_orderkey >> 4 AS shr4,
        |  CAST(bit_count(o_orderkey) AS INTEGER) AS popcount
        |FROM orders""".stripMargin,
    "fn_null_semantics" ->
      """SELECT c_mktsegment,
        |  CAST(COUNT(*) AS BIGINT) AS n_all,
        |  CAST(COUNT(CASE WHEN c_acctbal > 0 THEN 1 END) AS BIGINT) AS n_pos,
        |  CAST(SUM(CASE WHEN c_acctbal > 9999998 THEN 1 END) AS BIGINT) AS sum_never,
        |  MAX(CASE WHEN c_acctbal > 9999998 THEN c_acctbal END) AS max_never,
        |  CAST(COUNT(CASE WHEN c_nationkey IS NOT DISTINCT FROM 3 THEN 1 END) AS BIGINT) AS n_nation3
        |FROM customer GROUP BY c_mktsegment""".stripMargin,
    "ev_retention_d1" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, MIN(d) AS d0 FROM days GROUP BY user_id),
        |coh AS (SELECT d0, CAST(COUNT(*) AS BIGINT) AS cohort FROM f GROUP BY d0),
        |ret AS (
        |  SELECT f.d0, CAST(COUNT(*) AS BIGINT) AS retained
        |  FROM f JOIN days ON days.user_id = f.user_id AND days.d = f.d0 + 1
        |  GROUP BY f.d0)
        |SELECT coh.d0, coh.cohort,
        |  CAST(COALESCE(ret.retained, 0) AS BIGINT) AS retained_d1
        |FROM coh LEFT JOIN ret ON coh.d0 = ret.d0""".stripMargin,
    "agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  AVG(l_quantity) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "agg_rollup" ->
      """SELECT c_mktsegment, c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        |FROM customer GROUP BY ROLLUP(c_mktsegment, c_nationkey)""".stripMargin,
    "agg_distinct_having" ->
      """SELECT c_mktsegment, CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
        |  CAST(COUNT(*) AS BIGINT) AS n_cust
        |FROM customer GROUP BY c_mktsegment HAVING COUNT(*) > 10""".stripMargin,
    "join_broadcast_star" ->
      """SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "join_large_revenue" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "join_semi" ->
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "join_outer_nation" ->
      """SELECT n_name, CAST(COUNT(c_custkey) AS BIGINT) AS n_cust
        |FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY n_name""".stripMargin,
    "win_top_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders) WHERE rk <= 3""".stripMargin,
    "win_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS DOUBLE) / 100.0 AS running_spend,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS INTEGER) AS order_seq
        |FROM orders""".stripMargin,
    "win_order_gaps" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(date_diff('day',
        |    LAG(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
        |    CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_prev
        |FROM orders""".stripMargin,
    "set_union" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION SELECT s_nationkey FROM supplier""".stripMargin,
    "set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier""".stripMargin,
    "set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier""".stripMargin,
    "set_except_all" ->
      """SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  EXCEPT ALL SELECT s_nationkey FROM supplier)
        |GROUP BY nationkey""".stripMargin,
    "set_intersect_all" ->
      """SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  INTERSECT ALL SELECT s_nationkey FROM supplier)
        |GROUP BY nationkey""".stripMargin,
    "fn_strings" ->
      """SELECT p_partkey, UPPER(p_brand) AS brand_u, LOWER(p_type) AS type_l,
        |  CAST(LENGTH(p_name) AS INTEGER) AS name_len,
        |  SUBSTR(p_type, 1, 5) AS type_pfx,
        |  CONCAT(p_brand, '/', p_type) AS brand_type,
        |  REPLACE(p_name, ' ', '_') AS name_snake,
        |  TRIM(p_name) AS name_trim
        |FROM part""".stripMargin,
    "fn_dates" ->
      """SELECT o_orderkey,
        |  CAST(YEAR(o_orderdate) AS INTEGER) AS y,
        |  CAST(MONTH(o_orderdate) AS INTEGER) AS m,
        |  CAST(DAY(o_orderdate) AS INTEGER) AS dom,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER) AS age_days
        |FROM orders""".stripMargin,
    "fn_math" ->
      """SELECT l_orderkey, ABS(l_quantity - 25) AS qty_dev, SQRT(l_quantity) AS qty_sqrt,
        |  CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
        |  CAST(ROUND(l_discount * 100) AS INTEGER) AS disc_pct,
        |  CAST(l_partkey % 7 AS BIGINT) AS pk_mod
        |FROM lineitem WHERE l_linenumber = 1""".stripMargin,
    "ev_hourly" ->
      """SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "ev_daily_active" ->
      """SELECT CAST(ts AS DATE) AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
        |FROM events GROUP BY 1""".stripMargin,
    "ev_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "ev_sessions" ->
      """SELECT user_id, CAST(SUM(CASE WHEN gap_ms > 1800000 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_sessions
        |FROM (
        |  SELECT user_id, epoch_ms(ts) - LAG(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap_ms
        |  FROM events)
        |GROUP BY user_id""".stripMargin,
    "ev_funnel" ->
      """SELECT user_id, t_view, t_click, t_purchase FROM (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) AS t_view,
        |    MIN(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END) AS t_click,
        |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS t_purchase
        |  FROM events GROUP BY user_id)
        |WHERE t_view < t_click AND t_click < t_purchase""".stripMargin,
  )
}
