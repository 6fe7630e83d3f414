package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [extension] Second analytics tier (SURVEY.md §2.G): multidimensional
  * aggregation (CUBE/PIVOT), exact order statistics, moment statistics
  * from integer power sums, array/conditional scalar batteries, framed
  * and ranked windows, range joins, as-of joins, and sketch aggregates.
  *
  * Float parity follows the Analytics discipline: every cross-engine
  * comparison is either pure integer arithmetic, an exact DECIMAL sum
  * cast to double at the end, or a fixed scalar expression over such
  * values (identical IEEE evaluation on both engines regardless of
  * partitioning).
  */
object AdvancedAnalytics {

  private def dec2(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  // ---- multidimensional aggregation --------------------------------------

  /** CUBE over (mktsegment, nationkey): all 4 grouping combinations. */
  def cubeAcctbal(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .cube(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("c_acctbal"))).cast("double").as("bal"))

  /** PIVOT: order counts per year × priority, explicit pivot values so
    * the plan is a single pass (no distinct-values pre-query); missing
    * cells coalesced to 0 to match the oracle's CASE-sum phrasing. */
  def pivotPriorities(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(year(col("o_orderdate").cast("date")).as("y"),
        col("o_orderpriority").as("pri"))
      .groupBy(col("y"))
      .pivot("pri", Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(count(lit(1)))
      .select(col("y"),
        coalesce(col("`1-URGENT`"), lit(0L)).as("p_urgent"),
        coalesce(col("`2-HIGH`"), lit(0L)).as("p_high"),
        coalesce(col("`3-MEDIUM`"), lit(0L)).as("p_medium"),
        coalesce(col("`4-NOT SPECIFIED`"), lit(0L)).as("p_notspec"),
        coalesce(col("`5-LOW`"), lit(0L)).as("p_low"))

  // ---- order statistics ---------------------------------------------------

  /** Exact percentiles (linear interpolation at p·(n−1), the same
    * definition DuckDB's quantile_cont uses). l_quantity is whole-number
    * doubles, so the interpolation arithmetic is IEEE-exact. */
  def percentiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_quantity"), lit(0.25)).as("q1"),
        percentile(col("l_quantity"), lit(0.5)).as("med"),
        percentile(col("l_quantity"), lit(0.75)).as("q3"),
        min(col("l_quantity")).as("qmin"),
        max(col("l_quantity")).as("qmax"))

  /** Variance / stddev / correlation via integer power sums: quantity is
    * whole, discount is exact cents (round(×100)), so Σx, Σx², Σxy are
    * BIGINT-exact and partial-aggregable — the single-pass moment-sketch
    * shape that scales to any cluster size. The final moments are one
    * fixed double expression over those sums (no accumulation-order
    * dependence, unlike built-in stddev/corr whose running-mean updates
    * depend on partitioning). */
  def momentStats(spark: SparkSession, sfDir: String): DataFrame = {
    val qi = col("l_quantity").cast("bigint")
    val pc = round(col("l_discount") * 100).cast("bigint")
    val n = col("n").cast("double")
    val vq = (col("n") * col("sx2") - col("sx") * col("sx")).cast("double")
    val vd = (col("n") * col("sy2") - col("sy") * col("sy")).cast("double")
    val cov = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(qi).as("sx"), sum(qi * qi).as("sx2"),
        sum(pc).as("sy"), sum(pc * pc).as("sy2"), sum(qi * pc).as("sxy"))
      .select(col("l_returnflag"), col("n"),
        (vq / (n * n)).as("var_qty"),
        sqrt(vq / (n * n)).as("std_qty"),
        (cov / (sqrt(vq) * sqrt(vd))).as("corr_qty_disc"))
  }

  /** Multiple DISTINCT aggregates in one pass — planned via Catalyst's
    * Expand (one row replica per distinct-group), the shape that keeps
    * N distincts to a single shuffle instead of N self-joins. */
  def multiDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("d_parts"),
        countDistinct(col("l_suppkey")).as("d_supps"),
        countDistinct(col("l_quantity").cast("bigint")).as("d_qtys"),
        count(lit(1)).as("n"))

  /** RANGE-frame window (vs the ROWS frames elsewhere): orders placed
    * within the previous 30 days per customer — the frame is bounded by
    * VALUE distance on the ordering column, so ties and gaps behave
    * correctly where a row-count frame would not. */
  def rangeFrameWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("od"))
      .rangeBetween(-30, Window.currentRow)
    Tables.orders(spark, sfDir)
      .withColumn("od", datediff(col("o_orderdate").cast("date"), lit("1990-01-01").cast("date")).cast("long"))
      .select(col("o_custkey"), col("o_orderkey"),
        count(lit(1)).over(w).as("n_last30d"))
  }

  /** Deterministic per-group mode: most frequent nationkey per segment,
    * ties broken by lowest key (built-in mode() is tie-nondeterministic,
    * so the count+rank phrasing is the portable form). */
  def modePerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.customer(spark, sfDir)
      .groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("cnt").desc, col("c_nationkey").asc)
    counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("c_mktsegment"), col("c_nationkey").as("mode_nation"), col("cnt"))
  }

  /** Weighted average from integer-exact sums: mean discount weighted by
    * quantity, as Σ(pc·qi)/Σ(qi) over BIGINT — the relational mirror of
    * the typed WeightedMeanCents aggregator. */
  def weightedAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val qi = col("l_quantity").cast("bigint")
    val pc = round(col("l_discount") * 100).cast("bigint")
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(sum(pc * qi).as("swx"), sum(qi).as("sw"))
      .select(col("l_returnflag"),
        (col("swx").cast("double") / col("sw")).as("wavg_disc_pct"))
  }

  // ---- scalar batteries ---------------------------------------------------

  /** Array-function battery over the tokenized documents. */
  def arrayFunctions(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"),
        size(col("ws")).as("n_words"),
        element_at(col("ws"), 1).as("first_word"),
        element_at(col("ws"), -1).as("last_word"),
        array_join(slice(col("ws"), 1, 5), " ").as("head5"),
        array_contains(col("ws"), "the").as("has_the"),
        size(array_distinct(col("ws"))).as("n_uniq"))

  /** Conditional-expression battery (CASE/NULLIF/COALESCE/LEAST/GREATEST). */
  def conditionals(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir).select(
      col("o_orderkey"),
      when(col("o_totalprice") < 50000, "small")
        .when(col("o_totalprice") < 150000, "medium")
        .otherwise("large").as("size_bucket"),
      coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_alt"),
      least(col("o_totalprice"), lit(100000.0)).as("capped_price"),
      greatest(year(col("o_orderdate").cast("date")), lit(1996)).as("y_floor"),
      substring(col("o_orderpriority"), 1, 1).cast("int").as("pri_rank"))

  /** Regex battery: extraction groups, LIKE patterns, match counting. */
  def regexBattery(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir).select(
      col("p_partkey"),
      regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("int").as("brand_num"),
      regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"),
      col("p_brand").like("Brand#1%").as("is_brand1x"),
      col("p_name").rlike("^[aeiou]").as("vowel_start"))

  /** Ordered group concatenation: distinct segments per nation as one
    * sorted string (collect_set → array_sort → join keeps the result
    * deterministic under any partitioning, unlike raw string_agg). */
  def groupConcat(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .groupBy(col("c_nationkey"))
      .agg(array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segments"),
        count(lit(1)).as("n"))

  /** Daily-volume anomaly flags from exact integer moments: a day is
    * anomalous when (cnt − mean)² > 4·var — the squared form avoids
    * sqrt entirely, so the whole predicate is a fixed arithmetic
    * expression over BIGINT power sums (bit-identical on both engines,
    * unlike stddev-based z-scores). */
  def dailyAnomalies(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val stats = daily.agg(count(lit(1)).as("nd"), sum(col("cnt")).as("s1"),
      sum(col("cnt") * col("cnt")).as("s2"))
    // (cnt - s1/nd)^2 > 4*(s2/nd - (s1/nd)^2)  <=>  (nd*cnt - s1)^2 > 4*(nd*s2 - s1^2)
    daily.crossJoin(broadcast(stats))
      .select(col("day"), col("cnt"),
        ((col("nd") * col("cnt") - col("s1")) * (col("nd") * col("cnt") - col("s1")) >
          lit(4) * (col("nd") * col("s2") - col("s1") * col("s1"))).as("is_anomaly"))
  }

  // ---- framed / ranked windows -------------------------------------------

  /** Moving average over a 3-row frame (decimal sum / frame count — exact
    * on both engines; built-in avg() over doubles is order-dependent). */
  def movingAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(-2, Window.currentRow)
    Tables.orders(spark, sfDir).select(
      col("o_custkey"), col("o_orderkey"),
      (sum(dec2(col("o_totalprice"))).over(w).cast("double") /
        count(lit(1)).over(w)).as("mavg3"))
  }

  /** Distribution ranks: ntile/percent_rank/cume_dist per priority. */
  def distributionRanks(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, sfDir).select(
      col("o_orderkey"), col("o_orderpriority"),
      ntile(10).over(w).cast("int").as("decile"),
      percent_rank().over(w).as("pct_rank"),
      cume_dist().over(w).as("cume"))
  }

  /** Fixed-width histogram via integer bucket arithmetic (portable —
    * no engine-specific width_bucket): 20 × 25k buckets over totalprice. */
  def histogram(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(least(floor(col("o_totalprice") / 25000), lit(19L)).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))

  /** Edit-distance between consecutive part names (string-similarity
    * coverage; the adjacent-pair join keeps it linear, the shape any
    * blocked pairwise comparison takes). */
  def levenshteinAdjacent(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
    val a = p.select(col("p_partkey").as("k"), col("p_name").as("name_a"))
    val b = p.select((col("p_partkey") - 1).as("k"), col("p_name").as("name_b"))
    a.join(b, "k")
      .select(col("k"), levenshtein(col("name_a"), col("name_b")).cast("int").as("lev"))
  }

  /** Deterministic hash sampling: md5-derived 10% of orders — the
    * reproducible-sample primitive for pipeline debugging/eval splits
    * (same rows on every engine and every run, unlike TABLESAMPLE). */
  def hashSample(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .filter(expr(
        "cast(conv(substr(md5(cast(o_orderkey as string)),1,8),16,10) as bigint) % 10") === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** first/last/nth value windows with an explicit full-partition frame. */
  def firstLastWindows(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, sfDir).select(
      col("o_custkey"), col("o_orderkey"),
      first(col("o_orderkey")).over(w).as("first_ord"),
      last(col("o_orderkey")).over(w).as("last_ord"),
      nth_value(col("o_orderkey"), 2).over(w).as("second_ord"))
  }

  /** FULL OUTER join: per-nation customer counts vs supplier counts,
    * keeping nations present on only one side. */
  def fullOuterCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val cn = Tables.customer(spark, sfDir)
      .groupBy(col("c_nationkey").as("ck")).agg(count(lit(1)).as("n_cust"))
    val sn = Tables.supplier(spark, sfDir)
      .groupBy(col("s_nationkey").as("sk")).agg(count(lit(1)).as("n_supp"))
    cn.join(sn, col("ck") === col("sk"), "full_outer")
      .select(coalesce(col("ck"), col("sk")).as("nationkey"),
        col("n_cust"), col("n_supp"))
  }

  /** TPC-H Q3 shape: 3-table join, selective filters both sides, top-10
    * revenue via TakeOrdered — the classic shipping-priority plan
    * (broadcast the filtered customer side at this cardinality; at SF
    * where customers outgrow the broadcast threshold the same code
    * becomes a shuffle join, which is the right plan there too). */
  /** Market-basket co-occurrence mining: brand pairs appearing in the
    * same order at least 10 times — the deterministic frequent-itemset
    * (k=2) pass underlying ADX's `basket` plugin and every
    * recommender's co-view table.
    *
    * Scale shape: the brand dim broadcasts onto the lineitem scan; the
    * (order, brand) frame dedupes with one shuffle on orderkey, and
    * the pair self-join is CO-PARTITIONED on that same orderkey (no
    * second shuffle of either side at the join — AQE sees matching
    * output partitioning), with per-order fan-out bounded by
    * brands-per-order (≤ 25), never |orders|². */
  def basketPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_partkey"))
    val brands = Tables.part(spark, sfDir).select(col("p_partkey"), col("p_brand"))
    val ob = li.join(broadcast(brands), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
    ob.as("a").join(ob.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.p_brand") < col("b.p_brand"))
      .groupBy(col("a.p_brand").as("brand1"), col("b.p_brand").as("brand2"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 10)
  }

  def tpchQ3(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > lit("1996-01-01").cast("timestamp"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)"))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q6 (forecasting revenue change): the pure scan-side query —
    * every predicate and the product push into ONE parquet scan +
    * partial/final aggregate; zero joins, zero window. The plan is the
    * codegen floor every engine is measured against. */
  def tpchQ6(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum((col("l_extendedprice") * col("l_discount")).cast("decimal(18,4)"))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))

  /** TPC-H Q17 (small-quantity-order revenue), adapted to the corpus
    * columns (brand filter only — no p_container here): revenue from
    * line items whose quantity is below 20 % of their part's average.
    * The classic correlated per-part average is ONE window over the
    * brand-filtered fact subset (a single shuffle keyed by part — no
    * self-join, no re-scan; the per-part stats ride the same
    * partitioning the filter consumes). Exactness: the 0.2·avg
    * comparison cross-multiplies to pure integers
    * (5·qty·cnt < Σqty — quantities are integer-valued), and revenue
    * sums exact DECIMAL(18,2) cents. */
  def tpchQ17(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    val p = broadcast(Tables.part(spark, sfDir).filter(col("p_brand") === "Brand#13")
      .select(col("p_partkey")))
    val l = Tables.lineitem(spark, sfDir)
    l.join(p, l("l_partkey") === p("p_partkey"))
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"))
      .withColumn("sumq", sum(col("qty")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(lit(5) * col("qty") * col("cnt") < col("sumq"))
      .agg(expr("CAST(SUM(price) * 100 AS BIGINT)").as("revenue_cents"),
        count(lit(1)).as("n_small"))
  }

  /** TPC-H Q19 (discounted revenue), adapted (brand/size/quantity
    * windows — no p_container/l_shipmode here): the OR-of-ANDs
    * predicate query. Plan value: ONE broadcast part join and ONE
    * scan, with the disjunction evaluated as a codegen filter —
    * the part-side brand/size conjuncts prune the broadcast build
    * side. Revenue is the exact DECIMAL(18,4) micro-unit sum. */
  def tpchQ19(spark: SparkSession, sfDir: String): DataFrame = {
    val p = broadcast(Tables.part(spark, sfDir)
      .filter(col("p_brand").isin("Brand#3", "Brand#13", "Brand#23"))
      .select(col("p_partkey"), col("p_brand"), col("p_size")))
    val l = Tables.lineitem(spark, sfDir)
    val q = col("l_quantity")
    val pred =
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) && q.between(1, 11)) ||
      (col("p_brand") === "Brand#13" && col("p_size").between(10, 30) && q.between(10, 20)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(20, 50) && q.between(20, 30))
    l.join(p, l("l_partkey") === p("p_partkey"))
      .filter(pred)
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).as("rev"),
        count(lit(1)).as("n_rows"))
      .select(expr("CAST(rev * 10000 AS BIGINT)").as("revenue_e4"), col("n_rows"))
  }

  /** TPC-H Q22 (global sales opportunity), adapted: customers in a
    * country-code set whose balance beats the positive-balance
    * average, with NO large order (corpus has no order-less customers,
    * so the anti join keys on a filtered order set instead — same
    * shape). The scalar average broadcasts as a one-row frame and the
    * comparison cross-multiplies to integer cents (cents·n > Σcents) —
    * no float division anywhere. */
  def tpchQ22(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), (col("c_nationkey") % 5).as("cntrycode"),
        expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)").as("cents"))
      .filter(col("cntrycode").isin(0, 1, 2))
    val avgPos = c.filter(col("cents") > 0)
      .agg(sum(col("cents")).as("sum_cents"), count(lit(1)).as("n_pos"))
    val big = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 450000.0)
      .select(col("o_custkey")).distinct()
    c.join(broadcast(avgPos), lit(true))
      .filter(col("cents") * col("n_pos") > col("sum_cents"))
      .join(big, c("c_custkey") === big("o_custkey"), "left_anti")
      .groupBy(col("cntrycode"))
      .agg(count(lit(1)).as("numcust"), sum(col("cents")).as("totacctbal_cents"))
  }

  /** TPC-H Q14 (promotion effect): promo-type revenue share — one
    * broadcast dim join, conditional vs total aggregate in a single
    * pass, ONE final division (micro-units via the same two-stage
    * integer flooring as the Gini: cents products are exact
    * DECIMAL(18,4) sums, scaled integer before the divide). */
  def tpchQ14(spark: SparkSession, sfDir: String): DataFrame = {
    val p = broadcast(Tables.part(spark, sfDir))
    val l = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
    l.join(p, l("l_partkey") === p("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO",
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)"))
          .otherwise(lit(0).cast("decimal(18,4)"))).as("promo"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).as("total"))
      .select(
        expr("CAST(promo * 10000 AS BIGINT)").as("promo_e4"),
        expr("CAST(total * 10000 AS BIGINT)").as("total_e4"))
      .select(col("promo_e4"), col("total_e4"),
        expr("(promo_e4 * 1000 DIV total_e4) * 1000 + " +
          "((promo_e4 * 1000 % total_e4) * 1000) DIV total_e4").as("promo_micro"))
  }

  /** TPC-H Q18 (large-volume customers): HAVING over a fact aggregate
    * feeding a semi-join back onto the facts — the classic
    * aggregate-then-join shape; the qualifying-order set is tiny and
    * broadcasts. */
  def tpchQ18(spark: SparkSession, sfDir: String, threshold: Int = 212): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
    val big = l.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > threshold)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    o.join(big, o("o_orderkey") === big("l_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .select(col("c_name"), col("o_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty").cast("long").as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
  }

  /** TPC-H Q7 (volume shipping): bidirectional nation-pair trade volume
    * by ship year — two broadcast nation joins under DISTINCT aliases
    * (supplier's vs customer's), the disjunctive pair filter, exact
    * DECIMAL revenue. Nations adapted to the synthetic corpus's
    * NATION_1/NATION_2. */
  def tpchQ7(spark: SparkSession, sfDir: String): DataFrame = {
    val n1 = broadcast(Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val n2 = broadcast(Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
    val s = broadcast(Tables.supplier(spark, sfDir))
    val l = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, l("l_suppkey") === s("s_suppkey"))
      .join(n1, s("s_nationkey") === n1("s_nk"))
      .join(n2, c("c_nationkey") === n2("c_nk"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate").cast("date")).as("l_year"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)"))
        .cast("double").as("revenue"))
  }

  /** TPC-H Q8 (national market share): NATION_1's share of ECONOMY-part
    * volume sold into ASIA-region customers, per order year — the
    * 8-relation join with two nation roles; share as exact integer
    * micro-units (DECIMAL volumes scaled ×10⁴, the Q14/Gini two-stage
    * flooring). */
  def tpchQ8(spark: SparkSession, sfDir: String): DataFrame = {
    val p = broadcast(Tables.part(spark, sfDir).filter(col("p_type") === "ECONOMY"))
    val s = broadcast(Tables.supplier(spark, sfDir))
    val n1 = broadcast(Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk")))
    val n2 = broadcast(Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val r = broadcast(Tables.region(spark, sfDir).filter(col("r_name") === "ASIA"))
    val l = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    l.join(p, l("l_partkey") === p("p_partkey"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n1, c("c_nationkey") === n1("c_nk"))
      .join(r, n1("c_rk") === r("r_regionkey"))
      .join(s, l("l_suppkey") === s("s_suppkey"))
      .join(n2, s("s_nationkey") === n2("s_nk"))
      .groupBy(year(col("o_orderdate").cast("date")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_1",
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)"))
          .otherwise(lit(0).cast("decimal(18,4)"))).as("nat"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).as("tot"))
      .select(col("o_year"),
        expr("CAST(nat * 10000 AS BIGINT)").as("nat_e4"),
        expr("CAST(tot * 10000 AS BIGINT)").as("tot_e4"))
      .withColumn("mkt_share_micro",
        expr("(nat_e4 * 1000 DIV tot_e4) * 1000 + ((nat_e4 * 1000 % tot_e4) * 1000) DIV tot_e4"))
  }

  /** TPC-H Q13 (customer order-count distribution): LEFT outer join so
    * zero-order customers survive into the c_count=0 bucket, then the
    * histogram of histograms — two keyed aggregates, no window. */
  def tpchQ13(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count")) // count(col) skips nulls
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q15 (top supplier): quarterly revenue per supplier, then the
    * suppliers AT the maximum (the view + scalar-subquery shape) — the
    * max is one exact DECIMAL scalar broadcast back over the bounded
    * revenue relation. */
  def tpchQ15(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)"))
        .as("total_revenue"))
    val top = rev.agg(max(col("total_revenue")).as("mx"))
    rev.join(broadcast(top), rev("total_revenue") === top("mx"))
      .join(broadcast(Tables.supplier(spark, sfDir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_revenue").cast("double").as("total_revenue"))
  }

  /** TPC-H Q5 shape: 6-table join (region→nation→customer→orders→
    * lineitem→supplier) with the customer-and-supplier-same-nation
    * constraint — the join-ordering stress test; the three dims
    * broadcast, the two facts shuffle on their join keys once each. */
  def tpchQ5(spark: SparkSession, sfDir: String): DataFrame = {
    val r = broadcast(Tables.region(spark, sfDir).filter(col("r_name") === "ASIA"))
    val n = broadcast(Tables.nation(spark, sfDir))
    val s = broadcast(Tables.supplier(spark, sfDir))
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, l("l_suppkey") === s("s_suppkey") &&
        c("c_nationkey") === s("s_nationkey"))
      .join(n, s("s_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)"))
        .cast("double").as("revenue"))
  }

  /** TPC-H Q10 shape (returned-item customer ranking, adapted to this
    * corpus' columns/date range): customers ranked by revenue from
    * returned lineitems in one quarter — a 4-table join where the two
    * dims (customer, nation) broadcast, the facts shuffle once on the
    * orderkey, and the final ranking is a TakeOrdered over the
    * customer-sized aggregate. Revenue sums in DECIMAL(18,4) (exact
    * 4-dp products) and ties break on custkey. */
  def tpchQ10(spark: SparkSession, sfDir: String): DataFrame = {
    val c = broadcast(Tables.customer(spark, sfDir))
    val n = broadcast(Tables.nation(spark, sfDir))
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val l = Tables.lineitem(spark, sfDir).filter(col("l_returnflag") === "R")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)"))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  // ---- range join / as-of join -------------------------------------------

  private[ops] val quarters: Seq[(String, String, String)] =
    for { y <- 1995 to 2001; q <- 1 to 4 } yield (
      s"${y}Q$q",
      f"$y-${3 * q - 2}%02d-01",
      if (q == 4) s"${y + 1}-01-01" else f"$y-${3 * q + 1}%02d-01")

  /** Range join: lineitems binned into a broadcast calendar-quarter dim
    * via start ≤ shipdate < end. At scale this is the canonical
    * broadcast-range-join (small interval dim, huge fact side — the fact
    * side never shuffles; the aggregate is partial+final). */
  def rangeJoinQuarters(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dim = broadcast(quarters.toDF("qlabel", "qstart", "qend")
      .select(col("qlabel"), col("qstart").cast("date").as("qs"),
        col("qend").cast("date").as("qe")))
    val l = Tables.lineitem(spark, sfDir)
      .select(col("l_shipdate").cast("date").as("sd"), col("l_quantity"))
    l.join(dim, col("sd") >= col("qs") && col("sd") < col("qe"))
      .groupBy(col("qlabel"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
  }

  /** As-of join (backward): for each purchase event, the user's most
    * recent strictly-earlier view. Implemented the scalable Spark way —
    * union the two event classes, one window pass carrying the last view
    * timestamp forward — instead of a per-pair join: one shuffle on
    * user_id, per-partition sort, zero candidate blowup regardless of
    * events-per-user. Purchases sort before views at equal timestamps so
    * the "strictly earlier" contract holds. */
  def asofViewBeforePurchase(spark: SparkSession, sfDir: String): DataFrame = {
    val isView = when(col("event_type") === "view", 1).otherwise(0)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, isView.asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, sfDir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prior_view_us",
        last(when(col("event_type") === "view", col("us")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        col("us").as("purchase_us"), col("prior_view_us"))
  }

  /** Top-k per group via the native bounded-heap aggregate
    * ([[graft.functions.TopKBy]]): identical answer to the row_number
    * window phrasing, radically different physical plan — a
    * partial+final HashAggregate whose shuffle carries at most k pairs
    * per key per map task instead of every row, and no sort anywhere.
    * The window variant (win_top_orders) is kept side by side; this is
    * the plan you actually want at 100 TB. */
  def topkNative(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(expr("graft_topk(o_totalprice, o_orderkey, 3)").as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("o_custkey"), col("t.id").as("o_orderkey"),
        col("t.ord").as("o_totalprice"), (col("i") + 1).cast("int").as("rk"))
  }

  /** Skew-safe aggregation by salting: stage 1 groups on
    * (key, salt=user_id%16) so a hot key's rows spread over 16 reducers;
    * stage 2 re-aggregates the 16 partials per key. Decimal partial sums
    * make the two-stage total bit-identical to the one-stage oracle.
    * events has exactly 5 hot event_type keys — the worst case for a
    * direct groupBy at cluster scale (5 reducers busy, rest idle). AQE
    * can split skewed partitions reactively; salting is the declarative
    * form that also handles single-key hotness inside one partition. */
  def saltedSkewAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"), (col("user_id") % 16).as("salt"))
      .agg(count(lit(1)).as("pn"),
        sum(col("value").cast("decimal(18,6)")).as("pv"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"), sum(col("pv")).cast("double").as("total_value"))

  // ---- sketches ----------------------------------------------------------

  /** HLL distinct + approximate percentile per event type — the bounded-
    * memory aggregates that replace exact distinct/percentile at 100 TB —
    * registered as an ERROR-BOUND AUDIT (r15 verdict #4: the raw
    * estimates had no DuckDB mirror, so the entry was a weak rows-only
    * check). The query emits, per group, the exact sides (n, exact
    * distinct) plus two booleans-as-longs asserting the sketches hit
    * their published bounds: `users_ok` = |HLL++ estimate − exact| ≤
    * 15% of exact (3× the default 5% rsd), and `p50_ok` = the exact
    * rank fraction of the returned approximate median lies in
    * [0.48, 0.52] (accuracy 1000 ⇒ rank error ≤ 0.1%; the slack covers
    * discreteness). The oracle computes the exact sides in DuckDB and
    * asserts both flags TRUE — a broken sketch now hash-mismatches.
    * Estimates are deterministic, so the audit is stable. The rank
    * audit joins the 5-row group stats back to events (broadcast) —
    * one extra scan, the exact shape of a production accuracy audit. */
  /** The raw per-group sketch estimates next to their exact sides —
    * the audit's input, exposed so SketchBoundsSpec can assert the
    * tighter documented envelopes directly on the estimates. */
  def sketchEstimates(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        count_distinct(col("user_id")).as("exact_users"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("p50_value"),
        count(lit(1)).as("n"))

  def sketches(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val g = sketchEstimates(spark, sfDir)
    val rank = ev.join(broadcast(g.select(col("event_type"), col("p50_value"))),
        "event_type")
      .groupBy(col("event_type"))
      .agg((sum(when(col("value") <= col("p50_value"), 1L).otherwise(0L)) /
        count(lit(1))).as("p50_frac"))
    g.join(broadcast(rank), "event_type")
      .select(
        col("event_type"), col("n"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          col("exact_users").cast("double") * 0.15).cast("long").as("users_ok"),
        (col("p50_frac") >= 0.48 && col("p50_frac") <= 0.52)
          .cast("long").as("p50_ok"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_cube" -> cubeAcctbal _,
    "agg_pivot" -> pivotPriorities _,
    "agg_percentiles" -> percentiles _,
    "agg_moment_stats" -> momentStats _,
    "fn_arrays" -> arrayFunctions _,
    "fn_conditional" -> conditionals _,
    "win_moving_avg" -> movingAvg _,
    "win_dist_ranks" -> distributionRanks _,
    "join_range_quarters" -> rangeJoinQuarters _,
    "join_asof_events" -> asofViewBeforePurchase _,
    "win_topk_native" -> topkNative _,
    "skew_salted_agg" -> saltedSkewAgg _,
    "sketch_approx" -> sketches _,
    "agg_histogram" -> histogram _,
    "agg_multi_distinct" -> multiDistinct _,
    "win_range_frame" -> rangeFrameWindow _,
    "fn_regex" -> regexBattery _,
    "join_basket_pairs" -> basketPairs _,
    "join_tpch_q3" -> tpchQ3 _,
    "join_tpch_q5" -> tpchQ5 _,
    "join_tpch_q10" -> tpchQ10 _,
    "agg_tpch_q6" -> tpchQ6 _,
    "join_tpch_q7" -> tpchQ7 _,
    "join_tpch_q8" -> tpchQ8 _,
    "join_tpch_q13" -> tpchQ13 _,
    "join_tpch_q15" -> tpchQ15 _,
    "join_tpch_q14" -> tpchQ14 _,
    "join_tpch_q18" -> ((sp: SparkSession, d: String) => tpchQ18(sp, d)),
    "join_tpch_q17" -> tpchQ17 _,
    "join_tpch_q19" -> tpchQ19 _,
    "join_tpch_q22" -> tpchQ22 _,
    "agg_group_concat" -> groupConcat _,
    "ev_daily_anomaly" -> dailyAnomalies _,
    "agg_mode_per_group" -> modePerGroup _,
    "agg_weighted_avg" -> weightedAvg _,
    "fn_levenshtein" -> levenshteinAdjacent _,
    "fn_hash_sample" -> hashSample _,
    "win_first_last" -> firstLastWindows _,
    "join_full_outer" -> fullOuterCounts _,
  )

  private val quartersValues: String =
    quarters.map { case (l, s, e) => s"('$l', DATE '$s', DATE '$e')" }.mkString(", ")

  val oracleSql: Map[String, String] = Map(
    // Error-bound audit (see [[sketches]]): DuckDB computes the exact
    // sides and asserts both accuracy flags TRUE; the engine computes
    // the flags from its sketches, so an out-of-bound estimate
    // hash-mismatches.
    "sketch_approx" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  CAST(1 AS BIGINT) AS users_ok, CAST(1 AS BIGINT) AS p50_ok
        |FROM events GROUP BY event_type""".stripMargin,
    "agg_cube" ->
      """SELECT c_mktsegment, c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        |FROM customer GROUP BY CUBE(c_mktsegment, c_nationkey)""".stripMargin,
    "agg_pivot" ->
      """SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS y,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p_urgent,
        |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p_high,
        |  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p_medium,
        |  CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS p_notspec,
        |  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS p_low
        |FROM orders GROUP BY 1""".stripMargin,
    "agg_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS q1,
        |  quantile_cont(l_quantity, 0.5) AS med,
        |  quantile_cont(l_quantity, 0.75) AS q3,
        |  MIN(l_quantity) AS qmin, MAX(l_quantity) AS qmax
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "agg_moment_stats" ->
      """SELECT l_returnflag, n,
        |  CAST(n * sx2 - sx * sx AS DOUBLE) / (CAST(n AS DOUBLE) * n) AS var_qty,
        |  sqrt(CAST(n * sx2 - sx * sx AS DOUBLE) / (CAST(n AS DOUBLE) * n)) AS std_qty,
        |  CAST(n * sxy - sx * sy AS DOUBLE)
        |    / (sqrt(CAST(n * sx2 - sx * sx AS DOUBLE)) * sqrt(CAST(n * sy2 - sy * sy AS DOUBLE))) AS corr_qty_disc
        |FROM (
        |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(qi) AS BIGINT) AS sx, CAST(SUM(qi * qi) AS BIGINT) AS sx2,
        |    CAST(SUM(pc) AS BIGINT) AS sy, CAST(SUM(pc * pc) AS BIGINT) AS sy2,
        |    CAST(SUM(qi * pc) AS BIGINT) AS sxy
        |  FROM (
        |    SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qi,
        |      CAST(ROUND(l_discount * 100) AS BIGINT) AS pc
        |    FROM lineitem)
        |  GROUP BY l_returnflag)""".stripMargin,
    "fn_arrays" ->
      """SELECT doc_id,
        |  CAST(len(ws) AS INTEGER) AS n_words,
        |  ws[1] AS first_word,
        |  ws[-1] AS last_word,
        |  array_to_string(list_slice(ws, 1, 5), ' ') AS head5,
        |  list_contains(ws, 'the') AS has_the,
        |  CAST(len(list_distinct(ws)) AS INTEGER) AS n_uniq
        |FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)""".stripMargin,
    "fn_conditional" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice < 50000 THEN 'small'
        |       WHEN o_totalprice < 150000 THEN 'medium' ELSE 'large' END AS size_bucket,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_alt,
        |  LEAST(o_totalprice, 100000.0) AS capped_price,
        |  CAST(GREATEST(YEAR(o_orderdate), 1996) AS INTEGER) AS y_floor,
        |  CAST(SUBSTR(o_orderpriority, 1, 1) AS INTEGER) AS pri_rank
        |FROM orders""".stripMargin,
    "win_moving_avg" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |      OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mavg3
        |FROM orders""".stripMargin,
    "win_dist_ranks" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(NTILE(10) OVER w AS INTEGER) AS decile,
        |  PERCENT_RANK() OVER w AS pct_rank,
        |  CUME_DIST() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)""".stripMargin,
    "join_range_quarters" ->
      s"""SELECT qlabel, CAST(COUNT(*) AS BIGINT) AS n, SUM(l_quantity) AS sum_qty
         |FROM lineitem
         |JOIN (VALUES $quartersValues) AS q(qlabel, qs, qe)
         |  ON CAST(l_shipdate AS DATE) >= qs AND CAST(l_shipdate AS DATE) < qe
         |GROUP BY qlabel""".stripMargin,
    "join_asof_events" ->
      """SELECT p.user_id, p.event_id, epoch_us(p.ts) AS purchase_us, epoch_us(v.ts) AS prior_view_us
        |FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id AND v.ts < p.ts""".stripMargin,
    "win_topk_native" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders) WHERE rk <= 3""".stripMargin,
    "skew_salted_agg" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type""".stripMargin,
    "join_basket_pairs" ->
      """WITH ob AS (
        |  SELECT DISTINCT l_orderkey, p_brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey)
        |SELECT a.p_brand AS brand1, b.p_brand AS brand2,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM ob a JOIN ob b
        |  ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        |GROUP BY 1, 2 HAVING COUNT(*) >= 10""".stripMargin,
    "join_tpch_q17" ->
      """WITH f AS (
        |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS price
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#13'),
        |s AS (
        |  SELECT *, SUM(qty) OVER (PARTITION BY l_partkey) AS sumq,
        |    COUNT(*) OVER (PARTITION BY l_partkey) AS cnt FROM f)
        |SELECT CAST(SUM(price) * 100 AS BIGINT) AS revenue_cents,
        |  CAST(COUNT(*) AS BIGINT) AS n_small
        |FROM s WHERE 5 * qty * cnt < sumq""".stripMargin,
    "join_tpch_q19" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "join_tpch_q22" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey % 5 AS cntrycode,
        |    CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
        |  FROM customer WHERE c_nationkey % 5 IN (0, 1, 2)),
        |a AS (SELECT SUM(cents) AS sum_cents, COUNT(*) AS n_pos FROM c WHERE cents > 0),
        |big AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 450000.0)
        |SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
        |  CAST(SUM(cents) AS BIGINT) AS totacctbal_cents
        |FROM c CROSS JOIN a
        |WHERE cents * n_pos > sum_cents
        |  AND c_custkey NOT IN (SELECT o_custkey FROM big)
        |GROUP BY cntrycode""".stripMargin,
    "join_tpch_q3" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1996-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "join_tpch_q5" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,
    "join_tpch_q8" ->
      """WITH f AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |    CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) AS volume,
        |    n2.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'),
        |a AS (
        |  SELECT o_year,
        |    SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
        |        ELSE CAST(0 AS DECIMAL(18,4)) END) AS nat,
        |    SUM(volume) AS tot
        |  FROM f GROUP BY 1),
        |b AS (
        |  SELECT o_year, CAST(nat * 10000 AS BIGINT) AS nat_e4,
        |    CAST(tot * 10000 AS BIGINT) AS tot_e4
        |  FROM a)
        |SELECT o_year, nat_e4, tot_e4,
        |  CAST((nat_e4 * 1000 // tot_e4) * 1000
        |    + ((nat_e4 * 1000 % tot_e4) * 1000) // tot_e4 AS BIGINT) AS mkt_share_micro
        |FROM b""".stripMargin,
    "join_tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS INT) AS l_year, l_extendedprice, l_discount
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3""".stripMargin,
    "join_tpch_q13" ->
      """WITH pc AS (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1)
        |SELECT CAST(c_count AS BIGINT) AS c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM pc GROUP BY 1""".stripMargin,
    "join_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)""".stripMargin,
    "agg_tpch_q6" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "join_tpch_q14" ->
      """WITH a AS (
        |  SELECT
        |    SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS promo,
        |    SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS total
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'),
        |b AS (
        |  SELECT CAST(promo * 10000 AS BIGINT) AS promo_e4,
        |    CAST(total * 10000 AS BIGINT) AS total_e4
        |  FROM a)
        |SELECT promo_e4, total_e4,
        |  CAST((promo_e4 * 1000 // total_e4) * 1000
        |    + ((promo_e4 * 1000 % total_e4) * 1000) // total_e4 AS BIGINT) AS promo_micro
        |FROM b""".stripMargin,
    "join_tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey, SUM(l_quantity) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 212)
        |SELECT c_name, o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(sum_qty AS BIGINT) AS sum_qty
        |FROM orders JOIN big ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "join_tpch_q10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,
    "agg_mode_per_group" ->
      """SELECT c_mktsegment, mode_nation, cnt FROM (
        |  SELECT c_mktsegment, c_nationkey AS mode_nation, CAST(COUNT(*) AS BIGINT) AS cnt,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |      ORDER BY COUNT(*) DESC, c_nationkey ASC) AS rn
        |  FROM customer GROUP BY c_mktsegment, c_nationkey)
        |WHERE rn = 1""".stripMargin,
    "agg_weighted_avg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(pc * qi) AS DOUBLE) / SUM(qi) AS wavg_disc_pct
        |FROM (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qi,
        |    CAST(ROUND(l_discount * 100) AS BIGINT) AS pc
        |  FROM lineitem)
        |GROUP BY l_returnflag""".stripMargin,
    "fn_regex" ->
      """SELECT p_partkey,
        |  CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INTEGER) AS brand_num,
        |  regexp_extract(p_type, '^(\w+)', 1) AS type_head,
        |  p_brand LIKE 'Brand#1%' AS is_brand1x,
        |  regexp_matches(p_name, '^[aeiou]') AS vowel_start
        |FROM part""".stripMargin,
    "agg_group_concat" ->
      """SELECT c_nationkey,
        |  array_to_string(list_sort(list_distinct(list(c_mktsegment))), ',') AS segments,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM customer GROUP BY c_nationkey""".stripMargin,
    "ev_daily_anomaly" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1),
        |stats AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(cnt) AS BIGINT) AS s1,
        |    CAST(SUM(cnt * cnt) AS BIGINT) AS s2
        |  FROM daily)
        |SELECT day, cnt,
        |  (nd * cnt - s1) * (nd * cnt - s1) > 4 * (nd * s2 - s1 * s1) AS is_anomaly
        |FROM daily, stats""".stripMargin,
    "agg_multi_distinct" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS d_parts,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS d_supps,
        |  CAST(COUNT(DISTINCT CAST(l_quantity AS BIGINT)) AS BIGINT) AS d_qtys,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "win_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY od
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_last30d
        |FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS od
        |  FROM orders)""".stripMargin,
    "agg_histogram" ->
      """SELECT CAST(LEAST(FLOOR(o_totalprice / 25000), 19) AS INTEGER) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM orders GROUP BY 1""".stripMargin,
    "fn_levenshtein" ->
      """SELECT a.p_partkey AS k, CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS lev
        |FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1""".stripMargin,
    "fn_hash_sample" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 10 = 0""".stripMargin,
    "win_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  FIRST_VALUE(o_orderkey) OVER w AS first_ord,
        |  LAST_VALUE(o_orderkey) OVER w AS last_ord,
        |  NTH_VALUE(o_orderkey, 2) OVER w AS second_ord
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,
    "join_full_outer" ->
      """SELECT COALESCE(ck, sk) AS nationkey, n_cust, n_supp FROM
        |  (SELECT c_nationkey AS ck, CAST(COUNT(*) AS BIGINT) AS n_cust FROM customer GROUP BY 1) c
        |FULL OUTER JOIN
        |  (SELECT s_nationkey AS sk, CAST(COUNT(*) AS BIGINT) AS n_supp FROM supplier GROUP BY 1) s
        |ON ck = sk""".stripMargin,
  )
}
