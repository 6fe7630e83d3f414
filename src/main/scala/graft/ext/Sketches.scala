package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** [extension] Mergeable sketches with EXACT cross-engine determinism —
  * the sublinear-memory summaries a 100 TB profiling pass runs instead
  * of exact aggregation, built so every intermediate is integer (or an
  * exact power-of-two double), which makes the results hash-comparable
  * against the DuckDB oracle — unlike `sketch_approx`, whose
  * HLL++/KLL internals are engine-specific and can only be
  * bounds-checked.
  *
  * Both sketches are algebraic aggregates: per-partition partial
  * sketches merge associatively (max for FM registers, + for CMS
  * counters), so Spark's map-side combine does the heavy lifting and
  * the shuffle carries only sketch cells, never raw values.
  *
  * Hash portability: the same md5-based `h32` family as
  * [[Dedup]] (`cast(conv(substr(md5(x),1,8),16,10) as bigint)` —
  * identical on every engine).
  */
object Sketches {

  private def h32(s: String): String =
    s"cast(conv(substr(md5($s),1,8),16,10) as bigint)"

  /** Flajolet–Martin PCSA distinct-count sketch (Flajolet & Martin
    * 1985, "Probabilistic Counting Algorithms for Data Base
    * Applications"): per (group, bucket) register R = max over values of
    * ρ(h) where ρ = 1 + index of the lowest set bit of the hash suffix
    * (the FM bit-pattern statistic), m = 64 buckets via stochastic
    * averaging. Emits per group the sketch summary (buckets hit, Σ R)
    * plus the PCSA estimate and the exact distinct count for
    * calibration.
    *
    * Determinism: ρ uses `w & -w` (an exact power of two ≤ 2²⁶) and
    * log2 of an exact power of two is exact in IEEE double on both
    * engines; the estimate uses ⌊Σ R / m⌋ as the exponent (instead of
    * the fractional mean, a documented determinism trade: 2^frac bias
    * < 2× and the INTEGER exponent makes `shiftleft` exact) so
    * est = round(m · 2^k / 0.77351, 6) is bit-identical everywhere.
    *
    * Scale shape: one scan, one map-side-combined shuffle of ≤ m rows
    * per group per partition; the register relation (group × 64 rows)
    * IS the mergeable sketch state — union two corpora's registers and
    * re-max to combine. */
  def fmDistinct(spark: SparkSession, sfDir: String): DataFrame =
    fmDistinctOn(Tables.orders(spark, sfDir)
      .select(col("o_orderpriority").as("priority"), col("o_custkey")))

  /** Per-(priority, bucket) FM registers — the mergeable sketch state
    * shared by [[fmDistinctOn]] (per-group estimate) and [[fmMergeOn]]
    * (cross-group register-wise max). */
  private def fmRegisters(keyed: DataFrame): DataFrame =
    keyed
      .withColumn("h", expr(h32("cast(o_custkey as string)")))
      .select(col("priority"),
        (col("h") % 64L).as("bucket"), expr("h div 64").as("w"))
      .withColumn("rho",
        when(col("w") === 0L, lit(27))
          .otherwise(expr("cast(round(log2(w & -w), 0) as int) + 1")))
      .groupBy(col("priority"), col("bucket"))
      .agg(max(col("rho")).as("r"))

  private val fmEstSql =
    "round(cast(64 * shiftleft(cast(1 as bigint), cast(sum_r div 64 as int)) as double) / 0.77351, 6)"

  /** [[fmDistinct]] over an explicit (priority, o_custkey) frame — the
    * operator body, exposed so tests can plant a known cardinality. */
  def fmDistinctOn(keyed: DataFrame): DataFrame = {
    val sums = fmRegisters(keyed).groupBy(col("priority"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("r")).as("sum_r"))
      .withColumn("est", expr(fmEstSql))
    val truth = keyed.groupBy(col("priority"))
      .agg(countDistinct(col("o_custkey")).as("n_true"))
    sums.join(truth, "priority")
      .select(col("priority"), col("n_buckets"), col("sum_r"),
        col("est"), col("n_true"))
  }

  /** FM sketch MERGE — the property that earns a sketch its bias at
    * 100 TB: per-partition sketches combine by register-wise MAX with
    * no rescan of data. Merges the per-priority register relations into
    * ONE global sketch and estimates the global distinct count,
    * alongside (a) the exact truth and (b) the SUM of the per-priority
    * estimates — which overcounts every custkey appearing under
    * several priorities, exhibiting in one row why merge ≠ sum. Both
    * derived numbers are exact-decimal, so the row hash-matches the
    * oracle. */
  def fmMerge(spark: SparkSession, sfDir: String): DataFrame =
    fmMergeOn(Tables.orders(spark, sfDir)
      .select(col("o_orderpriority").as("priority"), col("o_custkey")))

  def fmMergeOn(keyed: DataFrame): DataFrame = {
    val regs = fmRegisters(keyed)
    val merged = regs.groupBy(col("bucket")).agg(max(col("r")).as("r"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("r")).as("sum_r"))
      .withColumn("est", expr(fmEstSql))
    // per-group estimates sum in DECIMAL so accumulation order cannot
    // drift the last ulp across engines
    val groupSum = regs.groupBy(col("priority"))
      .agg(sum(col("r")).as("sum_r"))
      .withColumn("est", expr(fmEstSql))
      .agg(sum(col("est").cast("decimal(18,6)"))
        .cast("decimal(18,6)").as("sum_group_est"))
    val truth = keyed.agg(countDistinct(col("o_custkey")).as("n_true"))
    merged.join(groupSum).join(truth)
      .select(col("n_buckets"), col("sum_r"), col("est"),
        col("sum_group_est"), col("n_true"))
  }

  /** Count-min sketch heavy-hitter estimates (Cormode & Muthukrishnan
    * 2005): d = 4 hash rows × w = 1024 buckets over the corpus word
    * stream; a word's estimate is min over rows of its bucket counter —
    * ≥ the true count by construction, with overestimate bounded by
    * ε‖f‖₁ (ε = e/1024). Probes the 20 true-top words (exact count,
    * (count desc, word asc) tiebreak) so the output carries both the
    * truth and the estimate.
    *
    * Scale shape: the counter build is one shuffle of ≤ 4096 cells
    * (map-side combine collapses each partition's word stream into its
    * partial sketch first — the CMS merge property); the probe joins a
    * 20-row frame against the 4096-cell sketch. At 100 TB the sketch
    * size is UNCHANGED — that is the point of a sketch — and the only
    * full-data pass is the build scan. */
  def cmsHeavyHitters(spark: SparkSession, sfDir: String): DataFrame =
    cmsHeavyHittersOn(Tables.documents(spark, sfDir))

  /** [[cmsHeavyHitters]] over an explicit documents frame — the operator
    * body, exposed so tests can plant a known heavy hitter. */
  def cmsHeavyHittersOn(docs: DataFrame): DataFrame = {
    val words = docs.select(explode(split(col("text"), " ")).as("word"))
    def rowBuckets(wordCol: String) = array((0 until 4).map { r =>
      struct(lit(r).as("r"),
        expr(s"${h32(s"concat($wordCol, '#$r')")} % 1024").as("bucket"))
    }: _*)
    val counters = words
      .select(explode(rowBuckets("word")).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
    val top = words.groupBy(col("word")).agg(count(lit(1)).as("n_true"))
      .orderBy(col("n_true").desc, col("word").asc).limit(20)
    top
      .select(col("word"), col("n_true"), explode(rowBuckets("word")).as("rb"))
      .select(col("word"), col("n_true"),
        col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .join(counters, Seq("r", "bucket"))
      .groupBy(col("word"), col("n_true"))
      .agg(min(col("c")).as("est"))
      .select(col("word"), col("n_true"), col("est"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_fm_distinct" -> fmDistinct _,
    "sketch_fm_merge" -> fmMerge _,
    "sketch_cms_heavy" -> cmsHeavyHitters _,
  )

  val oracleSql: Map[String, String] = Map(
    "sketch_fm_distinct" ->
      """WITH h AS (
        |  SELECT o_orderpriority AS priority,
        |    CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8)) AS BIGINT) AS h
        |  FROM orders),
        |b AS (SELECT priority, h % 64 AS bucket, h // 64 AS w FROM h),
        |regs AS (
        |  SELECT priority, bucket,
        |    MAX(CASE WHEN w = 0 THEN 27
        |      ELSE CAST(round(log2(w & (-w)), 0) AS INT) + 1 END) AS r
        |  FROM b GROUP BY priority, bucket),
        |g AS (
        |  SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_buckets,
        |    CAST(SUM(r) AS BIGINT) AS sum_r
        |  FROM regs GROUP BY priority),
        |t AS (
        |  SELECT o_orderpriority AS priority,
        |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_true
        |  FROM orders GROUP BY 1)
        |SELECT g.priority, g.n_buckets, g.sum_r,
        |  round(CAST(64 * (1 << CAST(g.sum_r // 64 AS INT)) AS DOUBLE) / 0.77351, 6) AS est,
        |  t.n_true
        |FROM g JOIN t ON g.priority = t.priority""".stripMargin,
    "sketch_fm_merge" ->
      """WITH h AS (
        |  SELECT o_orderpriority AS priority,
        |    CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8)) AS BIGINT) AS h
        |  FROM orders),
        |b AS (SELECT priority, h % 64 AS bucket, h // 64 AS w FROM h),
        |regs AS (
        |  SELECT priority, bucket,
        |    MAX(CASE WHEN w = 0 THEN 27
        |      ELSE CAST(round(log2(w & (-w)), 0) AS INT) + 1 END) AS r
        |  FROM b GROUP BY priority, bucket),
        |merged AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets, CAST(SUM(r) AS BIGINT) AS sum_r
        |  FROM (SELECT bucket, MAX(r) AS r FROM regs GROUP BY bucket)),
        |ge AS (
        |  SELECT CAST(SUM(CAST(round(CAST(64 * (1 << CAST(sum_r // 64 AS INT)) AS DOUBLE) / 0.77351, 6)
        |    AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS sum_group_est
        |  FROM (SELECT priority, CAST(SUM(r) AS BIGINT) AS sum_r FROM regs GROUP BY priority)),
        |t AS (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_true FROM orders)
        |SELECT merged.n_buckets, merged.sum_r,
        |  round(CAST(64 * (1 << CAST(merged.sum_r // 64 AS INT)) AS DOUBLE) / 0.77351, 6) AS est,
        |  ge.sum_group_est, t.n_true
        |FROM merged, ge, t""".stripMargin,
    "sketch_cms_heavy" ->
      """WITH w AS (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        |rb AS (
        |  SELECT word, r,
        |    CAST(concat('0x', substr(md5(concat(word, '#', CAST(r AS VARCHAR))), 1, 8)) AS BIGINT)
        |      % 1024 AS bucket
        |  FROM w, UNNEST([0, 1, 2, 3]) AS rows(r)),
        |counters AS (
        |  SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM rb GROUP BY r, bucket),
        |top AS (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS n_true FROM w
        |  GROUP BY word ORDER BY n_true DESC, word ASC LIMIT 20),
        |probe AS (
        |  SELECT t.word, t.n_true, rows.r,
        |    CAST(concat('0x', substr(md5(concat(t.word, '#', CAST(rows.r AS VARCHAR))), 1, 8)) AS BIGINT)
        |      % 1024 AS bucket
        |  FROM top t, UNNEST([0, 1, 2, 3]) AS rows(r))
        |SELECT p.word, p.n_true, MIN(c.c) AS est
        |FROM probe p JOIN counters c ON p.r = c.r AND p.bucket = c.bucket
        |GROUP BY p.word, p.n_true""".stripMargin,
  )
}
