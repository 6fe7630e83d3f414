package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.kql.Kql._

/** The reference's published analytical workload (README.md:363-392) —
  * three KQL aggregates over the materialized `Orders` table plus the
  * psql top-5 validation scan (README.md:203) — expressed through the
  * KQL-flavored builder so the dialect defaults (desc `sort`,
  * `summarize ... by`) are exercised, over the derived `orders_info`
  * table.
  *
  * All aggregates are over the int `amount` column, so sums are exact and
  * avg = exact-int-sum / count — bit-identical to the DuckDB oracle.
  */
object ReferenceQueries {

  /** A1 (README.md:363-367): `Orders | summarize avg_sales = avg(amount) by city`. */
  def avgSalesByCity(spark: SparkSession, sfDir: String): DataFrame =
    Tables.ordersInfo(spark, sfDir)
      .summarize(Seq("avg_sales" -> avg(col("amount"))), col("city"))

  /** A2+O2 (README.md:373-376): `summarize total = sum(amount) by city | sort by total`. */
  def totalSalesByCity(spark: SparkSession, sfDir: String): DataFrame =
    Tables.ordersInfo(spark, sfDir)
      .summarize(Seq("total" -> sum(col("amount"))), col("city"))
      .kqlSort(col("total"))

  /** A3+O3 (README.md:385-388): `summarize orders = count() by city | sort by orders`. */
  def orderCountByCity(spark: SparkSession, sfDir: String): DataFrame =
    Tables.ordersInfo(spark, sfDir)
      .summarize(Seq("orders" -> count(lit(1))), col("city"))
      .kqlSort(col("orders"), col("city"))

  /** O1 (README.md:203): `select * from orders_info order by orderid desc limit 5`
    * — Catalyst plans TakeOrderedAndProject (distributed top-k, no global sort). */
  def latestFiveOrders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.ordersInfo(spark, sfDir).top(5, col("orderid"))

  // ---- verbatim KQL text (README.md:363-392) through the parser ----------

  /** The exact query strings the reference user types, including their
    * original trailing whitespace — run through [[graft.kql.KqlParser]]
    * against an `Orders` registry entry. Same semantics as the builder
    * queries above; these pin the TEXT dialect end-to-end. */
  val kqlAvgText: String =
    "Orders\n| summarize avg_sales = avg(amount) by city \n| render columnchart"
  val kqlTotalText: String =
    "Orders \n| summarize total = sum(amount) by city \n| sort by total\n| render piechart "
  val kqlCountText: String =
    "Orders\n| summarize orders = count() by city\n| sort by orders\n| render linechart   "

  private def kqlText(q: String)(spark: SparkSession, sfDir: String): DataFrame =
    graft.kql.KqlParser.run(q, Map(
      "Orders" -> Tables.ordersInfo(spark, sfDir),
      "Events" -> Tables.events(spark, sfDir),
      "Documents" -> Tables.documents(spark, sfDir)))

  /** `let` + `join` through the text front-end: scalar let (threshold),
    * tabular let (per-customer counts), an inner join whose right side
    * is the tabular let, and a summarize over the joined frame — the
    * richer-dashboard KQL shape VERDICT r3 called out as the first gap
    * a porting user would hit. The oracle mirrors it as a plain
    * HAVING-join aggregate. */
  val kqlJoinText: String =
    """let minAmount = 150;
      |let frequent = Orders | summarize cnt = count() by custid | where cnt >= 3;
      |Orders
      || where amount >= minAmount
      || join kind=inner (frequent) on custid
      || summarize total = sum(amount), n = count() by city""".stripMargin

  /** `bin()` through the text front-end: the histogram-by-bucket shape
    * every ADX dashboard uses (`summarize ... by bin(x, size)`), with a
    * named computed group key and an ascending sort. */
  val kqlBinText: String =
    """Orders
      || summarize n = count(), total = sum(amount) by bucket = bin(amount, 20)
      || sort by bucket asc""".stripMargin

  /** `parse kind=regex` with typed slots through the text front-end:
    * a synthesized log line is parsed back with raw-regex delimiters
    * (`\s+`) and `:long`/`:int` slot casts, then aggregated — a
    * round-trip oracle (the parse must reproduce orderid/amount
    * exactly for the sums to match). */
  val kqlParseRegexText: String =
    """Orders
      || extend line = concat('id=', cast(orderid as string), ' amt=', cast(amount as string), ';')
      || parse kind=regex line with 'id=' oid:long '\s+amt=' amt:int ';'
      || summarize n = count(), total = sum(amt), maxid = max(oid) by city""".stripMargin

  /** `mv-expand` with alias + struct path + element typing through the
    * text front-end: each order row carries a struct-wrapped 2-element
    * array, expanded to one row per element and cast to long — the
    * dynamic-column explode every ADX dashboard uses. */
  val kqlMvExpandText: String =
    """Orders
      || extend s = named_struct('vals', array(orderid, amount))
      || mv-expand v = s.vals to typeof(long)
      || summarize n = count(), total = sum(v) by city""".stripMargin

  /** `mv-expand a, b` multi-column LOCKSTEP (r11 verdict item 3): ADX
    * zips parallel arrays row-wise — max-length expansion, shorter
    * arrays null-fill — it is NOT a cross product. The arrays here are
    * deliberately ragged (ys is 1 or 3 elements against xs's 2) so the
    * null-fill convention is what the oracle actually checks, and
    * with_itemindex pins the lockstep position. All-integer arithmetic,
    * integer aggregates — no float surface. The ys products go through
    * tolong FIRST: ADX types integer literals as long (so `orderid *
    * 30` widens there), but this engine emits literals as Spark ints —
    * an INT product overflows once orderid reaches the sf1 stress
    * corpus's shifted key range (caught by the r17 full-surface sf1
    * sweep as an ANSI ARITHMETIC_OVERFLOW). */
  val kqlMvExpandMultiText: String =
    """Orders
      || extend xs = array(orderid, orderid + 1),
      |         ys = iff(orderid % 2 == 0, array(tolong(orderid) * 10),
      |                  array(tolong(orderid) * 10, tolong(orderid) * 20, tolong(orderid) * 30))
      || mv-expand with_itemindex=ix x = xs to typeof(long), y = ys
      || summarize n = count(), nx = countif(isnotnull(x)),
      |            ny = countif(isnotnull(y)), sx = sum(x), sy = sum(y),
      |            six = sum(ix) by city""".stripMargin

  /** Lazily-created per-JVM scratch file for [[kqlExternaldata]]'s dim
    * csv (unique path via createTempFile; deleteOnExit bounds the
    * lifetime to the JVM). */
  private object ExternaldataDims {
    lazy val path: java.nio.file.Path = {
      val p = java.nio.file.Files.createTempFile("graft_externaldata_dims", ".csv")
      p.toFile.deleteOnExit()
      p
    }
  }

  /** `externaldata` (r11 verdict item 4): ADX's ad-hoc external file
    * scan with a DECLARED schema, desugared to a schema'd Spark file
    * source. The dim csv is written fresh from a constant each run
    * (deterministic; the oracle inlines the same constant as VALUES),
    * header skipped via ignoreFirstRecord, one dim row ('Atlantis')
    * matching no fact row so the inner join is exercised. Unsupported
    * formats/options reject loudly — KqlSpec pins that. */
  def kqlExternaldata(spark: SparkSession, sfDir: String): DataFrame = {
    // per-JVM temp file, created once: a fixed global tmpdir name is
    // shared by every process/user on the host — concurrent benches
    // race the write, and a pre-existing file owned by another user
    // makes writeString throw (r12 advice)
    val p = ExternaldataDims.path
    java.nio.file.Files.writeString(p,
      "city,tier\nNew Delhi,1\nSeattle,2\nNew York,3\nAtlantis,9\n")
    kqlText(
      s"""let dims = externaldata(city:string, tier:long)["$p"]
         |  with (format="csv", ignoreFirstRecord=true);
         |Orders
         || summarize total = sum(amount), n = count() by city
         || join kind=inner (dims) on city
         || project city, tier, total, n""".stripMargin)(spark, sfDir)
  }

  /** `lookup` through the text front-end: the dimension-enrichment
    * shape (fact table + small dim → broadcast join, right key not
    * duplicated) every ADX dashboard uses to attach rollup attributes —
    * here a city→region dim as a `datatable` tabular let. */
  val kqlLookupText: String =
    """let dims = datatable(city:string, region:string)[
      |  'New Delhi', 'APAC', 'Seattle', 'WEST', 'New York', 'EAST',
      |  'Austin', 'SOUTH', 'Chicago', 'MIDWEST', 'Cleveland', 'MIDWEST'];
      |Orders
      || lookup (dims) on city
      || summarize n = count(), total = sum(amount) by region
      || sort by region asc""".stripMargin

  /** `union` + `project-rename` + `project-keep` through the text
    * front-end: a disjoint split of Orders unioned back together (so
    * the aggregate must equal the plain full-table aggregate), then
    * renamed/pruned before summarizing. */
  val kqlUnionText: String =
    """Orders
      || where amount < 150
      || union (Orders | where amount >= 150)
      || project-rename town = city
      || project-keep orderid, amount, town
      || summarize n = count(), total = sum(amount) by town""".stripMargin

  /** `percentile`/`sumif` aggregates through the text front-end —
    * exact-percentile semantics (documented deviation from ADX's
    * T-digest) make the result oracle-comparable. */
  val kqlPercentileText: String =
    """Orders
      || summarize p90raw = percentile(amount, 90),
      |            hi = sumif(amount, amount >= 150), n = count() by city
      || extend p90 = round(p90raw, 6)
      || project-away p90raw""".stripMargin

  /** Timespan `bin()` over the event stream — THE time-series dashboard
    * shape (`summarize count() by bin(timestamp, 1h)`). Buckets stay in
    * integer epoch seconds end to end; output is epoch millis per the
    * cross-engine timestamp-comparison convention. */
  val kqlTimeHistogramText: String =
    """Events
      || summarize n = count() by t = bin(ts, 1h)
      || extend bucket_ms = unix_millis(t)
      || project-away t
      || sort by bucket_ms asc""".stripMargin

  /** `case()` conditional tiering — the canonical ADX bucketing idiom. */
  val kqlCaseText: String =
    """Orders
      || extend tier = case(amount >= 180, 'high', amount >= 140, 'mid', 'low')
      || summarize n = count(), total = sum(amount) by tier, city""".stripMargin

  /** `make-series` — the dense zero-filled per-group time series every
    * ADX timechart is built on. For the oracle the series is serialized
    * to CSV: Spark and DuckDB stringify Arrow list types differently
    * (inner field name + nullability), so raw array columns trip the
    * schema compare even when values match; the array semantics
    * themselves (zero-fill, axis spacing) are pinned in `KqlSpec`. */
  val kqlMakeSeriesText: String =
    """Events
      || make-series n = count() on ts from datetime(2024-01-01) to datetime(2024-01-31) step 1d by event_type
      || extend series = array_join(n, ',')
      || project event_type, series""".stripMargin

  /** `make-series` with `avg()` and a NON-ZERO `default=` fill — the
    * gap-marking timechart idiom (`default = -1` flags empty bins so a
    * dashboard can render them distinctly from true zeros). avg is over
    * the int user_id column so per-bin sums are exact integers and the
    * single double division is bit-identical cross-engine; the series
    * serializes as floor(x·10⁶) micro-units, not round→DECIMAL: avg is
    * sum/count with arbitrary denominator, so a bin with e.g. 128 rows
    * and odd sum is an EXACT 6-dp half-tie (m/2⁷ terminates with a
    * 7th-digit 5), the class DuckDB versions resolve differently. */
  val kqlMakeSeriesAvgText: String =
    """Events
      || make-series a = avg(user_id) default = -1 on ts from datetime(2024-01-01) to datetime(2024-01-31) step 1d by event_type
      || extend series = array_join(transform(a, x -> string(tolong(floor(x * 1000000.0, 1)))), ',')
      || project event_type, series""".stripMargin

  /** r10 multi-aggregate `make-series` — three series in ONE pass, each
    * with its own default fill (count's implicit 0, explicit -1s); the
    * leading where leaves the first two bins empty so every fill is
    * observable. Integer-input sum and double max keep float parity
    * (order-independent); the max series serializes as floor(x·10⁶)
    * micro-units — max() is a selection, not arithmetic, so the double
    * is bit-identical cross-engine and its floor is too (the avg
    * query's convention, replacing the round→DECIMAL half-tie form). */
  val kqlMakeSeriesMultiText: String =
    """Events
      || where ts >= datetime(2024-01-03)
      || make-series c = count(), s = sum(user_id) default = -1, mx = max(value) default = -1 on ts from datetime(2024-01-01) to datetime(2024-01-10) step 1d by event_type
      || extend cs = array_join(transform(c, x -> string(x)), ','), ss = array_join(transform(s, x -> string(x)), ','), ms = array_join(transform(mx, x -> string(tolong(floor(x * 1000000.0, 1)))), ',')
      || project event_type, cs, ss, ms
      || sort by event_type asc""".stripMargin

  /** `serialize` + the row-window functions — the running-total /
    * neighbor-compare dashboard idiom (`prev`/`next`/`row_cumsum`/
    * `row_number` over the frame's sort order). All-integer columns so
    * the running sum is exact; the week filter keeps the inherently
    * single-partition serialized window dashboard-sized. */
  val kqlSerializeText: String =
    """Events
      || where ts >= datetime(2024-01-01) and ts < datetime(2024-01-08)
      || project event_id, user_id
      || sort by event_id asc
      || serialize rn = row_number(), prev_user = prev(user_id), next_user = next(user_id), run = row_cumsum(user_id)
      || project event_id, rn, prev_user, next_user, run""".stripMargin

  /** `top-nested` — the layered drill-down every ADX dashboard's
    * "top N, then top M within each" widget uses: top 3 cities by
    * revenue, then each city's top 2 customers by order count. Ties
    * break deterministically by the key ascending (documented
    * deviation; the oracle mirrors the same tiebreak). */
  val kqlTopNestedText: String =
    """Orders
      || top-nested 3 of city by total = sum(amount), top-nested 2 of custid by cnt = count()""".stripMargin

  /** `series_*` pointwise math over make-series arrays — the timechart
    * post-processing tier: fold reductions (sum/avg) and a composed
    * zip_with identity ((n+n)-n = n) proving binary ops round-trip
    * through the oracle's dense per-bin formulation. */
  val kqlSeriesMathText: String =
    """Events
      || make-series n = count() on ts from datetime(2024-01-01) to datetime(2024-01-31) step 1d by event_type
      || extend delta = series_subtract(series_add(n, n), n)
      || extend total = series_sum(n), mean_u = tolong(floor(series_avg(n) * 1000000.0, 1))
      || extend series = array_join(delta, ',')
      || project event_type, total, mean_u, series""".stripMargin

  /** The r10 series-analysis tier over the same dense axis as
    * [[kqlSeriesMathText]]: least-squares trend (`series_fit_line_dynamic`
    * — slope/intercept/r² over the index axis), deterministic anomaly
    * detection (`series_decompose_anomalies` — 7-point moving-average
    * baseline, 1.5-sigma residual flags; the engine's documented
    * deviation from ADX's STL/Tukey internals), per-point z-scores
    * (`series_outliers`) and the `series_stats_dynamic` bag. Fractional
    * outputs ship as floor(x·10⁶) BIGINT micro-units, NOT
    * round→DECIMAL(18,6): Spark's HALF_UP-on-shortest-repr and DuckDB's
    * binary-double rounding resolve decimal half-ties differently
    * across DuckDB versions (the r10 hash-fail class), whereas `*1e6`
    * and `floor` are single correctly-rounded IEEE ops — bit-identical
    * on any engine given the bit-identical doubles the count-valued
    * series guarantees (every sum of integer-valued doubles is exact). */
  val kqlSeriesAnomaliesText: String =
    """Events
      || make-series n = count() on ts from datetime(2024-01-01) to datetime(2024-01-31) step 1d by event_type
      || extend f = series_fit_line_dynamic(n), a = series_decompose_anomalies(n, 1.5), st = series_stats_dynamic(n)
      || extend slope_u = tolong(floor(f.slope * 1000000.0, 1)),
      |         icept_u = tolong(floor(f.interception * 1000000.0, 1)),
      |         rsq_u = tolong(floor(f.rsquare * 1000000.0, 1))
      || extend flags = array_join(a.ad_flag, ','),
      |         n_out = cast(array_sum(series_multiply(a.ad_flag, a.ad_flag)) as bigint)
      || extend peak_z_u = tolong(floor(array_max(series_outliers(n)) * 1000000.0, 1))
      || extend mn = st.min, mx = st.max, mx_i = st.max_idx
      || project event_type, slope_u, icept_u, rsq_u, mn, mx, mx_i, n_out, peak_z_u, flags""".stripMargin

  /** r13: the elementwise unary (`series_abs/exp/log/sign/floor/
    * ceiling/round`), `series_pow`, scalar-broadcast binary
    * (`series_multiply(c, 2)`, `series_add(…, 1)`) and comparison
    * (`series_greater/…/not_equals`) tiers over the same dense axis as
    * [[kqlSeriesMathText]]. Exactness: h = s/(2c+1) is one
    * correctly-rounded IEEE division of exact integers, so every
    * downstream chain (abs, floor, ceiling, the explicit
    * half-away-from-zero round, sign of the residual, x^{0,1} powers)
    * is bit-identical cross-engine; ln/exp outputs ship as
    * floor(x·10⁶) micro-units over a value set (ln of small odd
    * integers, e^{−1,0,1}) verified tie-free on the corpus; boolean
    * arrays serialize as 'true'/'false' CSV. */
  val kqlSeriesUnaryText: String =
    """Events
      || make-series c = count(), s = sum(user_id) default = -1 on ts from datetime(2024-01-01) to datetime(2024-01-10) step 1d by event_type
      || extend den = series_add(series_multiply(c, 2), 1)
      || extend h = series_divide(s, den)
      || extend fl = series_floor(h), ce = series_ceiling(h), rd = series_round(h)
      || extend sg = series_sign(series_subtract(h, rd))
      || extend ab = series_abs(h), lg = series_log(den), ex = series_exp(sg), pw = series_pow(den, series_abs(sg))
      || extend gt = series_greater(s, c), ge = series_greater_equals(s, c), lt = series_less(s, c),
      |         le = series_less_equals(fl, ce), eq = series_equals(rd, fl), ne = series_not_equals(rd, ce)
      || extend fls = array_join(transform(fl, x -> string(tolong(x))), ','),
      |         ces = array_join(transform(ce, x -> string(tolong(x))), ','),
      |         rds = array_join(transform(rd, x -> string(tolong(x))), ','),
      |         sgs = array_join(transform(sg, x -> string(tolong(x))), ','),
      |         pws = array_join(transform(pw, x -> string(tolong(x))), ','),
      |         abs_u = array_join(transform(ab, x -> string(tolong(floor(x * 1000000.0, 1)))), ','),
      |         lgs_u = array_join(transform(lg, x -> string(tolong(floor(x * 1000000.0, 1)))), ','),
      |         exs_u = array_join(transform(ex, x -> string(tolong(floor(x * 1000000.0, 1)))), ','),
      |         gts = array_join(transform(gt, x -> string(x)), ','),
      |         ges = array_join(transform(ge, x -> string(x)), ','),
      |         lts = array_join(transform(lt, x -> string(x)), ','),
      |         les = array_join(transform(le, x -> string(x)), ','),
      |         eqs = array_join(transform(eq, x -> string(x)), ','),
      |         nes = array_join(transform(ne, x -> string(x)), ',')
      || project event_type, fls, ces, rds, sgs, pws, abs_u, lgs_u, exs_u, gts, ges, lts, les, eqs, nes""".stripMargin

  /** `parse-where` — parse's row-dropping form (non-matching rows are
    * filtered, not null-filled): split every doc containing 'spark'
    * around its FIRST occurrence and account the fragment lengths. */
  val kqlParseWhereText: String =
    """Documents
      || parse-where text with head 'spark' tail
      || summarize docs = count(), head_chars = sum(strlen(head)),
      |            tail_chars = sum(strlen(tail)) by lang""".stripMargin

  /** `evaluate bag_unpack` — expand the events' dynamic props bag into
    * typed columns (schema discovered from the data, prefix form) and
    * aggregate the unpacked key. */
  val kqlBagUnpackText: String =
    """Events
      || extend d = todynamic(props)
      || evaluate bag_unpack(d, 'p_')
      || summarize n = count(), total = sum(p_k), mx = max(p_k) by event_type""".stripMargin

  /** `facet by` — the long-form single-frame adaptation (documented
    * deviation: ADX emits one table per facet column). */
  val kqlFacetText: String = "Orders | facet by city, custid"

  /** `partition by (top …)` — the per-group top-k desugar; only
    * amount-derived aggregates are projected because `top 3 by amount`
    * breaks ties arbitrarily (in ADX too): the chosen VALUE multiset is
    * deterministic, row identity is not. */
  val kqlPartitionTopText: String =
    """Orders
      || partition by city (top 3 by amount)
      || summarize n = count(), total = sum(amount) by city""".stripMargin

  /** `pack_array`/`bag_pack` dynamic constructors + the `todatetime`/
    * `tobool` cast spellings, round-tripped through array_sum and a
    * VARIANT property path. */
  val kqlPackText: String =
    """Orders
      || extend arr = pack_array(orderid, custid), bag = bag_pack('city', city, 'amt', amount)
      || extend s = array_sum(arr), c = tostring(bag.city), ok = tobool('true')
      || where ok
      || summarize n = count(), total = sum(s) by c""".stripMargin

  /** `row_rank_min`/`row_rank_dense` — ADX run-based ranking over the
    * serialized frame (a reappearing value starts a NEW run, unlike
    * SQL rank-by-value). */
  val kqlRowRankText: String =
    """Events
      || where ts >= datetime(2024-01-01) and ts < datetime(2024-01-08)
      || sort by event_id asc
      || extend rm = row_rank_min(user_id), rd = row_rank_dense(user_id)
      || project event_id, rm, rd""".stripMargin

  /** `search` + `distinct` — ci substring over every string column,
    * then projection+dedup. */
  val kqlSearchDistinctText: String =
    """Documents
      || search 'spark'
      || distinct lang, source""".stripMargin

  /** `parse-kv` — key=value extraction (str_to_map desugar), exercised
    * as a synthesize-then-parse round trip so the oracle is the
    * identity aggregation. */
  val kqlParseKvText: String =
    """Documents
      || extend kv = strcat('lg=', lang, ';nc=', tostring(n_chars))
      || parse-kv kv as (lg:string, nc:long) with (pair_delimiter=';', kv_delimiter='=')
      || summarize docs = count(), total_nc = sum(nc) by lg""".stripMargin

  /** ADX regex-trim tier (`trim`/`trim_start`/`trim_end` take a regex
    * FIRST) plus the deterministic `take_any` strengthening. */
  val kqlTrimText: String =
    """Documents
      || extend t = trim('[aeiou]', text), ts = trim_start('[a-m]', text),
      |         te = trim_end('[n-z]', text)
      || summarize docs = count(), c1 = sum(strlen(t)), c2 = sum(strlen(ts)),
      |            c3 = sum(strlen(te)), first_src = take_any(source) by lang""".stripMargin

  /** `format_datetime` — ADX specifier alphabet over the events stream. */
  val kqlFormatDatetimeText: String =
    """Events
      || extend day = format_datetime(ts, 'yyyy-MM-dd')
      || summarize n = count() by day
      || sort by day asc""".stripMargin

  /** The r9 filter-idiom tier over real data: `between` range filter,
    * `has_any` whole-term disjunction, `countof` occurrence counting,
    * and `dcountif` conditional distinct — the everyday ADX `where`
    * clause vocabulary, all map-side until the final aggregate. */
  val kqlFilterIdiomsText: String =
    """Documents
      || where n_chars between (250 .. 350)
      || where text has_any ('spark', 'window')
      || extend n_spark = countof(text, 'spark')
      || summarize docs = count(), spark_hits = sum(n_spark),
      |            langs_hit = dcountif(lang, n_spark > 0) by source""".stripMargin

  /** `evaluate pivot` — the ADX plugin with a direct Spark-native
    * equivalent: per-customer revenue spread across city columns
    * (values discovered from data; absent cells null on both engines). */
  val kqlEvaluatePivotText: String =
    """Orders
      || evaluate pivot(city, sum(amount), custid)""".stripMargin

  /** `top-hitters` — the heavy-hitters dashboard verb: biggest revenue
    * cities. Exact here (documented deviation from ADX's sampled
    * approximation); ADX's approximate_sum_* naming kept. */
  val kqlTopHittersText: String =
    """Orders
      || top-hitters 4 of city by amount""".stripMargin

  /** The r9 string-function tier over real data — `extract` (ADX
    * regex-first arg order, no-match → null), `split` (literal
    * delimiter), `isempty` — in the log-exploration shape they ship in:
    * pull a token out of semi-structured text, drop non-matches, bucket
    * and count. */
  val kqlExtractText: String =
    """Documents
      || extend first_word = extract('^([a-z]+) ', 1, text)
      || where isnotempty(first_word)
      || extend n_words = array_size(split(text, ' '))
      || summarize docs = count(), words = sum(n_words) by lang, first_word
      || where docs >= 3""".stripMargin

  /** Dynamic property bags end to end over real data: `todynamic`
    * parses the events `props` JSON into a Spark 4 VARIANT, the dotted
    * path rewrites to `variant_get`, `tolong` casts the variant scalar,
    * and the result aggregates per event type. The Spark-native VARIANT
    * decode happens once per row, map-side, no shuffle before the
    * aggregate. */
  val kqlDynamicPropsText: String =
    """Events
      || extend d = todynamic(props)
      || extend k = tolong(d.k)
      || summarize n = count(), s = sum(k), mx = max(k) by event_type""".stripMargin

  /** `top-nested … with others=` — the drill-down widget's catch-all
    * bucket: top 2 cities by revenue each drilled to their top 2
    * customers, plus one labeled row aggregating the cities that missed
    * the cut (deeper-level columns null on that row, per the documented
    * semantics in the parser). */
  val kqlTopNestedOthersText: String =
    """Orders
      || top-nested 2 of city with others = 'Other Cities' by total = sum(amount), top-nested 2 of custid by cnt = count()""".stripMargin

  /** `row_cumsum` with the restart argument — the per-segment running
    * total: accumulation resets at every purchase event (the restarting
    * row opens its own segment, ADX semantics). The restart group id is
    * a helper window column (SQL forbids nesting a window inside
    * PARTITION BY), mirrored structurally in the oracle. */
  val kqlRowCumsumRestartText: String =
    """Events
      || where ts >= datetime(2024-01-01) and ts < datetime(2024-01-08)
      || project event_id, user_id, event_type
      || sort by event_id asc
      || serialize c = row_cumsum(user_id, event_type == 'purchase')
      || project event_id, c""".stripMargin

  /** `mv-apply` — the per-row subquery over a dynamic column, desugared
    * to shuffle-free array higher-order functions. Each order carries a
    * 3-element array; the subquery filters and aggregates it per row,
    * then an ordinary summarize rolls the per-row results up by city. */
  val kqlMvApplyText: String =
    """Orders
      || extend arr = array(amount, amount + 10, 5)
      || mv-apply v = arr to typeof(long) on (where v >= 10 | summarize s = sum(v), n = count(), mx = max(v))
      || summarize total_s = sum(s), total_n = sum(n), top = max(mx) by city""".stripMargin

  /** `mv-apply` with an `extend` stage inside the subquery — the common
    * ADX reshape-then-aggregate idiom (`sum(v * 2)` expressed as
    * `extend w = v * 2 | summarize s = sum(w)`). The 5-element never
    * survives the `where`, so each row aggregates its two reshaped
    * survivors. */
  val kqlMvApplyExtendText: String =
    """Orders
      || extend arr = array(amount, amount + 10, 5)
      || mv-apply v = arr to typeof(long) on (where v >= 10 | extend w = v * 2 | summarize s = sum(w), n = count())
      || summarize total_s = sum(s), total_n = sum(n) by city""".stripMargin

  /** `range` — the table-from-scalar-series generator, exercised in its
    * canonical dashboard role: a 40-day axis LEFT-joined against daily
    * event counts so days past the data's end surface as explicit
    * zeros (the timechart zero-fill idiom without make-series arrays).
    * The axis column clashes with the summarized key, so the join
    * renames the right side `day1` per the ADX suffix rule — the
    * coalesce reads the LEFT axis, the count from the right. */
  val kqlRangeText: String =
    """let daily = Events | summarize n = count() by day = bin(ts, 1d);
      |range day from datetime(2024-01-01) to datetime(2024-02-09) step 1d
      || join kind=leftouter (daily) on day
      || extend cnt = coalesce(n, 0)
      || project day_ms = unix_millis(day), cnt
      || sort by day_ms asc""".stripMargin

  /** r10 datetime-part tier: Sunday-based startofweek, µs-precision
    * endof* boundaries, the dayofweek/week_of_year/hourofday/getmonth/
    * getyear/monthofyear extractors — the axis arithmetic every ADX
    * time dashboard leans on. Instants are compared cross-engine in
    * epoch-millis (the events-table convention). */
  val kqlDatetimePartsText: String =
    """Events
      || extend sow = unix_millis(startofweek(ts)), eod = unix_millis(endofday(ts)),
      |         eom = unix_millis(endofmonth(ts)), dw = dayofweek(ts),
      |         wy = week_of_year(ts), hh = hourofday(ts),
      |         mo = getmonth(ts), yy = getyear(ts)
      || summarize n = count() by sow, eod, eom, dw, wy, hh, mo, yy
      || sort by sow asc, eod asc, hh asc""".stripMargin

  /** r10 string tier: ADX 0-based substring/indexof (a Spark
    * pass-through would silently shift every index by one), strrep
    * with delimiter, and the base64 round trip. `hash()` (xxhash64) is
    * deliberately absent — its bit values are engine-specific, so it
    * is pinned by KqlSpec, not the cross-engine oracle. */
  val kqlStringFuncsText: String =
    """Orders
      || extend head3 = substring(city, 0, 3), tail = substring(city, 4),
      |         pos = toint(indexof(city, 'e')), pos2 = toint(indexof(city, 'e', 2)),
      |         rep = strrep(substring(city, 0, 2), 2, '-'),
      |         b64 = base64_encode_tostring(city),
      |         rt = base64_decode_tostring(base64_encode_tostring(city))
      || summarize n = count() by head3, tail, pos, pos2, rep, b64, rt
      || sort by head3 asc, tail asc""".stripMargin

  /** r10 `evaluate autocluster` — the ADX segment-mining plugin as a
    * deterministic Spark cube over the projected attribute columns
    * (NULL = wildcard), filtered to ≥5 % coverage. The derived bands
    * keep the cube bounded and give patterns at several granularities. */
  val kqlAutoclusterText: String =
    """Events
      || extend vband = bin(value, 100), hot = value >= 400
      || project event_type, vband, hot
      || evaluate autocluster(0.05)
      || sort by pct desc, event_type asc, vband asc, hot asc""".stripMargin

  /** r11 `evaluate basket` — ADX's frequent-pattern plugin as
    * deterministic level-wise Apriori (documented deviations at the
    * verb: string-valued output, exhaustive enumeration). The oracle is
    * the cube-threshold formulation, equal by Apriori's anti-monotone
    * support guarantee; the level-join mechanics are pinned against the
    * cube in `KqlSpec`. */
  /** r11 `parse_xml` — the last `parse_*` sibling: flat-leaf XML into
    * a {root: {leaf: text}} VARIANT bag (subset deviation documented at
    * the parser case), consumed through the same dotted access the
    * json bags use; non-XML input yields a null bag and null fields. */
  val kqlParseXmlText: String =
    """let X = datatable(x:string)[
      |  '<conf><port>8080</port><host>db-1</host><mode>rw</mode></conf>',
      |  '<doc><title>Spark</title><lang>en</lang></doc>',
      |  'not xml'
      |];
      |X
      || extend p = parse_xml(x)
      || extend port = tostring(p.conf.port), host = tostring(p.conf.host), title = tostring(p.doc.title)
      || project x, port, host, title
      || sort by x asc""".stripMargin

  /** r11 `series_decompose_forecast` — the forecasting sibling of the
    * decompose tier: fit the 23-day prefix, project the trend over the
    * whole 30-day axis (the 7-day horizon included), ADX's output
    * convention. Serialized as floor(x·10⁶) micro-units over the
    * bit-identical single-rounded chain (count sums exact, one
    * division, one multiply-add per point). */
  val kqlSeriesForecastText: String =
    """Events
      || make-series n = count() on ts from datetime(2024-01-01) to datetime(2024-01-31) step 1d by event_type
      || extend f = series_decompose_forecast(n, 7)
      || extend fc = array_join(transform(f, x -> string(tolong(floor(x * 1000000.0, 1)))), ',')
      || project event_type, fc
      || sort by event_type asc""".stripMargin

  /** r11 geo scalar tier — geohash cell binning (pure integer
    * bit-interleave, bit-identical cross-engine), haversine distance
    * (mean sphere, deviation documented at the parser), and circle
    * membership, over a datatable spanning the edge cases (antimeridian
    * neighbors, the north pole, an invalid longitude). Distances ship
    * as floor(meters) BIGINT — the trig chain is mirrored op-for-op, so
    * engines agree to the last ulp of their libm and the meter floor
    * sits ~10⁹ ulps from any boundary for these fixed points. */
  val kqlGeoText: String =
    """let P = datatable(name:string, lon:real, lat:real)[
      |  'osl', 10.75, 59.91,
      |  'cph', 12.57, 55.69,
      |  'rey', -21.94, 64.15,
      |  'syd', 151.21, -33.87,
      |  'fij', 178.44, -18.14,
      |  'sam', -170.70, -14.27,
      |  'npole', 0.0, 90.0,
      |  'bad', 200.0, 10.0
      |];
      |P
      || extend gh = geo_point_to_geohash(lon, lat, 6),
      |         gh1 = geo_point_to_geohash(lon, lat, 1),
      |         d_osl_m = tolong(floor(geo_distance_2points(lon, lat, 10.75, 59.91), 1)),
      |         near_cph = geo_point_in_circle(lon, lat, 12.57, 55.69, 700000.0)
      || project name, gh, gh1, d_osl_m, near_cph
      || sort by name asc""".stripMargin

  /** r15 `geo_geohash_to_polygon` — the cell rectangle as GeoJSON
    * VARIANT, composed end-to-end: encode → polygon → corner reads
    * through variant subscript paths → containment check. The oracle
    * replays the acc-6 integer interleave (the kql_geo chain), takes
    * the rect edges from the same dyadic arithmetic, and re-derives
    * containment as the (integer-exact) open-interval test a point
    * strictly inside a rectangle satisfies. */
  val kqlGeoPolygons2Text: String =
    """let P = datatable(name:string, lon:real, lat:real)[
      |  'osl', 10.75, 59.91,
      |  'syd', 151.21, -33.87,
      |  'sam', -170.70, -14.27,
      |  'equ', 0.02, -0.01
      |];
      |P
      || extend gh = geo_point_to_geohash(lon, lat, 6)
      || extend poly = geo_geohash_to_polygon(gh)
      || extend inpt = tolong(iff(geo_point_in_polygon(lon, lat, poly), 1, 0)),
      |         w_u = tolong(floor(todouble(poly.coordinates[0][0][0]) * 1000000.0, 1)),
      |         s_u = tolong(floor(todouble(poly.coordinates[0][0][1]) * 1000000.0, 1)),
      |         e_u = tolong(floor(todouble(poly.coordinates[0][2][0]) * 1000000.0, 1)),
      |         n_u = tolong(floor(todouble(poly.coordinates[0][2][1]) * 1000000.0, 1))
      || project name, gh, inpt, w_u, s_u, e_u, n_u
      || sort by name asc""".stripMargin

  /** r12 datetime/timespan/binary scalar tier: `totimespan` /
    * `make_timespan` / `format_timespan` (timespan VALUES surface as
    * BIGINT seconds — the bin() convention, documented),
    * `datetime_part`, `make_datetime`, the `unixtime_*_todatetime`
    * family, and the `binary_*` bit-operator names. Every output is
    * BIGINT/STRING (datetimes projected to epoch seconds via
    * datetime_diff), so the oracle compare has no float or timestamp
    * serialization surface at all. */
  val kqlDatetimeScalarsText: String =
    """print d = datetime(2024-03-15 10:20:30)
      || extend part_y = datetime_part('year', d),
      |         part_q = datetime_part('quarter', d),
      |         part_w = datetime_part('week_of_year', d),
      |         md_epoch = datetime_diff('second', make_datetime(2024, 3, 15, 10, 20, 30), datetime(1970-01-01)),
      |         us_epoch = datetime_diff('second', unixtime_seconds_todatetime(1700000000), datetime(1970-01-01)),
      |         ums_epoch = datetime_diff('second', unixtime_milliseconds_todatetime(1700000000000), datetime(1970-01-01)),
      |         uus_epoch = datetime_diff('second', unixtime_microseconds_todatetime(1700000000000000), datetime(1970-01-01)),
      |         ts1 = totimespan('1.02:03:04'), ts2 = totimespan(90m),
      |         mts = make_timespan(1, 2, 3, 4),
      |         f1 = format_timespan(totimespan('1.02:03:04'), 'd.hh:mm:ss'),
      |         f2 = format_timespan(3661, 'hh:mm:ss'),
      |         ba = binary_and(12, 10), bo = binary_or(12, 10),
      |         bx = binary_xor(12, 10), bn = binary_not(0),
      |         bsl = binary_shift_left(3, 4), bsr = binary_shift_right(48, 4)
      || project part_y, part_q, part_w, md_epoch, us_epoch, ums_epoch,
      |          uus_epoch, ts1, ts2, mts, f1, f2, ba, bo, bx, bn, bsl, bsr""".stripMargin

  /** r12 string-function tier: `replace_string`/`replace_regex` (the
    * ADX names for literal/regex replace), `indexof_regex` (0-based,
    * −1 absent — one shift off Spark's regexp_instr), `string_size`
    * (BYTES, not chars), and `countof(…, 'regex')` (non-overlapping
    * match count). Aggregated per lang so every function's value on
    * every document feeds the hash. */
  val kqlStringFns2Text: String =
    """Documents
      || extend b = string_size(text),
      |         nl = countof(text, 'e'),
      |         nr = countof(text, '[aeiou]+', 'regex'),
      |         ir = indexof_regex(text, '[0-9]'),
      |         rs = replace_string(lang, 'en', 'EN'),
      |         rr = strlen(replace_regex(text, '[aeiou]', ''))
      || summarize docs = count(), tb = sum(b), tnl = sum(nl),
      |            tnr = sum(nr), neg = countif(ir == -1), sir = sum(ir),
      |            rsn = countif(rs == 'EN'), trr = sum(rr) by lang""".stripMargin

  /** r12 `pack_all()` — the whole-row property bag (extend-time
    * desugar to bag_pack over the frame's current columns). The query
    * round-trips every field back out of the bag and counts
    * mismatches, so the oracle is the trivial all-match count — any
    * key loss, ordering drift, or value corruption breaks it. */
  val kqlPackAllText: String =
    """Orders
      || project city, orderid
      || extend b = pack_all()
      || extend ks = strcat_array(bag_keys(b), ','),
      |         c2 = tostring(b.city), o2 = tolong(b.orderid)
      || summarize n = count(), ok_c = countif(c2 == city),
      |            ok_o = countif(o2 == orderid) by ks""".stripMargin

  /** r12 S2 cell tier (r11 verdict item 5): `geo_point_to_s2cell` /
    * `geo_s2cell_to_central_point` / `geo_s2cell_neighbors` — the
    * second cell system over the same integer-exact cell-join
    * backbone as geohash (deviations documented at
    * [[graft.functions.S2]]: Morton intra-face order, compact
    * self-describing hex token; neighbors wrap across faces as of
    * r13). The vector set
    * hits all six faces plus an invalid point; center coordinates
    * floor to micro-degrees; the DuckDB oracle re-derives the whole
    * face→uv→st→quantize→Morton chain step by step in CTE columns. */
  val kqlGeoS2Text: String =
    """let P = datatable(name:string, lon:real, lat:real)[
      |  'gw', 0.0, 0.0,
      |  'paris', 2.35, 48.86,
      |  'e90', 90.0, 10.0,
      |  'npole', 20.0, 80.0,
      |  'w179', 179.5, -5.0,
      |  'wneg', -90.0, -10.0,
      |  'spole', 100.0, -80.0,
      |  'syd', 151.21, -33.87,
      |  'bad', 200.0, 10.0
      |];
      |P
      || extend c7 = geo_point_to_s2cell(lon, lat, 7),
      |         c11 = geo_point_to_s2cell(lon, lat)
      || extend ctr = geo_s2cell_to_central_point(c7)
      || extend clon = tolong(floor(ctr.coordinates[0] * 1000000.0, 1)),
      |         clat = tolong(floor(ctr.coordinates[1] * 1000000.0, 1)),
      |         nnb = tolong(array_length(geo_s2cell_neighbors(c7)))
      || project name, c7, c11, clon, clat, nnb
      || sort by name asc""".stripMargin

  /** r14 H3 cell tier (r13 verdict item 3): `geo_point_to_h3cell` /
    * `geo_h3cell_to_central_point` / `geo_h3cell_neighbors` — the
    * THIRD cell system over the integer-exact cell-join backbone:
    * icosahedral hexagons (lowest shape distortion of the three,
    * 6-fold neighbor symmetry). Deviations documented at
    * [[graft.functions.H3]]: direct (res, face, q, r) token (no
    * aperture-7 digit path / inter-resolution rotation), clipped edge
    * cells instead of pentagons, cross-face neighbor wrap by
    * re-encoding the virtual neighbor center. The vector set spans
    * eight faces plus the north pole (which lies ON a face edge —
    * ties break to the lowest face id), a face-edge equator point
    * ('gw', whose 6-neighborhood wraps across faces), and an invalid
    * point; center coordinates floor to micro-degrees; the DuckDB
    * oracle re-derives the WHOLE chain step by step in CTE columns —
    * icosahedron vertices from phi, face frames (center + in-plane
    * orthonormal basis), nearest-face argmax, gnomonic projection,
    * axial hex coordinates, cube rounding, bit-packing — and the
    * neighbor/ring counts by re-running that chain on all 19 ring-0/1/2
    * virtual centers with the inner-ring-wins dedupe re-derived as a
    * MIN(ring) grouping (the cross-face wrap independently re-derived,
    * not trusted). r0ok pins the edge-cell ring-0 convention: ring 0 is
    * the RE-ENCODED own center, which for a cell straddling a face
    * boundary may differ from the cell itself. */
  val kqlGeoH3Text: String =
    """let P = datatable(name:string, lon:real, lat:real)[
      |  'equ', -20.905, 0.0,
      |  'gw', 0.0, 0.0,
      |  'paris', 2.35, 48.86,
      |  'syd', 151.21, -33.87,
      |  'npole', 20.0, 90.0,
      |  'rio', -43.2, -22.9,
      |  'tok', 139.7, 35.7,
      |  'cpt', 18.4, -33.9,
      |  'bad', 200.0, 10.0
      |];
      |P
      || extend c5 = geo_point_to_h3cell(lon, lat, 5),
      |         cd = geo_point_to_h3cell(lon, lat)
      || extend ctr = geo_h3cell_to_central_point(c5)
      || extend clon = tolong(floor(ctr.coordinates[0] * 1000000.0, 1)),
      |         clat = tolong(floor(ctr.coordinates[1] * 1000000.0, 1)),
      |         nnb = tolong(array_length(geo_h3cell_neighbors(c5))),
      |         rings = geo_h3cell_rings(c5, 2)
      || extend nr1 = tolong(array_length(rings[1])),
      |         nr2 = tolong(array_length(rings[2])),
      |         r0ok = tolong(iff(tostring(rings[0][0]) == c5, 1, 0) + (nnb - nnb)),
      |         p4 = geo_h3cell_parent(c5),
      |         lvl = tolong(geo_h3cell_level(c5))
      || project name, c5, cd, clon, clat, nnb, nr1, nr2, r0ok, p4, lvl
      || sort by name asc""".stripMargin

  /** r15 `geo_h3cell_to_polygon` — the hex boundary as GeoJSON
    * VARIANT (H3.boundaryOf: 6 pointy-top corners, exact ±√3/2 / ±½
    * offsets in the owning face's gnomonic plane, the center's
    * inverse atan2 chain per corner, closing vertex repeated). Four
    * mid/equatorial cells away from the antimeridian (a wrapped ring
    * is not a planar lon/lat polygon — documented); the oracle
    * replays encode → corner offsets → inverse projection in DuckDB
    * (the kql_geo_h3 frames chain) and pins the center-containment
    * and ring closure as construction facts. */
  val kqlGeoH3Polygon2Text: String =
    """let P = datatable(name:string, lon:real, lat:real)[
      |  'equ', -20.905, 0.0,
      |  'paris', 2.35, 48.86,
      |  'rio', -43.2, -22.9,
      |  'tok', 139.7, 35.7
      |];
      |P
      || extend tok4 = geo_point_to_h3cell(lon, lat, 4)
      || extend hp = geo_h3cell_to_polygon(tok4), hc = geo_h3cell_to_central_point(tok4)
      || extend inpt = tolong(iff(geo_point_in_polygon(todouble(hc.coordinates[0]), todouble(hc.coordinates[1]), hp), 1, 0)),
      |         c0x_u = tolong(floor(todouble(hp.coordinates[0][0][0]) * 1000000.0, 1)),
      |         c0y_u = tolong(floor(todouble(hp.coordinates[0][0][1]) * 1000000.0, 1)),
      |         c3x_u = tolong(floor(todouble(hp.coordinates[0][3][0]) * 1000000.0, 1)),
      |         c3y_u = tolong(floor(todouble(hp.coordinates[0][3][1]) * 1000000.0, 1)),
      |         closed = tolong(iff(todouble(hp.coordinates[0][6][0]) == todouble(hp.coordinates[0][0][0])
      |                             and todouble(hp.coordinates[0][6][1]) == todouble(hp.coordinates[0][0][1]), 1, 0))
      || project name, tok4, inpt, c0x_u, c0y_u, c3x_u, c3y_u, closed
      || sort by name asc""".stripMargin

  /** r14 H3 CELL JOIN — the bounded-fan-out spatial-join shape of
    * [[kqlGeoS2JoinText]] keyed on H3-style hex cells: points carry
    * their res-3 cell, sites fan out to cell ∪ 6-neighborhood, the
    * exact circle test verifies candidates. Coverage argument (hex
    * lattice, 1-ring): a site in cell C and a point within R can only
    * land in a non-neighbor cell X if |center(C)−center(X)| ≥ 3·size,
    * but that distance is ≤ 2·size + R_plane, so R_plane < size
    * suffices; res-3 size = 0.35/√7³ ≈ 0.0189 rad ≈ 120 km ≫
    * R_plane ≤ 1.05·40 km (gnomonic scale ≤ 1/cos² 12° over the data
    * window). The window (lon ∈ [−29, −13), lat ∈ [−8, 8)) keeps
    * every point ≥ 8.6° inside face 17 (inradius 20.07°), so all
    * cells live on ONE hex lattice and the planar argument is exact.
    * The oracle is the INDEPENDENT cross-join + haversine formulation
    * — zero H3 arithmetic — so a missed within-R pair fails the
    * compare. */
  val kqlGeoH3JoinText: String =
    """let Sites = datatable(site:string, slon:real, slat:real)[
      |  'ana', -27.5, -6.2,
      |  'bor', -24.0, 3.1,
      |  'cen', -20.9, 0.0,
      |  'dor', -16.3, 5.4,
      |  'eri', -14.2, -4.8
      |];
      |Orders
      || extend lon = todouble(orderid % 1600) / 100.0 - 29.0, lat = todouble(custid % 1000) / 62.5 - 8.0
      || extend cell = geo_point_to_h3cell(lon, lat, 3)
      || join kind=inner (
      |    Sites
      |    | extend cells = array_concat(pack_array(geo_point_to_h3cell(slon, slat, 3)),
      |        geo_h3cell_neighbors(geo_point_to_h3cell(slon, slat, 3)))
      |    | mv-expand cell = cells to typeof(string)
      |  ) on cell
      || where geo_point_in_circle(lon, lat, slon, slat, 40000.0)
      || summarize n = count(),
      |    d_min_m = min(tolong(floor(geo_distance_2points(lon, lat, slon, slat), 1))),
      |    d_max_m = max(tolong(floor(geo_distance_2points(lon, lat, slon, slat), 1))) by site
      || sort by site asc""".stripMargin

  /** r14 `geo_polygon_to_h3cells` + the H3 polygon-fence join — the
    * hex sibling of [[kqlGeoPolygonJoinText]]: the non-convex fence
    * fans to its res-3 hex cell cover (complete by construction
    * within a face — see [[graft.functions.H3.polygonCover]]; this
    * fence sits ≥ 9° inside face 17, so the formal bound applies),
    * points key by their cell, the equi-join proposes candidates, the
    * exact even-odd test verifies. Oracle: the INDEPENDENT all-points
    * crossing-count formulation — zero H3 arithmetic — so a cover
    * miss drops a join hit and fails the compare. */
  val kqlGeoH3PolygonJoinText: String =
    """let poly = parse_json('{"type":"Polygon","coordinates":[[[-27.0,-5.0],[-20.0,-6.5],[-15.0,-2.0],[-19.0,1.5],[-16.0,5.0],[-24.0,6.0],[-22.0,0.5],[-27.0,-5.0]]]}');
      |Orders
      || extend lon = todouble(orderid % 1600) / 100.0 - 29.0, lat = todouble(custid % 1000) / 62.5 - 8.0
      || extend cell = geo_point_to_h3cell(lon, lat, 3)
      || join kind=inner (
      |    datatable(fence:string)['hex']
      |    | extend cells = geo_polygon_to_h3cells(poly, 3)
      |    | mv-expand cell = cells to typeof(string)
      |  ) on cell
      || where geo_point_in_polygon(lon, lat, poly)
      || summarize n = count(), lon_min_u = min(tolong(floor(lon * 1000000.0, 1))),
      |            lat_max_u = max(tolong(floor(lat * 1000000.0, 1))) by city
      || sort by city asc""".stripMargin

  /** r14 `geo_line_to_h3cells` + the H3 route-corridor join — the hex
    * sibling of [[kqlGeoLineJoinText]]: the 3-segment route fans to
    * its res-3 hex cover plus one neighbor ring, points key by their
    * cell, the exact equirectangular point-to-segment distance
    * verifies. Coverage: R_plane ≤ 1.05·25 km ≈ 0.004 rad < size =
    * 0.0189 rad (the hex 1-ring bound — see the site join's argument),
    * and the whole route sits ≥ 9° inside face 17 so the cover's
    * formal completeness regime applies. Route as a DIM COLUMN (the
    * r13 corridor lesson: a constant route lets Catalyst push the
    * verify below the join onto every point). Oracle: the INDEPENDENT
    * all-points distance formulation, mirrored op-for-op. */
  val kqlGeoH3LineJoinText: String =
    """Orders
      || extend lon = todouble(orderid % 1600) / 100.0 - 29.0, lat = todouble(custid % 1000) / 62.5 - 8.0
      || extend cell = geo_point_to_h3cell(lon, lat, 3)
      || join kind=inner (
      |    datatable(route_id:string, line:string)[
      |      'r1', '{"type":"LineString","coordinates":[[-27.0,-6.0],[-22.0,-1.0],[-18.0,1.0],[-15.5,6.0]]}']
      |    | extend c0s = geo_line_to_h3cells(todynamic(line), 3)
      |    | mv-expand c0 = c0s to typeof(string)
      |    | extend cells = array_concat(pack_array(c0), geo_h3cell_neighbors(c0))
      |    | mv-expand cell = cells to typeof(string)
      |    | distinct cell, line
      |  ) on cell
      || extend d_m = geo_distance_point_to_line(lon, lat, todynamic(line))
      || where d_m <= 25000.0
      || summarize n = count(),
      |    d_min_m = min(tolong(floor(d_m, 1))),
      |    d_max_m = max(tolong(floor(d_m, 1))) by city
      || sort by city asc""".stripMargin

  /** r12 S2 CELL JOIN — the same bounded-fan-out spatial-join shape as
    * [[kqlGeoJoinText]] but keyed on S2 cells: points carry their
    * level-7 cell, sites fan out to cell ∪ 8-neighborhood (cross-face
    * wrapped as of r13), and
    * the exact circle test verifies candidates. Coverage: level-7
    * cells span ≈0.7° of arc in each face direction (the quadratic ST
    * transform equalizes them; min metric span over this window
    * ≈55 km) ≥ R = 40 km, and the data window (lon ∈ [−30, 30),
    * lat ∈ [5, 33)) keeps every point ≥ 7° inside face 0 (face
    * boundaries are additionally covered by the r13 cross-face
    * neighbor wrap). The oracle is the INDEPENDENT
    * cross-join + haversine formulation — zero S2 arithmetic — so a
    * missed within-R pair fails the compare. */
  val kqlGeoS2JoinText: String =
    """let Sites = datatable(site:string, slon:real, slat:real)[
      |  'dak', -17.45, 14.69,
      |  'abj', -4.02, 5.35,
      |  'cai', 30.0, 30.0,
      |  'rjd', 21.5, 24.0,
      |  'nia', 2.1, 13.5
      |];
      |Orders
      || extend lon = todouble(orderid % 6000) / 100.0 - 30.0, lat = 5.0 + todouble(custid % 1400) / 50.0
      || extend cell = geo_point_to_s2cell(lon, lat, 7)
      || join kind=inner (
      |    Sites
      |    | extend cells = array_concat(pack_array(geo_point_to_s2cell(slon, slat, 7)),
      |        geo_s2cell_neighbors(geo_point_to_s2cell(slon, slat, 7)))
      |    | mv-expand cell = cells to typeof(string)
      |  ) on cell
      || where geo_point_in_circle(lon, lat, slon, slat, 40000.0)
      || summarize n = count(),
      |    d_min_m = min(tolong(floor(geo_distance_2points(lon, lat, slon, slat), 1))),
      |    d_max_m = max(tolong(floor(geo_distance_2points(lon, lat, slon, slat), 1))) by site
      || sort by site asc""".stripMargin

  /** r11 `series_fit_2lines[_dynamic]` — the segmented-regression
    * sibling of series_fit_line: best single breakpoint by total RSS
    * over the zero-filled daily count series, each side fit on its
    * local index axis. Integer-valued series make every sum an exact
    * integer in double; the oracle mirrors the division chain
    * op-for-op and the (rss, sp) tie order, so all outputs are
    * bit-stable micro-units. */
  val kqlSeriesFit2Text: String =
    """Events
      || make-series n = count() on ts from datetime(2024-01-01) to datetime(2024-01-31) step 1d by event_type
      || extend f = series_fit_2lines_dynamic(n)
      || extend split_idx = f.split_idx,
      |    rsq_u = tolong(floor(f.rsquare * 1000000.0, 1)),
      |    var_u = tolong(floor(f.variance * 1000000.0, 1)),
      |    rvar_u = tolong(floor(f.rvariance * 1000000.0, 1)),
      |    sl_l_u = tolong(floor(f.left.slope * 1000000.0, 1)),
      |    ic_l_u = tolong(floor(f.left.interception * 1000000.0, 1)),
      |    sl_r_u = tolong(floor(f.right.slope * 1000000.0, 1)),
      |    ic_r_u = tolong(floor(f.right.interception * 1000000.0, 1)),
      |    fc = array_join(transform(f.line_fit, x -> string(tolong(floor(x * 1000000.0, 1)))), ',')
      || project event_type, split_idx, rsq_u, var_u, rvar_u, sl_l_u, ic_l_u, sl_r_u, ic_r_u, fc
      || sort by event_type asc""".stripMargin

  /** r14 `series_fit_poly[_dynamic]` (r13 verdict item 5) — the
    * degree-k least-squares sibling of series_fit_line: Cramer's rule
    * on the normal equations of exact-integer power/moment sums over
    * the zero-filled daily count series (degree 2 here). Every sum is
    * an exact integer (order-independent cross-engine); the oracle
    * mirrors the determinant cofactor expansion and every division
    * chain op-for-op, so all micro-unit outputs are bit-stable.
    * Coefficients render highest power first (ADX's order). */
  val kqlSeriesFitPolyText: String =
    """Events
      || make-series n = count() on ts from datetime(2024-01-01) to datetime(2024-01-31) step 1d by event_type
      || extend f = series_fit_poly_dynamic(n, 2)
      || extend rsq_u = tolong(floor(f.rsquare * 1000000.0, 1)),
      |    var_u = tolong(floor(f.variance * 1000000.0, 1)),
      |    rvar_u = tolong(floor(f.rvariance * 1000000.0, 1)),
      |    c2_u = tolong(floor(f.coefficients[0] * 1000000.0, 1)),
      |    c1_u = tolong(floor(f.coefficients[1] * 1000000.0, 1)),
      |    c0_u = tolong(floor(f.coefficients[2] * 1000000.0, 1)),
      |    fc = array_join(transform(f.poly_fit, x -> string(tolong(floor(x * 1000000.0, 1)))), ',')
      || project event_type, rsq_u, var_u, rvar_u, c2_u, c1_u, c0_u, fc
      || sort by event_type asc""".stripMargin

  /** r14 `series_fft` — the DFT of the zero-filled daily count series
    * (micro-floored re/im per coefficient). The oracle re-derives the
    * O(n²) direct sum with the SAME left-fold order (DuckDB
    * list_reduce over an indexed list_transform) and the same angle
    * chain op-for-op; pi() is bit-identical on both engines, cos/sin
    * carry the geo tier's last-ulp caveat. `series_ifft`'s roundtrip
    * is spec-pinned (KqlSpec) rather than oracled: ifft(fft(x))
    * recovers x only to float error, which micro-flooring cannot
    * stabilize at grid points. */
  val kqlSeriesFftText: String =
    """Events
      || make-series n = count() on ts from datetime(2024-01-01) to datetime(2024-01-31) step 1d by event_type
      || extend f = series_fft(n)
      || extend re_s = array_join(transform(f.re, x -> string(tolong(floor(x * 1000000.0, 1)))), ','),
      |    im_s = array_join(transform(f.im, x -> string(tolong(floor(x * 1000000.0, 1)))), ',')
      || project event_type, re_s, im_s
      || sort by event_type asc""".stripMargin

  /** r11 series fill family — forward / backwards / linear over a
    * SPARSE daily avg series (value ≥ 300 leaves ~85 % of the bins
    * null, including leading and trailing gaps, so every edge
    * convention executes). avg(user_id) keeps sums exact-integer; the
    * linear interpolation's single division is mirrored op-for-op;
    * null bins render as an explicit 'n' token on both engines. */
  val kqlSeriesFillText: String =
    """Events
      || where value >= 300
      || make-series a = avg(user_id) default = null on ts from datetime(2024-01-01) to datetime(2024-01-31) step 1d by event_type
      || extend sf = series_fill_forward(a), sb = series_fill_backwards(a), sl = series_fill_linear(a)
      || extend raw = array_join(transform(a, x -> coalesce(string(tolong(floor(x * 1000000.0, 1))), 'n')), ','),
      |    f_fwd = array_join(transform(sf, x -> coalesce(string(tolong(floor(x * 1000000.0, 1))), 'n')), ','),
      |    f_bwd = array_join(transform(sb, x -> coalesce(string(tolong(floor(x * 1000000.0, 1))), 'n')), ','),
      |    f_lin = array_join(transform(sl, x -> coalesce(string(tolong(floor(x * 1000000.0, 1))), 'n')), ',')
      || project event_type, raw, f_fwd, f_bwd, f_lin
      || sort by event_type asc""".stripMargin

  /** r11 geo CELL JOIN — the scale path for "points within R of a
    * site": points carry their geohash-3 cell, sites fan out to their
    * cell ∪ 8 neighbors (`geo_geohash_neighbors`), and the candidate
    * set is a plain broadcast equi-join on the cell key, verified with
    * the exact circle test. Coverage is guaranteed because R = 75 km ≤
    * the minimum geohash-3 cell span over the data's latitude band:
    * lat = 40 + (custid % 1000)/50 tops out at 59.98°N, where the
    * geohash-3 lon cell span is ~78.3 km (lat span 156 km everywhere) —
    * a ~4% margin over R, so shrink the band or grow R and this
    * guarantee must be re-derived. Hence the all-pairs
    * distance join never happens — at 100 TB the cost is one bounded
    * 9× fan-out of the TINY site dim plus one equi-join at scan speed.
    * The oracle is deliberately the INDEPENDENT formulation (cross join
    * + distance filter, no geohash arithmetic): if the neighbor cells
    * missed any within-R pair, the counts would not match. Point
    * coordinates derive from order ids with exact integer/decimal
    * arithmetic; distances floor to whole meters (micro-unit class). */
  val kqlGeoJoinText: String =
    """let Sites = datatable(site:string, slon:real, slat:real)[
      |  'ams', 4.9, 52.37,
      |  'ber', 13.4, 52.52,
      |  'lhr', -0.13, 51.51,
      |  'cdg', 2.35, 48.86,
      |  'muc', 11.58, 48.14,
      |  'edi', -3.19, 55.95
      |];
      |Orders
      || extend lon = todouble(orderid % 4000) / 100.0 - 20.0, lat = 40.0 + todouble(custid % 1000) / 50.0
      || extend cell = geo_point_to_geohash(lon, lat, 3)
      || join kind=inner (
      |    Sites
      |    | extend cells = array_concat(pack_array(geo_point_to_geohash(slon, slat, 3)),
      |        geo_geohash_neighbors(geo_point_to_geohash(slon, slat, 3)))
      |    | mv-expand cell = cells to typeof(string)
      |  ) on cell
      || where geo_point_in_circle(lon, lat, slon, slat, 75000.0)
      || summarize n = count(),
      |    d_min_m = min(tolong(floor(geo_distance_2points(lon, lat, slon, slat), 1))),
      |    d_max_m = max(tolong(floor(geo_distance_2points(lon, lat, slon, slat), 1))) by site
      || sort by site asc""".stripMargin

  /** r11 `parse_user_agent` — browser + OS family/version extraction
    * over a datatable of real-shaped UA strings (Edge/Chrome/Safari
    * ancestor-token masking, iOS underscore versions, an unknown).
    * The oracle mirrors the ordered regex cascade; no-match pins to
    * NULL via nullif on both engines. */
  val kqlParseUaText: String =
    """let U = datatable(ua:string)[
      |  'Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/124.0.0.0 Safari/537.36 Edg/124.0.2478.51',
      |  'Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/123.0.0.0 Safari/537.36',
      |  'Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.4 Safari/605.1.15',
      |  'Mozilla/5.0 (X11; Linux x86_64; rv:125.0) Gecko/20100101 Firefox/125.0',
      |  'Mozilla/5.0 (iPhone; CPU iPhone OS 17_4 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.4 Mobile/15E148 Safari/604.1',
      |  'Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/124.0.6367.82 Mobile Safari/537.36',
      |  'Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 OPR/106.0.0.0',
      |  'curl/8.5.0'
      |];
      |U
      || extend b = parse_user_agent(ua, 'browser'), o = parse_user_agent(ua, 'os')
      || project ua_tag = substring(ua, 0, 30),
      |    b_family = tostring(b.Browser.Family),
      |    b_major = tostring(b.Browser.MajorVersion),
      |    b_minor = tostring(b.Browser.MinorVersion),
      |    os_family = tostring(o.OperatingSystem.Family),
      |    os_major = tostring(o.OperatingSystem.MajorVersion)
      || sort by ua_tag asc""".stripMargin

  /** r11 `geo_point_in_polygon` — even-odd ray casting over a
    * NON-CONVEX GeoJSON ring (the dent at (0, 47.5) proves even-odd,
    * not winding/convex-hull), counted per city over the same derived
    * point field as `kql_geo_join`. The oracle hard-codes the ring as
    * an edge VALUES list and mirrors the crossing test's single
    * division op-for-op. */
  val kqlGeoPolygonText: String =
    """let poly = parse_json('{"type":"Polygon","coordinates":[[[-5.0,45.0],[5.0,43.0],[12.0,50.0],[0.0,47.5],[-8.0,52.0],[-5.0,45.0]]]}');
      |Orders
      || extend lon = todouble(orderid % 4000) / 100.0 - 20.0, lat = 40.0 + todouble(custid % 1000) / 50.0
      || extend inside = geo_point_in_polygon(lon, lat, poly)
      || summarize n_inside = countif(inside), n = count() by city
      || sort by city asc""".stripMargin

  /** r13 `geo_polygon_to_s2cells` + polygon-fence cell join (r12
    * verdict item 6 — the geo story beyond point-radius): the
    * NON-CONVEX dent ring from [[kqlGeoPolygonText]] fans out to its
    * level-7 cell cover (boundary-sampled + interior-lattice,
    * complete by construction — see [[graft.functions.S2.polygonCover]]),
    * points key by their cell, the equi-join proposes candidates, and
    * the exact even-odd test verifies. The oracle is the INDEPENDENT
    * all-points even-odd formulation — zero cell arithmetic — so a
    * cover miss (a dropped interior cell) fails the compare. */
  val kqlGeoPolygonJoinText: String =
    """let poly = parse_json('{"type":"Polygon","coordinates":[[[-5.0,45.0],[5.0,43.0],[12.0,50.0],[0.0,47.5],[-8.0,52.0],[-5.0,45.0]]]}');
      |Orders
      || extend lon = todouble(orderid % 4000) / 100.0 - 20.0, lat = 40.0 + todouble(custid % 1000) / 50.0
      || extend cell = geo_point_to_s2cell(lon, lat, 7)
      || join kind=inner (
      |    datatable(fence:string)['dent']
      |    | extend cells = geo_polygon_to_s2cells(poly, 7)
      |    | mv-expand cell = cells to typeof(string)
      |  ) on cell
      || where geo_point_in_polygon(lon, lat, poly)
      || summarize n = count(), lon_min_u = min(tolong(floor(lon * 1000000.0, 1))),
      |            lat_max_u = max(tolong(floor(lat * 1000000.0, 1))) by city
      || sort by city asc""".stripMargin

  /** r13 `geo_line_to_s2cells` + `geo_distance_point_to_line` — the
    * route-corridor join (the LineString sibling of the polygon
    * fence): the 4-segment route fans to its level-7 cell cover plus
    * one neighbor ring, points key by their cell, the equi-join
    * proposes candidates, the exact equirectangular point-to-segment
    * distance verifies (R = 25 km ≤ half the level-7 minimum cell
    * span over this window, and the cover is complete for cells
    * touching the line, so two dilation rings cannot miss a within-R
    * point). The route travels as a DIM COLUMN (the multi-route dim
    * shape, like the site join's slon/slat) deliberately: with a
    * constant route the verify filter references only point columns
    * and Catalyst pushes it below the join onto EVERY point — the
    * cell join then prunes nothing and the query measures 2.5 s vs
    * 1.2 s at sf0.1. Dim-column verify is the shape that scales to a
    * route fleet. Oracle: the INDEPENDENT all-points distance
    * formulation, mirrored op-for-op. */
  val kqlGeoLineJoinText: String =
    """Orders
      || extend lon = todouble(orderid % 6000) / 100.0 - 30.0, lat = 5.0 + todouble(custid % 1400) / 50.0
      || extend cell = geo_point_to_s2cell(lon, lat, 7)
      || join kind=inner (
      |    datatable(route_id:string, line:string)[
      |      'r1', '{"type":"LineString","coordinates":[[-15.0,10.0],[-5.0,14.0],[5.0,12.0],[15.0,20.0],[25.0,26.0]]}']
      |    | extend c0s = geo_line_to_s2cells(todynamic(line), 7)
      |    | mv-expand c0 = c0s to typeof(string)
      |    | extend cells = array_concat(pack_array(c0), geo_s2cell_neighbors(c0))
      |    | mv-expand cell = cells to typeof(string)
      |    | distinct cell, line
      |  ) on cell
      || extend d_m = geo_distance_point_to_line(lon, lat, todynamic(line))
      || where d_m <= 25000.0
      || summarize n = count(),
      |    d_min_m = min(tolong(floor(d_m, 1))),
      |    d_max_m = max(tolong(floor(d_m, 1))) by city
      || sort by city asc""".stripMargin

  /** r13 `make_bag` / `make_bag_if` — the dynamic-aggregate closer:
    * one merged property bag per customer from per-order bags. ADX
    * resolves key conflicts arbitrarily; this engine merges in
    * ascending canonical-JSON order with FIRST-wins per key
    * (bag_merge's convention in a reproducible order), which the
    * oracle replays as per-key min_by over the same strings (DuckDB
    * builds the identical '{"c":…,"kX":…}' serialization, so the
    * min-string row is the fold's first donor for each key). */
  val kqlMakeBagText: String =
    """Orders
      || extend b = iff(orderid % 2 == 0,
      |               bag_pack('c', city, 'even', amount),
      |               bag_pack('c', city, 'odd', amount))
      || summarize n = count(), bag = make_bag(b), bif = make_bag_if(b, orderid % 3 == 0) by custid
      || extend c = tostring(bag.c), ev = tolong(bag.even), od = tolong(bag.odd),
      |         nk = tolong(array_length(bag_keys(bag))),
      |         ic = tostring(bif.c), iev = tolong(bif.even), iod = tolong(bif.odd)
      || project custid, n, c, ev, od, nk, ic, iev, iod""".stripMargin

  /** r13 IPv6 scalar tier (`parse_ipv6`/`parse_ipv6_mask`/
    * `ipv6_compare`/`ipv6_is_match` as native codegen expressions —
    * see [[graft.functions.Ipv6]] for conventions) over RFC-vector
    * inputs: compressed/full/uppercase forms, the `::` gap, embedded
    * dotted-quad tails, plain-IPv4 mapping, and three malformed
    * shapes. The oracle is the hand-derived expected table — the same
    * spec-vector style as the geohash tests, stated independently. */
  val kqlIpv6Text: String =
    """datatable(name:string, ip:string)[
      |  'h1', '2001:db8::1', 'h2', '::1', 'h3', '::',
      |  'h4', 'fe80::204:61ff:fe9d:f156', 'h5', '::ffff:192.168.1.1',
      |  'h6', '192.168.1.50', 'h7', '2001:0DB8:0:0:1:0:0:1',
      |  'h8', 'not-an-ip', 'h9', '2001:db8::/32', 'h10', '1::2::3']
      || extend canon = parse_ipv6(ip), m48 = parse_ipv6_mask(ip, 48),
      |         cmp = ipv6_compare(ip, '2001:db8::1'),
      |         m32 = ipv6_is_match(ip, '2001:db8::ffff', 32)
      || project name, canon, m48, cmp, m32
      || sort by name asc""".stripMargin

  /** r11 `series_seasonal` — per-phase mean minus the series mean over
    * a 28-day axis (4 whole weeks, so phases balance and the component
    * zero-sums), weekly period 7. Exact integer phase sums; two
    * mirrored divisions; micro-floored. */
  val kqlSeriesSeasonalText: String =
    """Events
      || make-series n = count() on ts from datetime(2024-01-01) to datetime(2024-01-29) step 1d by event_type
      || extend se = series_seasonal(n, 7)
      || extend ss = array_join(transform(se, x -> string(tolong(floor(x * 1000000.0, 1)))), ',')
      || project event_type, ss
      || sort by event_type asc""".stripMargin

  /** r11 seasonal `series_decompose(series, period)` — additive
    * independent components (trend = raw-series moving average,
    * seasonal = per-phase mean − series mean; deviation from STL's
    * sequential detrending documented at the parser): every element is
    * a fixed-order chain of single-rounded divisions over exact
    * integer sums, so baseline and residual are cross-engine exact. */
  val kqlSeriesDecomposeSeasonalText: String =
    """Events
      || make-series n = count() on ts from datetime(2024-01-01) to datetime(2024-01-29) step 1d by event_type
      || extend d = series_decompose(n, 7)
      || extend bl = array_join(transform(d.baseline, x -> string(tolong(floor(x * 1000000.0, 1)))), ','),
      |    rs = array_join(transform(d.residual, x -> string(tolong(floor(x * 1000000.0, 1)))), ',')
      || project event_type, bl, rs
      || sort by event_type asc""".stripMargin

  /** r11 `format_bytes` — 1024-tier byte rendering (truncating
    * fraction, documented deviation), every tier and both precisions
    * exercised, negative → null. */
  val kqlFormatBytesText: String =
    """let S = datatable(v:long)[ 0, 500, 1023, 1024, 1536, 1048576, 5368709120, 1099511627776, 2251799813685248, 2305843009213693952, -7 ];
      |S
      || project v, p0 = format_bytes(v), p2 = format_bytes(v, 2)
      || sort by v asc""".stripMargin

  /** r11 bag utilities — bag_keys (sorted, documented determinism
    * choice), top-level bag_has_key, and bag_merge (first wins on
    * conflicts) over object/array/null-valued inputs; outputs avoid
    * multi-key nested objects so JSON key order cannot drift. */
  val kqlBagOpsText: String =
    """let B = datatable(j1:string, j2:string)[
      |  '{"a":1,"b":{"x":true},"c":"s"}', '{"b":99,"d":[1,2]}',
      |  '{"k":null}', '{"k":7,"m":"z"}',
      |  '[1,2,3]', '{"only":1}'
      |];
      |B
      || extend b1 = parse_json(j1), b2 = parse_json(j2)
      || extend m = bag_merge(b1, b2)
      || project keys1 = strcat_array(bag_keys(b1), ','),
      |    has_b = bag_has_key(b1, 'b'), has_zz = bag_has_key(b1, 'zz'),
      |    mkeys = strcat_array(bag_keys(m), ','),
      |    m_b = tostring(m.b), m_d = tostring(m.d), m_m = tostring(m.m)
      || sort by keys1 asc""".stripMargin

  /** r14 `evaluate preview(N)` — ADX's two-table sample+count plugin
    * folded into one frame: the first N rows in the total ordering of
    * all columns (deterministic, TakeOrderedAndProject — no global
    * sort shuffle) plus a constant `preview_total` column via the
    * broadcast grand-total idiom. Deviations at the parser. */
  val kqlPreviewText: String =
    """Orders
      || project orderid, city
      || evaluate preview(7)
      || sort by orderid asc""".stripMargin

  /** r14 dynamic-bag tier 2 (r13 verdict item 4): `bag_remove_keys` /
    * `bag_set_key` / `mv-expand bagexpansion=bag`. The pipeline packs
    * a 4-key bag per order (keys deliberately NOT in sorted order),
    * removes two keys, upserts one existing key and one new key, then
    * bag-expands one row per property WITH its position — so the
    * engine's documented deterministic key order (CANONICAL
    * sorted-key, the VARIANT encoding's field order; ADX leaves bag
    * order unspecified) is itself under oracle: oid was packed first
    * but city must expand at position 0. The oracle is INDEPENDENT: a
    * plain UNION ALL re-derivation of the three (key, position,
    * value) streams with zero bag arithmetic. */
  val kqlBagOps2Text: String =
    """Orders
      || where orderid < 500
      || extend b = bag_pack('oid', orderid, 'drop1', amount, 'city', city, 'drop2', 'zz')
      || extend b2 = bag_set_key(bag_remove_keys(b, pack_array('drop1', 'drop2')), 'parity', orderid % 2)
      || extend b3 = bag_set_key(b2, 'city', strcat(city, '!'))
      || mv-expand with_itemindex=ix bagexpansion=bag kv = b3
      || extend k = strcat_array(bag_keys(kv), ','), ix = tolong(ix)
      || extend v = iff(k == 'city', tostring(kv.city),
      |               iff(k == 'oid', tostring(kv.oid), tostring(kv.parity)))
      || summarize n = count(), nv = dcount(v) by k, ix
      || sort by ix asc, k asc""".stripMargin

  /** r15 `geo_h3cell_children` + `geo_h3cell_childcount` — the inverse
    * of r14's center-containment parent (VERDICT r14 item 3). Four
    * sample cells at res 4 (one face-interior, one face-EDGE straddler
    * whose region is ownership-clipped, two mid-latitude) emit their
    * res-5 children (sorted token list + count) plus the gap-0
    * convention (children at the cell's own res = [cell]). The oracle
    * re-derives the ENTIRE construction op-for-op in DuckDB: encode
    * each point at res 4, sample the parent hex disk (radius
    * s4 + 2·s5, step s5/4 — the engine's grid), encode every sample at
    * res 5 (nearest-face argmax + hex round, cross-face wrap), dedupe,
    * and keep candidates whose own center re-encodes at res 4 to the
    * parent — the same float contract as the kql_geo_h3 oracle (one
    * trig chain per point, then exact IEEE arithmetic into floor-based
    * roundings). GeoSpec pins reciprocity and partition completeness. */
  val kqlGeoH3ChildrenText: String =
    """let P = datatable(name:string, lon:real, lat:real)[
      |  'equ', -20.905, 0.0,
      |  'gw', 0.05, 0.05,
      |  'paris', 2.35, 48.86,
      |  'syd', 151.21, -33.87
      |];
      |P
      || extend p4 = geo_point_to_h3cell(lon, lat, 4)
      || extend kids = geo_h3cell_children(p4, 5)
      || extend nkids = tolong(geo_h3cell_childcount(p4, 5)),
      |         kidcat = strcat_array(kids, ','),
      |         self0 = strcat_array(geo_h3cell_children(p4, 4), ',')
      || project name, p4, nkids, kidcat, self0
      || sort by name asc""".stripMargin

  /** r11 `geo_polygon_area` — equirectangular shoelace (deviation from
    * ADX's spheroid documented at the parser): a concave ring, a unit
    * triangle, and a degenerate ring (null). The oracle mirrors the
    * left-to-right edge fold with a frame-ordered running sum (the
    * shoelace terms are inexact doubles, so summation order is part of
    * the contract). */
  val kqlGeoAreaText: String =
    """let P = datatable(name:string, pj:string)[
      |  'concave', '{"type":"Polygon","coordinates":[[[-5.0,45.0],[5.0,43.0],[12.0,50.0],[0.0,47.5],[-8.0,52.0],[-5.0,45.0]]]}',
      |  'triangle', '{"type":"Polygon","coordinates":[[[10.0,50.0],[11.0,50.0],[10.0,51.0],[10.0,50.0]]]}',
      |  'degenerate', '{"type":"Polygon","coordinates":[[[0.0,0.0],[1.0,1.0]]]}'
      |];
      |P
      || extend a_m2 = tolong(floor(geo_polygon_area(parse_json(pj)), 1))
      || project name, a_m2
      || sort by name asc""".stripMargin

  /** r15 `geo_polygon_perimeter` + `geo_polygon_centroid` — the two
    * remaining geo-measurement functions on the area tier's
    * equirectangular infrastructure (VERDICT r14 item 4). Perimeter
    * mirrors area's mean-latitude meter scales edge by edge; the
    * centroid is the planar shoelace centroid computed DIRECTLY in
    * degrees (the centroid commutes with the axis scaling — no trig).
    * The oracle re-derives both with frame-ordered running sums, the
    * same summation-order contract as kql_geo_area. A zero-area
    * (collinear) ring and a degenerate ring pin the null conventions. */
  val kqlGeoMeasuresText: String =
    """let P = datatable(name:string, pj:string)[
      |  'concave', '{"type":"Polygon","coordinates":[[[-5.0,45.0],[5.0,43.0],[12.0,50.0],[0.0,47.5],[-8.0,52.0],[-5.0,45.0]]]}',
      |  'triangle', '{"type":"Polygon","coordinates":[[[10.0,50.0],[11.0,50.0],[10.0,51.0],[10.0,50.0]]]}',
      |  'square', '{"type":"Polygon","coordinates":[[[10.0,0.0],[11.0,0.0],[11.0,1.0],[10.0,1.0],[10.0,0.0]]]}',
      |  'collinear', '{"type":"Polygon","coordinates":[[[0.0,0.0],[1.0,1.0],[2.0,2.0],[0.0,0.0]]]}',
      |  'degenerate', '{"type":"Polygon","coordinates":[[[0.0,0.0],[1.0,1.0]]]}'
      |];
      |P
      || extend per_m = tolong(floor(geo_polygon_perimeter(parse_json(pj)), 1)),
      |         c = geo_polygon_centroid(parse_json(pj))
      || extend cx_u = tolong(floor(c.coordinates[0] * 1000000.0, 1)),
      |         cy_u = tolong(floor(c.coordinates[1] * 1000000.0, 1)),
      |         has_c = tolong(iff(isnotnull(c), 1, 0))
      || project name, per_m, cx_u, cy_u, has_c
      || sort by name asc""".stripMargin

  /** r15 scalar wave 3: `around` (inclusive band), `array_split`
    * (split-before-index with negative/clamped indices),
    * `has_any_index` (whole-term ci match, index in the VALUES list),
    * `hash_md5`/`hash_sha256` (lowercase hex of the string form),
    * `gamma`/`loggamma` (explicit Lanczos g=7/n=9 chain — the oracle
    * replays the SAME chain, not DuckDB's libm lgamma), and
    * `unicode_codepoints_from_string`/`_to_string` (native codepoint
    * transcode, astral-safe — the oracle rebuilds codepoints and the
    * round-trip with unicode(substr)/chr). All outputs integer/hex
    * strings so the compare is exact. */
  val kqlScalarFns3Text: String =
    """Orders
      || where orderid < 400
      || extend txt = strcat('order ', tostring(orderid), iff(orderid % 3 == 0, ' priority', ' normal'))
      || extend near150 = tolong(iff(around(todouble(amount), 150.0, 25.0), 1, 0)),
      |         hidx = has_any_index(txt, dynamic(['urgent', 'priority', 'normal'])),
      |         md5h = hash_md5(strcat('o', tostring(orderid))),
      |         sh256 = hash_sha256(city),
      |         parts = array_split(pack_array(orderid, custid, amount, orderid + custid), 2),
      |         parts2 = array_split(pack_array(orderid, custid, amount, orderid + custid), dynamic([1, 3]))
      || extend np = tolong(array_length(parts)) + 10 * tolong(array_length(parts2)),
      |         pick = tolong(parts[0][1]) * 100000 + tolong(parts[1][0]) + tolong(parts2[1][1]),
      |         lg_u = tolong(floor(loggamma(todouble(orderid % 7 + 1) + 0.5) * 1000000.0, 1)),
      |         g_u = tolong(floor(gamma(todouble(orderid % 8 + 1) / 4.0) * 1000000.0, 1)),
      |         cps = unicode_codepoints_from_string(city)
      || extend cp_sum = tolong(array_sum(cps)), cp_n = tolong(array_length(cps)),
      |         rt_ok = tolong(iff(unicode_codepoints_to_string(cps) == city, 1, 0))
      || project orderid, near150, hidx, md5h, sh256, np, pick, lg_u, g_u, cp_sum, cp_n, rt_ok
      || sort by orderid asc""".stripMargin

  /** r15 scalar wave 4 — `strcmp` (ordinal 3-way, byte order in both
    * engines), `regex_quote` (one metachar-class regexp_replace),
    * `array_sort_desc`, `jaccard_index` (distinct-set ∩/∪ cardinality
    * ratio), `bag_zip` (first-wins duplicate keys, sorted-key VARIANT
    * canon), and `base64_encode_fromarray` (per-byte hex fold →
    * unhex → base64). The oracle re-derives every column from
    * orders_info: the sort via greatest/least, the Jaccard via
    * list_distinct/list_filter cardinalities, the bag fields from the
    * first-wins rule directly, the base64 via the same hex fold. */
  val kqlScalarFns4Text: String =
    """Orders
      || where orderid < 300
      || extend s2 = strcat('c', substring(city, 2, 3))
      || extend cmp = strcmp(strcat('c', city), s2),
      |         rq = regex_quote(strcat(city, '+(', tostring(orderid % 10), ').*')),
      |         sd = array_sort_desc(pack_array(orderid % 7, orderid % 5, orderid % 3, amount % 11)),
      |         ja_u = tolong(floor(jaccard_index(pack_array(orderid % 4, orderid % 6, 2), pack_array(orderid % 6, 3, 2)) * 1000000.0, 1)),
      |         bz = bag_zip(pack_array('k1', 'k2', 'k1'), pack_array(orderid, amount, custid)),
      |         b64 = base64_encode_fromarray(pack_array(orderid % 256, amount % 256, custid % 256, 200))
      || extend sd0 = tolong(sd[0]), sd3 = tolong(sd[3]),
      |         bza = tolong(bz.k1), bzb = tolong(bz.k2),
      |         bkeys = strcat_array(bag_keys(bz), ',')
      || project orderid, cmp, rq, ja_u, sd0, sd3, bza, bzb, bkeys, b64
      || sort by orderid asc""".stripMargin

  /** r15 IP-text tier 2 — `ipv4_is_in_any_range` (OR over per-range
    * top-bit equality), `ipv6_is_in_range` / `ipv6_is_in_any_range`
    * (the graft_ipv6_cmp prefix kernel against "addr/p" CIDR text),
    * and the textual-IPv4 detectors `has_ipv4` / `has_any_ipv4` /
    * `has_ipv4_prefix` / `has_any_ipv4_prefix` (tokenize on the
    * term-boundary class, then full-match strict dotted-quads —
    * prefixes enforced at octet boundaries). Fixed datatable inputs;
    * the oracle carries the hand-derived per-literal expectations,
    * the kql_ipv6 fixture convention. */
  val kqlIpFns2Text: String =
    """let T = datatable(id:long, txt:string, ip:string, ip6:string)[
      |  1, 'connect from 10.1.2.3 ok', '10.1.2.3', 'fe80::1ff:fe23:4567:890a',
      |  2, 'bad 999.1.2.3 and 10.1.2.300', '192.168.7.14', '2001:db8:1234::1',
      |  3, 'multi 10.0.0.1 10.0.0.2', '172.16.5.9', '2001:db8:abcd:12::ff',
      |  4, 'prefix 127.0.1.5 hit', '8.8.8.8', '::ffff:192.0.2.1',
      |  5, 'dotted 1.2.3.4.5 no', '10.255.255.254', 'fe80::a'
      |];
      |T
      || extend any4 = tolong(iff(ipv4_is_in_any_range(ip, '10.0.0.0/8', '192.168.0.0/16'), 1, 0)),
      |         in6 = tolong(iff(ipv6_is_in_range(ip6, '2001:db8::/32'), 1, 0)),
      |         any6 = tolong(iff(ipv6_is_in_any_range(ip6, 'fe80::/10', '2001:db8:abcd::/48'), 1, 0)),
      |         h4 = tolong(iff(has_ipv4(txt), 1, 0)),
      |         ha4 = tolong(iff(has_any_ipv4(txt, '10.0.0.2', '10.1.2.3'), 1, 0)),
      |         hp4 = tolong(iff(has_ipv4_prefix(txt, '127.0.'), 1, 0)),
      |         hap4 = tolong(iff(has_any_ipv4_prefix(txt, '10.0.', '99.'), 1, 0))
      || project id, any4, in6, any6, h4, ha4, hp4, hap4
      || sort by id asc""".stripMargin

  /** r15 elementwise trig tier — `series_sin/cos/tan/asin/acos/atan`
    * over pack_array series; outputs are micro-floored left-fold sums
    * (the series_sum order), the oracle replaying the identical
    * parenthesized additions over libm calls. asin/acos outside
    * [-1, 1] yield NULL (nanvl'd in-band convention) — the `a_null`
    * column pins the propagation through the fold. */
  val kqlSeriesTrigText: String =
    """Orders
      || where orderid < 200
      || extend xs = pack_array(todouble(orderid % 7) / 3.0, todouble(amount % 13) / 6.0, -1.25, 2.0)
      || extend sn_u = tolong(floor(series_sum(series_sin(xs)) * 1000000.0, 1)),
      |         cn_u = tolong(floor(series_sum(series_cos(xs)) * 1000000.0, 1)),
      |         tn_u = tolong(floor(series_sum(series_tan(xs)) * 1000000.0, 1)),
      |         at_u = tolong(floor(series_sum(series_atan(xs)) * 1000000.0, 1)),
      |         as_u = tolong(floor(series_sum(series_asin(series_divide(xs, 4.0))) * 1000000.0, 1)),
      |         ac_u = tolong(floor(series_sum(series_acos(series_divide(xs, 4.0))) * 1000000.0, 1)),
      |         a_null = tolong(iff(isnull(series_sum(series_asin(xs))), 1, 0))
      || project orderid, sn_u, cn_u, tn_u, at_u, as_u, ac_u, a_null
      || sort by orderid asc""".stripMargin

  /** r15 `convert_*` unit families — exact published factors compiled
    * into the plan from literal UnitsNet unit names (loud reject on
    * unknown units), temperature affine via Kelvin. The oracle replays
    * the same literal arithmetic; micro-floor keeps the compare
    * exact. */
  val kqlConvertUnitsText: String =
    """Orders
      || where orderid < 100
      || extend v = todouble(amount)
      || extend km_u = tolong(floor(convert_length(v, 'Mile', 'Kilometer') * 1000000.0, 1)),
      |         kg_u = tolong(floor(convert_mass(v, 'Pound', 'Kilogram') * 1000000.0, 1)),
      |         mps_u = tolong(floor(convert_speed(v, 'KilometerPerHour', 'MeterPerSecond') * 1000000.0, 1)),
      |         rad_u = tolong(floor(convert_angle(v, 'Degree', 'Radian') * 1000000.0, 1)),
      |         kj_u = tolong(floor(convert_energy(v, 'Kilocalorie', 'Kilojoule') * 1000000.0, 1)),
      |         l_u = tolong(floor(convert_volume(v, 'UsGallon', 'Liter') * 1000000.0, 1)),
      |         n_u = tolong(floor(convert_force(v, 'PoundForce', 'Newton') * 1000000.0, 1)),
      |         c_u = tolong(floor(convert_temperature(v, 'DegreeFahrenheit', 'DegreeCelsius') * 1000000.0, 1))
      || project orderid, km_u, kg_u, mps_u, rad_u, kj_u, l_u, n_u, c_u
      || sort by orderid asc""".stripMargin

  /** r15 geo line measures + intersection: `geo_line_length` /
    * `geo_line_centroid` (the line siblings of perimeter/centroid,
    * same equirectangular mean-latitude convention) and
    * `geo_intersects_2lines` (planar orientation + on-segment test —
    * spherical-geodesic deviation documented at the parser; touching
    * endpoints and collinear overlap count as intersecting). The
    * oracle re-derives lengths/centroids with frame-ordered running
    * sums and the intersection with an independent edge cross-join. */
  val kqlGeoLines2Text: String =
    """let L = datatable(name:string, l1:string, l2:string)[
      |  'crossx', '{"type":"LineString","coordinates":[[0.0,0.0],[2.0,2.0]]}', '{"type":"LineString","coordinates":[[0.0,2.0],[2.0,0.0]]}',
      |  'touch', '{"type":"LineString","coordinates":[[0.0,0.0],[1.0,1.0]]}', '{"type":"LineString","coordinates":[[1.0,1.0],[2.0,0.0]]}',
      |  'apart', '{"type":"LineString","coordinates":[[0.0,0.0],[1.0,0.0]]}', '{"type":"LineString","coordinates":[[0.0,1.0],[1.0,1.0]]}',
      |  'multi', '{"type":"LineString","coordinates":[[0.0,5.0],[1.0,5.0],[3.0,0.0],[3.0,4.0]]}', '{"type":"LineString","coordinates":[[0.0,6.0],[1.0,6.0],[2.0,2.0],[4.0,2.0]]}'
      |];
      |L
      || extend len_u = tolong(floor(geo_line_length(parse_json(l1)) * 1000.0, 1)),
      |         c1 = geo_line_centroid(parse_json(l1)),
      |         hit = tolong(iff(geo_intersects_2lines(parse_json(l1), parse_json(l2)), 1, 0))
      || extend cx_u = tolong(floor(c1.coordinates[0] * 1000000.0, 1)),
      |         cy_u = tolong(floor(c1.coordinates[1] * 1000000.0, 1))
      || project name, len_u, cx_u, cy_u, hit
      || sort by name asc""".stripMargin

  /** r15 statistical tier: `beta_cdf` / `beta_pdf` / `welch_test`.
    * The CDF (and the t-distribution tail inside welch) is the NR
    * regularized incomplete beta — a FIXED 200-iteration Lentz
    * continued fraction plus Lanczos lnΓ chains, all expressed as
    * explicit SQL arithmetic so the DuckDB oracle replays the
    * identical fold via `list_reduce` (both sides generated from the
    * SAME Scala builders — see KqlParser.betacfFold/loggammaCore).
    * Shapes/means derive from orders so both CASE branches of the
    * symmetry split execute. */
  val kqlStatTestsText: String =
    """Orders
      || where orderid < 60
      || extend xb = todouble(amount % 47 + 1) / 49.0,
      |         aa = todouble(orderid % 4 + 1) / 2.0,
      |         bb = todouble(custid % 3 + 2) / 2.0
      || extend cdf_u = tolong(floor(beta_cdf(xb, aa, bb) * 1000000.0, 1)),
      |         pdf_u = tolong(floor(beta_pdf(xb, aa, bb) * 1000000.0, 1)),
      |         p_u = tolong(floor(welch_test(todouble(amount), todouble(amount % 7 + 1), 10 + orderid % 5,
      |                                       todouble(amount) - todouble(custid % 5) / 2.0, todouble(custid % 9 + 1), 12 + custid % 4) * 1000000.0, 1))
      || project orderid, cdf_u, pdf_u, p_u
      || sort by orderid asc""".stripMargin

  /** r15 statistical tier 2: `erf` / `erfc` (fixed 160-term confluent
    * series — see KqlParser.erfSql; erfc = 1 − erf, documented) and
    * `beta_inv` (24-iteration bisection-safeguarded Newton over the
    * 200-iteration incomplete-beta fraction — KqlParser.betaInvSql).
    * The oracle replays BOTH iterations as recursive CTEs generated
    * from the same Scala builders (erfFoldStep / betacfFold /
    * betacfInitD / loggammaCore): the erf sum as a 160-row recursion,
    * the inverse as ONE flattened recursion with a 203-phase inner
    * cycle (200 fraction steps, an f-stage, a move-stage, a re-init
    * stage) per Newton iteration. */
  val kqlStatTests2Text: String =
    """Orders
      || where orderid < 30
      || extend xe = (todouble(amount) - 149.5) / 33.0,
      |         pp = todouble(amount % 19 + 1) / 20.0,
      |         aa = todouble(orderid % 4 + 1) / 2.0,
      |         bb = todouble(custid % 3 + 2) / 2.0
      || extend erf_u = tolong(floor(erf(xe) * 1000000.0, 1)),
      |         erfc_u = tolong(floor(erfc(xe * 2.5) * 1000000.0, 1)),
      |         inv_u = tolong(floor(beta_inv(pp, aa, bb) * 1000000.0, 1))
      || project orderid, erf_u, erfc_u, inv_u
      || sort by orderid asc""".stripMargin

  /** r15 scalar wave 5 — `isascii` (anchored codepoint-class test),
    * `toguid` (canonical lowercase 8-4-4-4-12 or null; guid surfaces
    * as its canonical string), `todecimal` (DECIMAL(38,10), the
    * documented precision bound — rendered to string for the compare
    * since both engines keep full-scale trailing zeros). */
  val kqlScalarFns5Text: String =
    """Orders
      || where orderid < 100
      || extend h = hash_md5(tostring(orderid))
      || extend g = strcat(substring(h, 0, 8), '-', substring(h, 8, 4), '-',
      |                    substring(h, 12, 4), '-', substring(h, 16, 4), '-',
      |                    substring(h, 20, 12))
      || extend gid = toguid(g), bad = toguid(city),
      |         asc1 = tolong(iff(isascii(city), 1, 0)),
      |         asc2 = tolong(iff(isascii(strcat(city, unicode_codepoints_to_string(pack_array(233)))), 1, 0)),
      |         dec2 = tostring(todecimal(strcat(tostring(orderid), '.', tostring(amount))))
      || project orderid, gid, bad, asc1, asc2, dec2
      || sort by orderid asc""".stripMargin

  /** r15 `extractjson` + `parse_command_line` — literal-'$'-path JSON
    * text extraction (variant_get over parse_json, optional typeof
    * cast) and Windows CommandLineToArgvW splitting
    * (graft.functions.CommandLine). The JSON and the command line are
    * CONSTRUCTED from columns, so the oracle re-derives every output
    * from the construction rule directly (the parse_csv convention). */
  val kqlJsonCmdlineText: String =
    """Orders
      || where orderid < 90
      || extend js = strcat('{"meta": {"city": "', city, '", "ids": [', tostring(orderid), ', ', tostring(custid), ']}, "amt": ', tostring(amount), '}')
      || extend c = tostring(extractjson('$.meta.city', js)),
      |         i1 = extractjson('$.meta.ids[1]', js, typeof(long)),
      |         amt2 = extractjson('$.amt', js, typeof(long)) * 2
      || extend cmd = strcat('prog.exe -n ', tostring(orderid), ' "', city, '" C:\\tmp\\f.txt')
      || extend argsx = parse_command_line(cmd, 'windows')
      || extend na = tolong(array_length(argsx)), a2 = tostring(argsx[2]),
      |         a3 = tostring(argsx[3]), a4 = tostring(argsx[4])
      || project orderid, c, i1, amt2, na, a2, a3, a4
      || sort by orderid asc""".stripMargin

  /** r15 `geo_line_densify` / `geo_polygon_densify` — equal-parts
    * edge subdivision (ceil(edge_m / tolerance) pieces per edge, the
    * planar-chord deviation documented at the builder). The oracle
    * regenerates the densified vertex list (edges × range rows,
    * ordered edge-major), re-measures it with the same mean-latitude
    * folds the length/perimeter family uses, and re-derives the
    * second vertex from the subdivision formula; the closing-vertex
    * and point-count pins ride literal index probes. */
  val kqlGeoDensifyText: String =
    """let G = datatable(name:string, kind:string, g:string)[
      |  'ln', 'L', '{"type":"LineString","coordinates":[[10.0,50.0],[10.5,50.2],[10.5,50.6]]}',
      |  'pg', 'P', '{"type":"Polygon","coordinates":[[[0.0,0.0],[0.4,0.0],[0.4,0.3],[0.0,0.0]]]}'
      |];
      |G
      || extend d = iff(kind == 'L', geo_line_densify(parse_json(g), 9000.0),
      |                geo_polygon_densify(parse_json(g), 9000.0))
      || extend len_u = tolong(floor(iff(kind == 'L', geo_line_length(d), geo_polygon_perimeter(d)) * 1000.0, 1)),
      |         p1x_u = tolong(floor(todouble(iff(kind == 'L', d.coordinates[1][0], d.coordinates[0][1][0])) * 1000000.0, 1)),
      |         p1y_u = tolong(floor(todouble(iff(kind == 'L', d.coordinates[1][1], d.coordinates[0][1][1])) * 1000000.0, 1)),
      |         last_ok = tolong(iff(kind == 'L',
      |             iff(todouble(d.coordinates[10][1]) == 50.6 and isnull(todouble(d.coordinates[11][0])), 1, 0),
      |             iff(todouble(d.coordinates[0][16][1]) == 0.0 and isnull(todouble(d.coordinates[0][17][0])), 1, 0)))
      || project name, len_u, p1x_u, p1y_u, last_ok
      || sort by name asc""".stripMargin

  /** r15 `geo_closest_point_on_line` — the argmin foot of the
    * point-to-line distance kernel (same per-segment arithmetic as
    * geo_distance_point_to_line; first strictly-better segment wins
    * ties). Three query points exercise an interior foot, a clamped
    * endpoint, and a shared-vertex tie; the oracle replays the edge
    * scan with a ROW_NUMBER(d, i) argmin. */
  val kqlGeoClosestText: String =
    """let L = datatable(name:string, qlon:real, qlat:real)[
      |  'mid', 10.2, 50.4,
      |  'far', 11.0, 51.0,
      |  'vert', 10.5, 50.2
      |];
      |L
      || extend g = '{"type":"LineString","coordinates":[[10.0,50.0],[10.5,50.2],[10.5,50.6]]}'
      || extend cp = geo_closest_point_on_line(qlon, qlat, parse_json(g))
      || extend cx_u = tolong(floor(cp.coordinates[0] * 1000000.0, 1)),
      |         cy_u = tolong(floor(cp.coordinates[1] * 1000000.0, 1)),
      |         d_u = tolong(floor(geo_distance_point_to_line(qlon, qlat, parse_json(g)), 1))
      || project name, cx_u, cy_u, d_u
      || sort by name asc""".stripMargin

  /** r15 `datetime_utc_to_local` / `datetime_local_to_utc` (fixed-
    * offset oracle form — IANA names spec-pinned) + the optional
    * `array_index_of` (start, length, occurrence) arms. */
  val kqlTzIndexText: String =
    """Orders
      || where orderid < 60
      || extend ts = unixtime_seconds_todatetime(1700000000 + orderid * 3600)
      || extend loc = datetime_utc_to_local(ts, '+05:30'),
      |         arr = pack_array(orderid % 3, 7, orderid % 3, 7, orderid % 3)
      || extend back = datetime_local_to_utc(loc, '+05:30')
      || extend lms = unix_millis(loc),
      |         rt_ok = tolong(iff(back == ts, 1, 0)),
      |         i2 = toint(array_index_of(arr, orderid % 3, 1)),
      |         i3 = toint(array_index_of(arr, orderid % 3, 0, -1, 3)),
      |         im = toint(array_index_of(arr, orderid % 3, 0, 1, 2)),
      |         ineg = toint(array_index_of(arr, 7, -2))
      || project orderid, lms, rt_ok, i2, i3, im, ineg
      || sort by orderid asc""".stripMargin

  /** r15 GUID ↔ base64 — `base64_encode_fromguid` /
    * `base64_decode_toguid` over the .NET Guid.ToByteArray order ADX
    * uses (first three groups little-endian, last 8 bytes big-endian)
    * as pure hex slicing; the oracle replays the same slices, the
    * round-trip re-derives the constructed GUID, non-GUID input →
    * null. */
  val kqlGuidB64Text: String =
    """Orders
      || where orderid < 80
      || extend h = hash_md5(tostring(orderid))
      || extend g = strcat(substring(h, 0, 8), '-', substring(h, 8, 4), '-',
      |                    substring(h, 12, 4), '-', substring(h, 16, 4), '-',
      |                    substring(h, 20, 12))
      || extend b = base64_encode_fromguid(g)
      || extend rt = base64_decode_toguid(b), bad = base64_encode_fromguid(city)
      || project orderid, b, rt, bad
      || sort by orderid asc""".stripMargin

  /** r15 compression codecs — gzip/zlib compress-to / decompress-from
    * base64 (graft.functions.Codecs, java.util.zip). Compressed bytes
    * are a zlib-implementation detail, so the oracle checks the
    * ROUND-TRIP identity (decompress ∘ compress = id, re-derived as
    * the payload itself) plus the framing constants every RFC
    * 1952/1950 stream must carry (gzip magic 0x1f 0x8b + method 8;
    * zlib CMF 0x78 for the 32K-window deflate the JDK always emits);
    * the level-dependent bytes are spec-pinned instead. */
  val kqlCodecsText: String =
    """Orders
      || where orderid < 120
      || extend payload = strcat(city, '|', tostring(orderid), '|', tostring(amount))
      || extend g64 = gzip_compress_to_base64_string(payload),
      |         z64 = zlib_compress_to_base64_string(payload)
      || extend gb = base64_decode_toarray(g64), zb = base64_decode_toarray(z64)
      || extend rt_g = gzip_decompress_from_base64_string(g64),
      |         rt_z = zlib_decompress_from_base64_string(z64),
      |         gmagic = tolong(gb[0]) * 1000 + tolong(gb[1]) + tolong(gb[2]),
      |         zmagic = tolong(zb[0])
      || project orderid, rt_g, rt_z, gmagic, zmagic
      || sort by orderid asc""".stripMargin

  /** r15 URL codecs + parse_csv — `url_encode` (form variant, space →
    * '+') / `url_encode_component` (RFC 3986 strict, lowercase hex) /
    * `url_decode` (the '+'-aware inverse), each a hex-pair fold over
    * the UTF-8 bytes; and `parse_csv` (native RFC 4180 state machine,
    * graft.functions.CsvParse). The corpus here is ASCII, so the
    * oracle replays the encodes as per-CHARACTER walks (equivalent on
    * ASCII — multi-byte inputs are spec-pinned instead), the decode
    * via the reconstructed payload, and the CSV fields from the
    * construction rule directly. */
  val kqlUrlCsvText: String =
    """Orders
      || where orderid < 150
      || extend raw = strcat('q=', city, ' & id/', tostring(orderid), '!')
      || extend enc = url_encode(raw), encc = url_encode_component(raw)
      || extend dec = url_decode(enc), decc = url_decode(encc)
      || extend line = strcat(tostring(orderid), ',"', city, '","x,y ""q""', tostring(amount), '"')
      || extend fields = parse_csv(line)
      || extend nf = tolong(array_length(fields)), joined = strcat_array(fields, '/')
      || extend ok_rt = tolong(iff(dec == raw and decc == raw, 1, 0))
      || project orderid, enc, encc, nf, joined, ok_rt
      || sort by orderid asc""".stripMargin

  /** r15 `row_window_session` — ADX's sessionization over a serialized
    * frame: session begins at the first row, on an idle gap >
    * idleTimeout, or when the row is more than maxWindowSize past the
    * current session's begin (a TRUE sequential recurrence — the
    * engine desugars to idle-group helper windows + a left fold over
    * the in-group prefix; see the parser). The scrambled-hash event
    * times give irregular gaps so both the idle and max-window rules
    * fire. The oracle replays the same grouping + a scalar list_reduce
    * fold (single-value state — safe from the DuckDB struct-fold bug
    * the stat tier works around). */
  val kqlRowSessionText: String =
    """Orders
      || where orderid < 200
      || extend ts = unixtime_seconds_todatetime(1700000000 + (orderid * 7919) % 20000)
      || sort by ts asc, orderid asc
      || extend sb = row_window_session(ts, 20m, 5m)
      || project orderid, ms = unix_millis(sb)
      || sort by orderid asc""".stripMargin

  /** r15 `column_ifexists` — schema-conditional column reference,
    * resolved at the stage rewrite (the first point with the frame
    * schema in hand): present column → the column, absent → the
    * default expression. */
  val kqlColumnIfExistsText: String =
    """Orders
      || where orderid < 40
      || project orderid, a = column_ifexists('amount', 0) * 2,
      |          m = column_ifexists('missing_col', orderid * 10) + 1
      || sort by orderid asc""".stripMargin

  /** r15 aggregate variants: exact `count_distinct`/`count_distinctif`
    * (ADX's exact forms — this engine's dcount is already exact, so
    * the four spellings share one implementation) and
    * `make_list_with_nulls` (struct-wrap keeps the null holes
    * collect_list drops). The null payload rides format_ipv4's
    * out-of-range null convention. */
  val kqlAggVariantsText: String =
    """Orders
      || extend seg = orderid % 4
      || extend sval = iff(amount % 3 == 0, format_ipv4(4294967296), tostring(amount))
      || summarize nd = count_distinct(city),
      |            ndi = count_distinctif(city, amount > 150),
      |            lst = make_list_with_nulls(sval),
      |            plain = make_list(sval) by seg
      || project seg, nd, ndi, nwn = tolong(array_length(lst)),
      |          nplain = tolong(array_length(plain)),
      |          nnull = tolong(array_length(lst)) - tolong(array_length(plain))
      || sort by seg asc""".stripMargin

  /** r15 `format_ipv4_mask` + `base64_decode_toarray`: masked dotted-
    * quad with suffix (host bits zeroed), and base64 → BYTE array
    * (UTF-8 bytes, not codepoints — the oracle recomputes both
    * independently from the constructed octets / city text). */
  val kqlNetB64Text: String =
    """Orders
      || where orderid < 50
      || extend ip = strcat(tostring(orderid % 224 + 1), '.', tostring(custid % 256), '.',
      |                     tostring(amount % 256), '.', tostring((orderid * 7) % 256))
      || extend m16 = format_ipv4_mask(ip, 16), m28 = format_ipv4_mask(ip, 28),
      |         bytes = base64_decode_toarray(base64_encode_tostring(city))
      || extend bsum = tolong(array_sum(bytes)), bn = tolong(array_length(bytes))
      || project orderid, m16, m28, bsum, bn
      || sort by orderid asc""".stripMargin

  // ---- DuckDB mirrors of the special-function chains (shared Scala
  // builders with the engine: KqlParser.loggammaCore / betacfFold /
  // betacfInitD generate the arithmetic; only the struct/fold syntax
  // differs per dialect) -----------------------------------------------

  /** lnΓ for positive args — the engine's Lanczos chain with the z
    * shift repeated textually (same values, DuckDB has no binder). */
  private def duckLgamma(x: String): String = {
    val z = s"(CASE WHEN $x < 0.5 THEN $x ELSE $x - 1.0 END)"
    "(" + graft.kql.KqlParser.loggammaCore(x, z) + ")"
  }

  private def duckFront(a: String, b: String, x: String): String =
    s"exp(${duckLgamma(s"$a + $b")} - ${duckLgamma(a)} - ${duckLgamma(b)} " +
      s"+ $a * ln($x) + $b * ln(1.0 - $x))"

  // The 200-iteration Lentz fraction runs as a RECURSIVE CTE in the
  // oracle, not a lambda fold: DuckDB 1.0.0's list_reduce mis-evaluates
  // multi-field struct accumulators (probed: a field expression can
  // read another field's UPDATED value mid-step), while the recursive
  // CTE's row-to-row semantics are standard. The per-step arithmetic
  // still comes from the SAME Scala builder the engine compiles
  // (KqlParser.betacfFold), applied to the prior row aliased `cfr` with
  // the fraction args in columns fa/fb/fx.
  /** The icosahedron face-frame CTE chain shared by the H3 oracles
    * (vertices from φ, face triples, midpoint centers, e1 toward
    * vertex a, e2 = c × e1) — verbatim the kql_geo_h3 prefix. */
  private val duckH3Frames: String =
    """k AS (SELECT (1.0 + sqrt(5.0)) / 2.0 AS phi),
      |k2 AS (SELECT phi, sqrt(1.0 + phi * phi) AS vn FROM k),
      |verts AS (
      |  SELECT vid,
      |    (CASE WHEN xc = 2 THEN phi WHEN xc = -2 THEN -phi ELSE CAST(xc AS DOUBLE) END) / vn AS vx,
      |    (CASE WHEN yc = 2 THEN phi WHEN yc = -2 THEN -phi ELSE CAST(yc AS DOUBLE) END) / vn AS vy,
      |    (CASE WHEN zc = 2 THEN phi WHEN zc = -2 THEN -phi ELSE CAST(zc AS DOUBLE) END) / vn AS vz
      |  FROM (VALUES (0,0,1,2),(1,0,1,-2),(2,0,-1,2),(3,0,-1,-2),
      |               (4,1,2,0),(5,1,-2,0),(6,-1,2,0),(7,-1,-2,0),
      |               (8,2,0,1),(9,2,0,-1),(10,-2,0,1),(11,-2,0,-1))
      |    vt(vid, xc, yc, zc) CROSS JOIN k2),
      |fv AS (
      |  SELECT fi.f, a.vx AS ax, a.vy AS ay, a.vz AS az,
      |    b.vx AS bx, b.vy AS by, b.vz AS bz,
      |    c.vx AS cx0, c.vy AS cy0, c.vz AS cz0
      |  FROM (VALUES (0,0,2,8),(1,0,2,10),(2,0,4,6),(3,0,4,8),(4,0,6,10),
      |               (5,1,3,9),(6,1,3,11),(7,1,4,6),(8,1,4,9),(9,1,6,11),
      |               (10,2,5,7),(11,2,5,8),(12,2,7,10),(13,3,5,7),(14,3,5,9),
      |               (15,3,7,11),(16,4,8,9),(17,5,8,9),(18,6,10,11),(19,7,10,11))
      |    fi(f, va, vb, vc)
      |  JOIN verts a ON a.vid = fi.va JOIN verts b ON b.vid = fi.vb
      |  JOIN verts c ON c.vid = fi.vc),
      |fm AS (SELECT *, ax + bx + cx0 AS mx, ay + by + cy0 AS my, az + bz + cz0 AS mz FROM fv),
      |fm2 AS (SELECT *, sqrt(mx * mx + my * my + mz * mz) AS mn FROM fm),
      |fc AS (SELECT f, ax, ay, az, mx / mn AS cx, my / mn AS cy, mz / mn AS cz FROM fm2),
      |fd AS (SELECT *, ax * cx + ay * cy + az * cz AS dd FROM fc),
      |fw AS (SELECT *, ax - dd * cx AS wx0, ay - dd * cy AS wy0, az - dd * cz AS wz0 FROM fd),
      |fw2 AS (SELECT *, sqrt(wx0 * wx0 + wy0 * wy0 + wz0 * wz0) AS wn FROM fw),
      |fe1 AS (SELECT f, cx, cy, cz, wx0 / wn AS e1x, wy0 / wn AS e1y, wz0 / wn AS e1z FROM fw2),
      |frames AS (SELECT *, cy * e1z - cz * e1y AS e2x, cz * e1x - cx * e1z AS e2y,
      |    cx * e1y - cy * e1x AS e2z FROM fe1)""".stripMargin

  private def duckBetacfStep: (String, String, String) =
    graft.kql.KqlParser.betacfFold("cfr.fa", "cfr.fb", "cfr.fx", "cfr", "(cfr.m + 1)")
  private def duckBetacfInitD: String =
    graft.kql.KqlParser.betacfInitD("fa", "fb", "fx")
  /** One erf series step applied to the prior recursion row `cfr` —
    * the engine's KqlParser.erfFoldStep verbatim. */
  private def duckErfStep: (String, String) =
    graft.kql.KqlParser.erfFoldStep("cfr", "(cfr.m + 1)", "cfr.q")

  val kqlBasketText: String =
    """Events
      || extend vband = tolong(floor(bin(value, 200) + 0.5, 1)), hot = value >= 400
      || project event_type, vband, hot
      || evaluate basket(0.05)
      || sort by n desc, event_type asc, vband asc, hot asc""".stripMargin

  /** r10 `evaluate diffpatterns` — autocluster's cohort-difference
    * sibling: which (city, order-parity) patterns are over-represented
    * among high-amount orders vs low-amount ones. Exhaustive-cube
    * deviation + integer micro-percent arithmetic documented at the
    * verb. */
  val kqlDiffPatternsText: String =
    """Orders
      || project city, pay = iif(orderid % 2 == 0, 'even', 'odd'), tier = iif(amount >= 150, 'high', 'low')
      || evaluate diffpatterns(tier, 'high', 'low', 0.5)""".stripMargin

  /** r10 `evaluate sliding_window_counts` — the ADX activity plugin:
    * per-day active-row and distinct-user counts over a trailing 3-day
    * window across Jan 10-20 (deviations — second-resolution timeline,
    * epoch-millis bin key — documented at the verb). */
  val kqlSlidingWindowText: String =
    """Events
      || evaluate sliding_window_counts(user_id, ts, datetime(2024-01-10), datetime(2024-01-20), 3d, 1d)
      || sort by bin_ms asc""".stripMargin

  /** r10 `evaluate activity_engagement` — daily-active over
    * weekly-active distinct users (the DAU/WAU engagement ratio)
    * across Jan 10-20. */
  val kqlActivityEngagementText: String =
    """Events
      || evaluate activity_engagement(user_id, ts, datetime(2024-01-10), datetime(2024-01-20), 1d, 7d)
      || sort by bin_ms asc""".stripMargin

  /** r10 `reduce by` — log-pattern clustering over a derived
    * event tag (digit runs star out; deterministic-normalization
    * deviation documented at the verb). */
  val kqlReduceText: String =
    """Events
      || extend tag = strcat(event_type, '#', tostring(tolong(bin(value, 1))))
      || reduce by tag
      || sort by Pattern asc""".stripMargin

  /** r10 `evaluate funnel_sequence` — what users do immediately before
    * and after a view→click funnel (long-form adaptation + determinism
    * strengthening documented at the verb). */
  val kqlFunnelSequenceText: String =
    """Events
      || evaluate funnel_sequence(user_id, ts, datetime(2024-01-01), datetime(2024-01-31), 1h, event_type, dynamic(['view', 'click']))
      || sort by kind asc, state asc""".stripMargin

  /** r10 `evaluate activity_counts_metrics` — per-day totals, actives,
    * NEW users and cumulative distinct users (the new-vs-returning
    * dashboard) across Jan 10-15. */
  val kqlActivityCountsText: String =
    """Events
      || evaluate activity_counts_metrics(user_id, ts, datetime(2024-01-10), datetime(2024-01-15), 1d)
      || sort by bin_ms asc""".stripMargin

  /** r10 `evaluate rolling_percentile` — per-day p90 of event values
    * over a trailing 3-day window (exact-percentile deviation
    * documented at the verb). */
  val kqlRollingPercentileText: String =
    """Events
      || evaluate rolling_percentile(value, 90, ts, datetime(2024-01-10), datetime(2024-01-15), 3d, 1d)
      || sort by bin_ms asc""".stripMargin

  /** r10 `series_periods_detect` — dominant-period detection over the
    * per-type daily count series (raw-dot-product scoring deviation
    * documented at the function). */
  val kqlPeriodsDetectText: String =
    """Events
      || make-series n = count() on ts from datetime(2024-01-01) to datetime(2024-01-31) step 1d by event_type
      || extend pd = series_periods_detect(n, 2, 10, 2)
      || project event_type, p1 = tolong(pd.periods[0]), s1 = tolong(pd.scores[0]), p2 = tolong(pd.periods[1]), s2 = tolong(pd.scores[1])
      || sort by event_type asc""".stripMargin

  /** r10 `fork` — two summarize legs over one frame (single-frame
    * union adaptation with `fork_leg` provenance documented at the
    * verb). */
  val kqlForkText: String =
    """Orders
      || fork hi = (where amount >= 150 | summarize n = count(), total = sum(amount) by city) lo = (where amount < 150 | summarize n = count(), total = sum(amount) by city)
      || sort by fork_leg asc, city asc""".stripMargin

  /** r10 `evaluate new_activity_metrics` — the 3-day-cohort retention
    * triangle over the first half of January. */
  val kqlNewActivityText: String =
    """Events
      || evaluate new_activity_metrics(user_id, ts, datetime(2024-01-01), datetime(2024-01-15), 3d)
      || sort by cohort_ms asc, bin_ms asc""".stripMargin

  /** r10 `percentilew` — weighted percentile (Spark's native frequency
    * argument; exact-percentile deviation documented at the
    * aggregate). */
  val kqlPercentilewText: String =
    """Events
      || extend wgt = toint(user_id % 5 + 1)
      || summarize p90w = percentilew(value, wgt, 90),
      |            parr = percentilesw_array(value, wgt, 50, 90) by event_type
      || project event_type, p90w = round(p90w, 6),
      |          p50a = round(todouble(parr[0]), 6), p90a = round(todouble(parr[1]), 6)
      || sort by event_type asc""".stripMargin

  /** r10 series similarity tier — dot product / magnitude / cosine /
    * Pearson over per-type daily count series: all 5×5 type pairs via a
    * k=1 cross join (25 rows — the series, not the pairing, carries the
    * data), upper triangle kept. Left-to-right fold determinism
    * documented at the series builders. dot is integer-valued (exact);
    * the fractional three ship as floor(x·10⁶) micro-units — slope-like
    * ratios of exact integer sums are small-denominator rationals, the
    * round(_, 6) cross-engine half-tie class. */
  val kqlSeriesSimilarityText: String =
    """let S = Events
      || where ts >= datetime(2024-01-01) and ts < datetime(2024-01-31)
      || make-series c = count() on ts from datetime(2024-01-01) to datetime(2024-01-31) step 1d by event_type
      || project event_type, c;
      |S
      || extend k = 1
      || join kind=inner (S | extend k = 1) on k
      || where event_type < event_type1
      || extend dot = series_dot_product(c, c1), cos_u = tolong(floor(series_cosine_similarity(c, c1) * 1000000.0, 1)), r_u = tolong(floor(series_pearson_correlation(c, c1) * 1000000.0, 1)), mag_u = tolong(floor(series_magnitude(c) * 1000000.0, 1))
      || project et_a = event_type, et_b = event_type1, dot, cos_u, r_u, mag_u
      || sort by et_a asc, et_b asc""".stripMargin

  /** r10 IPv4 tier — parse/mask/format/compare/range/private over a
    * datatable of edge cases (RFC1918 boundaries, /0, malformed octet,
    * non-IP). Every function is map-side integer arithmetic; null on
    * malformed input (deviations documented at the parser cases). */
  val kqlIpv4Text: String =
    """let Ips = datatable(ip:string, cidr:string)[
      |  '10.0.0.1', '10.0.0.0/8',
      |  '172.16.5.4', '172.16.0.0/12',
      |  '172.32.0.1', '172.16.0.0/12',
      |  '192.168.9.9', '192.168.0.0/16',
      |  '192.169.0.1', '192.168.0.0/16',
      |  '8.8.8.8', '8.8.8.0/24',
      |  '255.255.255.255', '0.0.0.0/0',
      |  '256.1.1.1', '10.0.0.0/8',
      |  'not-an-ip', '10.0.0.0/8'
      |];
      |Ips
      || extend ipl = parse_ipv4(ip)
      || extend masked = parse_ipv4_mask(ip, 20), inr = ipv4_is_in_range(ip, cidr), priv = ipv4_is_private(ip), cmp = ipv4_compare(ip, '172.16.5.4'), sfx = ipv4_netmask_suffix(cidr), fmt = format_ipv4(ipl)
      || project ip, ipl, masked, inr, priv, cmp, sfx, fmt
      || sort by ip asc""".stripMargin

  /** r10 URL tier — parse_url component struct, parse_urlquery map,
    * url_encode/url_decode (Java form-encoding semantics — uppercase
    * hex, space→'+' — documented at the parser). */
  val kqlParseUrlText: String =
    """let U = datatable(url:string)[
      |  'https://user:pw@example.com:8080/a/b/file.txt?x=1&y=%20z#frag',
      |  'http://example.org/index.html?x=hello+world',
      |  'https://h.io/p/q?x=v&k=1#s'
      |];
      |U
      || extend p = parse_url(url)
      || extend qp = parse_urlquery(extract('\\?([^#]*)', 1, url))
      || project url, scheme = p.Scheme, host = p.Host, port = p.Port, path = p.Path, user = p.Username, pw = p.Password, frag = p.Fragment, qx = p.QueryParameters['x'], qx2 = qp['x'], decy = url_decode(p.QueryParameters['y']), enc = url_encode(p.Path)
      || sort by url asc""".stripMargin

  /** r10 path/version tier — parse_path component struct over mixed
    * '/'- and '\'-separated paths, parse_version base-10^8 packing
    * (5-part and out-of-range inputs null). The packed version ships
    * as its STRING rendering, not DECIMAL(38,0): integer-decimal
    * digits are unambiguous across engines, whereas the driver's
    * DuckDB renders DECIMAL(38,0)/HUGEINT differently across versions
    * (the r10 hash-fail). Packing-order semantics stay pinned in
    * `KqlSpec`. */
  val kqlParsePathVersionText: String =
    """let P = datatable(p:string, v:string)[
      |  '/a/b/c/file.tar.gz', '1.2.3.4',
      |  'C:\dir\sub\name.txt', '10.0',
      |  'noslash', '1.2.3.4.5',
      |  '/root/x.y/z', '0.0.0.0'
      |];
      |P
      || extend pp = parse_path(p)
      || project p, root = pp.RootPath, dir = pp.DirectoryPath, dname = pp.DirectoryName, fname = pp.Filename, ext = pp.Extension, ver = tostring(parse_version(v))
      || sort by p asc""".stripMargin

  /** r10 `evaluate active_users_count` — engaged users per day: active
    * on ≥3 distinct days within the trailing 3-day window. */
  val kqlActiveUsersText: String =
    """Events
      || evaluate active_users_count(user_id, ts, datetime(2024-01-10), datetime(2024-01-20), 3d, 1d, 3, 1d)
      || sort by bin_ms asc""".stripMargin

  /** r10 HLL sketch tier — hll()/hll_merge() aggregates + dcount_hll()
    * estimate over Spark's DataSketches functions — registered as an
    * ERROR-BOUND AUDIT (r15 verdict #4: DuckDB has no DataSketches HLL
    * to mirror the raw estimate, so this was a weak rows-only check).
    * Each row carries the EXACT distinct count plus `ok` = the HLL
    * estimate (per-group, and merged across groups for the 'ALL' row —
    * the hll_merge path stays under test) landing within 5% of exact
    * (precision 12 ⇒ rsd ≈ 1.6%; 5% ≈ 3σ). The oracle computes the
    * exact sides and asserts ok = 1, so an out-of-bound estimate or a
    * broken merge hash-mismatches; merge-vs-direct bit-equality stays
    * pinned in `KqlSpec`/`SketchesSpec`. */
  val kqlHllText: String =
    """let H = Events | summarize h = hll(user_id, 12), exact = count_distinct(user_id) by event_type;
      |H
      || extend est = dcount_hll(h)
      || project event_type, exact, ok = tolong(iff(abs(todouble(est) - todouble(exact)) <= 0.05 * todouble(exact), 1, 0))
      || union (H | summarize m = hll_merge(h) | extend event_type = 'ALL'
      |         | join kind=inner (Events | summarize exact = count_distinct(user_id) | extend event_type = 'ALL') on event_type
      |         | extend est = dcount_hll(m)
      |         | project event_type, exact, ok = tolong(iff(abs(todouble(est) - todouble(exact)) <= 0.05 * todouble(exact), 1, 0)))
      || sort by event_type asc""".stripMargin

  /** r10 `evaluate sequence_detect` — users completing view → click →
    * purchase with ≤7d between steps and ≤14d end-to-end (first-anchor
    * greedy deviation documented at the verb). */
  val kqlSequenceDetectText: String =
    """Events
      || extend is_view = event_type == 'view', is_click = event_type == 'click', is_buy = event_type == 'purchase'
      || evaluate sequence_detect(ts, 7d, 14d, is_view, is_click, is_buy, user_id)
      || sort by user_id asc""".stripMargin

  /** r10 `evaluate session_count` — sessions started per day (a start =
    * no activity in the preceding 1d). */
  val kqlSessionCountText: String =
    """Events
      || evaluate session_count(user_id, ts, datetime(2024-01-05), datetime(2024-01-25), 1d, 1d)
      || sort by bin_ms asc""".stripMargin

  /** r10 `evaluate ipv4_lookup` — longest-prefix-match zone attribution
    * over overlapping CIDR blocks, then per-zone traffic rollup. */
  val kqlIpv4LookupText: String =
    """let Nets = datatable(network:string, zone:string)[
      |  '10.0.0.0/8', 'corp',
      |  '10.1.0.0/16', 'dc1',
      |  '10.2.0.0/16', 'dc2',
      |  '10.1.128.0/17', 'dc1hi'
      |];
      |Events
      || extend ip = strcat('10.', tostring(user_id % 4), '.', tostring(user_id % 250), '.7')
      || evaluate ipv4_lookup(Nets, ip, network)
      || summarize n = count(), users = dcount(user_id) by zone
      || sort by zone asc""".stripMargin

  /** r10 case-sensitive operator tier + `matches regex` + `in~` over a
    * casing-edge datatable (Java-regex deviation documented at the
    * rewrite). */
  val kqlStringOpsCsText: String =
    """let T = datatable(s:string)[
      |  'Spark rocks', 'spark rocks', 'reSpark', 'GPU go', 'gpu go', 'xGPUy'
      |];
      |T
      || extend c_cs = s contains_cs 'Spark', c_ci = s contains 'spark', h_cs = s has_cs 'GPU', h_ci = s has 'gpu', m = s matches regex '^[a-z]+ ', i1 = s in~ ('SPARK ROCKS', 'gpu go'), i2 = s !in~ ('reSpark')
      || sort by s asc""".stripMargin

  /** r10 `series_fir` / `series_iir` — 3-point moving average (FIR,
    * normalized) and exponential smoothing (IIR, α = 0.5) over the
    * per-type daily count series. Serialized as floor(x·10⁶)
    * micro-units, not round→DECIMAL: EMA values are dyadic rationals
    * m/2ᵏ, which is exactly the 6-dp half-tie class (odd m/2⁷
    * terminates with a 7th-digit 5, exactly representable in double —
    * the tie DuckDB versions resolve differently); floor of the
    * bit-identical double is version-independent. */
  val kqlSeriesFilterText: String =
    """let S = Events
      || where ts >= datetime(2024-01-01) and ts < datetime(2024-01-31)
      || make-series c = count() on ts from datetime(2024-01-01) to datetime(2024-01-31) step 1d by event_type
      || project event_type, c;
      |S
      || extend fir = series_fir(c, pack_array(1.0, 1.0, 1.0), true), ema = series_iir(c, pack_array(0.5), pack_array(1.0, -0.5))
      || extend firs = array_join(transform(fir, x -> string(tolong(floor(x * 1000000.0, 1)))), ','), emas = array_join(transform(ema, x -> string(tolong(floor(x * 1000000.0, 1)))), ',')
      || project event_type, firs, emas
      || sort by event_type asc""".stripMargin

  /** r10 `percentiles_array` — quartile array per event type over
    * exact integer CENTS (value is 2 dp), serialized as micro-units of
    * the original value scale. Quartile fractions are dyadic (f = k/4),
    * so both engines' lerp formulas — (1−f)a+fb and a+(b−a)·f — are
    * EXACT over integer order statistics and yield the same integral
    * double (cents·10⁴ micro); no round→DECIMAL half-tie surface. */
  val kqlPercentilesArrText: String =
    """Events
      || extend cents = tolong(floor(value * 100 + 0.5, 1))
      || summarize p = percentiles_array(cents, 25, 50, 75) by event_type
      || extend quartiles = array_join(transform(p, x -> string(tolong(x * 10000.0))), ',')
      || project event_type, quartiles
      || sort by event_type asc""".stripMargin

  /** r10 set/array manipulation tier — set algebra (sorted for the
    * order-unspecified deviation), rotate/shift/slice/iif over
    * range-generated arrays. */
  val kqlArrayOpsText: String =
    """range i from 1 to 3 step 1
      || extend a = pack_array(i, i + 1, i + 2, i * 2), b = pack_array(i + 1, tolong(4))
      || extend u = array_join(transform(array_sort_asc(set_union(a, b)), x -> tostring(x)), ','), it = array_join(transform(array_sort_asc(set_intersect(a, b)), x -> tostring(x)), ','), df = array_join(transform(array_sort_asc(set_difference(a, b)), x -> tostring(x)), ','), rl = array_join(transform(array_rotate_left(a, 1), x -> tostring(x)), ','), sl = array_join(transform(array_shift_left(a, 1, tolong(0)), x -> tostring(x)), ','), sc = array_join(transform(array_slice(a, 1, 2), x -> tostring(x)), ','), he = set_has_element(a, 4)
      || project i, u, it, df, rl, sl, sc, he
      || sort by i asc""".stripMargin

  /** r10 `evaluate funnel_sequence_completion` — weekly view→click→buy
    * funnel prefix counts (first-anchor greedy semantics shared with
    * sequence_detect). */
  val kqlFunnelCompletionText: String =
    """Events
      || extend is_view = event_type == 'view', is_click = event_type == 'click', is_buy = event_type == 'purchase'
      || evaluate funnel_sequence_completion(ts, 7d, datetime(2024-01-01), datetime(2024-01-29), 7d, is_view, is_click, is_buy, user_id)
      || sort by prefix asc, bin_ms asc""".stripMargin

  /** r10 `find` root verb — cross-table predicate search with source_
    * provenance and null-filled schema union. */
  val kqlFindText: String =
    """let A = datatable(id:long, city:string, amount:long)[
      |  1, 'Austin', 100, 2, 'Seattle', 200, 3, 'Austin', 300
      |];
      |let B = datatable(id:long, city:string, who:string)[
      |  7, 'Austin', 'ann', 8, 'Boston', 'bob'
      |];
      |find in (A, B) where city == 'Austin'
      || project source_, id, city, amount, who
      || sort by source_ asc, id asc""".stripMargin

  /** r10 `as` verb — binds the pre-filter frame, then unions the bound
    * name back in: withsource labels must show the ROOT table name for
    * the piped-in side and the BOUND name for the operand, and the
    * binding must capture the frame at bind time (before the where). */
  val kqlAsUnionText: String =
    """let threshold = 150;
      |Orders
      || as AllOrders
      || where amount >= threshold
      || union withsource=src (AllOrders)
      || summarize n = count(), total = sum(amount) by src
      || sort by src asc""".stripMargin

  /** r10 `scan` — the ADX stateful sequence-matcher as a distributed
    * per-user funnel (greedy single-match deviation documented at the
    * verb): view→purchase matches per user, verified against a DuckDB
    * RECURSIVE-CTE replay of the same state machine (iteration depth =
    * max events per user, so the slice keeps users < 8). */
  val kqlScanFunnelText: String =
    """Events
      || where user_id < 8
      || project user_id, ts, event_id, event_type
      || sort by user_id asc, ts asc, event_id asc
      || scan with_match_id=m by user_id with ( step sawview: event_type == 'view'; step bought: event_type == 'purchase'; )
      || summarize n_rows = count(), matches = countif(step == 'bought'), last_match = max(m) by user_id
      || sort by user_id asc""".stripMargin

  /** r10 `evaluate narrow` — the transpose plugin (key + one
    * (Column, Value) string pair per value column). */
  val kqlNarrowText: String =
    """Orders
      || project orderid, city, amount
      || evaluate narrow()
      || sort by orderid asc, Column asc""".stripMargin

  /** r10 graph tier: customer→city→region reachability as a two-hop
    * `graph-match` over a mixed edge list (derived customer-city edges
    * unioned with a datatable city-region dim) — each hop is one
    * equi-join, verified against the plain-join oracle. */
  val kqlGraphMatchText: String =
    """let CityRegion = datatable(src:string, dst:string)[
      |  'New Delhi','APAC','Seattle','WEST','New York','EAST',
      |  'Austin','SOUTH','Chicago','MIDWEST','Cleveland','MIDWEST'];
      |let CustCity = Orders | distinct custid, city | project src = strcat('u', tostring(custid)), dst = city;
      |CustCity
      || union (CityRegion)
      || make-graph src --> dst
      || graph-match (u)-[e1]->(c)-[e2]->(r) where r.id == 'MIDWEST' project uid = u.id, city = c.id
      || summarize n = count() by city
      || sort by city asc""".stripMargin

  /** r16 `graph-to-table` — the make-graph view exported back to
    * tabular form: the DERIVED node set (distinct union of edge
    * endpoints, no node-property table attached) rolled up by id
    * prefix, so both the union-distinct derivation and the
    * with_node_id naming are under the oracle. */
  val kqlGraphToTableText: String =
    """let CityRegion = datatable(src:string, dst:string)[
      |  'New Delhi','APAC','Seattle','WEST','New York','EAST',
      |  'Austin','SOUTH','Chicago','MIDWEST','Cleveland','MIDWEST'];
      |let CustCity = Orders | distinct custid, city | project src = strcat('u', tostring(custid)), dst = city;
      |CustCity
      || union (CityRegion)
      || make-graph src --> dst
      || graph-to-table nodes with_node_id=node
      || summarize n = count(), first_node = min(node) by prefix = substring(node, 0, 1)
      || sort by prefix asc""".stripMargin

  /** r10 `graph-shortest-paths` — distributed BFS over the make-graph
    * edge list. Customers reach WORLD through city→region→WORLD (3
    * hops), except Chicago customers, for whom a direct Chicago→WORLD
    * shortcut exists — the hop histogram therefore pins that SHORTEST
    * (not merely some) path lengths are reported: a walk enumerator
    * would also find the 3-hop Chicago route, BFS first-arrival must
    * not. */
  val kqlShortestPathsText: String =
    """let CityRegion = datatable(src:string, dst:string)[
      |  'New Delhi','APAC','Seattle','WEST','New York','EAST',
      |  'Austin','SOUTH','Chicago','MIDWEST','Cleveland','MIDWEST'];
      |let ToWorld = datatable(src:string, dst:string)[
      |  'APAC','WORLD','WEST','WORLD','EAST','WORLD','SOUTH','WORLD',
      |  'MIDWEST','WORLD','Chicago','WORLD'];
      |let CustCity = Orders | distinct custid, city | project src = strcat('u', tostring(custid)), dst = city;
      |CustCity
      || union (CityRegion)
      || union (ToWorld)
      || make-graph src --> dst
      || graph-shortest-paths output=any (a)-[e*1..4]->(b) where a.id startswith 'u' and b.id == 'WORLD' project uid = a.id, hops = array_length(e)
      || summarize n = count() by hops
      || sort by hops asc""".stripMargin

  /** r10 `invoke` — a tabular function let applied to the piped frame
    * (the reusable-query-fragment idiom ADX users lean on). */
  val kqlInvokeText: String =
    """let HighValue = (T:(*)) { T | where amount >= 150 | summarize n = count(), total = sum(amount) by city };
      |Orders
      || invoke HighValue()
      || sort by city asc""".stripMargin

  /** r10 bitwise-aggregate tier + conditional take-any: the ADX
    * `binary_all_or/and/xor` reducers (Spark bit_or/bit_and/bit_xor)
    * and `take_anyif` (deterministic min-over-matching, same
    * strengthening as take_any), plus `tohex`/`bitset_count_ones`
    * scalars. */
  val kqlBitwiseText: String =
    """Orders
      || extend b = toint(amount % 16)
      || summarize all_or = binary_all_or(b), all_and = binary_all_and(b),
      |            all_xor = binary_all_xor(b), ones = sum(bitset_count_ones(b)),
      |            big_hex = take_anyif(tohex(amount), amount >= 180) by city
      || sort by city asc""".stripMargin

  /** r17 `ipv4_is_match` — prefix-notation equality (the security-query
    * staple): effective prefix = min of each argument's own "/p" suffix
    * and the optional prefix argument; malformed input nulls out (and
    * iff(null) takes the else branch). Oracle hard-codes the expected
    * booleans per hand-checked row. */
  val kqlIpv4MatchText: String =
    """let T = datatable(name:string, ip1:string, ip2:string)[
      |  'eq', '192.168.1.1', '192.168.1.1',
      |  'neq', '192.168.1.1', '192.168.1.9',
      |  'cidr24', '192.168.1.1/24', '192.168.1.200',
      |  'cidr_both', '10.0.0.1/16', '10.0.200.1/24',
      |  'bad', '300.1.2.3', '10.0.0.1'
      |];
      |T
      || extend m = tolong(iff(ipv4_is_match(ip1, ip2), 1, 0)),
      |         m24 = tolong(iff(ipv4_is_match(ip1, ip2, 24), 1, 0)),
      |         m30 = tolong(iff(ipv4_is_match(ip1, ip2, 30), 1, 0))
      || project name, m, m24, m30
      || sort by name asc""".stripMargin

  /** r17 hash tier 2 — `hash_many` / `hash_combine` / `hash_xxhash64`.
    * Bit values are engine-specific (the hash() deviation, pinned in
    * KqlSpec); the CROSS-ENGINE oracle asserts the properties a
    * sharding/dedup consumer depends on: injectivity at corpus scale
    * (distinct hashes = distinct keys), the pmod range contract, and
    * hash_combine's argument-order sensitivity. */
  val kqlHashFuncsText: String =
    """Orders
      || extend hm = hash_many(city, orderid), hx = hash_xxhash64(city),
      |         hxm = hash_xxhash64(orderid, 97),
      |         hc_ab = hash_combine(hash(city), hash(orderid)),
      |         hc_ba = hash_combine(hash(orderid), hash(city))
      || summarize n_keys = count_distinct(strcat(city, '|', tostring(orderid))),
      |            n_hm = count_distinct(hm),
      |            n_cities = count_distinct(city), n_hx = count_distinct(hx),
      |            mod_min = min(hxm), mod_max = max(hxm),
      |            n_osens = countif(hc_ab != hc_ba), n = count()
      || project n_keys,
      |          inj_hm = tolong(iff(n_hm == n_keys, 1, 0)),
      |          inj_hx = tolong(iff(n_hx == n_cities, 1, 0)),
      |          mod_ok = tolong(iff(mod_min >= 0 and mod_max <= 96, 1, 0)),
      |          osens = tolong(iff(n_osens == n, 1, 0))""".stripMargin

  /** r17 `geo_azimuth` — spherical initial bearing (deviation from the
    * WGS84 geodesic documented at the function), serialized in the
    * floor-micro-radian convention; the oracle mirrors the atan2 chain
    * op-for-op including the explicit fmod normalization. */
  val kqlGeoAzimuthText: String =
    """let P = datatable(name:string, lon:real, lat:real)[
      |  'osl', 10.75, 59.91,
      |  'syd', 151.21, -33.87,
      |  'sam', -170.70, -14.27,
      |  'rey', -21.94, 64.15,
      |  'bad', 200.0, 10.0
      |];
      |P
      || extend az_cph = tolong(floor(geo_azimuth(lon, lat, 12.57, 55.69) * 1000000.0, 1)),
      |         az_back = tolong(floor(geo_azimuth(12.57, 55.69, lon, lat) * 1000000.0, 1)),
      |         ang = tolong(floor(geo_angle(10.75, 59.91, lon, lat, 12.57, 55.69) * 1000000.0, 1))
      || project name, az_cph, az_back, ang
      || sort by name asc""".stripMargin

  /** r17 `geo_closest_point_on_polygon` + `geo_s2cell_to_polygon` —
    * the closest-point foot over the dent ring (inside → the point
    * itself; the `kql_geo_closest` argmin mirror over the ring's 5
    * edges) and the cell rectangle's self-consistency flags (center
    * inside its own planar quad, ring closed at 5 vertices — the
    * corner chain itself is native S2 math the oracle can't replay,
    * the sketch-audit convention). */
  val kqlGeoPolygons3Text: String =
    """let poly = parse_json('{"type":"Polygon","coordinates":[[[-5.0,45.0],[5.0,43.0],[12.0,50.0],[0.0,47.5],[-8.0,52.0],[-5.0,45.0]]]}');
      |Orders
      || where orderid < 500
      || extend lon = todouble(orderid % 4000) / 100.0 - 20.0, lat = 40.0 + todouble(custid % 1000) / 50.0
      || extend cp = geo_closest_point_on_polygon(lon, lat, poly)
      || extend cx_u = tolong(floor(todouble(cp.coordinates[0]) * 1000000.0, 1)),
      |         cy_u = tolong(floor(todouble(cp.coordinates[1]) * 1000000.0, 1))
      || extend cell = geo_point_to_s2cell(lon, lat, 7)
      || extend cpoly = geo_s2cell_to_polygon(cell), cc = geo_s2cell_to_central_point(cell)
      || extend c_in = tolong(iff(geo_point_in_polygon(todouble(cc.coordinates[0]), todouble(cc.coordinates[1]), cpoly), 1, 0)),
      |         closed = tolong(iff(tostring(cpoly.coordinates[0][0]) == tostring(cpoly.coordinates[0][4]), 1, 0))
      || summarize n = count(), in_ok = min(c_in), ring_ok = min(closed),
      |            cx_sum = sum(cx_u), cy_sum = sum(cy_u) by city
      || sort by city asc""".stripMargin

  /** r17 `geo_distance_point_to_polygon` — 0 inside, point-to-boundary
    * distance outside, over the non-convex dent ring (same derived
    * point field as `kql_geo_polygon`). The oracle combines that
    * query's even-odd crossing CTE with `kql_geo_closest`'s
    * point-to-segment distance mirror (the closed ring's 5 edges ARE
    * the boundary segments; mean-latitude fold over all 6 ring
    * vertices, matching graft_geo_dist_line's left-to-right fold). */
  val kqlGeoDistPolygonText: String =
    """let poly = parse_json('{"type":"Polygon","coordinates":[[[-5.0,45.0],[5.0,43.0],[12.0,50.0],[0.0,47.5],[-8.0,52.0],[-5.0,45.0]]]}');
      |Orders
      || extend lon = todouble(orderid % 4000) / 100.0 - 20.0, lat = 40.0 + todouble(custid % 1000) / 50.0
      || extend d = geo_distance_point_to_polygon(lon, lat, poly)
      || summarize n_zero = countif(d == 0.0), d_max = max(tolong(floor(d, 1))),
      |            d_sum = sum(tolong(floor(d, 1))) by city
      || sort by city asc""".stripMargin

  /** r17 string tier 3 — `replace_strings` (sequential pair fold),
    * `bag_pack_columns` (column-name-keyed bag), and the IDNA domain
    * punycode pair (`punycode_domain_from_string` round-tripped; the
    * ACE form of 'bücher' is the RFC 3492 / IDNA documented
    * 'xn--bcher-kva'). */
  val kqlStringFuncs3Text: String =
    """Orders
      || where orderid < 150
      || extend fixed = replace_strings(city, dynamic(['New ', 'e']), dynamic(['Old ', 'E'])),
      |         bs = tostring(bag_pack_columns(city, orderid)),
      |         dom = strcat('bücher.', tolower(replace_string(city, ' ', '-')), '.example.com')
      || extend ace = punycode_domain_from_string(dom),
      |         rt = tolong(iff(punycode_domain_to_string(punycode_domain_from_string(dom)) == dom, 1, 0))
      || project orderid, fixed, bs, ace, rt
      || sort by orderid asc""".stripMargin

  /** r17 `series_periods_validate` — scores the GIVEN candidate periods
    * (3 and 7 days) over the same dense daily count series as
    * `kql_periods_detect`, output in argument order (kernel deviation
    * documented at the function). */
  val kqlPeriodsValidateText: String =
    """Events
      || make-series n = count() on ts from datetime(2024-01-01) to datetime(2024-01-31) step 1d by event_type
      || extend pv = series_periods_validate(n, 3, 7)
      || project event_type, p1 = tolong(pv.periods[0]), s1 = tolong(pv.scores[0]),
      |          p2 = tolong(pv.periods[1]), s2 = tolong(pv.scores[1])
      || sort by event_type asc""".stripMargin

  /** r17 pass-through scalar tier — the ADX math names whose Spark SQL
    * equivalents are name-and-semantics identical (abs/sign/sqrt/exp/
    * log family/pow/atan2/cot/degrees/radians/pi, and the null tier
    * coalesce/isnull/isnotnull). No parser case exists for these BY
    * DESIGN (they pass through the scalar rewriter untouched); this
    * query pins that the pass-through seam actually works end-to-end.
    * NOTE for the oracle: DuckDB's log() is log10 — natural log is
    * ln() there, log() here. */
  val kqlPassthroughScalarsText: String =
    """Orders
      || where orderid < 200
      || extend v = todouble(amount)
      || extend r_abs = tolong(abs(-1.0 * v)), r_sign = tolong(sign(v - 150.0)),
      |         r_sqrt = tolong(floor(sqrt(v) * 1000000.0, 1)),
      |         r_exp = tolong(floor(exp(v / 100.0) * 1000000.0, 1)),
      |         r_log = tolong(floor(log(v) * 1000000.0, 1)),
      |         r_log10 = tolong(floor(log10(v) * 1000000.0, 1)),
      |         r_log2 = tolong(floor(log2(v) * 1000000.0, 1)),
      |         r_pow = tolong(floor(pow(v, 1.5), 1)),
      |         r_atan2 = tolong(floor(atan2(v, 100.0) * 1000000.0, 1)),
      |         r_cot = tolong(floor(cot(v / 100.0) * 1000000.0, 1)),
      |         r_deg = tolong(floor(degrees(v / 100.0) * 1000000.0, 1)),
      |         r_rad = tolong(floor(radians(v) * 1000000.0, 1)),
      |         r_pi = tolong(floor(pi() * 1000000.0, 1)),
      |         r_coal = coalesce(city, 'x'),
      |         r_isnull = tolong(iff(isnull(city), 1, 0)),
      |         r_isnotnull = tolong(iff(isnotnull(city), 1, 0))
      || project orderid, r_abs, r_sign, r_sqrt, r_exp, r_log, r_log10, r_log2,
      |          r_pow, r_atan2, r_cot, r_deg, r_rad, r_pi, r_coal, r_isnull, r_isnotnull
      || sort by orderid asc""".stripMargin

  /** r17 `tdigest` / `percentile_tdigest` / `rank_tdigest` — the
    * quantile sketch tier (equi-depth deterministic deviation from
    * Dunning's t-digest, documented at the aggregate): per-city
    * digests over the INTEGER amount column (one-rounded chunk means
    * — cross-engine exact), read back as p50/p90 and a rank. The
    * oracle replays the sorted-chunk construction with the closed-form
    * chunk index ((rn+1)·32 − 1) // n. */
  val kqlTdigestText: String =
    """Orders
      || summarize d = tdigest(amount) by city
      || extend p50 = percentile_tdigest(d, 50), p90 = percentile_tdigest(d, 90),
      |         rk = rank_tdigest(d, 150), nc = tolong(array_length(d))
      || project city, p50, p90, rk, nc
      || sort by city asc""".stripMargin

  /** r17 `tdigest_merge` — the mergeability half of the sketch
    * contract: per-city digests pooled into one global digest
    * (equal-weight re-chunk, weighted means one-rounded), read back as
    * global percentiles + rank. The oracle replays the merge with a
    * window cumulative-before and an ORDERED list_reduce (the engine's
    * left-to-right fold). */
  val kqlTdigestMergeText: String =
    """Orders
      || summarize d = tdigest(amount) by city
      || summarize md = tdigest_merge(d)
      || project gp50 = percentile_tdigest(md, 50), gp99 = percentile_tdigest(md, 99),
      |          grk = rank_tdigest(md, 150), gnc = tolong(array_length(md))""".stripMargin

  /** r17 `geo_intersects_2polygons` / `geo_intersects_line_with_polygon`
    * — the boundary-crossing-or-containment composition over the dent
    * ring (per-row square/line geometries built through bag_pack, so
    * the variant path is exercised end-to-end). The oracle mirrors the
    * orientation + on-segment tests and the even-odd containment
    * op-for-op (pure double arithmetic, no trig). */
  val kqlGeoIntersectsText: String =
    """let poly = parse_json('{"type":"Polygon","coordinates":[[[-5.0,45.0],[5.0,43.0],[12.0,50.0],[0.0,47.5],[-8.0,52.0],[-5.0,45.0]]]}');
      |Orders
      || where orderid < 2000
      || extend lon = todouble(orderid % 4000) / 100.0 - 20.0, lat = 40.0 + todouble(custid % 1000) / 50.0
      || extend ln = bag_pack('type', 'LineString', 'coordinates',
      |                       pack_array(pack_array(lon, lat), pack_array(lon + 3.0, lat + 3.0))),
      |         sq = bag_pack('type', 'Polygon', 'coordinates',
      |                       pack_array(pack_array(pack_array(lon, lat), pack_array(lon + 2.0, lat),
      |                                  pack_array(lon + 2.0, lat + 2.0), pack_array(lon, lat + 2.0),
      |                                  pack_array(lon, lat))))
      || extend ilp = tolong(iff(geo_intersects_line_with_polygon(ln, poly), 1, 0)),
      |         ipp = tolong(iff(geo_intersects_2polygons(sq, poly), 1, 0))
      || summarize n = count(), n_ilp = sum(ilp), n_ipp = sum(ipp) by city
      || sort by city asc""".stripMargin

  /** r17 `geo_line_locate_point` / `geo_line_interpolate_point` — the
    * along-line walk pair over a fixed 3-edge route: locate = argmin
    * foot's cumulative position (the kql_geo_closest mirror extended
    * with a running length), interpolate = the clamped meter walk
    * lerping the landing segment in degrees. Distances from the
    * integer amount column so clamp paths (past-the-end) are
    * exercised. */
  val kqlGeoLineWalkText: String =
    """let route = parse_json('{"type":"LineString","coordinates":[[10.0,50.0],[10.5,50.2],[10.5,50.6],[11.0,50.8]]}');
      |Orders
      || where orderid < 1000
      || extend lon = 9.8 + todouble(orderid % 200) / 100.0, lat = 49.9 + todouble(custid % 120) / 100.0
      || extend pos = tolong(floor(geo_line_locate_point(route, lon, lat), 1))
      || extend ip = geo_line_interpolate_point(route, todouble(amount - 100) * 1000.0)
      || extend ix_u = tolong(floor(todouble(ip.coordinates[0]) * 1000000.0, 1)),
      |         iy_u = tolong(floor(todouble(ip.coordinates[1]) * 1000000.0, 1))
      || summarize n = count(), pos_sum = sum(pos), ix_sum = sum(ix_u), iy_sum = sum(iy_u) by city
      || sort by city asc""".stripMargin

  /** r18 `geo_intersection_2lines` — the point-emitting sibling of the
    * intersects predicate, over INTEGER-VALUED per-row segment pairs so
    * every cross product, the t division (t = (d+4)/8, a dyadic
    * rational), and the emitted coordinates are EXACT doubles — the
    * oracle replays them in closed form (gx = x + (d+4)/2). d ∈ 0..6
    * sweeps proper crossings (d < 4), the shared-endpoint touch
    * (d = 4 — the o-zero arm, no division), and disjoint (d > 4 →
    * empty GeometryCollection); the l1 ∩ l3 pair is a collinear
    * overlap whose deviation (overlap ENDPOINTS as MultiPoint,
    * documented at the builder) pins to [x+2, x+4]. */
  val kqlGeoIntersection2Text: String =
    """Orders
      || where orderid < 4000
      || extend x = todouble(orderid % 40), y = todouble(custid % 40), d = todouble(orderid % 7)
      || extend l1 = bag_pack('type', 'LineString', 'coordinates',
      |                       pack_array(pack_array(x, y), pack_array(x + 4.0, y + 4.0))),
      |         l2 = bag_pack('type', 'LineString', 'coordinates',
      |                       pack_array(pack_array(x + d, y + 4.0), pack_array(x + d + 4.0, y))),
      |         l3 = bag_pack('type', 'LineString', 'coordinates',
      |                       pack_array(pack_array(x + 2.0, y + 2.0), pack_array(x + 6.0, y + 6.0)))
      || extend g = geo_intersection_2lines(l1, l2), m = geo_intersection_2lines(l1, l3)
      || extend gt = tostring(g.type),
      |         gx = todouble(g.coordinates[0]), gy = todouble(g.coordinates[1]),
      |         m0 = todouble(m.coordinates[0][0]), m1 = todouble(m.coordinates[1][0])
      || summarize n = count(), n_pt = countif(gt == 'Point'),
      |            n_mp = countif(tostring(m.type) == 'MultiPoint'),
      |            sgx = sum(iff(gt == 'Point', tolong(floor(gx * 1000000.0, 1)), 0)),
      |            sgy = sum(iff(gt == 'Point', tolong(floor(gy * 1000000.0, 1)), 0)),
      |            sm = sum(tolong(floor((m0 + m1) * 1000000.0, 1))) by city
      || sort by city asc""".stripMargin

  /** r18 `ipv4_range_to_cidr_list` (+ format_ipv4 as the range
    * builder): per-row data-derived [lo, lo + span] ranges; the oracle
    * replays the SAME integer-only greedy (alignment = cur & −cur,
    * OR-cascade highest-bit, bit_count prefix width) as a recursive
    * CTE and re-joins the per-row cidr strings in emission order, so
    * the count AND the exact string forms cross engines. */
  val kqlIpv4CidrListText: String =
    """Orders
      || where orderid < 3000
      || extend lo = 167772160 + (orderid % 65536) * 256 + custid % 256
      || extend start = format_ipv4(lo), fin = format_ipv4(lo + orderid % 1000)
      || extend cl = ipv4_range_to_cidr_list(start, fin)
      || extend nc = tolong(array_length(cl)), cs = strcat_array(cl, ';')
      || summarize n = count(), snc = sum(nc), cs_min = min(cs), cs_max = max(cs) by city
      || sort by city asc""".stripMargin

  /** r18 `geo_h3cell_compact` / `geo_h3cell_uncompact` — the sibling
    * folds over the center-containment hierarchy, pinned as INVARIANT
    * AUDITS over the H3 vector set (the sketch_approx convention: cell
    * tokens are engine-specific, so the cross-engine contract is the
    * property set — compact(children(c)) = [c], uncompact([c]) =
    * children(c), a partial sibling set stays unfolded, same-res
    * uncompact is identity, and a mixed-res input folds only the
    * complete family): the oracle asserts the flags; KqlSpec pins the
    * concrete arrays. Two sites pin the DEGENERATE regime: 'gw' (a
    * face-edge equator point) and 'npole' sit where ownership clipping
    * leaves a SINGLETON family up the chain (children(parent(c4)) ==
    * [c4]), so compact lawfully folds PAST the input resolution (the
    * parent's res-4 territory is exactly c4) — and because uncompact
    * expands by DIRECT gap enumeration while center-containment is not
    * transitive across levels, the round-trip flags there are pinned
    * FALSE (0), the family-fold flags on the six generic sites TRUE. */
  val kqlGeoH3CompactText: String =
    """let P = datatable(name:string, lon:real, lat:real)[
      |  'equ', -20.905, 0.0,
      |  'gw', 0.0, 0.0,
      |  'paris', 2.35, 48.86,
      |  'syd', 151.21, -33.87,
      |  'npole', 20.0, 90.0,
      |  'rio', -43.2, -22.9,
      |  'tok', 139.7, 35.7,
      |  'cpt', 18.4, -33.9
      |];
      |P
      || extend c4 = geo_point_to_h3cell(lon, lat, 4),
      |         cb = geo_point_to_h3cell(lon + 9.0, lat - 9.0, 4)
      || extend ch = geo_h3cell_children(c4, 5)
      || extend cc = geo_h3cell_compact(ch)
      || extend rt = geo_h3cell_uncompact(cc, 5)
      || extend part = array_slice(ch, 1, array_length(ch) - 1)
      || extend mix = geo_h3cell_compact(array_concat(ch, pack_array(cb)))
      || project name,
      |    ok_fold = tolong(iff(array_length(cc) == 1 and tostring(cc[0]) == c4, 1, 0)),
      |    ok_rt = tolong(iff(tostring(rt) == tostring(array_sort_asc(ch)), 1, 0)),
      |    ok_part = tolong(iff(tostring(geo_h3cell_compact(part)) == tostring(array_sort_asc(part)), 1, 0)),
      |    ok_id = tolong(iff(tostring(geo_h3cell_uncompact(pack_array(c4), 4)) == tostring(pack_array(c4)), 1, 0)),
      |    ok_mix = tolong(iff(tostring(mix) == tostring(array_sort_asc(array_concat(pack_array(c4), pack_array(cb)))), 1, 0))
      || sort by name asc""".stripMargin

  /** r18 `buildschema` — the last documented ADX aggregation: the
    * minimal schema admitting every dynamic value in the group, via
    * the native partial+final [[graft.functions.BuildSchemaAgg]]
    * (schema language + deviations documented there). Fixed vectors
    * spanning scalar/object/array unions, nested objects, and a
    * top-level mixed-kind group; the oracle is the hand-derived
    * schema literal per group. */
  val kqlBuildschemaText: String =
    """let D = datatable(g:string, v:string)[
      |  'a', '{"x":1,"y":3.5}',
      |  'a', '{"x":"s","y":{"w":"z"}}',
      |  'b', '{"x":[1,2],"y":{"w":5,"v":true}}',
      |  'b', '[1,"a"]',
      |  'b', '7'
      |];
      |D
      || extend dv = todynamic(v)
      || summarize sc = buildschema(dv) by g
      || project g, s = tostring(dynamic_to_json(sc))
      || sort by g asc""".stripMargin

  /** r18 `evaluate geo_polygon_lookup` — the cover-join machinery of
    * [[kqlGeoPolygonJoinText]] re-exposed as ADX's lookup plugin: TWO
    * fences (the non-convex dent ring + a disjoint box, so per-fence
    * attribution is visible), matched rows keep source + lookup
    * columns. Oracle: the INDEPENDENT all-points even-odd formulation
    * per fence — zero cell arithmetic, a cover miss fails the compare. */
  val kqlGeoPolygonLookupText: String =
    """let F = datatable(fence:string, pj:string)[
      |  'dent', '{"type":"Polygon","coordinates":[[[-5.0,45.0],[5.0,43.0],[12.0,50.0],[0.0,47.5],[-8.0,52.0],[-5.0,45.0]]]}',
      |  'box', '{"type":"Polygon","coordinates":[[[-18.0,41.0],[-10.0,41.0],[-10.0,49.0],[-18.0,49.0],[-18.0,41.0]]]}'
      |];
      |Orders
      || extend lon = todouble(orderid % 4000) / 100.0 - 20.0, lat = 40.0 + todouble(custid % 1000) / 50.0
      || evaluate geo_polygon_lookup((F | extend poly = todynamic(pj) | project fence, poly), poly, lon, lat)
      || summarize n = count(), lon_min_u = min(tolong(floor(lon * 1000000.0, 1))),
      |            lat_max_u = max(tolong(floor(lat * 1000000.0, 1))) by city, fence
      || sort by city asc, fence asc""".stripMargin

  /** r18 `evaluate geo_line_lookup` — the corridor join of
    * [[kqlGeoLineJoinText]] as the lookup plugin: two routes, 25 km
    * tolerance at level 7 (inside the one-ring completeness bound).
    * Oracle: the independent all-points distance formulation per
    * route, mirrored op-for-op. */
  val kqlGeoLineLookupText: String =
    """let R = datatable(route_id:string, lj:string)[
      |  'r1', '{"type":"LineString","coordinates":[[-15.0,10.0],[-5.0,14.0],[5.0,12.0],[15.0,20.0],[25.0,26.0]]}',
      |  'r2', '{"type":"LineString","coordinates":[[-25.0,30.0],[-15.0,26.0],[-5.0,28.0]]}'
      |];
      |Orders
      || extend lon = todouble(orderid % 6000) / 100.0 - 30.0, lat = 5.0 + todouble(custid % 1400) / 50.0
      || evaluate geo_line_lookup((R | extend line = todynamic(lj) | project route_id, line), line, lon, lat, 25000.0)
      || extend d_m = geo_distance_point_to_line(lon, lat, line)
      || summarize n = count(), d_min_m = min(tolong(floor(d_m, 1))),
      |            d_max_m = max(tolong(floor(d_m, 1))) by city, route_id
      || sort by city asc, route_id asc""".stripMargin

  /** r18 buffer/simplify tier (`geo_point_buffer`, `geo_line_buffer`,
    * `geo_polygon_buffer`, `geo_line_simplify`) — per-row buffers over
    * integer-valued geometries, audited by in/out point probes whose
    * TRUTH is closed-form (probe at r/2 is inside any ≥0.98r-apothem
    * 16-gon, probe at 2r is outside; offsets taken in pure latitude so
    * no kx enters), plus a simplify vertex-count whose spike height is
    * data-derived ((amount−100)·2 m against a 149 m tolerance — odd,
    * so no row sits on the boundary and float noise cannot flip it).
    * The oracle states the closed forms; KqlSpec pins the shapes. */
  val kqlGeoBuffersText: String =
    """Orders
      || where orderid < 2000
      || extend x = todouble(orderid % 30), y = todouble(custid % 30),
      |         h = todouble(amount - 100) * 2.0
      || extend pb = geo_point_buffer(x, y, 50000.0)
      || extend ln = bag_pack('type', 'LineString', 'coordinates',
      |                       pack_array(pack_array(x, y), pack_array(x + 2.0, y)))
      || extend lb = geo_line_buffer(ln, 50000.0)
      || extend sqp = bag_pack('type', 'Polygon', 'coordinates', pack_array(pack_array(
      |      pack_array(x, y), pack_array(x + 2.0, y), pack_array(x + 2.0, y + 2.0),
      |      pack_array(x, y + 2.0), pack_array(x, y))))
      || extend gb = geo_polygon_buffer(sqp, 50000.0)
      || extend ln3 = bag_pack('type', 'LineString', 'coordinates',
      |      pack_array(pack_array(x, y), pack_array(x + 1.0, y + h / 110574.0),
      |                 pack_array(x + 2.0, y)))
      || extend sl = geo_line_simplify(ln3, 149.0)
      || extend pb_in = tolong(iff(geo_point_in_polygon(x, y + 50000.0 / 221148.0, pb), 1, 0)),
      |         pb_out = tolong(iff(geo_point_in_polygon(x, y + 100000.0 / 110574.0, pb), 1, 0)),
      |         lb_in = tolong(iff(geo_point_in_polygon(x + 1.0, y, lb), 1, 0)),
      |         lb_out = tolong(iff(geo_point_in_polygon(x + 1.0, y + 100000.0 / 110574.0, lb), 1, 0)),
      |         gb_in = tolong(iff(geo_point_in_polygon(x + 1.0, y + 2.0 + 25000.0 / 110574.0, gb), 1, 0)),
      |         gb_out = tolong(iff(geo_point_in_polygon(x + 1.0, y + 2.0 + 100000.0 / 110574.0, gb), 1, 0)),
      |         n_simp = 2 + tolong(iff(isnotnull(todouble(sl.coordinates[2][0])), 1, 0))
      || summarize n = count(), s_pb_in = sum(pb_in), s_pb_out = sum(pb_out),
      |            s_lb_in = sum(lb_in), s_lb_out = sum(lb_out),
      |            s_gb_in = sum(gb_in), s_gb_out = sum(gb_out),
      |            s_simp = sum(n_simp) by city
      || sort by city asc""".stripMargin

  /** r18 boolean-operation tier (`geo_intersection_2polygons`,
    * `geo_union_polygons`, `geo_intersection_line_with_polygon`,
    * `geo_union_lines`) — per-row integer axis squares against a fixed
    * quarter-offset rectangle (corners can never land on each other's
    * edges, keeping every seam transversal), so the intersection
    * rectangle, its canonical first vertex (the lexicographic min =
    * (max(x, 10.25), max(y, 10.25))), the union's dissolved-vs-multi
    * type, and the clipped run's entry point are all CLOSED-FORM in
    * the oracle. */
  val kqlGeoPolygonOpsText: String =
    """let R = parse_json('{"type":"Polygon","coordinates":[[[10.25,10.25],[20.75,10.25],[20.75,20.75],[10.25,20.75],[10.25,10.25]]]}');
      |Orders
      || where orderid < 4000
      || extend x = todouble(orderid % 30), y = todouble(custid % 30)
      || extend a = bag_pack('type', 'Polygon', 'coordinates', pack_array(pack_array(
      |      pack_array(x, y), pack_array(x + 2.0, y), pack_array(x + 2.0, y + 2.0),
      |      pack_array(x, y + 2.0), pack_array(x, y))))
      || extend g = geo_intersection_2polygons(a, R),
      |         u = geo_union_polygons(pack_array(a, R)),
      |         ln = bag_pack('type', 'LineString', 'coordinates',
      |           pack_array(pack_array(x, y + 1.0), pack_array(x + 2.0, y + 1.0))),
      |         ln2 = bag_pack('type', 'LineString', 'coordinates',
      |           pack_array(pack_array(x, y + 3.0), pack_array(x + 2.0, y + 3.0)))
      || extend c = geo_intersection_line_with_polygon(ln, R),
      |         ml = geo_union_lines(pack_array(ln, ln2))
      || extend gt = tostring(g.type), ut = tostring(u.type),
      |         ct = tostring(c.type), mt = tostring(ml.type)
      || extend gx0 = todouble(g.coordinates[0][0][0]), gy0 = todouble(g.coordinates[0][0][1]),
      |         cx0 = todouble(c.coordinates[0][0])
      || summarize n = count(), n_poly = countif(gt == 'Polygon'),
      |    n_upoly = countif(ut == 'Polygon'), n_multi = countif(ut == 'MultiPolygon'),
      |    n_clip = countif(ct == 'LineString'), n_ml = countif(mt == 'MultiLineString'),
      |    sgx = sum(iff(gt == 'Polygon', tolong(floor(gx0 * 1000000.0, 1)), 0)),
      |    sgy = sum(iff(gt == 'Polygon', tolong(floor(gy0 * 1000000.0, 1)), 0)),
      |    scx = sum(iff(ct == 'LineString', tolong(floor(cx0 * 1000000.0, 1)), 0)) by city
      || sort by city asc""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kql_geo_buffers" -> kqlText(kqlGeoBuffersText) _,
    "kql_geo_polygon_ops" -> kqlText(kqlGeoPolygonOpsText) _,
    "kql_geo_polygon_lookup" -> kqlText(kqlGeoPolygonLookupText) _,
    "kql_geo_line_lookup" -> kqlText(kqlGeoLineLookupText) _,
    "kql_buildschema" -> kqlText(kqlBuildschemaText) _,
    "kql_geo_intersection2" -> kqlText(kqlGeoIntersection2Text) _,
    "kql_ipv4_cidr_list" -> kqlText(kqlIpv4CidrListText) _,
    "kql_geo_h3_compact" -> kqlText(kqlGeoH3CompactText) _,
    "kql_geo_line_walk" -> kqlText(kqlGeoLineWalkText) _,
    "kql_geo_intersects2" -> kqlText(kqlGeoIntersectsText) _,
    "kql_tdigest" -> kqlText(kqlTdigestText) _,
    "kql_tdigest_merge" -> kqlText(kqlTdigestMergeText) _,
    "kql_ipv4_match" -> kqlText(kqlIpv4MatchText) _,
    "kql_hash_funcs" -> kqlText(kqlHashFuncsText) _,
    "kql_geo_azimuth" -> kqlText(kqlGeoAzimuthText) _,
    "kql_geo_polygons3" -> kqlText(kqlGeoPolygons3Text) _,
    "kql_geo_dist_polygon" -> kqlText(kqlGeoDistPolygonText) _,
    "kql_string_funcs3" -> kqlText(kqlStringFuncs3Text) _,
    "kql_periods_validate" -> kqlText(kqlPeriodsValidateText) _,
    "kql_passthrough_scalars" -> kqlText(kqlPassthroughScalarsText) _,
    "kql_bitwise" -> kqlText(kqlBitwiseText) _,
    "kql_invoke" -> kqlText(kqlInvokeText) _,
    "kql_graph_match" -> kqlText(kqlGraphMatchText) _,
    "kql_graph_to_table" -> kqlText(kqlGraphToTableText) _,
    "kql_graph_shortest" -> kqlText(kqlShortestPathsText) _,
    "kql_scan_funnel" -> kqlText(kqlScanFunnelText) _,
    "kql_narrow" -> kqlText(kqlNarrowText) _,
    "kql_autocluster" -> kqlText(kqlAutoclusterText) _,
    "kql_bag_ops" -> kqlText(kqlBagOpsText) _,
    "kql_bag_ops2" -> kqlText(kqlBagOps2Text) _,
    "kql_preview" -> kqlText(kqlPreviewText) _,
    "kql_basket" -> kqlText(kqlBasketText) _,
    "kql_geo" -> kqlText(kqlGeoText) _,
    "kql_geo_s2" -> kqlText(kqlGeoS2Text) _,
    "kql_datetime_scalars" -> kqlText(kqlDatetimeScalarsText) _,
    "kql_pack_all" -> kqlText(kqlPackAllText) _,
    "kql_string_fns2" -> kqlText(kqlStringFns2Text) _,
    "kql_geo_s2_join" -> kqlText(kqlGeoS2JoinText) _,
    "kql_geo_h3" -> kqlText(kqlGeoH3Text) _,
    "kql_geo_h3_children" -> kqlText(kqlGeoH3ChildrenText) _,
    "kql_geo_h3_join" -> kqlText(kqlGeoH3JoinText) _,
    "kql_geo_h3_polygon_join" -> kqlText(kqlGeoH3PolygonJoinText) _,
    "kql_geo_h3_line_join" -> kqlText(kqlGeoH3LineJoinText) _,
    "kql_geo_join" -> kqlText(kqlGeoJoinText) _,
    "kql_geo_polygon" -> kqlText(kqlGeoPolygonText) _,
    "kql_geo_polygon_join" -> kqlText(kqlGeoPolygonJoinText) _,
    "kql_geo_line_join" -> kqlText(kqlGeoLineJoinText) _,
    "kql_make_bag" -> kqlText(kqlMakeBagText) _,
    "kql_ipv6" -> kqlText(kqlIpv6Text) _,
    "kql_geo_area" -> kqlText(kqlGeoAreaText) _,
    "kql_geo_measures" -> kqlText(kqlGeoMeasuresText) _,
    "kql_scalar_fns3" -> kqlText(kqlScalarFns3Text) _,
    "kql_scalar_fns4" -> kqlText(kqlScalarFns4Text) _,
    "kql_ip_fns2" -> kqlText(kqlIpFns2Text) _,
    "kql_series_trig" -> kqlText(kqlSeriesTrigText) _,
    "kql_convert_units" -> kqlText(kqlConvertUnitsText) _,
    "kql_geo_lines2" -> kqlText(kqlGeoLines2Text) _,
    "kql_stat_tests" -> kqlText(kqlStatTestsText) _,
    "kql_stat_tests2" -> kqlText(kqlStatTests2Text) _,
    "kql_codecs" -> kqlText(kqlCodecsText) _,
    "kql_url_csv" -> kqlText(kqlUrlCsvText) _,
    "kql_scalar_fns5" -> kqlText(kqlScalarFns5Text) _,
    "kql_guid_b64" -> kqlText(kqlGuidB64Text) _,
    "kql_json_cmdline" -> kqlText(kqlJsonCmdlineText) _,
    "kql_tz_index" -> kqlText(kqlTzIndexText) _,
    "kql_geo_densify" -> kqlText(kqlGeoDensifyText) _,
    "kql_geo_closest" -> kqlText(kqlGeoClosestText) _,
    "kql_geo_polygons2" -> kqlText(kqlGeoPolygons2Text) _,
    "kql_geo_h3_polygon2" -> kqlText(kqlGeoH3Polygon2Text) _,
    "kql_agg_variants" -> kqlText(kqlAggVariantsText) _,
    "kql_net_b64" -> kqlText(kqlNetB64Text) _,
    "kql_row_session" -> kqlText(kqlRowSessionText) _,
    "kql_column_ifexists" -> kqlText(kqlColumnIfExistsText) _,
    "kql_parse_ua" -> kqlText(kqlParseUaText) _,
    "kql_series_forecast" -> kqlText(kqlSeriesForecastText) _,
    "kql_series_fit2" -> kqlText(kqlSeriesFit2Text) _,
    "kql_series_fit_poly" -> kqlText(kqlSeriesFitPolyText) _,
    "kql_series_fft" -> kqlText(kqlSeriesFftText) _,
    "kql_series_fill" -> kqlText(kqlSeriesFillText) _,
    "kql_series_seasonal" -> kqlText(kqlSeriesSeasonalText) _,
    "kql_series_decompose2" -> kqlText(kqlSeriesDecomposeSeasonalText) _,
    "kql_format_bytes" -> kqlText(kqlFormatBytesText) _,
    "kql_parse_xml" -> kqlText(kqlParseXmlText) _,
    "kql_diffpatterns" -> kqlText(kqlDiffPatternsText) _,
    "kql_sliding_window" -> kqlText(kqlSlidingWindowText) _,
    "kql_activity_engagement" -> kqlText(kqlActivityEngagementText) _,
    "kql_reduce" -> kqlText(kqlReduceText) _,
    "kql_funnel_sequence" -> kqlText(kqlFunnelSequenceText) _,
    "kql_activity_counts" -> kqlText(kqlActivityCountsText) _,
    "kql_rolling_percentile" -> kqlText(kqlRollingPercentileText) _,
    "kql_periods_detect" -> kqlText(kqlPeriodsDetectText) _,
    "kql_fork" -> kqlText(kqlForkText) _,
    "kql_new_activity" -> kqlText(kqlNewActivityText) _,
    "kql_percentilew" -> kqlText(kqlPercentilewText) _,
    "kql_series_similarity" -> kqlText(kqlSeriesSimilarityText) _,
    "kql_ipv4" -> kqlText(kqlIpv4Text) _,
    "kql_active_users" -> kqlText(kqlActiveUsersText) _,
    "kql_hll_dcount" -> kqlText(kqlHllText) _,
    "kql_sequence_detect" -> kqlText(kqlSequenceDetectText) _,
    "kql_funnel_completion" -> kqlText(kqlFunnelCompletionText) _,
    "kql_find" -> kqlText(kqlFindText) _,
    "kql_session_count" -> kqlText(kqlSessionCountText) _,
    "kql_ipv4_lookup" -> kqlText(kqlIpv4LookupText) _,
    "kql_string_ops_cs" -> kqlText(kqlStringOpsCsText) _,
    "kql_series_filters" -> kqlText(kqlSeriesFilterText) _,
    "kql_percentiles_arr" -> kqlText(kqlPercentilesArrText) _,
    "kql_array_ops" -> kqlText(kqlArrayOpsText) _,
    "kql_parse_url" -> kqlText(kqlParseUrlText) _,
    "kql_parse_path_version" -> kqlText(kqlParsePathVersionText) _,
    "kql_as_union" -> kqlText(kqlAsUnionText) _,
    "kql_datetime_parts" -> kqlText(kqlDatetimePartsText) _,
    "kql_string_funcs" -> kqlText(kqlStringFuncsText) _,
    "kql_pack" -> kqlText(kqlPackText) _,
    "kql_row_rank" -> kqlText(kqlRowRankText) _,
    "kql_parse_kv" -> kqlText(kqlParseKvText) _,
    "kql_trim_take_any" -> kqlText(kqlTrimText) _,
    "kql_search_distinct" -> kqlText(kqlSearchDistinctText) _,
    "kql_partition_top" -> kqlText(kqlPartitionTopText) _,
    "kql_format_datetime" -> kqlText(kqlFormatDatetimeText) _,
    "kql_parse_where" -> kqlText(kqlParseWhereText) _,
    "kql_bag_unpack" -> kqlText(kqlBagUnpackText) _,
    "kql_facet" -> kqlText(kqlFacetText) _,
    "kql_series_anomalies" -> kqlText(kqlSeriesAnomaliesText) _,
    "kql_series_math" -> kqlText(kqlSeriesMathText) _,
    "kql_series_unary" -> kqlText(kqlSeriesUnaryText) _,
    "kql_filter_idioms" -> kqlText(kqlFilterIdiomsText) _,
    "kql_evaluate_pivot" -> kqlText(kqlEvaluatePivotText) _,
    "kql_top_hitters" -> kqlText(kqlTopHittersText) _,
    "kql_extract_split" -> kqlText(kqlExtractText) _,
    "kql_dynamic_props" -> kqlText(kqlDynamicPropsText) _,
    "kql_top_nested_others" -> kqlText(kqlTopNestedOthersText) _,
    "kql_row_cumsum_restart" -> kqlText(kqlRowCumsumRestartText) _,
    "kql_range_zerofill" -> kqlText(kqlRangeText) _,
    "kql_mv_apply_extend" -> kqlText(kqlMvApplyExtendText) _,
    "kql_mv_apply"      -> kqlText(kqlMvApplyText) _,
    "kql_top_nested"    -> kqlText(kqlTopNestedText) _,
    "kql_serialize"     -> kqlText(kqlSerializeText) _,
    "kql_make_series_avg" -> kqlText(kqlMakeSeriesAvgText) _,
    "kql_make_series_multi" -> kqlText(kqlMakeSeriesMultiText) _,
    "kql_make_series"   -> kqlText(kqlMakeSeriesText) _,
    "kql_time_histogram" -> kqlText(kqlTimeHistogramText) _,
    "kql_case_tiers"    -> kqlText(kqlCaseText) _,
    "kql_percentiles"   -> kqlText(kqlPercentileText) _,
    "kql_lookup_dim"    -> kqlText(kqlLookupText) _,
    "kql_union_rename"  -> kqlText(kqlUnionText) _,
    "kql_bin_histogram" -> kqlText(kqlBinText) _,
    "kql_parse_regex"   -> kqlText(kqlParseRegexText) _,
    "kql_mvexpand"      -> kqlText(kqlMvExpandText) _,
    "kql_mvexpand_multi" -> kqlText(kqlMvExpandMultiText) _,
    "kql_externaldata"  -> kqlExternaldata _,
    "ref_avg_by_city"   -> avgSalesByCity _,
    "ref_total_by_city" -> totalSalesByCity _,
    "ref_count_by_city" -> orderCountByCity _,
    "ref_top5_orders"   -> latestFiveOrders _,
    "kql_avg_by_city"   -> kqlText(kqlAvgText) _,
    "kql_total_by_city" -> kqlText(kqlTotalText) _,
    "kql_count_by_city" -> kqlText(kqlCountText) _,
    "kql_join_frequent" -> kqlText(kqlJoinText) _,
  )

  val oracleSql: Map[String, String] = Map(
    // buffer/simplify tier: closed-form probe truths (r/2 inside the
    // 16-gon's 0.98r apothem, 2r outside; spike-vs-tolerance strict >)
    "kql_geo_buffers" ->
      s"""${Sql.ordersInfoCte},
         |pts AS (
         |  SELECT city, CAST(amount AS DOUBLE) AS amount
         |  FROM orders_info WHERE orderid < 2000)
         |SELECT city, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(COUNT(*) AS BIGINT) AS s_pb_in, CAST(0 AS BIGINT) AS s_pb_out,
         |  CAST(COUNT(*) AS BIGINT) AS s_lb_in, CAST(0 AS BIGINT) AS s_lb_out,
         |  CAST(COUNT(*) AS BIGINT) AS s_gb_in, CAST(0 AS BIGINT) AS s_gb_out,
         |  CAST(SUM(CASE WHEN (amount - 100) * 2.0 > 149.0 THEN 3 ELSE 2 END) AS BIGINT) AS s_simp
         |FROM pts GROUP BY city ORDER BY city ASC""".stripMargin,
    // boolean-operation tier: axis-rect closed forms (overlap widths,
    // canonical first vertex = (max(x,10.25), max(y,10.25)), clip
    // entry = max(x,10.25) on in-range rows)
    "kql_geo_polygon_ops" ->
      s"""${Sql.ordersInfoCte},
         |pts AS (
         |  SELECT city, CAST(orderid % 30 AS DOUBLE) AS x, CAST(custid % 30 AS DOUBLE) AS y
         |  FROM orders_info WHERE orderid < 4000),
         |f AS (
         |  SELECT city, x, y,
         |    (least(x + 2.0, 20.75) - greatest(x, 10.25) > 0
         |     AND least(y + 2.0, 20.75) - greatest(y, 10.25) > 0) AS ov,
         |    (least(x + 2.0, 20.75) - greatest(x, 10.25) > 0
         |     AND y + 1.0 > 10.25 AND y + 1.0 < 20.75) AS clip
         |  FROM pts)
         |SELECT city, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(COUNT(*) FILTER (WHERE ov) AS BIGINT) AS n_poly,
         |  CAST(COUNT(*) FILTER (WHERE ov) AS BIGINT) AS n_upoly,
         |  CAST(COUNT(*) FILTER (WHERE NOT ov) AS BIGINT) AS n_multi,
         |  CAST(COUNT(*) FILTER (WHERE clip) AS BIGINT) AS n_clip,
         |  CAST(COUNT(*) AS BIGINT) AS n_ml,
         |  CAST(SUM(CASE WHEN ov THEN CAST(floor(greatest(x, 10.25) * 1000000.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS sgx,
         |  CAST(SUM(CASE WHEN ov THEN CAST(floor(greatest(y, 10.25) * 1000000.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS sgy,
         |  CAST(SUM(CASE WHEN clip THEN CAST(floor(greatest(x, 10.25) * 1000000.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS scx
         |FROM f GROUP BY city ORDER BY city ASC""".stripMargin,
    // geo_polygon_lookup: the independent per-fence even-odd
    // formulation (kql_geo_polygon_join's oracle, keyed by fence) —
    // zero cell arithmetic, so a cover miss drops a row and fails
    "kql_geo_polygon_lookup" ->
      s"""${Sql.ordersInfoCte},
         |pts AS (
         |  SELECT orderid, city, CAST(orderid % 4000 AS DOUBLE) / 100.0 - 20.0 AS lon,
         |    40.0 + CAST(custid % 1000 AS DOUBLE) / 50.0 AS lat
         |  FROM orders_info),
         |edges AS (
         |  SELECT * FROM (VALUES
         |    ('dent', -5.0, 45.0, 5.0, 43.0), ('dent', 5.0, 43.0, 12.0, 50.0),
         |    ('dent', 12.0, 50.0, 0.0, 47.5), ('dent', 0.0, 47.5, -8.0, 52.0),
         |    ('dent', -8.0, 52.0, -5.0, 45.0),
         |    ('box', -18.0, 41.0, -10.0, 41.0), ('box', -10.0, 41.0, -10.0, 49.0),
         |    ('box', -10.0, 49.0, -18.0, 49.0), ('box', -18.0, 49.0, -18.0, 41.0)
         |  ) AS e(fence, x1, y1, x2, y2)),
         |cr AS (
         |  SELECT p.orderid, p.city, e.fence, p.lon, p.lat,
         |    COUNT(*) FILTER (WHERE ((y1 > lat) <> (y2 > lat))
         |      AND lon < x1 + (x2 - x1) * (lat - y1) / (y2 - y1)) % 2 = 1 AS inside
         |  FROM pts p CROSS JOIN edges e GROUP BY 1, 2, 3, 4, 5)
         |SELECT city, fence, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(floor(MIN(lon) * 1000000.0) AS BIGINT) AS lon_min_u,
         |  CAST(floor(MAX(lat) * 1000000.0) AS BIGINT) AS lat_max_u
         |FROM cr WHERE inside GROUP BY city, fence ORDER BY city ASC, fence ASC""".stripMargin,
    // geo_line_lookup: the independent per-route distance formulation
    // (kql_geo_line_join's oracle, keyed by route; each route's kx
    // from its own seed-0 mean-latitude fold)
    "kql_geo_line_lookup" ->
      s"""${Sql.ordersInfoCte},
         |pts AS (
         |  SELECT orderid, city, CAST(orderid % 6000 AS DOUBLE) / 100.0 - 30.0 AS lon,
         |    5.0 + CAST(custid % 1400 AS DOUBLE) / 50.0 AS lat
         |  FROM orders_info),
         |segs AS (
         |  SELECT * FROM (VALUES
         |    ('r1', -15.0, 10.0, -5.0, 14.0), ('r1', -5.0, 14.0, 5.0, 12.0),
         |    ('r1', 5.0, 12.0, 15.0, 20.0), ('r1', 15.0, 20.0, 25.0, 26.0),
         |    ('r2', -25.0, 30.0, -15.0, 26.0), ('r2', -15.0, 26.0, -5.0, 28.0)
         |  ) AS s(route_id, x1, y1, x2, y2)),
         |k AS (
         |  SELECT 'r1' AS route_id, 111320.0 * cos(radians(
         |    (CAST(0 AS DOUBLE) + 10.0 + 14.0 + 12.0 + 20.0 + 26.0) / CAST(5 AS DOUBLE))) AS kx
         |  UNION ALL
         |  SELECT 'r2', 111320.0 * cos(radians(
         |    (CAST(0 AS DOUBLE) + 30.0 + 26.0 + 28.0) / CAST(3 AS DOUBLE)))),
         |segm AS (
         |  SELECT s.route_id, x1 * kx AS ax, y1 * 110574.0 AS ay,
         |    (x2 - x1) * kx AS dx, (y2 - y1) * 110574.0 AS dy
         |  FROM segs s JOIN k ON k.route_id = s.route_id),
         |pd AS (
         |  SELECT p.orderid, p.city, s.route_id, p.lon * k.kx AS qx, p.lat * 110574.0 AS qy,
         |    s.ax, s.ay, s.dx, s.dy
         |  FROM pts p CROSS JOIN segm s JOIN k ON k.route_id = s.route_id),
         |pt AS (
         |  SELECT *, CASE WHEN dx * dx + dy * dy = CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE)
         |    ELSE least(CAST(1 AS DOUBLE), greatest(CAST(0 AS DOUBLE),
         |      ((qx - ax) * dx + (qy - ay) * dy) / (dx * dx + dy * dy))) END AS t
         |  FROM pd),
         |d AS (
         |  SELECT orderid, city, route_id,
         |    MIN(sqrt((qx - ax - t * dx) * (qx - ax - t * dx)
         |      + (qy - ay - t * dy) * (qy - ay - t * dy))) AS dist
         |  FROM pt GROUP BY 1, 2, 3)
         |SELECT city, route_id, CAST(COUNT(*) AS BIGINT) AS n,
         |  MIN(CAST(floor(dist) AS BIGINT)) AS d_min_m,
         |  MAX(CAST(floor(dist) AS BIGINT)) AS d_max_m
         |FROM d WHERE dist <= 25000.0
         |GROUP BY city, route_id ORDER BY city ASC, route_id ASC""".stripMargin,
    // buildschema: fixed vectors → the hand-derived schema literal per
    // group (alternatives scalars-sorted, then array form, then object
    // form; arrays as the ADX `indexer` convention — see BuildSchemaAgg)
    "kql_buildschema" ->
      """SELECT * FROM (VALUES
        |  ('a', '{"x":["long","string"],"y":["double",{"w":"string"}]}'),
        |  ('b', '["long",{"`indexer`":["long","string"]},{"x":{"`indexer`":"long"},"y":{"v":"bool","w":"long"}}]')
        |) AS t(g, s) ORDER BY g ASC""".stripMargin,
    // geo_intersection_2lines: integer-valued geometries make every
    // emitted coordinate EXACT, so the oracle is the closed form of
    // the crossing (t = (d+4)/8 → gx = x + (d+4)/2; d = 4 is the
    // touch arm, same closed form; d > 4 empty) and of the collinear
    // overlap endpoints ([x+2, x+4]).
    "kql_geo_intersection2" ->
      s"""${Sql.ordersInfoCte},
         |pts AS (
         |  SELECT city, CAST(orderid % 40 AS DOUBLE) AS x,
         |         CAST(custid % 40 AS DOUBLE) AS y, CAST(orderid % 7 AS DOUBLE) AS d
         |  FROM orders_info WHERE orderid < 4000)
         |SELECT city, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(COUNT(*) FILTER (WHERE d <= 4) AS BIGINT) AS n_pt,
         |  CAST(COUNT(*) AS BIGINT) AS n_mp,
         |  CAST(SUM(CASE WHEN d <= 4 THEN CAST(floor((x + (d + 4.0) / 2.0) * 1000000.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS sgx,
         |  CAST(SUM(CASE WHEN d <= 4 THEN CAST(floor((y + (d + 4.0) / 2.0) * 1000000.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS sgy,
         |  CAST(SUM(CAST(floor((2.0 * x + 6.0) * 1000000.0) AS BIGINT)) AS BIGINT) AS sm
         |FROM pts GROUP BY city ORDER BY city ASC""".stripMargin,
    // ipv4_range_to_cidr_list: the SAME integer-only greedy replayed
    // as a recursive CTE (alignment = cur & −cur, OR-cascade highest
    // bit, bit_count(blk−1) prefix width), cidr strings re-joined in
    // emission order — count AND exact strings cross engines.
    "kql_ipv4_cidr_list" ->
      s"""WITH RECURSIVE ${Sql.ordersInfoCte.stripPrefix("WITH ")},
         |rngs AS (
         |  SELECT orderid, city,
         |    CAST(167772160 + (orderid % 65536) * 256 + custid % 256 AS BIGINT) AS lo,
         |    CAST(167772160 + (orderid % 65536) * 256 + custid % 256 + orderid % 1000 AS BIGINT) AS hi
         |  FROM orders_info WHERE orderid < 3000),
         |steps AS (
         |  SELECT orderid, hi, lo AS cur, 0 AS i, CAST(NULL AS VARCHAR) AS cidr FROM rngs
         |  UNION ALL
         |  SELECT orderid, hi, cur + blk, i + 1,
         |    CAST(cur // 16777216 AS VARCHAR) || '.' || CAST((cur // 65536) % 256 AS VARCHAR) || '.' ||
         |    CAST((cur // 256) % 256 AS VARCHAR) || '.' || CAST(cur % 256 AS VARCHAR) || '/' ||
         |    CAST(32 - bit_count(blk - 1) AS VARCHAR)
         |  FROM (
         |    SELECT orderid, hi, cur, i,
         |      least(CASE WHEN cur = 0 THEN CAST(4294967296 AS BIGINT) ELSE cur & -cur END,
         |            (f5 >> 1) + 1) AS blk
         |    FROM (SELECT *, (f4 | (f4 >> 32)) AS f5 FROM (
         |          SELECT *, (f3 | (f3 >> 16)) AS f4 FROM (
         |          SELECT *, (f2 | (f2 >> 8)) AS f3 FROM (
         |          SELECT *, (f1 | (f1 >> 4)) AS f2 FROM (
         |          SELECT *, (f0 | (f0 >> 2)) AS f1 FROM (
         |          SELECT *, (rem | (rem >> 1)) AS f0 FROM (
         |            SELECT orderid, hi, cur, i, hi - cur + 1 AS rem
         |            FROM steps WHERE cur <= hi)))))))
         |  )),
         |perrow AS (
         |  SELECT orderid, string_agg(cidr, ';' ORDER BY i) AS cs,
         |         CAST(COUNT(*) AS BIGINT) AS nc
         |  FROM steps WHERE cidr IS NOT NULL GROUP BY orderid)
         |SELECT r.city, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(p.nc) AS BIGINT) AS snc,
         |  MIN(p.cs) AS cs_min, MAX(p.cs) AS cs_max
         |FROM rngs r JOIN perrow p ON p.orderid = r.orderid
         |GROUP BY r.city ORDER BY r.city ASC""".stripMargin,
    // h3 compact/uncompact: cell tokens are engine-specific — the
    // cross-engine contract is the INVARIANT AUDIT (the sketch_approx
    // convention): the oracle asserts every family-fold flag TRUE;
    // KqlSpec pins the concrete arrays.
    "kql_geo_h3_compact" ->
      """SELECT * FROM (VALUES
        |  ('cpt', CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('equ', CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('gw', CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
        |  ('npole', CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
        |  ('paris', CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('rio', CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('syd', CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('tok', CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT))
        |) AS t(name, ok_fold, ok_rt, ok_part, ok_id, ok_mix) ORDER BY name ASC""".stripMargin,
    // line walk: the kql_geo_closest argmin mirror extended with a
    // window running length (locate = cumb + t·len of the rn=1 row);
    // interpolate = first segment whose cumulative reach covers the
    // clamped target, degree lerp by the meter fraction. Segment
    // lengths and cumulatives are windowed in edge order (the engine's
    // left-to-right fold); kx at the 4-vertex mean-latitude fold.
    "kql_geo_line_walk" ->
      s"""${Sql.ordersInfoCte},
         |pts AS (
         |  SELECT orderid, city, amount,
         |    9.8 + CAST(orderid % 200 AS DOUBLE) / 100.0 AS lon,
         |    49.9 + CAST(custid % 120 AS DOUBLE) / 100.0 AS lat
         |  FROM orders_info WHERE orderid < 1000),
         |k AS (SELECT 111320.0 * cos(radians(
         |  ((((0.0 + 50.0) + 50.2) + 50.6) + 50.8) / 4.0)) AS kx),
         |verts AS (
         |  SELECT i, CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y FROM (VALUES
         |    (0, 10.0, 50.0), (1, 10.5, 50.2), (2, 10.5, 50.6), (3, 11.0, 50.8)) AS t(i, x, y)),
         |segs AS (
         |  SELECT a.i, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2, k.kx,
         |    sqrt(((b.x - a.x) * k.kx) * ((b.x - a.x) * k.kx)
         |       + ((b.y - a.y) * 110574.0) * ((b.y - a.y) * 110574.0)) AS len
         |  FROM verts a JOIN verts b ON b.i = a.i + 1 CROSS JOIN k),
         |segc AS (
         |  SELECT *, SUM(len) OVER (ORDER BY i
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - len AS cumb,
         |    SUM(len) OVER (ORDER BY i
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw
         |  FROM segs),
         |e AS (
         |  SELECT p.orderid, s.i, s.len, s.cumb,
         |    p.lon * s.kx AS qx, p.lat * 110574.0 AS qy,
         |    s.x1 * s.kx AS ax, s.y1 * 110574.0 AS ay,
         |    (s.x2 - s.x1) * s.kx AS dx, (s.y2 - s.y1) * 110574.0 AS dy
         |  FROM pts p CROSS JOIN segc s),
         |f1 AS (SELECT *, dx * dx + dy * dy AS len2 FROM e),
         |f2 AS (
         |  SELECT *, CASE WHEN len2 = 0.0 THEN 0.0
         |    ELSE least(1.0, greatest(0.0, ((qx - ax) * dx + (qy - ay) * dy) / len2))
         |  END AS t FROM f1),
         |f3 AS (
         |  SELECT *, sqrt((qx - ax - t * dx) * (qx - ax - t * dx)
         |       + (qy - ay - t * dy) * (qy - ay - t * dy)) AS d
         |  FROM f2),
         |r AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY orderid
         |    ORDER BY d ASC, i ASC) AS rn FROM f3),
         |loc AS (
         |  SELECT orderid, CAST(floor(cumb + t * len) AS BIGINT) AS pos
         |  FROM r WHERE rn = 1),
         |tot AS (SELECT MAX(cumw) AS total FROM segc),
         |tgt AS (
         |  SELECT p.orderid,
         |    least(greatest(CAST(p.amount - 100 AS DOUBLE) * 1000.0, 0.0), t.total) AS gtt
         |  FROM pts p CROSS JOIN tot t),
         |land AS (
         |  SELECT g.orderid, g.gtt, MIN(s.i) AS li
         |  FROM tgt g JOIN segc s ON s.cumb + s.len >= g.gtt
         |  GROUP BY g.orderid, g.gtt),
         |ip AS (
         |  SELECT l.orderid,
         |    s.x1 + (CASE WHEN s.len = 0.0 THEN 0.0 ELSE (l.gtt - s.cumb) / s.len END)
         |      * (s.x2 - s.x1) AS ix,
         |    s.y1 + (CASE WHEN s.len = 0.0 THEN 0.0 ELSE (l.gtt - s.cumb) / s.len END)
         |      * (s.y2 - s.y1) AS iy
         |  FROM land l JOIN segc s ON s.i = l.li)
         |SELECT p.city, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(loc.pos) AS BIGINT) AS pos_sum,
         |  CAST(SUM(CAST(floor(ip.ix * 1000000.0) AS BIGINT)) AS BIGINT) AS ix_sum,
         |  CAST(SUM(CAST(floor(ip.iy * 1000000.0) AS BIGINT)) AS BIGINT) AS iy_sum
         |FROM pts p JOIN loc ON loc.orderid = p.orderid
         |JOIN ip ON ip.orderid = p.orderid
         |GROUP BY p.city ORDER BY p.city ASC""".stripMargin,
    // intersects predicates: the orientation (cross-product sign) +
    // on-segment boundary test per segment pair, plus the even-odd
    // containment fallbacks, each mirrored op-for-op. Line = 1
    // segment; square = 4 edges; dent ring = 5 edges.
    "kql_geo_intersects2" ->
      s"""${Sql.ordersInfoCte},
         |pts AS (
         |  SELECT orderid, city, CAST(orderid % 4000 AS DOUBLE) / 100.0 - 20.0 AS lon,
         |    40.0 + CAST(custid % 1000 AS DOUBLE) / 50.0 AS lat
         |  FROM orders_info WHERE orderid < 2000),
         |redges AS (
         |  SELECT * FROM (VALUES
         |    (-5.0, 45.0, 5.0, 43.0), (5.0, 43.0, 12.0, 50.0),
         |    (12.0, 50.0, 0.0, 47.5), (0.0, 47.5, -8.0, 52.0),
         |    (-8.0, 52.0, -5.0, 45.0)) AS e(cx, cy, dx, dy)),
         |lnhit AS (
         |  SELECT p.orderid, BOOL_OR(
         |    (CASE WHEN ((((p.lon + 3.0) - p.lon) * (e.cy - p.lat) - (((p.lat + 3.0)) - p.lat) * (e.cx - p.lon)) > 0
         |           AND  (((p.lon + 3.0) - p.lon) * (e.dy - p.lat) - (((p.lat + 3.0)) - p.lat) * (e.dx - p.lon)) < 0)
         |          OR ((((p.lon + 3.0) - p.lon) * (e.cy - p.lat) - (((p.lat + 3.0)) - p.lat) * (e.cx - p.lon)) < 0
         |           AND  (((p.lon + 3.0) - p.lon) * (e.dy - p.lat) - (((p.lat + 3.0)) - p.lat) * (e.dx - p.lon)) > 0)
         |     THEN ((e.dx - e.cx) * (p.lat - e.cy) - (e.dy - e.cy) * (p.lon - e.cx)) > 0
         |            AND ((e.dx - e.cx) * ((p.lat + 3.0) - e.cy) - (e.dy - e.cy) * ((p.lon + 3.0) - e.cx)) < 0
         |         OR ((e.dx - e.cx) * (p.lat - e.cy) - (e.dy - e.cy) * (p.lon - e.cx)) < 0
         |            AND ((e.dx - e.cx) * ((p.lat + 3.0) - e.cy) - (e.dy - e.cy) * ((p.lon + 3.0) - e.cx)) > 0
         |     ELSE FALSE END)
         |    OR ((((p.lon + 3.0) - p.lon) * (e.cy - p.lat) - (((p.lat + 3.0)) - p.lat) * (e.cx - p.lon)) = 0
         |        AND e.cx >= least(p.lon, p.lon + 3.0) AND e.cx <= greatest(p.lon, p.lon + 3.0)
         |        AND e.cy >= least(p.lat, p.lat + 3.0) AND e.cy <= greatest(p.lat, p.lat + 3.0))
         |    OR ((((p.lon + 3.0) - p.lon) * (e.dy - p.lat) - (((p.lat + 3.0)) - p.lat) * (e.dx - p.lon)) = 0
         |        AND e.dx >= least(p.lon, p.lon + 3.0) AND e.dx <= greatest(p.lon, p.lon + 3.0)
         |        AND e.dy >= least(p.lat, p.lat + 3.0) AND e.dy <= greatest(p.lat, p.lat + 3.0))
         |    OR (((e.dx - e.cx) * (p.lat - e.cy) - (e.dy - e.cy) * (p.lon - e.cx)) = 0
         |        AND p.lon >= least(e.cx, e.dx) AND p.lon <= greatest(e.cx, e.dx)
         |        AND p.lat >= least(e.cy, e.dy) AND p.lat <= greatest(e.cy, e.dy))
         |    OR (((e.dx - e.cx) * ((p.lat + 3.0) - e.cy) - (e.dy - e.cy) * ((p.lon + 3.0) - e.cx)) = 0
         |        AND (p.lon + 3.0) >= least(e.cx, e.dx) AND (p.lon + 3.0) <= greatest(e.cx, e.dx)
         |        AND (p.lat + 3.0) >= least(e.cy, e.dy) AND (p.lat + 3.0) <= greatest(e.cy, e.dy))
         |  ) AS seghit
         |  FROM pts p CROSS JOIN redges e GROUP BY p.orderid),
         |sqedges AS (
         |  SELECT p.orderid, p.city, p.lon, p.lat, s.i,
         |    CASE s.i WHEN 0 THEN p.lon WHEN 1 THEN p.lon + 2.0
         |             WHEN 2 THEN p.lon + 2.0 ELSE p.lon END AS ax,
         |    CASE s.i WHEN 0 THEN p.lat WHEN 1 THEN p.lat
         |             WHEN 2 THEN p.lat + 2.0 ELSE p.lat + 2.0 END AS ay,
         |    CASE s.i WHEN 0 THEN p.lon + 2.0 WHEN 1 THEN p.lon + 2.0
         |             WHEN 2 THEN p.lon ELSE p.lon END AS bx,
         |    CASE s.i WHEN 0 THEN p.lat WHEN 1 THEN p.lat + 2.0
         |             WHEN 2 THEN p.lat + 2.0 ELSE p.lat END AS by
         |  FROM pts p CROSS JOIN (SELECT CAST(unnest(range(0, 4)) AS INT) AS i) s),
         |sqhit AS (
         |  SELECT q.orderid, BOOL_OR(
         |    (CASE WHEN (((q.bx - q.ax) * (e.cy - q.ay) - (q.by - q.ay) * (e.cx - q.ax)) > 0
         |            AND ((q.bx - q.ax) * (e.dy - q.ay) - (q.by - q.ay) * (e.dx - q.ax)) < 0)
         |          OR (((q.bx - q.ax) * (e.cy - q.ay) - (q.by - q.ay) * (e.cx - q.ax)) < 0
         |            AND ((q.bx - q.ax) * (e.dy - q.ay) - (q.by - q.ay) * (e.dx - q.ax)) > 0)
         |     THEN ((e.dx - e.cx) * (q.ay - e.cy) - (e.dy - e.cy) * (q.ax - e.cx)) > 0
         |            AND ((e.dx - e.cx) * (q.by - e.cy) - (e.dy - e.cy) * (q.bx - e.cx)) < 0
         |         OR ((e.dx - e.cx) * (q.ay - e.cy) - (e.dy - e.cy) * (q.ax - e.cx)) < 0
         |            AND ((e.dx - e.cx) * (q.by - e.cy) - (e.dy - e.cy) * (q.bx - e.cx)) > 0
         |     ELSE FALSE END)
         |    OR (((q.bx - q.ax) * (e.cy - q.ay) - (q.by - q.ay) * (e.cx - q.ax)) = 0
         |        AND e.cx >= least(q.ax, q.bx) AND e.cx <= greatest(q.ax, q.bx)
         |        AND e.cy >= least(q.ay, q.by) AND e.cy <= greatest(q.ay, q.by))
         |    OR (((q.bx - q.ax) * (e.dy - q.ay) - (q.by - q.ay) * (e.dx - q.ax)) = 0
         |        AND e.dx >= least(q.ax, q.bx) AND e.dx <= greatest(q.ax, q.bx)
         |        AND e.dy >= least(q.ay, q.by) AND e.dy <= greatest(q.ay, q.by))
         |    OR (((e.dx - e.cx) * (q.ay - e.cy) - (e.dy - e.cy) * (q.ax - e.cx)) = 0
         |        AND q.ax >= least(e.cx, e.dx) AND q.ax <= greatest(e.cx, e.dx)
         |        AND q.ay >= least(e.cy, e.dy) AND q.ay <= greatest(e.cy, e.dy))
         |    OR (((e.dx - e.cx) * (q.by - e.cy) - (e.dy - e.cy) * (q.bx - e.cx)) = 0
         |        AND q.bx >= least(e.cx, e.dx) AND q.bx <= greatest(e.cx, e.dx)
         |        AND q.by >= least(e.cy, e.dy) AND q.by <= greatest(e.cy, e.dy))
         |  ) AS seghit
         |  FROM sqedges q CROSS JOIN redges e GROUP BY q.orderid),
         |inpoly AS (
         |  SELECT p.orderid,
         |    COUNT(*) FILTER (WHERE ((e.cy > p.lat) <> (e.dy > p.lat))
         |      AND p.lon < e.cx + (e.dx - e.cx) * (p.lat - e.cy) / (e.dy - e.cy)) % 2 = 1 AS inside
         |  FROM pts p CROSS JOIN redges e GROUP BY p.orderid),
         |ringv0insq AS (
         |  SELECT q.orderid,
         |    COUNT(*) FILTER (WHERE ((q.ay > 45.0) <> (q.by > 45.0))
         |      AND -5.0 < q.ax + (q.bx - q.ax) * (45.0 - q.ay) / (q.by - q.ay)) % 2 = 1 AS inside
         |  FROM sqedges q GROUP BY q.orderid),
         |fin AS (
         |  SELECT p.city,
         |    CASE WHEN l.seghit OR i.inside THEN 1 ELSE 0 END AS ilp,
         |    CASE WHEN s.seghit OR i.inside OR r.inside THEN 1 ELSE 0 END AS ipp
         |  FROM pts p
         |  JOIN lnhit l ON l.orderid = p.orderid
         |  JOIN sqhit s ON s.orderid = p.orderid
         |  JOIN inpoly i ON i.orderid = p.orderid
         |  JOIN ringv0insq r ON r.orderid = p.orderid)
         |SELECT city, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(ilp) AS BIGINT) AS n_ilp, CAST(SUM(ipp) AS BIGINT) AS n_ipp
         |FROM fin GROUP BY city ORDER BY city ASC""".stripMargin,
    // tdigest: the sorted-chunk construction replayed — chunk of
    // 0-based rank rn is ((rn+1)·32 − 1) // n (the closed form of
    // "index in [ci·n DIV 32, (ci+1)·n DIV 32)"); chunk means are
    // one-rounded divisions of exact integer sums; percentile = first
    // centroid (mean order) whose cumulative weight reaches p·N/100.
    "kql_tdigest" ->
      s"""${Sql.ordersInfoCte},
         |s AS (
         |  SELECT city, amount,
         |    ROW_NUMBER() OVER (PARTITION BY city ORDER BY amount) - 1 AS rn,
         |    COUNT(*) OVER (PARTITION BY city) AS n
         |  FROM orders_info),
         |cent AS (
         |  SELECT city, ((rn + 1) * 32 - 1) // n AS ci,
         |    round(CAST(SUM(amount) AS DOUBLE) / COUNT(*), 6) AS m,
         |    CAST(COUNT(*) AS BIGINT) AS w, MAX(n) AS n
         |  FROM s GROUP BY city, ((rn + 1) * 32 - 1) // n),
         |cum AS (
         |  SELECT city, m, w, n, SUM(w) OVER (PARTITION BY city ORDER BY m, w
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
         |  FROM cent)
         |SELECT city,
         |  MIN(m) FILTER (WHERE CAST(cw AS DOUBLE) >= 50 * CAST(n AS DOUBLE) / 100.0) AS p50,
         |  MIN(m) FILTER (WHERE CAST(cw AS DOUBLE) >= 90 * CAST(n AS DOUBLE) / 100.0) AS p90,
         |  round(100.0 * CAST(SUM(w) FILTER (WHERE m <= 150.0) AS DOUBLE)
         |    / CAST(SUM(w) AS DOUBLE), 6) AS rk,
         |  CAST(COUNT(*) AS BIGINT) AS nc
         |FROM cum GROUP BY city ORDER BY city ASC""".stripMargin,
    // tdigest_merge: per-city centroids pooled, sorted by (m, w),
    // cumulative-BEFORE weight assigns each centroid whole to chunk
    // (cb·32) // N; weighted chunk means via an ORDERED list_reduce
    // (the engine's left-to-right fold over the sorted pool).
    "kql_tdigest_merge" ->
      s"""${Sql.ordersInfoCte},
         |s AS (
         |  SELECT city, amount,
         |    ROW_NUMBER() OVER (PARTITION BY city ORDER BY amount) - 1 AS rn,
         |    COUNT(*) OVER (PARTITION BY city) AS n
         |  FROM orders_info),
         |cent AS (
         |  SELECT city, ((rn + 1) * 32 - 1) // n AS ci,
         |    round(CAST(SUM(amount) AS DOUBLE) / COUNT(*), 6) AS m,
         |    CAST(COUNT(*) AS BIGINT) AS w
         |  FROM s GROUP BY city, ((rn + 1) * 32 - 1) // n),
         |pool AS (
         |  SELECT m, w,
         |    SUM(w) OVER (ORDER BY m, w
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - w AS cb,
         |    SUM(w) OVER () AS nt
         |  FROM cent),
         |mchunk AS (
         |  SELECT (cb * 32) // nt AS ci, nt,
         |    round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list(m * CAST(w AS DOUBLE) ORDER BY m, w)), (la, lb) -> la + lb)
         |      / CAST(SUM(w) AS DOUBLE), 6) AS m2,
         |    CAST(SUM(w) AS BIGINT) AS w2
         |  FROM pool GROUP BY (cb * 32) // nt, nt),
         |mcum AS (
         |  SELECT m2, w2, nt, SUM(w2) OVER (ORDER BY m2, w2
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
         |  FROM mchunk)
         |SELECT
         |  MIN(m2) FILTER (WHERE CAST(cw AS DOUBLE) >= 50 * CAST(nt AS DOUBLE) / 100.0) AS gp50,
         |  MIN(m2) FILTER (WHERE CAST(cw AS DOUBLE) >= 99 * CAST(nt AS DOUBLE) / 100.0) AS gp99,
         |  round(100.0 * CAST(SUM(w2) FILTER (WHERE m2 <= 150.0) AS DOUBLE)
         |    / CAST(SUM(w2) AS DOUBLE), 6) AS grk,
         |  CAST(COUNT(*) AS BIGINT) AS gnc
         |FROM mcum""".stripMargin,
    // ipv4_is_match: expected booleans hand-checked per row (effective
    // prefix = min of each side's "/p" and the optional argument;
    // malformed 'bad' row nulls → iff else-branch 0).
    "kql_ipv4_match" ->
      """SELECT * FROM (VALUES
        |  ('bad', CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
        |  ('cidr24', CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('cidr_both', CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('eq', CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('neq', CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT))
        |) AS t(name, m, m24, m30) ORDER BY name ASC""".stripMargin,
    // hash tier 2: bit values are engine-specific (KqlSpec pins them);
    // the cross-engine contract is the PROPERTY set — injectivity at
    // corpus scale, pmod range, argument-order sensitivity — plus the
    // data-derived key count.
    "kql_hash_funcs" ->
      s"""${Sql.ordersInfoCte}
         |SELECT
         |  CAST(COUNT(DISTINCT city || '|' || CAST(orderid AS VARCHAR)) AS BIGINT) AS n_keys,
         |  CAST(1 AS BIGINT) AS inj_hm, CAST(1 AS BIGINT) AS inj_hx,
         |  CAST(1 AS BIGINT) AS mod_ok, CAST(1 AS BIGINT) AS osens
         |FROM orders_info""".stripMargin,
    // geo_azimuth: the spherical-bearing atan2 chain mirrored
    // op-for-op, including the explicit ((θ % 2π) + 2π) % 2π
    // normalization (DuckDB's % on doubles is the same fmod).
    "kql_geo_azimuth" ->
      """WITH p AS (
        |  SELECT name, CAST(lon AS DOUBLE) AS lon, CAST(lat AS DOUBLE) AS lat
        |  FROM (VALUES ('osl', 10.75, 59.91), ('syd', 151.21, -33.87),
        |    ('sam', -170.70, -14.27), ('rey', -21.94, 64.15),
        |    ('bad', 200.0, 10.0)) AS t(name, lon, lat)),
        |a AS (
        |  SELECT name,
        |    CASE WHEN abs(lat) > 90.0 OR abs(lon) > 180.0 THEN NULL ELSE
        |      (((atan2(sin(radians(12.57) - radians(lon)) * cos(radians(55.69)),
        |                cos(radians(lat)) * sin(radians(55.69)) -
        |                sin(radians(lat)) * cos(radians(55.69)) *
        |                  cos(radians(12.57) - radians(lon)))
        |          % (2.0 * pi())) + 2.0 * pi()) % (2.0 * pi())) END AS az_f,
        |    CASE WHEN abs(lat) > 90.0 OR abs(lon) > 180.0 THEN NULL ELSE
        |      (((atan2(sin(radians(lon) - radians(12.57)) * cos(radians(lat)),
        |                cos(radians(55.69)) * sin(radians(lat)) -
        |                sin(radians(55.69)) * cos(radians(lat)) *
        |                  cos(radians(lon) - radians(12.57)))
        |          % (2.0 * pi())) + 2.0 * pi()) % (2.0 * pi())) END AS az_b,
        |    CASE WHEN abs(lat) > 90.0 OR abs(lon) > 180.0 THEN NULL ELSE
        |      (((atan2(sin(radians(10.75) - radians(lon)) * cos(radians(59.91)),
        |                cos(radians(lat)) * sin(radians(59.91)) -
        |                sin(radians(lat)) * cos(radians(59.91)) *
        |                  cos(radians(10.75) - radians(lon)))
        |          % (2.0 * pi())) + 2.0 * pi()) % (2.0 * pi())) END AS az_o
        |  FROM p)
        |SELECT name, CAST(floor(az_f * 1000000.0) AS BIGINT) AS az_cph,
        |  CAST(floor(az_b * 1000000.0) AS BIGINT) AS az_back,
        |  CAST(floor(((((az_f - az_o) % (2.0 * pi())) + 2.0 * pi()) % (2.0 * pi()))
        |    * 1000000.0) AS BIGINT) AS ang
        |FROM a ORDER BY name ASC""".stripMargin,
    // geo_closest_point_on_polygon: the kql_geo_closest argmin mirror
    // over the dent ring's edges, gated by the even-odd containment
    // (inside → the point itself); the s2 cell-polygon flags are
    // spark-side self-consistency audits the oracle asserts TRUE
    // (native corner math — the sketch-audit convention).
    "kql_geo_polygons3" ->
      s"""${Sql.ordersInfoCte},
         |pts AS (
         |  SELECT orderid, city, CAST(orderid % 4000 AS DOUBLE) / 100.0 - 20.0 AS lon,
         |    40.0 + CAST(custid % 1000 AS DOUBLE) / 50.0 AS lat
         |  FROM orders_info WHERE orderid < 500),
         |edges AS (
         |  SELECT * FROM (VALUES
         |    (0, -5.0, 45.0, 5.0, 43.0), (1, 5.0, 43.0, 12.0, 50.0),
         |    (2, 12.0, 50.0, 0.0, 47.5), (3, 0.0, 47.5, -8.0, 52.0),
         |    (4, -8.0, 52.0, -5.0, 45.0)) AS e(i, x1, y1, x2, y2)),
         |k AS (
         |  SELECT 111320.0 * cos(radians(
         |    ((((((0.0 + 45.0) + 43.0) + 50.0) + 47.5) + 52.0) + 45.0) / 6.0)) AS kx),
         |cr AS (
         |  SELECT p.orderid, p.city, p.lon, p.lat,
         |    COUNT(*) FILTER (WHERE ((y1 > lat) <> (y2 > lat))
         |      AND lon < x1 + (x2 - x1) * (lat - y1) / (y2 - y1)) % 2 = 1 AS inside
         |  FROM pts p CROSS JOIN edges GROUP BY 1, 2, 3, 4),
         |seg AS (
         |  SELECT c.orderid, c.city, c.inside, c.lon, c.lat, e.i, k.kx,
         |    c.lon * k.kx AS qx, c.lat * 110574.0 AS qy,
         |    e.x1 * k.kx AS ax, e.y1 * 110574.0 AS ay,
         |    (e.x2 - e.x1) * k.kx AS dx, (e.y2 - e.y1) * 110574.0 AS dy
         |  FROM cr c CROSS JOIN k JOIN edges e ON TRUE),
         |f1 AS (SELECT *, dx * dx + dy * dy AS len2 FROM seg),
         |f2 AS (
         |  SELECT *, CASE WHEN len2 = 0.0 THEN 0.0
         |    ELSE least(1.0, greatest(0.0, ((qx - ax) * dx + (qy - ay) * dy) / len2))
         |  END AS t FROM f1),
         |f3 AS (
         |  SELECT *, sqrt((qx - ax - t * dx) * (qx - ax - t * dx)
         |       + (qy - ay - t * dy) * (qy - ay - t * dy)) AS d
         |  FROM f2),
         |r AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY orderid
         |    ORDER BY d ASC, i ASC) AS rn FROM f3),
         |foot AS (
         |  SELECT orderid, city,
         |    CASE WHEN inside THEN lon ELSE (ax + t * dx) / kx END AS cx,
         |    CASE WHEN inside THEN lat ELSE (ay + t * dy) / 110574.0 END AS cy
         |  FROM r WHERE rn = 1)
         |SELECT city, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(1 AS BIGINT) AS in_ok, CAST(1 AS BIGINT) AS ring_ok,
         |  CAST(SUM(CAST(floor(cx * 1000000.0) AS BIGINT)) AS BIGINT) AS cx_sum,
         |  CAST(SUM(CAST(floor(cy * 1000000.0) AS BIGINT)) AS BIGINT) AS cy_sum
         |FROM foot GROUP BY city ORDER BY city ASC""".stripMargin,
    // geo_distance_point_to_polygon: kql_geo_polygon's even-odd
    // crossing CTE gates kql_geo_closest's point-to-segment mirror
    // over the ring's 5 edges (mean-latitude fold over all 6 ring
    // vertices, the graft_geo_dist_line left-to-right order).
    "kql_geo_dist_polygon" ->
      s"""${Sql.ordersInfoCte},
         |pts AS (
         |  SELECT orderid, city, CAST(orderid % 4000 AS DOUBLE) / 100.0 - 20.0 AS lon,
         |    40.0 + CAST(custid % 1000 AS DOUBLE) / 50.0 AS lat
         |  FROM orders_info),
         |edges AS (
         |  SELECT * FROM (VALUES
         |    (-5.0, 45.0, 5.0, 43.0), (5.0, 43.0, 12.0, 50.0),
         |    (12.0, 50.0, 0.0, 47.5), (0.0, 47.5, -8.0, 52.0),
         |    (-8.0, 52.0, -5.0, 45.0)) AS e(x1, y1, x2, y2)),
         |k AS (
         |  SELECT 111320.0 * cos(radians(
         |    ((((((0.0 + 45.0) + 43.0) + 50.0) + 47.5) + 52.0) + 45.0) / 6.0)) AS kx),
         |cr AS (
         |  SELECT p.orderid, p.city, p.lon, p.lat,
         |    COUNT(*) FILTER (WHERE ((y1 > lat) <> (y2 > lat))
         |      AND lon < x1 + (x2 - x1) * (lat - y1) / (y2 - y1)) % 2 = 1 AS inside
         |  FROM pts p CROSS JOIN edges GROUP BY 1, 2, 3, 4),
         |seg AS (
         |  SELECT c.orderid, c.city, c.inside,
         |    c.lon * k.kx AS qx, c.lat * 110574.0 AS qy,
         |    e.x1 * k.kx AS ax, e.y1 * 110574.0 AS ay,
         |    (e.x2 - e.x1) * k.kx AS dx, (e.y2 - e.y1) * 110574.0 AS dy
         |  FROM cr c CROSS JOIN k JOIN edges e ON TRUE),
         |f1 AS (
         |  SELECT *, dx * dx + dy * dy AS len2 FROM seg),
         |f2 AS (
         |  SELECT *, CASE WHEN len2 = 0.0 THEN 0.0
         |    ELSE least(1.0, greatest(0.0, ((qx - ax) * dx + (qy - ay) * dy) / len2))
         |  END AS t FROM f1),
         |dmin AS (
         |  SELECT orderid, city, inside,
         |    MIN(sqrt((qx - ax - t * dx) * (qx - ax - t * dx)
         |           + (qy - ay - t * dy) * (qy - ay - t * dy))) AS d
         |  FROM f2 GROUP BY 1, 2, 3),
         |fin AS (
         |  SELECT city, CASE WHEN inside THEN 0.0 ELSE d END AS d FROM dmin)
         |SELECT city,
         |  CAST(COUNT(*) FILTER (WHERE d = 0.0) AS BIGINT) AS n_zero,
         |  MAX(CAST(floor(d) AS BIGINT)) AS d_max,
         |  CAST(SUM(CAST(floor(d) AS BIGINT)) AS BIGINT) AS d_sum
         |FROM fin GROUP BY city ORDER BY city ASC""".stripMargin,
    // string tier 3: sequential replace mirrored as a nested replace
    // chain; the bag is the compact to_json form; the ACE form of
    // 'bücher' is the RFC 3492 documented 'bcher-kva'; round-trip
    // flag hardcoded TRUE.
    "kql_string_funcs3" ->
      s"""${Sql.ordersInfoCte}
         |SELECT orderid,
         |  replace(replace(city, 'New ', 'Old '), 'e', 'E') AS fixed,
         |  '{"city":"' || city || '","orderid":' || CAST(orderid AS VARCHAR) || '}' AS bs,
         |  'xn--bcher-kva.' || lower(replace(city, ' ', '-')) || '.example.com' AS ace,
         |  CAST(1 AS BIGINT) AS rt
         |FROM orders_info WHERE orderid < 150 ORDER BY orderid ASC""".stripMargin,
    // series_periods_validate: the periods_detect dense-series CTE with
    // the two GIVEN lags, output in argument order.
    "kql_periods_validate" ->
      """WITH f AS (
        |  SELECT event_type,
        |    CAST((epoch_ns(ts) // 1000000000
        |      - CAST(epoch(TIMESTAMP '2024-01-01') AS BIGINT)) // 86400 AS INT) AS i
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31'),
        |g AS (SELECT event_type, i, CAST(COUNT(*) AS BIGINT) AS v FROM f GROUP BY 1, 2),
        |k AS (SELECT DISTINCT event_type FROM f),
        |axis AS (SELECT CAST(unnest(range(0, 30)) AS INT) AS i),
        |dense AS (
        |  SELECT k.event_type, a.i, COALESCE(g.v, CAST(0 AS BIGINT)) AS v
        |  FROM k CROSS JOIN axis a
        |  LEFT JOIN g ON g.event_type = k.event_type AND g.i = a.i),
        |scores AS (
        |  SELECT d1.event_type, L.l AS lag, SUM(d1.v * d2.v) AS s
        |  FROM dense d1
        |  JOIN (SELECT CAST(unnest([3, 7]) AS INT) AS l) L ON TRUE
        |  JOIN dense d2 ON d2.event_type = d1.event_type AND d2.i = d1.i + L.l
        |  GROUP BY 1, 2)
        |SELECT s3.event_type,
        |  CAST(3 AS BIGINT) AS p1, CAST(s3.s AS BIGINT) AS s1,
        |  CAST(7 AS BIGINT) AS p2, CAST(s7.s AS BIGINT) AS s2
        |FROM scores s3 JOIN scores s7
        |  ON s7.event_type = s3.event_type AND s3.lag = 3 AND s7.lag = 7
        |ORDER BY s3.event_type ASC""".stripMargin,
    // pass-through scalars: identical names/semantics in DuckDB except
    // log (DuckDB log() is log10 — natural log is ln() there).
    "kql_passthrough_scalars" ->
      s"""${Sql.ordersInfoCte},
         |b AS (SELECT orderid, city, CAST(amount AS DOUBLE) AS v
         |      FROM orders_info WHERE orderid < 200)
         |SELECT orderid,
         |  CAST(abs(-1.0 * v) AS BIGINT) AS r_abs,
         |  CAST(sign(v - 150.0) AS BIGINT) AS r_sign,
         |  CAST(floor(sqrt(v) * 1000000.0) AS BIGINT) AS r_sqrt,
         |  CAST(floor(exp(v / 100.0) * 1000000.0) AS BIGINT) AS r_exp,
         |  CAST(floor(ln(v) * 1000000.0) AS BIGINT) AS r_log,
         |  CAST(floor(log10(v) * 1000000.0) AS BIGINT) AS r_log10,
         |  CAST(floor(log2(v) * 1000000.0) AS BIGINT) AS r_log2,
         |  CAST(floor(pow(v, 1.5)) AS BIGINT) AS r_pow,
         |  CAST(floor(atan2(v, 100.0) * 1000000.0) AS BIGINT) AS r_atan2,
         |  CAST(floor(cot(v / 100.0) * 1000000.0) AS BIGINT) AS r_cot,
         |  CAST(floor(degrees(v / 100.0) * 1000000.0) AS BIGINT) AS r_deg,
         |  CAST(floor(radians(v) * 1000000.0) AS BIGINT) AS r_rad,
         |  CAST(floor(pi() * 1000000.0) AS BIGINT) AS r_pi,
         |  city AS r_coal,
         |  CAST(0 AS BIGINT) AS r_isnull, CAST(1 AS BIGINT) AS r_isnotnull
         |FROM b ORDER BY orderid ASC""".stripMargin,
    "kql_bitwise" ->
      s"""${Sql.ordersInfoCte}
         |SELECT city,
         |  bit_or(CAST(amount % 16 AS INTEGER)) AS all_or,
         |  bit_and(CAST(amount % 16 AS INTEGER)) AS all_and,
         |  bit_xor(CAST(amount % 16 AS INTEGER)) AS all_xor,
         |  CAST(SUM(bit_count(CAST(amount % 16 AS INTEGER))) AS BIGINT) AS ones,
         |  MIN(CASE WHEN amount >= 180 THEN hex(amount) END) AS big_hex
         |FROM orders_info GROUP BY city ORDER BY city ASC""".stripMargin,
    "kql_invoke" ->
      s"""${Sql.ordersInfoCte}
         |SELECT city, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(amount) AS BIGINT) AS total
         |FROM orders_info WHERE amount >= 150
         |GROUP BY city ORDER BY city ASC""".stripMargin,
    "kql_graph_match" ->
      s"""${Sql.ordersInfoCte},
         |cr AS (SELECT * FROM (VALUES
         |  ('New Delhi','APAC'), ('Seattle','WEST'), ('New York','EAST'),
         |  ('Austin','SOUTH'), ('Chicago','MIDWEST'), ('Cleveland','MIDWEST'))
         |  AS t(src, dst)),
         |cc AS (SELECT DISTINCT 'u' || CAST(custid AS VARCHAR) AS src, city AS dst
         |       FROM orders_info),
         |e AS (SELECT * FROM cc UNION ALL SELECT * FROM cr)
         |SELECT h1.dst AS city, CAST(COUNT(*) AS BIGINT) AS n
         |FROM e h1 JOIN e h2 ON h1.dst = h2.src
         |WHERE h2.dst = 'MIDWEST'
         |GROUP BY 1 ORDER BY city ASC""".stripMargin,
    "kql_graph_to_table" ->
      s"""${Sql.ordersInfoCte},
         |cr AS (SELECT * FROM (VALUES
         |  ('New Delhi','APAC'), ('Seattle','WEST'), ('New York','EAST'),
         |  ('Austin','SOUTH'), ('Chicago','MIDWEST'), ('Cleveland','MIDWEST'))
         |  AS t(src, dst)),
         |cc AS (SELECT DISTINCT 'u' || CAST(custid AS VARCHAR) AS src, city AS dst
         |       FROM orders_info),
         |e AS (SELECT * FROM cc UNION ALL SELECT * FROM cr),
         |nodes AS (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e))
         |SELECT substring(node, 1, 1) AS prefix, CAST(COUNT(*) AS BIGINT) AS n,
         |  MIN(node) AS first_node
         |FROM nodes GROUP BY 1 ORDER BY prefix ASC""".stripMargin,
    "kql_graph_shortest" ->
      s"""${Sql.ordersInfoCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |cr AS (SELECT * FROM (VALUES
         |  ('New Delhi','APAC'), ('Seattle','WEST'), ('New York','EAST'),
         |  ('Austin','SOUTH'), ('Chicago','MIDWEST'), ('Cleveland','MIDWEST'))
         |  AS t(src, dst)),
         |tw AS (SELECT * FROM (VALUES
         |  ('APAC','WORLD'), ('WEST','WORLD'), ('EAST','WORLD'),
         |  ('SOUTH','WORLD'), ('MIDWEST','WORLD'), ('Chicago','WORLD'))
         |  AS t(src, dst)),
         |cc AS (SELECT DISTINCT 'u' || CAST(custid AS VARCHAR) AS src, city AS dst
         |       FROM orders_info),
         |e AS (SELECT * FROM cc UNION ALL SELECT * FROM cr UNION ALL SELECT * FROM tw),
         |walk AS (
         |  SELECT src AS a, dst AS node, 1 AS hops FROM e WHERE src LIKE 'u%'
         |  UNION ALL
         |  SELECT w.a, e.dst, w.hops + 1 FROM walk w
         |  JOIN e ON e.src = w.node WHERE w.hops < 4),
         |sp AS (SELECT a, node, MIN(hops) AS hops FROM walk GROUP BY a, node)
         |SELECT CAST(hops AS INTEGER) AS hops, CAST(COUNT(*) AS BIGINT) AS n
         |FROM sp WHERE node = 'WORLD'
         |GROUP BY 1 ORDER BY hops ASC""".stripMargin,
    "kql_scan_funnel" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
        |  FROM events WHERE user_id < 8),
        |walk AS (
        |  SELECT user_id, 0 AS rn, FALSE AS active, 0 AS starts, 0 AS completes
        |  FROM (SELECT DISTINCT user_id FROM ev)
        |  UNION ALL
        |  SELECT w.user_id, w.rn + 1,
        |    CASE WHEN NOT w.active AND e.event_type = 'view' THEN TRUE
        |         WHEN w.active AND e.event_type = 'purchase' THEN FALSE
        |         ELSE w.active END,
        |    w.starts + CASE WHEN NOT w.active AND e.event_type = 'view' THEN 1 ELSE 0 END,
        |    w.completes + CASE WHEN w.active AND e.event_type = 'purchase' THEN 1 ELSE 0 END
        |  FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.rn = w.rn + 1),
        |fin AS (
        |  SELECT user_id, starts, completes,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn DESC) AS rk
        |  FROM walk)
        |SELECT user_id, CAST(starts + completes AS BIGINT) AS n_rows,
        |  CAST(completes AS BIGINT) AS matches,
        |  CAST(starts - 1 AS BIGINT) AS last_match
        |FROM fin WHERE rk = 1 AND starts > 0 ORDER BY user_id ASC""".stripMargin,
    // Error-bound audit (see kqlHllText): exact sides in DuckDB, both
    // accuracy flags asserted 1.
    "kql_hll_dcount" ->
      """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact,
        |  CAST(1 AS BIGINT) AS ok
        |FROM events GROUP BY event_type
        |UNION ALL
        |SELECT 'ALL' AS event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT),
        |  CAST(1 AS BIGINT)
        |FROM events""".stripMargin,
    "kql_narrow" ->
      s"""${Sql.ordersInfoCte}
         |SELECT orderid, "Column", "Value" FROM (
         |  SELECT orderid, 'amount' AS "Column", CAST(amount AS VARCHAR) AS "Value"
         |  FROM orders_info
         |  UNION ALL
         |  SELECT orderid, 'city' AS "Column", city AS "Value" FROM orders_info)
         |ORDER BY orderid ASC, "Column" ASC""".stripMargin,
    "kql_autocluster" ->
      """WITH src AS (
        |  SELECT event_type,
        |    ("value" - ((("value" % 100) + 100) % 100)) AS vband,
        |    "value" >= 400 AS hot
        |  FROM events),
        |cells AS (
        |  SELECT event_type, vband, hot, COUNT(*) AS n,
        |    GROUPING(event_type, vband, hot) AS g
        |  FROM src GROUP BY CUBE(event_type, vband, hot)),
        |tot AS (SELECT n AS total FROM cells WHERE g = 7)
        |SELECT event_type, vband, hot, CAST(n AS BIGINT) AS n,
        |  CAST((1000000 * n) // total AS DOUBLE) / 1000000.0 AS pct
        |FROM cells, tot
        |WHERE g <> 7 AND (1000000 * n) // total >= 50000
        |ORDER BY pct DESC, event_type ASC NULLS FIRST,
        |  vband ASC NULLS FIRST, hot ASC NULLS FIRST""".stripMargin,
    // Leaf extraction mirrors the parser's regexes; DuckDB's RE2 has no
    // backreferences, so the closing-tag pattern is relaxed to
    // non-empty-content leaves (an empty parent '<a><' would otherwise
    // swallow the next tag's '<') — equal on well-formed flat XML with
    // non-empty leaves (the modeled subset).
    "kql_parse_xml" ->
      """WITH t AS (
        |  SELECT * FROM (VALUES
        |    ('<conf><port>8080</port><host>db-1</host><mode>rw</mode></conf>'),
        |    ('<doc><title>Spark</title><lang>en</lang></doc>'),
        |    ('not xml')) AS v(x)),
        |p AS (
        |  SELECT x,
        |    regexp_extract(x, '^\s*<([A-Za-z_][A-Za-z0-9_.-]*)[ >]', 1) AS root,
        |    regexp_extract_all(x, '<([A-Za-z_][A-Za-z0-9_.-]*)>([^<]+)<', 1) AS ks,
        |    regexp_extract_all(x, '<([A-Za-z_][A-Za-z0-9_.-]*)>([^<]+)<', 2) AS vs
        |  FROM t)
        |SELECT x,
        |  CASE WHEN root = 'conf' THEN vs[list_position(ks, 'port')] END AS port,
        |  CASE WHEN root = 'conf' THEN vs[list_position(ks, 'host')] END AS host,
        |  CASE WHEN root = 'doc' THEN vs[list_position(ks, 'title')] END AS title
        |FROM p ORDER BY x ASC""".stripMargin,
    // Prefix-fit mirror of the parser's series_decompose_forecast:
    // exact integer sums over i < 23, the same double division and
    // per-point multiply-add, micro-floored.
    // trend = 7-pt clamped moving average of the EXACT integer counts
    // (window sums order-free), seasonal mirrors seriesSeasonalSql,
    // baseline/residual mirror the fixed zip_with op order.
    "kql_series_decompose2" ->
      """WITH f AS (
        |  SELECT event_type,
        |    CAST((epoch_ns(ts) // 1000000000
        |      - CAST(epoch(TIMESTAMP '2024-01-01') AS BIGINT)) // 86400 AS INT) AS i
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-29'),
        |g AS (SELECT event_type, i, COUNT(*) AS c FROM f GROUP BY 1, 2),
        |k AS (SELECT DISTINCT event_type FROM f),
        |axis AS (SELECT CAST(unnest(range(0, 28)) AS INT) AS i),
        |dense AS (
        |  SELECT k.event_type, a.i, CAST(COALESCE(g.c, 0) AS DOUBLE) AS v
        |  FROM k CROSS JOIN axis a
        |  LEFT JOIN g ON g.event_type = k.event_type AND g.i = a.i),
        |tr AS (
        |  SELECT event_type, i, v,
        |    SUM(v) OVER (PARTITION BY event_type ORDER BY i
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |    / CAST(COUNT(v) OVER (PARTITION BY event_type ORDER BY i
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS DOUBLE) AS t
        |  FROM dense),
        |pm AS (
        |  SELECT event_type, i % 7 AS ph, SUM(v) / CAST(COUNT(*) AS DOUBLE) AS pmean
        |  FROM dense GROUP BY 1, 2),
        |sm AS (
        |  SELECT event_type, SUM(v) / CAST(COUNT(*) AS DOUBLE) AS smean
        |  FROM dense GROUP BY 1),
        |x AS (
        |  SELECT tr.event_type, tr.i, tr.v,
        |    tr.t + (pm.pmean - sm.smean) AS bl
        |  FROM tr
        |  JOIN pm ON pm.event_type = tr.event_type AND pm.ph = tr.i % 7
        |  JOIN sm ON sm.event_type = tr.event_type)
        |SELECT event_type,
        |  string_agg(CAST(CAST(floor(bl * 1000000.0) AS BIGINT) AS VARCHAR), ',' ORDER BY i) AS bl,
        |  string_agg(CAST(CAST(floor((v - bl) * 1000000.0) AS BIGINT) AS VARCHAR), ',' ORDER BY i) AS rs
        |FROM x GROUP BY event_type ORDER BY event_type ASC""".stripMargin,
    // phase means via AVG over (event_type, i % 7) joined back onto the
    // dense axis; the two divisions mirror seriesSeasonalSql.
    "kql_series_seasonal" ->
      """WITH f AS (
        |  SELECT event_type,
        |    CAST((epoch_ns(ts) // 1000000000
        |      - CAST(epoch(TIMESTAMP '2024-01-01') AS BIGINT)) // 86400 AS INT) AS i
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-29'),
        |g AS (SELECT event_type, i, COUNT(*) AS c FROM f GROUP BY 1, 2),
        |k AS (SELECT DISTINCT event_type FROM f),
        |axis AS (SELECT CAST(unnest(range(0, 28)) AS INT) AS i),
        |dense AS (
        |  SELECT k.event_type, a.i, CAST(COALESCE(g.c, 0) AS DOUBLE) AS v
        |  FROM k CROSS JOIN axis a
        |  LEFT JOIN g ON g.event_type = k.event_type AND g.i = a.i),
        |pm AS (
        |  SELECT event_type, i % 7 AS ph, SUM(v) / CAST(COUNT(*) AS DOUBLE) AS pmean
        |  FROM dense GROUP BY 1, 2),
        |sm AS (
        |  SELECT event_type, SUM(v) / CAST(COUNT(*) AS DOUBLE) AS smean
        |  FROM dense GROUP BY 1)
        |SELECT d.event_type,
        |  string_agg(CAST(CAST(floor((pm.pmean - sm.smean) * 1000000.0) AS BIGINT) AS VARCHAR),
        |    ',' ORDER BY d.i) AS ss
        |FROM dense d
        |JOIN pm ON pm.event_type = d.event_type AND pm.ph = d.i % 7
        |JOIN sm ON sm.event_type = d.event_type
        |GROUP BY d.event_type ORDER BY d.event_type ASC""".stripMargin,
    // integer-exact tier arithmetic; the truncating fraction mirrors the
    // parser branch-for-branch.
    "kql_format_bytes" ->
      """WITH s AS (
        |  SELECT * FROM (VALUES (0), (500), (1023), (1024), (1536), (1048576),
        |    (5368709120), (1099511627776), (2251799813685248),
        |    (2305843009213693952), (-7)) AS t(v)),
        |u AS (
        |  SELECT CAST(v AS BIGINT) AS v,
        |    CASE WHEN v < 0 THEN -1
        |         WHEN v >= 1152921504606846976 THEN 6
        |         WHEN v >= 1125899906842624 THEN 5
        |         WHEN v >= 1099511627776 THEN 4
        |         WHEN v >= 1073741824 THEN 3
        |         WHEN v >= 1048576 THEN 2
        |         WHEN v >= 1024 THEN 1 ELSE 0 END AS k
        |  FROM s),
        |r AS (
        |  SELECT v, k,
        |    CAST(CASE k WHEN 6 THEN 1152921504606846976 WHEN 5 THEN 1125899906842624
        |      WHEN 4 THEN 1099511627776 WHEN 3 THEN 1073741824 WHEN 2 THEN 1048576
        |      WHEN 1 THEN 1024 ELSE 1 END AS BIGINT) AS d,
        |    CASE k WHEN 6 THEN 'EB' WHEN 5 THEN 'PB' WHEN 4 THEN 'TB' WHEN 3 THEN 'GB'
        |      WHEN 2 THEN 'MB' WHEN 1 THEN 'KB' ELSE 'Bytes' END AS unit
        |  FROM u)
        |SELECT v,
        |  CASE WHEN k < 0 THEN NULL
        |       ELSE CAST(v // d AS VARCHAR) || ' ' || unit END AS p0,
        |  CASE WHEN k < 0 THEN NULL
        |       ELSE CAST(v // d AS VARCHAR) || '.' ||
        |         lpad(CAST(CASE WHEN k = 6 THEN (((v % d) // 1024) * 100) // (d // 1024)
        |           ELSE ((v % d) * 100) // d END AS VARCHAR), 2, '0') || ' ' || unit END AS p2
        |FROM r ORDER BY v ASC""".stripMargin,
    // Mirrors the fill family with IGNORE NULLS window frames: forward =
    // last known preceding, backwards = first known following, linear =
    // pv + (nv - pv) * (i - pi) / (ni - pi) between the nearest known
    // indices (edge gaps take the nearest known value). avg sums are
    // exact integers; 'n' renders null bins explicitly on both engines.
    "kql_series_fill" ->
      """WITH f AS (
        |  SELECT event_type, user_id,
        |    CAST((epoch_ns(ts) // 1000000000
        |      - CAST(epoch(TIMESTAMP '2024-01-01') AS BIGINT)) // 86400 AS INT) AS i
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31'
        |    AND "value" >= 300),
        |g AS (SELECT event_type, i, AVG(user_id) AS av FROM f GROUP BY 1, 2),
        |k AS (SELECT DISTINCT event_type FROM f),
        |axis AS (SELECT CAST(unnest(range(0, 30)) AS INT) AS i),
        |dense AS (
        |  SELECT k.event_type, a.i, g.av
        |  FROM k CROSS JOIN axis a
        |  LEFT JOIN g ON g.event_type = k.event_type AND g.i = a.i),
        |w AS (
        |  SELECT event_type, i, av,
        |    last_value(av IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY i
        |      ROWS UNBOUNDED PRECEDING) AS pv,
        |    first_value(av IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY i
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    MAX(CASE WHEN av IS NOT NULL THEN i END) OVER (PARTITION BY event_type
        |      ORDER BY i ROWS UNBOUNDED PRECEDING) AS pi,
        |    MIN(CASE WHEN av IS NOT NULL THEN i END) OVER (PARTITION BY event_type
        |      ORDER BY i ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ni
        |  FROM dense),
        |x AS (
        |  SELECT event_type, i, av, pv, nv,
        |    CASE WHEN av IS NOT NULL THEN av
        |         WHEN pv IS NULL AND nv IS NULL THEN NULL
        |         WHEN pv IS NULL THEN nv
        |         WHEN nv IS NULL THEN pv
        |         ELSE pv + (nv - pv) * (i - pi) / (ni - pi) END AS lv
        |  FROM w)
        |SELECT event_type,
        |  string_agg(COALESCE(CAST(CAST(floor(av * 1000000.0) AS BIGINT) AS VARCHAR), 'n'), ',' ORDER BY i) AS raw,
        |  string_agg(COALESCE(CAST(CAST(floor(pv * 1000000.0) AS BIGINT) AS VARCHAR), 'n'), ',' ORDER BY i) AS f_fwd,
        |  string_agg(COALESCE(CAST(CAST(floor(nv * 1000000.0) AS BIGINT) AS VARCHAR), 'n'), ',' ORDER BY i) AS f_bwd,
        |  string_agg(COALESCE(CAST(CAST(floor(lv * 1000000.0) AS BIGINT) AS VARCHAR), 'n'), ',' ORDER BY i) AS f_lin
        |FROM x GROUP BY event_type ORDER BY event_type ASC""".stripMargin,
    // Mirrors seriesFit2LinesDynamic op-for-op: exact integer sums per
    // candidate split (conditional aggregates instead of the fold), the
    // same division chain for rss/slope/intercept, argmin ties broken
    // by smallest sp (the Spark fold's strict-< keeps the first).
    "kql_series_fit2" ->
      """WITH f AS (
        |  SELECT event_type,
        |    CAST((epoch_ns(ts) // 1000000000
        |      - CAST(epoch(TIMESTAMP '2024-01-01') AS BIGINT)) // 86400 AS INT) AS i
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31'),
        |g AS (SELECT event_type, i, COUNT(*) AS c FROM f GROUP BY 1, 2),
        |k AS (SELECT DISTINCT event_type FROM f),
        |axis AS (SELECT CAST(unnest(range(0, 30)) AS INT) AS i),
        |dense AS (
        |  SELECT k.event_type, a.i, CAST(COALESCE(g.c, 0) AS DOUBLE) AS v
        |  FROM k CROSS JOIN axis a
        |  LEFT JOIN g ON g.event_type = k.event_type AND g.i = a.i),
        |cand AS (SELECT CAST(unnest(range(2, 29)) AS INT) AS sp),
        |sums AS (
        |  SELECT d.event_type, s.sp,
        |    CAST(s.sp AS DOUBLE) AS ml, CAST(30 - s.sp AS DOUBLE) AS mr,
        |    SUM(v) FILTER (WHERE i < s.sp) AS lsy,
        |    SUM(v * v) FILTER (WHERE i < s.sp) AS lsyy,
        |    SUM(i * v) FILTER (WHERE i < s.sp) AS lsxy,
        |    SUM(v) FILTER (WHERE i >= s.sp) AS rsy,
        |    SUM(v * v) FILTER (WHERE i >= s.sp) AS rsyy,
        |    SUM((i - s.sp) * v) FILTER (WHERE i >= s.sp) AS rsxy
        |  FROM dense d CROSS JOIN cand s GROUP BY 1, 2, 3, 4),
        |r2 AS (
        |  SELECT *,
        |    (ml - 1) * ml / 2 AS sxl, (ml - 1) * ml * (2 * ml - 1) / 6 AS sxxl,
        |    (mr - 1) * mr / 2 AS sxr, (mr - 1) * mr * (2 * mr - 1) / 6 AS sxxr
        |  FROM sums),
        |r3 AS (
        |  SELECT *,
        |    ml * lsxy - sxl * lsy AS numl, ml * sxxl - sxl * sxl AS denl,
        |    mr * rsxy - sxr * rsy AS numr, mr * sxxr - sxr * sxr AS denr
        |  FROM r2),
        |r4 AS (
        |  SELECT *,
        |    ((lsyy - lsy * lsy / ml) - numl * numl / (denl * ml))
        |      + ((rsyy - rsy * rsy / mr) - numr * numr / (denr * mr)) AS rss
        |  FROM r3),
        |best AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY event_type
        |      ORDER BY rss, sp) AS rn FROM r4) WHERE rn = 1),
        |p AS (
        |  SELECT event_type, sp, rss,
        |    numl / denl AS sl, numr / denr AS sr,
        |    (lsy - (numl / denl) * sxl) / ml AS il,
        |    (rsy - (numr / denr) * sxr) / mr AS ir,
        |    (lsyy + rsyy) - (lsy + rsy) * (lsy + rsy) / 30.0 AS sstot
        |  FROM best)
        |SELECT p.event_type, CAST(p.sp AS INTEGER) AS split_idx,
        |  CAST(floor((1 - p.rss / p.sstot) * 1000000.0) AS BIGINT) AS rsq_u,
        |  CAST(floor((p.sstot / 30.0) * 1000000.0) AS BIGINT) AS var_u,
        |  CAST(floor((p.rss / 30.0) * 1000000.0) AS BIGINT) AS rvar_u,
        |  CAST(floor(p.sl * 1000000.0) AS BIGINT) AS sl_l_u,
        |  CAST(floor(p.il * 1000000.0) AS BIGINT) AS ic_l_u,
        |  CAST(floor(p.sr * 1000000.0) AS BIGINT) AS sl_r_u,
        |  CAST(floor(p.ir * 1000000.0) AS BIGINT) AS ic_r_u,
        |  string_agg(CAST(CAST(floor((CASE WHEN d.i < p.sp THEN p.il + p.sl * d.i
        |    ELSE p.ir + p.sr * (d.i - p.sp) END) * 1000000.0) AS BIGINT) AS VARCHAR),
        |    ',' ORDER BY d.i) AS fc
        |FROM p JOIN dense d USING (event_type)
        |GROUP BY p.event_type, p.sp, p.rss, p.sl, p.sr, p.il, p.ir, p.sstot
        |ORDER BY event_type ASC""".stripMargin,
    // Cramer chain mirrored op-for-op: the power/moment sums are exact
    // integers (order-free cross-engine), the determinant cofactor
    // expansions below are textually the expressions the parser
    // generates (expansion along the first column, same parse tree),
    // and every division happens in the same order — so all micro-unit
    // outputs are bit-equal.
    "kql_series_fit_poly" ->
      """WITH f AS (
        |  SELECT event_type,
        |    CAST((epoch_ns(ts) // 1000000000
        |      - CAST(epoch(TIMESTAMP '2024-01-01') AS BIGINT)) // 86400 AS INT) AS i
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31'),
        |g AS (SELECT event_type, i, COUNT(*) AS c FROM f GROUP BY 1, 2),
        |k AS (SELECT DISTINCT event_type FROM f),
        |axis AS (SELECT CAST(unnest(range(0, 30)) AS INT) AS i),
        |dense AS (
        |  SELECT k.event_type, a.i, CAST(COALESCE(g.c, 0) AS DOUBLE) AS v
        |  FROM k CROSS JOIN axis a
        |  LEFT JOIN g ON g.event_type = k.event_type AND g.i = a.i),
        |sums AS (
        |  SELECT event_type,
        |    CAST(COUNT(*) AS DOUBLE) AS s0,
        |    CAST(SUM(i) AS DOUBLE) AS s1,
        |    CAST(SUM(i * i) AS DOUBLE) AS s2,
        |    CAST(SUM(i * i * i) AS DOUBLE) AS s3,
        |    CAST(SUM(i * i * i * i) AS DOUBLE) AS s4,
        |    SUM(v) AS t0, SUM(v * i) AS t1, SUM(v * (i * i)) AS t2,
        |    SUM(v * v) AS u0
        |  FROM dense GROUP BY 1),
        |det AS (
        |  SELECT *,
        |    s0 * (s2 * (s4) - s3 * (s3)) - s1 * (s1 * (s4) - s3 * (s2)) + s2 * (s1 * (s3) - s2 * (s2)) AS det,
        |    t0 * (s2 * (s4) - s3 * (s3)) - t1 * (s1 * (s4) - s3 * (s2)) + t2 * (s1 * (s3) - s2 * (s2)) AS n0,
        |    s0 * (t1 * (s4) - t2 * (s3)) - s1 * (t0 * (s4) - t2 * (s2)) + s2 * (t0 * (s3) - t1 * (s2)) AS n1,
        |    s0 * (s2 * (t2) - s3 * (t1)) - s1 * (s1 * (t2) - s3 * (t0)) + s2 * (s1 * (t1) - s2 * (t0)) AS n2
        |  FROM sums),
        |cf AS (SELECT *, n0 / det AS a0, n1 / det AS a1, n2 / det AS a2 FROM det),
        |fin AS (
        |  SELECT *, (u0 - (a0 * t0 + a1 * t1 + a2 * t2)) AS ssres,
        |    (u0 - t0 * t0 / s0) AS sstot
        |  FROM cf)
        |SELECT fin.event_type,
        |  CAST(floor((CASE WHEN sstot = 0 THEN NULL ELSE 1 - ssres / sstot END) * 1000000.0) AS BIGINT) AS rsq_u,
        |  CAST(floor((sstot / s0) * 1000000.0) AS BIGINT) AS var_u,
        |  CAST(floor((ssres / s0) * 1000000.0) AS BIGINT) AS rvar_u,
        |  CAST(floor(a2 * 1000000.0) AS BIGINT) AS c2_u,
        |  CAST(floor(a1 * 1000000.0) AS BIGINT) AS c1_u,
        |  CAST(floor(a0 * 1000000.0) AS BIGINT) AS c0_u,
        |  string_agg(CAST(CAST(floor((a0 + a1 * d.i + a2 * (d.i * d.i)) * 1000000.0) AS BIGINT) AS VARCHAR),
        |    ',' ORDER BY d.i) AS fc
        |FROM fin JOIN dense d USING (event_type)
        |GROUP BY fin.event_type, ssres, sstot, s0, a0, a1, a2
        |ORDER BY event_type ASC""".stripMargin,
    // the DFT direct sum with the engine's exact fold order: DuckDB
    // list_reduce left-folds like Spark's aggregate (the leading 0.0
    // seed is IEEE-neutral), the indexed list_transform supplies j
    // (1-based, shifted), and the angle chain is textually the
    // parser's expression.
    "kql_series_fft" ->
      """WITH f AS (
        |  SELECT event_type,
        |    CAST((epoch_ns(ts) // 1000000000
        |      - CAST(epoch(TIMESTAMP '2024-01-01') AS BIGINT)) // 86400 AS INT) AS i
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31'),
        |g AS (SELECT event_type, i, COUNT(*) AS c FROM f GROUP BY 1, 2),
        |k AS (SELECT DISTINCT event_type FROM f),
        |axis AS (SELECT CAST(unnest(range(0, 30)) AS INT) AS i),
        |dense AS (
        |  SELECT k.event_type, a.i, CAST(COALESCE(g.c, 0) AS DOUBLE) AS v
        |  FROM k CROSS JOIN axis a
        |  LEFT JOIN g ON g.event_type = k.event_type AND g.i = a.i),
        |lists AS (
        |  SELECT event_type, list(v ORDER BY i) AS vs FROM dense GROUP BY 1),
        |coef AS (
        |  SELECT l.event_type, kk.k,
        |    list_reduce(list_transform(l.vs, (x, j) ->
        |      x * cos(2.0 * pi() * (j - 1) * kk.k / 30.0)), (a, b) -> a + b) AS re,
        |    -(list_reduce(list_transform(l.vs, (x, j) ->
        |      x * sin(2.0 * pi() * (j - 1) * kk.k / 30.0)), (a, b) -> a + b)) AS im
        |  FROM lists l CROSS JOIN (SELECT CAST(unnest(range(0, 30)) AS INT) AS k) kk)
        |SELECT event_type,
        |  string_agg(CAST(CAST(floor(re * 1000000.0) AS BIGINT) AS VARCHAR), ',' ORDER BY k) AS re_s,
        |  string_agg(CAST(CAST(floor(im * 1000000.0) AS BIGINT) AS VARCHAR), ',' ORDER BY k) AS im_s
        |FROM coef GROUP BY event_type
        |ORDER BY event_type ASC""".stripMargin,
    "kql_series_forecast" ->
      """WITH f AS (
        |  SELECT event_type,
        |    CAST((epoch_ns(ts) // 1000000000
        |      - CAST(epoch(TIMESTAMP '2024-01-01') AS BIGINT)) // 86400 AS INT) AS i
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31'),
        |g AS (SELECT event_type, i, COUNT(*) AS c FROM f GROUP BY 1, 2),
        |k AS (SELECT DISTINCT event_type FROM f),
        |axis AS (SELECT CAST(unnest(range(0, 30)) AS INT) AS i),
        |dense AS (
        |  SELECT k.event_type, a.i, CAST(COALESCE(g.c, 0) AS DOUBLE) AS v
        |  FROM k CROSS JOIN axis a
        |  LEFT JOIN g ON g.event_type = k.event_type AND g.i = a.i),
        |fit AS (
        |  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
        |    SUM(v) AS sy, SUM(i * v) AS sxy
        |  FROM dense WHERE i < 23 GROUP BY 1),
        |fit2 AS (
        |  SELECT *, (n - 1) * n / 2 AS sx, (n - 1) * n * (2 * n - 1) / 6 AS sxx
        |  FROM fit),
        |fit3 AS (
        |  SELECT *, (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope FROM fit2),
        |fit4 AS (SELECT *, (sy - slope * sx) / n AS icept FROM fit3)
        |SELECT d.event_type,
        |  string_agg(CAST(CAST(floor((icept + slope * d.i) * 1000000.0) AS BIGINT) AS VARCHAR),
        |    ',' ORDER BY d.i) AS fc
        |FROM dense d JOIN fit4 USING (event_type)
        |GROUP BY d.event_type ORDER BY event_type ASC""".stripMargin,
    // Geohash mirrors the parser's integer bit-interleave (no trig —
    // bit-identical); distances mirror the haversine op-for-op and
    // floor at whole meters.
    // mirrors the bag utilities on DuckDB's JSON functions: json_keys
    // for the (sorted) key set, ->> for text extraction (objects print
    // compact on both engines), first-wins merge as a j1-then-j2
    // COALESCE per projected key.
    "kql_bag_ops" ->
      """WITH b AS (
        |  SELECT * FROM (VALUES
        |    ('{"a":1,"b":{"x":true},"c":"s"}', '{"b":99,"d":[1,2]}'),
        |    ('{"k":null}', '{"k":7,"m":"z"}'),
        |    ('[1,2,3]', '{"only":1}')) AS t(j1, j2)),
        |g AS (
        |  SELECT j1, j2,
        |    substr(j1, 1, 1) = '{' AS o1,
        |    substr(j1, 1, 1) = '{' AND substr(j2, 1, 1) = '{' AS o12
        |  FROM b)
        |SELECT
        |  CASE WHEN o1 THEN array_to_string(list_sort(json_keys(j1)), ',') END AS keys1,
        |  CASE WHEN o1 THEN list_contains(json_keys(j1), 'b') END AS has_b,
        |  CASE WHEN o1 THEN list_contains(json_keys(j1), 'zz') END AS has_zz,
        |  CASE WHEN o12 THEN array_to_string(list_sort(list_distinct(json_keys(j1) || json_keys(j2))), ',') END AS mkeys,
        |  CASE WHEN o12 THEN COALESCE(j1 ->> '$.b', j2 ->> '$.b') END AS m_b,
        |  CASE WHEN o12 THEN COALESCE(j1 ->> '$.d', j2 ->> '$.d') END AS m_d,
        |  CASE WHEN o12 THEN COALESCE(j1 ->> '$.m', j2 ->> '$.m') END AS m_m
        |FROM g ORDER BY keys1 ASC""".stripMargin,
    "kql_preview" ->
      s"""${Sql.ordersInfoCte}
         |SELECT orderid, city,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders_info) AS preview_total
         |FROM orders_info
         |ORDER BY orderid ASC, city ASC LIMIT 7""".stripMargin,
    // INDEPENDENT re-derivation of the three (key, position, value)
    // streams as a plain UNION ALL — zero bag arithmetic, so the
    // engine's whole remove/set/expand chain (including the
    // documented key-order contract: originals keep order, in-place
    // replace keeps position 0, the new key appends last) is under
    // oracle.
    "kql_bag_ops2" ->
      s"""${Sql.ordersInfoCte},
         |f AS (SELECT * FROM orders_info WHERE orderid < 500),
         |u AS (
         |  SELECT 'city' AS k, 0 AS ix, city || '!' AS v FROM f
         |  UNION ALL SELECT 'oid', 1, CAST(orderid AS VARCHAR) FROM f
         |  UNION ALL SELECT 'parity', 2, CAST(orderid % 2 AS VARCHAR) FROM f)
         |SELECT k, CAST(ix AS BIGINT) AS ix, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(COUNT(DISTINCT v) AS BIGINT) AS nv
         |FROM u GROUP BY k, ix
         |ORDER BY ix ASC, k ASC""".stripMargin,
    // frame-ordered running sum mirrors the parser's left-to-right
    // shoelace fold; mean-latitude sums are exact decimals on both
    // engines.
    "kql_geo_area" ->
      """WITH v AS (
        |  SELECT * FROM (VALUES
        |    ('concave', 0, -5.0, 45.0), ('concave', 1, 5.0, 43.0),
        |    ('concave', 2, 12.0, 50.0), ('concave', 3, 0.0, 47.5),
        |    ('concave', 4, -8.0, 52.0), ('concave', 5, -5.0, 45.0),
        |    ('triangle', 0, 10.0, 50.0), ('triangle', 1, 11.0, 50.0),
        |    ('triangle', 2, 10.0, 51.0), ('triangle', 3, 10.0, 50.0))
        |    AS t(name, i, lon, lat)),
        |c AS (SELECT name, SUM(lat) / CAST(COUNT(*) AS DOUBLE) AS latc FROM v GROUP BY 1),
        |k AS (SELECT name, 111320.0 * cos(radians(latc)) AS kx FROM c),
        |e AS (
        |  SELECT a.name, a.i,
        |    (a.lon * kx * (b.lat * 110574.0) - b.lon * kx * (a.lat * 110574.0)) AS term
        |  FROM v a JOIN v b ON b.name = a.name AND b.i = a.i + 1
        |  JOIN k ON k.name = a.name),
        |s AS (
        |  SELECT name, i, SUM(term) OVER (PARTITION BY name ORDER BY i
        |    ROWS UNBOUNDED PRECEDING) AS run FROM e),
        |f AS (
        |  SELECT name, run FROM (
        |    SELECT *, row_number() OVER (PARTITION BY name ORDER BY i DESC) AS rn
        |    FROM s) WHERE rn = 1)
        |SELECT name, CAST(floor(abs(run) / 2.0) AS BIGINT) AS a_m2 FROM f
        |UNION ALL SELECT 'degenerate', CAST(NULL AS BIGINT)
        |ORDER BY name ASC""".stripMargin,
    // around/array_split/has_any_index/hash/gamma/unicode: everything
    // re-derived — the term regexes replayed via regexp_matches, the
    // split pieces via the literal index arithmetic, the Lanczos chain
    // replayed op-for-op (NOT DuckDB's lgamma — different libm), the
    // codepoint list and the round-trip rebuilt with unicode/chr.
    "kql_scalar_fns3" ->
      s"""${Sql.ordersInfoCte},
         |base AS (
         |  SELECT orderid, custid, amount, city,
         |    'order ' || CAST(orderid AS VARCHAR)
         |      || (CASE WHEN orderid % 3 = 0 THEN ' priority' ELSE ' normal' END) AS txt,
         |    CAST(orderid % 7 + 1 AS DOUBLE) + 0.5 AS lgx,
         |    CAST(orderid % 8 + 1 AS DOUBLE) / 4.0 AS ggx
         |  FROM orders_info WHERE orderid < 400),
         |zz AS (
         |  SELECT *,
         |    CASE WHEN lgx < 0.5 THEN lgx ELSE lgx - 1.0 END AS lz,
         |    CASE WHEN ggx < 0.5 THEN ggx ELSE ggx - 1.0 END AS gz
         |  FROM base),
         |lanc AS (
         |  SELECT *,
         |    (0.5 * ln(2.0 * pi()) + (lz + 0.5) * ln(lz + 7.5) - (lz + 7.5)
         |      + ln(((((((((0.99999999999980993
         |        + (676.5203681218851) / (lz + 1.0))
         |        + (-1259.1392167224028) / (lz + 2.0))
         |        + (771.32342877765313) / (lz + 3.0))
         |        + (-176.61502916214059) / (lz + 4.0))
         |        + (12.507343278686905) / (lz + 5.0))
         |        + (-0.13857109526572012) / (lz + 6.0))
         |        + (0.0000099843695780195716) / (lz + 7.0))
         |        + (0.00000015056327351493116) / (lz + 8.0))))
         |      - (CASE WHEN lgx < 0.5 THEN ln(lgx) ELSE 0.0 END) AS lgv,
         |    (0.5 * ln(2.0 * pi()) + (gz + 0.5) * ln(gz + 7.5) - (gz + 7.5)
         |      + ln(((((((((0.99999999999980993
         |        + (676.5203681218851) / (gz + 1.0))
         |        + (-1259.1392167224028) / (gz + 2.0))
         |        + (771.32342877765313) / (gz + 3.0))
         |        + (-176.61502916214059) / (gz + 4.0))
         |        + (12.507343278686905) / (gz + 5.0))
         |        + (-0.13857109526572012) / (gz + 6.0))
         |        + (0.0000099843695780195716) / (gz + 7.0))
         |        + (0.00000015056327351493116) / (gz + 8.0))))
         |      - (CASE WHEN ggx < 0.5 THEN ln(ggx) ELSE 0.0 END) AS ggv
         |  FROM zz)
         |SELECT orderid,
         |  CAST(CASE WHEN CAST(amount AS DOUBLE) BETWEEN 150.0 - 25.0 AND 150.0 + 25.0
         |    THEN 1 ELSE 0 END AS BIGINT) AS near150,
         |  CASE
         |    WHEN regexp_matches(lower(txt), '(^|[^a-z0-9])urgent([^a-z0-9]|$$)') THEN 0
         |    WHEN regexp_matches(lower(txt), '(^|[^a-z0-9])priority([^a-z0-9]|$$)') THEN 1
         |    WHEN regexp_matches(lower(txt), '(^|[^a-z0-9])normal([^a-z0-9]|$$)') THEN 2
         |    ELSE -1 END AS hidx,
         |  md5('o' || CAST(orderid AS VARCHAR)) AS md5h,
         |  sha256(city) AS sh256,
         |  CAST((1 + 1) + 10 * (2 + 1) AS BIGINT) AS np,
         |  CAST(custid AS BIGINT) * 100000 + CAST(amount AS BIGINT) + CAST(amount AS BIGINT) AS pick,
         |  CAST(floor(lgv * 1000000.0) AS BIGINT) AS lg_u,
         |  CAST(floor(exp(ggv) * 1000000.0) AS BIGINT) AS g_u,
         |  CAST(list_aggregate(list_transform(range(1, length(city) + 1),
         |    ci -> unicode(substr(city, CAST(ci AS INT), 1))), 'sum') AS BIGINT) AS cp_sum,
         |  CAST(length(city) AS BIGINT) AS cp_n,
         |  CAST(CASE WHEN list_reduce(list_transform(range(1, length(city) + 1),
         |    ci -> chr(unicode(substr(city, CAST(ci AS INT), 1)))),
         |    (ca, cb) -> ca || cb) = city THEN 1 ELSE 0 END AS BIGINT) AS rt_ok
         |FROM lanc
         |ORDER BY orderid ASC""".stripMargin,
    "kql_column_ifexists" ->
      s"""${Sql.ordersInfoCte}
         |SELECT orderid, amount * 2 AS a,
         |  CAST(orderid * 10 + 1 AS INTEGER) AS m
         |FROM orders_info WHERE orderid < 40 ORDER BY orderid ASC""".stripMargin,
    // scalar wave 4: strcmp via the same 3-way CASE over byte-ordered
    // strings, regex_quote via the identical metachar-class replace
    // (DuckDB needs the 'g' flag; backslashes are literal in DuckDB
    // strings where Spark literals escape them), the desc sort read
    // back as greatest/least, Jaccard re-derived from
    // list_distinct/list_filter cardinalities in the same op order,
    // the bag fields from the first-wins duplicate rule directly, and
    // the base64 via the same per-byte hex fold.
    "kql_scalar_fns4" ->
      s"""${Sql.ordersInfoCte},
         |b AS (
         |  SELECT orderid, custid, amount, city,
         |    'c' || city AS s1v, 'c' || substr(city, 3, 3) AS s2v,
         |    list_distinct([orderid % 4, orderid % 6, 2]) AS la,
         |    list_distinct([orderid % 6, 3, 2]) AS lb
         |  FROM orders_info WHERE orderid < 300)
         |SELECT orderid,
         |  CASE WHEN s1v < s2v THEN -1 WHEN s1v = s2v THEN 0
         |    WHEN s1v > s2v THEN 1 END AS cmp,
         |  regexp_replace(city || '+(' || CAST(orderid % 10 AS VARCHAR) || ').*',
         |    '([.^$$*+?()\\[\\]{}|\\\\])', '\\\\\\1', 'g') AS rq,
         |  CAST(floor(CAST(len(list_filter(la, jx -> list_contains(lb, jx))) AS DOUBLE)
         |    / nullif(len(list_distinct(list_concat(la, lb))), 0) * 1000000.0) AS BIGINT) AS ja_u,
         |  CAST(greatest(orderid % 7, orderid % 5, orderid % 3, amount % 11) AS BIGINT) AS sd0,
         |  CAST(least(orderid % 7, orderid % 5, orderid % 3, amount % 11) AS BIGINT) AS sd3,
         |  CAST(orderid AS BIGINT) AS bza,
         |  CAST(amount AS BIGINT) AS bzb,
         |  'k1,k2' AS bkeys,
         |  to_base64(from_hex(
         |    lpad(to_hex(orderid % 256), 2, '0') || lpad(to_hex(amount % 256), 2, '0')
         |    || lpad(to_hex(custid % 256), 2, '0') || lpad(to_hex(200), 2, '0'))) AS b64
         |FROM b
         |ORDER BY orderid ASC""".stripMargin,
    // IP tier 2: fixed-datatable fixture expectations (the kql_ipv6
    // convention) — every bit hand-derived from the literals: CIDR
    // top-bit membership, strict-octet term detection over the
    // boundary-class tokenization, octet-boundary prefix rule.
    "kql_ip_fns2" ->
      """SELECT id, any4, in6, any6, h4, ha4, hp4, hap4 FROM (VALUES
        |  (CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
        |  (CAST(3 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
        |  (CAST(4 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
        |  (CAST(5 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT))
        |) AS t(id, any4, in6, any6, h4, ha4, hp4, hap4)
        |ORDER BY id ASC""".stripMargin,
    // trig tier: the identical left-fold addition order over libm
    // calls (0.0 + sin(x1) collapses exactly), micro-floored; the
    // out-of-range asin NULL pin re-derived from the range test.
    "kql_series_trig" ->
      s"""${Sql.ordersInfoCte},
         |b AS (
         |  SELECT orderid,
         |    CAST(orderid % 7 AS DOUBLE) / 3.0 AS x1,
         |    CAST(amount % 13 AS DOUBLE) / 6.0 AS x2,
         |    CAST(-1.25 AS DOUBLE) AS x3, CAST(2.0 AS DOUBLE) AS x4
         |  FROM orders_info WHERE orderid < 200)
         |SELECT orderid,
         |  CAST(floor((((sin(x1) + sin(x2)) + sin(x3)) + sin(x4)) * 1000000.0) AS BIGINT) AS sn_u,
         |  CAST(floor((((cos(x1) + cos(x2)) + cos(x3)) + cos(x4)) * 1000000.0) AS BIGINT) AS cn_u,
         |  CAST(floor((((tan(x1) + tan(x2)) + tan(x3)) + tan(x4)) * 1000000.0) AS BIGINT) AS tn_u,
         |  CAST(floor((((atan(x1) + atan(x2)) + atan(x3)) + atan(x4)) * 1000000.0) AS BIGINT) AS at_u,
         |  CAST(floor((((asin(x1 / 4.0) + asin(x2 / 4.0)) + asin(x3 / 4.0)) + asin(x4 / 4.0)) * 1000000.0) AS BIGINT) AS as_u,
         |  CAST(floor((((acos(x1 / 4.0) + acos(x2 / 4.0)) + acos(x3 / 4.0)) + acos(x4 / 4.0)) * 1000000.0) AS BIGINT) AS ac_u,
         |  CAST(CASE WHEN abs(x3) > 1.0 OR abs(x4) > 1.0 THEN 1 ELSE 0 END AS BIGINT) AS a_null
         |FROM b
         |ORDER BY orderid ASC""".stripMargin,
    // sessionization replayed independently: the idle-gap groups via
    // lag + running sum, the greedy max-window restarts via a SCALAR
    // list_reduce over the in-group running prefix (single-value
    // state — unaffected by the struct-fold bug noted at the stat
    // tier); unix_millis compared as integers.
    "kql_row_session" ->
      s"""${Sql.ordersInfoCte},
         |ev AS (
         |  SELECT orderid,
         |    CAST((1700000000 + (orderid * 7919) % 20000) AS BIGINT) * 1000000 AS tus
         |  FROM orders_info WHERE orderid < 200),
         |fl AS (
         |  SELECT orderid, tus,
         |    CASE WHEN lag(tus) OVER (ORDER BY tus, orderid) IS NULL
         |      OR tus - lag(tus) OVER (ORDER BY tus, orderid) > 300000000
         |      THEN 1 ELSE 0 END AS flag
         |  FROM ev),
         |gr AS (
         |  SELECT orderid, tus,
         |    SUM(flag) OVER (ORDER BY tus, orderid
         |      ROWS UNBOUNDED PRECEDING) AS g
         |  FROM fl),
         |pre AS (
         |  SELECT orderid,
         |    list(tus) OVER (PARTITION BY g ORDER BY tus, orderid
         |      ROWS UNBOUNDED PRECEDING) AS p
         |  FROM gr)
         |SELECT orderid,
         |  CAST(list_reduce(p, (rws, rwt) ->
         |    CASE WHEN rwt - rws > 1200000000 THEN rwt ELSE rws END) // 1000 AS BIGINT) AS ms
         |FROM pre ORDER BY orderid ASC""".stripMargin,
    // exact-distinct counts and the with-nulls/plain list length split
    // re-derived with FILTER/CASE aggregates.
    "kql_agg_variants" ->
      s"""${Sql.ordersInfoCte}
         |SELECT orderid % 4 AS seg,
         |  CAST(COUNT(DISTINCT city) AS BIGINT) AS nd,
         |  CAST(COUNT(DISTINCT CASE WHEN amount > 150 THEN city END) AS BIGINT) AS ndi,
         |  CAST(COUNT(*) AS BIGINT) AS nwn,
         |  CAST(COUNT(*) FILTER (WHERE amount % 3 <> 0) AS BIGINT) AS nplain,
         |  CAST(COUNT(*) FILTER (WHERE amount % 3 = 0) AS BIGINT) AS nnull
         |FROM orders_info GROUP BY 1 ORDER BY seg ASC""".stripMargin,
    // masked quad rebuilt from the constructed octets (the /28 zeroes
    // the low 4 bits of the last octet); bytes re-derived from the
    // ASCII city text via unicode codepoints.
    "kql_net_b64" ->
      s"""${Sql.ordersInfoCte}
         |SELECT orderid,
         |  CAST(orderid % 224 + 1 AS VARCHAR) || '.' || CAST(custid % 256 AS VARCHAR)
         |    || '.0.0/16' AS m16,
         |  CAST(orderid % 224 + 1 AS VARCHAR) || '.' || CAST(custid % 256 AS VARCHAR)
         |    || '.' || CAST(amount % 256 AS VARCHAR) || '.'
         |    || CAST(((orderid * 7) % 256) // 16 * 16 AS VARCHAR) || '/28' AS m28,
         |  CAST(list_aggregate(list_transform(range(1, length(city) + 1),
         |    bi -> unicode(substr(city, CAST(bi AS INT), 1))), 'sum') AS BIGINT) AS bsum,
         |  CAST(length(city) AS BIGINT) AS bn
         |FROM orders_info WHERE orderid < 50 ORDER BY orderid ASC""".stripMargin,
    // the incomplete-beta fraction replayed as a RECURSIVE CTE from the
    // SAME Scala fold builder the engine compiles (duckBetacfStep —
    // see the list_reduce caveat above); welch's se²/df/t² arithmetic
    // mirrored inline; the symmetry split selects the fraction args
    // (fa, fb, fx) per row exactly as ibetaSql's CASE does.
    "kql_stat_tests" -> {
      val (c2, d2i, h2) = duckBetacfStep
      s"""WITH RECURSIVE ${Sql.ordersInfoCte.stripPrefix("WITH ")},
         |b1 AS (
         |  SELECT orderid,
         |    CAST(amount % 47 + 1 AS DOUBLE) / 49.0 AS xb,
         |    CAST(orderid % 4 + 1 AS DOUBLE) / 2.0 AS aa,
         |    CAST(custid % 3 + 2 AS DOUBLE) / 2.0 AS bb,
         |    CAST(amount AS DOUBLE) AS m1,
         |    CAST(amount % 7 + 1 AS DOUBLE) AS v1,
         |    CAST(10 + orderid % 5 AS DOUBLE) AS n1,
         |    CAST(amount AS DOUBLE) - CAST(custid % 5 AS DOUBLE) / 2.0 AS m2,
         |    CAST(custid % 9 + 1 AS DOUBLE) AS v2,
         |    CAST(12 + custid % 4 AS DOUBLE) AS n2
         |  FROM orders_info WHERE orderid < 60),
         |b2 AS (
         |  SELECT *, (v1 / n1 + v2 / n2) AS se2 FROM b1),
         |b3 AS (
         |  SELECT *,
         |    (se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1.0)
         |      + (v2 / n2) * (v2 / n2) / (n2 - 1.0))) AS df,
         |    ((m1 - m2) * (m1 - m2) / se2) AS t2
         |  FROM b2),
         |b4 AS (
         |  SELECT *, df / 2.0 AS wa, df / (df + t2) AS wx FROM b3),
         |frin AS (
         |  SELECT orderid, 'cdf' AS kind,
         |    CASE WHEN xb < (aa + 1.0) / (aa + bb + 2.0) THEN aa ELSE bb END AS fa,
         |    CASE WHEN xb < (aa + 1.0) / (aa + bb + 2.0) THEN bb ELSE aa END AS fb,
         |    CASE WHEN xb < (aa + 1.0) / (aa + bb + 2.0) THEN xb ELSE (1.0 - xb) END AS fx
         |  FROM b4
         |  UNION ALL
         |  SELECT orderid, 'p' AS kind,
         |    CASE WHEN wx < (wa + 1.0) / (wa + 0.5 + 2.0) THEN wa ELSE 0.5 END AS fa,
         |    CASE WHEN wx < (wa + 1.0) / (wa + 0.5 + 2.0) THEN 0.5 ELSE wa END AS fb,
         |    CASE WHEN wx < (wa + 1.0) / (wa + 0.5 + 2.0) THEN wx ELSE (1.0 - wx) END AS fx
         |  FROM b4),
         |cf AS (
         |  SELECT orderid, kind, fa, fb, fx, 0 AS m,
         |    CAST(1.0 AS DOUBLE) AS c,
         |    CAST($duckBetacfInitD AS DOUBLE) AS d,
         |    CAST($duckBetacfInitD AS DOUBLE) AS h
         |  FROM frin
         |  UNION ALL
         |  SELECT cfr.orderid, cfr.kind, cfr.fa, cfr.fb, cfr.fx, cfr.m + 1,
         |    CAST($c2 AS DOUBLE), CAST($d2i AS DOUBLE), CAST($h2 AS DOUBLE)
         |  FROM cf cfr WHERE cfr.m < 200),
         |fr AS (SELECT orderid, kind, h FROM cf WHERE m = 200)
         |SELECT b4.orderid,
         |  CAST(floor((CASE WHEN xb <= 0.0 THEN 0.0 WHEN xb >= 1.0 THEN 1.0
         |    WHEN xb < (aa + 1.0) / (aa + bb + 2.0) THEN
         |      ${duckFront("aa", "bb", "xb")} * fc.h / aa
         |    ELSE 1.0 - ${duckFront("bb", "aa", "(1.0 - xb)")} * fc.h / bb END)
         |    * 1000000.0) AS BIGINT) AS cdf_u,
         |  CAST(floor(exp((aa - 1.0) * ln(xb) + (bb - 1.0) * ln(1.0 - xb)
         |    + ${duckLgamma("aa + bb")} - ${duckLgamma("aa")} - ${duckLgamma("bb")})
         |    * 1000000.0) AS BIGINT) AS pdf_u,
         |  CAST(floor((CASE WHEN wx <= 0.0 THEN 0.0 WHEN wx >= 1.0 THEN 1.0
         |    WHEN wx < (wa + 1.0) / (wa + 0.5 + 2.0) THEN
         |      ${duckFront("wa", "0.5", "wx")} * fp.h / wa
         |    ELSE 1.0 - ${duckFront("0.5", "wa", "(1.0 - wx)")} * fp.h / 0.5 END)
         |    * 1000000.0) AS BIGINT) AS p_u
         |FROM b4
         |JOIN fr fc ON fc.orderid = b4.orderid AND fc.kind = 'cdf'
         |JOIN fr fp ON fp.orderid = b4.orderid AND fp.kind = 'p'
         |ORDER BY b4.orderid ASC""".stripMargin
    },
    // stat tier 2: the erf series and the beta_inv safeguarded Newton
    // replayed as recursive CTEs from the SAME Scala builders as the
    // engine (erfFoldStep / betacfFold / betacfInitD / loggammaCore).
    // The inverse runs as ONE flattened recursion with a 203-phase
    // cycle per Newton step: m 0..199 advance the Lentz fraction,
    // m=200→201 stores f = cdf−p (fv column), 201→202 moves x
    // (bracket + inclusive Newton/bisect choice), 202→0 re-derives
    // the fraction args and re-inits (c, d, h) for the new x.
    "kql_stat_tests2" -> {
      val (c2, d2i, h2) = duckBetacfStep
      val (et1, es1) = duckErfStep
      def split(x: String) = s"($x < (cfr.a + 1.0) / (cfr.a + cfr.b + 2.0))"
      val cdfCur = s"(CASE WHEN ${split("cfr.x")} THEN " +
        s"${duckFront("cfr.a", "cfr.b", "cfr.x")} * cfr.h / cfr.a " +
        s"ELSE 1.0 - ${duckFront("cfr.b", "cfr.a", "(1.0 - cfr.x)")} * cfr.h / cfr.b END)"
      val pd = s"exp((cfr.a - 1.0) * ln(cfr.x) + (cfr.b - 1.0) * ln(1.0 - cfr.x) " +
        s"+ ${duckLgamma("cfr.a + cfr.b")} - ${duckLgamma("cfr.a")} - ${duckLgamma("cfr.b")})"
      val lo2 = s"(CASE WHEN cfr.fv > 0.0 THEN cfr.lo ELSE cfr.x END)"
      val hi2 = s"(CASE WHEN cfr.fv > 0.0 THEN cfr.x ELSE cfr.hi END)"
      val xn = s"(cfr.x - cfr.fv / $pd)"
      val xAcc = s"(CASE WHEN $xn >= $lo2 AND $xn <= $hi2 THEN $xn " +
        s"ELSE ($lo2 + $hi2) / 2.0 END)"
      val fa2 = s"(CASE WHEN ${split("cfr.x")} THEN cfr.a ELSE cfr.b END)"
      val fb2 = s"(CASE WHEN ${split("cfr.x")} THEN cfr.b ELSE cfr.a END)"
      val fx2 = s"(CASE WHEN ${split("cfr.x")} THEN cfr.x ELSE (1.0 - cfr.x) END)"
      val initD2 = graft.kql.KqlParser.betacfInitD(fa2, fb2, fx2)
      s"""WITH RECURSIVE ${Sql.ordersInfoCte.stripPrefix("WITH ")},
         |base AS (
         |  SELECT orderid,
         |    (CAST(amount AS DOUBLE) - 149.5) / 33.0 AS xe,
         |    CAST(amount % 19 + 1 AS DOUBLE) / 20.0 AS p,
         |    CAST(orderid % 4 + 1 AS DOUBLE) / 2.0 AS a,
         |    CAST(custid % 3 + 2 AS DOUBLE) / 2.0 AS b
         |  FROM orders_info WHERE orderid < 30),
         |efin AS (
         |  SELECT orderid, 'e' AS kind, xe AS x FROM base
         |  UNION ALL SELECT orderid, 'c' AS kind, xe * 2.5 AS x FROM base),
         |ef AS (
         |  SELECT orderid, kind, x, 2.0 * x * x AS q, 0 AS m,
         |    CAST(1.0 AS DOUBLE) AS t, CAST(1.0 AS DOUBLE) AS s
         |  FROM efin
         |  UNION ALL
         |  SELECT cfr.orderid, cfr.kind, cfr.x, cfr.q, cfr.m + 1,
         |    CAST($et1 AS DOUBLE), CAST($es1 AS DOUBLE)
         |  FROM ef cfr WHERE cfr.m < 160),
         |efv AS (
         |  SELECT orderid, kind,
         |    CASE WHEN abs(x) >= 6.0 THEN CAST(sign(x) AS DOUBLE)
         |      ELSE 2.0 * x / sqrt(pi()) * exp(-(x * x)) * s END AS ev
         |  FROM ef WHERE m = 160),
         |bi0 AS (
         |  SELECT orderid, p, a, b, a / (a + b) AS x,
         |    CASE WHEN a / (a + b) < (a + 1.0) / (a + b + 2.0) THEN a ELSE b END AS fa,
         |    CASE WHEN a / (a + b) < (a + 1.0) / (a + b + 2.0) THEN b ELSE a END AS fb,
         |    CASE WHEN a / (a + b) < (a + 1.0) / (a + b + 2.0) THEN a / (a + b)
         |      ELSE (1.0 - a / (a + b)) END AS fx
         |  FROM base),
         |bi AS (
         |  SELECT orderid, p, a, b, 0 AS it, 0 AS m,
         |    CAST(1.0E-12 AS DOUBLE) AS lo, 1.0 - 1.0E-12 AS hi, x,
         |    CAST(0.0 AS DOUBLE) AS fv, fa, fb, fx,
         |    CAST(1.0 AS DOUBLE) AS c,
         |    CAST($duckBetacfInitD AS DOUBLE) AS d,
         |    CAST($duckBetacfInitD AS DOUBLE) AS h
         |  FROM bi0
         |  UNION ALL
         |  SELECT cfr.orderid, cfr.p, cfr.a, cfr.b,
         |    CASE WHEN cfr.m = 202 THEN cfr.it + 1 ELSE cfr.it END,
         |    CASE WHEN cfr.m < 200 THEN cfr.m + 1 WHEN cfr.m = 200 THEN 201
         |      WHEN cfr.m = 201 THEN 202 ELSE 0 END,
         |    CASE WHEN cfr.m = 201 THEN $lo2 ELSE cfr.lo END,
         |    CASE WHEN cfr.m = 201 THEN $hi2 ELSE cfr.hi END,
         |    CASE WHEN cfr.m = 201 THEN $xAcc ELSE cfr.x END,
         |    CASE WHEN cfr.m = 200 THEN $cdfCur - cfr.p ELSE cfr.fv END,
         |    CASE WHEN cfr.m = 202 THEN $fa2 ELSE cfr.fa END,
         |    CASE WHEN cfr.m = 202 THEN $fb2 ELSE cfr.fb END,
         |    CASE WHEN cfr.m = 202 THEN $fx2 ELSE cfr.fx END,
         |    CASE WHEN cfr.m < 200 THEN CAST($c2 AS DOUBLE)
         |      WHEN cfr.m = 202 THEN CAST(1.0 AS DOUBLE) ELSE cfr.c END,
         |    CASE WHEN cfr.m < 200 THEN CAST($d2i AS DOUBLE)
         |      WHEN cfr.m = 202 THEN CAST($initD2 AS DOUBLE) ELSE cfr.d END,
         |    CASE WHEN cfr.m < 200 THEN CAST($h2 AS DOUBLE)
         |      WHEN cfr.m = 202 THEN CAST($initD2 AS DOUBLE) ELSE cfr.h END
         |  FROM bi cfr WHERE NOT (cfr.it = 24 AND cfr.m = 0)),
         |fin AS (SELECT orderid, x FROM bi WHERE it = 24 AND m = 0)
         |SELECT base.orderid,
         |  CAST(floor(ee.ev * 1000000.0) AS BIGINT) AS erf_u,
         |  CAST(floor((1.0 - ec.ev) * 1000000.0) AS BIGINT) AS erfc_u,
         |  CAST(floor(fin.x * 1000000.0) AS BIGINT) AS inv_u
         |FROM base
         |JOIN efv ee ON ee.orderid = base.orderid AND ee.kind = 'e'
         |JOIN efv ec ON ec.orderid = base.orderid AND ec.kind = 'c'
         |JOIN fin ON fin.orderid = base.orderid
         |ORDER BY base.orderid ASC""".stripMargin
    },
    // closest point: the per-edge clamped-projection scan replayed as
    // rows, argmin via ROW_NUMBER(d, i) — the same first-best
    // tiebreak as the engine's strict-< fold; the mean latitude is a
    // line CONSTANT here, written as the engine's literal fold.
    "kql_geo_closest" ->
      """WITH k AS (
        |  SELECT 111320.0 * cos(radians((((0.0 + 50.0) + 50.2) + 50.6) / 3.0)) AS kx),
        |verts AS (
        |  SELECT i, CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y FROM (VALUES
        |    (0, 10.0, 50.0), (1, 10.5, 50.2), (2, 10.5, 50.6)) AS t(i, x, y)),
        |q AS (
        |  SELECT name, CAST(qlon AS DOUBLE) AS qlon, CAST(qlat AS DOUBLE) AS qlat
        |  FROM (VALUES ('mid', 10.2, 50.4), ('far', 11.0, 51.0),
        |               ('vert', 10.5, 50.2)) AS t(name, qlon, qlat)),
        |e AS (
        |  SELECT q.name, a.i, k.kx,
        |    q.qlon * k.kx AS qx, q.qlat * 110574.0 AS qy,
        |    a.x * k.kx AS ax, a.y * 110574.0 AS ay,
        |    (b.x - a.x) * k.kx AS dx, (b.y - a.y) * 110574.0 AS dy
        |  FROM q CROSS JOIN k
        |  JOIN verts a ON TRUE JOIN verts b ON b.i = a.i + 1),
        |f0 AS (SELECT *, dx * dx + dy * dy AS len2 FROM e),
        |f1 AS (
        |  SELECT *, CASE WHEN len2 = 0.0 THEN 0.0
        |    ELSE least(1.0, greatest(0.0, ((qx - ax) * dx + (qy - ay) * dy) / len2))
        |  END AS t FROM f0),
        |f2 AS (
        |  SELECT name, i, kx, t, ax, ay, dx, dy,
        |    sqrt((qx - ax - t * dx) * (qx - ax - t * dx)
        |       + (qy - ay - t * dy) * (qy - ay - t * dy)) AS d
        |  FROM f1),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY name ORDER BY d ASC, i ASC) AS rn
        |  FROM f2)
        |SELECT name,
        |  CAST(floor((ax + t * dx) / kx * 1000000.0) AS BIGINT) AS cx_u,
        |  CAST(floor((ay + t * dy) / 110574.0 * 1000000.0) AS BIGINT) AS cy_u,
        |  CAST(floor(d) AS BIGINT) AS d_u
        |FROM r WHERE rn = 1 ORDER BY name ASC""".stripMargin,
    // densify: the vertex list regenerated edge-major (edges × range
    // rows), lengths re-measured with the SAME mean-latitude folds
    // (list() ORDER BY keeps the engine's left-fold order; list_reduce
    // carries the scalar running sum).
    "kql_geo_densify" ->
      """WITH verts AS (
        |  SELECT name, i, CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y
        |  FROM (VALUES
        |    ('ln', 0, 10.0, 50.0), ('ln', 1, 10.5, 50.2), ('ln', 2, 10.5, 50.6),
        |    ('pg', 0, 0.0, 0.0), ('pg', 1, 0.4, 0.0), ('pg', 2, 0.4, 0.3),
        |    ('pg', 3, 0.0, 0.0)) AS t(name, i, x, y)),
        |c AS (
        |  SELECT name,
        |    list_reduce(list(y ORDER BY i), (la, lb) -> la + lb)
        |      / CAST(COUNT(*) AS DOUBLE) AS latc
        |  FROM verts GROUP BY name),
        |k AS (SELECT name, 111320.0 * cos(radians(latc)) AS kx FROM c),
        |e AS (
        |  SELECT a.name, a.i, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2, k.kx,
        |    greatest(1, CAST(ceil(sqrt(((b.x - a.x) * k.kx) * ((b.x - a.x) * k.kx)
        |      + ((b.y - a.y) * 110574.0) * ((b.y - a.y) * 110574.0)) / 9000.0) AS INT)) AS n
        |  FROM verts a
        |  JOIN verts b ON b.name = a.name AND b.i = a.i + 1
        |  JOIN k ON k.name = a.name),
        |pj AS (
        |  SELECT name, i, unnest(range(n)) AS j, x1, y1, x2, y2, n FROM e),
        |pts AS (
        |  SELECT name, i, CAST(j AS INT) AS j,
        |    x1 + (x2 - x1) * (CAST(j AS DOUBLE) / n) AS px,
        |    y1 + (y2 - y1) * (CAST(j AS DOUBLE) / n) AS py
        |  FROM pj
        |  UNION ALL
        |  SELECT v.name, 999999, 0, v.x, v.y
        |  FROM verts v
        |  JOIN (SELECT name, MAX(i) AS mi FROM verts GROUP BY name) m
        |    ON m.name = v.name AND m.mi = v.i),
        |lp AS (
        |  SELECT name, list([px, py] ORDER BY i, j) AS p FROM pts GROUP BY name),
        |m1 AS (
        |  SELECT name, p,
        |    list_reduce(list_transform(p, pp -> pp[2]), (la, lb) -> la + lb)
        |      / CAST(len(p) AS DOUBLE) AS latc2
        |  FROM lp),
        |m2 AS (SELECT name, p, 111320.0 * cos(radians(latc2)) AS kx2 FROM m1),
        |m3 AS (
        |  SELECT name, p,
        |    list_reduce(list_transform(range(1, len(p)), kk ->
        |      sqrt(((p[CAST(kk AS INT) + 1][1] - p[CAST(kk AS INT)][1]) * kx2)
        |             * ((p[CAST(kk AS INT) + 1][1] - p[CAST(kk AS INT)][1]) * kx2)
        |           + ((p[CAST(kk AS INT) + 1][2] - p[CAST(kk AS INT)][2]) * 110574.0)
        |             * ((p[CAST(kk AS INT) + 1][2] - p[CAST(kk AS INT)][2]) * 110574.0))),
        |      (la, lb) -> la + lb) AS dlen
        |  FROM m2)
        |SELECT name,
        |  CAST(floor(dlen * 1000.0) AS BIGINT) AS len_u,
        |  CAST(floor(p[2][1] * 1000000.0) AS BIGINT) AS p1x_u,
        |  CAST(floor(p[2][2] * 1000000.0) AS BIGINT) AS p1y_u,
        |  CAST(1 AS BIGINT) AS last_ok
        |FROM m3 ORDER BY name ASC""".stripMargin,
    // tz conversion: the fixed +05:30 offset is 19800 s added to the
    // instant; the index arms re-derived from the [m,7,m,7,m] layout
    // (matches at 0/2/4 for m and 1/3 for 7 — start 1 → 2, third
    // occurrence → 4, window [0,1) second occurrence → none,
    // start −2 → 3).
    "kql_tz_index" ->
      s"""${Sql.ordersInfoCte}
         |SELECT orderid,
         |  (CAST(1700000000 AS BIGINT) + orderid * 3600 + 19800) * 1000 AS lms,
         |  CAST(1 AS BIGINT) AS rt_ok,
         |  CAST(2 AS INTEGER) AS i2, CAST(4 AS INTEGER) AS i3,
         |  CAST(-1 AS INTEGER) AS im, CAST(3 AS INTEGER) AS ineg
         |FROM orders_info WHERE orderid < 60
         |ORDER BY orderid ASC""".stripMargin,
    // extractjson / parse_command_line: every output re-derived from
    // the construction rule (cities carry no JSON/cmdline metachars).
    "kql_json_cmdline" ->
      s"""${Sql.ordersInfoCte}
         |SELECT orderid, city AS c, CAST(custid AS BIGINT) AS i1,
         |  CAST(amount * 2 AS BIGINT) AS amt2,
         |  CAST(5 AS BIGINT) AS na,
         |  CAST(orderid AS VARCHAR) AS a2, city AS a3,
         |  'C:\\tmp\\f.txt' AS a4
         |FROM orders_info WHERE orderid < 90
         |ORDER BY orderid ASC""".stripMargin,
    // guid/base64: the same hex slices re-ordered (little-endian first
    // three groups), round-trip re-derived as the constructed guid.
    "kql_guid_b64" ->
      s"""${Sql.ordersInfoCte},
         |b AS (
         |  SELECT orderid, city, md5(CAST(orderid AS VARCHAR)) AS h
         |  FROM orders_info WHERE orderid < 80)
         |SELECT orderid,
         |  to_base64(from_hex(
         |    substr(h, 7, 2) || substr(h, 5, 2) || substr(h, 3, 2) || substr(h, 1, 2)
         |    || substr(h, 11, 2) || substr(h, 9, 2)
         |    || substr(h, 15, 2) || substr(h, 13, 2)
         |    || substr(h, 17, 16))) AS b,
         |  substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-' || substr(h, 13, 4)
         |    || '-' || substr(h, 17, 4) || '-' || substr(h, 21, 12) AS rt,
         |  CAST(NULL AS VARCHAR) AS bad
         |FROM b ORDER BY orderid ASC""".stripMargin,
    // scalar wave 5: the GUID re-assembled from the same md5 slices,
    // ascii-ness via the complementary class match, the decimal
    // re-rendered at the same scale.
    "kql_scalar_fns5" ->
      s"""${Sql.ordersInfoCte},
         |b AS (
         |  SELECT orderid, city, amount, md5(CAST(orderid AS VARCHAR)) AS h
         |  FROM orders_info WHERE orderid < 100)
         |SELECT orderid,
         |  substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-' || substr(h, 13, 4)
         |    || '-' || substr(h, 17, 4) || '-' || substr(h, 21, 12) AS gid,
         |  CAST(NULL AS VARCHAR) AS bad,
         |  CAST(CASE WHEN regexp_matches(city, '[^\\x00-\\x7f]') THEN 0 ELSE 1 END AS BIGINT) AS asc1,
         |  CAST(0 AS BIGINT) AS asc2,
         |  CAST(CAST(CAST(orderid AS VARCHAR) || '.' || CAST(amount AS VARCHAR)
         |    AS DECIMAL(38, 10)) AS VARCHAR) AS dec2
         |FROM b ORDER BY orderid ASC""".stripMargin,
    // codecs: the round-trip identity re-derived as the payload
    // itself; the RFC framing constants from their published values.
    "kql_codecs" ->
      s"""${Sql.ordersInfoCte}
         |SELECT orderid,
         |  city || '|' || CAST(orderid AS VARCHAR) || '|' || CAST(amount AS VARCHAR) AS rt_g,
         |  city || '|' || CAST(orderid AS VARCHAR) || '|' || CAST(amount AS VARCHAR) AS rt_z,
         |  CAST(31 * 1000 + 139 + 8 AS BIGINT) AS gmagic,
         |  CAST(120 AS BIGINT) AS zmagic
         |FROM orders_info WHERE orderid < 120
         |ORDER BY orderid ASC""".stripMargin,
    // URL codecs replayed as per-CHARACTER walks (the corpus is
    // ASCII, where the engine's per-UTF-8-byte fold coincides); the
    // decode round-trip and the CSV fields re-derived from the
    // construction rule.
    "kql_url_csv" ->
      s"""${Sql.ordersInfoCte},
         |b AS (
         |  SELECT orderid, custid, amount, city,
         |    'q=' || city || ' & id/' || CAST(orderid AS VARCHAR) || '!' AS raw
         |  FROM orders_info WHERE orderid < 150),
         |e AS (
         |  SELECT orderid, amount, city, raw,
         |    list_aggregate(list_transform(range(1, length(raw) + 1), ci ->
         |      CASE WHEN regexp_matches(substr(raw, CAST(ci AS INT), 1), '^[A-Za-z0-9._~-]$$')
         |        THEN substr(raw, CAST(ci AS INT), 1)
         |        WHEN substr(raw, CAST(ci AS INT), 1) = ' ' THEN '+'
         |        ELSE '%' || lpad(lower(to_hex(unicode(substr(raw, CAST(ci AS INT), 1)))), 2, '0')
         |      END), 'string_agg', '') AS enc,
         |    list_aggregate(list_transform(range(1, length(raw) + 1), ci ->
         |      CASE WHEN regexp_matches(substr(raw, CAST(ci AS INT), 1), '^[A-Za-z0-9._~-]$$')
         |        THEN substr(raw, CAST(ci AS INT), 1)
         |        ELSE '%' || lpad(lower(to_hex(unicode(substr(raw, CAST(ci AS INT), 1)))), 2, '0')
         |      END), 'string_agg', '') AS encc
         |  FROM b)
         |SELECT orderid, enc, encc,
         |  CAST(3 AS BIGINT) AS nf,
         |  CAST(orderid AS VARCHAR) || '/' || city || '/' || 'x,y "q"'
         |    || CAST(amount AS VARCHAR) AS joined,
         |  CAST(1 AS BIGINT) AS ok_rt
         |FROM e
         |ORDER BY orderid ASC""".stripMargin,
    // literal factor arithmetic replayed per conversion; temperature
    // affine via Kelvin with the engine's ×5-then-÷9 double chain.
    "kql_convert_units" ->
      s"""${Sql.ordersInfoCte},
         |b AS (SELECT orderid, CAST(amount AS DOUBLE) AS v
         |      FROM orders_info WHERE orderid < 100)
         |SELECT orderid,
         |  CAST(floor((v * 1609.344 / 1000.0) * 1000000.0) AS BIGINT) AS km_u,
         |  CAST(floor((v * 0.45359237 / 1.0) * 1000000.0) AS BIGINT) AS kg_u,
         |  CAST(floor((v * 0.2777777777777778 / 1.0) * 1000000.0) AS BIGINT) AS mps_u,
         |  CAST(floor((v * 0.017453292519943295 / 1.0) * 1000000.0) AS BIGINT) AS rad_u,
         |  CAST(floor((v * 4184.0 / 1000.0) * 1000000.0) AS BIGINT) AS kj_u,
         |  CAST(floor((v * 0.003785411784 / 0.001) * 1000000.0) AS BIGINT) AS l_u,
         |  CAST(floor((v * 4.4482216152605 / 1.0) * 1000000.0) AS BIGINT) AS n_u,
         |  CAST(floor((((v + 459.67) * 5.0 / 9.0) - 273.15) * 1000000.0) AS BIGINT) AS c_u
         |FROM b ORDER BY orderid ASC""".stripMargin,
    // lengths/centroids re-derived with frame-ordered running sums
    // (mean-lat kx over ALL vertices, the engine's fold order);
    // intersection via an INDEPENDENT edge cross-join with the same
    // orientation + on-segment arithmetic.
    "kql_geo_lines2" ->
      """WITH v1 AS (
        |  SELECT * FROM (VALUES
        |    ('crossx', 0, 0.0, 0.0), ('crossx', 1, 2.0, 2.0),
        |    ('touch', 0, 0.0, 0.0), ('touch', 1, 1.0, 1.0),
        |    ('apart', 0, 0.0, 0.0), ('apart', 1, 1.0, 0.0),
        |    ('multi', 0, 0.0, 5.0), ('multi', 1, 1.0, 5.0),
        |    ('multi', 2, 3.0, 0.0), ('multi', 3, 3.0, 4.0))
        |    AS t(name, i, lon, lat)),
        |v2 AS (
        |  SELECT * FROM (VALUES
        |    ('crossx', 0, 0.0, 2.0), ('crossx', 1, 2.0, 0.0),
        |    ('touch', 0, 1.0, 1.0), ('touch', 1, 2.0, 0.0),
        |    ('apart', 0, 0.0, 1.0), ('apart', 1, 1.0, 1.0),
        |    ('multi', 0, 0.0, 6.0), ('multi', 1, 1.0, 6.0),
        |    ('multi', 2, 2.0, 2.0), ('multi', 3, 4.0, 2.0))
        |    AS t(name, i, lon, lat)),
        |c AS (SELECT name, SUM(lat) / CAST(COUNT(*) AS DOUBLE) AS latc FROM v1 GROUP BY 1),
        |k AS (SELECT name, 111320.0 * cos(radians(latc)) AS kx FROM c),
        |e AS (
        |  SELECT a.name, a.i,
        |    sqrt(((b.lon - a.lon) * kx) * ((b.lon - a.lon) * kx)
        |       + ((b.lat - a.lat) * 110574.0) * ((b.lat - a.lat) * 110574.0)) AS elen,
        |    (a.lon + b.lon) / 2.0 AS midx, (a.lat + b.lat) / 2.0 AS midy
        |  FROM v1 a JOIN v1 b ON b.name = a.name AND b.i = a.i + 1
        |  JOIN k ON k.name = a.name),
        |s AS (
        |  SELECT name, i,
        |    SUM(elen) OVER (PARTITION BY name ORDER BY i ROWS UNBOUNDED PRECEDING) AS lrun,
        |    SUM(midx * elen) OVER (PARTITION BY name ORDER BY i ROWS UNBOUNDED PRECEDING) AS xrun,
        |    SUM(midy * elen) OVER (PARTITION BY name ORDER BY i ROWS UNBOUNDED PRECEDING) AS yrun
        |  FROM e),
        |f AS (
        |  SELECT name, lrun, xrun, yrun FROM (
        |    SELECT *, row_number() OVER (PARTITION BY name ORDER BY i DESC) AS rn
        |    FROM s) WHERE rn = 1),
        |e1 AS (
        |  SELECT a.name, a.lon AS ax, a.lat AS ay, b.lon AS bx, b.lat AS by0
        |  FROM v1 a JOIN v1 b ON b.name = a.name AND b.i = a.i + 1),
        |e2 AS (
        |  SELECT a.name, a.lon AS cx0, a.lat AS cy0, b.lon AS dx0, b.lat AS dy0
        |  FROM v2 a JOIN v2 b ON b.name = a.name AND b.i = a.i + 1),
        |pairs AS (
        |  SELECT e1.name, ax, ay, bx, by0, cx0, cy0, dx0, dy0,
        |    (bx - ax) * (cy0 - ay) - (by0 - ay) * (cx0 - ax) AS o1,
        |    (bx - ax) * (dy0 - ay) - (by0 - ay) * (dx0 - ax) AS o2,
        |    (dx0 - cx0) * (ay - cy0) - (dy0 - cy0) * (ax - cx0) AS o3,
        |    (dx0 - cx0) * (by0 - cy0) - (dy0 - cy0) * (bx - cx0) AS o4
        |  FROM e1 JOIN e2 ON e2.name = e1.name),
        |hits AS (
        |  SELECT name, MAX(CASE WHEN
        |    (((o1 > 0 AND o2 < 0) OR (o1 < 0 AND o2 > 0)) AND
        |     ((o3 > 0 AND o4 < 0) OR (o3 < 0 AND o4 > 0)))
        |    OR (o1 = 0 AND cx0 >= least(ax, bx) AND cx0 <= greatest(ax, bx)
        |        AND cy0 >= least(ay, by0) AND cy0 <= greatest(ay, by0))
        |    OR (o2 = 0 AND dx0 >= least(ax, bx) AND dx0 <= greatest(ax, bx)
        |        AND dy0 >= least(ay, by0) AND dy0 <= greatest(ay, by0))
        |    OR (o3 = 0 AND ax >= least(cx0, dx0) AND ax <= greatest(cx0, dx0)
        |        AND ay >= least(cy0, dy0) AND ay <= greatest(cy0, dy0))
        |    OR (o4 = 0 AND bx >= least(cx0, dx0) AND bx <= greatest(cx0, dx0)
        |        AND by0 >= least(cy0, dy0) AND by0 <= greatest(cy0, dy0))
        |    THEN 1 ELSE 0 END) AS hit0
        |  FROM pairs GROUP BY name)
        |SELECT f.name, CAST(floor(f.lrun * 1000.0) AS BIGINT) AS len_u,
        |  CAST(floor((f.xrun / f.lrun) * 1000000.0) AS BIGINT) AS cx_u,
        |  CAST(floor((f.yrun / f.lrun) * 1000000.0) AS BIGINT) AS cy_u,
        |  CAST(hits.hit0 AS BIGINT) AS hit
        |FROM f JOIN hits ON hits.name = f.name
        |ORDER BY f.name ASC""".stripMargin,
    // perimeter: mean-lat kx + per-edge hypot, frame-ordered running
    // sum (the engine's left fold); centroid: the degree-space
    // shoelace folds for 2A, Σ(x_i+x_{i+1})·cross, Σ(y_i+y_{i+1})·cross
    // — every product and the final divisions mirrored op-for-op.
    "kql_geo_measures" ->
      """WITH v AS (
        |  SELECT * FROM (VALUES
        |    ('concave', 0, -5.0, 45.0), ('concave', 1, 5.0, 43.0),
        |    ('concave', 2, 12.0, 50.0), ('concave', 3, 0.0, 47.5),
        |    ('concave', 4, -8.0, 52.0), ('concave', 5, -5.0, 45.0),
        |    ('triangle', 0, 10.0, 50.0), ('triangle', 1, 11.0, 50.0),
        |    ('triangle', 2, 10.0, 51.0), ('triangle', 3, 10.0, 50.0),
        |    ('square', 0, 10.0, 0.0), ('square', 1, 11.0, 0.0),
        |    ('square', 2, 11.0, 1.0), ('square', 3, 10.0, 1.0),
        |    ('square', 4, 10.0, 0.0),
        |    ('collinear', 0, 0.0, 0.0), ('collinear', 1, 1.0, 1.0),
        |    ('collinear', 2, 2.0, 2.0), ('collinear', 3, 0.0, 0.0))
        |    AS t(name, i, lon, lat)),
        |c AS (SELECT name, SUM(lat) / CAST(COUNT(*) AS DOUBLE) AS latc FROM v GROUP BY 1),
        |k AS (SELECT name, 111320.0 * cos(radians(latc)) AS kx FROM c),
        |e AS (
        |  SELECT a.name, a.i,
        |    sqrt(((b.lon - a.lon) * kx) * ((b.lon - a.lon) * kx)
        |       + ((b.lat - a.lat) * 110574.0) * ((b.lat - a.lat) * 110574.0)) AS plen,
        |    (a.lon * b.lat - b.lon * a.lat) AS cross0,
        |    (a.lon + b.lon) * (a.lon * b.lat - b.lon * a.lat) AS sxw,
        |    (a.lat + b.lat) * (a.lon * b.lat - b.lon * a.lat) AS syw
        |  FROM v a JOIN v b ON b.name = a.name AND b.i = a.i + 1
        |  JOIN k ON k.name = a.name),
        |s AS (
        |  SELECT name, i,
        |    SUM(plen) OVER (PARTITION BY name ORDER BY i ROWS UNBOUNDED PRECEDING) AS prun,
        |    SUM(cross0) OVER (PARTITION BY name ORDER BY i ROWS UNBOUNDED PRECEDING) AS a2run,
        |    SUM(sxw) OVER (PARTITION BY name ORDER BY i ROWS UNBOUNDED PRECEDING) AS sxrun,
        |    SUM(syw) OVER (PARTITION BY name ORDER BY i ROWS UNBOUNDED PRECEDING) AS syrun
        |  FROM e),
        |f AS (
        |  SELECT name, prun, a2run, sxrun, syrun FROM (
        |    SELECT *, row_number() OVER (PARTITION BY name ORDER BY i DESC) AS rn
        |    FROM s) WHERE rn = 1)
        |SELECT name, CAST(floor(prun) AS BIGINT) AS per_m,
        |  CASE WHEN a2run <> 0.0
        |    THEN CAST(floor((sxrun / (3.0 * a2run)) * 1000000.0) AS BIGINT) END AS cx_u,
        |  CASE WHEN a2run <> 0.0
        |    THEN CAST(floor((syrun / (3.0 * a2run)) * 1000000.0) AS BIGINT) END AS cy_u,
        |  CAST(CASE WHEN a2run <> 0.0 THEN 1 ELSE 0 END AS BIGINT) AS has_c
        |FROM f
        |UNION ALL SELECT 'degenerate', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |  CAST(NULL AS BIGINT), CAST(0 AS BIGINT)
        |ORDER BY name ASC""".stripMargin,
    // mirrors geoPointInPolygonSql: the ring as an explicit edge list,
    // the crossing test's single division op-for-op; per-point identity
    // keeps duplicate (lon, lat) derivations distinct before the city
    // rollup.
    "kql_geo_polygon" ->
      s"""${Sql.ordersInfoCte},
         |pts AS (
         |  SELECT orderid, city, CAST(orderid % 4000 AS DOUBLE) / 100.0 - 20.0 AS lon,
         |    40.0 + CAST(custid % 1000 AS DOUBLE) / 50.0 AS lat
         |  FROM orders_info),
         |edges AS (
         |  SELECT * FROM (VALUES
         |    (-5.0, 45.0, 5.0, 43.0), (5.0, 43.0, 12.0, 50.0),
         |    (12.0, 50.0, 0.0, 47.5), (0.0, 47.5, -8.0, 52.0),
         |    (-8.0, 52.0, -5.0, 45.0)) AS e(x1, y1, x2, y2)),
         |cr AS (
         |  SELECT p.orderid, p.city,
         |    COUNT(*) FILTER (WHERE ((y1 > lat) <> (y2 > lat))
         |      AND lon < x1 + (x2 - x1) * (lat - y1) / (y2 - y1)) % 2 = 1 AS inside
         |  FROM pts p CROSS JOIN edges GROUP BY 1, 2)
         |SELECT city, CAST(COUNT(*) FILTER (WHERE inside) AS BIGINT) AS n_inside,
         |  CAST(COUNT(*) AS BIGINT) AS n
         |FROM cr GROUP BY city ORDER BY city ASC""".stripMargin,
    // the INDEPENDENT even-odd formulation over ALL points — no cell
    // arithmetic at all, so an incomplete polygon cell cover (a missed
    // interior cell dropping join hits) fails this compare.
    "kql_geo_polygon_join" ->
      s"""${Sql.ordersInfoCte},
         |pts AS (
         |  SELECT orderid, city, CAST(orderid % 4000 AS DOUBLE) / 100.0 - 20.0 AS lon,
         |    40.0 + CAST(custid % 1000 AS DOUBLE) / 50.0 AS lat
         |  FROM orders_info),
         |edges AS (
         |  SELECT * FROM (VALUES
         |    (-5.0, 45.0, 5.0, 43.0), (5.0, 43.0, 12.0, 50.0),
         |    (12.0, 50.0, 0.0, 47.5), (0.0, 47.5, -8.0, 52.0),
         |    (-8.0, 52.0, -5.0, 45.0)) AS e(x1, y1, x2, y2)),
         |cr AS (
         |  SELECT p.orderid, p.city, p.lon, p.lat,
         |    COUNT(*) FILTER (WHERE ((y1 > lat) <> (y2 > lat))
         |      AND lon < x1 + (x2 - x1) * (lat - y1) / (y2 - y1)) % 2 = 1 AS inside
         |  FROM pts p CROSS JOIN edges GROUP BY 1, 2, 3, 4)
         |SELECT city, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(floor(MIN(lon) * 1000000.0) AS BIGINT) AS lon_min_u,
         |  CAST(floor(MAX(lat) * 1000000.0) AS BIGINT) AS lat_max_u
         |FROM cr WHERE inside GROUP BY city ORDER BY city ASC""".stripMargin,
    // hand-derived RFC expected table (spec-vector oracle, stated
    // independently of the engine's parser)
    "kql_ipv6" ->
      """SELECT name, canon, m48, CAST(cmp AS BIGINT) AS cmp, m32 FROM (VALUES
        |  ('h1', '2001:0db8:0000:0000:0000:0000:0000:0001', '2001:0db8:0000:0000:0000:0000:0000:0000', 0, true),
        |  ('h2', '0000:0000:0000:0000:0000:0000:0000:0001', '0000:0000:0000:0000:0000:0000:0000:0000', -1, false),
        |  ('h3', '0000:0000:0000:0000:0000:0000:0000:0000', '0000:0000:0000:0000:0000:0000:0000:0000', -1, false),
        |  ('h4', 'fe80:0000:0000:0000:0204:61ff:fe9d:f156', 'fe80:0000:0000:0000:0000:0000:0000:0000', 1, false),
        |  ('h5', '0000:0000:0000:0000:0000:ffff:c0a8:0101', '0000:0000:0000:0000:0000:0000:0000:0000', -1, false),
        |  ('h6', '0000:0000:0000:0000:0000:ffff:c0a8:0132', '0000:0000:0000:0000:0000:0000:0000:0000', -1, false),
        |  ('h7', '2001:0db8:0000:0000:0001:0000:0000:0001', '2001:0db8:0000:0000:0000:0000:0000:0000', 1, true),
        |  ('h8', NULL, NULL, NULL, NULL),
        |  ('h9', NULL, NULL, NULL, NULL),
        |  ('h10', NULL, NULL, NULL, NULL)) AS t(name, canon, m48, cmp, m32)
        |ORDER BY name ASC""".stripMargin,
    // first-wins-in-json-order replayed per key: DuckDB builds the
    // identical serialization, so min_by(value, js) IS the fold's
    // first donor for each key; the bag's key count is 'c' plus the
    // distinct k-classes present.
    "kql_make_bag" ->
      s"""${Sql.ordersInfoCte},
         |r AS (
         |  SELECT custid, orderid, amount, city,
         |    '{"c":"' || city || '","'
         |      || (CASE WHEN orderid % 2 = 0 THEN 'even' ELSE 'odd' END) || '":'
         |      || CAST(amount AS VARCHAR) || '}' AS js
         |  FROM orders_info)
         |SELECT custid,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  MIN_BY(city, js) AS c,
         |  CAST(MIN_BY(amount, js) FILTER (WHERE orderid % 2 = 0) AS BIGINT) AS ev,
         |  CAST(MIN_BY(amount, js) FILTER (WHERE orderid % 2 = 1) AS BIGINT) AS od,
         |  CAST(1 + COUNT(DISTINCT orderid % 2) AS BIGINT) AS nk,
         |  MIN_BY(city, js) FILTER (WHERE orderid % 3 = 0) AS ic,
         |  CAST(MIN_BY(amount, js) FILTER (WHERE orderid % 3 = 0 AND orderid % 2 = 0) AS BIGINT) AS iev,
         |  CAST(MIN_BY(amount, js) FILTER (WHERE orderid % 3 = 0 AND orderid % 2 = 1) AS BIGINT) AS iod
         |FROM r GROUP BY custid""".stripMargin,
    // the INDEPENDENT all-points point-to-segment distance formulation,
    // mirrored op-for-op against geoDistancePointToLineSql (products
    // spelled identically, same clamp, same fold order for the mean
    // latitude) — no cell arithmetic, so a line-cover miss fails here.
    "kql_geo_line_join" ->
      s"""${Sql.ordersInfoCte},
         |pts AS (
         |  SELECT orderid, city, CAST(orderid % 6000 AS DOUBLE) / 100.0 - 30.0 AS lon,
         |    5.0 + CAST(custid % 1400 AS DOUBLE) / 50.0 AS lat
         |  FROM orders_info),
         |segs AS (
         |  SELECT * FROM (VALUES
         |    (-15.0, 10.0, -5.0, 14.0), (-5.0, 14.0, 5.0, 12.0),
         |    (5.0, 12.0, 15.0, 20.0), (15.0, 20.0, 25.0, 26.0)) AS s(x1, y1, x2, y2)),
         |k AS (SELECT 111320.0 * cos(radians(
         |  (CAST(0 AS DOUBLE) + 10.0 + 14.0 + 12.0 + 20.0 + 26.0) / CAST(5 AS DOUBLE))) AS kx),
         |segm AS (
         |  SELECT x1 * kx AS ax, y1 * 110574.0 AS ay,
         |    (x2 - x1) * kx AS dx, (y2 - y1) * 110574.0 AS dy
         |  FROM segs CROSS JOIN k),
         |pd AS (
         |  SELECT p.orderid, p.city, p.lon * kx AS qx, p.lat * 110574.0 AS qy,
         |    s.ax, s.ay, s.dx, s.dy
         |  FROM pts p CROSS JOIN segm s CROSS JOIN k),
         |pt AS (
         |  SELECT *, CASE WHEN dx * dx + dy * dy = CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE)
         |    ELSE least(CAST(1 AS DOUBLE), greatest(CAST(0 AS DOUBLE),
         |      ((qx - ax) * dx + (qy - ay) * dy) / (dx * dx + dy * dy))) END AS t
         |  FROM pd),
         |d AS (
         |  SELECT orderid, city,
         |    MIN(sqrt((qx - ax - t * dx) * (qx - ax - t * dx)
         |      + (qy - ay - t * dy) * (qy - ay - t * dy))) AS dist
         |  FROM pt GROUP BY 1, 2)
         |SELECT city, CAST(COUNT(*) AS BIGINT) AS n,
         |  MIN(CAST(floor(dist) AS BIGINT)) AS d_min_m,
         |  MAX(CAST(floor(dist) AS BIGINT)) AS d_max_m
         |FROM d WHERE dist <= 25000.0 GROUP BY city ORDER BY city ASC""".stripMargin,
    // mirrors parseUserAgentSql's ordered cascade; nullif pins the
    // no-match/non-participating-group rendering on both engines.
    "kql_parse_ua" ->
      """WITH u AS (
        |  SELECT * FROM (VALUES
        |    ('Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/124.0.0.0 Safari/537.36 Edg/124.0.2478.51'),
        |    ('Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/123.0.0.0 Safari/537.36'),
        |    ('Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.4 Safari/605.1.15'),
        |    ('Mozilla/5.0 (X11; Linux x86_64; rv:125.0) Gecko/20100101 Firefox/125.0'),
        |    ('Mozilla/5.0 (iPhone; CPU iPhone OS 17_4 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.4 Mobile/15E148 Safari/604.1'),
        |    ('Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/124.0.6367.82 Mobile Safari/537.36'),
        |    ('Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 OPR/106.0.0.0'),
        |    ('curl/8.5.0')) AS t(ua))
        |SELECT substr(ua, 1, 30) AS ua_tag,
        |  CASE WHEN regexp_matches(ua, 'Edg(e|A|iOS)?/') THEN 'Edge'
        |       WHEN regexp_matches(ua, 'OPR/') THEN 'Opera'
        |       WHEN regexp_matches(ua, 'Firefox/') THEN 'Firefox'
        |       WHEN regexp_matches(ua, 'Chrome/') THEN 'Chrome'
        |       WHEN regexp_matches(ua, 'Safari/') THEN 'Safari'
        |       ELSE 'Other' END AS b_family,
        |  CASE WHEN regexp_matches(ua, 'Edg(e|A|iOS)?/') THEN nullif(regexp_extract(ua, 'Edg(?:e|A|iOS)?/([0-9]+)\.([0-9]+)', 1), '')
        |       WHEN regexp_matches(ua, 'OPR/') THEN nullif(regexp_extract(ua, 'OPR/([0-9]+)\.([0-9]+)', 1), '')
        |       WHEN regexp_matches(ua, 'Firefox/') THEN nullif(regexp_extract(ua, 'Firefox/([0-9]+)\.([0-9]+)', 1), '')
        |       WHEN regexp_matches(ua, 'Chrome/') THEN nullif(regexp_extract(ua, 'Chrome/([0-9]+)\.([0-9]+)', 1), '')
        |       WHEN regexp_matches(ua, 'Safari/') THEN nullif(regexp_extract(ua, 'Version/([0-9]+)\.([0-9]+)[^;]*Safari', 1), '')
        |       END AS b_major,
        |  CASE WHEN regexp_matches(ua, 'Edg(e|A|iOS)?/') THEN nullif(regexp_extract(ua, 'Edg(?:e|A|iOS)?/([0-9]+)\.([0-9]+)', 2), '')
        |       WHEN regexp_matches(ua, 'OPR/') THEN nullif(regexp_extract(ua, 'OPR/([0-9]+)\.([0-9]+)', 2), '')
        |       WHEN regexp_matches(ua, 'Firefox/') THEN nullif(regexp_extract(ua, 'Firefox/([0-9]+)\.([0-9]+)', 2), '')
        |       WHEN regexp_matches(ua, 'Chrome/') THEN nullif(regexp_extract(ua, 'Chrome/([0-9]+)\.([0-9]+)', 2), '')
        |       WHEN regexp_matches(ua, 'Safari/') THEN nullif(regexp_extract(ua, 'Version/([0-9]+)\.([0-9]+)[^;]*Safari', 2), '')
        |       END AS b_minor,
        |  CASE WHEN regexp_matches(ua, 'Windows NT ') THEN 'Windows'
        |       WHEN regexp_matches(ua, '(iPhone|CPU) OS ') THEN 'iOS'
        |       WHEN regexp_matches(ua, 'Android ') THEN 'Android'
        |       WHEN regexp_matches(ua, 'Mac OS X ') THEN 'macOS'
        |       WHEN regexp_matches(ua, 'Linux') THEN 'Linux'
        |       ELSE 'Other' END AS os_family,
        |  CASE WHEN regexp_matches(ua, 'Windows NT ') THEN nullif(regexp_extract(ua, 'Windows NT ([0-9]+)\.([0-9]+)', 1), '')
        |       WHEN regexp_matches(ua, '(iPhone|CPU) OS ') THEN nullif(regexp_extract(ua, '(?:iPhone|CPU) OS ([0-9]+)_([0-9]+)', 1), '')
        |       WHEN regexp_matches(ua, 'Android ') THEN nullif(regexp_extract(ua, 'Android ([0-9]+)(?:\.([0-9]+))?', 1), '')
        |       WHEN regexp_matches(ua, 'Mac OS X ') THEN nullif(regexp_extract(ua, 'Mac OS X ([0-9]+)[._]([0-9]+)', 1), '')
        |       END AS os_major
        |FROM u ORDER BY ua_tag ASC""".stripMargin,
    // INDEPENDENT formulation: cross join + exact distance filter — no
    // geohash arithmetic. If the Spark side's neighbor-cell candidate
    // join missed any within-R pair, the counts would differ. The
    // haversine chain mirrors geoDistanceSql op-for-op; distances
    // floor to whole meters.
    "kql_geo_join" ->
      s"""${Sql.ordersInfoCte},
         |pts AS (
         |  SELECT orderid, CAST(orderid % 4000 AS DOUBLE) / 100.0 - 20.0 AS lon,
         |    40.0 + CAST(custid % 1000 AS DOUBLE) / 50.0 AS lat
         |  FROM orders_info),
         |sites AS (
         |  SELECT * FROM (VALUES
         |    ('ams', 4.9, 52.37), ('ber', 13.4, 52.52), ('lhr', -0.13, 51.51),
         |    ('cdg', 2.35, 48.86), ('muc', 11.58, 48.14), ('edi', -3.19, 55.95))
         |    AS s(site, slon, slat)),
         |d AS (
         |  SELECT site,
         |    2.0 * 6371000.0 * asin(sqrt(least(1.0,
         |      sin((radians(slat) - radians(lat)) / 2) * sin((radians(slat) - radians(lat)) / 2)
         |      + cos(radians(lat)) * cos(radians(slat))
         |        * sin((radians(slon) - radians(lon)) / 2) * sin((radians(slon) - radians(lon)) / 2)))) AS dist
         |  FROM pts CROSS JOIN sites)
         |SELECT site, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(floor(MIN(dist)) AS BIGINT) AS d_min_m,
         |  CAST(floor(MAX(dist)) AS BIGINT) AS d_max_m
         |FROM d WHERE dist <= 75000.0
         |GROUP BY site ORDER BY site ASC""".stripMargin,
    "kql_string_fns2" ->
      """WITH d AS (
        |  SELECT lang, text,
        |    strlen(text) AS b,
        |    length(text) - length(replace(text, 'e', '')) AS nl,
        |    len(regexp_extract_all(text, '[aeiou]+')) AS nr,
        |    CASE WHEN regexp_matches(text, '[0-9]')
        |         THEN length(regexp_extract(text, '^([^0-9]*)', 1)) ELSE -1 END AS ir,
        |    CASE WHEN lang = 'en' THEN 'EN' ELSE lang END AS rs,
        |    length(regexp_replace(text, '[aeiou]', '', 'g')) AS rr
        |  FROM documents)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs,
        |  CAST(SUM(b) AS BIGINT) AS tb, CAST(SUM(nl) AS BIGINT) AS tnl,
        |  CAST(SUM(nr) AS BIGINT) AS tnr,
        |  CAST(SUM(CASE WHEN ir = -1 THEN 1 ELSE 0 END) AS BIGINT) AS neg,
        |  CAST(SUM(ir) AS BIGINT) AS sir,
        |  CAST(SUM(CASE WHEN rs = 'EN' THEN 1 ELSE 0 END) AS BIGINT) AS rsn,
        |  CAST(SUM(rr) AS BIGINT) AS trr
        |FROM d GROUP BY lang""".stripMargin,
    "kql_pack_all" ->
      s"""${Sql.ordersInfoCte}
         |SELECT 'city,orderid' AS ks, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(COUNT(*) AS BIGINT) AS ok_c, CAST(COUNT(*) AS BIGINT) AS ok_o
         |FROM orders_info""".stripMargin,
    // independent DuckDB derivation of every scalar (no hard-coded
    // answers except the format strings, which Spark derives from
    // the same integer seconds the ts columns expose).
    "kql_datetime_scalars" ->
      """SELECT
        |  CAST(year(TIMESTAMP '2024-03-15 10:20:30') AS BIGINT) AS part_y,
        |  CAST(quarter(TIMESTAMP '2024-03-15 10:20:30') AS BIGINT) AS part_q,
        |  CAST(weekofyear(TIMESTAMP '2024-03-15 10:20:30') AS BIGINT) AS part_w,
        |  CAST(epoch(TIMESTAMP '2024-03-15 10:20:30') AS BIGINT) AS md_epoch,
        |  CAST(1700000000 AS BIGINT) AS us_epoch,
        |  CAST(1700000000 AS BIGINT) AS ums_epoch,
        |  CAST(1700000000 AS BIGINT) AS uus_epoch,
        |  CAST(1 * 86400 + 2 * 3600 + 3 * 60 + 4 AS BIGINT) AS ts1,
        |  CAST(90 * 60 AS BIGINT) AS ts2,
        |  CAST(((1 * 24 + 2) * 60 + 3) * 60 + 4 AS BIGINT) AS mts,
        |  '1.02:03:04' AS f1,
        |  '01:01:01' AS f2,
        |  CAST(12 & 10 AS BIGINT) AS ba,
        |  CAST(12 | 10 AS BIGINT) AS bo,
        |  CAST(xor(12, 10) AS BIGINT) AS bx,
        |  CAST(~0 AS BIGINT) AS bn,
        |  CAST(3 << 4 AS BIGINT) AS bsl,
        |  CAST(48 >> 4 AS BIGINT) AS bsr""".stripMargin,
    // full face→uv→st→quantize→Morton re-derivation in CTE columns:
    // each step is one column so no expression repeats; the same
    // single-rounded chain as graft.functions.S2, op for op.
    "kql_geo_s2" ->
      """WITH p AS (
        |  SELECT * FROM (VALUES
        |    ('gw', 0.0, 0.0), ('paris', 2.35, 48.86), ('e90', 90.0, 10.0),
        |    ('npole', 20.0, 80.0), ('w179', 179.5, -5.0), ('wneg', -90.0, -10.0),
        |    ('spole', 100.0, -80.0), ('syd', 151.21, -33.87), ('bad', 200.0, 10.0))
        |    AS t(name, lon0, lat0)),
        |pc AS (
        |  SELECT name, CAST(lon0 AS DOUBLE) AS lon, CAST(lat0 AS DOUBLE) AS lat,
        |    abs(lon0) <= 180.0 AND abs(lat0) <= 90.0 AS ok FROM p),
        |xyz AS (
        |  SELECT *, cos(radians(lat)) * cos(radians(lon)) AS x,
        |    cos(radians(lat)) * sin(radians(lon)) AS y, sin(radians(lat)) AS z
        |  FROM pc),
        |fuv AS (
        |  SELECT *, CASE
        |      WHEN abs(x) >= abs(y) AND abs(x) >= abs(z) THEN CASE WHEN x >= 0 THEN 0 ELSE 3 END
        |      WHEN abs(y) >= abs(z) THEN CASE WHEN y >= 0 THEN 1 ELSE 4 END
        |      ELSE CASE WHEN z >= 0 THEN 2 ELSE 5 END END AS face,
        |    CASE
        |      WHEN abs(x) >= abs(y) AND abs(x) >= abs(z) THEN CASE WHEN x >= 0 THEN y / x ELSE z / x END
        |      WHEN abs(y) >= abs(z) THEN CASE WHEN y >= 0 THEN -x / y ELSE z / y END
        |      ELSE CASE WHEN z >= 0 THEN -x / z ELSE -y / z END END AS u,
        |    CASE
        |      WHEN abs(x) >= abs(y) AND abs(x) >= abs(z) THEN CASE WHEN x >= 0 THEN z / x ELSE y / x END
        |      WHEN abs(y) >= abs(z) THEN CASE WHEN y >= 0 THEN z / y ELSE -x / y END
        |      ELSE CASE WHEN z >= 0 THEN -y / z ELSE -x / z END END AS v
        |  FROM xyz),
        |st AS (
        |  SELECT *,
        |    CASE WHEN u >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * u) ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * u) END AS s,
        |    CASE WHEN v >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * v) ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * v) END AS t
        |  FROM fuv),
        |ij AS (
        |  SELECT *,
        |    least(127, greatest(0, CAST(floor(s * 128) AS BIGINT))) AS i7,
        |    least(127, greatest(0, CAST(floor(t * 128) AS BIGINT))) AS j7,
        |    least(2047, greatest(0, CAST(floor(s * 2048) AS BIGINT))) AS i11,
        |    least(2047, greatest(0, CAST(floor(t * 2048) AS BIGINT))) AS j11
        |  FROM st),
        |ps AS (
        |  SELECT *,
        |    list_sum(list_transform(range(0, 7), k ->
        |      ((i7 >> CAST(k AS INT)) & 1) * (CAST(1 AS BIGINT) << CAST(2 * k + 1 AS INT))
        |      + ((j7 >> CAST(k AS INT)) & 1) * (CAST(1 AS BIGINT) << CAST(2 * k AS INT)))) AS pos7,
        |    list_sum(list_transform(range(0, 11), k ->
        |      ((i11 >> CAST(k AS INT)) & 1) * (CAST(1 AS BIGINT) << CAST(2 * k + 1 AS INT))
        |      + ((j11 >> CAST(k AS INT)) & 1) * (CAST(1 AS BIGINT) << CAST(2 * k AS INT)))) AS pos11
        |  FROM ij),
        |ctr AS (
        |  SELECT *, (i7 + 0.5) / 128.0 AS sc, (j7 + 0.5) / 128.0 AS tc FROM ps),
        |cuv AS (
        |  SELECT *,
        |    CASE WHEN sc >= 0.5 THEN (4.0 * sc * sc - 1.0) / 3.0 ELSE (1.0 - 4.0 * (1.0 - sc) * (1.0 - sc)) / 3.0 END AS cu,
        |    CASE WHEN tc >= 0.5 THEN (4.0 * tc * tc - 1.0) / 3.0 ELSE (1.0 - 4.0 * (1.0 - tc) * (1.0 - tc)) / 3.0 END AS cv
        |  FROM ctr),
        |cxyz AS (
        |  SELECT *,
        |    CASE face WHEN 0 THEN 1.0 WHEN 1 THEN -cu WHEN 2 THEN -cu WHEN 3 THEN -1.0 WHEN 4 THEN cv ELSE cv END AS cx,
        |    CASE face WHEN 0 THEN cu WHEN 1 THEN 1.0 WHEN 2 THEN -cv WHEN 3 THEN -cv WHEN 4 THEN -1.0 ELSE cu END AS cy,
        |    CASE face WHEN 0 THEN cv WHEN 1 THEN cv WHEN 2 THEN 1.0 WHEN 3 THEN -cu WHEN 4 THEN -cu ELSE -1.0 END AS cz
        |  FROM cuv)
        |SELECT name,
        |  CASE WHEN ok THEN lower(to_hex((CAST(1 AS BIGINT) << 17) + face * (CAST(1 AS BIGINT) << 14) + pos7)) END AS c7,
        |  CASE WHEN ok THEN lower(to_hex((CAST(1 AS BIGINT) << 25) + face * (CAST(1 AS BIGINT) << 22) + pos11)) END AS c11,
        |  CASE WHEN ok THEN CAST(floor(degrees(atan2(cy, cx)) * 1000000.0) AS BIGINT) END AS clon,
        |  CASE WHEN ok THEN CAST(floor(degrees(atan2(cz, sqrt(cx * cx + cy * cy))) * 1000000.0) AS BIGINT) END AS clat,
        |  CASE WHEN ok THEN CAST(
        |    (CASE WHEN i7 > 0 THEN 1 ELSE 0 END + CASE WHEN i7 < 127 THEN 1 ELSE 0 END + 1)
        |    * (CASE WHEN j7 > 0 THEN 1 ELSE 0 END + CASE WHEN j7 < 127 THEN 1 ELSE 0 END + 1)
        |    - 1 AS BIGINT) END AS nnb
        |FROM cxyz""".stripMargin,
    // full icosahedral re-derivation in CTE columns: vertices from
    // phi, face frames (center + in-plane orthonormal basis),
    // nearest-face argmax, gnomonic projection, axial hex quantize,
    // cube rounding, bit-packing — each step one column, the same
    // single-rounded chain as graft.functions.H3, op for op. The
    // neighbor count re-runs the WHOLE encode chain on each of the 6
    // virtual neighbor centers (cross-face wrap re-derived, not
    // trusted) and counts distinct non-self cells.
    // full re-derivation of the children construction: res-4 encode,
    // the (2m+1)^2 sample grid over the parent hex disk, res-5 encode
    // of every sample (nearest-face argmax + hex round), dedupe, and
    // the per-candidate res-4 parent re-encode check — the same float
    // contract as the kql_geo_h3 oracle below.
    "kql_geo_h3_children" ->
      """WITH k AS (SELECT (1.0 + sqrt(5.0)) / 2.0 AS phi),
        |k2 AS (SELECT phi, sqrt(1.0 + phi * phi) AS vn FROM k),
        |verts AS (
        |  SELECT vid,
        |    (CASE WHEN xc = 2 THEN phi WHEN xc = -2 THEN -phi ELSE CAST(xc AS DOUBLE) END) / vn AS vx,
        |    (CASE WHEN yc = 2 THEN phi WHEN yc = -2 THEN -phi ELSE CAST(yc AS DOUBLE) END) / vn AS vy,
        |    (CASE WHEN zc = 2 THEN phi WHEN zc = -2 THEN -phi ELSE CAST(zc AS DOUBLE) END) / vn AS vz
        |  FROM (VALUES (0,0,1,2),(1,0,1,-2),(2,0,-1,2),(3,0,-1,-2),
        |               (4,1,2,0),(5,1,-2,0),(6,-1,2,0),(7,-1,-2,0),
        |               (8,2,0,1),(9,2,0,-1),(10,-2,0,1),(11,-2,0,-1))
        |    vt(vid, xc, yc, zc) CROSS JOIN k2),
        |fv AS (
        |  SELECT fi.f, a.vx AS ax, a.vy AS ay, a.vz AS az,
        |    b.vx AS bx, b.vy AS by, b.vz AS bz,
        |    c.vx AS cx0, c.vy AS cy0, c.vz AS cz0
        |  FROM (VALUES (0,0,2,8),(1,0,2,10),(2,0,4,6),(3,0,4,8),(4,0,6,10),
        |               (5,1,3,9),(6,1,3,11),(7,1,4,6),(8,1,4,9),(9,1,6,11),
        |               (10,2,5,7),(11,2,5,8),(12,2,7,10),(13,3,5,7),(14,3,5,9),
        |               (15,3,7,11),(16,4,8,9),(17,5,8,9),(18,6,10,11),(19,7,10,11))
        |    fi(f, va, vb, vc)
        |  JOIN verts a ON a.vid = fi.va JOIN verts b ON b.vid = fi.vb
        |  JOIN verts c ON c.vid = fi.vc),
        |fm AS (SELECT *, ax + bx + cx0 AS mx, ay + by + cy0 AS my, az + bz + cz0 AS mz FROM fv),
        |fm2 AS (SELECT *, sqrt(mx * mx + my * my + mz * mz) AS mn FROM fm),
        |fc AS (SELECT f, ax, ay, az, mx / mn AS cx, my / mn AS cy, mz / mn AS cz FROM fm2),
        |fd AS (SELECT *, ax * cx + ay * cy + az * cz AS dd FROM fc),
        |fw AS (SELECT *, ax - dd * cx AS wx0, ay - dd * cy AS wy0, az - dd * cz AS wz0 FROM fd),
        |fw2 AS (SELECT *, sqrt(wx0 * wx0 + wy0 * wy0 + wz0 * wz0) AS wn FROM fw),
        |fe1 AS (SELECT f, cx, cy, cz, wx0 / wn AS e1x, wy0 / wn AS e1y, wz0 / wn AS e1z FROM fw2),
        |frames AS (SELECT *, cy * e1z - cz * e1y AS e2x, cz * e1x - cx * e1z AS e2y,
        |    cx * e1y - cy * e1x AS e2z FROM fe1),
        |sz AS (SELECT 0.35 / sqrt(7.0) / sqrt(7.0) / sqrt(7.0) / sqrt(7.0) AS s4,
        |    0.35 / sqrt(7.0) / sqrt(7.0) / sqrt(7.0) / sqrt(7.0) / sqrt(7.0) AS s5),
        |pts AS (
        |  SELECT * FROM (VALUES
        |    ('equ', -20.905, 0.0), ('gw', 0.05, 0.05),
        |    ('paris', 2.35, 48.86), ('syd', 151.21, -33.87))
        |    AS t(name, lon0, lat0)),
        |pxyz AS (
        |  SELECT name, cos(radians(CAST(lat0 AS DOUBLE))) * cos(radians(CAST(lon0 AS DOUBLE))) AS px,
        |    cos(radians(CAST(lat0 AS DOUBLE))) * sin(radians(CAST(lon0 AS DOUBLE))) AS py,
        |    sin(radians(CAST(lat0 AS DOUBLE))) AS pz
        |  FROM pts),
        |pf AS (
        |  SELECT p.name, p.px, p.py, p.pz, fr.f, fr.cx, fr.cy, fr.cz,
        |    fr.e1x, fr.e1y, fr.e1z, fr.e2x, fr.e2y, fr.e2z,
        |    p.px * fr.cx + p.py * fr.cy + p.pz * fr.cz AS pd,
        |    ROW_NUMBER() OVER (PARTITION BY p.name
        |      ORDER BY p.px * fr.cx + p.py * fr.cy + p.pz * fr.cz DESC, fr.f ASC) AS rn
        |  FROM pxyz p CROSS JOIN frames fr),
        |ploc AS (SELECT * , px / pd - cx AS tx, py / pd - cy AS ty, pz / pd - cz AS tz
        |  FROM pf WHERE rn = 1),
        |pxy AS (SELECT *, tx * e1x + ty * e1y + tz * e1z AS lx,
        |    tx * e2x + ty * e2y + tz * e2z AS ly FROM ploc),
        |pq0 AS (
        |  SELECT pxy.*, sz.s4, sz.s5,
        |    (sqrt(3.0) / 3.0 * lx - ly / 3.0) / s4 AS qf, (2.0 / 3.0 * ly) / s4 AS rf
        |  FROM pxy CROSS JOIN sz),
        |pq1 AS (SELECT *, -qf - rf AS yf FROM pq0),
        |pq2 AS (SELECT *, floor(qf + 0.5) AS ra, floor(yf + 0.5) AS rb, floor(rf + 0.5) AS rc
        |  FROM pq1),
        |pq3 AS (SELECT *, abs(ra - qf) AS dq, abs(rb - yf) AS dy, abs(rc - rf) AS dr FROM pq2),
        |par AS (
        |  SELECT name, f AS pface, s4, s5, cx, cy, cz, e1x, e1y, e1z, e2x, e2y, e2z,
        |    CAST(CASE WHEN dq > dy AND dq > dr THEN -rb - rc ELSE ra END AS BIGINT) AS pq,
        |    CAST(CASE WHEN dq > dy AND dq > dr THEN rc WHEN dy > dr THEN rc
        |         ELSE -ra - rb END AS BIGINT) AS pr
        |  FROM pq3),
        |parv AS (
        |  SELECT *,
        |    (CAST(1 AS BIGINT) << 49) + 4 * (CAST(1 AS BIGINT) << 45)
        |      + pface * (CAST(1 AS BIGINT) << 40) + (pq + 524288) * (CAST(1 AS BIGINT) << 20)
        |      + (pr + 524288) AS v4,
        |    s4 * (sqrt(3.0) * pq + sqrt(3.0) / 2.0 * pr) AS ppx,
        |    s4 * (1.5 * pr) AS ppy,
        |    CAST(ceil((s4 + 2.0 * s5) / (s5 / 4.0)) AS INT) AS m
        |  FROM par),
        |ij AS (SELECT a.i, b.j FROM range(-60, 61) a(i) CROSS JOIN range(-60, 61) b(j)),
        |samp AS (
        |  SELECT p.name, p.v4, p.pface, p.pq, p.pr, p.s4, p.s5, ij.i, ij.j,
        |    p.cx + (p.ppx + ij.i * (p.s5 / 4.0)) * p.e1x + (p.ppy + ij.j * (p.s5 / 4.0)) * p.e2x AS wx,
        |    p.cy + (p.ppx + ij.i * (p.s5 / 4.0)) * p.e1y + (p.ppy + ij.j * (p.s5 / 4.0)) * p.e2y AS wy,
        |    p.cz + (p.ppx + ij.i * (p.s5 / 4.0)) * p.e1z + (p.ppy + ij.j * (p.s5 / 4.0)) * p.e2z AS wz
        |  FROM parv p JOIN ij ON abs(ij.i) <= p.m AND abs(ij.j) <= p.m),
        |sf AS (
        |  SELECT s.name, s.v4, s.pface, s.pq, s.pr, s.s4, s.s5, s.i, s.j,
        |    s.wx, s.wy, s.wz, fr.f AS cf, fr.cx AS scx, fr.cy AS scy, fr.cz AS scz,
        |    fr.e1x AS se1x, fr.e1y AS se1y, fr.e1z AS se1z,
        |    fr.e2x AS se2x, fr.e2y AS se2y, fr.e2z AS se2z,
        |    s.wx * fr.cx + s.wy * fr.cy + s.wz * fr.cz AS spd,
        |    ROW_NUMBER() OVER (PARTITION BY s.name, s.i, s.j
        |      ORDER BY s.wx * fr.cx + s.wy * fr.cy + s.wz * fr.cz DESC, fr.f ASC) AS srn
        |  FROM samp s CROSS JOIN frames fr),
        |sloc AS (SELECT *, wx / spd - scx AS stx, wy / spd - scy AS sty, wz / spd - scz AS stz
        |  FROM sf WHERE srn = 1),
        |sxy AS (SELECT *, stx * se1x + sty * se1y + stz * se1z AS slx,
        |    stx * se2x + sty * se2y + stz * se2z AS sly FROM sloc),
        |sq0 AS (SELECT *, (sqrt(3.0) / 3.0 * slx - sly / 3.0) / s5 AS sqf,
        |    (2.0 / 3.0 * sly) / s5 AS srf FROM sxy),
        |sq1 AS (SELECT *, -sqf - srf AS syf FROM sq0),
        |sq2 AS (SELECT *, floor(sqf + 0.5) AS sa, floor(syf + 0.5) AS sb, floor(srf + 0.5) AS sc
        |  FROM sq1),
        |sq3 AS (SELECT *, abs(sa - sqf) AS sdq, abs(sb - syf) AS sdy, abs(sc - srf) AS sdr
        |  FROM sq2),
        |scell AS (
        |  SELECT name, v4, pface, pq, pr, s4, s5, cf,
        |    CAST(CASE WHEN sdq > sdy AND sdq > sdr THEN -sb - sc ELSE sa END AS BIGINT) AS cq,
        |    CAST(CASE WHEN sdq > sdy AND sdq > sdr THEN sc WHEN sdy > sdr THEN sc
        |         ELSE -sa - sb END AS BIGINT) AS cr
        |  FROM sq3),
        |cand AS (SELECT DISTINCT name, v4, pface, pq, pr, s4, s5, cf, cq, cr FROM scell),
        |cv AS (
        |  SELECT c.*, fr.cx AS fcx, fr.cy AS fcy, fr.cz AS fcz,
        |    fr.e1x AS fe1x, fr.e1y AS fe1y, fr.e1z AS fe1z,
        |    fr.e2x AS fe2x, fr.e2y AS fe2y, fr.e2z AS fe2z,
        |    (CAST(1 AS BIGINT) << 49) + 5 * (CAST(1 AS BIGINT) << 45)
        |      + c.cf * (CAST(1 AS BIGINT) << 40) + (c.cq + 524288) * (CAST(1 AS BIGINT) << 20)
        |      + (c.cr + 524288) AS v5,
        |    c.s5 * (sqrt(3.0) * c.cq + sqrt(3.0) / 2.0 * c.cr) AS clx,
        |    c.s5 * (1.5 * c.cr) AS cly
        |  FROM cand c JOIN frames fr ON fr.f = c.cf),
        |cxyz AS (
        |  SELECT name, v4, pface, pq, pr, s4, v5,
        |    fcx + clx * fe1x + cly * fe2x AS cwx,
        |    fcy + clx * fe1y + cly * fe2y AS cwy,
        |    fcz + clx * fe1z + cly * fe2z AS cwz
        |  FROM cv),
        |vf AS (
        |  SELECT c.name, c.v4, c.pface, c.pq, c.pr, c.s4, c.v5,
        |    c.cwx, c.cwy, c.cwz, fr.f AS vface, fr.cx AS vcx, fr.cy AS vcy, fr.cz AS vcz,
        |    fr.e1x AS ve1x, fr.e1y AS ve1y, fr.e1z AS ve1z,
        |    fr.e2x AS ve2x, fr.e2y AS ve2y, fr.e2z AS ve2z,
        |    c.cwx * fr.cx + c.cwy * fr.cy + c.cwz * fr.cz AS vpd,
        |    ROW_NUMBER() OVER (PARTITION BY c.name, c.v5
        |      ORDER BY c.cwx * fr.cx + c.cwy * fr.cy + c.cwz * fr.cz DESC, fr.f ASC) AS vrn
        |  FROM cxyz c CROSS JOIN frames fr),
        |vloc AS (SELECT *, cwx / vpd - vcx AS vtx, cwy / vpd - vcy AS vty, cwz / vpd - vcz AS vtz
        |  FROM vf WHERE vrn = 1),
        |vxy AS (SELECT *, vtx * ve1x + vty * ve1y + vtz * ve1z AS vlx,
        |    vtx * ve2x + vty * ve2y + vtz * ve2z AS vly FROM vloc),
        |vq0 AS (SELECT *, (sqrt(3.0) / 3.0 * vlx - vly / 3.0) / s4 AS vqf,
        |    (2.0 / 3.0 * vly) / s4 AS vrf FROM vxy),
        |vq1 AS (SELECT *, -vqf - vrf AS vyf FROM vq0),
        |vq2 AS (SELECT *, floor(vqf + 0.5) AS va, floor(vyf + 0.5) AS vb, floor(vrf + 0.5) AS vc
        |  FROM vq1),
        |vq3 AS (SELECT *, abs(va - vqf) AS vdq, abs(vb - vyf) AS vdy, abs(vc - vrf) AS vdr
        |  FROM vq2),
        |vcell AS (
        |  SELECT name, v4, pface, pq, pr, v5, vface,
        |    CAST(CASE WHEN vdq > vdy AND vdq > vdr THEN -vb - vc ELSE va END AS BIGINT) AS vq,
        |    CAST(CASE WHEN vdq > vdy AND vdq > vdr THEN vc WHEN vdy > vdr THEN vc
        |         ELSE -va - vb END AS BIGINT) AS vr
        |  FROM vq3),
        |kids AS (SELECT name, v5 FROM vcell
        |  WHERE vface = pface AND vq = pq AND vr = pr),
        |agg AS (
        |  SELECT name, COUNT(*) AS nk,
        |    string_agg(lower(to_hex(v5)), ',' ORDER BY v5) AS kc
        |  FROM kids GROUP BY name)
        |SELECT p.name, lower(to_hex(p.v4)) AS p4, CAST(agg.nk AS BIGINT) AS nkids,
        |  agg.kc AS kidcat, lower(to_hex(p.v4)) AS self0
        |FROM parv p JOIN agg ON agg.name = p.name
        |ORDER BY p.name ASC""".stripMargin,
    "kql_geo_h3" ->
      """WITH k AS (SELECT (1.0 + sqrt(5.0)) / 2.0 AS phi),
        |k2 AS (SELECT phi, sqrt(1.0 + phi * phi) AS vn FROM k),
        |verts AS (
        |  SELECT vid,
        |    (CASE WHEN xc = 2 THEN phi WHEN xc = -2 THEN -phi ELSE CAST(xc AS DOUBLE) END) / vn AS vx,
        |    (CASE WHEN yc = 2 THEN phi WHEN yc = -2 THEN -phi ELSE CAST(yc AS DOUBLE) END) / vn AS vy,
        |    (CASE WHEN zc = 2 THEN phi WHEN zc = -2 THEN -phi ELSE CAST(zc AS DOUBLE) END) / vn AS vz
        |  FROM (VALUES (0,0,1,2),(1,0,1,-2),(2,0,-1,2),(3,0,-1,-2),
        |               (4,1,2,0),(5,1,-2,0),(6,-1,2,0),(7,-1,-2,0),
        |               (8,2,0,1),(9,2,0,-1),(10,-2,0,1),(11,-2,0,-1))
        |    vt(vid, xc, yc, zc) CROSS JOIN k2),
        |fv AS (
        |  SELECT fi.f, a.vx AS ax, a.vy AS ay, a.vz AS az,
        |    b.vx AS bx, b.vy AS by, b.vz AS bz,
        |    c.vx AS cx0, c.vy AS cy0, c.vz AS cz0
        |  FROM (VALUES (0,0,2,8),(1,0,2,10),(2,0,4,6),(3,0,4,8),(4,0,6,10),
        |               (5,1,3,9),(6,1,3,11),(7,1,4,6),(8,1,4,9),(9,1,6,11),
        |               (10,2,5,7),(11,2,5,8),(12,2,7,10),(13,3,5,7),(14,3,5,9),
        |               (15,3,7,11),(16,4,8,9),(17,5,8,9),(18,6,10,11),(19,7,10,11))
        |    fi(f, va, vb, vc)
        |  JOIN verts a ON a.vid = fi.va JOIN verts b ON b.vid = fi.vb
        |  JOIN verts c ON c.vid = fi.vc),
        |fm AS (SELECT *, ax + bx + cx0 AS mx, ay + by + cy0 AS my, az + bz + cz0 AS mz FROM fv),
        |fm2 AS (SELECT *, sqrt(mx * mx + my * my + mz * mz) AS mn FROM fm),
        |fc AS (SELECT f, ax, ay, az, mx / mn AS cx, my / mn AS cy, mz / mn AS cz FROM fm2),
        |fd AS (SELECT *, ax * cx + ay * cy + az * cz AS dd FROM fc),
        |fw AS (SELECT *, ax - dd * cx AS wx0, ay - dd * cy AS wy0, az - dd * cz AS wz0 FROM fd),
        |fw2 AS (SELECT *, sqrt(wx0 * wx0 + wy0 * wy0 + wz0 * wz0) AS wn FROM fw),
        |fe1 AS (SELECT f, cx, cy, cz, wx0 / wn AS e1x, wy0 / wn AS e1y, wz0 / wn AS e1z FROM fw2),
        |frames AS (SELECT *, cy * e1z - cz * e1y AS e2x, cz * e1x - cx * e1z AS e2y,
        |    cx * e1y - cy * e1x AS e2z FROM fe1),
        |sz AS (SELECT 0.35 / sqrt(7.0) / sqrt(7.0) / sqrt(7.0) / sqrt(7.0) / sqrt(7.0) AS s5,
        |    0.35 / sqrt(7.0) / sqrt(7.0) / sqrt(7.0) / sqrt(7.0) / sqrt(7.0) / sqrt(7.0) AS s6,
        |    0.35 / sqrt(7.0) / sqrt(7.0) / sqrt(7.0) / sqrt(7.0) AS s4),
        |pts AS (
        |  SELECT * FROM (VALUES
        |    ('equ', -20.905, 0.0), ('gw', 0.0, 0.0), ('paris', 2.35, 48.86),
        |    ('syd', 151.21, -33.87), ('npole', 20.0, 90.0), ('rio', -43.2, -22.9),
        |    ('tok', 139.7, 35.7), ('cpt', 18.4, -33.9), ('bad', 200.0, 10.0))
        |    AS t(name, lon0, lat0)),
        |p0 AS (
        |  SELECT name, CAST(lon0 AS DOUBLE) AS lon, CAST(lat0 AS DOUBLE) AS lat,
        |    lon0 >= -180.0 AND lon0 <= 180.0 AND lat0 >= -90.0 AND lat0 <= 90.0 AS ok
        |  FROM pts),
        |pxyz AS (
        |  SELECT name, ok, cos(radians(lat)) * cos(radians(lon)) AS px,
        |    cos(radians(lat)) * sin(radians(lon)) AS py, sin(radians(lat)) AS pz
        |  FROM p0),
        |pf AS (
        |  SELECT p.name, p.ok, p.px, p.py, p.pz, fr.f, fr.cx, fr.cy, fr.cz,
        |    fr.e1x, fr.e1y, fr.e1z, fr.e2x, fr.e2y, fr.e2z,
        |    p.px * fr.cx + p.py * fr.cy + p.pz * fr.cz AS pd,
        |    ROW_NUMBER() OVER (PARTITION BY p.name
        |      ORDER BY p.px * fr.cx + p.py * fr.cy + p.pz * fr.cz DESC, fr.f ASC) AS rn
        |  FROM pxyz p CROSS JOIN frames fr),
        |psel AS (SELECT * FROM pf WHERE rn = 1),
        |ploc AS (SELECT *, px / pd - cx AS tx, py / pd - cy AS ty, pz / pd - cz AS tz FROM psel),
        |pxy AS (SELECT *, tx * e1x + ty * e1y + tz * e1z AS lx,
        |    tx * e2x + ty * e2y + tz * e2z AS ly FROM ploc),
        |pq AS (
        |  SELECT pxy.*, sz.s5, sz.s6, sz.s4,
        |    (sqrt(3.0) / 3.0 * lx - ly / 3.0) / s5 AS qf5, (2.0 / 3.0 * ly) / s5 AS rf5,
        |    (sqrt(3.0) / 3.0 * lx - ly / 3.0) / s6 AS qf6, (2.0 / 3.0 * ly) / s6 AS rf6
        |  FROM pxy CROSS JOIN sz),
        |py2 AS (SELECT *, -qf5 - rf5 AS yf5, -qf6 - rf6 AS yf6 FROM pq),
        |prnd AS (
        |  SELECT *, floor(qf5 + 0.5) AS a5, floor(yf5 + 0.5) AS b5, floor(rf5 + 0.5) AS c5r,
        |    floor(qf6 + 0.5) AS a6, floor(yf6 + 0.5) AS b6, floor(rf6 + 0.5) AS c6r
        |  FROM py2),
        |pdx AS (
        |  SELECT *, abs(a5 - qf5) AS dq5, abs(b5 - yf5) AS dy5, abs(c5r - rf5) AS dr5,
        |    abs(a6 - qf6) AS dq6, abs(b6 - yf6) AS dy6, abs(c6r - rf6) AS dr6
        |  FROM prnd),
        |pcell AS (
        |  SELECT name, ok, f, cx, cy, cz, e1x, e1y, e1z, e2x, e2y, e2z, s5, s6, s4,
        |    CAST(CASE WHEN dq5 > dy5 AND dq5 > dr5 THEN -b5 - c5r ELSE a5 END AS BIGINT) AS q5,
        |    CAST(CASE WHEN dq5 > dy5 AND dq5 > dr5 THEN c5r WHEN dy5 > dr5 THEN c5r
        |         ELSE -a5 - b5 END AS BIGINT) AS r5,
        |    CAST(CASE WHEN dq6 > dy6 AND dq6 > dr6 THEN -b6 - c6r ELSE a6 END AS BIGINT) AS q6,
        |    CAST(CASE WHEN dq6 > dy6 AND dq6 > dr6 THEN c6r WHEN dy6 > dr6 THEN c6r
        |         ELSE -a6 - b6 END AS BIGINT) AS r6
        |  FROM pdx),
        |ptok AS (
        |  SELECT *,
        |    (CAST(1 AS BIGINT) << 49) + 5 * (CAST(1 AS BIGINT) << 45)
        |      + f * (CAST(1 AS BIGINT) << 40) + (q5 + 524288) * (CAST(1 AS BIGINT) << 20)
        |      + (r5 + 524288) AS v5,
        |    (CAST(1 AS BIGINT) << 49) + 6 * (CAST(1 AS BIGINT) << 45)
        |      + f * (CAST(1 AS BIGINT) << 40) + (q6 + 524288) * (CAST(1 AS BIGINT) << 20)
        |      + (r6 + 524288) AS v6
        |  FROM pcell),
        |pctr AS (
        |  SELECT *, s5 * (sqrt(3.0) * q5 + sqrt(3.0) / 2.0 * r5) AS lcx,
        |    s5 * (1.5 * r5) AS lcy
        |  FROM ptok),
        |pw AS (
        |  SELECT *, cx + lcx * e1x + lcy * e2x AS cwx, cy + lcx * e1y + lcy * e2y AS cwy,
        |    cz + lcx * e1z + lcy * e2z AS cwz
        |  FROM pctr),
        |pp0 AS (
        |  SELECT p.name, p.s4, p.cwx, p.cwy, p.cwz,
        |    fr.f AS pf, fr.cx AS pcx, fr.cy AS pcy, fr.cz AS pcz,
        |    fr.e1x AS pe1x, fr.e1y AS pe1y, fr.e1z AS pe1z,
        |    fr.e2x AS pe2x, fr.e2y AS pe2y, fr.e2z AS pe2z,
        |    p.cwx * fr.cx + p.cwy * fr.cy + p.cwz * fr.cz AS ppd,
        |    ROW_NUMBER() OVER (PARTITION BY p.name
        |      ORDER BY p.cwx * fr.cx + p.cwy * fr.cy + p.cwz * fr.cz DESC, fr.f ASC) AS prn
        |  FROM pw p CROSS JOIN frames fr),
        |pp1 AS (
        |  SELECT *, cwx / ppd - pcx AS ptx, cwy / ppd - pcy AS pty,
        |    cwz / ppd - pcz AS ptz
        |  FROM pp0 WHERE prn = 1),
        |pp2 AS (SELECT *, ptx * pe1x + pty * pe1y + ptz * pe1z AS plx,
        |    ptx * pe2x + pty * pe2y + ptz * pe2z AS ply FROM pp1),
        |pp3 AS (
        |  SELECT *, (sqrt(3.0) / 3.0 * plx - ply / 3.0) / s4 AS pqf,
        |    (2.0 / 3.0 * ply) / s4 AS prf
        |  FROM pp2),
        |pp4 AS (SELECT *, -pqf - prf AS pyf FROM pp3),
        |pp5 AS (
        |  SELECT *, floor(pqf + 0.5) AS pa, floor(pyf + 0.5) AS pb, floor(prf + 0.5) AS pc
        |  FROM pp4),
        |pp6 AS (
        |  SELECT *, abs(pa - pqf) AS pdq, abs(pb - pyf) AS pdy, abs(pc - prf) AS pdr
        |  FROM pp5),
        |ppv AS (
        |  SELECT name,
        |    (CAST(1 AS BIGINT) << 49) + 4 * (CAST(1 AS BIGINT) << 45)
        |      + pf * (CAST(1 AS BIGINT) << 40)
        |      + (CAST(CASE WHEN pdq > pdy AND pdq > pdr THEN -pb - pc ELSE pa END AS BIGINT)
        |         + 524288) * (CAST(1 AS BIGINT) << 20)
        |      + (CAST(CASE WHEN pdq > pdy AND pdq > pdr THEN pc WHEN pdy > pdr THEN pc
        |              ELSE -pa - pb END AS BIGINT) + 524288) AS v4
        |  FROM pp6),
        |nb0 AS (
        |  SELECT pw.name, pw.f AS face0, pw.q5, pw.r5, pw.s5, pw.v5,
        |    pw.cx AS ocx, pw.cy AS ocy, pw.cz AS ocz,
        |    pw.e1x AS oe1x, pw.e1y AS oe1y, pw.e1z AS oe1z,
        |    pw.e2x AS oe2x, pw.e2y AS oe2y, pw.e2z AS oe2z, d.ring, d.dq, d.dr
        |  FROM pw CROSS JOIN (VALUES
        |    (0,0,0),
        |    (1,1,0),(1,1,-1),(1,0,-1),(1,-1,0),(1,-1,1),(1,0,1),
        |    (2,2,0),(2,2,-1),(2,2,-2),(2,1,-2),(2,0,-2),(2,-1,-1),
        |    (2,-2,0),(2,-2,1),(2,-2,2),(2,-1,2),(2,0,2),(2,1,1)) d(ring, dq, dr)),
        |nb1 AS (
        |  SELECT *, s5 * (sqrt(3.0) * (q5 + dq) + sqrt(3.0) / 2.0 * (r5 + dr)) AS nlx,
        |    s5 * (1.5 * (r5 + dr)) AS nly
        |  FROM nb0),
        |nb2 AS (
        |  SELECT *, ocx + nlx * oe1x + nly * oe2x AS nwx,
        |    ocy + nlx * oe1y + nly * oe2y AS nwy,
        |    ocz + nlx * oe1z + nly * oe2z AS nwz
        |  FROM nb1),
        |nf AS (
        |  SELECT n.name, n.ring, n.dq, n.dr, n.s5, n.v5, n.nwx, n.nwy, n.nwz,
        |    fr.f AS nface, fr.cx AS ncx, fr.cy AS ncy, fr.cz AS ncz,
        |    fr.e1x AS ne1x, fr.e1y AS ne1y, fr.e1z AS ne1z,
        |    fr.e2x AS ne2x, fr.e2y AS ne2y, fr.e2z AS ne2z,
        |    n.nwx * fr.cx + n.nwy * fr.cy + n.nwz * fr.cz AS npd,
        |    ROW_NUMBER() OVER (PARTITION BY n.name, n.dq, n.dr
        |      ORDER BY n.nwx * fr.cx + n.nwy * fr.cy + n.nwz * fr.cz DESC, fr.f ASC) AS rn2
        |  FROM nb2 n CROSS JOIN frames fr),
        |nloc AS (
        |  SELECT *, nwx / npd - ncx AS ntx, nwy / npd - ncy AS nty, nwz / npd - ncz AS ntz
        |  FROM nf WHERE rn2 = 1),
        |nxy AS (SELECT *, ntx * ne1x + nty * ne1y + ntz * ne1z AS nlx2,
        |    ntx * ne2x + nty * ne2y + ntz * ne2z AS nly2 FROM nloc),
        |nq AS (
        |  SELECT *, (sqrt(3.0) / 3.0 * nlx2 - nly2 / 3.0) / s5 AS nqf,
        |    (2.0 / 3.0 * nly2) / s5 AS nrf
        |  FROM nxy),
        |ny AS (SELECT *, -nqf - nrf AS nyf FROM nq),
        |nrnd AS (
        |  SELECT *, floor(nqf + 0.5) AS na, floor(nyf + 0.5) AS nb, floor(nrf + 0.5) AS nc
        |  FROM ny),
        |ndx AS (
        |  SELECT *, abs(na - nqf) AS ndq, abs(nb - nyf) AS ndy, abs(nc - nrf) AS ndr
        |  FROM nrnd),
        |ncell AS (
        |  SELECT name, ring, v5, nface,
        |    CAST(CASE WHEN ndq > ndy AND ndq > ndr THEN -nb - nc ELSE na END AS BIGINT) AS nq5,
        |    CAST(CASE WHEN ndq > ndy AND ndq > ndr THEN nc WHEN ndy > ndr THEN nc
        |         ELSE -na - nb END AS BIGINT) AS nr5
        |  FROM ndx),
        |nv AS (
        |  SELECT name, ring, v5,
        |    (CAST(1 AS BIGINT) << 49) + 5 * (CAST(1 AS BIGINT) << 45)
        |      + nface * (CAST(1 AS BIGINT) << 40) + (nq5 + 524288) * (CAST(1 AS BIGINT) << 20)
        |      + (nr5 + 524288) AS nbv
        |  FROM ncell),
        |nsets AS (
        |  SELECT name, nbv, MIN(ring) AS ring, MAX(v5) AS v5 FROM nv GROUP BY name, nbv),
        |ncnt AS (
        |  SELECT nv.name,
        |    COUNT(DISTINCT nv.nbv) FILTER (WHERE nv.ring = 1 AND nv.nbv <> nv.v5) AS nnb0
        |  FROM nv GROUP BY nv.name),
        |rcnt AS (
        |  SELECT name,
        |    COUNT(*) FILTER (WHERE ring = 1) AS nr1_0,
        |    COUNT(*) FILTER (WHERE ring = 2) AS nr2_0,
        |    COUNT(*) FILTER (WHERE ring = 0 AND nbv = v5) AS r0ok_0
        |  FROM nsets GROUP BY name)
        |SELECT pw.name,
        |  CASE WHEN pw.ok THEN lower(to_hex(pw.v5)) END AS c5,
        |  CASE WHEN pw.ok THEN lower(to_hex(pw.v6)) END AS cd,
        |  CASE WHEN pw.ok THEN CAST(floor(degrees(atan2(pw.cwy, pw.cwx)) * 1000000.0) AS BIGINT) END AS clon,
        |  CASE WHEN pw.ok THEN CAST(floor(degrees(atan2(pw.cwz, sqrt(pw.cwx * pw.cwx + pw.cwy * pw.cwy))) * 1000000.0) AS BIGINT) END AS clat,
        |  CASE WHEN pw.ok THEN CAST(ncnt.nnb0 AS BIGINT) END AS nnb,
        |  CASE WHEN pw.ok THEN CAST(rcnt.nr1_0 AS BIGINT) END AS nr1,
        |  CASE WHEN pw.ok THEN CAST(rcnt.nr2_0 AS BIGINT) END AS nr2,
        |  CASE WHEN pw.ok THEN CAST(rcnt.r0ok_0 AS BIGINT) END AS r0ok,
        |  CASE WHEN pw.ok THEN lower(to_hex(ppv.v4)) END AS p4,
        |  CASE WHEN pw.ok THEN CAST(5 AS BIGINT) END AS lvl
        |FROM pw JOIN ncnt ON ncnt.name = pw.name JOIN rcnt ON rcnt.name = pw.name
        |  JOIN ppv ON ppv.name = pw.name
        |ORDER BY pw.name ASC""".stripMargin,
    // independent all-points distance formulation (zero H3
    // arithmetic), mean-latitude fold and per-segment projection
    // mirrored op-for-op from GeoDistPointToLine.
    "kql_geo_h3_line_join" ->
      s"""${Sql.ordersInfoCte},
         |pts AS (
         |  SELECT orderid, city, CAST(orderid % 1600 AS DOUBLE) / 100.0 - 29.0 AS lon,
         |    CAST(custid % 1000 AS DOUBLE) / 62.5 - 8.0 AS lat
         |  FROM orders_info),
         |segs AS (
         |  SELECT * FROM (VALUES
         |    (-27.0, -6.0, -22.0, -1.0), (-22.0, -1.0, -18.0, 1.0),
         |    (-18.0, 1.0, -15.5, 6.0)) AS s(x1, y1, x2, y2)),
         |k AS (SELECT 111320.0 * cos(radians(
         |  (CAST(0 AS DOUBLE) + -6.0 + -1.0 + 1.0 + 6.0) / CAST(4 AS DOUBLE))) AS kx),
         |segm AS (
         |  SELECT x1 * kx AS ax, y1 * 110574.0 AS ay,
         |    (x2 - x1) * kx AS dx, (y2 - y1) * 110574.0 AS dy
         |  FROM segs CROSS JOIN k),
         |pd AS (
         |  SELECT p.orderid, p.city, p.lon * kx AS qx, p.lat * 110574.0 AS qy,
         |    s.ax, s.ay, s.dx, s.dy
         |  FROM pts p CROSS JOIN segm s CROSS JOIN k),
         |pt AS (
         |  SELECT *, CASE WHEN dx * dx + dy * dy = CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE)
         |    ELSE least(CAST(1 AS DOUBLE), greatest(CAST(0 AS DOUBLE),
         |      ((qx - ax) * dx + (qy - ay) * dy) / (dx * dx + dy * dy))) END AS t
         |  FROM pd),
         |d AS (
         |  SELECT orderid, city,
         |    MIN(sqrt((qx - ax - t * dx) * (qx - ax - t * dx)
         |      + (qy - ay - t * dy) * (qy - ay - t * dy))) AS dist
         |  FROM pt GROUP BY 1, 2)
         |SELECT city, CAST(COUNT(*) AS BIGINT) AS n,
         |  MIN(CAST(floor(dist) AS BIGINT)) AS d_min_m,
         |  MAX(CAST(floor(dist) AS BIGINT)) AS d_max_m
         |FROM d WHERE dist <= 25000.0 GROUP BY city ORDER BY city ASC""".stripMargin,
    // independent all-points even-odd formulation (zero H3
    // arithmetic): a cover miss would drop a join hit and fail.
    "kql_geo_h3_polygon_join" ->
      s"""${Sql.ordersInfoCte},
         |pts AS (
         |  SELECT orderid, city, CAST(orderid % 1600 AS DOUBLE) / 100.0 - 29.0 AS lon,
         |    CAST(custid % 1000 AS DOUBLE) / 62.5 - 8.0 AS lat
         |  FROM orders_info),
         |edges AS (
         |  SELECT * FROM (VALUES
         |    (-27.0, -5.0, -20.0, -6.5), (-20.0, -6.5, -15.0, -2.0),
         |    (-15.0, -2.0, -19.0, 1.5), (-19.0, 1.5, -16.0, 5.0),
         |    (-16.0, 5.0, -24.0, 6.0), (-24.0, 6.0, -22.0, 0.5),
         |    (-22.0, 0.5, -27.0, -5.0)) AS e(x1, y1, x2, y2)),
         |cr AS (
         |  SELECT p.orderid, p.city, p.lon, p.lat,
         |    COUNT(*) FILTER (WHERE ((y1 > lat) <> (y2 > lat))
         |      AND lon < x1 + (x2 - x1) * (lat - y1) / (y2 - y1)) % 2 = 1 AS inside
         |  FROM pts p CROSS JOIN edges GROUP BY 1, 2, 3, 4)
         |SELECT city, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(floor(MIN(lon) * 1000000.0) AS BIGINT) AS lon_min_u,
         |  CAST(floor(MAX(lat) * 1000000.0) AS BIGINT) AS lat_max_u
         |FROM cr WHERE inside GROUP BY city ORDER BY city ASC""".stripMargin,
    // independent formulation (cross join + haversine, zero H3
    // arithmetic): if the hex-cell 1-ring fan-out missed any within-R
    // pair, the counts would not match.
    "kql_geo_h3_join" ->
      s"""${Sql.ordersInfoCte},
         |pts AS (
         |  SELECT orderid, CAST(orderid % 1600 AS DOUBLE) / 100.0 - 29.0 AS lon,
         |    CAST(custid % 1000 AS DOUBLE) / 62.5 - 8.0 AS lat
         |  FROM orders_info),
         |sites AS (
         |  SELECT * FROM (VALUES
         |    ('ana', -27.5, -6.2), ('bor', -24.0, 3.1), ('cen', -20.9, 0.0),
         |    ('dor', -16.3, 5.4), ('eri', -14.2, -4.8))
         |    AS s(site, slon, slat)),
         |d AS (
         |  SELECT site,
         |    2.0 * 6371000.0 * asin(sqrt(least(1.0,
         |      sin((radians(slat) - radians(lat)) / 2) * sin((radians(slat) - radians(lat)) / 2)
         |      + cos(radians(lat)) * cos(radians(slat))
         |        * sin((radians(slon) - radians(lon)) / 2) * sin((radians(slon) - radians(lon)) / 2)))) AS dist
         |  FROM pts CROSS JOIN sites)
         |SELECT site, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(floor(MIN(dist)) AS BIGINT) AS d_min_m,
         |  CAST(floor(MAX(dist)) AS BIGINT) AS d_max_m
         |FROM d WHERE dist <= 40000.0
         |GROUP BY site ORDER BY site ASC""".stripMargin,
    // independent formulation (cross join + haversine, zero S2
    // arithmetic): if the cell-neighbor fan-out missed any
    // within-R pair, the counts would not match.
    "kql_geo_s2_join" ->
      s"""${Sql.ordersInfoCte},
         |pts AS (
         |  SELECT orderid, CAST(orderid % 6000 AS DOUBLE) / 100.0 - 30.0 AS lon,
         |    5.0 + CAST(custid % 1400 AS DOUBLE) / 50.0 AS lat
         |  FROM orders_info),
         |sites AS (
         |  SELECT * FROM (VALUES
         |    ('dak', -17.45, 14.69), ('abj', -4.02, 5.35), ('cai', 30.0, 30.0),
         |    ('rjd', 21.5, 24.0), ('nia', 2.1, 13.5))
         |    AS s(site, slon, slat)),
         |d AS (
         |  SELECT site,
         |    2.0 * 6371000.0 * asin(sqrt(least(1.0,
         |      sin((radians(slat) - radians(lat)) / 2) * sin((radians(slat) - radians(lat)) / 2)
         |      + cos(radians(lat)) * cos(radians(slat))
         |        * sin((radians(slon) - radians(lon)) / 2) * sin((radians(slon) - radians(lon)) / 2)))) AS dist
         |  FROM pts CROSS JOIN sites)
         |SELECT site, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(floor(MIN(dist)) AS BIGINT) AS d_min_m,
         |  CAST(floor(MAX(dist)) AS BIGINT) AS d_max_m
         |FROM d WHERE dist <= 40000.0
         |GROUP BY site ORDER BY site ASC""".stripMargin,
    "kql_geo" ->
      """WITH p AS (
        |  SELECT * FROM (VALUES
        |    ('osl', 10.75, 59.91), ('cph', 12.57, 55.69),
        |    ('rey', -21.94, 64.15), ('syd', 151.21, -33.87),
        |    ('fij', 178.44, -18.14), ('sam', -170.70, -14.27),
        |    ('npole', 0.0, 90.0), ('bad', 200.0, 10.0)) AS t(name, lon, lat)),
        |q AS (
        |  SELECT name, lon, lat,
        |    least(32767, greatest(0, CAST(floor((lon + 180.0) / 360.0 * 32768) AS BIGINT))) AS ix6,
        |    least(32767, greatest(0, CAST(floor((lat + 90.0) / 180.0 * 32768) AS BIGINT))) AS iy6,
        |    least(7, greatest(0, CAST(floor((lon + 180.0) / 360.0 * 8) AS BIGINT))) AS ix1,
        |    least(3, greatest(0, CAST(floor((lat + 90.0) / 180.0 * 4) AS BIGINT))) AS iy1
        |  FROM p),
        |i AS (
        |  SELECT name, lon, lat,
        |    list_sum(list_transform(range(0, 30), pp ->
        |      CASE WHEN pp % 2 = 0 THEN ((ix6 >> CAST(14 - pp // 2 AS INT)) & 1) * (CAST(1 AS BIGINT) << CAST(29 - pp AS INT))
        |           ELSE ((iy6 >> CAST(14 - (pp - 1) // 2 AS INT)) & 1) * (CAST(1 AS BIGINT) << CAST(29 - pp AS INT)) END)) AS in6,
        |    list_sum(list_transform(range(0, 5), pp ->
        |      CASE WHEN pp % 2 = 0 THEN ((ix1 >> CAST(2 - pp // 2 AS INT)) & 1) * (CAST(1 AS BIGINT) << CAST(4 - pp AS INT))
        |           ELSE ((iy1 >> CAST(1 - (pp - 1) // 2 AS INT)) & 1) * (CAST(1 AS BIGINT) << CAST(4 - pp AS INT)) END)) AS in1
        |  FROM q),
        |g AS (
        |  SELECT name, lon, lat,
        |    CASE WHEN abs(lat) > 90.0 OR abs(lon) > 180.0 THEN NULL ELSE
        |      array_to_string(list_transform(range(0, 6), c ->
        |        substr('0123456789bcdefghjkmnpqrstuvwxyz',
        |          CAST(((in6 >> CAST(5 * (5 - c) AS INT)) & 31) AS INT) + 1, 1)), '') END AS gh,
        |    CASE WHEN abs(lat) > 90.0 OR abs(lon) > 180.0 THEN NULL ELSE
        |      substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(in1 AS INT) + 1, 1) END AS gh1
        |  FROM i),
        |d AS (
        |  SELECT name, gh, gh1,
        |    CASE WHEN abs(lat) > 90.0 OR abs(lon) > 180.0 THEN NULL ELSE
        |      2.0 * 6371000.0 * asin(sqrt(least(1.0,
        |        sin((radians(59.91) - radians(lat)) / 2) * sin((radians(59.91) - radians(lat)) / 2)
        |        + cos(radians(lat)) * cos(radians(59.91))
        |          * sin((radians(10.75) - radians(lon)) / 2) * sin((radians(10.75) - radians(lon)) / 2)))) END AS d_osl,
        |    CASE WHEN abs(lat) > 90.0 OR abs(lon) > 180.0 THEN NULL ELSE
        |      2.0 * 6371000.0 * asin(sqrt(least(1.0,
        |        sin((radians(55.69) - radians(lat)) / 2) * sin((radians(55.69) - radians(lat)) / 2)
        |        + cos(radians(lat)) * cos(radians(55.69))
        |          * sin((radians(12.57) - radians(lon)) / 2) * sin((radians(12.57) - radians(lon)) / 2)))) END AS d_cph
        |  FROM g)
        |SELECT name, gh, gh1,
        |  CAST(floor(d_osl) AS BIGINT) AS d_osl_m,
        |  d_cph <= 700000.0 AS near_cph
        |FROM d ORDER BY name ASC""".stripMargin,
    // geohash rect: the acc-6 interleave replayed (the kql_geo
    // chain), edges from the same dyadic division order, containment
    // as the strict-interior interval test.
    "kql_geo_polygons2" ->
      """WITH p AS (
        |  SELECT * FROM (VALUES
        |    ('osl', 10.75, 59.91), ('syd', 151.21, -33.87),
        |    ('sam', -170.70, -14.27), ('equ', 0.02, -0.01)) AS t(name, lon, lat)),
        |q AS (
        |  SELECT name, lon, lat,
        |    least(32767, greatest(0, CAST(floor((lon + 180.0) / 360.0 * 32768) AS BIGINT))) AS ix6,
        |    least(32767, greatest(0, CAST(floor((lat + 90.0) / 180.0 * 32768) AS BIGINT))) AS iy6
        |  FROM p),
        |i AS (
        |  SELECT name, lon, lat, ix6, iy6,
        |    list_sum(list_transform(range(0, 30), pp ->
        |      CASE WHEN pp % 2 = 0 THEN ((ix6 >> CAST(14 - pp // 2 AS INT)) & 1) * (CAST(1 AS BIGINT) << CAST(29 - pp AS INT))
        |           ELSE ((iy6 >> CAST(14 - (pp - 1) // 2 AS INT)) & 1) * (CAST(1 AS BIGINT) << CAST(29 - pp AS INT)) END)) AS in6
        |  FROM q),
        |g AS (
        |  SELECT name, lon, lat, ix6, iy6,
        |    array_to_string(list_transform(range(0, 6), c ->
        |      substr('0123456789bcdefghjkmnpqrstuvwxyz',
        |        CAST(((in6 >> CAST(5 * (5 - c) AS INT)) & 31) AS INT) + 1, 1)), '') AS gh,
        |    CAST(ix6 AS DOUBLE) / 32768.0 * 360.0 - 180.0 AS w,
        |    CAST(ix6 + 1 AS DOUBLE) / 32768.0 * 360.0 - 180.0 AS e,
        |    CAST(iy6 AS DOUBLE) / 32768.0 * 180.0 - 90.0 AS s,
        |    CAST(iy6 + 1 AS DOUBLE) / 32768.0 * 180.0 - 90.0 AS n
        |  FROM i)
        |SELECT name, gh,
        |  CAST(CASE WHEN lon > w AND lon < e AND lat > s AND lat < n
        |    THEN 1 ELSE 0 END AS BIGINT) AS inpt,
        |  CAST(floor(w * 1000000.0) AS BIGINT) AS w_u,
        |  CAST(floor(s * 1000000.0) AS BIGINT) AS s_u,
        |  CAST(floor(e * 1000000.0) AS BIGINT) AS e_u,
        |  CAST(floor(n * 1000000.0) AS BIGINT) AS n_u
        |FROM g ORDER BY name ASC""".stripMargin,
    // h3 polygon: encode replayed through the shared frames chain at
    // res 4, the six corner offsets (exact ±√3/2 / ±½ literals) in
    // the owning face's plane, the center's inverse atan2 chain per
    // corner; center-containment and ring closure are construction
    // facts (the center is the hexagon's own centroid; vertex 6 IS
    // vertex 0).
    "kql_geo_h3_polygon2" ->
      s"""WITH $duckH3Frames,
         |sz AS (SELECT 0.35 / sqrt(7.0) / sqrt(7.0) / sqrt(7.0) / sqrt(7.0) AS s4),
         |pts AS (
         |  SELECT * FROM (VALUES
         |    ('equ', -20.905, 0.0), ('paris', 2.35, 48.86),
         |    ('rio', -43.2, -22.9), ('tok', 139.7, 35.7)) AS t(name, lon0, lat0)),
         |p0 AS (SELECT name, CAST(lon0 AS DOUBLE) AS lon, CAST(lat0 AS DOUBLE) AS lat FROM pts),
         |pxyz AS (
         |  SELECT name, cos(radians(lat)) * cos(radians(lon)) AS px,
         |    cos(radians(lat)) * sin(radians(lon)) AS py, sin(radians(lat)) AS pz
         |  FROM p0),
         |pf AS (
         |  SELECT p.name, p.px, p.py, p.pz, fr.f, fr.cx, fr.cy, fr.cz,
         |    fr.e1x, fr.e1y, fr.e1z, fr.e2x, fr.e2y, fr.e2z,
         |    p.px * fr.cx + p.py * fr.cy + p.pz * fr.cz AS pd,
         |    ROW_NUMBER() OVER (PARTITION BY p.name
         |      ORDER BY p.px * fr.cx + p.py * fr.cy + p.pz * fr.cz DESC, fr.f ASC) AS rn
         |  FROM pxyz p CROSS JOIN frames fr),
         |psel AS (SELECT * FROM pf WHERE rn = 1),
         |ploc AS (SELECT *, px / pd - cx AS tx, py / pd - cy AS ty, pz / pd - cz AS tz FROM psel),
         |pxy AS (SELECT *, tx * e1x + ty * e1y + tz * e1z AS lx,
         |    tx * e2x + ty * e2y + tz * e2z AS ly FROM ploc),
         |pq AS (
         |  SELECT pxy.*, sz.s4,
         |    (sqrt(3.0) / 3.0 * lx - ly / 3.0) / s4 AS qf, (2.0 / 3.0 * ly) / s4 AS rf
         |  FROM pxy CROSS JOIN sz),
         |py2 AS (SELECT *, -qf - rf AS yf FROM pq),
         |prnd AS (
         |  SELECT *, floor(qf + 0.5) AS a4, floor(yf + 0.5) AS b4, floor(rf + 0.5) AS c4r
         |  FROM py2),
         |pdx AS (
         |  SELECT *, abs(a4 - qf) AS dq, abs(b4 - yf) AS dy, abs(c4r - rf) AS dr
         |  FROM prnd),
         |pcell AS (
         |  SELECT name, f, cx, cy, cz, e1x, e1y, e1z, e2x, e2y, e2z, s4,
         |    CAST(CASE WHEN dq > dy AND dq > dr THEN -b4 - c4r ELSE a4 END AS BIGINT) AS q4,
         |    CAST(CASE WHEN dq > dy AND dq > dr THEN c4r WHEN dy > dr THEN c4r
         |         ELSE -a4 - b4 END AS BIGINT) AS r4
         |  FROM pdx),
         |ptok AS (
         |  SELECT *,
         |    (CAST(1 AS BIGINT) << 49) + 4 * (CAST(1 AS BIGINT) << 45)
         |      + f * (CAST(1 AS BIGINT) << 40) + (q4 + 524288) * (CAST(1 AS BIGINT) << 20)
         |      + (r4 + 524288) AS v4,
         |    s4 * (sqrt(3.0) * q4 + sqrt(3.0) / 2.0 * r4) AS lcx,
         |    s4 * (1.5 * r4) AS lcy
         |  FROM pcell),
         |corners AS (
         |  SELECT * FROM (VALUES (0, 1, 1), (1, 0, 2), (2, -1, 1),
         |    (3, -1, -1), (4, 0, -2), (5, 1, -1)) AS ck(ci, mx, my)),
         |cw AS (
         |  SELECT ptok.*, ck.ci,
         |    lcx + s4 * (CAST(ck.mx AS DOUBLE) * (sqrt(3.0) / 2.0)) AS ccx,
         |    lcy + s4 * (CAST(ck.my AS DOUBLE) * 0.5) AS ccy
         |  FROM ptok CROSS JOIN corners ck),
         |cxyz AS (
         |  SELECT name, v4, ci,
         |    cx + ccx * e1x + ccy * e2x AS wx,
         |    cy + ccx * e1y + ccy * e2y AS wy,
         |    cz + ccx * e1z + ccy * e2z AS wz
         |  FROM cw),
         |cll AS (
         |  SELECT name, v4, ci,
         |    degrees(atan2(wy, wx)) AS clon,
         |    degrees(atan2(wz, sqrt(wx * wx + wy * wy))) AS clat
         |  FROM cxyz)
         |SELECT c0.name, lower(to_hex(c0.v4)) AS tok4,
         |  CAST(1 AS BIGINT) AS inpt,
         |  CAST(floor(c0.clon * 1000000.0) AS BIGINT) AS c0x_u,
         |  CAST(floor(c0.clat * 1000000.0) AS BIGINT) AS c0y_u,
         |  CAST(floor(c3.clon * 1000000.0) AS BIGINT) AS c3x_u,
         |  CAST(floor(c3.clat * 1000000.0) AS BIGINT) AS c3y_u,
         |  CAST(1 AS BIGINT) AS closed
         |FROM cll c0 JOIN cll c3 ON c3.name = c0.name AND c3.ci = 3
         |WHERE c0.ci = 0
         |ORDER BY c0.name ASC""".stripMargin,
    // Cube-threshold formulation: equal to the verb's level-wise
    // Apriori because support is anti-monotone (any frequent pattern
    // has every sub-pattern frequent), so the frequent-itemset family
    // IS the over-threshold cube cells. Attributes stringify BEFORE
    // mining, mirroring the verb.
    "kql_basket" ->
      """WITH src AS (
        |  SELECT event_type,
        |    CAST(CAST(floor(("value" - ((("value" % 200) + 200) % 200)) + 0.5) AS BIGINT) AS VARCHAR) AS vband,
        |    CAST("value" >= 400 AS VARCHAR) AS hot
        |  FROM events),
        |cells AS (
        |  SELECT event_type, vband, hot, COUNT(*) AS n,
        |    GROUPING(event_type, vband, hot) AS g
        |  FROM src GROUP BY CUBE(event_type, vband, hot)),
        |tot AS (SELECT n AS total FROM cells WHERE g = 7)
        |SELECT event_type, vband, hot, CAST(n AS BIGINT) AS n,
        |  CAST((1000000 * n) // total AS DOUBLE) / 1000000.0 AS pct
        |FROM cells, tot
        |WHERE g <> 7 AND (1000000 * n) // total >= 50000
        |ORDER BY n DESC, event_type ASC NULLS FIRST,
        |  vband ASC NULLS FIRST, hot ASC NULLS FIRST""".stripMargin,
    "kql_diffpatterns" ->
      s"""${Sql.ordersInfoCte},
         |base AS (
         |  SELECT city,
         |    CASE WHEN orderid % 2 = 0 THEN 'even' ELSE 'odd' END AS pay,
         |    CASE WHEN amount >= 150 THEN 'high' ELSE 'low' END AS tier
         |  FROM orders_info),
         |cells AS (
         |  SELECT city, pay,
         |    COUNT(*) FILTER (WHERE tier = 'high') AS count_a,
         |    COUNT(*) FILTER (WHERE tier = 'low') AS count_b,
         |    GROUPING(city, pay) AS g
         |  FROM base WHERE tier IN ('high', 'low') GROUP BY CUBE(city, pay)),
         |tot AS (SELECT count_a AS ta, count_b AS tb FROM cells WHERE g = 3),
         |m AS (
         |  SELECT city, pay, count_a, count_b, g,
         |    count_a * 100000000 // GREATEST(ta, 1) AS ma,
         |    count_b * 100000000 // GREATEST(tb, 1) AS mb
         |  FROM cells CROSS JOIN tot)
         |SELECT city, pay,
         |  CAST(count_a AS BIGINT) AS count_a, CAST(count_b AS BIGINT) AS count_b,
         |  CAST(ma AS DOUBLE) / 1000000 AS percent_a,
         |  CAST(mb AS DOUBLE) / 1000000 AS percent_b,
         |  CAST(ABS(ma - mb) AS DOUBLE) / 1000000 AS percent_diff
         |FROM m WHERE g <> 3 AND ABS(ma - mb) >= 500000""".stripMargin,
    "kql_sliding_window" ->
      """WITH ev AS (
        |  SELECT user_id, (epoch_ns(ts) // 1000000000) AS t FROM events),
        |r AS (
        |  SELECT user_id,
        |    (GREATEST(t, 1704844800) - 1704844800 + 86400 - 1) // 86400 AS klo,
        |    LEAST(10, (t + 259200 - 1704844800 - 1) // 86400) AS khi
        |  FROM ev WHERE t <= 1705708800 AND t > 1704844800 - 259200),
        |x AS (
        |  SELECT user_id, unnest(range(klo, khi + 1)) AS k
        |  FROM r WHERE klo <= khi)
        |SELECT (1704844800 + k * 86400) * 1000 AS bin_ms,
        |  CAST(COUNT(*) AS BIGINT) AS "Count",
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS "Dcount"
        |FROM x GROUP BY 1 ORDER BY 1 ASC""".stripMargin,
    "kql_percentilew" ->
      """WITH w AS (
        |  SELECT event_type, value AS v,
        |    CAST(user_id % 5 + 1 AS INTEGER) AS wgt
        |  FROM events),
        |x AS (SELECT event_type, v FROM w, LATERAL (SELECT unnest(range(wgt)) AS r) r)
        |SELECT event_type, round(quantile_cont(v, 0.90), 6) AS p90w,
        |  round(quantile_cont(v, 0.50), 6) AS p50a,
        |  round(quantile_cont(v, 0.90), 6) AS p90a
        |FROM x GROUP BY event_type ORDER BY event_type ASC""".stripMargin,
    "kql_series_similarity" ->
      """WITH f AS (
        |  SELECT event_type,
        |    CAST((epoch_ns(ts) // 1000000000
        |      - CAST(epoch(TIMESTAMP '2024-01-01') AS BIGINT)) // 86400 AS INT) AS i
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31'),
        |g AS (SELECT event_type, i, COUNT(*) AS c FROM f GROUP BY 1, 2),
        |k AS (SELECT DISTINCT event_type FROM f),
        |axis AS (SELECT CAST(unnest(range(0, 30)) AS INT) AS i),
        |dense AS (
        |  SELECT k.event_type, a.i, CAST(COALESCE(g.c, 0) AS DOUBLE) AS v
        |  FROM k CROSS JOIN axis a
        |  LEFT JOIN g ON g.event_type = k.event_type AND g.i = a.i),
        |p AS (
        |  SELECT x.event_type AS et_a, y.event_type AS et_b,
        |    SUM(x.v * y.v) AS sxy, SUM(x.v) AS sx, SUM(y.v) AS sy,
        |    SUM(x.v * x.v) AS sxx, SUM(y.v * y.v) AS syy,
        |    CAST(COUNT(*) AS DOUBLE) AS n
        |  FROM dense x JOIN dense y ON x.i = y.i AND x.event_type < y.event_type
        |  GROUP BY 1, 2)
        |SELECT et_a, et_b,
        |  sxy AS dot,
        |  CAST(floor(sxy / (sqrt(sxx) * sqrt(syy)) * 1000000.0) AS BIGINT) AS cos_u,
        |  CAST(floor((n * sxy - sx * sy)
        |    / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) * 1000000.0) AS BIGINT) AS r_u,
        |  CAST(floor(sqrt(sxx) * 1000000.0) AS BIGINT) AS mag_u
        |FROM p ORDER BY et_a, et_b""".stripMargin,
    "kql_make_series_multi" ->
      """WITH f AS (
        |  SELECT event_type,
        |    CAST((epoch_ns(ts) // 1000000000
        |      - CAST(epoch(TIMESTAMP '2024-01-01') AS BIGINT)) // 86400 AS INT) AS i,
        |    user_id, value
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-03'
        |    AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-10'),
        |g AS (
        |  SELECT event_type, i, COUNT(*) AS c,
        |    CAST(SUM(user_id) AS BIGINT) AS s, MAX(value) AS m
        |  FROM f GROUP BY 1, 2),
        |k AS (SELECT DISTINCT event_type FROM f),
        |axis AS (SELECT CAST(unnest(range(0, 9)) AS INT) AS i),
        |dense AS (
        |  SELECT k.event_type, a.i,
        |    COALESCE(g.c, 0) AS c, COALESCE(g.s, -1) AS s,
        |    COALESCE(g.m, -1) AS m
        |  FROM k CROSS JOIN axis a
        |  LEFT JOIN g ON g.event_type = k.event_type AND g.i = a.i)
        |SELECT event_type,
        |  string_agg(CAST(c AS VARCHAR), ',' ORDER BY i) AS cs,
        |  string_agg(CAST(s AS VARCHAR), ',' ORDER BY i) AS ss,
        |  string_agg(CAST(CAST(floor(m * 1000000.0) AS BIGINT) AS VARCHAR), ',' ORDER BY i) AS ms
        |FROM dense GROUP BY event_type ORDER BY event_type ASC""".stripMargin,
    "kql_series_unary" ->
      """WITH f AS (
        |  SELECT event_type,
        |    CAST((epoch_ns(ts) // 1000000000
        |      - CAST(epoch(TIMESTAMP '2024-01-01') AS BIGINT)) // 86400 AS INT) AS i,
        |    user_id
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-10'),
        |g AS (SELECT event_type, i, COUNT(*) AS c,
        |        CAST(SUM(user_id) AS BIGINT) AS s FROM f GROUP BY 1, 2),
        |k AS (SELECT DISTINCT event_type FROM f),
        |axis AS (SELECT CAST(unnest(range(0, 9)) AS INT) AS i),
        |dense AS (
        |  SELECT k.event_type, a.i, COALESCE(g.c, 0) AS c, COALESCE(g.s, -1) AS s
        |  FROM k CROSS JOIN axis a
        |  LEFT JOIN g ON g.event_type = k.event_type AND g.i = a.i),
        |e1 AS (SELECT event_type, i, c, s, 2 * c + 1 AS den,
        |         s / (2 * c + 1) AS h FROM dense),
        |e2 AS (SELECT *, floor(h) AS fl, ceil(h) AS ce,
        |         CASE WHEN h >= 0 THEN floor(h + 0.5) ELSE -floor(-h + 0.5) END AS rd
        |       FROM e1),
        |e3 AS (SELECT *,
        |         CASE WHEN h - rd > 0 THEN 1 WHEN h - rd < 0 THEN -1 ELSE 0 END AS sg
        |       FROM e2)
        |SELECT event_type,
        |  string_agg(CAST(CAST(fl AS BIGINT) AS VARCHAR), ',' ORDER BY i) AS fls,
        |  string_agg(CAST(CAST(ce AS BIGINT) AS VARCHAR), ',' ORDER BY i) AS ces,
        |  string_agg(CAST(CAST(rd AS BIGINT) AS VARCHAR), ',' ORDER BY i) AS rds,
        |  string_agg(CAST(sg AS VARCHAR), ',' ORDER BY i) AS sgs,
        |  string_agg(CAST(CAST(power(CAST(den AS DOUBLE), CAST(abs(sg) AS DOUBLE)) AS BIGINT) AS VARCHAR), ',' ORDER BY i) AS pws,
        |  string_agg(CAST(CAST(floor(abs(h) * 1000000.0) AS BIGINT) AS VARCHAR), ',' ORDER BY i) AS abs_u,
        |  string_agg(CAST(CAST(floor(ln(CAST(den AS DOUBLE)) * 1000000.0) AS BIGINT) AS VARCHAR), ',' ORDER BY i) AS lgs_u,
        |  string_agg(CAST(CAST(floor(exp(CAST(sg AS DOUBLE)) * 1000000.0) AS BIGINT) AS VARCHAR), ',' ORDER BY i) AS exs_u,
        |  string_agg(CAST(s > c AS VARCHAR), ',' ORDER BY i) AS gts,
        |  string_agg(CAST(s >= c AS VARCHAR), ',' ORDER BY i) AS ges,
        |  string_agg(CAST(s < c AS VARCHAR), ',' ORDER BY i) AS lts,
        |  string_agg(CAST(fl <= ce AS VARCHAR), ',' ORDER BY i) AS les,
        |  string_agg(CAST(rd = fl AS VARCHAR), ',' ORDER BY i) AS eqs,
        |  string_agg(CAST(rd <> ce AS VARCHAR), ',' ORDER BY i) AS nes
        |FROM e3 GROUP BY event_type""".stripMargin,
    "kql_array_ops" ->
      """WITH t AS (
        |  SELECT i, [i, i + 1, i + 2, i * 2] AS a, [i + 1, CAST(4 AS BIGINT)] AS b
        |  FROM (SELECT unnest(range(1, 4)) AS i))
        |SELECT i,
        |  array_to_string(list_sort(list_distinct(a || b)), ',') AS u,
        |  array_to_string(list_sort(list_distinct(list_filter(a, x -> list_contains(b, x)))), ',') AS it,
        |  array_to_string(list_sort(list_distinct(list_filter(a, x -> NOT list_contains(b, x)))), ',') AS df,
        |  array_to_string([a[2], a[3], a[4], a[1]], ',') AS rl,
        |  array_to_string([a[2], a[3], a[4], CAST(0 AS BIGINT)], ',') AS sl,
        |  array_to_string([a[2], a[3]], ',') AS sc,
        |  list_contains(a, 4) AS he
        |FROM t ORDER BY i ASC""".stripMargin,
    "kql_percentiles_arr" ->
      """WITH c AS (
        |  SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events)
        |SELECT event_type,
        |  array_to_string(list_transform(quantile_cont(cents, [0.25, 0.5, 0.75]),
        |    x -> CAST(CAST(x * 10000.0 AS BIGINT) AS VARCHAR)), ',') AS quartiles
        |FROM c GROUP BY event_type ORDER BY event_type ASC""".stripMargin,
    "kql_series_filters" ->
      """WITH RECURSIVE f AS (
        |  SELECT event_type,
        |    CAST((epoch_ns(ts) // 1000000000
        |      - CAST(epoch(TIMESTAMP '2024-01-01') AS BIGINT)) // 86400 AS INT) AS i
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31'),
        |g AS (SELECT event_type, i, COUNT(*) AS c FROM f GROUP BY 1, 2),
        |k AS (SELECT DISTINCT event_type FROM f),
        |axis AS (SELECT CAST(unnest(range(0, 30)) AS INT) AS i),
        |dense AS (
        |  SELECT k.event_type, a.i, CAST(COALESCE(g.c, 0) AS DOUBLE) AS x
        |  FROM k CROSS JOIN axis a
        |  LEFT JOIN g ON g.event_type = k.event_type AND g.i = a.i),
        |arr AS (SELECT event_type, list(x ORDER BY i) AS xs FROM dense GROUP BY 1),
        |fir AS (
        |  SELECT event_type,
        |    list_transform(range(0, 30), i ->
        |      list_sum(list_transform(range(0, 3), j ->
        |        CASE WHEN i - j >= 0 THEN 1.0 * xs[i - j + 1] ELSE 0.0 END)) / 3.0) AS fs
        |  FROM arr),
        |rec(event_type, i, y) AS (
        |  SELECT event_type, 0, (0.5 * xs[1] - 0.0) / 1.0 FROM arr
        |  UNION ALL
        |  SELECT a.event_type, r.i + 1, (0.5 * a.xs[r.i + 2] - ((-0.5) * r.y)) / 1.0
        |  FROM rec r JOIN arr a USING (event_type) WHERE r.i + 1 < 30),
        |firs AS (
        |  SELECT event_type, array_to_string(list_transform(fs,
        |    v -> CAST(CAST(floor(v * 1000000.0) AS BIGINT) AS VARCHAR)), ',') AS firs
        |  FROM fir),
        |emas AS (
        |  SELECT event_type, string_agg(CAST(CAST(floor(y * 1000000.0) AS BIGINT) AS VARCHAR),
        |    ',' ORDER BY i) AS emas
        |  FROM rec GROUP BY 1)
        |SELECT k.event_type, firs.firs, emas.emas
        |FROM k JOIN firs USING (event_type) JOIN emas USING (event_type)
        |ORDER BY event_type ASC""".stripMargin,
    "kql_string_ops_cs" ->
      """WITH t AS (
        |  SELECT * FROM (VALUES ('Spark rocks'), ('spark rocks'), ('reSpark'),
        |    ('GPU go'), ('gpu go'), ('xGPUy')) AS v(s))
        |SELECT s,
        |  contains(s, 'Spark') AS c_cs,
        |  contains(lower(s), 'spark') AS c_ci,
        |  regexp_matches(s, '(^|[^A-Za-z0-9])GPU([^A-Za-z0-9]|$)') AS h_cs,
        |  regexp_matches(lower(s), '(^|[^a-z0-9])gpu([^a-z0-9]|$)') AS h_ci,
        |  regexp_matches(s, '^[a-z]+ ') AS m,
        |  lower(s) IN ('spark rocks', 'gpu go') AS i1,
        |  lower(s) NOT IN ('respark') AS i2
        |FROM t ORDER BY s ASC""".stripMargin,
    "kql_ipv4_lookup" ->
      """WITH z AS (
        |  SELECT user_id,
        |    CASE WHEN user_id % 4 = 1 AND user_id % 250 >= 128 THEN 'dc1hi'
        |         WHEN user_id % 4 = 1 THEN 'dc1'
        |         WHEN user_id % 4 = 2 THEN 'dc2'
        |         ELSE 'corp' END AS zone
        |  FROM events)
        |SELECT zone, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
        |FROM z GROUP BY zone ORDER BY zone ASC""".stripMargin,
    "kql_session_count" ->
      """WITH ev AS (
        |  SELECT user_id AS id, epoch_ns(ts) // 1000000000 AS t FROM events),
        |f AS (SELECT id, t FROM ev WHERE t <= 1706140800 AND t > 1704412800 - 86400),
        |l AS (SELECT id, t, lag(t) OVER (PARTITION BY id ORDER BY t) AS prev FROM f),
        |s AS (SELECT t FROM l WHERE t >= 1704412800 AND (prev IS NULL OR t - prev > 86400))
        |SELECT (1704412800 + ((t - 1704412800) // 86400) * 86400) * 1000 AS bin_ms,
        |  CAST(COUNT(*) AS BIGINT) AS session_count
        |FROM s GROUP BY 1 ORDER BY 1 ASC""".stripMargin,
    "kql_find" ->
      """SELECT * FROM (
        |  SELECT 'A' AS source_, CAST(id AS BIGINT) AS id, city,
        |    CAST(amount AS BIGINT) AS amount, CAST(NULL AS VARCHAR) AS who
        |  FROM (VALUES (1, 'Austin', 100), (2, 'Seattle', 200), (3, 'Austin', 300))
        |    AS a(id, city, amount)
        |  WHERE city = 'Austin'
        |  UNION ALL
        |  SELECT 'B', CAST(id AS BIGINT), city, CAST(NULL AS BIGINT), who
        |  FROM (VALUES (7, 'Austin', 'ann'), (8, 'Boston', 'bob')) AS b(id, city, who)
        |  WHERE city = 'Austin')
        |ORDER BY source_ ASC, id ASC""".stripMargin,
    "kql_funnel_completion" ->
      """WITH ev AS (
        |  SELECT user_id AS id, epoch_ns(ts) // 1000000000 AS t, event_type FROM events),
        |s0 AS (
        |  SELECT id, MIN(t) AS t0 FROM ev
        |  WHERE event_type = 'view' AND t >= 1704067200 AND t <= 1706486400 GROUP BY id),
        |s1 AS (
        |  SELECT e.id, s0.t0, MIN(e.t) AS t1
        |  FROM ev e JOIN s0 ON e.id = s0.id
        |  WHERE e.event_type = 'click' AND e.t > s0.t0 AND e.t <= s0.t0 + 604800
        |    AND e.t <= 1706486400
        |  GROUP BY 1, 2),
        |s2 AS (
        |  SELECT e.id, s1.t0, MIN(e.t) AS t2
        |  FROM ev e JOIN s1 ON e.id = s1.id
        |  WHERE e.event_type = 'purchase' AND e.t > s1.t1 AND e.t <= s1.t1 + 604800
        |    AND e.t <= 1706486400
        |  GROUP BY 1, 2)
        |SELECT (1704067200 + ((t0 - 1704067200) // 604800) * 604800) * 1000 AS bin_ms,
        |  CAST(1 AS INTEGER) AS prefix, CAST(COUNT(*) AS BIGINT) AS n_ids
        |FROM s0 GROUP BY 1
        |UNION ALL
        |SELECT (1704067200 + ((t0 - 1704067200) // 604800) * 604800) * 1000,
        |  CAST(2 AS INTEGER), CAST(COUNT(*) AS BIGINT) FROM s1 GROUP BY 1
        |UNION ALL
        |SELECT (1704067200 + ((t0 - 1704067200) // 604800) * 604800) * 1000,
        |  CAST(3 AS INTEGER), CAST(COUNT(*) AS BIGINT) FROM s2 GROUP BY 1
        |ORDER BY prefix ASC, bin_ms ASC""".stripMargin,
    "kql_sequence_detect" ->
      """WITH ev AS (
        |  SELECT user_id AS id, epoch_ns(ts) // 1000000000 AS t, event_type FROM events),
        |s0 AS (
        |  SELECT id, MIN(t) AS t0 FROM ev WHERE event_type = 'view' GROUP BY id),
        |s1 AS (
        |  SELECT e.id, s0.t0, MIN(e.t) AS t1
        |  FROM ev e JOIN s0 ON e.id = s0.id
        |  WHERE e.event_type = 'click' AND e.t > s0.t0 AND e.t <= s0.t0 + 604800
        |  GROUP BY 1, 2),
        |s2 AS (
        |  SELECT e.id, s1.t0, s1.t1, MIN(e.t) AS t2
        |  FROM ev e JOIN s1 ON e.id = s1.id
        |  WHERE e.event_type = 'purchase' AND e.t > s1.t1 AND e.t <= s1.t1 + 604800
        |  GROUP BY 1, 2, 3)
        |SELECT id AS user_id, t0 * 1000 AS is_view_ms, t1 * 1000 AS is_click_ms,
        |  t2 * 1000 AS is_buy_ms
        |FROM s2 WHERE t2 - t0 <= 1209600 ORDER BY user_id ASC""".stripMargin,
    "kql_active_users" ->
      """WITH ev AS (
        |  SELECT user_id AS id, epoch_ns(ts) // 1000000000 AS t FROM events),
        |bins AS (SELECT unnest(range(0, 11)) AS k),
        |w AS (
        |  SELECT b.k, e.id, COUNT(DISTINCT e.t // 86400) AS np
        |  FROM bins b JOIN ev e
        |    ON e.t <= (1704844800 + b.k * 86400)
        |   AND e.t > (1704844800 + b.k * 86400) - 259200
        |  GROUP BY 1, 2)
        |SELECT (1704844800 + k * 86400) * 1000 AS bin_ms,
        |  CAST(COUNT(DISTINCT id) AS BIGINT) AS dcount
        |FROM w WHERE np >= 3 GROUP BY 1 ORDER BY 1 ASC""".stripMargin,
    "kql_parse_url" ->
      """WITH u AS (
        |  SELECT * FROM (VALUES
        |    ('https://user:pw@example.com:8080/a/b/file.txt?x=1&y=%20z#frag'),
        |    ('http://example.org/index.html?x=hello+world'),
        |    ('https://h.io/p/q?x=v&k=1#s')) AS t(url)),
        |c AS (
        |  SELECT url,
        |    regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
        |    regexp_extract(url, '^[a-z]+://([^/?#]*)', 1) AS auth,
        |    regexp_extract(url, '^[a-z]+://[^/?#]*([^?#]*)', 1) AS path,
        |    regexp_extract(url, '\?([^#]*)', 1) AS query,
        |    regexp_extract(url, '#(.*)$', 1) AS frag
        |  FROM u),
        |d AS (
        |  SELECT *, regexp_extract(auth, '^([^@]*)@', 1) AS userinfo FROM c)
        |SELECT url, scheme,
        |  regexp_extract(auth, '^(?:[^@]*@)?([^:]*)', 1) AS host,
        |  regexp_extract(auth, ':([0-9]+)$', 1) AS port,
        |  path,
        |  regexp_extract(userinfo, '^([^:]*)', 1) AS "user",
        |  regexp_extract(userinfo, ':(.*)$', 1) AS pw,
        |  frag,
        |  nullif(regexp_extract('&' || query, '&x=([^&]*)', 1), '') AS qx,
        |  nullif(regexp_extract('&' || query, '&x=([^&]*)', 1), '') AS qx2,
        |  replace(replace(nullif(regexp_extract('&' || query, '&y=([^&]*)', 1), ''),
        |    '+', ' '), '%20', ' ') AS decy,
        |  replace(path, '/', '%2f') AS enc -- r15: url_encode is now
        |  -- the KQL-level fold (ADX's LOWERCASE hex), no longer
        |  -- Spark's pass-through built-in (uppercase)
        |FROM d ORDER BY url ASC""".stripMargin,
    // Every regexp_extract is COALESCE-pinned to '': no-match returns
    // '' on some DuckDB versions and NULL on others (the r10 hash-fail
    // hazard); Spark's regexp_extract always yields ''. ver is the
    // STRING rendering of the DECIMAL(38,0) packing for the same
    // reason (HUGEINT/DECIMAL render differences across versions).
    "kql_parse_path_version" ->
      """WITH p AS (
        |  SELECT * FROM (VALUES
        |    ('/a/b/c/file.tar.gz', '1.2.3.4'),
        |    ('C:\dir\sub\name.txt', '10.0'),
        |    ('noslash', '1.2.3.4.5'),
        |    ('/root/x.y/z', '0.0.0.0')) AS t(p, v)),
        |d AS (
        |  SELECT p, v,
        |    COALESCE(regexp_extract(p, '^(.*)[/\\][^/\\]*$', 1), '') AS dir,
        |    string_split(v, '.') AS vo
        |  FROM p)
        |SELECT p,
        |  COALESCE(regexp_extract(p, '^([A-Za-z]:|/)', 1), '') AS root,
        |  dir,
        |  COALESCE(regexp_extract(dir, '([^/\\]*)$', 1), '') AS dname,
        |  COALESCE(regexp_extract(p, '([^/\\]*)$', 1), '') AS fname,
        |  COALESCE(regexp_extract(p, '\.([^./\\]*)$', 1), '') AS ext,
        |  CASE WHEN regexp_matches(v, '^[0-9]{1,8}(\.[0-9]{1,8}){0,3}$') THEN
        |    CAST(CAST(((COALESCE(TRY_CAST(vo[1] AS HUGEINT), 0) * 100000000
        |      + COALESCE(TRY_CAST(vo[2] AS BIGINT), 0)) * 100000000
        |      + COALESCE(TRY_CAST(vo[3] AS BIGINT), 0)) * 100000000
        |      + COALESCE(TRY_CAST(vo[4] AS BIGINT), 0) AS DECIMAL(38,0)) AS VARCHAR)
        |  ELSE NULL END AS ver
        |FROM d ORDER BY p ASC""".stripMargin,
    "kql_ipv4" ->
      """WITH base AS (
        |  SELECT * FROM (VALUES
        |    ('10.0.0.1', '10.0.0.0/8'),
        |    ('172.16.5.4', '172.16.0.0/12'),
        |    ('172.32.0.1', '172.16.0.0/12'),
        |    ('192.168.9.9', '192.168.0.0/16'),
        |    ('192.169.0.1', '192.168.0.0/16'),
        |    ('8.8.8.8', '8.8.8.0/24'),
        |    ('255.255.255.255', '0.0.0.0/0'),
        |    ('256.1.1.1', '10.0.0.0/8'),
        |    ('not-an-ip', '10.0.0.0/8')) AS t(ip, cidr)),
        |oct AS (SELECT ip, cidr, string_split(ip, '.') AS o FROM base),
        |lng AS (
        |  SELECT ip, cidr,
        |    CASE WHEN len(o) = 4
        |      AND TRY_CAST(o[1] AS BIGINT) BETWEEN 0 AND 255
        |      AND TRY_CAST(o[2] AS BIGINT) BETWEEN 0 AND 255
        |      AND TRY_CAST(o[3] AS BIGINT) BETWEEN 0 AND 255
        |      AND TRY_CAST(o[4] AS BIGINT) BETWEEN 0 AND 255
        |    THEN TRY_CAST(o[1] AS BIGINT) * 16777216 + TRY_CAST(o[2] AS BIGINT) * 65536
        |       + TRY_CAST(o[3] AS BIGINT) * 256 + TRY_CAST(o[4] AS BIGINT)
        |    ELSE NULL END AS ipl
        |  FROM oct),
        |cid AS (
        |  SELECT ip, cidr, ipl,
        |    string_split(CASE WHEN instr(cidr, '/') > 0
        |      THEN substr(cidr, 1, instr(cidr, '/') - 1) ELSE cidr END, '.') AS co,
        |    CASE WHEN instr(cidr, '/') > 0
        |      THEN TRY_CAST(substr(cidr, instr(cidr, '/') + 1) AS INT) ELSE 32 END AS sfx
        |  FROM lng),
        |fin AS (
        |  SELECT ip, ipl, sfx,
        |    TRY_CAST(co[1] AS BIGINT) * 16777216 + TRY_CAST(co[2] AS BIGINT) * 65536
        |      + TRY_CAST(co[3] AS BIGINT) * 256 + TRY_CAST(co[4] AS BIGINT) AS cl
        |  FROM cid)
        |SELECT ip, ipl,
        |  (ipl >> 12) << 12 AS masked,
        |  (ipl >> (32 - sfx)) = (cl >> (32 - sfx)) AS inr,
        |  (ipl BETWEEN 167772160 AND 184549375)
        |    OR (ipl BETWEEN 2886729728 AND 2887778303)
        |    OR (ipl BETWEEN 3232235520 AND 3232301055) AS priv,
        |  CAST(sign(ipl - 2886731012) AS INT) AS cmp,
        |  sfx,
        |  CASE WHEN ipl BETWEEN 0 AND 4294967295 THEN concat(
        |    CAST((ipl >> 24) & 255 AS VARCHAR), '.', CAST((ipl >> 16) & 255 AS VARCHAR),
        |    '.', CAST((ipl >> 8) & 255 AS VARCHAR), '.', CAST(ipl & 255 AS VARCHAR))
        |  ELSE NULL END AS fmt
        |FROM fin ORDER BY ip ASC""".stripMargin,
    "kql_new_activity" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id AS id,
        |    ((epoch_ns(ts) // 1000000000) - 1704067200) // 259200 AS k
        |  FROM events
        |  WHERE (epoch_ns(ts) // 1000000000) BETWEEN 1704067200 AND 1705276800),
        |coh AS (SELECT id, MIN(k) AS c FROM act GROUP BY id),
        |sz AS (SELECT c, COUNT(*) AS cohort_size FROM coh GROUP BY c),
        |r AS (
        |  SELECT coh.c, act.k, COUNT(*) AS retained_dcount
        |  FROM act JOIN coh ON act.id = coh.id
        |  GROUP BY coh.c, act.k)
        |SELECT (1704067200 + r.c * 259200) * 1000 AS cohort_ms,
        |  (1704067200 + r.k * 259200) * 1000 AS bin_ms,
        |  CAST(sz.cohort_size AS BIGINT) AS cohort_size,
        |  CAST(r.retained_dcount AS BIGINT) AS retained_dcount,
        |  CAST(r.retained_dcount AS DOUBLE) / sz.cohort_size AS retention_ratio
        |FROM r JOIN sz ON r.c = sz.c
        |ORDER BY cohort_ms ASC, bin_ms ASC""".stripMargin,
    "kql_fork" ->
      s"""${Sql.ordersInfoCte}
         |SELECT 'hi' AS fork_leg, city, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(amount) AS BIGINT) AS total
         |FROM orders_info WHERE amount >= 150 GROUP BY city
         |UNION ALL
         |SELECT 'lo' AS fork_leg, city, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(amount) AS BIGINT) AS total
         |FROM orders_info WHERE amount < 150 GROUP BY city
         |ORDER BY fork_leg ASC, city ASC""".stripMargin,
    "kql_activity_counts" ->
      """WITH ev AS (
        |  SELECT user_id AS id, (epoch_ns(ts) // 1000000000) AS t FROM events
        |  WHERE (epoch_ns(ts) // 1000000000) BETWEEN 1704844800 AND 1705276800),
        |b AS (SELECT id, (t - 1704844800) // 86400 AS k FROM ev),
        |per AS (SELECT k, COUNT(*) AS cnt, COUNT(DISTINCT id) AS dc
        |        FROM b GROUP BY k),
        |fs AS (SELECT MIN(k) AS k FROM b GROUP BY id),
        |nd AS (SELECT k, COUNT(*) AS newd FROM fs GROUP BY k)
        |SELECT (1704844800 + per.k * 86400) * 1000 AS bin_ms,
        |  CAST(cnt AS BIGINT) AS "count", CAST(dc AS BIGINT) AS "dcount",
        |  CAST(COALESCE(newd, 0) AS BIGINT) AS new_dcount,
        |  CAST(SUM(COALESCE(newd, 0)) OVER (ORDER BY per.k) AS BIGINT)
        |    AS aggregated_dcount
        |FROM per LEFT JOIN nd ON per.k = nd.k ORDER BY bin_ms ASC""".stripMargin,
    "kql_rolling_percentile" ->
      """WITH ev AS (
        |  SELECT value AS v, (epoch_ns(ts) // 1000000000) AS t FROM events),
        |r AS (
        |  SELECT v, unnest(range(
        |    (GREATEST(t, 1704844800) - 1704844800 + 86400 - 1) // 86400,
        |    LEAST(5, (t + 259200 - 1704844800 - 1) // 86400) + 1)) AS k
        |  FROM ev WHERE t <= 1705276800 AND t > 1704844800 - 259200)
        |SELECT (1704844800 + k * 86400) * 1000 AS bin_ms,
        |  round(quantile_cont(v, 0.90), 6) AS rolling_percentile
        |FROM r GROUP BY 1 ORDER BY 1 ASC""".stripMargin,
    "kql_funnel_sequence" ->
      """WITH ev AS (
        |  SELECT user_id AS id, (epoch_ns(ts) // 1000) AS tu,
        |    (epoch_ns(ts) // 1000000000) AS t, event_type AS st
        |  FROM events
        |  WHERE (epoch_ns(ts) // 1000000000) BETWEEN 1704067200 AND 1706659200),
        |w AS (
        |  SELECT id, tu, st, t,
        |    LAG(st, 1) OVER ord AS prev,
        |    LEAD(st, 2) OVER ord AS next,
        |    LEAD(st, 1) OVER ord AS s1,
        |    LEAD(t, 1) OVER ord AS t1
        |  FROM ev WINDOW ord AS (PARTITION BY id ORDER BY tu ASC, st ASC)),
        |m AS (
        |  SELECT id, prev, next,
        |    ROW_NUMBER() OVER (PARTITION BY id ORDER BY tu ASC, st ASC) AS rn
        |  FROM w WHERE st = 'view' AND s1 = 'click' AND t1 - t <= 3600),
        |f AS (SELECT id, prev, next FROM m WHERE rn = 1),
        |u AS (
        |  SELECT id, 'prev' AS kind, prev AS state FROM f
        |  UNION ALL SELECT id, 'next' AS kind, next AS state FROM f)
        |SELECT kind, state, CAST(COUNT(DISTINCT id) AS BIGINT) AS dcount_users
        |FROM u GROUP BY kind, state ORDER BY kind ASC, state ASC""".stripMargin,
    "kql_reduce" ->
      """WITH t AS (
        |  SELECT event_type || '#' ||
        |    CAST(CAST(value - ((value % 1 + 1) % 1) AS BIGINT) AS VARCHAR) AS tag
        |  FROM events)
        |SELECT regexp_replace(tag, '[0-9]+', '*', 'g') AS "Pattern",
        |  CAST(COUNT(*) AS BIGINT) AS "Count",
        |  MIN(tag) AS "Representative"
        |FROM t GROUP BY 1 ORDER BY 1 ASC""".stripMargin,
    "kql_activity_engagement" ->
      """WITH ev AS (
        |  SELECT user_id, (epoch_ns(ts) // 1000000000) AS t FROM events),
        |fi AS (
        |  SELECT user_id, unnest(range(
        |    (GREATEST(t, 1704844800) - 1704844800 + 86400 - 1) // 86400,
        |    LEAST(10, (t + 86400 - 1704844800 - 1) // 86400) + 1)) AS k
        |  FROM ev WHERE t <= 1705708800 AND t > 1704844800 - 86400),
        |fo AS (
        |  SELECT user_id, unnest(range(
        |    (GREATEST(t, 1704844800) - 1704844800 + 86400 - 1) // 86400,
        |    LEAST(10, (t + 604800 - 1704844800 - 1) // 86400) + 1)) AS k
        |  FROM ev WHERE t <= 1705708800 AND t > 1704844800 - 604800),
        |i AS (SELECT k, COUNT(DISTINCT user_id) AS di FROM fi GROUP BY k),
        |o AS (SELECT k, COUNT(DISTINCT user_id) AS do_ FROM fo GROUP BY k)
        |SELECT (1704844800 + o.k * 86400) * 1000 AS bin_ms,
        |  CAST(COALESCE(i.di, 0) AS BIGINT) AS dcount_activities_inner,
        |  CAST(o.do_ AS BIGINT) AS dcount_activities_outer,
        |  CAST(COALESCE(i.di, 0) AS DOUBLE) / o.do_ AS activity_ratio
        |FROM o LEFT JOIN i ON o.k = i.k ORDER BY bin_ms ASC""".stripMargin,
    "kql_as_union" ->
      s"""${Sql.ordersInfoCte}
         |SELECT src, n, total FROM (
         |  SELECT 'Orders' AS src, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(amount) AS BIGINT) AS total
         |  FROM orders_info WHERE amount >= 150
         |  UNION ALL
         |  SELECT 'AllOrders' AS src, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(amount) AS BIGINT) AS total
         |  FROM orders_info)
         |ORDER BY src ASC""".stripMargin,
    "kql_datetime_parts" ->
      """WITH t AS (SELECT CAST(ts AS TIMESTAMP) AS tsu FROM events)
        |SELECT
        |  epoch_ms(date_trunc('day', tsu) - to_days(CAST(dayofweek(tsu) AS INT))) AS sow,
        |  epoch_ms(date_trunc('day', tsu) + to_days(1) - INTERVAL 1 MICROSECOND) AS eod,
        |  epoch_ms(date_trunc('month', tsu) + INTERVAL 1 MONTH - INTERVAL 1 MICROSECOND) AS eom,
        |  CAST(dayofweek(tsu) AS INT) AS dw,
        |  CAST(weekofyear(tsu) AS INT) AS wy,
        |  CAST(hour(tsu) AS INT) AS hh,
        |  CAST(month(tsu) AS INT) AS mo,
        |  CAST(year(tsu) AS INT) AS yy,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM t GROUP BY 1, 2, 3, 4, 5, 6, 7, 8
        |ORDER BY sow ASC, eod ASC, hh ASC""".stripMargin,
    "kql_string_funcs" ->
      s"""${Sql.ordersInfoCte}
         |SELECT substr(city, 1, 3) AS head3, substr(city, 5) AS tail,
         |  CAST(instr(city, 'e') - 1 AS INTEGER) AS pos,
         |  CAST(CASE WHEN instr(substr(city, 3), 'e') = 0 THEN -1
         |            ELSE instr(substr(city, 3), 'e') + 1 END AS INTEGER) AS pos2,
         |  substr(city, 1, 2) || '-' || substr(city, 1, 2) AS rep,
         |  base64(encode(city)) AS b64,
         |  city AS rt,
         |  CAST(COUNT(*) AS BIGINT) AS n
         |FROM orders_info GROUP BY 1, 2, 3, 4, 5, 6, 7
         |ORDER BY head3 ASC, tail ASC""".stripMargin,
    "kql_range_zerofill" ->
      """WITH axis AS (
        |  SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
        |    TIMESTAMP '2024-02-09', INTERVAL 1 DAY)) AS day),
        |daily AS (
        |  SELECT date_trunc('day', ts) AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1)
        |SELECT epoch_ms(axis.day) AS day_ms,
        |  CAST(COALESCE(daily.n, 0) AS BIGINT) AS cnt
        |FROM axis LEFT JOIN daily ON axis.day = daily.day
        |ORDER BY day_ms ASC""".stripMargin,
    "kql_mv_apply_extend" ->
      s"""${Sql.ordersInfoCte}
         |SELECT city,
         |  CAST(SUM(4 * amount + 20) AS BIGINT) AS total_s,
         |  CAST(2 * COUNT(*) AS BIGINT) AS total_n
         |FROM orders_info GROUP BY city""".stripMargin,
    "kql_mv_apply" ->
      s"""${Sql.ordersInfoCte}
         |SELECT city,
         |  CAST(SUM(2 * amount + 10) AS BIGINT) AS total_s,
         |  CAST(2 * COUNT(*) AS BIGINT) AS total_n,
         |  CAST(MAX(amount + 10) AS BIGINT) AS top
         |FROM orders_info GROUP BY city""".stripMargin,
    "kql_pack" ->
      s"""${Sql.ordersInfoCte}
         |SELECT city AS c, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CAST(orderid + custid AS DOUBLE)) AS DOUBLE) AS total
         |FROM orders_info GROUP BY city""".stripMargin,
    "kql_row_rank" ->
      """WITH f AS (
        |  SELECT event_id, user_id FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'),
        |o AS (
        |  SELECT event_id,
        |    CASE WHEN LAG(user_id) OVER (ORDER BY event_id ASC)
        |      IS DISTINCT FROM user_id THEN 1 ELSE 0 END AS nw,
        |    ROW_NUMBER() OVER (ORDER BY event_id ASC) AS rn
        |  FROM f),
        |r AS (
        |  SELECT event_id, rn,
        |    SUM(nw) OVER (ORDER BY event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |  FROM o)
        |SELECT event_id,
        |  CAST(MIN(rn) OVER (PARTITION BY run) AS INT) AS rm,
        |  CAST(run AS INT) AS rd
        |FROM r""".stripMargin,
    "kql_parse_kv" ->
      """SELECT lang AS lg, CAST(COUNT(*) AS BIGINT) AS docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_nc
        |FROM documents GROUP BY lang""".stripMargin,
    "kql_trim_take_any" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs,
        |  CAST(SUM(length(regexp_replace(text, '^(?:[aeiou])+|(?:[aeiou])+$', '', 'g'))) AS BIGINT) AS c1,
        |  CAST(SUM(length(regexp_replace(text, '^(?:[a-m])+', ''))) AS BIGINT) AS c2,
        |  CAST(SUM(length(regexp_replace(text, '(?:[n-z])+$', ''))) AS BIGINT) AS c3,
        |  MIN(source) AS first_src
        |FROM documents GROUP BY lang""".stripMargin,
    "kql_search_distinct" ->
      """SELECT DISTINCT lang, source FROM documents
        |WHERE contains(lower(text), 'spark') OR contains(lower(lang), 'spark')
        |   OR contains(lower(source), 'spark')""".stripMargin,
    "kql_partition_top" ->
      s"""${Sql.ordersInfoCte},
         |ranked AS (
         |  SELECT city, amount,
         |    ROW_NUMBER() OVER (PARTITION BY city ORDER BY amount DESC) AS r
         |  FROM orders_info)
         |SELECT city, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(amount) AS BIGINT) AS total
         |FROM ranked WHERE r <= 3 GROUP BY city""".stripMargin,
    "kql_format_datetime" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY 1 ORDER BY day ASC""".stripMargin,
    "kql_parse_where" ->
      """WITH m AS (
        |  SELECT lang, position('spark' IN text) AS p, text FROM documents
        |  WHERE text LIKE '%spark%')
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs,
        |  CAST(SUM(p - 1) AS BIGINT) AS head_chars,
        |  CAST(SUM(length(text) - p - 4) AS BIGINT) AS tail_chars
        |FROM m GROUP BY lang""".stripMargin,
    "kql_bag_unpack" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS total,
        |  MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS mx
        |FROM events GROUP BY event_type""".stripMargin,
    "kql_facet" ->
      s"""${Sql.ordersInfoCte}
         |SELECT 'city' AS facet_column, city AS value,
         |  CAST(COUNT(*) AS BIGINT) AS count_
         |FROM orders_info GROUP BY city
         |UNION ALL
         |SELECT 'custid' AS facet_column, CAST(custid AS VARCHAR) AS value,
         |  CAST(COUNT(*) AS BIGINT) AS count_
         |FROM orders_info GROUP BY custid""".stripMargin,
    // Arithmetic mirrors the parser's series builders op-for-op: every
    // sum over the count-valued dense series is exact in doubles, so
    // slope/intercept/trend/residual are bit-identical across engines.
    // Fractional outputs are floor(x*1e6) BIGINT micro-units — single
    // correctly-rounded IEEE ops on bit-identical doubles — because
    // round→DECIMAL(18,6) resolves half-ties differently across DuckDB
    // versions (the r10 driver hash-fail class).
    "kql_series_anomalies" ->
      """WITH f AS (
        |  SELECT event_type,
        |    CAST((epoch_ns(ts) // 1000000000
        |      - CAST(epoch(TIMESTAMP '2024-01-01') AS BIGINT)) // 86400 AS INT) AS i
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31'),
        |g AS (SELECT event_type, i, CAST(COUNT(*) AS BIGINT) AS v FROM f GROUP BY 1, 2),
        |k AS (SELECT DISTINCT event_type FROM f),
        |axis AS (SELECT CAST(unnest(range(0, 30)) AS INT) AS i),
        |dense AS (
        |  SELECT k.event_type, a.i, COALESCE(g.v, CAST(0 AS BIGINT)) AS vb,
        |         CAST(COALESCE(g.v, 0) AS DOUBLE) AS v
        |  FROM k CROSS JOIN axis a
        |  LEFT JOIN g ON g.event_type = k.event_type AND g.i = a.i),
        |fit AS (
        |  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
        |         SUM(v) AS sy, SUM(i * v) AS sxy,
        |         MIN(vb) AS mn, MAX(vb) AS mx
        |  FROM dense GROUP BY 1),
        |fit2 AS (
        |  SELECT *, (n - 1) * n / 2 AS sx, (n - 1) * n * (2 * n - 1) / 6 AS sxx
        |  FROM fit),
        |fit3 AS (
        |  SELECT *, (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope FROM fit2),
        |fit4 AS (
        |  SELECT *, (sy - slope * sx) / n AS icept, sy / n AS mean FROM fit3),
        |res AS (
        |  SELECT d.event_type, d.i, d.v, d.vb, f4.mean, f4.n,
        |    d.v - (f4.icept + f4.slope * d.i) AS e,
        |    d.v - f4.mean AS c
        |  FROM dense d JOIN fit4 f4 USING (event_type)),
        |fitstats AS (
        |  SELECT event_type, SUM(e * e) AS ssres, SUM(c * c) AS sstot
        |  FROM res GROUP BY 1),
        |trend AS (
        |  SELECT event_type, i, v,
        |    AVG(v) OVER (PARTITION BY event_type ORDER BY i
        |                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS t
        |  FROM dense),
        |resid AS (SELECT event_type, i, v - t AS r FROM trend),
        |sdc AS (
        |  SELECT event_type,
        |    sqrt(greatest(SUM(r * r) / COUNT(*)
        |      - (SUM(r) / COUNT(*)) * (SUM(r) / COUNT(*)), 0)) AS sd
        |  FROM resid GROUP BY 1),
        |flagged AS (
        |  SELECT resid.event_type, resid.i,
        |    CASE WHEN sd = 0 THEN 0
        |         WHEN r > 1.5 * sd THEN 1
        |         WHEN r < -1.5 * sd THEN -1 ELSE 0 END AS flag
        |  FROM resid JOIN sdc USING (event_type)),
        |fl AS (
        |  SELECT event_type,
        |    string_agg(CAST(flag AS VARCHAR), ',' ORDER BY i) AS flags,
        |    CAST(SUM(flag * flag) AS BIGINT) AS n_out
        |  FROM flagged GROUP BY 1),
        |zstat AS (
        |  SELECT event_type, sqrt(SUM(c * c) / COUNT(*)) AS sdz
        |  FROM res GROUP BY 1),
        |zs AS (
        |  SELECT res.event_type,
        |    MAX(CASE WHEN sdz = 0 THEN 0 ELSE (v - mean) / sdz END) AS pz
        |  FROM res JOIN zstat USING (event_type) GROUP BY 1),
        |mxi AS (
        |  SELECT d.event_type, CAST(MIN(d.i) AS INT) AS mx_i
        |  FROM dense d JOIN fit4 f4 USING (event_type)
        |  WHERE d.vb = f4.mx GROUP BY 1)
        |SELECT f4.event_type,
        |  CAST(floor(f4.slope * 1000000.0) AS BIGINT) AS slope_u,
        |  CAST(floor(f4.icept * 1000000.0) AS BIGINT) AS icept_u,
        |  CAST(floor((1 - fs.ssres / NULLIF(fs.sstot, 0)) * 1000000.0) AS BIGINT) AS rsq_u,
        |  f4.mn AS mn, f4.mx AS mx, mxi.mx_i, fl.n_out,
        |  CAST(floor(zs.pz * 1000000.0) AS BIGINT) AS peak_z_u,
        |  fl.flags
        |FROM fit4 f4
        |JOIN fitstats fs USING (event_type)
        |JOIN fl USING (event_type)
        |JOIN zs USING (event_type)
        |JOIN mxi USING (event_type)""".stripMargin,
    "kql_series_math" ->
      """WITH f AS (
        |  SELECT event_type,
        |    CAST((epoch_ns(ts) // 1000000000
        |      - CAST(epoch(TIMESTAMP '2024-01-01') AS BIGINT)) // 86400 AS INT) AS i
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31'),
        |g AS (SELECT event_type, i, COUNT(*) AS c FROM f GROUP BY 1, 2),
        |k AS (SELECT DISTINCT event_type FROM f),
        |axis AS (SELECT CAST(unnest(range(0, 30)) AS INT) AS i),
        |dense AS (
        |  SELECT k.event_type, a.i, COALESCE(g.c, 0) AS v
        |  FROM k CROSS JOIN axis a
        |  LEFT JOIN g ON g.event_type = k.event_type AND g.i = a.i)
        |SELECT event_type,
        |  CAST(SUM(v) AS DOUBLE) AS total,
        |  CAST(floor(SUM(v) / 30.0 * 1000000.0) AS BIGINT) AS mean_u,
        |  string_agg(CAST(v AS VARCHAR), ',' ORDER BY i) AS series
        |FROM dense GROUP BY event_type""".stripMargin,
    "kql_filter_idioms" ->
      """WITH f AS (
        |  SELECT source, lang, text FROM documents
        |  WHERE n_chars BETWEEN 250 AND 350
        |    AND (regexp_matches(lower(text), '(^|[^a-z0-9])spark([^a-z0-9]|$)')
        |      OR regexp_matches(lower(text), '(^|[^a-z0-9])window([^a-z0-9]|$)'))),
        |c AS (
        |  SELECT source, lang,
        |    (length(text) - length(replace(text, 'spark', ''))) // length('spark') AS n_spark
        |  FROM f)
        |SELECT source,
        |  CAST(COUNT(*) AS BIGINT) AS docs,
        |  CAST(SUM(n_spark) AS BIGINT) AS spark_hits,
        |  CAST(COUNT(DISTINCT CASE WHEN n_spark > 0 THEN lang END) AS BIGINT) AS langs_hit
        |FROM c GROUP BY source""".stripMargin,
    "kql_evaluate_pivot" ->
      s"""${Sql.ordersInfoCte}
         |SELECT custid,
         |  CAST(SUM(CASE WHEN city = 'Austin' THEN amount END) AS BIGINT) AS "Austin",
         |  CAST(SUM(CASE WHEN city = 'Chicago' THEN amount END) AS BIGINT) AS "Chicago",
         |  CAST(SUM(CASE WHEN city = 'Cleveland' THEN amount END) AS BIGINT) AS "Cleveland",
         |  CAST(SUM(CASE WHEN city = 'New Delhi' THEN amount END) AS BIGINT) AS "New Delhi",
         |  CAST(SUM(CASE WHEN city = 'New York' THEN amount END) AS BIGINT) AS "New York",
         |  CAST(SUM(CASE WHEN city = 'Seattle' THEN amount END) AS BIGINT) AS "Seattle"
         |FROM orders_info GROUP BY custid""".stripMargin,
    "kql_top_hitters" ->
      s"""${Sql.ordersInfoCte}
         |SELECT city, CAST(SUM(amount) AS BIGINT) AS approximate_sum_amount
         |FROM orders_info GROUP BY city
         |ORDER BY approximate_sum_amount DESC, city ASC LIMIT 4""".stripMargin,
    "kql_extract_split" ->
      """WITH d AS (
        |  SELECT lang, regexp_extract(text, '^([a-z]+) ', 1) AS first_word,
        |         len(string_split(text, ' ')) AS n_words
        |  FROM documents)
        |SELECT lang, first_word,
        |  CAST(COUNT(*) AS BIGINT) AS docs,
        |  CAST(SUM(n_words) AS BIGINT) AS words
        |FROM d WHERE first_word <> ''
        |GROUP BY lang, first_word
        |HAVING COUNT(*) >= 3""".stripMargin,
    "kql_dynamic_props" ->
      """SELECT event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS s,
        |  MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS mx
        |FROM events GROUP BY event_type""".stripMargin,
    "kql_top_nested_others" ->
      s"""${Sql.ordersInfoCte},
         |l0 AS (SELECT city, SUM(amount) AS total FROM orders_info GROUP BY city),
         |l0f AS (
         |  SELECT city, total FROM (
         |    SELECT *, ROW_NUMBER() OVER (ORDER BY total DESC, city ASC) AS r FROM l0)
         |  WHERE r <= 2),
         |l1 AS (SELECT city, custid, COUNT(*) AS cnt FROM orders_info GROUP BY city, custid),
         |l1f AS (
         |  SELECT city, custid, cnt FROM (
         |    SELECT *, ROW_NUMBER() OVER (
         |      PARTITION BY city ORDER BY cnt DESC, custid ASC) AS r FROM l1)
         |  WHERE r <= 2)
         |SELECT f0.city, CAST(f0.total AS BIGINT) AS total,
         |       f1.custid, CAST(f1.cnt AS BIGINT) AS cnt
         |FROM l0f f0 JOIN l1f f1 ON f0.city = f1.city
         |UNION ALL
         |SELECT 'Other Cities' AS city, CAST(SUM(amount) AS BIGINT) AS total,
         |       CAST(NULL AS INTEGER) AS custid, CAST(NULL AS BIGINT) AS cnt
         |FROM orders_info WHERE city NOT IN (SELECT city FROM l0f)""".stripMargin,
    "kql_row_cumsum_restart" ->
      """WITH f AS (
        |  SELECT event_id, user_id, event_type FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'),
        |g AS (
        |  SELECT event_id, user_id,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      OVER (ORDER BY event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM f)
        |SELECT event_id,
        |  CAST(SUM(user_id) OVER (PARTITION BY grp ORDER BY event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
        |FROM g""".stripMargin,
    "kql_top_nested" ->
      s"""${Sql.ordersInfoCte},
         |l0 AS (SELECT city, SUM(amount) AS total FROM orders_info GROUP BY city),
         |l0f AS (
         |  SELECT city, total FROM (
         |    SELECT *, ROW_NUMBER() OVER (ORDER BY total DESC, city ASC) AS r FROM l0)
         |  WHERE r <= 3),
         |l1 AS (SELECT city, custid, COUNT(*) AS cnt FROM orders_info GROUP BY city, custid),
         |l1f AS (
         |  SELECT city, custid, cnt FROM (
         |    SELECT *, ROW_NUMBER() OVER (
         |      PARTITION BY city ORDER BY cnt DESC, custid ASC) AS r FROM l1)
         |  WHERE r <= 2)
         |SELECT f0.city, CAST(f0.total AS BIGINT) AS total,
         |       f1.custid, CAST(f1.cnt AS BIGINT) AS cnt
         |FROM l0f f0 JOIN l1f f1 ON f0.city = f1.city""".stripMargin,
    "kql_serialize" ->
      """WITH f AS (
        |  SELECT event_id, user_id FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08')
        |SELECT event_id,
        |  CAST(ROW_NUMBER() OVER (ORDER BY event_id ASC) AS INTEGER) AS rn,
        |  LAG(user_id) OVER (ORDER BY event_id ASC) AS prev_user,
        |  LEAD(user_id) OVER (ORDER BY event_id ASC) AS next_user,
        |  CAST(SUM(user_id) OVER (ORDER BY event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run
        |FROM f""".stripMargin,
    "kql_make_series_avg" ->
      """WITH f AS (
        |  SELECT event_type, user_id,
        |    CAST((epoch_ns(ts) // 1000000000
        |      - CAST(epoch(TIMESTAMP '2024-01-01') AS BIGINT)) // 86400 AS INT) AS i
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31'),
        |g AS (SELECT event_type, i, AVG(user_id) AS v FROM f GROUP BY 1, 2),
        |k AS (SELECT DISTINCT event_type FROM f),
        |axis AS (SELECT CAST(unnest(range(0, 30)) AS INT) AS i),
        |dense AS (
        |  SELECT k.event_type, a.i,
        |    COALESCE(g.v, CAST(-1 AS DOUBLE)) AS v
        |  FROM k CROSS JOIN axis a
        |  LEFT JOIN g ON g.event_type = k.event_type AND g.i = a.i)
        |SELECT event_type,
        |  array_to_string(list(CAST(floor(v * 1000000.0) AS BIGINT) ORDER BY i), ',') AS series
        |FROM dense GROUP BY event_type""".stripMargin,
    "kql_periods_detect" ->
      """WITH f AS (
        |  SELECT event_type,
        |    CAST((epoch_ns(ts) // 1000000000
        |      - CAST(epoch(TIMESTAMP '2024-01-01') AS BIGINT)) // 86400 AS INT) AS i
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31'),
        |g AS (SELECT event_type, i, CAST(COUNT(*) AS BIGINT) AS v FROM f GROUP BY 1, 2),
        |k AS (SELECT DISTINCT event_type FROM f),
        |axis AS (SELECT CAST(unnest(range(0, 30)) AS INT) AS i),
        |dense AS (
        |  SELECT k.event_type, a.i, COALESCE(g.v, CAST(0 AS BIGINT)) AS v
        |  FROM k CROSS JOIN axis a
        |  LEFT JOIN g ON g.event_type = k.event_type AND g.i = a.i),
        |scores AS (
        |  SELECT d1.event_type, L.l AS lag, SUM(d1.v * d2.v) AS s
        |  FROM dense d1
        |  JOIN (SELECT CAST(unnest(range(2, 11)) AS INT) AS l) L ON TRUE
        |  JOIN dense d2 ON d2.event_type = d1.event_type AND d2.i = d1.i + L.l
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT event_type, lag, s,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY s DESC, lag ASC) AS rk
        |  FROM scores)
        |SELECT r1.event_type,
        |  CAST(r1.lag AS BIGINT) AS p1, CAST(r1.s AS BIGINT) AS s1,
        |  CAST(r2.lag AS BIGINT) AS p2, CAST(r2.s AS BIGINT) AS s2
        |FROM ranked r1 JOIN ranked r2
        |  ON r1.event_type = r2.event_type AND r1.rk = 1 AND r2.rk = 2
        |ORDER BY r1.event_type ASC""".stripMargin,
    "kql_make_series" ->
      """WITH f AS (
        |  SELECT event_type,
        |    CAST((epoch_ns(ts) // 1000000000
        |      - CAST(epoch(TIMESTAMP '2024-01-01') AS BIGINT)) // 86400 AS INT) AS i
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31'),
        |g AS (SELECT event_type, i, CAST(COUNT(*) AS BIGINT) AS v FROM f GROUP BY 1, 2),
        |k AS (SELECT DISTINCT event_type FROM f),
        |axis AS (SELECT CAST(unnest(range(0, 30)) AS INT) AS i),
        |dense AS (
        |  SELECT k.event_type, a.i, COALESCE(g.v, CAST(0 AS BIGINT)) AS v
        |  FROM k CROSS JOIN axis a
        |  LEFT JOIN g ON g.event_type = k.event_type AND g.i = a.i)
        |SELECT event_type, array_to_string(list(v ORDER BY i), ',') AS series
        |FROM dense GROUP BY event_type""".stripMargin,
    "kql_time_histogram" ->
      """WITH b AS (
        |  SELECT (epoch_ns(ts) // 1000000000) AS es FROM events)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  (es - ((es % 3600 + 3600) % 3600)) * 1000 AS bucket_ms
        |FROM b GROUP BY 2 ORDER BY bucket_ms ASC""".stripMargin,
    "kql_case_tiers" ->
      s"""${Sql.ordersInfoCte}
         |SELECT CASE WHEN amount >= 180 THEN 'high'
         |            WHEN amount >= 140 THEN 'mid' ELSE 'low' END AS tier,
         |       city, CAST(COUNT(*) AS BIGINT) AS n,
         |       CAST(SUM(amount) AS BIGINT) AS total
         |FROM orders_info GROUP BY 1, 2""".stripMargin,
    "kql_percentiles" ->
      s"""${Sql.ordersInfoCte}
         |SELECT city,
         |  CAST(SUM(CASE WHEN amount >= 150 THEN amount END) AS BIGINT) AS hi,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  round(quantile_cont(amount, 0.90), 6) AS p90
         |FROM orders_info GROUP BY city""".stripMargin,
    "kql_lookup_dim" ->
      s"""${Sql.ordersInfoCte},
         |dims(city, region) AS (VALUES
         |  ('New Delhi', 'APAC'), ('Seattle', 'WEST'), ('New York', 'EAST'),
         |  ('Austin', 'SOUTH'), ('Chicago', 'MIDWEST'), ('Cleveland', 'MIDWEST'))
         |SELECT d.region, CAST(COUNT(*) AS BIGINT) AS n,
         |       CAST(SUM(o.amount) AS BIGINT) AS total
         |FROM orders_info o LEFT JOIN dims d ON o.city = d.city
         |GROUP BY d.region ORDER BY region ASC""".stripMargin,
    "kql_union_rename" ->
      s"""${Sql.ordersInfoCte}
         |SELECT city AS town, CAST(COUNT(*) AS BIGINT) AS n,
         |       CAST(SUM(amount) AS BIGINT) AS total
         |FROM orders_info GROUP BY city""".stripMargin,
    "kql_bin_histogram" ->
      s"""${Sql.ordersInfoCte}
         |SELECT CAST(amount - ((amount % 20 + 20) % 20) AS INTEGER) AS bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(amount) AS BIGINT) AS total
         |FROM orders_info GROUP BY 1 ORDER BY bucket ASC""".stripMargin,
    "kql_parse_regex" ->
      s"""${Sql.ordersInfoCte}
         |SELECT city, CAST(COUNT(*) AS BIGINT) AS n,
         |       CAST(SUM(amount) AS BIGINT) AS total,
         |       CAST(MAX(orderid) AS BIGINT) AS maxid
         |FROM orders_info GROUP BY city""".stripMargin,
    "kql_mvexpand" ->
      s"""${Sql.ordersInfoCte}
         |SELECT city, CAST(2 * COUNT(*) AS BIGINT) AS n,
         |       CAST(SUM(orderid) + SUM(amount) AS BIGINT) AS total
         |FROM orders_info GROUP BY city""".stripMargin,
    // the same dim constant the query writes to csv, inlined as VALUES
    "kql_externaldata" ->
      s"""${Sql.ordersInfoCte},
         |dims(city, tier) AS (VALUES
         |  ('New Delhi', 1), ('Seattle', 2), ('New York', 3), ('Atlantis', 9)),
         |a AS (
         |  SELECT city, CAST(SUM(amount) AS BIGINT) AS total,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM orders_info GROUP BY city)
         |SELECT a.city, CAST(tier AS BIGINT) AS tier, total, n
         |FROM a JOIN dims USING (city)""".stripMargin,
    // lockstep zip mirrored via an index range over the max length:
    // arr[i] out of range is NULL in DuckDB, exactly the null-fill.
    "kql_mvexpand_multi" ->
      s"""${Sql.ordersInfoCte},
         |r AS (
         |  SELECT city,
         |    [orderid, orderid + 1] AS xs,
         |    CASE WHEN orderid % 2 = 0 THEN [orderid * 10]
         |         ELSE [orderid * 10, orderid * 20, orderid * 30] END AS ys
         |  FROM orders_info),
         |z AS (
         |  SELECT city, i AS ix, xs[i + 1] AS x, ys[i + 1] AS y
         |  FROM r, LATERAL (SELECT unnest(range(0, greatest(len(xs), len(ys)))) AS i))
         |SELECT city, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(COUNT(x) AS BIGINT) AS nx, CAST(COUNT(y) AS BIGINT) AS ny,
         |  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |  CAST(SUM(ix) AS BIGINT) AS six
         |FROM z GROUP BY city""".stripMargin,
    "ref_avg_by_city" ->
      s"""${Sql.ordersInfoCte}
         |SELECT city, AVG(amount) AS avg_sales FROM orders_info GROUP BY city""".stripMargin,
    "ref_total_by_city" ->
      s"""${Sql.ordersInfoCte}
         |SELECT city, CAST(SUM(amount) AS BIGINT) AS total FROM orders_info
         |GROUP BY city ORDER BY total DESC""".stripMargin,
    "ref_count_by_city" ->
      s"""${Sql.ordersInfoCte}
         |SELECT city, CAST(COUNT(*) AS BIGINT) AS orders FROM orders_info
         |GROUP BY city ORDER BY orders DESC, city DESC""".stripMargin,
    "ref_top5_orders" ->
      s"""${Sql.ordersInfoCte}
         |SELECT * FROM orders_info ORDER BY orderid DESC LIMIT 5""".stripMargin,
    "kql_avg_by_city" ->
      s"""${Sql.ordersInfoCte}
         |SELECT city, AVG(amount) AS avg_sales FROM orders_info GROUP BY city""".stripMargin,
    "kql_total_by_city" ->
      s"""${Sql.ordersInfoCte}
         |SELECT city, CAST(SUM(amount) AS BIGINT) AS total FROM orders_info
         |GROUP BY city""".stripMargin,
    "kql_count_by_city" ->
      s"""${Sql.ordersInfoCte}
         |SELECT city, CAST(COUNT(*) AS BIGINT) AS orders FROM orders_info
         |GROUP BY city""".stripMargin,
    "kql_join_frequent" ->
      s"""${Sql.ordersInfoCte},
         |frequent AS (
         |  SELECT custid FROM orders_info GROUP BY custid HAVING COUNT(*) >= 3)
         |SELECT o.city, CAST(SUM(o.amount) AS BIGINT) AS total,
         |       CAST(COUNT(*) AS BIGINT) AS n
         |FROM orders_info o JOIN frequent f ON o.custid = f.custid
         |WHERE o.amount >= 150
         |GROUP BY o.city""".stripMargin,
  )
}
