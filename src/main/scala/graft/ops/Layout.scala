package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [extension] Data-layout clustering — the write-side half of scan
  * performance at 100 TB. Queries that filter on TWO dimensions (e.g.
  * partkey AND suppkey) get nothing from a layout sorted on either one
  * alone: a range predicate on the secondary key touches every file.
  * Z-ORDER (Morton) interleaving maps the 2-D key space onto a 1-D
  * curve that preserves locality in BOTH dimensions, so files built
  * from curve ranges have tight min/max envelopes on each dimension —
  * and min/max file statistics (parquet row-group stats, Delta/Iceberg
  * file skipping) then prune most files for 2-D predicates.
  *
  * [[zorderLayout]] emits the layout MANIFEST — per-file row counts and
  * min/max envelopes per dimension — which is exactly the metadata a
  * table format would skip files by; [[graft.ops]]' `LayoutSpec`
  * measures the pruning win against a 1-D-sorted layout. File
  * assignment here uses FIXED-WIDTH curve ranges (zval DIV width), a
  * map-side pure function of the row, so the query is deterministic and
  * oracle-checkable; a production write would instead
  * `repartitionByRange(col("z")).sortWithinPartitions("z")` — same
  * curve, boundaries chosen by sampling so files are equal-sized (the
  * boundary SAMPLING is the only nondeterminism, which is why the
  * oracle pins the fixed-width form).
  *
  * The interleave is pure integer bit arithmetic (exact on both
  * engines): 16 bits per dimension → a 32-bit Morton code.
  */
object Layout {

  /** Morton-interleave the low 16 bits of integer columns `p16`/`s16`:
    * bit i of p lands at even position 2i, bit i of s at odd 2i+1.
    * UNROLLED into 32 plain shift/mask terms — a higher-order
    * `aggregate` lambda would run interpreted per row (measured 4.8 s
    * at sf0.1 vs sub-second unrolled); this form stays inside
    * whole-stage codegen, which is what a per-row write-path expression
    * must do at 100 TB. */
  private[ops] val mortonExpr: String =
    (0 until 16).map { i =>
      s"shiftleft(shiftright(p16, $i) % 2, ${2 * i})" +
        s" + shiftleft(shiftright(s16, $i) % 2, ${2 * i + 1})"
    }.mkString(" + ")

  /** The z-order layout manifest for lineitem clustered on
    * (l_partkey, l_suppkey): assign every row to a file by fixed-width
    * Morton-curve range, then aggregate each file's row count and
    * per-dimension min/max envelope. One map-side pass + one
    * file_id-keyed aggregate — at 100 TB this is the manifest-building
    * job that runs alongside the clustered write. `files` controls the
    * curve-range width (2³² / files). */
  def zorderLayout(spark: SparkSession, sfDir: String,
                   files: Int = 64): DataFrame = {
    val zed = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").cast("bigint").as("pk"),
        col("l_suppkey").cast("bigint").as("sk"))
      .withColumn("p16", expr("pk % 65536"))
      .withColumn("s16", expr("sk % 65536"))
      .withColumn("z", expr(mortonExpr))
    // curve-range width adapts to the occupied z range (fixed 2³²-wide
    // ranges would collapse small key domains into one file); the 1-row
    // max is a broadcast scalar, the standard threshold shape
    val zmax = zed.agg((max(col("z")) + 1).as("zmax1"))
    zed.crossJoin(broadcast(zmax))
      .withColumn("file_id",
        expr(s"cast(z DIV greatest(1L, (zmax1 + $files - 1) DIV $files) as int)"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("pk")).as("min_part"), max(col("pk")).as("max_part"),
        min(col("sk")).as("min_supp"), max(col("sk")).as("max_supp"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_zorder" -> ((s: SparkSession, d: String) => zorderLayout(s, d)),
  )

  val oracleSql: Map[String, String] = Map(
    "layout_zorder" ->
      """WITH z AS (
        |  SELECT l_partkey AS pk, l_suppkey AS sk,
        |    list_sum(list_transform(range(0, 16), i ->
        |      (((l_partkey % 65536) >> i) % 2) * (1::BIGINT << (2 * i))
        |      + (((l_suppkey % 65536) >> i) % 2) * (1::BIGINT << (2 * i + 1)))) AS zv
        |  FROM lineitem),
        |w AS (SELECT GREATEST(1, (MAX(zv) + 1 + 63) // 64) AS width FROM z)
        |SELECT CAST(zv // width AS INTEGER) AS file_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(MIN(pk) AS BIGINT) AS min_part, CAST(MAX(pk) AS BIGINT) AS max_part,
        |  CAST(MIN(sk) AS BIGINT) AS min_supp, CAST(MAX(sk) AS BIGINT) AS max_supp
        |FROM z CROSS JOIN w GROUP BY 1""".stripMargin,
  )
}
