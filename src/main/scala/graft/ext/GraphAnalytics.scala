package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** [extension] Whole-graph iterative analytics — the tier next to
  * [[Dedup]]'s connected components: algorithms whose Spark shape is
  * "edge join per superstep" (Pregel-on-DataFrames). PageRank is the
  * canonical instance: each iteration shuffles contributions along the
  * edge relation (keyed by source), aggregates them at the destination,
  * and localCheckpoints so the lineage stays O(1) in iterations.
  *
  * Determinism contract: ranks are integer FIXED-POINT (units of
  * 10⁻¹² of total mass). Contributions floor-divide by out-degree and
  * the damping factor applies as (85·x) DIV 100 — all BIGINT, so both
  * engines agree bit-for-bit at any scale and any summation order
  * (the mass "leaked" by flooring is < outdeg units per node per
  * iteration, ~10⁻¹² relative — the price of cross-engine exactness,
  * documented rather than hidden in rounding).
  */
object GraphAnalytics {

  /** PageRank (Page et al. 1999; damping d = 0.85, 3 synchronous
    * iterations) over the part↔supplier bipartite graph lineitem
    * induces: an edge per DISTINCT (l_partkey, l_suppkey) sourcing
    * relationship, symmetrized (undirected supply graph). Node ids:
    * parts at 2·key, suppliers at 2·key+1. Symmetrization means every
    * node has out-degree ≥ 1, so there are no dangling-mass cases.
    *
    * Scale shape per iteration: one shuffle of (src-keyed) rank join
    * onto the edge list + one dst-keyed aggregate — the distributed
    * PageRank shape; degrees compute once; the node COUNT (a scalar,
    * collected once for the teleport term) is metadata-sized at any
    * corpus. At 100 TB the edge relation would be bucketed by src so
    * the per-iteration join is shuffle-free. */
  def pageRank(spark: SparkSession, sfDir: String,
               iterations: Int = 3): DataFrame = {
    val pairs = Tables.lineitem(spark, sfDir)
      .select((col("l_partkey").cast("bigint") * 2).as("p"),
        (col("l_suppkey").cast("bigint") * 2 + 1).as("s"))
      .distinct()
    val edges = pairs.select(col("p").as("src"), col("s").as("dst"))
      .union(pairs.select(col("s").as("src"), col("p").as("dst")))
      .localCheckpoint(true)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    val n = deg.count() // node count (symmetrized => every node a src)
    val scale = 1000000000000L
    val base = (15L * scale) / (100L * n)
    var pr = deg.select(col("src").as("node"), lit(scale / n).as("pr"))
    for (_ <- 1 to iterations) {
      val contrib = pr
        .join(deg, pr("node") === deg("src"))
        .join(edges, Seq("src"))
        .select(col("dst"), expr("pr DIV outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("csum"))
      pr = deg.select(col("src").as("node"))
        .join(contrib, col("node") === col("dst"), "left_outer")
        .select(col("node"),
          (lit(base) + expr("85L * coalesce(csum, 0L) DIV 100")).as("pr"))
        .localCheckpoint(true)
    }
    pr.join(deg, pr("node") === deg("src"))
      .select(col("node"),
        when(col("node") % 2 === 0, lit("part")).otherwise(lit("supplier"))
          .as("node_type"),
        col("pr").as("pr_micro"), col("outdeg"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> ((s: SparkSession, d: String) => pageRank(s, d)),
  )

  /** Unrolled 3-iteration oracle; the fixed-point arithmetic makes the
    * unroll exact (no rounding to reproduce). */
  val oracleSql: Map[String, String] = Map(
    "graph_pagerank" -> {
      val iters = (1 to 3).map { t =>
        s"""c$t AS (
           |  SELECT e.dst, SUM(p.pr // d.outdeg) AS csum
           |  FROM pr${t - 1} p JOIN deg d ON p.node = d.src
           |  JOIN e ON e.src = p.node
           |  GROUP BY e.dst),
           |pr$t AS (
           |  SELECT d.src AS node,
           |    (SELECT base FROM consts)
           |      + 85 * COALESCE(c$t.csum, 0) // 100 AS pr
           |  FROM deg d LEFT JOIN c$t ON c$t.dst = d.src)""".stripMargin
      }.mkString(",\n")
      s"""WITH pairs AS (
         |  SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS s
         |  FROM lineitem),
         |e AS (
         |  SELECT p AS src, s AS dst FROM pairs
         |  UNION ALL SELECT s AS src, p AS dst FROM pairs),
         |deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
         |consts AS (
         |  SELECT COUNT(*) AS n,
         |    1000000000000 // COUNT(*) AS pr0,
         |    (15 * 1000000000000) // (100 * COUNT(*)) AS base
         |  FROM deg),
         |pr0 AS (SELECT src AS node, (SELECT pr0 FROM consts) AS pr FROM deg),
         |$iters
         |SELECT pr3.node,
         |  CASE WHEN pr3.node % 2 = 0 THEN 'part' ELSE 'supplier' END AS node_type,
         |  CAST(pr3.pr AS BIGINT) AS pr_micro,
         |  CAST(deg.outdeg AS BIGINT) AS outdeg
         |FROM pr3 JOIN deg ON pr3.node = deg.src""".stripMargin
    },
  )
}
