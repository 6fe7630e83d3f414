package graft.ops

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Physical-plan contracts for the headline operators — the properties
  * that make these queries survive a 100 TB scale-up, asserted so a
  * refactor cannot silently regress them:
  * filter pushdown + column pruning at the scan, broadcast (not
  * sort-merge) joins through small dims, map-side partial aggregation
  * for the native top-k, and the as-of join compiling to a window pass
  * with no join operator at all. */
class PlanSpec extends SparkSpec {

  private def phys(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("pricing summary: shipdate filter pushed to parquet, unused columns pruned") {
    val p = phys(Analytics.pricingSummary(spark, sfDir))
    assert(p.contains("PushedFilters"), p.take(2000))
    assert(p.contains("l_shipdate"), "filter column must reach the scan")
    assert(!p.contains("l_tax"), "l_tax is unused and must be pruned from the scan")
    assert(!p.contains("l_partkey"), "l_partkey is unused and must be pruned")
  }

  test("star join: two broadcast hash joins, no sort-merge, fact side unshuffled before agg") {
    val p = phys(Analytics.joinBroadcastStar(spark, sfDir))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(2000))
    assert(!p.contains("SortMergeJoin"))
  }

  test("native top-k: ObjectHashAggregate with a partial stage (map-side k pairs)") {
    val p = phys(AdvancedAnalytics.topkNative(spark, sfDir))
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
    assert(p.contains("partial_graft_topk"), "partial aggregation must run map-side")
    assert(!p.contains("Window"), "no window/sort formulation")
  }

  test("as-of join: compiles to a window pass, zero join operators") {
    val p = phys(AdvancedAnalytics.asofViewBeforePurchase(spark, sfDir))
    assert(!p.contains("Join"), p.take(2000))
    assert(p.contains("RunningWindowFunction") || p.contains("Window"))
  }

  test("exact dedup: single hash aggregate with partial stage, scan reads only text+doc_id") {
    val p = phys(graft.ext.Dedup.exactDedup(spark, sfDir))
    assert(p.contains("HashAggregate"))
    assert(!p.contains("lang"), "unused documents columns must be pruned")
    assert(!p.contains("source"), "unused documents columns must be pruned")
  }

  test("latest-state CDC: max_by hash aggregate, not a row_number window sort") {
    val p = phys(CdcQueries.latestState(spark, sfDir))
    assert(p.contains("max_by") || p.contains("HashAggregate") || p.contains("SortAggregate"))
    assert(!p.contains("row_number"), "latest-state must not sort every event")
  }
}
