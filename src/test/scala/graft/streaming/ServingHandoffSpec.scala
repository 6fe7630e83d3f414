package graft.streaming

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the CDC→serving handoff (r12 verdict item 7): the streaming
  * path (file stream → StatefulLatestState upserts → versioned MERGE
  * sink → bucketed compaction) must produce EXACTLY the batch
  * latest-state view, and the compacted table must carry the bucket
  * layout (an orderid aggregate plans with zero Exchange above the
  * scan — AQE and broadcast off, BucketedServeSpec's discipline). */
class ServingHandoffSpec extends SparkSpec {

  test("stream-materialized serving table equals the batch latest-state view") {
    val served = graft.ops.CdcQueries.latestServed(spark, sfDir)
    val batch = graft.ops.CdcQueries.latestState(spark, sfDir)
    assert(served.exceptAll(batch).isEmpty && batch.exceptAll(served).isEmpty,
      "stream-materialized state must be row-identical to the batch view")
    assert(served.count() > 0)
  }

  test("the compacted table is bucketed and an orderid aggregate does not shuffle it") {
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      graft.ops.CdcQueries.latestServed(spark, sfDir).collect() // ensure table exists
      val table = spark.catalog.listTables().collect()
        .map(_.name).find(_.startsWith("graft_latest_")).get
      val agg = spark.table(table).groupBy(col("orderid"))
        .agg(max(col("lsn")).as("mx"))
      val plan = agg.queryExecution.executedPlan
      def servedScanNoJoinBelow(p: SparkPlan): Boolean = p match {
        case f: FileSourceScanExec =>
          f.tableIdentifier.exists(_.table.startsWith("graft_latest_"))
        case other => other.children.exists(servedScanNoJoinBelow)
      }
      val bad = plan.collect {
        case e: ShuffleExchangeExec if servedScanNoJoinBelow(e.child) => e
      }
      assert(bad.isEmpty,
        s"orderid aggregate must ride the bucket layout, not shuffle:\n${bad.mkString("\n")}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }
}
