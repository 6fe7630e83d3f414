package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Adaptive Query Execution is on (Spark default) and actually engaged:
  * after execution the shuffle read is AQE-coalesced when the data is
  * small relative to the configured partition count — the runtime
  * re-plan that keeps a 32-partitions-per-shuffle config from drowning
  * a small intermediate in task overhead, and (at scale) splits skewed
  * partitions. */
class AqeSpec extends SparkSpec {

  test("shuffle reads are adaptively coalesced after execution") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    val agg = spark.read.parquet(s"$sfDir/customer.parquet")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
    agg.collect() // AQE finalizes the plan during execution
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
      plan.take(2000))
  }
}
