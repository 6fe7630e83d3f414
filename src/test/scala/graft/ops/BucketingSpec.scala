package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Co-located joins via bucketing — the pre-shuffle layout a 100 TB
  * deployment uses for repeated fact-fact joins: both tables bucketed
  * (and sorted) by the join key at write time, so the join compiles to
  * a zero-exchange sort-merge over aligned buckets. Asserted on the
  * physical plan, not assumed. */
class BucketingSpec extends SparkSpec {

  test("orders ⋈ lineitem over matching buckets plans no shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.read.parquet(s"$sfDir/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
           !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not shuffle either side:\n${plan.take(3000)}")

    // and the answer equals the plain (shuffling) join's answer
    val plain = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .join(spark.read.parquet(s"$sfDir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
  }
}
