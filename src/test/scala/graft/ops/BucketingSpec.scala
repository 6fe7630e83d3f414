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

  test("IVF assignment written partitioned by cent_id gives partition-pruned probes") {
    // The serving layout the Similarity scaladocs promise: write the
    // corpus partitioned by its IVF list, and a query probing nprobe
    // lists becomes a partition-pruned scan — the plan must show the
    // cent_id filter consumed as PartitionFilters, with only the probed
    // directories surviving.
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    graft.functions.VectorFunctions.register(spark)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", expr("sqrt(graft_dot(v, v))"))
    val cents = broadcast(e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("norm").as("cn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cent_id").asc)
    e.join(cents)
      .withColumn("ccos", round(expr("graft_dot(v, cv)") / (col("norm") * col("cn")), 6))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("cent_id"))
      .write.partitionBy("cent_id").mode("overwrite").parquet(dir)

    val probe = spark.read.parquet(dir).filter(col("cent_id").isin(3, 7))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cent_id"),
      s"probe must prune on the partition column:\n${plan.take(2000)}")
    assert(!plan.contains("PushedFilters: [In(cent_id"),
      "cent_id must be consumed as a partition filter, not a data filter")
    // pruning is real: only the two probed lists are read
    assert(probe.select("cent_id").distinct().count() == 2)
    val full = spark.read.parquet(dir).count()
    assert(probe.count() < full)
  }
}
