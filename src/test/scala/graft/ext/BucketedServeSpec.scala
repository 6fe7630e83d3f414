package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.SparkSpec

/** Pins the write-time bucketed SERVING layout for the iterative
  * cores (r11 verdict item 1): the edge / band relations are written
  * once as bucketed tables, and the per-superstep (or candidate
  * self-) join must plan with NO shuffle Exchange anywhere above the
  * bucketed scan — the layout IS the join partitioning. Results must
  * be bit-identical to the unbucketed derivations (the oracle reuse
  * contract).
  *
  * The plan assertion runs with AQE OFF: AdaptiveSparkPlanExec hides
  * its inner plan from TreeNode traversal before execution, which
  * made a first cut of this pin vacuously green — and distribution
  * matching (EnsureRequirements) is identical either way, so the
  * static plan is the honest witness. Broadcast is disabled so a
  * toy-scale broadcast can't mask a layout that would shuffle at
  * 100 TB.
  */
class BucketedServeSpec extends SparkSpec {

  private def isServedScan(f: FileSourceScanExec): Boolean =
    f.tableIdentifier.exists(t =>
      t.table.startsWith("graft_edges_") || t.table.startsWith("graft_bands_"))

  /** Exchanges that sit BETWEEN a served bucketed scan and its nearest
    * enclosing join — must be empty (the bucket layout must BE the
    * join partitioning). Exchanges above the join (the dst-keyed
    * message aggregate, the candidate distinct) are the algorithm's
    * legitimate shuffles, not a serving failure, so the descent stops
    * at join nodes. */
  private def exchangesAboveBucketedScan(df: DataFrame): Seq[SparkPlan] = {
    def scanNoJoinBelow(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec => isServedScan(f)
      case _: org.apache.spark.sql.execution.joins.BaseJoinExec => false
      case other => other.children.exists(scanNoJoinBelow)
    }
    val plan = df.queryExecution.executedPlan
    assert(!plan.isInstanceOf[org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec],
      "pin must run with AQE off — the adaptive wrapper hides the plan from traversal")
    plan.collect { case e: ShuffleExchangeExec if scanNoJoinBelow(e.child) => e }
  }

  private def assertSame(a: DataFrame, b: DataFrame, what: String): Unit = {
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$what: bucketed and unbucketed results must be identical")
  }

  private def withNoBroadcast[A](body: => A): A = {
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      body
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  private def assertServedNoExchange(df: DataFrame, what: String): Unit = {
    val plan = df.queryExecution.executedPlan
    assert(plan.toString.contains("graft_edges_") ||
           plan.toString.contains("graft_bands_"),
      s"$what must read a served bucketed table:\n${plan.toString.take(2000)}")
    val bad = exchangesAboveBucketedScan(df)
    assert(bad.isEmpty,
      s"$what must not shuffle the served side:\n${bad.map(_.toString.take(800)).mkString("\n")}")
  }

  test("pagerank superstep: no Exchange above the bucketed edge scan; results identical") {
    withNoBroadcast {
      import org.apache.spark.sql.functions._
      val edges = GraphAnalytics.servedPsEdges(spark, sfDir)
      val deg = edges.groupBy(col("src")).agg(sum(col("w")).as("wdeg"))
      val pr0 = deg.select(col("src").as("node"), lit(1000L).as("pr"))
      // the IN-LOOP superstep plan (the loop checkpoints each round,
      // so the full query's final plan no longer shows it)
      assertServedNoExchange(
        GraphAnalytics.prContrib(pr0, deg, edges), "pagerank superstep")
      assertSame(GraphAnalytics.pageRankBucketed(spark, sfDir),
        GraphAnalytics.pageRank(spark, sfDir), "pagerank")
    }
  }

  test("LPA round: no Exchange above the bucketed edge scan; results identical") {
    withNoBroadcast {
      import org.apache.spark.sql.functions._
      val edges = GraphAnalytics.servedPsEdges(spark, sfDir)
        .select(col("src"), col("dst"))
      val lab0 = edges.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("label"))
      assertServedNoExchange(
        GraphAnalytics.lpaRound(lab0.localCheckpoint(true), edges), "LPA round")
      assertSame(GraphAnalytics.labelPropagationBucketed(spark, sfDir),
        GraphAnalytics.labelPropagation(spark, sfDir), "lpa")
    }
  }

  test("minhash band self-join: zero Exchange on either side of the bucketed scan") {
    withNoBroadcast {
      val pairs = Dedup.minhashPairsBucketed(spark, sfDir)
      assertServedNoExchange(pairs, "band self-join")
      assertSame(pairs,
        Dedup.minhashPairsOn(graft.ops.Tables.documents(spark, sfDir)),
        "minhash pairs")
    }
  }

  test("IVF partitioned serving: probe join prunes the assignment scan via DPP; results identical") {
    // the registered sim_ivf_topk_partitioned path: the assignment is
    // written partitionBy(cent_id) and the probe join must reach it
    // through dynamic partition pruning — the scan's PartitionFilters
    // carry a dynamicpruning subquery, so only the probed nprobe
    // directories are read.
    val df = Similarity.ivfTopKPartitioned(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_ivf_assign_"), "must read the served assignment")
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"probe join must dynamic-partition-prune the assignment scan:\n${plan.take(3000)}")
    assertSame(df, Similarity.ivfTopK(spark, sfDir), "ivf topk")
  }

  test("lpaCore src-keyed message flow equals the dst-keyed form on an asymmetric-weight graph") {
    // The r12 rewrite routes votes along src (so one src-bucketed
    // layout serves both cores). Over a SYMMETRIZED edge set that is
    // provably the same vote multiset — pin it on a graph with a
    // non-trivial tie structure: a 4-cycle plus a pendant.
    import spark.implicits._
    val raw = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (4L, 5L))
    val edges = (raw ++ raw.map(e => (e._2, e._1))).toDF("src", "dst")
    val got = GraphAnalytics.lpaCore(edges, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // dst-keyed reference (the pre-r12 formulation), computed inline
    import org.apache.spark.sql.functions._
    var lab = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    for (_ <- 1 to 3) {
      val votes = edges.join(lab, edges("dst") === lab("node"))
        .select(col("src"), col("label"))
        .union(lab.select(col("node").as("src"), col("label")))
      lab = votes.groupBy(col("src"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("src"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("src").as("node"), (-col("m.nl")).as("label"))
        .localCheckpoint(true)
    }
    val want = lab.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }
}
