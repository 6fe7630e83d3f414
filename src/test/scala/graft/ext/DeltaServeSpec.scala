package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.SparkSpec

/** Pins INCREMENTAL maintenance for the served layouts (r12 verdict
  * item 5): a 100 TB deployment appends new rows to the written
  * band/assignment tables, it does not rewrite them. Both delta paths
  * must be (a) row-identical to the full rebuild — the derivations are
  * per-row, so union commutes with them — and (b) still carry the
  * layout's plan property after the append (bucket hash-clustering
  * survives multi-file buckets; partition pruning survives appended
  * partition files). Mirrors `search_index_delta`'s bounded-head proof
  * and BucketedServeSpec's AQE-off/broadcast-off pinning discipline. */
class DeltaServeSpec extends SparkSpec {

  private def assertSame(a: DataFrame, b: DataFrame, what: String): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$what: delta-append and full-rebuild results must be identical")

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

  test("band table append: self-join still zero-Exchange above the scan; pairs identical") {
    withNoBroadcast {
      val pairs = Dedup.minhashPairsDelta(spark, sfDir)
      val plan = pairs.queryExecution.executedPlan
      assert(plan.toString.contains("graft_bands_delta_"),
        "must read the appended band table")
      def scanNoJoinBelow(p: SparkPlan): Boolean = p match {
        case f: FileSourceScanExec =>
          f.tableIdentifier.exists(_.table.startsWith("graft_bands_delta_"))
        case _: org.apache.spark.sql.execution.joins.BaseJoinExec => false
        case other => other.children.exists(scanNoJoinBelow)
      }
      val bad = plan.collect {
        case e: ShuffleExchangeExec if scanNoJoinBelow(e.child) => e
      }
      assert(bad.isEmpty,
        s"append must keep the bucket clustering (no Exchange above the scan):\n${bad.mkString("\n")}")
      assertSame(pairs,
        Dedup.minhashPairsOn(graft.ops.Tables.documents(spark, sfDir)),
        "minhash pairs after band append")
    }
  }

  test("IVF assignment append: probe join still prunes via DPP; top-k identical") {
    val df = Similarity.ivfDelta(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_ivf_delta_"), "must read the appended assignment")
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"probe join must still dynamic-partition-prune after the append:\n${plan.take(3000)}")
    assertSame(df, Similarity.ivfTopK(spark, sfDir), "ivf topk after append")
  }

  test("edge table append: anti-join dedupe vs the served base; pagerank identical; no edge-side Exchange") {
    withNoBroadcast {
      val delta = GraphAnalytics.pageRankDelta(spark, sfDir)
      // the loop checkpoints each round, so the final frame's plan no
      // longer shows the superstep — pin the in-loop plan separately
      // below, over the delta-served edges
      assertSame(delta, GraphAnalytics.pageRank(spark, sfDir),
        "pagerank after edge append")
      // the merged table must equal the full distinct edge relation,
      // with both batches contributing (no silent no-op split)
      val table = spark.catalog.listTables().collect()
        .map(_.name).find(_.startsWith("graft_edges_delta_")).get
      val served = spark.table(table)
      import org.apache.spark.sql.functions._
      assert(served.count() == served.select(col("src"), col("dst")).distinct().count(),
        "append must not duplicate edges (anti-join dedupe)")
      def scanNoJoinBelow(p: SparkPlan): Boolean = p match {
        case f: FileSourceScanExec =>
          f.tableIdentifier.exists(_.table.startsWith("graft_edges_delta_"))
        case _: org.apache.spark.sql.execution.joins.BaseJoinExec => false
        case other => other.children.exists(scanNoJoinBelow)
      }
      val deg = served.groupBy(col("src")).agg(sum(col("w")).as("wdeg"))
      val pr0 = deg.select(col("src").as("node"), lit(1000L).as("pr"))
      val step = GraphAnalytics.prContrib(pr0, deg, served)
      val bad = step.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec if scanNoJoinBelow(e.child) => e
      }
      assert(bad.isEmpty,
        s"superstep must not shuffle the appended edge side:\n${bad.mkString("\n")}")
    }
  }

  test("the appended tables hold BOTH batches (the split is real, not a no-op)") {
    import org.apache.spark.sql.functions._
    // derive the served frames through the registered paths, then check
    // the union actually covers the full id space on both sides
    Dedup.minhashPairsDelta(spark, sfDir).collect()
    Similarity.ivfDelta(spark, sfDir).collect()
    val bands = spark.table(
      spark.catalog.listTables().collect()
        .map(_.name).find(_.startsWith("graft_bands_delta_")).get)
    val docs = graft.ops.Tables.documents(spark, sfDir)
    assert(bands.select(countDistinct(col("doc_id"))).head.getLong(0) ==
      docs.select(countDistinct(col("doc_id"))).head.getLong(0),
      "band table must cover every doc after the append")
    assert(bands.filter(col("doc_id") % 5 === 0).count() > 0 &&
      bands.filter(col("doc_id") % 5 =!= 0).count() > 0,
      "both the base write and the append batch must be present")
  }
}
