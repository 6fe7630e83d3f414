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

  test("geo cell join: site cells broadcast onto the point scan, no sort-merge") {
    val p = phys(ReferenceQueries.queries("kql_geo_join")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "site-cell dim must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidate generation must be the cell equi-join, not all-pairs")
    // SimplifyGuardedNullCheck: the join-injected isnotnull(cell) must
    // reduce to the coordinate-validity guard — the Filter may not
    // re-evaluate the cell ENCODER (its conv() render is the marker)
    val filterLines = p.linesIterator.filter(_.contains("Filter")).mkString("\n")
    assert(!filterLines.contains("conv("),
      s"null-filter still evaluates the geohash encoder:\n${filterLines.take(500)}")
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

  test("span excision: no window, no covered-position explode past the shingle stage") {
    val p = phys(graft.ext.Dedup.spanExcisedCorpus(spark, sfDir))
    // coverage is rebuilt map-side from each doc's collected span
    // starts — a window or a k-wide covered-position explode here would
    // be the O(k·corpus) shuffle the design avoids
    assert(!p.contains("Window"), p.take(2000))
    assert(p.contains("HashAggregate"))
  }

  test("phash pairs: pair phase reads materialized fingerprints, not the decode subtree") {
    val p = phys(graft.ext.Multimodal.imageNearDups(spark, sfDir))
    // the fingerprint relation localCheckpoints before banding — the
    // blob-scanning mapPartitions decode must NOT appear in the pair
    // plan (an early draft recomputed it up to 18x across band joins)
    assert(p.contains("ExistingRDD"), p.take(2000))
    assert(!p.contains("SerializeFromObject"),
      "decode subtree leaked past the fingerprint checkpoint")
  }

  test("minhash LSH verify stage: corpus word-sets fetched by shuffle joins, never broadcast") {
    // With size-based broadcast disabled, any BroadcastExchange left in
    // the plan can only come from an explicit broadcast() hint — which is
    // exactly the 100 TB scale bug this test pins out (the corpus word-set
    // side must not be forced into executor memory).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // Pin the DERIVATION plan (minhashPairsOn): the (spark, sfDir)
      // entry point is memoized via graft.Memo, so its plan is a
      // checkpoint scan after the first call — correct for consumers,
      // useless for pinning the pipeline's join strategy.
      val p = phys(graft.ext.Dedup.minhashPairsOn(
        graft.ops.Tables.documents(spark, sfDir)))
      assert(!p.contains("BroadcastExchange"),
        "minhash pipeline must not force-broadcast any side:\n" + p.take(3000))
      // Two side-by-side word-set fetches, each a shuffle hash join
      // building the BARE pair stream (bounded by pairs/partitions),
      // merged by one pair-keyed spillable sort-merge join. The old
      // chained-hint shape built pairs+wa arrays — unbounded, and the
      // non-spillable hash build OOM'd the executor at 10x scale (r14
      // sf1 stress finding).
      assert("ShuffledHashJoin".r.findAllIn(p).size == 2,
        "both word-set fetches should be shuffle hash joins:\n" + p.take(3000))
      assert(p.contains("SortMergeJoin"),
        "fetch results should merge via spillable sort-merge:\n" + p.take(3000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("embedding LSH: no forced broadcast, plane sums inside whole-stage codegen") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = phys(graft.ext.Dedup.embeddingNearDups(spark, sfDir))
      assert(!p.contains("BroadcastExchange"),
        "embedding pipeline must not force-broadcast any side:\n" + p.take(3000))
      // r4 rewrite: the hyperplane sums are partial-aggregated codegen
      // sums, not interpreted higher-order lambdas — `aggregate(` in the
      // plan would mean the interpreted ArrayAggregate came back
      assert(!p.contains("aggregate(sequence"),
        "plane sums must stay in the explode+sum codegen shape:\n" + p.take(3000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("memo-served relations read WRITTEN parquet, not RAM checkpoints " +
       "(r16: RAM localCheckpoint entries across a 314-query sweep drove " +
       "the driver host into paging)") {
    // The serving reads must be file scans; a LogicalRDD/ExistingRDD
    // scan means someone re-introduced a block-manager-resident entry.
    val pairs = phys(graft.ext.Dedup.minhashPairs(spark, sfDir))
    assert(pairs.contains("FileScan parquet") && !pairs.contains("ExistingRDD"),
      s"minhash_pairs must serve from written parquet:\n$pairs")
    val clusters = phys(graft.ext.Dedup.dedupClusters(spark, sfDir))
    assert(clusters.contains("FileScan parquet") && !clusters.contains("ExistingRDD"),
      s"dedup_clusters must serve from written parquet:\n$clusters")
  }

  test("latest-state CDC: max_by hash aggregate, not a row_number window sort") {
    val p = phys(CdcQueries.latestState(spark, sfDir))
    assert(p.contains("max_by") || p.contains("HashAggregate") || p.contains("SortAggregate"))
    assert(!p.contains("row_number"), "latest-state must not sort every event")
  }

  test("decontamination: eval shingles broadcast into the probe, corpus never sort-merged") {
    // The benchmark suite is MBs at 100 TB — the probe must be a
    // broadcast join against the train shingle stream, and the corpus
    // must not be globally sorted for it.
    val p = phys(graft.ext.Dedup.decontaminatedCorpus(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      "eval n-gram probe must broadcast:\n" + p.take(3000))
    assert(!p.contains("SortMergeJoin"),
      "no corpus-scale sort-merge in the probe:\n" + p.take(3000))
  }

  test("incremental dedup: bloom prefilter sits under the band join, base index reused") {
    // The native might_contain probe must filter the fresh band stream
    // BEFORE the join (rows that miss the base bloom never shuffle; r19
    // — the r18 form was a row-level Scala UDF, now it is Spark's
    // codegen BloomFilterMightContain over a sketch literal), and the
    // base bands must come from the persisted index (InMemoryTableScan),
    // not a re-derivation per probe.
    val p = phys(graft.ext.Dedup.incrementalCleaned(spark, sfDir))
    val filterIdx = p.indexOf("might_contain")
    assert(filterIdx >= 0, "bloom prefilter must appear in the plan:\n" + p.take(3000))
    assert(p.contains("InMemoryTableScan"),
      "base band index must be the persisted relation:\n" + p.take(3000))
  }

  test("bm25 scoring: no explode anywhere, scan reads only doc_id+text") {
    // a k-term query is k map-side counters + one broadcast stats row —
    // tokenizing-by-explode would shuffle corpus_tokens rows instead
    val p = phys(graft.ext.Search.bm25TopK(spark, sfDir))
    assert(!p.contains("Generate"), "no explode in the scoring path:\n" + p.take(3000))
    assert(!p.contains("lang") && !p.contains("n_chars"),
      "unused document columns must be pruned:\n" + p.take(3000))
  }

  test("basket pairs: brand dim broadcasts onto the scan, no cartesian") {
    val p = phys(AdvancedAnalytics.basketPairs(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "pair join must stay an equi-join:\n" + p.take(3000))
  }

  test("scan by-key: one hash shuffle; the user's global sort is elided under it") {
    import spark.implicits._
    val ev = (1 to 100).map(i => (i % 5, i, if (i % 3 == 0) "view" else "purchase"))
      .toDF("k", "seq", "t")
    val df = graft.kql.KqlParser.run(
      "T | sort by k asc, seq asc | scan by k with ( step a: t == 'view'; step b: t == 'purchase'; )",
      Map("T" -> ev))
    val p = phys(df)
    // EliminateSorts must drop the orderBy below the repartition — a
    // range shuffle + full sort ahead of the key shuffle would double
    // the scan's cost at 100 TB for zero semantic effect
    assert(!p.contains("rangepartitioning"),
      "global sort before a by-key scan must be elided:\n" + p.take(3000))
    assert("Exchange".r.findAllIn(p).size == 1,
      "exactly one hash shuffle on the scan keys:\n" + p.take(3000))
  }

  test("tdigest: two-level build — rank window partitioned by group, no raw-value collect") {
    val p = phys(graft.SparkEntry.queries("kql_tdigest")(spark, sfDir))
    // the r17 build buffered each group via array_sort(collect_list(raw));
    // the r18 two-level form ranks through a spill-safe window and the
    // only collect is the ≤32-centroid struct list (VERDICT r17 #1)
    assert(p.contains("row_number()"), p.take(2000))
    assert(p.contains("windowspecdefinition(__gk0"),
      "rank window must partition by the group key:\n" + p.take(3000))
    assert(!p.contains("collect_list(cast"),
      "no unbounded raw-value collect_list:\n" + p.take(3000))
    assert(p.contains("collect_list(struct(m,"),
      "digest collect must be over centroid structs:\n" + p.take(3000))
  }

  test("geo lookup verbs: dim cells broadcast onto the point scan, no sort-merge") {
    // the cover-join shape re-exposed as evaluate plugins (r18): the
    // lookup table's cell fan-out must BROADCAST into an equi-join on
    // the point's cell — a sort-merge here would shuffle the corpus
    val pp = phys(graft.SparkEntry.queries("kql_geo_polygon_lookup")(spark, sfDir))
    assert(pp.contains("BroadcastHashJoin"), pp.take(2000))
    assert(!pp.contains("SortMergeJoin"), "polygon lookup must not sort-merge")
    val lp = phys(graft.SparkEntry.queries("kql_geo_line_lookup")(spark, sfDir))
    assert(lp.contains("BroadcastHashJoin"), lp.take(2000))
    assert(!lp.contains("SortMergeJoin"), "line lookup must not sort-merge")
  }

  test("sequence packing: window partitions by shard — no single global sort of the corpus") {
    val p = phys(graft.ext.TextAnalysis.packSequences(spark, sfDir))
    assert(p.contains("Window"), p.take(2000))
    // the sort under the window must be a per-shard partial sort, and
    // the exchange hash-partitions on shard (no Exchange SinglePartition)
    assert(p.contains("hashpartitioning(shard"),
      "cumulative sum must be sharded:\n" + p.take(3000))
    assert(!p.contains("SinglePartition"),
      "no single-partition global window:\n" + p.take(3000))
  }
}
