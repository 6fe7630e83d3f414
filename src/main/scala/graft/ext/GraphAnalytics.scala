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
               iterations: Int = 3): DataFrame =
    prReport(weightedPageRank(psEdges(spark, sfDir), iterations))

  /** [[pageRank]] served from the WRITE-TIME bucketed edge table — the
    * 100 TB layout the scaladocs promise, made runnable: the edge
    * relation is written ONCE bucketed+sorted by src
    * ([[servedPsEdges]]), and every superstep's rank⋈edges join then
    * plans with NO Exchange on the edge side (only the node-sized rank
    * relation shuffles per round, plus the unavoidable dst-keyed
    * message aggregate). Same fixed-point arithmetic, same oracle as
    * graph_pagerank; BucketedServeSpec pins the exchange-free edge
    * side on the physical plan. */
  def pageRankBucketed(spark: SparkSession, sfDir: String,
                       iterations: Int = 3): DataFrame =
    prReport(weightedPageRankServed(servedPsEdges(spark, sfDir), iterations))

  private def prReport(pr: DataFrame): DataFrame =
    pr.select(col("node"),
      when(col("node") % 2 === 0, lit("part")).otherwise(lit("supplier"))
        .as("node_type"),
      col("pr").as("pr_micro"), col("wdeg").as("outdeg"))

  /** The symmetrized part↔supplier edge relation lineitem induces —
    * shared by [[pageRank]] and [[labelPropagation]]. */
  private def psEdges(spark: SparkSession, sfDir: String): DataFrame =
    psEdgesOf(Tables.lineitem(spark, sfDir))

  /** [[psEdges]] over an injected lineitem frame — the seam the
    * delta-append path splits its batches through. */
  private def psEdgesOf(li: DataFrame): DataFrame = {
    val pairs = li
      .select((col("l_partkey").cast("bigint") * 2).as("p"),
        (col("l_suppkey").cast("bigint") * 2 + 1).as("s"))
      .distinct()
    pairs.select(col("p").as("src"), col("s").as("dst"), lit(1L).as("w"))
      .union(pairs.select(col("s").as("src"), col("p").as("dst"), lit(1L).as("w")))
  }

  /** Bucket count for the served edge layout. 8 matches the toy-scale
    * corpus (and BucketingSpec's fixtures); a 1000-executor deployment
    * sizes this to cluster parallelism at WRITE time — the whole point
    * is that the per-superstep join inherits the layout instead of
    * re-shuffling, so the knob is paid once per ingest, not per query. */
  // NOT Memo.ServingBuckets (32): the edge table feeds ITERATIVE
  // supersteps, so bucket count multiplies task launches per round —
  // at bench scale 32 buckets × ~10 rounds of tiny per-round data
  // cost ~+1 s of pure scheduling vs 8 (measured). A real deployment
  // sizes this to its executor count at ingest like the other layouts.
  private val EdgeBuckets = 8

  /** The write-time serving layout for the iterative cores: the edge
    * relation written ONCE per corpus snapshot as a bucketed+sorted
    * (by src) table, memoized via [[graft.Memo]] (corpus-fingerprinted
    * key, so a data rewrite re-writes the table). Returns the TABLE
    * SCAN — deliberately not a checkpoint: the scan carries the bucket
    * layout as its output partitioning, which is what makes every
    * downstream src-keyed join and aggregate exchange-free on this
    * side. */
  private[ext] def servedPsEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val table = "graft_edges_ps_" + graft.Memo.pathDigest(sfDir)
    // r19: marker-backed — a fresh session over an unchanged corpus
    // re-registers the written bucketed files instead of re-deriving
    graft.Memo.cachedServedTable(spark, sfDir, "ps_edges_bucketed",
        table, bucketCols = Seq("src"), buildTag = "r19-edges",
        buckets = EdgeBuckets) {
      psEdges(spark, sfDir).write
        .bucketBy(EdgeBuckets, "src").sortBy("src")
        .mode("overwrite").saveAsTable(table)
    }
  }

  /** [[pageRankBucketed]]'s INCREMENTAL maintenance path — the third
    * served layout to get the append story (after the band table and
    * the IVF assignment). The edge relation is NOT per-row (a
    * cross-batch `distinct` dedupes pairs), so the append must
    * DEDUPE AGAINST THE SERVED BASE: the new batch's edges anti-join
    * the table before appending under the same bucketBy(src) spec —
    * the nightly edge-ingest shape (new edges only; re-observed edges
    * are no-ops because w ≡ 1). base-distinct ∪ (batch-distinct ∖
    * base) = full-distinct, so the merged table is row-identical to
    * the full rebuild and PageRank over it reproduces [[pageRank]]
    * bit-for-bit (oracle reused verbatim). Appended buckets keep the
    * hash clustering (sort drops with multi-file buckets), so the
    * superstep edge side still plans no Exchange — DeltaServeSpec
    * pins plan + equivalence. Registered split: edges induced by
    * every 5th order arrive as the append batch. */
  def pageRankDelta(spark: SparkSession, sfDir: String,
                    iterations: Int = 3): DataFrame = {
    val table = "graft_edges_delta_" + graft.Memo.pathDigest(sfDir)
    val edges = graft.Memo.cachedServedTable(spark, sfDir, "ps_edges_delta",
        table, bucketCols = Seq("src"), buildTag = "r19-edges-delta",
        buckets = EdgeBuckets) {
      val li = Tables.lineitem(spark, sfDir)
      psEdgesOf(li.filter(col("l_orderkey") % 5 =!= 0)).write
        .bucketBy(EdgeBuckets, "src").sortBy("src")
        .mode("overwrite").saveAsTable(table)
      psEdgesOf(li.filter(col("l_orderkey") % 5 === 0))
        .join(spark.table(table), Seq("src", "dst"), "left_anti")
        .write.bucketBy(EdgeBuckets, "src").sortBy("src")
        .mode("append").saveAsTable(table)
    }
    prReport(weightedPageRankServed(edges, iterations))
  }

  /** The iterative core, generalized to WEIGHTED edges and any node
    * key type: `edges0` is (src, dst, w ≥ 1); rank flows proportional
    * to edge weight. Fixed-point determinism: the per-unit-weight share
    * floors FIRST (pr DIV wdeg) and then multiplies by w — exact
    * BIGINT with no overflow at any corpus (pr ≤ 10¹², w ≤ wdeg), at
    * the cost of slightly more floor leakage (still < wdeg units per
    * node per iteration). Every node must appear as a src
    * (symmetrize first); 3 iterations ≅ the TextRank/PageRank
    * convergence plateau for ranking purposes. */
  private[ext] def weightedPageRank(edges0: DataFrame,
                                    iterations: Int = 3): DataFrame =
    // repartition by src BEFORE the checkpoint (r20, guide §2.4): the
    // checkpoint scan then carries hash(src) as its output
    // partitioning, so every superstep's rank⋈edges join reuses it —
    // the plain variant gets the bucketed table's exchange-free edge
    // side, paid once at derivation instead of once per round
    weightedPageRankServed(
      edges0.repartition(col("src")).localCheckpoint(true), iterations)

  /** The superstep loop over an ALREADY-SERVED edge relation — either
    * the localCheckpoint [[weightedPageRank]] materializes, or a
    * WRITE-TIME bucketed table scan ([[pageRankBucketed]]), in which
    * case every superstep's rank⋈edges join runs with NO Exchange on
    * the edge side (the bucket layout IS the join partitioning;
    * BucketedServeSpec pins this on the physical plan). */
  /** One PageRank superstep's message pass — factored so
    * BucketedServeSpec can pin the in-loop plan (the loop checkpoints
    * each round, so the final frame's plan no longer shows the
    * superstep): rank⋈degree⋈edges keyed on src, then the dst-keyed
    * message aggregate. With a src-bucketed `edges` the edge side
    * plans no Exchange; deg (derived from the same scan) none either —
    * only the node-sized rank relation and the edge-sized messages
    * shuffle. */
  private[ext] def prContrib(pr: DataFrame, deg: DataFrame,
                             edges: DataFrame): DataFrame =
    pr.join(deg, pr("node") === deg("src"))
      .join(edges, Seq("src"))
      .select(col("dst"), expr("(pr DIV wdeg) * w").as("c"))
      .groupBy(col("dst")).agg(sum(col("c")).as("csum"))

  private[ext] def weightedPageRankServed(edges: DataFrame,
                                          iterations: Int): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(sum(col("w")).as("wdeg"))
      .localCheckpoint(true)
    val n = deg.count() // node count (symmetrized => every node a src)
    val scale = 1000000000000L
    val base = (15L * scale) / (100L * n)
    var pr = deg.select(col("src").as("node"), lit(scale / n).as("pr"))
    // no per-round checkpoint (r20): each pr feeds the next round
    // exactly once and deg/edges are already checkpointed scans, so
    // the unrolled plan recomputes nothing — the 3 eager
    // materialization jobs per query were pure scheduling overhead,
    // and lineage depth is bounded by the fixed iteration count
    for (_ <- 1 to iterations) {
      val contrib = prContrib(pr, deg, edges)
      pr = deg.select(col("src").as("node"))
        .join(contrib, col("node") === col("dst"), "left_outer")
        .select(col("node"),
          (lit(base) + expr("85L * coalesce(csum, 0L) DIV 100")).as("pr"))
    }
    pr.join(deg, pr("node") === deg("src"))
      .select(col("node"), col("pr"), col("wdeg"))
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004, "TextRank:
    * Bringing Order into Text"): [[weightedPageRank]] over the corpus
    * word co-occurrence graph — adjacent-word pairs, symmetrized,
    * weight = corpus co-occurrence count — emitting the top-`k` words
    * by rank (ties broken by word). The graph-centrality keyword
    * extractor a curation pipeline runs next to the frequency-based
    * [[TextAnalysis.vocabCoverage]]: high-rank words are CONNECTED to
    * many distinct high-rank contexts, not merely frequent.
    *
    * Shape: the bigram pass is the codegen posexplode+lead shape
    * ([[TextAnalysis.bigramPerplexity]]); the edge aggregate is keyed
    * by word pair (vocab²-bounded, corpus-independent); iterations are
    * [[weightedPageRank]]'s join-per-superstep; the final top-k is a
    * TakeOrdered over the vocab-sized rank relation, never the corpus. */
  def textRank(spark: SparkSession, sfDir: String, k: Int = 25): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val bigrams = Tables.documents(spark, sfDir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w1")))
      .withColumn("w2", lead(col("w1"), 1).over(w))
      .filter(col("w2").isNotNull)
      .select(col("w1"), col("w2"))
    val sym = bigrams.select(col("w1").as("src"), col("w2").as("dst"))
      .union(bigrams.select(col("w2").as("src"), col("w1").as("dst")))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
    weightedPageRank(sym, 3)
      .orderBy(col("pr").desc, col("node").asc)
      .limit(k)
      .select(col("node").as("word"), col("pr").as("pr_micro"),
        col("wdeg").as("cooc_weight"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) over the same
    * part↔supplier graph as [[pageRank]] — community detection.
    * DETERMINISTIC variant (LPA is famously order-sensitive; the async
    * random-order form is not reproducible on a distributed engine):
    * labels start as node ids, and each synchronous round every node
    * adopts the label most frequent among itself and its neighbors
    * (self-vote — see [[lpaCore]]), ties broken by SMALLEST label. Fixed 3 rounds (the component-discovery
    * plateau on this graph shape). Output: one row per surviving
    * community with node/part/supplier counts.
    *
    * Scale shape per round: one edge⋈label join (dst-keyed) + one
    * (src, label) aggregate + one per-src argmax — the same
    * join-per-superstep budget as [[weightedPageRank]], with
    * localCheckpoint breaking lineage growth. */
  def labelPropagation(spark: SparkSession, sfDir: String,
                       iterations: Int = 3): DataFrame =
    lpaReport(lpaCore(psEdges(spark, sfDir).select(col("src"), col("dst")),
      iterations))

  /** [[labelPropagation]] from the same write-time bucketed edge table
    * as [[pageRankBucketed]] — src-keyed message flow means ONE layout
    * serves both iterative cores; the per-round edge⋈label join plans
    * with no Exchange on the edge side. */
  def labelPropagationBucketed(spark: SparkSession, sfDir: String,
                               iterations: Int = 3): DataFrame =
    lpaReport(lpaCoreServed(
      servedPsEdges(spark, sfDir).select(col("src"), col("dst")), iterations))

  private def lpaReport(lab: DataFrame): DataFrame =
    lab.groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(when(col("node") % 2 === 0, 1L).otherwise(0L)).as("n_parts"),
        sum(when(col("node") % 2 === 1, 1L).otherwise(0L)).as("n_suppliers"))

  /** The synchronous-LPA core: `edges0` is a SYMMETRIZED (src, dst)
    * relation; returns the final (node, label) assignment. Every node
    * votes its OWN current label alongside its neighbors' (self-vote)
    * — the standard damping without which the synchronous variant
    * bi-oscillates forever on bipartite structures (4-cycles, and this
    * engine's part↔supplier graph itself). */
  private[ext] def lpaCore(edges0: DataFrame, iterations: Int): DataFrame =
    // src-repartitioned checkpoint — same exchange-free per-round edge
    // side as weightedPageRank (r20, guide §2.4)
    lpaCoreServed(edges0.repartition(col("src")).localCheckpoint(true),
      iterations)

  /** [[lpaCore]] over an ALREADY-SERVED edge relation (a checkpoint or
    * a write-time bucketed table scan — the seam
    * [[labelPropagationBucketed]] plugs into). Messages flow along the
    * edge SRC key — over a symmetrized edge set the vote multiset is
    * identical to dst-keyed flow (edge (x,y) contributes the vote
    * (y ← label(x)) here and (x,y)'s mirror contributes
    * (x ← label(y))), and src-keying means ONE src-bucketed layout
    * serves both this and [[weightedPageRankServed]]'s join. */
  private[ext] def lpaCoreServed(edges: DataFrame, iterations: Int): DataFrame = {
    var lab = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    for (_ <- 1 to iterations) {
      // LAZY checkpoint (r20): each round reads the previous labels
      // TWICE (the vote join + the self-vote union), so persistence is
      // load-bearing — but materializing it eagerly cost one scheduled
      // job per round; lazily it rides the next round's first read
      lab = lpaRound(lab, edges).localCheckpoint(false)
    }
    lab
  }

  /** One synchronous LPA round — factored so BucketedServeSpec can pin
    * the in-loop plan (the checkpoint per round hides it from the
    * final frame): neighbor votes flow along the src-keyed edge join
    * (no Exchange on a src-bucketed edge side), then the dst-keyed
    * vote count and per-node argmax. */
  private[ext] def lpaRound(lab: DataFrame, edges: DataFrame): DataFrame = {
    val votes = edges.join(lab, edges("src") === lab("node"))
      .select(col("dst"), col("label"))
      .union(lab.select(col("node").as("dst"), col("label")))
    votes
      // ONE dst-keyed exchange serves BOTH aggregate levels (r19, guide
      // §2.4): HashPartitioning(dst) satisfies the (dst, label) count's
      // clustering (a subset of its keys) AND the per-dst argmax's, so
      // neither aggregate re-shuffles — the r18 plan exchanged twice
      // per round (once on (dst, label), once on dst). The trade is
      // shipping raw votes instead of (dst, label) partial counts; on a
      // sparse graph the multiplicity partial aggregation collapses is
      // ~1, so the single exchange wins at any scale.
      // SKEW caveat (r19 advice): a hub dst in a power-law graph now
      // receives ALL its raw votes in one partition per round. On this
      // engine's part↔supplier graph degree is bounded by the TPC-H
      // fanout (~flat), so the single exchange stands; a deployment on
      // heavy-tailed graphs should salt hot dst keys (two-level
      // aggregate: by (dst, salt) then dst — guide §2.5) or revert to
      // the two-exchange partial-aggregation plan for those keys.
      .repartition(col("dst"))
      .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("c"))
      // argmax by (count desc, label asc): max of (c, -label)
      .groupBy(col("dst"))
      .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
      .select(col("dst").as("node"), (-col("m.nl")).as("label"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> ((s: SparkSession, d: String) => pageRank(s, d)),
    "graph_pagerank_bucketed" -> ((s: SparkSession, d: String) => pageRankBucketed(s, d)),
    "graph_pagerank_delta" -> ((s: SparkSession, d: String) => pageRankDelta(s, d)),
    "graph_textrank" -> ((s: SparkSession, d: String) => textRank(s, d)),
    "graph_lpa" -> ((s: SparkSession, d: String) => labelPropagation(s, d)),
    "graph_lpa_bucketed" -> ((s: SparkSession, d: String) => labelPropagationBucketed(s, d)),
  )

  /** Unrolled 3-iteration oracle; the fixed-point arithmetic makes the
    * unroll exact (no rounding to reproduce). The _bucketed variants
    * reuse the plain oracles verbatim: the served layout must change
    * the PLAN (no edge-side Exchange), never the answer. */
  val oracleSql: Map[String, String] = {
    val base = oracleSqlBase
    base +
      ("graph_pagerank_bucketed" -> base("graph_pagerank")) +
      ("graph_pagerank_delta" -> base("graph_pagerank")) +
      ("graph_lpa_bucketed" -> base("graph_lpa"))
  }

  private def oracleSqlBase: Map[String, String] = Map(
    "graph_lpa" -> {
      val rounds = (1 to 3).map { t =>
        s"""c$t AS (
           |  SELECT src, label, COUNT(*) AS c FROM (
           |    SELECT e.src, l.label FROM e JOIN l${t - 1} l ON e.dst = l.node
           |    UNION ALL SELECT node AS src, label FROM l${t - 1}) GROUP BY 1, 2),
           |l$t AS (
           |  SELECT src AS node, label FROM (
           |    SELECT src, label,
           |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY c DESC, label ASC) AS rk
           |    FROM c$t) WHERE rk = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH pairs AS (
         |  SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS s FROM lineitem),
         |e AS (SELECT p AS src, s AS dst FROM pairs
         |      UNION ALL SELECT s AS src, p AS dst FROM pairs),
         |l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
         |$rounds
         |SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |  CAST(SUM(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_parts,
         |  CAST(SUM(CASE WHEN node % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_suppliers
         |FROM l3 GROUP BY 1""".stripMargin
    },
    "graph_textrank" -> {
      val iters = (1 to 3).map { t =>
        s"""c$t AS (
           |  SELECT e.dst, SUM((p.pr // d.wdeg) * e.w) AS csum
           |  FROM pr${t - 1} p JOIN deg d ON p.node = d.src
           |  JOIN e ON e.src = p.node
           |  GROUP BY e.dst),
           |pr$t AS (
           |  SELECT d.src AS node,
           |    (SELECT base FROM consts)
           |      + 85 * COALESCE(c$t.csum, 0) // 100 AS pr
           |  FROM deg d LEFT JOIN c$t ON c$t.dst = d.src)""".stripMargin
      }.mkString(",\n")
      s"""WITH wd AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |bg AS (
         |  SELECT ws[i] AS w1, ws[i + 1] AS w2
         |  FROM wd, LATERAL (SELECT unnest(range(1, len(ws))) AS i)),
         |e AS (
         |  SELECT src, dst, COUNT(*) AS w FROM (
         |    SELECT w1 AS src, w2 AS dst FROM bg
         |    UNION ALL SELECT w2 AS src, w1 AS dst FROM bg)
         |  GROUP BY src, dst),
         |deg AS (SELECT src, SUM(w) AS wdeg FROM e GROUP BY src),
         |consts AS (
         |  SELECT COUNT(*) AS n,
         |    1000000000000 // COUNT(*) AS pr0,
         |    (15 * 1000000000000) // (100 * COUNT(*)) AS base
         |  FROM deg),
         |pr0 AS (SELECT src AS node, (SELECT pr0 FROM consts) AS pr FROM deg),
         |$iters
         |SELECT pr3.node AS word, CAST(pr3.pr AS BIGINT) AS pr_micro,
         |  CAST(deg.wdeg AS BIGINT) AS cooc_weight
         |FROM pr3 JOIN deg ON pr3.node = deg.src
         |ORDER BY pr3.pr DESC, pr3.node ASC LIMIT 25""".stripMargin
    },
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
