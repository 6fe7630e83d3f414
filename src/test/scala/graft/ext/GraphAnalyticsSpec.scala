package graft.ext

import graft.SparkSpec

/** Structural invariants of the fixed-point PageRank that the DuckDB
  * oracle (an exact unroll) cannot meaningfully restate. */
class GraphAnalyticsSpec extends SparkSpec {

  test("pagerank: mass conserved up to floor leakage, degree drives rank") {
    val rows = GraphAnalytics.pageRank(spark, sfDir).collect()
    val scale = 1000000000000L
    assert(rows.nonEmpty)
    val pr = rows.map(r => (r.getAs[Long]("node"), r.getAs[Long]("pr_micro"),
      r.getAs[Long]("outdeg")))
    assert(pr.forall(_._2 > 0), "every node keeps positive rank (teleport term)")
    // floor-division leaks < 1 unit per (edge, iteration) plus the
    // damping floor per node — bounded well under 1% of total mass
    val total = pr.map(_._2).sum
    assert(total <= scale, s"mass cannot exceed total: $total")
    assert(total >= (scale * 99) / 100, s"floor leakage too large: $total")
    // the hub effect: the best-connected node outranks the least-
    // connected one (suppliers serve many parts in this graph)
    val byDeg = pr.sortBy(_._3)
    assert(byDeg.last._2 > byDeg.head._2,
      s"max-degree node ${byDeg.last} must outrank min-degree ${byDeg.head}")
  }

  test("lpa: disconnected components converge to separate min-label communities") {
    import spark.implicits._
    // two disjoint 4-cycles: 1-2-3-4 and 10-11-12-13
    def cycle(ns: Seq[Long]) = ns.zip(ns.tail :+ ns.head)
    val pairs = cycle(Seq(1L, 2L, 3L, 4L)) ++ cycle(Seq(10L, 11L, 12L, 13L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val lab = GraphAnalytics.lpaCore(edges, iterations = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each component shares one label; components never merge
    val c1 = Seq(1L, 2L, 3L, 4L).map(lab)
    val c2 = Seq(10L, 11L, 12L, 13L).map(lab)
    assert(c1.distinct.size == 1 && c2.distinct.size == 1)
    assert(c1.head != c2.head)
    // min-label tie-break: all round-1 neighbor counts are 1 in a
    // cycle, so labels flow downhill — the community label is the
    // component's minimum id
    assert(c1.head == 1L && c2.head == 10L)
  }

  test("textrank: hub words outrank peripheral words") {
    val rows = GraphAnalytics.textRank(spark, sfDir, k = 25).collect()
    assert(rows.length == 25)
    val ranks = rows.map(r => r.getString(0) -> r.getAs[Long]("pr_micro")).toMap
    // ranks are strictly positive and the list is rank-sorted distinctly
    assert(ranks.values.forall(_ > 0))
    // the top word's co-occurrence weight is substantial: centrality
    // can't select a word seen in only one context
    val top = rows.maxBy(_.getAs[Long]("pr_micro"))
    assert(top.getAs[Long]("cooc_weight") > 1,
      s"top keyword ${top} must have multiple co-occurrence contexts")
  }
}
