package graft.ext

import graft.SparkSpec

/** k-scaling contract for SemDeDup's cluster-then-compare (r8: k is a
  * real knob fed from the IVF trainer, not a hard-coded seed scan).
  * The within-cluster candidate-pair count — the quadratic term the
  * clustering exists to bound, Σ n·(n−1)/2 over cluster sizes — must
  * SHRINK as the trained cluster count k grows; that shrinkage is the
  * entire scale argument for SemDeDup at 100 TB, so it gets pinned
  * here rather than asserted in a docstring. */
class SemDeDupSpec extends SparkSpec {

  private def candidatePairs(k: Int): Long =
    Similarity.semanticAssign(spark, sfDir, k)
      .groupBy("cent_id").count().collect()
      .map { r => val n = r.getAs[Long]("count"); n * (n - 1) / 2 }
      .sum

  test("candidate-pair count shrinks as the trained cluster count grows") {
    val pairs = Seq(2, 8, 32).map(k => k -> candidatePairs(k)).toMap
    assert(pairs(2) > pairs(8) && pairs(8) > pairs(32),
      s"within-cluster pair count did not shrink with k: $pairs")
  }

  test("assignment is a partition of the corpus at any k") {
    val total = graft.ops.Tables.embeddings(spark, sfDir).count()
    for (k <- Seq(2, 32)) {
      val asg = Similarity.semanticAssign(spark, sfDir, k)
      assert(asg.count() == total, s"k=$k: assignment dropped/duplicated rows")
      assert(asg.select("vec_id").distinct().count() == total)
    }
  }

  test("parameterized k produces a non-empty kept set bounded by the corpus") {
    val total = graft.ops.Tables.embeddings(spark, sfDir).count()
    for (k <- Seq(4, 16, 64)) {
      val kept = Similarity.semanticDedup(spark, sfDir, k = k).count()
      assert(kept > 0L && kept <= total, s"k=$k: kept $kept of $total")
    }
  }
}
