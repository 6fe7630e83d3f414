package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the deterministic sketches and the r6
  * curation operators — the properties the DuckDB hash-compare can't
  * state (the oracle proves cross-engine equality; these prove the
  * answers MEAN what they claim). */
class SketchesSpec extends SparkSpec {

  test("CMS estimates never under-count, and every probed word is a true top word") {
    val out = Sketches.cmsHeavyHitters(spark, sfDir).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val (t, e) = (r.getAs[Long]("n_true"), r.getAs[Long]("est"))
      assert(e >= t, s"CMS under-counted ${r.getAs[String]("word")}: est $e < true $t")
    }
  }

  test("CMS recovers a planted heavy hitter's count exactly when rows are sparse") {
    import spark.implicits._
    // One word repeated 50×, nine singletons: with 4 rows × 1024 buckets
    // the planted word shares all four of its buckets with nothing
    // (deterministic given md5), so min-over-rows is EXACT.
    val docs = (
      Seq((0L, Array.fill(50)("zebra").mkString(" "))) ++
      (1L to 9L).map(i => (i, s"lonetoken$i"))
    ).toDF("doc_id", "text")
    val out = Sketches.cmsHeavyHittersOn(docs)
      .filter(col("word") === "zebra").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_true") == 50L)
    assert(out.head.getAs[Long]("est") == 50L)
  }

  test("FM sketch on a planted 1000-key stream estimates within sketch error") {
    import spark.implicits._
    val keyed = (1L to 3000L).map(k => ("P", k % 1000))
      .toDF("priority", "o_custkey")
    val r = Sketches.fmDistinctOn(keyed).collect()
    assert(r.length == 1)
    val est = r.head.getAs[Double]("est")
    // truth = 1000; duplicates must not inflate the estimate (max is
    // idempotent) and the floor'd-exponent PCSA stays within its error.
    assert(est >= 1000 / 6.0 && est <= 1000 * 4.0, s"est $est vs true 1000")
  }

  test("FM merge: register-wise max equals a sketch built on the union; merge != sum") {
    import spark.implicits._
    // the SAME 1..800 key set appears under every priority: the merged
    // sketch must see ~800 distinct, while summing per-group estimates
    // counts the shared keys five times over
    val keyed = (for { p <- 'A' to 'E'; k <- 1L to 800L } yield (p.toString, k))
      .toDF("priority", "o_custkey")
    val m = Sketches.fmMergeOn(keyed).collect().head
    val merged = m.getAs[Double]("est")
    val groupSum = m.getAs[java.math.BigDecimal]("sum_group_est").doubleValue
    assert(m.getAs[Long]("n_true") == 800L)
    // merged estimate ~ one group's estimate (identical key sets merge
    // to the identical sketch); the naive sum is ~5x it
    assert(groupSum > merged * 3, s"sum_group_est $groupSum vs merged $merged")
    // the merge property itself: max-merged registers = the sketch of
    // the union, so the merged estimate equals fmDistinctOn over the
    // union under one label
    val direct = Sketches.fmDistinctOn(
      keyed.withColumn("priority", org.apache.spark.sql.functions.lit("ALL")))
      .collect().head.getAs[Double]("est")
    assert(merged == direct, s"merged $merged vs direct-union $direct")
  }

  test("FM distinct estimate lands within sketch error of the truth") {
    val out = Sketches.fmDistinct(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (est, truth) = (r.getAs[Double]("est"), r.getAs[Long]("n_true"))
      val nb = r.getAs[Long]("n_buckets")
      assert(nb >= 1 && nb <= 64)
      // 64-bucket PCSA stderr ≈ 13%; the floor'd exponent biases the
      // estimate down by at most 2×. [truth/6, truth·4] is far outside
      // anything but a broken sketch.
      assert(est >= truth / 6.0 && est <= truth * 4.0,
        s"FM estimate $est implausible vs true $truth for ${r.getAs[String]("priority")}")
    }
  }

  test("SemDeDup keeps no within-cluster pair above the threshold") {
    // Greedy dominated-drop invariant: any co-clustered pair with
    // cos >= 0.4 has its larger id dropped, so the KEPT set must be
    // pairwise sub-threshold within every cluster.
    graft.functions.VectorFunctions.register(spark)
    val kept = Similarity.semanticDedup(spark, sfDir)
    val e = graft.ops.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("n", expr("sqrt(graft_dot(v, v))"))
    val kv = kept.join(e, "vec_id")
    val a = kv.select(col("cent_id"), col("vec_id").as("ia"), col("v").as("va"), col("n").as("na"))
    val b = kv.select(col("cent_id"), col("vec_id").as("ib"), col("v").as("vb"), col("n").as("nb"))
    val violations = a.join(b, Seq("cent_id")).filter(col("ia") < col("ib"))
      .withColumn("cos", round(expr("graft_dot(va, vb)") / (col("na") * col("nb")), 6))
      .filter(col("cos") >= 0.4)
      .count()
    assert(violations == 0L)
    assert(kept.count() > 0L)
  }

  test("BPE merge step counts overlapping pairs weighted by word frequency") {
    import spark.implicits._
    // "aaab" has pairs aa (i=1), aa (i=2), ab (i=3); word count 2 →
    // aa: 4, ab: 2. The 1-char word "x" must contribute nothing.
    val docs = Seq((0L, "aaab x"), (1L, "aaab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeMergeStepOn(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("aa" -> 4L, "ab" -> 2L))
  }

  test("BPE training recovers a planted merge sequence") {
    import spark.implicits._
    // Corpus of "abab" x3 and "cd" x2: char pairs are ab:6 (2 per word
    // x3), ba:3, cd:2. Step 1 merges "a b" -> ab giving seqs "ab ab";
    // step 2 then sees pair "ab ab":3 vs "c d":2 and merges "ab ab".
    val docs = Seq((0L, "abab abab abab cd cd")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrainOn(docs, steps = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out(0) == ((1, "a b", 6L)))
    assert(out(1) == ((2, "ab ab", 3L)))
    assert(out(2) == ((3, "c d", 2L)))
  }

  test("BPE two-pass merge application is a fixpoint") {
    // The operator applies each merge as replace-run-twice over the
    // padded sequence; a third pass must change nothing, for any run
    // length or alternation (the property that makes the application
    // order-deterministic and engine-portable).
    def applyTwice(s: String, pair: String, merged: String, times: Int): String =
      (1 to times).foldLeft(" " + s + " ")((acc, _) =>
        acc.replace(" " + pair + " ", " " + merged + " ")).trim
    for (n <- 2 to 12) {
      val run = List.fill(n)("a").mkString(" ")
      assert(applyTwice(run, "a a", "aa", 2) == applyTwice(run, "a a", "aa", 3))
      val alt = List.fill(n)("a b").mkString(" ")
      assert(applyTwice(alt, "a b", "ab", 2) == applyTwice(alt, "a b", "ab", 3))
    }
  }

  test("quality classifier: exact token count, bounded score, decision = sign") {
    val out = TextAnalysis.qualityClassifier(spark, sfDir)
    val docs = graft.ops.Tables.documents(spark, sfDir)
      .selectExpr("doc_id",
        "cast(length(text) - length(replace(text, ' ', '')) + 1 as bigint) as n_ws")
    val joined = out.join(docs, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("n_words") == r.getAs[Long]("n_ws"))
      val s = r.getAs[Double]("score")
      assert(s >= -1.0 && s <= 1.0)
      assert(r.getAs[Boolean]("keep") == (s > 0.0))
    }
  }
}
