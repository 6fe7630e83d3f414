package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hot-bucket skew stress for the LSH band self-join — the claim in
  * [[Dedup]]'s header ("AQE skew-join splitting handles it") made
  * measurable. A planted corpus puts 1200 near-identical docs into ONE
  * (lang, band, key) bucket; the band self-join then has a single hot
  * key holding ~1200² candidate rows while every other bucket is tiny.
  *
  * What AQE can and cannot do here: a hot KEY cannot be split across
  * partitions semantically, but OptimizeSkewedJoin splits the hot
  * PARTITION on one side into byte-bounded chunks and replays the
  * other side's partition against each chunk — exactly the right
  * mitigation for a hot bucket, turning one monster task into many
  * bounded ones. The test drops the skew thresholds to toy scale
  * (they default to 256 MB) and asserts the final adaptive plan
  * actually took that path, plus output correctness.
  *
  * What AQE does NOT fix is the n² candidate-pair volume itself —
  * that is bounded by band width r (wider bands ⇒ exponentially
  * smaller collision probability for non-identical docs) and by
  * removing exact duplicates first ([[Dedup.exactDedupOn]] keeps one
  * doc per identical text, and identical docs are the only way to
  * produce unboundedly hot buckets that banding cannot shrink). Both
  * mitigations are documented in [[Dedup]]'s header.
  */
class SkewSpec extends SparkSpec {

  test("hot LSH band bucket: AQE splits the skewed self-join partition; results exact") {
    // Isolated child session: same SparkContext, PRIVATE SQLConf — the
    // toy-scale skew thresholds below can never leak into suites that
    // share the base session (restore-in-finally only protects
    // sequential runs; a private conf protects concurrent ones too).
    val session = spark.newSession()
    import session.implicits._

    val hotN = 1200
    // 1200 identical docs (one band bucket, the adversarial case exact
    // dedup would normally remove) + 300 all-distinct docs
    val hot = (0 until hotN).map(i =>
      (i.toLong, "spark shuffle partition skew adaptive execution splits hot buckets", "en"))
    val cold = (0 until 300).map(i =>
      (10000L + i, s"unique${i}a unique${i}b unique${i}c unique${i}d unique${i}e", "en"))
    val docs = (hot ++ cold).toDF("doc_id", "text", "lang")
      .withColumn("source", lit("test")).withColumn("n_chars", length(col("text")))

    val conf = session.conf
    // Broadcast off: at 100 TB neither band side fits in the driver,
    // and the skew path only exists for shuffle joins. Thresholds
    // scaled to toy bytes so the 1200-doc bucket registers as skewed.
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // Detection compares COMPRESSED shuffle bytes: a bucket of
    // identical band-key strings compresses brutally while the cold
    // buckets' distinct strings do not, so the hot partition's byte
    // ratio understates its 4x row skew — factor 1.2 (not the default
    // 5) is what registers it at toy scale. At production scale the
    // same effect means row-skew from near-identical docs needs a
    // lower factor than byte-intuition suggests.
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512b")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    val pairs = Dedup.minhashPairsOn(docs)
    // collect() executes pairs' OWN queryExecution (count() would spin
    // up a separate tree and leave this one isFinalPlan=false)
    val n = pairs.collect().length.toLong
    // every identical-doc pair verifies at jaccard 1.0; distinct docs
    // share no words, so they contribute nothing
    assert(n == hotN.toLong * (hotN - 1) / 2,
      s"expected ${hotN.toLong * (hotN - 1) / 2} hot pairs, got $n")

    // the final adaptive plan must have taken the skew-split path on
    // the band self-join (SMJ/SHJ marked skew=true, or an
    // AQEShuffleRead with skewed partition splits)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true") || plan.contains("skewed"),
      s"no skew-split marker in the adaptive plan:\n${plan.take(4000)}")
  }
}
