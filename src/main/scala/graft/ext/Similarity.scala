package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** [extension] Similarity search over the embedding column
  * (`Array[Float]`, unit-norm 64-d in the corpus, but norms are computed
  * rather than assumed).
  *
  * Two paths, matching how ANN is actually built on Spark:
  *  - brute-force cosine top-k: the exact baseline. Query set ⋈ corpus is
  *    a broadcast join at sane query counts (the corpus side never
  *    shuffles — the 100 TB plan is "broadcast the queries, scan the
  *    corpus once, per-partition top-k, merge k·P rows on the driver",
  *    which is exactly what Catalyst plans for broadcast-join +
  *    window-rank or TakeOrdered).
  *  - LSH (random-hyperplane) bucketing: deterministic integer-arithmetic
  *    hyperplanes → 8-bit signature → bucket join. Recall comes from
  *    probing, cost is bounded by bucket size. The bucket histogram and
  *    the bucketed top-k are both oracle-verified.
  *
  * Float parity: embeddings are cast float→double (exact) before any
  * arithmetic; products of doubles are IEEE-identical on both engines;
  * final cosines are rounded to 6 dp and ranked with (cos, id) tiebreaks
  * so last-ulp summation differences cannot flip results.
  */
object Similarity {

  private def vecs(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", expr("sqrt(graft_dot(v, v))"))
  }

  /** Normalize an injected (vec_id, v) frame to the (vec_id, v, norm)
    * contract [[vecs]] produces — the seam the planted-cluster specs
    * drive the ANN paths through. */
  private[ext] def vecsOf(spark: SparkSession, df: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    df.select(col("vec_id"), col("v").cast("array<double>").as("v"))
      .withColumn("norm", expr("sqrt(graft_dot(v, v))"))
  }

  /** Brute-force cosine top-k (k=5) for query vectors vec_id < 10. */
  def bruteForceTopK(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    val e = vecs(spark, sfDir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qn"))
    val c = e.select(col("vec_id").as("cand_id"), col("v").as("cv"), col("norm").as("cn"))
    val scored = broadcast(q).join(c, col("query_id") =!= col("cand_id"))
      .withColumn("cos", round(
        expr("graft_dot(qv, cv)") / (col("qn") * col("cn")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("cand_id"), col("cos"), col("rk").cast("int").as("rk"))
  }

  /** 8-plane random-hyperplane signature: plane p coefficient for
    * component i is ((p+1)·131 + i·137) mod 997 − 498 ∈ [−498, 498],
    * pure integer arithmetic so both engines build identical planes.
    * Bucket = Σ_p [dot(plane_p, v) ≥ 0] · 2^p ∈ [0, 255]. */
  private[ext] val bucketExpr =
    """aggregate(sequence(0, 7), 0, (acc, p) ->
      |  acc + IF(
      |    aggregate(zip_with(v, sequence(0, size(v) - 1), (x, i) ->
      |      x * (((p + 1) * 131 + i * 137) % 997 - 498)), 0d, (a, x) -> a + x) >= 0d,
      |    cast(pow(2, p) as int), 0))""".stripMargin

  /** LSH bucket histogram — the data layout an IVF/LSH index would
    * partition the corpus by (bucket = partition key at scale). */
  def lshBuckets(spark: SparkSession, sfDir: String): DataFrame =
    vecs(spark, sfDir)
      .withColumn("bucket", expr(bucketExpr))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))

  /** Bucketed ANN top-k: queries (vec_id < 10) search only their own
    * bucket — the bounded-cost approximate path. k=3. */
  def lshTopK(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    val e = vecs(spark, sfDir).withColumn("bucket", expr(bucketExpr))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qn"), col("bucket"))
    val c = e.select(col("vec_id").as("cand_id"), col("v").as("cv"),
      col("norm").as("cn"), col("bucket"))
    val scored = broadcast(q).join(c,
        Seq("bucket")).filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", round(
        expr("graft_dot(qv, cv)") / (col("qn") * col("cn")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("bucket").cast("int").as("bucket"),
        col("cand_id"), col("cos"), col("rk").cast("int").as("rk"))
  }

  /** IVF-style ANN serving from the TRAINED codebook — the same
    * 16-centroid book [[trainedCentroids]] assembles from one
    * [[ivfTrainStep]] Lloyd iteration (the train→serve handoff
    * [[semanticDedup]] already uses; until r10 this path served from
    * the raw seed vectors, a documented stand-in). Every corpus vector
    * is assigned to its nearest centroid (the inverted lists), queries
    * probe their nprobe=2 nearest lists.
    *
    * Scale shape: the codebook broadcasts (it's tiny even at nlist=65k),
    * assignment is one map-side pass over the corpus (at 100 TB the
    * corpus would then be WRITTEN partitioned by cent_id, making each
    * probe a partition-pruned scan), and each query touches only its
    * probed lists — cost is corpus_fraction × nprobe/nlist instead of a
    * full scan. Cosines round to 6 dp with id tiebreaks, as everywhere.
    */
  def ivfTopK(spark: SparkSession, sfDir: String, nprobe: Int = 2,
              k: Int = 3): DataFrame = {
    val e = vecs(spark, sfDir)
    val cents = broadcast(trainedCentroids(spark, sfDir, 16))
    val scored = e.join(cents)
      .withColumn("ccos", round(expr("graft_dot(v, cv)") / (col("norm") * col("cn")), 6))
    val wAsg = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cent_id").asc)
    // per-vector argmax by (ccos desc, cent_id asc) as max(struct(ccos,
    // -cent_id, payload)) — a hash aggregate whose map-side partial
    // combine collapses the nlist-expanded stream BEFORE the exchange
    // (the r18 row_number window shuffled corpus × nlist rows and
    // sorted them; -cent_id is unique per vector, so the struct order
    // equals the window's and the payload fields never tie-break)
    val assign = scored
      .groupBy(col("vec_id"))
      .agg(max(struct(col("ccos"), (-col("cent_id")).as("negid"))).as("m"),
        first(col("v")).as("v"), first(col("norm")).as("norm"))
      .select(col("vec_id").as("cand_id"), (-col("m.negid")).as("cent_id"),
        col("v").as("cv2"), col("norm").as("cn2"))
    val probes = scored.filter(col("vec_id") >= 10 && col("vec_id") < 20)
      .withColumn("rn", row_number().over(wAsg))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id").as("query_id"), col("cent_id"),
        col("v").as("qv"), col("norm").as("qn"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id").asc)
    probes.join(assign, "cent_id")
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", round(expr("graft_dot(qv, cv2)") / (col("qn") * col("cn2")), 6))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("cand_id"), col("cos"), col("rk").cast("int").as("rk"))
  }

  /** [[ivfTopK]] served from the WRITE-TIME partitioned layout (r12 —
    * the layout `BucketingSpec` proves, now carried by a registered
    * query): the assigned corpus is written ONCE under
    * `partitionBy(cent_id)` (Memo-backed, corpus-fingerprinted), and
    * the probe join reaches it through Spark's DYNAMIC PARTITION
    * PRUNING — the broadcast probe side's nprobe cent_ids prune the
    * scan to those directories, so serving cost scales with nprobe ·
    * list size, not corpus size. Same codebook, probes, rounding and
    * tie-breaks as [[ivfTopK]]; the oracle is reused verbatim.
    * BucketedServeSpec pins the DPP subquery on the physical plan. */
  def ivfTopKPartitioned(spark: SparkSession, sfDir: String, nprobe: Int = 2,
                         k: Int = 3): DataFrame =
    ivfProbeServe(spark, sfDir, ivfAssignPartitioned(spark, sfDir), nprobe, k)

  /** The served partitionBy(cent_id) assignment table (Memo-backed) —
    * shared by [[ivfTopKPartitioned]] and, as the DELTA path's base
    * source, by [[ivfDelta]]: the full-corpus assignment pass (16 ×
    * 64-d literal-codebook dot products per row) is the dominant cold
    * cost, and deriving it once serves both layouts (the same
    * seed-from-the-written-artifact shape as the dedup band tables). */
  private def ivfAssignPartitioned(spark: SparkSession, sfDir: String): DataFrame =
    graft.Memo.cachedServedDir(spark, sfDir, "ivf_assign_partitioned",
        "graft_ivf_assign_", buildTag = "r19-ivf-assign") { dir =>
      ivfAssignment(spark, sfDir)
        .write.partitionBy("cent_id").mode("overwrite").parquet(dir)
    }

  /** [[ivfTopKPartitioned]]'s INCREMENTAL maintenance path (r12 verdict:
    * the served layouts were full rewrites; a 100 TB deployment
    * APPENDS). Exactness argument, same shape as the inverted index's
    * `search_index_delta` proof: nearest-centroid assignment under a
    * FIXED codebook is per-row, so assignment(base ∪ batch) =
    * assignment(base) ∪ assignment(batch) — appending the new batch's
    * assignments under the same partitionBy(cent_id) spec is a
    * per-partition file insert whose merged table is row-identical to
    * the full rebuild, and the probe top-k over it reproduces
    * [[ivfTopK]] bit-for-bit (the oracle IS the full formulation,
    * reused verbatim). 100 TB shape: the append pass scans only the
    * new batch (one broadcast-codebook map-side assignment), touches
    * only the nprobe·batch-fraction partitions it lands in, and the
    * probe join still reaches the merged table through dynamic
    * partition pruning (DeltaServeSpec pins plan + equivalence).
    * Registered split: every 5th vector arrives as the append batch. */
  def ivfDelta(spark: SparkSession, sfDir: String, nprobe: Int = 2,
               k: Int = 3): DataFrame = {
    val served = graft.Memo.cachedServedDir(spark, sfDir, "ivf_assign_delta",
        "graft_ivf_delta_", buildTag = "r19-ivf-delta") { dir =>
      // r19 (r18 verdict #4): the BASE slice is a filtered re-write of
      // the already-served partitioned assignment table — assignment is
      // per-row under a fixed codebook, so filtering the full relation
      // on cand_id is row-identical to recomputing the base docs'
      // assignments (doubles round-trip parquet exactly), and the read
      // skips the 16×64-d dot-product pass entirely. The r18 build ran
      // the full-corpus assignment TWICE (once per filtered write);
      // this is also the production shape: a migration seeds a
      // delta-maintained table FROM the existing written one.
      ivfAssignPartitioned(spark, sfDir).filter(col("cand_id") % 5 =!= 0)
        .write.partitionBy("cent_id").mode("overwrite").parquet(dir)
      // The APPEND batch is the genuine ingest path: fresh vectors →
      // broadcast-codebook assignment (the cand_id filter pushes below
      // the dot products, so only the batch fifth is scored).
      ivfAssignment(spark, sfDir).filter(col("cand_id") % 5 === 0)
        .write.partitionBy("cent_id").mode("append").parquet(dir)
    }
    ivfProbeServe(spark, sfDir, served, nprobe, k)
  }

  /** The full corpus→nearest-centroid assignment relation
    * (cand_id, cv2, cn2, cent_id) — the write-time layout's content.
    *
    * Shape (r16 verdict #3 — this build cold-ran 65 s in the driver
    * environment vs 2.9 s committed): the codebook is tiny by
    * construction (nlist rows), so it is collected (bounded: 16 rows)
    * and folded into the assignment as LITERALS — the corpus pass is
    * then scan → project → write with ZERO shuffle, which is the
    * "broadcast the codebook, one map-side pass" 100 TB shape the
    * scaladoc always claimed. The previous window-argmax formulation
    * shuffled the nlist×-expanded corpus WITH the 64-d arrays attached
    * just to pick each row's max. Argmax = array_max over
    * struct(ccos, -cent_id): lexicographic struct ordering gives
    * (ccos desc, cent_id asc) — identical to the old window's
    * orderBy, and ccos is computed from the same codebook values
    * (exact doubles via typedLit, same graft_dot, same 6-dp round), so
    * results are bit-identical (DeltaServeSpec/BucketedServeSpec pin
    * equivalence vs [[ivfTopK]]). */
  private[ext] def ivfAssignment(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val cents = servedCodebook(spark, sfDir).collect()
    val scored = cents.toIndexedSeq.map { r =>
      val centId = r.getAs[Number]("cent_id").longValue
      val cv = r.getSeq[Double](r.fieldIndex("cv"))
      val cn = r.getAs[Double]("cn")
      struct(
        round(call_function("graft_dot", col("v"), typedLit(cv)) /
          (col("norm") * lit(cn)), 6).as("ccos"),
        lit(-centId).as("negid"))
    }
    vecs(spark, sfDir)
      .withColumn("best", array_max(array(scored: _*)))
      .select(col("vec_id").as("cand_id"), col("v").as("cv2"),
        col("norm").as("cn2"), (-col("best.negid")).cast("int").as("cent_id"))
  }

  private def ivfScored(spark: SparkSession, sfDir: String): DataFrame =
    vecs(spark, sfDir).join(broadcast(trainedCentroids(spark, sfDir, 16)))
      .withColumn("ccos", round(expr("graft_dot(v, cv)") / (col("norm") * col("cn")), 6))

  /** The trained codebook SERVED from written parquet (Memo-backed) —
    * what the probe paths read. A production deployment trains ONCE
    * per corpus snapshot and writes the codebook next to the
    * partitioned assignment; re-running the Lloyd pass over the whole
    * corpus per probe query (what [[ivfScored]] does, the honest shape
    * for the one-shot [[ivfTopK]] formulation) is exactly the cost the
    * written index exists to avoid at 100 TB. Doubles round-trip
    * parquet exactly, so the served rows are bit-identical to
    * [[trainedCentroids]] and every downstream rounding chain — and
    * therefore the oracles — are unchanged (equivalence vs the full
    * formulation pinned by BucketedServeSpec/DeltaServeSpec). */
  private def servedCodebook(spark: SparkSession, sfDir: String): DataFrame =
    graft.Memo.cachedServedDir(spark, sfDir, "ivf_codebook",
        "graft_ivf_codebook_", buildTag = "r19-codebook") { dir =>
      trainedCentroids(spark, sfDir, 16)
        .write.mode("overwrite").parquet(dir)
    }

  /** [[ivfScored]] against the SERVED codebook — the probe-side form. */
  private def ivfScoredServed(spark: SparkSession, sfDir: String): DataFrame =
    vecs(spark, sfDir).join(broadcast(servedCodebook(spark, sfDir)))
      .withColumn("ccos", round(expr("graft_dot(v, cv)") / (col("norm") * col("cn")), 6))

  /** The probe-side top-k over a SERVED assignment table — the tail
    * [[ivfTopKPartitioned]] and [[ivfDelta]] share. */
  private[ext] def ivfProbeServe(spark: SparkSession, sfDir: String,
                                 served: DataFrame, nprobe: Int, k: Int): DataFrame = {
    val wAsg = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cent_id").asc)
    val probes = ivfScoredServed(spark, sfDir)
      .filter(col("vec_id") >= 10 && col("vec_id") < 20)
      .withColumn("rn", row_number().over(wAsg))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id").as("query_id"), col("cent_id").cast("int").as("cent_id"),
        col("v").as("qv"), col("norm").as("qn"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id").asc)
    broadcast(probes).join(served, "cent_id")
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", round(expr("graft_dot(qv, cv2)") / (col("qn") * col("cn2")), 6))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("cand_id"), col("cos"), col("rk").cast("int").as("rk"))
  }

  /** One IVF/k-means training iteration — the job that BUILDS the
    * codebook [[ivfTopK]] consumes: assign every vector to its nearest
    * of `k` seed centroids (broadcast codebook, map-side pass —
    * identical shape to the serving-path assignment), then recompute
    * each centroid as the per-dimension mean of its members. At 100 TB
    * this is the canonical Lloyd's-iteration-on-Spark shape: one corpus
    * scan per iteration, one shuffle keyed by (centroid, dimension),
    * partial means map-side. `k` is the nlist knob — a real deployment
    * sizes it so clusters stay ~10⁴ vectors (the paper uses 50k at web
    * scale); the plan is k-independent because the codebook broadcasts
    * at any sane nlist. Means round to 6 dp because summation order
    * differs per engine. */
  def ivfTrainStep(spark: SparkSession, sfDir: String, k: Int = 16): DataFrame =
    ivfTrainStepOn(vecs(spark, sfDir), k)

  /** [[ivfTrainStep]] over an injected (vec_id, v, norm) frame. */
  private[ext] def ivfTrainStepOn(e: DataFrame, k: Int): DataFrame = {
    val cents = broadcast(e.filter(col("vec_id") < k)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("norm").as("cn")))
    val scored = e.join(cents)
      .withColumn("ccos", round(expr("graft_dot(v, cv)") / (col("norm") * col("cn")), 6))
    // map-side argmax (see ivfTopK): partial max collapses the k-fold
    // expansion before the exchange; the r18 row_number window shuffled
    // and sorted corpus × k rows
    val assign = scored
      .groupBy(col("vec_id"))
      .agg(max(struct(col("ccos"), (-col("cent_id")).as("negid"))).as("m"),
        first(col("v")).as("v"))
      .select((-col("m.negid")).as("cent_id"), col("v"))
    assign
      .select(col("cent_id"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("cent_id"), col("dim"))
      .agg(round(avg(col("x")), 6).as("mean"), count(lit(1)).as("n_members"))
      .select(col("cent_id"), col("dim").cast("int").as("dim"),
        col("mean"), col("n_members"))
  }

  /** Product-quantization encode (Jégou et al. 2011): split the 64-d
    * vector into 8 subspaces of 8 dims; quantize each subspace to the
    * nearest of 16 codewords (the subvectors of vec_id < 16 — a
    * deterministic stand-in for per-subspace k-means, which would be an
    * offline [[ivfTrainStep]]-style job). Emits the long-form code
    * relation (vec_id, s, code_id, dist). 8 codes × 4 bits replace 256
    * bytes of floats — the 64× compression that lets a 100 TB corpus'
    * index live in cluster memory. Shape: corpus scan × broadcast
    * codebook (16 rows), all distances computed in ONE map-side pass
    * (8 explicit left-associated squared-diff sums — identical IEEE
    * evaluation order on both engines, then rounded to 6 dp with
    * code_id tiebreaks), argmin per (vec_id, subspace) via row_number
    * over the 16 candidates. */
  def pqCodes(spark: SparkSession, sfDir: String): DataFrame = {
    val e = vecs(spark, sfDir)
    val cents = broadcast(e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("v").as("cv")))
    def subDist(s: Int): org.apache.spark.sql.Column = {
      val terms = (1 to 8).map { j =>
        val i = s * 8 + j
        s"(element_at(v,$i)-element_at(cv,$i))*(element_at(v,$i)-element_at(cv,$i))"
      }
      round(expr(terms.mkString(" + ")), 6)
    }
    // per-(vector, subspace) argmin by (dist asc, code_id asc) as
    // min(struct(dist, code_id)) — map-side partial min collapses the
    // 16 codeword candidates before the exchange (the r18 row_number
    // window shuffled and sorted corpus × 16 × 8 rows).
    // r20 (guide §3, explode after aggregation): the r19 shape
    // posexplode'd the 8 subspace distances BEFORE the aggregate
    // (corpus × 16 × 8 generated rows through GenerateExec — measured
    // 3-4× the cost of the distance math itself); now the 8 argmins
    // ride ONE aggregate as 8 min-of-struct columns and the explode
    // to long form runs over the corpus-sized (not ×16×8) result.
    e.join(cents)
      .select(col("vec_id") +: (0 until 8).map(s =>
        struct(subDist(s).as("dist"), col("code_id").as("code_id")).as(s"ds$s")): _*)
      .groupBy(col("vec_id"))
      .agg(min(col("ds0")).as("m0"),
        (1 until 8).map(i => min(col(s"ds$i")).as(s"m$i")): _*)
      .select(col("vec_id"),
        posexplode(array((0 until 8).map(i => col(s"m$i")): _*)).as(Seq("s", "m")))
      .select(col("vec_id"), col("s").cast("int").as("s"),
        col("m.code_id").as("code_id"), col("m.dist").as("dist"))
  }

  /** PQ asymmetric-distance top-k (the ADC serving path): queries
    * (16 ≤ vec_id < 21) build an 8×16 distance table against the
    * codebook (tiny — broadcast), candidates are ranked by the SUM of
    * table entries at their stored codes — the corpus' float vectors
    * are never touched at query time, only the 8-code relation.
    * Per-entry distances are 6-dp-rounded doubles; the 8-term sum runs
    * in DECIMAL(18,6) so accumulation order cannot drift across
    * engines. k=10 with (adist, cand_id) tiebreaks. */
  def pqTopK(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    val codes = pqCodes(spark, sfDir)
      .select(col("vec_id").as("cand_id"), col("s"), col("code_id"))
    val e = vecs(spark, sfDir)
    val cents = broadcast(e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("v").as("cv")))
    def subDist(s: Int): org.apache.spark.sql.Column = {
      val terms = (1 to 8).map { j =>
        val i = s * 8 + j
        s"(element_at(qv,$i)-element_at(cv,$i))*(element_at(qv,$i)-element_at(cv,$i))"
      }
      round(expr(terms.mkString(" + ")), 6)
    }
    val dtable = broadcast(
      e.filter(col("vec_id") >= 16 && col("vec_id") < 21)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
        .join(cents)
        .select(col("query_id"), col("code_id"),
          posexplode(array((0 until 8).map(subDist): _*)).as(Seq("s", "qdist"))))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("adist").asc, col("cand_id").asc)
    codes.join(dtable, Seq("s", "code_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .groupBy(col("query_id"), col("cand_id"))
      .agg(sum(col("qdist").cast("decimal(18,6)")).cast("double").as("adist"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("cand_id"), col("adist"),
        col("rk").cast("int").as("rk"))
  }

  /** One PQ codebook-training iteration — the per-subspace analogue of
    * [[ivfTrainStep]], completing the PQ triad (train → encode →
    * serve): every vector's subspace-s subvector is assigned to its
    * nearest codeword (the [[pqCodes]] assignment), then each
    * (subspace, codeword) is recomputed as the per-dimension mean of
    * its assigned subvectors. Emits (s, code_id, dim ∈ [0,8), mean,
    * n_members) — the next iteration's codebook in long form.
    *
    * Scale shape: the assignment is the [[pqCodes]] map-side pass
    * (broadcast 16-row codebook, corpus scanned once); the recompute
    * is one shuffle keyed by (s, code_id, dim) with map-side partial
    * means — at 100 TB the shuffle carries 8 rows per vector (one per
    * subspace-dim after slicing), never the full vectors. Means round
    * to 6 dp because summation order differs per engine. */
  def pqTrainStep(spark: SparkSession, sfDir: String): DataFrame = {
    val codes = pqCodes(spark, sfDir).select(col("vec_id"), col("s"), col("code_id"))
    val e = vecs(spark, sfDir).select(col("vec_id"), col("v"))
    codes.join(e, "vec_id")
      .select(col("s"), col("code_id"),
        posexplode(expr("slice(v, s * 8 + 1, 8)")).as(Seq("dim", "x")))
      .groupBy(col("s"), col("code_id"), col("dim"))
      .agg(round(avg(col("x")), 6).as("mean"), count(lit(1)).as("n_members"))
      .select(col("s"), col("code_id"), col("dim").cast("int").as("dim"),
        col("mean"), col("n_members"))
  }

  /** The trained `k`-centroid codebook of [[ivfTrainStep]] assembled
    * back into vector form (cent_id, cv: array<double>, cn: norm) — the
    * handoff relation between the trainer and every consumer that needs
    * centroids as vectors ([[semanticDedup]]; a multi-iteration Lloyd's
    * loop would feed it back into the next assignment). The long→wide
    * pivot is one k-row aggregate (collect the (dim, mean) pairs, sort
    * by dim, project the means); empty clusters simply don't appear —
    * the trainer only emits centroids with members. */
  private[ext] def trainedCentroids(spark: SparkSession, sfDir: String,
                                    k: Int): DataFrame =
    assembleCodebook(ivfTrainStep(spark, sfDir, k))

  /** [[trainedCentroids]] over an injected (vec_id, v, norm) frame. */
  private[ext] def trainedCentroidsOn(e: DataFrame, k: Int): DataFrame =
    assembleCodebook(ivfTrainStepOn(e, k))

  /** Long-form (cent_id, dim, mean) → vector-form (cent_id, cv, cn):
    * the pivot every trainer→consumer handoff goes through. */
  private def assembleCodebook(longForm: DataFrame): DataFrame =
    longForm
      .groupBy(col("cent_id"))
      .agg(array_sort(collect_list(struct(col("dim"), col("mean")))).as("dm"))
      .select(col("cent_id"), expr("transform(dm, x -> x.mean)").as("cv"))
      .withColumn("cn", expr("sqrt(graft_dot(cv, cv))"))

  /** Multi-iteration IVF/k-means training driver — [[ivfTrainStep]]
    * composed to `steps` Lloyd iterations, closing the one-step
    * simplification: seeds (vec_id < k) → assign → 6-dp-rounded means →
    * reassembled codebook → next assignment, emitting the FINAL
    * codebook in [[ivfTrainStep]]'s long form. The driver loop is the
    * [[graft.ext.TextAnalysis.bpeTrainOn]] shape — inherent to Lloyd's
    * sequential dependency, with only codebook-sized (k×64-row) frames
    * ever driver-side; each iteration's codebook localCheckpoints so
    * the lineage stays O(1) in `steps` rather than stacking `steps`
    * corpus scans into one plan (and the ContextCleaner can reclaim
    * earlier iterations' blocks once unreferenced).
    *
    * Determinism across engines: means round to 6 dp at EVERY
    * iteration, so summation-order drift is quantized away before it
    * can compound — the unrolled DuckDB oracle reproduces the loop
    * exactly. 100 TB shape per iteration: one corpus scan against a
    * broadcast codebook + one (cent_id, dim)-keyed shuffle with
    * map-side partial means; `steps` multiplies scans, never state. */
  def ivfTrain(spark: SparkSession, sfDir: String, k: Int = 16,
               steps: Int = 3): DataFrame = {
    val e = vecs(spark, sfDir)
    var cents = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("norm").as("cn"))
    var longForm: DataFrame = null
    for (t <- 1 to steps) {
      val scored = e.join(broadcast(cents))
        .withColumn("ccos", round(expr("graft_dot(v, cv)") / (col("norm") * col("cn")), 6))
      // map-side argmax (see ivfTopK) — no corpus × k window shuffle
      val assign = scored
        .groupBy(col("vec_id"))
        .agg(max(struct(col("ccos"), (-col("cent_id")).as("negid"))).as("m"),
          first(col("v")).as("v"))
        .select((-col("m.negid")).as("cent_id"), col("v"))
      longForm = assign
        .select(col("cent_id"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cent_id"), col("dim"))
        .agg(round(avg(col("x")), 6).as("mean"), count(lit(1)).as("n_members"))
      // the LAST iteration's codebook is never consumed — skip its
      // eager materialization (the caller reads the long form directly)
      if (t < steps) cents = assembleCodebook(longForm).localCheckpoint(true)
    }
    longForm.select(col("cent_id"), col("dim").cast("int").as("dim"),
      col("mean"), col("n_members"))
  }

  /** Nearest-trained-centroid assignment (vec_id, cent_id) for
    * [[semanticDedup]]: one corpus scan against the broadcast trained
    * codebook. Exposed for the k-scaling spec (candidate-pair count =
    * Σ n·(n−1)/2 over cluster sizes must SHRINK as k grows — the whole
    * point of cluster-then-compare). */
  private[ext] def semanticAssign(spark: SparkSession, sfDir: String,
                                  k: Int): DataFrame = {
    val e = vecs(spark, sfDir)
    val cents = broadcast(trainedCentroids(spark, sfDir, k))
    val scored = e.join(cents)
      .withColumn("ccos", round(expr("graft_dot(v, cv)") / (col("norm") * col("cn")), 6))
    // map-side argmax (see ivfTopK) — no corpus × k window shuffle
    scored
      .groupBy(col("vec_id"))
      .agg(max(struct(col("ccos"), (-col("cent_id")).as("negid"))).as("m"))
      .select(col("vec_id"), (-col("m.negid")).as("cent_id"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication via cluster-then-compare — assign every embedding to
    * its nearest of `k` TRAINED centroids (one [[ivfTrainStep]] Lloyd
    * iteration over `k` seeds, assembled by [[trainedCentroids]] — the
    * real pipeline's train→assign handoff, not a hard-coded seed scan),
    * compare pairs ONLY within a cluster, and drop the larger-id member
    * of any pair with cosine ≥ τ (τ = 0.4, the strong-similarity tail
    * of this random-64-d corpus — same threshold as `dedup_embedding`).
    * Emits the kept corpus as (vec_id, cent_id).
    *
    * Scale shape — the reason SemDeDup exists: the quadratic term is
    * bounded to within-cluster pairs (Σ n·(n−1)/2 ≈ N²/2k for balanced
    * clusters), so k is the knob that keeps a 100 TB corpus from
    * all-pairs self-joining — size it so clusters stay ~10⁴ vectors
    * (~50k clusters in the paper); `SemDeDupSpec` pins the pair count
    * actually shrinking as k grows. Candidates pair on bare
    * (cent_id, vec_id) rows first — the vectors are fetched for the
    * verify stage by id via shuffle-hash joins (same
    * never-broadcast-the-corpus contract as [[graft.ext.Dedup]]'s
    * LSH paths); cent_id is the shuffle key, so a skewed hot cluster is
    * AQE's skew-join case, and at real scale the assignment would be
    * written partitioned by cent_id making each cluster's pair pass a
    * partition-local job. */
  def semanticDedup(spark: SparkSession, sfDir: String,
                    minCos: Double = 0.4, k: Int = 16): DataFrame = {
    val e = vecs(spark, sfDir)
    val assign = semanticAssign(spark, sfDir, k)
    val a = assign.select(col("cent_id"), col("vec_id").as("vec_a"))
    val b = assign.select(col("cent_id"), col("vec_id").as("vec_b"))
    val cand = a.join(b, Seq("cent_id")).filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"))
    val vecsById = e.select(col("vec_id"), col("v"), col("norm"))
    val dropped = cand.hint("shuffle_hash")
      .join(vecsById.select(col("vec_id").as("vec_a"),
        col("v").as("va"), col("norm").as("na")), "vec_a")
      .hint("shuffle_hash")
      .join(vecsById.select(col("vec_id").as("vec_b"),
        col("v").as("vb"), col("norm").as("nb")), "vec_b")
      .withColumn("cos", round(expr("graft_dot(va, vb)") / (col("na") * col("nb")), 6))
      .filter(col("cos") >= minCos)
      .select(col("vec_b").as("vec_id")).distinct()
    assign.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cent_id"))
  }

  /** Scalar quantization (SQ8, the FAISS flat-SQ path): per-dimension
    * [min, max] learned in one corpus pass (64 groups — a posexplode
    * aggregate that is tiny at any corpus size), each component stored
    * as an 8-bit level (floor((x−min)/(max−min)·256) clamped to 255 —
    * floor, not round: a half-way decimal tie under round() is the
    * exact cross-engine hazard the r10 classifier fix removed), and
    * candidates served from the MIDPOINT dequantization
    * (min + (level+0.5)/256·(max−min)) — 4 bytes/dim → 1 byte/dim, the
    * variant between PQ (64×) and full floats that keeps per-dim
    * resolution.
    *
    * Shape: stats broadcast back over the scan (one 2×64-value row),
    * encode+dequantize map-side, then the brute top-k over dequantized
    * vectors (broadcast queries × corpus scan, per-query windowed
    * top-k) — the corpus never shuffles. Cosines round to 6 dp with id
    * tiebreaks as everywhere. */
  def sq8TopK(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    val e = vecs(spark, sfDir)
    val stats = e.select(posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("dim")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val arrs = broadcast(stats.agg(
      expr("transform(sort_array(collect_list(struct(dim, mn))), s -> s.mn)").as("mins"),
      expr("transform(sort_array(collect_list(struct(dim, mx))), s -> s.mx)").as("maxs")))
    val enc = e.crossJoin(arrs).withColumn("xh", expr(
      """transform(sequence(0, size(v) - 1), i ->
        |  CASE WHEN maxs[i] = mins[i] THEN mins[i]
        |       ELSE mins[i] + (least(floor((v[i] - mins[i]) / (maxs[i] - mins[i]) * 256),
        |                             cast(255 as double)) + 0.5) / 256 * (maxs[i] - mins[i])
        |  END)""".stripMargin))
      .withColumn("xhn", expr("sqrt(graft_dot(xh, xh))"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qn"))
    val scored = broadcast(q)
      .join(enc.select(col("vec_id").as("cand_id"), col("xh"), col("xhn")),
        col("query_id") =!= col("cand_id"))
      .withColumn("qcos", round(
        expr("graft_dot(qv, xh)") / (col("qn") * col("xhn")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("qcos").desc, col("cand_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("cand_id"), col("qcos"), col("rk").cast("int").as("rk"))
  }

  /** IVF-PQ serving (IVFADC, Jégou et al. 2011 §IV — the composition
    * FAISS ships as `IVFx,PQy` and the architecture a 100 TB ANN
    * deployment actually runs): the coarse quantizer is the TRAINED
    * 16-centroid IVF codebook ([[trainedCentroids]], same handoff as
    * [[ivfTopK]]/[[semanticDedup]]), every corpus vector is PQ-encoded
    * on its RESIDUAL v − c(v) (residuals concentrate near 0, which is
    * why IVFADC quantizes them instead of raw vectors), and queries
    * probe their nprobe=2 nearest lists ranking candidates by ADC —
    * the per-list query residual's 8×16 distance table summed at the
    * candidates' stored codes. The corpus' float vectors are touched
    * only at index-build time; serving reads the 8-codes-per-vector
    * relation.
    *
    * Scale shape: the coarse codebook, the PQ codebook (16 residual
    * codewords — the vec_id < 16 deterministic stand-in, same
    * convention as [[pqCodes]]), and the query distance tables
    * (queries × nprobe × 8×16 rows) all broadcast; assignment + encode
    * are map-side passes over one corpus scan; serving joins the code
    * relation on (cent_id, s, code_id), so only probed lists
    * participate — cost is nprobe/nlist of the index, and at real
    * scale the code relation is written partitioned by cent_id making
    * each probe partition-pruned. Distances: per-entry 6-dp-rounded
    * doubles, DECIMAL(18,6) accumulation (the [[pqTopK]] contract), so
    * engines cannot drift. */
  def ivfPqTopK(spark: SparkSession, sfDir: String, nprobe: Int = 2,
                k: Int = 3): DataFrame =
    ivfPqTopKOn(vecs(spark, sfDir), nprobe, k)

  /** [[ivfPqTopK]] over an injected (vec_id, v, norm) frame; queries are
    * qLo ≤ vec_id < qHi (the registered default mirrors [[ivfTopK]]'s
    * 10..20 window). */
  private[ext] def ivfPqTopKOn(e: DataFrame, nprobe: Int = 2, k: Int = 3,
                               qLo: Long = 10, qHi: Long = 20): DataFrame = {
    // 16-row relation: checkpoint so the Lloyd-training subtree runs
    // once, not once per consuming branch (assign/probes/encode/table)
    val cents = broadcast(trainedCentroidsOn(e, 16).localCheckpoint(true))
    val scored = e.join(cents)
      .withColumn("ccos", round(expr("graft_dot(v, cv)") / (col("norm") * col("cn")), 6))
      .withColumn("r", expr("zip_with(v, cv, (x, c) -> x - c)"))
    val wAsg = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cent_id").asc)
    // map-side argmax (see ivfTopK) — no corpus × k window shuffle;
    // wAsg stays for the PROBE side's top-nprobe (queries only, tiny).
    // The residual depends on the WINNING centroid, so it recomputes
    // from the broadcast codebook after the argmax (the winner's
    // cent_id is the join key; zip_with is the same expression the
    // scored stream used, so r is bit-identical)
    val assign = scored
      .groupBy(col("vec_id"))
      .agg(max(struct(col("ccos"), (-col("cent_id")).as("negid"))).as("m"),
        first(col("v")).as("v"))
      .select(col("vec_id"), (-col("m.negid")).as("cent_id"), col("v"))
      .join(broadcast(cents.select(col("cent_id"), col("cv"))), Seq("cent_id"))
      .withColumn("r", expr("zip_with(v, cv, (x, c) -> x - c)"))
      .select(col("vec_id"), col("cent_id"), col("r"))
    // PQ codebook on RESIDUALS: the assigned residuals of vec_id < 16
    // (16 rows — checkpoint for the same reuse reason as cents)
    val codebook = broadcast(assign.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("r").as("cw")).localCheckpoint(true))
    def subDist(vexpr: String, cexpr: String)(s: Int): org.apache.spark.sql.Column = {
      val terms = (1 to 8).map { j =>
        val i = s * 8 + j
        s"(element_at($vexpr,$i)-element_at($cexpr,$i))*(element_at($vexpr,$i)-element_at($cexpr,$i))"
      }
      round(expr(terms.mkString(" + ")), 6)
    }
    // per-(vector, subspace) argmin as min(struct(dist, code_id)) —
    // map-side partial min, no corpus × 16 × 8 window shuffle; the 8
    // argmins ride ONE aggregate as min-of-struct columns and the
    // explode to long form runs AFTER it (r20 — see pqCodes: the
    // pre-aggregate posexplode generated corpus × 16 × 8 rows and
    // cost 3-4× the distance math)
    val codes = assign.join(codebook)
      .select(col("vec_id") +: col("cent_id") +: (0 until 8).map(s =>
        struct(subDist("r", "cw")(s).as("dist"), col("code_id").as("code_id"))
          .as(s"ds$s")): _*)
      .groupBy(col("vec_id"), col("cent_id"))
      .agg(min(col("ds0")).as("m0"),
        (1 until 8).map(i => min(col(s"ds$i")).as(s"m$i")): _*)
      .select(col("vec_id"), col("cent_id"),
        posexplode(array((0 until 8).map(i => col(s"m$i")): _*)).as(Seq("s", "m")))
      .select(col("vec_id"), col("cent_id"), col("s"), col("m.code_id").as("code_id"))
    // queries probe their nprobe nearest lists, with a PER-LIST residual
    // (ADC distance tables are relative to the probed centroid)
    val probes = scored.filter(col("vec_id") >= qLo && col("vec_id") < qHi)
      .withColumn("rn", row_number().over(wAsg))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id").as("query_id"), col("cent_id"), col("r").as("qr"))
    val dtable = broadcast(probes.join(codebook)
      .select(col("query_id"), col("cent_id"), col("code_id"),
        posexplode(array((0 until 8).map(subDist("qr", "cw")): _*)).as(Seq("s", "qdist"))))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("adist").asc, col("cand_id").asc)
    codes.join(dtable, Seq("cent_id", "s", "code_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id").as("cand_id"))
      .agg(sum(col("qdist").cast("decimal(18,6)")).cast("double").as("adist"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("cand_id"), col("adist"),
        col("rk").cast("int").as("rk"))
  }

  /** Matryoshka-style dimension-truncation audit: how much of the EXACT
    * cosine top-k survives when similarity uses only the first d
    * dimensions — the evaluation behind MRL-style truncated-embedding
    * serving (Kusupati et al. 2022): pick the cheapest d whose overlap
    * clears the product bar. For each prefix width, the same
    * brute-force kernel as [[bruteForceTopK]] runs on `slice(v, 1, d)`,
    * and the output row reports Σ|topkₙ ∩ topk₆₄| with the mean overlap
    * as integer micro-units (hits·10⁶ ÷ (k·nQueries) — exact on both
    * engines). 100 TB shape: per dim it is the brute baseline's
    * broadcast-queries + one corpus scan; dims are few and fixed. */
  def dimTruncationAudit(spark: SparkSession, sfDir: String, k: Int = 5,
                         dims: Seq[Int] = Seq(8, 16, 32)): DataFrame = {
    val e = vecs(spark, sfDir)
    def topk(dim: Option[Int]): DataFrame = {
      val pv = dim.map(d => expr(s"slice(v, 1, $d)")).getOrElse(col("v"))
      val base = e.select(col("vec_id"), pv.as("pv"))
        .withColumn("pn", expr("sqrt(graft_dot(pv, pv))"))
      val q = base.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("pv").as("qv"), col("pn").as("qn"))
      val c = base.select(col("vec_id").as("cand_id"), col("pv").as("cv"), col("pn").as("cn"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id").asc)
      broadcast(q).join(c, col("query_id") =!= col("cand_id"))
        .withColumn("cos", round(expr("graft_dot(qv, cv)") / (col("qn") * col("cn")), 6))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k)
        .select(col("query_id"), col("cand_id"))
    }
    val full = topk(None)
    val nq = 10L
    dims.map { d =>
      topk(Some(d)).join(full, Seq("query_id", "cand_id"))
        .agg(count(lit(1)).as("hits"))
        .select(lit(d).cast("int").as("dim"), col("hits"),
          expr(s"hits * 1000000L DIV (${k}L * $nq)").as("overlap_micro"))
    }.reduce(_.unionAll(_))
  }

  /** kNN label classification over the embedding space — the
    * embedding-based quality/domain classifier a curation pipeline
    * runs when no trained scorer exists (SemDeDup §3's cluster-label
    * flavor): each query vector takes the majority label of its k
    * nearest TRAIN vectors by cosine. Queries are vec_id < 50; the
    * train split is the rest. Ranking is on floor(cos·10⁶) BIGINT
    * (the micro-unit convention [[Dedup.embeddingNearDups]] uses over
    * the same table — floor is engine-agnostic where round(x,6) can
    * flip a half-tie) then by cand_id; vote
    * ties break to the smallest label. Every OUTPUT column is an
    * integer/boolean — no float rendering surface at all.
    *
    * Scale: the query block broadcasts over the train scan (the small
    * side by construction — classification batches are bounded); the
    * vote stage is a (query, label) hash aggregate + one k-row window
    * per query. At 100 TB the brute scorer swaps for the IVF-PQ
    * candidate stream ([[ivfPqTopK]]) feeding this same vote stage. */
  def knnClassify(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", expr("sqrt(graft_dot(v, v))"))
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("label").as("true_label"),
        col("v").as("qv"), col("norm").as("qn"))
    val t = e.filter(col("vec_id") >= 50)
      .select(col("vec_id").as("cand_id"), col("label").as("cand_label"),
        col("v").as("cv"), col("norm").as("cn"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id").asc)
    val candidates = broadcast(q).join(t, lit(true))
      .withColumn("cos",
        floor(expr("graft_dot(qv, cv)") / (col("qn") * col("cn")) * 1000000.0).cast("long"))
      .withColumn("rk", row_number().over(wr)).filter(col("rk") <= k)
      .select(col("query_id"), col("cand_id"))
    knnVote(candidates, e.select(col("vec_id"), col("label")))
  }

  /** The majority-vote stage of [[knnClassify]] over ANY (query_id,
    * cand_id) candidate stream — the seam the scale path plugs into:
    * swap the brute scorer for [[ivfPqTopKOn]]'s nprobe-bounded ADC
    * candidates and the vote is unchanged (`KnnSpec` pins that
    * composition equal to the brute path on a clustered corpus).
    * `labels` is the (vec_id, label) relation; both label joins are
    * equi-joins a label dim broadcast serves at scale. */
  def knnVote(candidates: DataFrame, labels: DataFrame): DataFrame = {
    val wv = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("votes").desc, col("cand_label").asc)
    candidates
      .join(labels.select(col("vec_id").as("cand_id"), col("label").as("cand_label")),
        Seq("cand_id"))
      .join(labels.select(col("vec_id").as("query_id"), col("label").as("true_label")),
        Seq("query_id"))
      .groupBy(col("query_id"), col("true_label"), col("cand_label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("vrk", row_number().over(wv)).filter(col("vrk") === 1)
      .select(col("query_id"), col("true_label"),
        col("cand_label").as("pred_label"), col("votes"),
        (col("cand_label") === col("true_label")).as("correct"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_knn_classify" -> ((s: SparkSession, d: String) => knnClassify(s, d)),
    "sim_dim_truncation" -> ((s: SparkSession, d: String) => dimTruncationAudit(s, d)),
    "sim_ivfpq_topk" -> ((s: SparkSession, d: String) => ivfPqTopK(s, d)),
    "sim_sq8_topk" -> ((s: SparkSession, d: String) => sq8TopK(s, d)),
    "sim_semantic_dedup" -> ((s: SparkSession, d: String) => semanticDedup(s, d)),
    "sim_pq_train" -> pqTrainStep _,
    "sim_pq_encode" -> pqCodes _,
    "sim_pq_topk" -> ((s: SparkSession, d: String) => pqTopK(s, d)),
    "sim_topk_brute" -> ((s: SparkSession, d: String) => bruteForceTopK(s, d)),
    "sim_lsh_buckets" -> lshBuckets _,
    "sim_lsh_topk" -> ((s: SparkSession, d: String) => lshTopK(s, d)),
    "sim_ivf_topk" -> ((s: SparkSession, d: String) => ivfTopK(s, d)),
    "sim_ivf_topk_partitioned" -> ((s: SparkSession, d: String) => ivfTopKPartitioned(s, d)),
    "sim_ivf_delta" -> ((s: SparkSession, d: String) => ivfDelta(s, d)),
    "sim_ivf_train_step" -> ((s: SparkSession, d: String) => ivfTrainStep(s, d)),
    "sim_ivf_train" -> ((s: SparkSession, d: String) => ivfTrain(s, d)),
  )

  private[ext] val oracleVecs =
    """e AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
      |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS norm
      |  FROM embeddings)""".stripMargin

  private[ext] val oracleBucket =
    """list_sum(list_transform(range(0, 8), p ->
      |  CASE WHEN list_sum(list_transform(range(1, len(v) + 1), i ->
      |    v[i] * (((p + 1) * 131 + (i - 1) * 137) % 997 - 498))) >= 0
      |  THEN CAST(2 ** p AS INTEGER) ELSE 0 END))""".stripMargin

  /** The 8 explicit squared-diff terms of one PQ subspace distance —
    * generated with the same left-associated `+` chain as the Spark
    * side so both engines evaluate IEEE-identically. */
  private def pqTermsSql(vexpr: String, cexpr: String): String =
    (1 to 8).map { j =>
      s"($vexpr[ss.s*8+$j]-$cexpr[ss.s*8+$j])*($vexpr[ss.s*8+$j]-$cexpr[ss.s*8+$j])"
    }.mkString(" + ")

  private def pqEncodeCte: String =
    s"""c AS (SELECT vec_id AS code_id, v AS cv FROM e WHERE vec_id < 16),
       |ss AS (SELECT unnest(range(0, 8)) AS s),
       |d AS (
       |  SELECT e.vec_id, c.code_id, ss.s,
       |    round(${pqTermsSql("e.v", "c.cv")}, 6) AS dist
       |  FROM e CROSS JOIN c CROSS JOIN ss),
       |codes AS (
       |  SELECT vec_id, s, code_id, dist FROM (
       |    SELECT vec_id, s, code_id, dist,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, s
       |        ORDER BY dist ASC, code_id ASC) AS rn
       |    FROM d)
       |  WHERE rn = 1)""".stripMargin

  /** CTE chain producing the TRAINED codebook `c(cent_id, cv, cn)` —
    * seeds (vec_id < k) → one Lloyd assignment → 6-dp means →
    * reassembled vectors — shared by every oracle that consumes the
    * trainer's output ([[semanticDedupOracle]]; sim_ivf_topk) so the
    * Spark handoff [[trainedCentroids]] and its oracle cannot drift
    * apart. Expects an `e(vec_id, v, norm)` CTE in scope. */
  private def trainedCodebookCte(k: Int): String =
    s"""seed AS (SELECT vec_id AS cent_id, v AS cv, norm AS cn FROM e WHERE vec_id < $k),
       |sc0 AS (
       |  SELECT e.vec_id, seed.cent_id, e.v,
       |    round(list_sum(list_transform(range(1, len(e.v) + 1), i -> e.v[i] * seed.cv[i]))
       |      / (e.norm * seed.cn), 6) AS ccos
       |  FROM e CROSS JOIN seed),
       |asg0 AS (
       |  SELECT cent_id, v FROM (
       |    SELECT cent_id, v,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id ASC) AS rn
       |    FROM sc0)
       |  WHERE rn = 1),
       |dims AS (SELECT unnest(range(0, 64)) AS dim),
       |tcl AS (
       |  SELECT cent_id, dim, round(AVG(v[dim + 1]), 6) AS mean
       |  FROM asg0 CROSS JOIN dims GROUP BY cent_id, dim),
       |c AS (
       |  SELECT cent_id, list(mean ORDER BY dim) AS cv,
       |    sqrt(list_sum(list_transform(list(mean ORDER BY dim), x -> x * x))) AS cn
       |  FROM tcl GROUP BY cent_id)""".stripMargin

  /** The unrolled [[ivfTrain]] oracle: `steps` Lloyd iterations chained
    * as CTEs (c0 = raw seeds; each c_t reassembles from t's 6-dp
    * means), final SELECT reads the last iteration's long form. The
    * per-iteration rounding is what makes the unroll reproducible —
    * summation-order drift never compounds across steps. */
  private[ext] def ivfTrainOracle(k: Int, steps: Int): String = {
    val sb = new StringBuilder(
      s"""WITH $oracleVecs,
         |c0 AS (SELECT vec_id AS cent_id, v AS cv, norm AS cn FROM e WHERE vec_id < $k),
         |dims AS (SELECT unnest(range(0, 64)) AS dim)""".stripMargin)
    for (t <- 1 to steps) {
      sb.append(s""",
                   |sc$t AS (
                   |  SELECT e.vec_id, c.cent_id, e.v,
                   |    round(list_sum(list_transform(range(1, len(e.v) + 1), i -> e.v[i] * c.cv[i]))
                   |      / (e.norm * c.cn), 6) AS ccos
                   |  FROM e CROSS JOIN c${t - 1} c),
                   |asg$t AS (
                   |  SELECT cent_id, v FROM (
                   |    SELECT cent_id, v,
                   |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id ASC) AS rn
                   |    FROM sc$t)
                   |  WHERE rn = 1),
                   |tcl$t AS (
                   |  SELECT cent_id, dim, round(AVG(v[dim + 1]), 6) AS mean, COUNT(*) AS n_members
                   |  FROM asg$t CROSS JOIN dims GROUP BY cent_id, dim),
                   |c$t AS (
                   |  SELECT cent_id, list(mean ORDER BY dim) AS cv,
                   |    sqrt(list_sum(list_transform(list(mean ORDER BY dim), x -> x * x))) AS cn
                   |  FROM tcl$t GROUP BY cent_id)""".stripMargin)
    }
    sb.append(s"""
                 |SELECT cent_id, CAST(dim AS INTEGER) AS dim, mean,
                 |  CAST(n_members AS BIGINT) AS n_members
                 |FROM tcl$steps""".stripMargin)
    sb.toString
  }

  /** The sim_semantic_dedup oracle for a given (k, τ) — mirrors the
    * full train→assemble→assign→pair derivation so the registered
    * default and any spec-level k stay provably in sync. */
  private[ext] def semanticDedupOracle(k: Int, tau: Double): String =
    s"""WITH $oracleVecs,
       |${trainedCodebookCte(k)},
       |sc AS (
       |  SELECT e.vec_id, c.cent_id,
       |    round(list_sum(list_transform(range(1, len(e.v) + 1), i -> e.v[i] * c.cv[i]))
       |      / (e.norm * c.cn), 6) AS ccos
       |  FROM e CROSS JOIN c),
       |asg AS (
       |  SELECT vec_id, cent_id FROM (
       |    SELECT vec_id, cent_id,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id ASC) AS rn
       |    FROM sc)
       |  WHERE rn = 1),
       |dropped AS (
       |  SELECT DISTINCT b.vec_id FROM asg a
       |  JOIN asg b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
       |  JOIN e va ON va.vec_id = a.vec_id
       |  JOIN e vb ON vb.vec_id = b.vec_id
       |  WHERE round(list_sum(list_transform(range(1, len(va.v) + 1), i -> va.v[i] * vb.v[i]))
       |    / (va.norm * vb.norm), 6) >= $tau)
       |SELECT vec_id, cent_id FROM asg
       |WHERE vec_id NOT IN (SELECT vec_id FROM dropped)""".stripMargin

  val oracleSql: Map[String, String] = {
    val base = oracleSqlBase
    // the partitioned-serving variant must change the PLAN (pruned
    // probe scan), never the answer — oracle reused verbatim. Same for
    // the delta-append path: base-write + batch-append must be
    // row-identical to the full rebuild.
    base + ("sim_ivf_topk_partitioned" -> base("sim_ivf_topk")) +
      ("sim_ivf_delta" -> base("sim_ivf_topk"))
  }

  private def oracleSqlBase: Map[String, String] = Map(
    "sim_ivfpq_topk" ->
      s"""WITH $oracleVecs,
         |${trainedCodebookCte(16)},
         |scr AS (
         |  SELECT e.vec_id, c.cent_id,
         |    round(list_sum(list_transform(range(1, len(e.v) + 1), i -> e.v[i] * c.cv[i]))
         |      / (e.norm * c.cn), 6) AS ccos,
         |    list_transform(range(1, len(e.v) + 1), i -> e.v[i] - c.cv[i]) AS r
         |  FROM e CROSS JOIN c),
         |asg AS (
         |  SELECT vec_id, cent_id, r FROM (
         |    SELECT vec_id, cent_id, r,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id ASC) AS rn
         |    FROM scr)
         |  WHERE rn = 1),
         |cb AS (SELECT vec_id AS code_id, r AS cw FROM asg WHERE vec_id < 16),
         |ss AS (SELECT unnest(range(0, 8)) AS s),
         |dists AS (
         |  SELECT asg.vec_id, asg.cent_id, cb.code_id, ss.s,
         |    round(${pqTermsSql("asg.r", "cb.cw")}, 6) AS dist
         |  FROM asg CROSS JOIN cb CROSS JOIN ss),
         |codes AS (
         |  SELECT vec_id, cent_id, s, code_id FROM (
         |    SELECT vec_id, cent_id, s, code_id,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, s
         |        ORDER BY dist ASC, code_id ASC) AS rn
         |    FROM dists)
         |  WHERE rn = 1),
         |pr AS (
         |  SELECT vec_id AS query_id, cent_id, r AS qr FROM (
         |    SELECT vec_id, cent_id, r,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id ASC) AS rn
         |    FROM scr WHERE vec_id >= 10 AND vec_id < 20)
         |  WHERE rn <= 2),
         |dt AS (
         |  SELECT pr.query_id, pr.cent_id, cb.code_id, ss.s,
         |    round(${pqTermsSql("pr.qr", "cb.cw")}, 6) AS qdist
         |  FROM pr CROSS JOIN cb CROSS JOIN ss)
         |SELECT query_id, cand_id, adist, CAST(rk AS INTEGER) AS rk FROM (
         |  SELECT query_id, cand_id, adist,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY adist ASC, cand_id ASC) AS rk
         |  FROM (
         |    SELECT dt.query_id, codes.vec_id AS cand_id,
         |      CAST(SUM(CAST(qdist AS DECIMAL(18,6))) AS DOUBLE) AS adist
         |    FROM codes JOIN dt ON codes.cent_id = dt.cent_id
         |      AND codes.s = dt.s AND codes.code_id = dt.code_id
         |    WHERE dt.query_id <> codes.vec_id
         |    GROUP BY dt.query_id, codes.vec_id))
         |WHERE rk <= 3""".stripMargin,
    "sim_semantic_dedup" -> semanticDedupOracle(16, 0.4),
    "sim_pq_train" ->
      s"""WITH $oracleVecs,
         |$pqEncodeCte,
         |dims AS (SELECT unnest(range(0, 8)) AS dim)
         |SELECT CAST(codes.s AS INTEGER) AS s, codes.code_id,
         |  CAST(dim AS INTEGER) AS dim,
         |  round(AVG(e.v[codes.s * 8 + dim + 1]), 6) AS mean,
         |  CAST(COUNT(*) AS BIGINT) AS n_members
         |FROM codes JOIN e ON codes.vec_id = e.vec_id CROSS JOIN dims
         |GROUP BY codes.s, codes.code_id, dim""".stripMargin,
    "sim_pq_encode" ->
      s"""WITH $oracleVecs,
         |$pqEncodeCte
         |SELECT vec_id, CAST(s AS INTEGER) AS s, code_id, dist FROM codes""".stripMargin,
    "sim_pq_topk" ->
      s"""WITH $oracleVecs,
         |$pqEncodeCte,
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id >= 16 AND vec_id < 21),
         |dt AS (
         |  SELECT q.query_id, c.code_id, ss.s,
         |    round(${pqTermsSql("q.qv", "c.cv")}, 6) AS qdist
         |  FROM q CROSS JOIN c CROSS JOIN ss)
         |SELECT query_id, cand_id, adist, CAST(rk AS INTEGER) AS rk FROM (
         |  SELECT query_id, cand_id, adist,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY adist ASC, cand_id ASC) AS rk
         |  FROM (
         |    SELECT dt.query_id, codes.vec_id AS cand_id,
         |      CAST(SUM(CAST(qdist AS DECIMAL(18,6))) AS DOUBLE) AS adist
         |    FROM codes JOIN dt ON codes.s = dt.s AND codes.code_id = dt.code_id
         |    WHERE dt.query_id <> codes.vec_id
         |    GROUP BY dt.query_id, codes.vec_id))
         |WHERE rk <= 10""".stripMargin,
    "sim_ivf_train_step" ->
      s"""WITH $oracleVecs,
         |c AS (SELECT vec_id AS cent_id, v AS cv, norm AS cn FROM e WHERE vec_id < 16),
         |sc AS (
         |  SELECT e.vec_id, c.cent_id, e.v,
         |    round(list_sum(list_transform(range(1, len(e.v) + 1), i -> e.v[i] * c.cv[i]))
         |      / (e.norm * c.cn), 6) AS ccos
         |  FROM e CROSS JOIN c),
         |asg AS (
         |  SELECT cent_id, v FROM (
         |    SELECT cent_id, v,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id ASC) AS rn
         |    FROM sc)
         |  WHERE rn = 1),
         |dims AS (SELECT unnest(range(0, 64)) AS dim)
         |SELECT cent_id, CAST(dim AS INTEGER) AS dim,
         |  round(AVG(v[dim + 1]), 6) AS mean, CAST(COUNT(*) AS BIGINT) AS n_members
         |FROM asg CROSS JOIN dims
         |GROUP BY cent_id, dim""".stripMargin,
    "sim_sq8_topk" ->
      s"""WITH $oracleVecs,
         |stats AS (
         |  SELECT CAST(t.r AS INT) - 1 AS dim,
         |    MIN(v[CAST(t.r AS INT)]) AS mn, MAX(v[CAST(t.r AS INT)]) AS mx
         |  FROM e, range(1, 65) t(r) GROUP BY 1),
         |arrs AS (SELECT list(mn ORDER BY dim) AS mins, list(mx ORDER BY dim) AS maxs
         |         FROM stats),
         |enc AS (
         |  SELECT vec_id, list_transform(range(1, len(v) + 1), i ->
         |    CASE WHEN maxs[i] = mins[i] THEN mins[i]
         |         ELSE mins[i] + (LEAST(FLOOR((v[i] - mins[i]) / (maxs[i] - mins[i]) * 256),
         |                               255) + 0.5) / 256 * (maxs[i] - mins[i])
         |    END) AS xh
         |  FROM e, arrs),
         |encn AS (SELECT vec_id, xh,
         |  sqrt(list_sum(list_transform(xh, x -> x * x))) AS xhn FROM enc),
         |q AS (SELECT vec_id AS query_id, v AS qv, norm AS qn FROM e WHERE vec_id < 10)
         |SELECT query_id, cand_id, qcos, CAST(rk AS INTEGER) AS rk FROM (
         |  SELECT q.query_id, c.vec_id AS cand_id,
         |    round(list_sum(list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * c.xh[i]))
         |      / (q.qn * c.xhn), 6) AS qcos,
         |    ROW_NUMBER() OVER (PARTITION BY q.query_id
         |      ORDER BY round(list_sum(list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * c.xh[i]))
         |        / (q.qn * c.xhn), 6) DESC, c.vec_id ASC) AS rk
         |  FROM q JOIN encn c ON q.query_id <> c.vec_id)
         |WHERE rk <= 3""".stripMargin,
    "sim_dim_truncation" -> {
      def pairs(dotLen: String, normOf: String => String): String =
        s"""SELECT query_id, cand_id FROM (
           |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
           |      round(list_sum(list_transform(range(1, $dotLen + 1), i -> q.v[i] * c.v[i]))
           |        / (${normOf("q")} * ${normOf("c")}), 6) DESC, c.vec_id ASC) AS rk
           |  FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
           |WHERE rk <= 5""".stripMargin
      val dims = Seq(8, 16, 32)
      val ctes = dims.map(d => s"t$d AS (${pairs(d.toString,
        a => s"sqrt(list_sum(list_transform($a.v[1:$d], x -> x * x)))")})").mkString(",\n")
      val blocks = dims.map(d =>
        s"""SELECT CAST($d AS INTEGER) AS dim, CAST(COUNT(*) AS BIGINT) AS hits,
           |  COUNT(*) * 1000000 // 50 AS overlap_micro
           |FROM t$d JOIN f USING (query_id, cand_id)""".stripMargin)
        .mkString("\nUNION ALL\n")
      s"""WITH $oracleVecs,
         |f AS (${pairs("len(q.v)", a => s"$a.norm")}),
         |$ctes
         |$blocks""".stripMargin
    },
    // mirrors knnClassify: floor(cos*1e6) BIGINT rank key (micro-unit
    // convention — round(x,6) half-ties flip cross-engine), vote ties
    // to the smallest label; all outputs integral.
    "sim_knn_classify" ->
      s"""WITH $oracleVecs,
         |s AS (
         |  SELECT q.vec_id AS query_id, q.label AS true_label,
         |    c.vec_id AS cand_id, c.label AS cand_label,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY CAST(floor(list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i]))
         |        / (q.norm * c.norm) * 1000000.0) AS BIGINT) DESC, c.vec_id ASC) AS rk
         |  FROM e q JOIN e c ON q.vec_id < 50 AND c.vec_id >= 50),
         |v AS (
         |  SELECT query_id, true_label, cand_label, COUNT(*) AS votes
         |  FROM s WHERE rk <= 10 GROUP BY 1, 2, 3),
         |b AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY votes DESC, cand_label ASC) AS vrk FROM v)
         |SELECT query_id, true_label, cand_label AS pred_label,
         |  CAST(votes AS BIGINT) AS votes, cand_label = true_label AS correct
         |FROM b WHERE vrk = 1""".stripMargin,
    "sim_topk_brute" ->
      s"""WITH $oracleVecs
         |SELECT query_id, cand_id, cos, CAST(rk AS INTEGER) AS rk FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |    round(list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i]))
         |      / (q.norm * c.norm), 6) AS cos,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY round(list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i]))
         |        / (q.norm * c.norm), 6) DESC, c.vec_id ASC) AS rk
         |  FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
         |WHERE rk <= 5""".stripMargin,
    "sim_lsh_buckets" ->
      s"""WITH $oracleVecs
         |SELECT CAST($oracleBucket AS INTEGER) AS bucket, CAST(COUNT(*) AS BIGINT) AS n
         |FROM e GROUP BY 1""".stripMargin,
    "sim_lsh_topk" ->
      s"""WITH $oracleVecs,
         |b AS (SELECT vec_id, v, norm, CAST($oracleBucket AS INTEGER) AS bucket FROM e)
         |SELECT query_id, bucket, cand_id, cos, CAST(rk AS INTEGER) AS rk FROM (
         |  SELECT q.vec_id AS query_id, q.bucket AS bucket, c.vec_id AS cand_id,
         |    round(list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i]))
         |      / (q.norm * c.norm), 6) AS cos,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY round(list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i]))
         |        / (q.norm * c.norm), 6) DESC, c.vec_id ASC) AS rk
         |  FROM b q JOIN b c ON q.vec_id < 10 AND q.bucket = c.bucket AND q.vec_id <> c.vec_id)
         |WHERE rk <= 3""".stripMargin,
    "sim_ivf_train" -> ivfTrainOracle(16, 3),
    "sim_ivf_topk" ->
      s"""WITH $oracleVecs,
         |${trainedCodebookCte(16)},
         |sc AS (
         |  SELECT e.vec_id, c.cent_id,
         |    round(list_sum(list_transform(range(1, len(e.v) + 1), i -> e.v[i] * c.cv[i]))
         |      / (e.norm * c.cn), 6) AS ccos
         |  FROM e CROSS JOIN c),
         |asg AS (
         |  SELECT vec_id AS cand_id, cent_id FROM (
         |    SELECT vec_id, cent_id,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id ASC) AS rn
         |    FROM sc)
         |  WHERE rn = 1),
         |pr AS (
         |  SELECT vec_id AS query_id, cent_id FROM (
         |    SELECT vec_id, cent_id,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id ASC) AS rn
         |    FROM sc WHERE vec_id >= 10 AND vec_id < 20)
         |  WHERE rn <= 2)
         |SELECT query_id, cand_id, cos, CAST(rk AS INTEGER) AS rk FROM (
         |  SELECT pr.query_id, asg.cand_id,
         |    round(list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * cd.v[i]))
         |      / (q.norm * cd.norm), 6) AS cos,
         |    ROW_NUMBER() OVER (PARTITION BY pr.query_id
         |      ORDER BY round(list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * cd.v[i]))
         |        / (q.norm * cd.norm), 6) DESC, asg.cand_id ASC) AS rk
         |  FROM pr JOIN asg ON pr.cent_id = asg.cent_id
         |  JOIN e q ON q.vec_id = pr.query_id
         |  JOIN e cd ON cd.vec_id = asg.cand_id
         |  WHERE asg.cand_id <> pr.query_id)
         |WHERE rk <= 3""".stripMargin,
  )
}
