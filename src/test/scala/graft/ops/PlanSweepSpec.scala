package graft.ops

import graft.SparkSpec

/** Plan hygiene across the ENTIRE query surface: every SparkEntry query
  * is planned (not executed) and screened for the anti-patterns that
  * kill a 100 TB run. Quadratic join strategies are allowed only where
  * the operator is genuinely all-pairs / non-equi and the design bounds
  * the work (documented allowlist); nothing may fall back to
  * interpreted Python UDFs or an unintended cartesian product. */
class PlanSweepSpec extends SparkSpec {

  /** Queries whose plans legitimately contain a nested-loop/cartesian
    * strategy: non-equi broadcast range binning (join_range_quarters),
    * the brute-force ANN baseline (sim_topk_brute scores every
    * query×candidate pair by construction), IVF codebook scoring
    * (corpus × nlist broadcast — the codebook is tiny by design), and
    * k-row × 1-row scalar cross joins (text_vocab_coverage's
    * corpus-total, ev_daily_anomaly's global moments,
    * text_quality_filter's broadcast percentile threshold — inherited
    * by text_curated_corpus, which composes that stage), and the IVF
    * TRAINING assignment pass (sim_ivf_train_step: corpus × 16-centroid
    * broadcast, the Lloyd's-iteration shape). dedup_embedding left this
    * list in round 3: it now equi-joins on LSH buckets. */
  private val nonEquiAllowlist = Set(
    "join_range_quarters", "sim_topk_brute",
    "sim_knn_classify", // brute query-block × train scan (broadcast 50-query side), sim_topk_brute's class; the IVF-PQ candidate stream is the stated 100 TB swap-in

    "sim_dim_truncation", // three brute-force sweeps: broadcast 10-query × corpus non-equi scoring, same class as sim_topk_brute
    "sim_ivf_topk", "sim_ivf_train_step",
    "sim_ivf_topk_partitioned", // inherits ivfTopK's corpus × 16-centroid broadcast assignment pass; the serve join itself is an equi-join on the DPP-pruned cent_id
    "sim_ivf_delta", // same shape as sim_ivf_topk_partitioned: the broadcast assignment pass feeds the probe side; the serve join is the same DPP-pruned equi-join over the appended layout
    "join_tpch_q22", // corpus × 1-row positive-balance avg broadcast (the scalar-subquery shape), text_vocab_coverage's class
    "sim_ivfpq_topk", // IVFADC: corpus × 16-centroid coarse assignment + residual × 16-codeword PQ encode (both broadcast codebooks); the ADC serve stage equi-joins on (cent_id, s, code_id)
    "sim_ivf_train", // the same Lloyd assignment pass, iterated (corpus × k-centroid broadcast per step)
    "sim_pq_encode", "sim_pq_topk", // corpus/query × 16-codeword broadcast (PQ encode/ADC table)
    "sim_pq_train", // inherits pqCodes' assignment pass (corpus × 16-codeword broadcast)
    "sim_semantic_dedup", // SemDeDup's cluster assignment: corpus × 16-centroid broadcast; the pair stage itself equi-joins on cent_id
    "text_vocab_coverage", "text_quality_filter", "text_curated_corpus",
    "text_dsir", // two 1-row scalar cross joins: corpus/target totals onto the B-bucket model, percentile threshold onto the weights
    "text_dsir_corpus", // applied form of text_dsir — inherits the same two scalar cross joins; the select itself is a semi-join
    "text_ccnet_buckets", // 1-row tercile-threshold cross join broadcast over the scored docs
    "layout_zorder", // 1-row scalar cross join: the adaptive curve-range width (max z) broadcast over the scan

    "kql_series_similarity", // deliberate k=1 cross pair of PRE-AGGREGATED series rows (|event types|² = 25); the data-carrying make-series stage is a keyed aggregate
    "ev_daily_anomaly",
    "sketch_fm_merge", // three 1-row frames (merged sketch, group-est sum, truth) cross-joined into the single output row
    "sim_sq8_topk", // corpus × 1-row min/max-stats broadcast + the brute-force query × candidate scoring
    "search_tfidf_topk", "search_bm25_topk", // corpus × 1-row corpus-stats broadcast (N, df_t, Σdl)
    "search_hybrid_rrf", // inherits the bm25 stats row + corpus × 1-row query-vector broadcast
    "kql_diffpatterns", // cube cells × 1-row slice-denominator broadcast (replaced the partitionBy()-less window per r10 ADVICE)
    "kql_preview", // top-N rows × 1-row grand-total broadcast (evaluate preview's folded count — text_vocab_coverage's class)
    "kql_hll_dcount", // r16 error-bound audit: the 'ALL' row joins two 1-row frames (merged sketch × global exact) on a constant key, which folds to a 1×1 nested-loop
    // r19 distributed serialized-frame kit (the single-partition
    // WindowExec replacement): each keyless running sum broadcast-joins
    // ONE row of per-block offsets onto the frame — the scalar-subquery
    // class (text_vocab_coverage's); the shift helpers equi-join on the
    // dense sequence
    "kql_serialize", "kql_row_rank", "kql_row_cumsum_restart",
    "kql_row_session",
    "text_perceptron_train") // dim-rows × 1-row final-epoch error count broadcast (the same scalar class; weights themselves equi-join on dim)

  test("no unintended cartesian/nested-loop joins, no Python UDFs, anywhere") {
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val bad =
          (plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin")) &&
            !nonEquiAllowlist.contains(name)
        val python = plan.contains("PythonUDF") || plan.contains("BatchEvalPython")
        if (bad) Some(s"$name: nested-loop/cartesian join")
        else if (python) Some(s"$name: python udf")
        else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
