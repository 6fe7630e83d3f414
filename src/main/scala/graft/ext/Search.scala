package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** [extension] Full-text retrieval over the `documents` corpus — the
  * keyword half of a training-data curation / RAG-retrieval pipeline:
  * inverted index construction, TF-IDF and BM25 scoring for a fixed
  * keyword query, reciprocal-rank-fusion of the lexical ranking with
  * the embedding (cosine) ranking, and positional phrase search.
  *
  * Scale shapes (the 100 TB plan, not just the sf0.01 one):
  *  - The index build explodes terms once, partial-aggregates map-side
  *    (term,doc) → tf, then shuffles by term. Postings are bounded
  *    per-term (window top-k WITHIN the term partition) — no global
  *    window, no driver collect.
  *  - Query scoring never explodes at all: a k-term query becomes k
  *    codegen'd `size(filter(split(...)))` counters evaluated at scan
  *    speed, and the corpus-level statistics (N, df_t, Σdl) reduce to
  *    ONE aggregate row that broadcasts back over the scan. Cost is a
  *    single corpus pass + a top-k — the same shape Lucene's
  *    distributed cousins (and every Spark-side BM25 batch scorer) use.
  *  - Top-k is `orderBy().limit(k)` — Catalyst plans
  *    TakeOrderedAndProject (per-partition heaps, k·P merge), then the
  *    rank window runs over k rows, not the corpus.
  *
  * Float parity with the DuckDB oracle: every score is a fixed
  * LEFT-TO-RIGHT sum of per-term weights whose inputs (tf, df, N, dl,
  * Σdl) are exact integers — both engines evaluate the identical IEEE
  * expression tree, then round to 6 dp with id tiebreaks, so partial-
  * aggregation summation order can never flip a rank (same convention
  * as [[Similarity]]).
  */
object Search {

  /** The fixed keyword query used by the scoring queries — three terms
    * with distinct document frequencies in the synthetic corpus. */
  private[ext] val queryTerms = Seq("spark", "window", "hash")

  private val K1 = 1.2
  private val B  = 0.75

  /** Per-term term-frequency counter — map-side, no explode. */
  private def tfExpr(term: String): String =
    s"size(filter(split(text, ' '), w -> w = '$term'))"

  /** doc length in tokens (corpus is single-space separated). */
  private val dlExpr = "size(split(text, ' '))"

  // ---- inverted index -----------------------------------------------------

  /** Inverted index: one row per term with document frequency, total
    * term frequency, and the head of the postings list (top-3 doc_ids
    * by tf desc, doc_id asc — the "champion list" a real index keeps
    * for upper-bound pruning). Postings are bounded per term by a
    * window INSIDE the term partition; the full index at 100 TB would
    * be written partitioned by term-hash, which is exactly the shuffle
    * this plan performs. */
  def invertedIndexOn(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val stats = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"))
    val w = Window.partitionBy(col("term"))
      .orderBy(col("tf").desc, col("doc_id").asc)
    val champions = tf.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .groupBy(col("term"))
      // sort_array on (rk, doc_id) structs reproduces the rank order
      // deterministically; collect_list alone is order-unstable. The
      // list is serialized to CSV — Arrow stringifies Spark vs DuckDB
      // LIST inner types differently, failing the driver's schema gate.
      .agg(expr("array_join(transform(sort_array(collect_list(struct(rk, doc_id))), s -> s.doc_id), ',')")
        .as("top_docs"))
    stats.join(champions, Seq("term"))
  }

  def invertedIndex(spark: SparkSession, sfDir: String): DataFrame =
    invertedIndexOn(Tables.documents(spark, sfDir))

  // ---- incremental maintenance -------------------------------------------

  /** The index in MERGEABLE form: champions as a bounded
    * array<struct(tf, doc_id)> instead of the presentation CSV. */
  private def rawIndexOn(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col("term"))
      .orderBy(col("tf").desc, col("doc_id").asc)
    tf.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df_head"), // placeholder, recomputed below
        expr("collect_list(struct(tf, doc_id))").as("champs"))
      .drop("df_head")
      .join(tf.groupBy(col("term"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf")), Seq("term"))
  }

  /** Incremental index maintenance: fold a NEW-docs batch into the base
    * index WITHOUT rescanning the base corpus. Exactness argument: df /
    * total_tf are decomposable sums, and the union's top-3 champions
    * are always a subset of (base top-3 ∪ delta top-3) — any doc in the
    * merged top-3 ranks top-3 on its own side under the same
    * (tf desc, doc_id asc) key — so merging the two BOUNDED heads
    * reproduces the full rebuild bit-for-bit (the oracle IS the full
    * rebuild). 100 TB shape: the delta pass scans only the new batch;
    * the merge shuffles |terms| bounded rows, never postings. Assumes
    * disjoint doc sets (an id in both batches would double-count —
    * updates go through a delete/insert compaction, not this fold). */
  def indexDeltaMerge(base: DataFrame, delta: DataFrame): DataFrame = {
    val merged = rawIndexOn(base).unionByName(rawIndexOn(delta))
      .groupBy(col("term"))
      .agg(sum(col("df")).as("df"), sum(col("total_tf")).as("total_tf"),
        expr("flatten(collect_list(champs))").as("all_champs"))
    merged.select(col("term"), col("df"), col("total_tf"),
      expr("array_join(transform(slice(array_sort(transform(all_champs, " +
        "s -> struct(-s.tf as ntf, s.doc_id))), 1, 3), s -> s.doc_id), ',')")
        .as("top_docs"))
  }

  /** Registered split: every 5th doc arrives as the incremental batch. */
  def indexDelta(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    indexDeltaMerge(docs.filter(col("doc_id") % 5 =!= 0),
      docs.filter(col("doc_id") % 5 === 0))
  }

  // ---- scoring ------------------------------------------------------------

  /** Per-doc counters + the one-row corpus statistics frame, broadcast
    * back over the scan. Columns: tf_<i>, dl, n_docs, df_<i>, sum_dl. */
  private def counters(docs: DataFrame): DataFrame = {
    val perDoc = docs.selectExpr(
      Seq("doc_id") ++
        queryTerms.zipWithIndex.map { case (t, i) => s"${tfExpr(t)} as tf_$i" } ++
        Seq(s"$dlExpr as dl"): _*)
    val aggs = Seq(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")) ++
      queryTerms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = perDoc.agg(aggs.head, aggs.tail: _*)
    perDoc.crossJoin(broadcast(stats))
  }

  private def topK(scored: DataFrame, score: Column, k: Int): DataFrame = {
    val limited = scored
      .filter(queryTerms.indices.map(i => col(s"tf_$i")).reduce(_ + _) > 0)
      .withColumn("score", round(score, 6))
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
    // rank window runs over k rows (post-limit), not the corpus
    limited.withColumn("rk",
      row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc))
        .cast("int"))
  }

  /** TF-IDF top-15 for the fixed query: score = Σ_t tf_t · ln(N/df_t),
    * summed left-to-right in query-term order. */
  def tfidfTopKOn(docs: DataFrame, k: Int = 15): DataFrame = {
    val weights = queryTerms.indices.map(i =>
      col(s"tf_$i").cast("double") *
        log(col("n_docs").cast("double") / col(s"df_$i").cast("double")))
    topK(counters(docs), weights.reduceLeft(_ + _), k)
  }

  def tfidfTopK(spark: SparkSession, sfDir: String): DataFrame =
    tfidfTopKOn(Tables.documents(spark, sfDir))

  /** BM25 top-15 (k1=1.2, b=0.75):
    * score = Σ_t ln(1 + (N − df_t + 0.5)/(df_t + 0.5)) ·
    *         tf_t·(k1+1) / (tf_t + k1·(1 − b + b·dl/avgdl)),
    * avgdl = Σdl/N (exact-integer quotient, same on both engines). */
  def bm25TopKOn(docs: DataFrame, k: Int = 15): DataFrame = {
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val weights = queryTerms.indices.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val df = col(s"df_$i").cast("double")
      val idf = log(lit(1.0) +
        (col("n_docs").cast("double") - df + lit(0.5)) / (df + lit(0.5)))
      idf * (tf * lit(K1 + 1.0)) /
        (tf + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl").cast("double") / avgdl))
    }
    topK(counters(docs), weights.reduceLeft(_ + _), k)
  }

  def bm25TopK(spark: SparkSession, sfDir: String): DataFrame =
    bm25TopKOn(Tables.documents(spark, sfDir))

  // ---- hybrid fusion ------------------------------------------------------

  /** Hybrid retrieval: reciprocal-rank fusion (rrf = Σ 1/(60 + rank))
    * of the BM25 top-50 with the embedding top-50 (cosine against the
    * corpus vector vec_id = 0 — doc_id and vec_id share a key domain).
    * The lexical and dense lists are each k-bounded BEFORE the fusion
    * join, so the fusion cost is O(k), independent of corpus size —
    * the standard first-stage-retrieval shape. Missing-in-one-list
    * docs contribute 0 from that list (full outer join). */
  def hybridRrfOn(docs: DataFrame, embeddings: DataFrame, k: Int = 20): DataFrame = {
    val lexical = bm25TopKOn(docs, 50)
      .select(col("doc_id"), col("rk").as("lex_rk"))

    val e = embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", expr("sqrt(aggregate(zip_with(v, v, (x, y) -> x * y), 0d, (a, x) -> a + x))"))
    val q = e.filter(col("vec_id") === 0)
      .select(col("v").as("qv"), col("norm").as("qn"))
    val dense = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .withColumn("cos", round(
        expr("aggregate(zip_with(v, qv, (x, y) -> x * y), 0d, (a, x) -> a + x)") /
          (col("norm") * col("qn")), 6))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(50)
      .withColumn("vec_rk",
        row_number().over(Window.orderBy(col("cos").desc, col("vec_id").asc)))
      .select(col("vec_id").as("doc_id"), col("vec_rk"))

    lexical.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(60.0) + col("lex_rk")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("vec_rk")), lit(0.0)), 6))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(k)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("rrf").desc, col("doc_id").asc))
          .cast("int"))
      .select(col("doc_id"), col("rrf"), col("rk"))
  }

  def hybridRrf(spark: SparkSession, sfDir: String): DataFrame =
    hybridRrfOn(Tables.documents(spark, sfDir), Tables.embeddings(spark, sfDir))

  // ---- phrase search ------------------------------------------------------

  /** Positional phrase search for "fast sort": the positional-index
    * plan (posexplode → adjacency via lead() within the doc partition —
    * per-doc windows are bounded by doc length, never global), counting
    * matching documents per source. The oracle verifies the SEMANTICS
    * through the equivalent padded-substring test (exact on this
    * single-space-tokenized corpus). */
  def phraseCountOn(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    toks.withColumn("nxt", lead(col("w"), 1).over(w))
      .filter(col("w") === "fast" && col("nxt") === "sort")
      .select(col("doc_id"), col("source")).distinct()
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
  }

  def phraseCount(spark: SparkSession, sfDir: String): DataFrame =
    phraseCountOn(Tables.documents(spark, sfDir))

  // ---- registry -----------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "search_inverted_index" -> invertedIndex _,
    "search_index_delta" -> indexDelta _,
    "search_tfidf_topk" -> tfidfTopK _,
    "search_bm25_topk" -> bm25TopK _,
    "search_hybrid_rrf" -> hybridRrf _,
    "search_phrase_count" -> phraseCount _,
  )

  private val fullIndexOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      |stats AS (
      |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf
      |  FROM tf GROUP BY 1),
      |ranked AS (
      |  SELECT term, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY term ORDER BY tf DESC, doc_id ASC) AS rk
      |  FROM tf),
      |champions AS (
      |  SELECT term, array_to_string(list(doc_id ORDER BY rk), ',') AS top_docs
      |  FROM ranked WHERE rk <= 3 GROUP BY term)
      |SELECT s.term, s.df, s.total_tf, c.top_docs
      |FROM stats s JOIN champions c USING (term)""".stripMargin

  /** DuckDB mirrors. Scores are written with the IDENTICAL expression
    * tree and left-to-right summation as the Spark side, over exact
    * integer inputs, then rounded to 6 dp — see the float-parity note
    * in the object scaladoc. */
  private def oracleTf(term: String): String =
    s"len(list_filter(string_split(text, ' '), w -> w = '$term'))"

  private val oracleCounters: String =
    s"""perdoc AS (
       |  SELECT doc_id,
       |    ${Search.queryTerms.zipWithIndex.map { case (t, i) => s"${oracleTf(t)} AS tf_$i" }.mkString(", ")},
       |    len(string_split(text, ' ')) AS dl
       |  FROM documents),
       |stats AS (
       |  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
       |    ${Search.queryTerms.indices.map(i => s"SUM(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS df_$i").mkString(", ")}
       |  FROM perdoc)""".stripMargin

  private def oracleTopK(scoreSql: String, k: Int): String =
    s"""WITH $oracleCounters,
       |scored AS (
       |  SELECT doc_id, round($scoreSql, 6) AS score
       |  FROM perdoc, stats
       |  WHERE ${Search.queryTerms.indices.map(i => s"tf_$i").mkString(" + ")} > 0),
       |lim AS (SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id ASC LIMIT $k)
       |SELECT doc_id, score,
       |  CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rk
       |FROM lim""".stripMargin

  private val tfidfScoreSql: String =
    queryTerms.indices.map(i =>
      s"(CAST(tf_$i AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / CAST(df_$i AS DOUBLE)))")
      .mkString(" + ")

  private val bm25ScoreSql: String =
    queryTerms.indices.map { i =>
      val tf = s"CAST(tf_$i AS DOUBLE)"
      val df = s"CAST(df_$i AS DOUBLE)"
      val idf = s"ln(1.0 + (CAST(n_docs AS DOUBLE) - $df + 0.5) / ($df + 0.5))"
      s"(($idf * ($tf * ${K1 + 1.0})) / ($tf + $K1 * (${1.0 - B} + $B * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))"
    }.mkString(" + ")

  val oracleSql: Map[String, String] = Map(
    // delta-merge must equal the full rebuild — the oracle IS the
    // full-rebuild SQL, shared verbatim with search_inverted_index
    "search_index_delta" -> fullIndexOracle,
    "search_inverted_index" -> fullIndexOracle,
    "search_tfidf_topk" -> oracleTopK(tfidfScoreSql, 15),
    "search_bm25_topk" -> oracleTopK(bm25ScoreSql, 15),
    "search_hybrid_rrf" ->
      s"""WITH $oracleCounters,
         |scored AS (
         |  SELECT doc_id, round($bm25ScoreSql, 6) AS score
         |  FROM perdoc, stats
         |  WHERE ${queryTerms.indices.map(i => s"tf_$i").mkString(" + ")} > 0),
         |lex0 AS (SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id ASC LIMIT 50),
         |lex AS (
         |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS lex_rk
         |  FROM lex0),
         |e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS norm
         |  FROM embeddings),
         |q AS (SELECT v AS qv, norm AS qn FROM e WHERE vec_id = 0),
         |cosd AS (
         |  SELECT vec_id,
         |    round(list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * qv[i]))
         |      / (norm * qn), 6) AS cos
         |  FROM e, q WHERE vec_id <> 0),
         |dense0 AS (SELECT vec_id, cos FROM cosd ORDER BY cos DESC, vec_id ASC LIMIT 50),
         |dense AS (
         |  SELECT vec_id AS doc_id,
         |    ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id ASC) AS vec_rk
         |  FROM dense0),
         |fused AS (
         |  SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id,
         |    round(COALESCE(1.0 / (60.0 + lex_rk), 0.0)
         |        + COALESCE(1.0 / (60.0 + vec_rk), 0.0), 6) AS rrf
         |  FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id),
         |lim AS (SELECT doc_id, rrf FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT 20)
         |SELECT doc_id, rrf,
         |  CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id ASC) AS INTEGER) AS rk
         |FROM lim""".stripMargin,
    "search_phrase_count" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM documents
        |WHERE contains(' ' || text || ' ', ' fast sort ')
        |GROUP BY source""".stripMargin,
  )
}
