package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the full-text retrieval tier — the DuckDB
  * hash-compare proves cross-engine equality; these prove the rankings
  * MEAN what retrieval claims (df counts docs not occurrences, BM25
  * length-normalizes, RRF rewards presence in both lists, phrase
  * search requires adjacency). */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val planted = Seq(
    // doc 0: 'spark' ×3 in a SHORT doc
    (0L, "spark spark spark", "en", "s0", 17L),
    // doc 1: 'spark' ×3 diluted in a LONG doc
    (1L, ("spark spark spark " + Array.fill(60)("pad").mkString(" ")), "en", "s0", 0L),
    // doc 2: one hit of each query term
    (2L, "spark window hash filler filler", "en", "s1", 0L),
    // doc 3: no query terms, carries the phrase
    (3L, "alpha fast sort beta", "en", "s1", 0L),
    // doc 4: phrase words present but NOT adjacent
    (4L, "fast beta sort gamma", "en", "s1", 0L),
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("inverted index: df counts documents, total_tf counts occurrences, champions rank by tf") {
    val idx = Search.invertedIndexOn(planted).collect()
      .map(r => r.getAs[String]("term") ->
        ((r.getAs[Long]("df"), r.getAs[Long]("total_tf"), r.getAs[String]("top_docs"))))
      .toMap
    assert(idx("spark")._1 == 3L)  // docs 0, 1, 2 — not 7 (occurrences)
    assert(idx("spark")._2 == 7L)  // 3 + 3 + 1 occurrences
    // champions: tf desc (docs 0 and 1 tie at 3, id-break), then doc 2
    assert(idx("spark")._3 == "0,1,2")
    assert(idx("fast") == ((2L, 2L, "3,4")))
  }

  test("index delta-merge equals the full rebuild, including cross-batch champion displacement") {
    // delta doc 5 carries 'spark' ×4 — it must DISPLACE base champions
    // in the merged top-3, which only happens if the merge re-ranks
    // across batches rather than appending
    val delta = Seq(
      (5L, "spark spark spark spark window", "en", "s2", 0L),
      (6L, "fast sort solo", "en", "s2", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val merged = Search.indexDeltaMerge(planted, delta).collect()
      .map(r => r.getAs[String]("term") ->
        ((r.getAs[Long]("df"), r.getAs[Long]("total_tf"), r.getAs[String]("top_docs"))))
      .toMap
    val full = Search.invertedIndexOn(planted.unionByName(delta)).collect()
      .map(r => r.getAs[String]("term") ->
        ((r.getAs[Long]("df"), r.getAs[Long]("total_tf"), r.getAs[String]("top_docs"))))
      .toMap
    assert(merged == full)
    assert(merged("spark")._3 == "5,0,1") // delta doc leads the champions
    assert(merged("fast") == ((3L, 3L, "3,4,6")))
  }

  test("tf-idf: more matched terms beat repeated single term only when idf says so") {
    val out = Search.tfidfTopKOn(planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("rk")).toMap
    // docs 3, 4 contain no query terms → absent
    assert(!out.contains(3L) && !out.contains(4L))
    assert(Set(0L, 1L, 2L).subsetOf(out.keySet))
    // doc 2 hits 'window' and 'hash' (df=1 → max idf) plus 'spark';
    // docs 0/1 only repeat the common 'spark' (df=3 → low idf)
    assert(out(2L) == 1, s"expected doc 2 first, got $out")
  }

  test("bm25: length normalization ranks the short 3×spark doc above the diluted one") {
    val out = Search.bm25TopKOn(planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("rk")).toMap
    assert(out(0L) < out(1L),
      s"same tf, shorter doc must score higher: $out")
  }

  test("hybrid RRF on the corpus: every fused doc carries a positive score and ranks densely") {
    val out = Search.hybridRrf(spark, sfDir).collect()
    assert(out.length == 20)
    assert(out.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to 20))
    assert(out.forall(_.getAs[Double]("rrf") > 0))
    // the fused maximum cannot exceed a #1 rank in both lists
    assert(out.forall(_.getAs[Double]("rrf") <= 2.0 / 61.0 + 1e-9))
  }

  test("phrase search requires adjacency") {
    val out = Search.phraseCountOn(planted).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_docs")).toMap
    // doc 3 matches 'fast sort'; doc 4 (non-adjacent) must not
    assert(out == Map("s1" -> 1L))
  }

  test("corpus run: bm25 and tfidf agree on the hit set, scores positive, ranks dense") {
    val tfidf = Search.tfidfTopK(spark, sfDir).collect()
    val bm25 = Search.bm25TopK(spark, sfDir).collect()
    assert(tfidf.length == 15 && bm25.length == 15)
    assert(tfidf.forall(_.getAs[Double]("score") > 0))
    assert(bm25.forall(_.getAs[Double]("score") > 0))
    assert(bm25.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to 15))
  }
}
