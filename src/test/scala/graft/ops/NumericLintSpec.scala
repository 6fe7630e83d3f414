package graft.ops

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Lint gate for the cross-engine numeric-canonicalization hazard that
  * produced every r10 driver hash failure: `round(double, 6)` output
  * columns (bare or cast to DECIMAL(18,6)) resolve decimal half-ties
  * differently across engines — Spark rounds the SHORTEST DECIMAL REPR
  * of the double HALF_UP, DuckDB versions round the binary double — so
  * any rounded value whose shortest repr terminates at the 7th
  * fractional digit with a 5 (dyadic rationals m/2⁷ do this BY
  * CONSTRUCTION, and small-denominator rationals land there by
  * accident) can hash-mismatch at the driver while passing locally.
  *
  * The repo-wide fix pattern is exact integer micro-units
  * (floor(x·10⁶) BIGINT — pure integer arithmetic where the value is
  * rational, a single-rounded IEEE chain otherwise). This spec makes
  * the hazard structurally unreintroducible:
  *
  *  1. no oracle may produce a DECIMAL from round() at all;
  *  2. every oracle still using round() must be allowlisted HERE with
  *     a recorded tie-free proof — adding a new round() output column
  *     fails until its proof is written down;
  *  3. main sources may not combine round( and decimal(18,6) on one
  *     expression line.
  */
class NumericLintSpec extends AnyFunSuite {

  /** Oracles allowed to keep `round(`, each with the proof its rounded
    * values cannot hit a cross-engine 6-dp half-tie. A key present here
    * but no longer using round() fails too (stale proof). */
  private val roundAllowlist: Map[String, String] = Map(
    // round(2dp·100) integer-snapping: the double sits within an ulp of
    // an exact integer, both engines round-to-nearest to the same int.
    "agg_gini_by_segment" -> "cents snap: round(2dp*100) is integer-exact",
    "agg_moment_stats" -> "cents snap: round(2dp*100) is integer-exact",
    "join_tpch_q22" -> "cents snap: round(2dp*100) is integer-exact",
    "agg_weighted_avg" -> "cents snap: round(2dp*100) is integer-exact",
    "fn_math" -> "cents snap: round(2dp*100) is integer-exact",
    "win_running_total" -> "cents snap: round(2dp*100) is integer-exact",
    // percentile over events.value (exactly 2 dp): the true value
    // terminates at <= 4 decimal digits (quantile lerp of cents at a
    // one-digit fraction), so rounding at digit 7 has no remainder —
    // never a tie, and a last-ulp lerp difference cannot cross a 6-dp
    // boundary that the <= 4-digit true value sits exactly on.
    "kql_percentiles" -> "quantile lerp of 2dp data: true value <= 4dp",
    "kql_percentilew" -> "quantile lerp of 2dp data: true value <= 4dp",
    "kql_rolling_percentile" -> "quantile lerp of 2dp data: true value <= 4dp",
    // log-valued scores (log2/ln of rational arguments != 1 are
    // transcendental): shortest reprs run ~17 digits, a 7-digit repr
    // would mean the score sits within half an ulp of a 7-digit
    // decimal — impossible for the exact value, measure-zero for the
    // computed one, and order is fold-mirrored on both engines.
    "search_bm25_topk" -> "BM25 log terms: transcendental, no short repr",
    "search_tfidf_topk" -> "idf log terms: transcendental, no short repr",
    "text_dsir" -> "log-likelihood ratios: transcendental",
    "text_dsir_corpus" -> "log-likelihood ratios: transcendental",
    "text_ccnet_buckets" -> "log2 perplexity: transcendental",
    "text_perplexity" -> "avg log2: transcendental",
    // tdigest chunk means: round(S/n, 6) where S is an exact-integer
    // double sum (amounts < 2^53) and n an exact small int — BOTH
    // engines divide the IDENTICAL exact operands, so they round the
    // same double and tie behavior cannot diverge. The merge's
    // weighted means fold Σ(m·w) left-to-right with the oracle
    // mirroring the order via an ORDERED list_reduce — again identical
    // doubles into one shared round.
    "kql_tdigest" -> "one-rounded division of identical exact operands",
    "kql_tdigest_merge" -> "order-mirrored fold into one shared round",
    // RRF: sums of 1/(60+rank), rank <= 50. The only power-of-10-smooth
    // denominators in [61,110] are 64, 80, 100; any pairwise lcm is
    // 2^a·5^b <= 1600, so every terminating value stops by digit 6 —
    // a 7th-digit tie needs 2^7 or 5^7, which cannot divide the lcm.
    "search_hybrid_rrf" -> "1/(60+rk) sums terminate by digit 6",
    // Cosines/means over the float-valued embedding corpus: norms are
    // sqrt of non-square sums (irrational), fold order is mirrored
    // op-for-op in the oracle, and round() here canonicalizes last-ulp
    // drift that sits ~1e9 ulps away from any half-tie of these
    // long-repr doubles.
    "sim_topk_brute" -> "float cosine: irrational norms, mirrored folds",
    "sim_lsh_topk" -> "float cosine: irrational norms, mirrored folds",
    "sim_ivf_topk" -> "float cosine: irrational norms, mirrored folds",
    "sim_ivf_topk_partitioned" -> "float cosine: irrational norms, mirrored folds",
    "sim_ivf_delta" -> "float cosine: irrational norms, mirrored folds",
    "sim_ivf_train" -> "member means: long-repr floats, mirrored folds",
    "sim_ivf_train_step" -> "member means: long-repr floats, mirrored folds",
    "sim_ivfpq_topk" -> "ADC sums: decimal-exact terms, mirrored folds",
    "sim_pq_train" -> "subspace means: long-repr floats, mirrored folds",
    "sim_pq_encode" -> "codeword distances: long-repr floats",
    "sim_pq_topk" -> "ADC sums: decimal-exact terms, mirrored folds",
    "sim_sq8_topk" -> "dequantized cosine: long-repr floats",
    "sim_dim_truncation" -> "truncated cosine: long-repr floats",
    "sim_semantic_dedup" -> "float cosine: irrational norms, mirrored folds",
    // FM/PCSA estimate: k/0.77351 with denominator coprime to 10 —
    // either non-terminating (long repr) or, when 77351 | k·10^11,
    // terminating with an even final digit; an exact half would need an
    // odd 2k·10^11/77351, impossible for integer k.
    "sketch_fm_distinct" -> "k/0.77351: coprime-to-10 denominator, no tie",
    "sketch_fm_merge" -> "k/0.77351: coprime-to-10 denominator, no tie",
  )

  private def oracleRoundUsers: Set[String] =
    SparkEntry.oracleSql.collect {
      case (name, sql) if sql.toLowerCase.contains("round(") => name
    }.toSet

  test("no oracle produces a DECIMAL from round() (half-tie hash class)") {
    val bad = SparkEntry.oracleSql.filter { case (_, sql) =>
      sql.toLowerCase.linesIterator.exists(l =>
        l.contains("round(") && l.contains("decimal("))
    }
    assert(bad.isEmpty,
      s"round()->DECIMAL output columns (convert to floor(x*1e6) BIGINT " +
        s"micro-units): ${bad.keys.toSeq.sorted.mkString(", ")}")
  }

  test("every oracle using round() carries a recorded tie-free proof") {
    val users = oracleRoundUsers
    val unproven = users -- roundAllowlist.keySet
    assert(unproven.isEmpty,
      "new round() oracle columns need a tie-free proof in " +
        s"NumericLintSpec.roundAllowlist (or micro-unit conversion): " +
        s"${unproven.toSeq.sorted.mkString(", ")}")
    val stale = roundAllowlist.keySet -- users
    assert(stale.isEmpty,
      s"allowlist entries whose oracle no longer uses round(): " +
        s"${stale.toSeq.sorted.mkString(", ")}")
  }

  test("main sources never round a double into DECIMAL(18,6)") {
    val root = Paths.get("src", "main", "scala")
    assert(Files.isDirectory(root), s"expected to run from the repo root: $root")
    val offenders = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .flatMap { p: Path =>
        Files.readAllLines(p).asScala.zipWithIndex.collect {
          case (l, i) if l.toLowerCase.contains("round(") &&
            l.toLowerCase.contains("decimal(18,6)") => s"$p:${i + 1}"
        }
      }.toSeq
    assert(offenders.isEmpty,
      s"round(...)->DECIMAL(18,6) on one line (half-tie class): $offenders")
  }
}
