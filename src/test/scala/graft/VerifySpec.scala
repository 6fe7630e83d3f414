package graft

/** Pins the Verify artifact-durability contract (r12 post-mortem: the
  * driver's CORRECTNESS_r12.json came back `{}` because the old Verify
  * wrote oracle_sql.json AFTER the full dump loop — a mid-loop kill
  * left nothing for the comparator). The contract under test:
  *   - oracle_sql.json exists and parses even when only a subset of
  *     queries is dumped (it is written FIRST);
  *   - every attempted query lands in verify_progress.json with a
  *     status and a time;
  *   - the dump order is cheapest-first by prior bench time, with
  *     unknown (new) queries slotted between the bulk and the tail.
  */
class VerifySpec extends SparkSpec {

  test("orderByPrior: cheapest first, unknowns at 5s, ties by name") {
    val prior = Map("heavy" -> 9.0, "cheap" -> 0.2, "mid" -> 0.8)
    val got = Verify.orderByPrior(
      Seq("new_b", "heavy", "cheap", "new_a", "mid"), prior)
    assert(got == Seq("cheap", "mid", "new_a", "new_b", "heavy"))
  }

  test("run writes oracle_sql.json first and a progress row per query") {
    val out = java.nio.file.Files.createTempDirectory("graft-verify").toString
    Verify.run(spark, sfDir, out,
      only = Some(Set("ref_avg_by_city", "ref_count_by_city")))

    val oracle = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/oracle_sql.json"))
    // full surface regardless of the filter: the comparator needs every
    // query's SQL no matter which dumps landed
    assert(oracle.contains("\"ref_avg_by_city\""))
    assert(oracle.contains("\"dedup_minhash_lsh\""))

    val progress = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/verify_progress.json"))
    assert(progress.contains(""""total":2"""))
    assert(progress.contains(""""recorded":2"""))
    assert(progress.contains(""""ok":2"""))
    assert(progress.contains(""""ref_avg_by_city":{"status":"ok""""))

    // and the dumps themselves are readable, non-empty parquet
    assert(spark.read.parquet(s"$out/ref_avg_by_city").count() > 0)
    assert(spark.read.parquet(s"$out/ref_count_by_city").count() > 0)

    // verify_summary.json: the self-describing header (r16 verdict #1 —
    // a partial driver handoff must carry its own ok/failed counts and
    // the oracle path, machine-readably, next to oracle_sql.json)
    val summary = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/verify_summary.json"))
    assert(summary.contains(""""total":2"""))
    assert(summary.contains(""""ok":2"""))
    assert(summary.contains(""""oracle":"oracle_sql.json""""))
  }

  test("degradation ladder: wall-budget exhaustion skips loudly, never dies") {
    val out = java.nio.file.Files.createTempDirectory("graft-verify").toString
    // totalBudget + skipAfter both 0: every query is past the skip line
    // the moment it is dequeued — all recorded as skipped, the oracle
    // artifact still present (written first)
    Verify.run(spark, sfDir, out,
      only = Some(Set("ref_avg_by_city", "ref_count_by_city")),
      totalBudget = 0.0, skipAfter = 0.0)
    val progress = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/verify_progress.json"))
    assert(progress.contains(""""skipped":2"""))
    assert(progress.contains(""""recorded":2"""))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/oracle_sql.json")))
  }

  test("degradation ladder: the per-query cancel cap fires and is recorded as failed") {
    val out = java.nio.file.Files.createTempDirectory("graft-verify").toString
    // a 1 ms cap cancels the dump's job group mid-flight; the failure
    // is recorded and the run completes normally
    Verify.run(spark, sfDir, out,
      only = Some(Set("win_running_total")), queryBudget = 0.001)
    val progress = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/verify_progress.json"))
    assert(progress.contains(""""failed":1"""), progress)
  }

  test("a failing query is recorded as failed, not fatal") {
    // drive dumpOne's catch path via a name whose fn throws: simulate by
    // filtering to a real query but pointing sfDir at a missing path
    val out = java.nio.file.Files.createTempDirectory("graft-verify").toString
    Verify.run(spark, "/nonexistent/sf", out, only = Some(Set("ref_avg_by_city")))
    val progress = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/verify_progress.json"))
    assert(progress.contains(""""failed":1"""))
    // the oracle artifact is still present — written before the failure
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/oracle_sql.json")))
  }
}
