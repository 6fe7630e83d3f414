package graft

/** Driver-contract invariants for the query registry itself — a typo'd
  * oracle key or an accidentally-unoracled query would silently weaken
  * the correctness gate, so the mapping is enforced here. */
class EntryContractSpec extends SparkSpec {

  /** Queries intentionally without a SQL oracle (driver falls back to a
    * rows-only check). Every entry must carry a reason. EMPTY since
    * r16: the two approximate-sketch queries were re-registered as
    * error-bound audits (exact sides computed by both engines, accuracy
    * flags asserted TRUE by the oracle), so every query is
    * hash-checkable. */
  private val rowsOnlyAllowlist = Map.empty[String, String]

  test("every oracle key names a real query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query is oracle-backed unless explicitly rows-only") {
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled == rowsOnlyAllowlist.keySet,
      s"un-oracled queries outside the allowlist: ${unoracled -- rowsOnlyAllowlist.keySet}")
  }

  test("query names are stable snake_case identifiers") {
    val bad = SparkEntry.queries.keySet.filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-conforming names: $bad")
  }

  test("the flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("the facade session builder carries the engine extensions") {
    // builder config only — the shared test session already exists, so
    // we assert the declared configuration rather than a new session
    val opts = Graft.sessionBuilder(cores = 8)
    // getOrCreate on an existing session would ignore extensions; the
    // declared class must at least resolve
    assert(Class.forName(classOf[functions.GraftExtensions].getName) != null)
    assert(opts != null)
  }
}
