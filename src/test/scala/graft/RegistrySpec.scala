package graft

/** Registry integrity: every query is unique and every query carries
  * its DuckDB oracle — the invariant the driver's correctness gate
  * rests on.
  */
class RegistrySpec extends SparkSpec {

  test("every registered query has an oracle and a unique name") {
    val qs = SparkEntry.queries
    val os = SparkEntry.oracleSql
    // structural invariants, not a magic count: a new query landing
    // without its oracle (or vice versa) is the failure mode worth
    // pinning — the exact size grows every round
    assert(qs.nonEmpty)
    assert(os.keySet == qs.keySet,
      s"oracle-less queries: ${qs.keySet -- os.keySet}; " +
        s"query-less oracles: ${os.keySet -- qs.keySet}")
    val badNames = qs.keySet.filterNot(_.matches("[a-z0-9_]+"))
    assert(badNames.isEmpty, s"non-slug query names: $badNames")
  }

  test("the flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
