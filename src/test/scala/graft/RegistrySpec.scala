package graft

/** Registry integrity: every query is unique and every query carries
  * its DuckDB oracle — the invariant the driver's correctness gate
  * rests on.
  */
class RegistrySpec extends SparkSpec {

  test("every registered query has an oracle and a unique name") {
    val qs = SparkEntry.queries
    val os = SparkEntry.oracleSql
    assert(qs.size == 206, s"expected 206 queries, found ${qs.size}")
    assert(os.keySet == qs.keySet,
      s"oracle-less queries: ${qs.keySet -- os.keySet}")
  }

  test("the flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
