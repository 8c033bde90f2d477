package graft

/** Driver-contract smoke: every declared query runs at sf0.001 and every
  * query has an oracle (the t2 gate requires both). */
class QueriesSpec extends SparkSpec {

  test("flagship entry returns rows (t1 smoke, SURVEY §7.3)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has a matching oracle entry or is declared rows-only") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"dangling oracles: ${o.diff(q)}")
    assert(q.diff(o) == SparkEntry.rowsOnlyQueries,
      s"queries missing an oracle and not declared rows-only: ${q.diff(o).diff(SparkEntry.rowsOnlyQueries)}")
  }

  test("all queries execute and return rows at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, sf).count()
        if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with zero rows: $empty")
  }
}
