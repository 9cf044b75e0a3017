package graft

class RelationalSpec extends SparkSpec {

  test("contract: every oracleSql key has a query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("A1 scan_filter_project: rows in range, revenue decimal") {
    val df = run("scan_filter_project")
    val n = df.count()
    assert(n > 0)
    assert(df.schema("revenue").dataType.typeName == "decimal(18,4)")
    val dates = df.selectExpr("min(l_shipdate) AS lo", "max(l_shipdate) AS hi").head()
    assert(dates.getAs[java.time.LocalDateTime]("lo").getYear == 1996)
    assert(dates.getAs[java.time.LocalDateTime]("hi").getYear == 1996)
  }

  test("A2 source_events_ns: µs truncation of first event matches fixture") {
    val df = run("source_events_ns")
    // FIXTURES.md: events ts #0 = 2024-01-01 00:09:58.778549829 ns → …778549 µs
    val first = df.head()
    assert(first.getAs[Long]("ts_us") % 1000000 == 58778549L % 1000000)
    assert(df.count() == 1000)
  }

  test("A3 source_json_props: k is int, non-null") {
    val df = run("source_json_props")
    assert(df.where("k IS NULL").count() == 0)
    assert(df.schema("k").dataType.typeName == "integer")
  }

  test("B1 filter_complex_pred: predicate holds on every row") {
    val df = run("filter_complex_pred")
    assert(df.count() > 0)
    assert(df.where("o_orderpriority NOT IN ('1-URGENT','2-HIGH')").count() == 0)
  }

  test("B2 filter_null_semantics: n_disc + n_zero_disc == n_all") {
    val bad = run("filter_null_semantics")
      .where("n_disc + n_zero_disc <> n_all").count()
    assert(bad == 0)
  }
}
