package graft

/** Smoke coverage for every catalog query: builds, runs at sf0.001, and
  * returns a sane shape. Exact value parity with DuckDB is checked by the
  * driver's oracle harness (and locally by tools/verify_local.py). */
class CatalogSpec extends SparkSuite {

  test("every oracleSql key has a queries entry") {
    val q = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(q)
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001 and returns rows") {
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every Bench headline name is a real catalog query") {
    val stale = Bench.headline.diff(SparkEntry.queries.keySet)
    assert(stale.isEmpty,
      s"headline names missing from the catalog (typo or removed query): $stale")
  }
}
