package graft.queries

import graft.SparkSpec

/** Whole-registry smoke: every declared capability runs on sf0.001 and
  * produces rows; names unique; every oracle belongs to a query.
  * (Value-level correctness is the driver's DuckDB gate + tools/check.py.) */
class RegistrySpec extends SparkSpec {

  test("query names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size)
  }

  test("every oracle key names a registered query") {
    assert(Registry.oracles.keySet.subsetOf(Registry.queries.keySet))
  }

  test("SparkEntry.entry returns rows (driver t1 smoke)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  for (q <- Registry.all) {
    test(s"${q.name} runs on sf0.001 and returns rows") {
      val df = q.build(spark, sfDir)
      assert(df.count() > 0, s"${q.name} returned 0 rows")
    }
  }
}
