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

  test("SURVEY.md's registry inventory matches Registry.all (docs can't go stale)") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")))
    val m = """\((\d+) registry queries, (\d+) DuckDB-oracle-checked""".r
      .findFirstMatchIn(text)
    assert(m.isDefined, "SURVEY.md must state '(N registry queries, M DuckDB-oracle-checked'")
    assert(m.get.group(1).toInt === Registry.all.size,
      s"SURVEY.md says ${m.get.group(1)} queries; registry has ${Registry.all.size}")
    assert(m.get.group(2).toInt === Registry.oracles.size,
      s"SURVEY.md says ${m.get.group(2)} oracle-checked; registry has ${Registry.oracles.size}")
  }

  for (q <- Registry.all) {
    test(s"${q.name} runs on sf0.001 and returns rows") {
      val df = q.build(spark, sfDir)
      assert(df.count() > 0, s"${q.name} returned 0 rows")
    }
  }
}
