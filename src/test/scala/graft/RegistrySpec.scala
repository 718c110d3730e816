package graft

import graft.queries.Registry

/** Every registered query must run on sf0.001 and produce a sane result.
  * Value-level correctness is covered by the DuckDB oracle gate (Verify);
  * this spec catches runtime errors, empty results, and name drift early.
  */
class RegistrySpec extends SparkSpec {

  test("registry names are unique and oracle keys match query keys") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  Registry.all.foreach { q =>
    test(s"${q.name} runs on sf0.001 and returns rows") {
      val df = q.run(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"${q.name} returned 0 rows")
    }
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
