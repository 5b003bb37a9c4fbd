package graft

class RegistrySpec extends SparkTestBase {

  test("registry names are unique") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size === names.size)
  }

  test("every oracle belongs to a registered query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query returns a non-empty, deterministic-schema result") {
    SparkEntry.registry.foreach { q =>
      val df = q.fn(spark, sfDir)
      assert(df.columns.nonEmpty, s"${q.name} has no columns")
      assert(df.count() > 0, s"${q.name} returned 0 rows at sf0.001")
    }
  }
}
