package graft

/** q84's contract: the runtime bloom filter must actually be injected —
  * a plain shuffle join would pass the oracle too, so correctness alone
  * can't distinguish the pattern from its absence.
  */
class BloomJoinSpec extends SparkTestBase {

  test("q84 optimized plan carries a bloom might_contain on the fact side") {
    val df = SparkEntry.queries("q84_bloom_join")(spark, sfDir)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(
      optimized.toLowerCase.contains("might_contain"),
      s"no runtime bloom filter in optimized plan:\n$optimized")
  }

  test("q84 derived-session overrides do not leak into the parent session") {
    SparkEntry.queries("q84_bloom_join")(spark, sfDir)
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1")
  }

  test("q87 salted join joins on (user_id, salt) with no broadcast") {
    val df = SparkEntry.queries("q87_salted_join")(spark, sfDir)
    // broadcast selection happens in PHYSICAL planning — the optimized
    // logical plan never says "broadcast" without an explicit hint, so
    // only the spark plan can catch a lost autoBroadcastJoinThreshold
    // override (review finding: the logical-plan check was vacuous)
    val physical = df.queryExecution.sparkPlan.toString
    assert(physical.contains("salt"), s"salt key missing from join:\n$physical")
    assert(!physical.contains("BroadcastHashJoin"),
      s"salted join must demonstrate the shuffle path:\n$physical")
    assert(physical.contains("SortMergeJoin") || physical.contains("ShuffledHashJoin"),
      s"expected a shuffle join:\n$physical")
  }
}
