package graft

class RegistrySpec extends SparkTestBase {

  test("registry names are unique") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size === names.size)
  }

  test("every oracle belongs to a registered query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("rows-only queries are exactly the documented sketch waivers") {
    // every other query MUST carry DuckDB oracle SQL (SURVEY §2.2b);
    // the two waivers are engine-specific sketches whose accuracy is
    // pinned by specs instead (HLL in FunctionsSpec, GK here below)
    val noOracle = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(noOracle === Set("q09_approx_distinct", "q74_approx_quantile"))
  }

  test("query names follow the qNN_ convention") {
    SparkEntry.registry.foreach(q =>
      assert(q.name.matches("q\\d{2,3}_[a-z0-9_]+"), s"bad name: ${q.name}"))
  }

  test("oracle SQL references only harness tables") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val fromRe = "(?i)(?:FROM|JOIN)\\s+([a-z_][a-z0-9_]*)".r
    SparkEntry.oracleSql.foreach { case (name, rawSql) =>
      // EXTRACT(unit FROM col) is not a table reference
      val sql = rawSql.replaceAll("(?i)EXTRACT\\s*\\([^)]*\\)", "")
      // strip CTE names declared in this query before checking —
      // including recursive CTEs with a column list: name(col, ...) AS (
      val ctes = "(?i)([a-z_][a-z0-9_]*)\\s*(?:\\([^)]*\\))?\\s+AS\\s*\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      fromRe.findAllMatchIn(sql).map(_.group(1).toLowerCase).foreach { t =>
        assert(tables.contains(t) || ctes.contains(t),
          s"$name references unknown table '$t'")
      }
    }
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("approx quantiles track the exact rank-based percentiles") {
    // q74 has no DuckDB oracle (sketch is engine-specific); bound it
    // against q49's exact answers instead. accuracy=10000 ⇒ rank error
    // ≤ n/10000, far below these tolerances at any sf.
    val exact = SparkEntry.queries("q49_percentile_disc")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    SparkEntry.queries("q74_approx_quantile")(spark, sfDir)
      .collect().foreach { a =>
        val e = exact(a.getString(0))
        assert(math.abs(a.getDouble(1) - e.getDouble(1)) <= 2.0)   // qty is 1..50
        assert(math.abs(a.getDouble(2) - e.getDouble(2)) <= 2.0)
        assert(math.abs(a.getDouble(3) - e.getDouble(3)) / e.getDouble(3) <= 0.02)
      }
  }

  test("every query returns a non-empty, deterministic-schema result") {
    SparkEntry.registry.foreach { q =>
      val df = q.fn(spark, sfDir)
      assert(df.columns.nonEmpty, s"${q.name} has no columns")
      assert(df.count() > 0, s"${q.name} returned 0 rows at sf0.001")
    }
  }
}
