package graft

import org.apache.spark.sql.SparkSession

/** One place for the session config every entry point (Verify, Bench,
  * tests) must share so results are reproducible and oracle-comparable.
  */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // Deterministic rendering vs the DuckDB oracle:
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) which Spark can't read
      // natively; read as long nanos, Tables.events converts to µs.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Write µs INT64 timestamps (not INT96) so pyarrow/DuckDB read
      // back exactly what DuckDB's own results contain.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // AQE: runtime partition coalescing + skew-join splitting — the
      // at-scale defaults we design for.
      .config("spark.sql.adaptive.enabled", "true")
      // Custom codegen expressions (scaled_dot, …) as SQL functions.
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // Managed tables (bucketed-join demos/tests) go to tmp, not cwd.
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
}
