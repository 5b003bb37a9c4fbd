package graft

import graft.model.{FixtureCanary, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Fixture-drift canary: the harness regenerated `events.parquet` with a
  * new physical type once (round 8: TIMESTAMP(NANOS) → TIMESTAMP(MICROS))
  * and 23 queries died at analysis time with nothing naming the cause.
  * These tests make the next drift cost one red test with the table and
  * column in the failure message.
  */
class FixtureCanarySpec extends SparkTestBase {

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"no fixture drift at $sf") {
      val msgs = FixtureCanary.drift(spark, s"/root/testdata/$sf")
      assert(msgs.isEmpty, msgs.mkString("\n", "\n", ""))
    }
  }

  test("Tables.events normalizes ts to session TimestampType") {
    // Whatever the file ships, the engine-facing contract is a UTC
    // TimestampType column — every downstream window/asof/session op
    // depends on it.
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.filter(col("ts").isNotNull).limit(1).count() == 1)
  }

  test("canary fires on a synthetically retyped column") {
    val dir = java.nio.file.Files.createTempDirectory("canary").toString
    // events with ts as double — a type the harness has never shipped
    spark.range(3).selectExpr(
      "id AS event_id", "cast(id AS double) AS ts", "id AS user_id",
      "'click' AS event_type", "1.0 AS value", "'{}' AS props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val msgs = FixtureCanary.driftTable(spark, dir, "events")
    assert(msgs.exists(m => m.contains("FIXTURE DRIFT") && m.contains("`ts`")
      && m.contains("double")), msgs.mkString("; "))
  }

  test("canary fires on a lost column") {
    val dir = java.nio.file.Files.createTempDirectory("canary").toString
    spark.range(3).selectExpr("id AS doc_id", "'x' AS text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val msgs = FixtureCanary.driftTable(spark, dir, "documents")
    assert(msgs.exists(m => m.contains("lost column `lang`")),
      msgs.mkString("; "))
  }
}
