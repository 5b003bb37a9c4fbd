package graft

import java.nio.file.Files

import graft.tools.DegenFixture

/** VERDICT r4 #5: drive the FULL registry over the adversarial corpus
  * ([[graft.tools.DegenFixture]]: empty/whitespace/sub-shingle docs, a
  * giant near-dup cluster, exact dups, a repeated-token doc, NULL group
  * keys, one-row groups, a zero-norm embedding, exact embedding ties).
  * Every query must be crash-free (the ANSI /0 and malformed-cast
  * aborts this fixture originally exposed in q43/q47/q70/q82/q103/q101
  * are now guarded, with each guard mirrored in its DuckDB oracle) and
  * deterministic run-to-run. The cross-engine half of the gate —
  * Verify + tools/check.py over the same fixture — is run per round
  * (104/104 at round 5); this spec keeps the crash/determinism half in
  * every `sbt test`.
  */
class DegenerateCorpusSpec extends SparkTestBase {

  private lazy val degenDir: String = {
    val d = Files.createTempDirectory("graft-degen").toString
    DegenFixture.build(spark, sfDir, d)
    d
  }

  test("every registry query is crash-free and run-to-run deterministic on the adversarial corpus") {
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.registry.foreach { q =>
      try {
        // order-independent fingerprint; toJSON renders binary/array
        // columns deterministically (base64/values), unlike Row.toString
        def fingerprint(): (Int, Int) = {
          val rows = q.fn(spark, degenDir).toJSON.collect()
          (rows.length, rows.sorted.mkString("\n").hashCode)
        }
        // one retry for Spark's ClosureCleaner failing to LOAD a class
        // resource ("capturingClassReader is null") — a transient JVM/
        // fd-pressure artifact of a 1000+-second suite run, seen once in
        // r11 on q136 and unreproducible solo. Any second failure, and
        // every failure in our own code, still fails the test.
        def attempt(): (Int, Int) =
          try fingerprint() catch {
            case e: NullPointerException if Option(e.getMessage)
              .exists(_.contains("capturingClassReader")) => fingerprint()
          }
        val a = attempt()
        val b = attempt()
        if (a != b)
          failures += s"${q.name}: nondeterministic ($a vs $b)"
      } catch {
        case e: Throwable =>
          failures += s"${q.name}: CRASH ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(160)}"
      } finally {
        spark.catalog.clearCache()
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries failed on the degenerate corpus:\n" +
        failures.mkString("\n"))
  }
}
