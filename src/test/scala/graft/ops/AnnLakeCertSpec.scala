package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.LogLake

/** The delta-scoped maintenance certificates (round 18, VERDICT r17 #1)
  * that replaced the O(corpus) rebuild-equality pins in q158/q161/q163:
  * an order-insensitive additive multiset fingerprint
  * (count, Σ xxhash64(row)) checks
  *   fp(maintained) = fp(untouched) + fp(delta)      (append, q158)
  *   fp(t0)         = fp(maintained) + fp(erased)    (delete, q161/q163)
  * This spec proves the certificate is NOT vacuous: the fingerprint is
  * order/column-order-insensitive and additive (so a correct maintenance
  * run passes), and an injected one-byte corruption of the maintained
  * table — a flipped cell id, a flipped residual element, a dropped or
  * duplicated row — trips it.
  */
class AnnLakeCertSpec extends SparkTestBase {

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft-certspec-$tag").toString + "/t"

  private def postingsLike(rows: Seq[(Long, Long, Int, Seq[Long])]) = {
    import spark.implicits._
    // the encoder's containsNull=false array would make merge-update
    // casts unresolvable after the parquet round-trip — real postings
    // carry the nullable element type
    rows.toDF("vec_id", "c_id", "arnk", "r")
      .withColumn("r", col("r").cast("array<bigint>"))
  }

  private val base = Seq(
    (1L, 3L, 1, Seq(1L, -2L, 3L)),
    (2L, 5L, 1, Seq(0L, 7L, -1L)),
    (4L, 3L, 1, Seq(2L, 2L, 2L)))
  private val delta = Seq(
    (7L, 5L, 1, Seq(-4L, 0L, 9L)),
    (9L, 1L, 1, Seq(5L, 5L, -5L)))

  test("fingerprint: row-order and column-order insensitive, additive over disjoint union") {
    val a = postingsLike(base)
    val aShuffled = postingsLike(base.reverse)
      .select("r", "arnk", "c_id", "vec_id") // different column order
    assert(AnnLake.fingerprint(a) == AnnLake.fingerprint(aShuffled))
    val b = postingsLike(delta)
    val union = postingsLike(base ++ delta)
    assert(AnnLake.fingerprint(union) ==
      AnnLake.fpPlus(AnnLake.fingerprint(a), AnnLake.fingerprint(b)))
  }

  test("append certificate passes on a correct maintenance run and trips on injected corruption") {
    val dir = fresh("append")
    LogLake.create(spark, dir, postingsLike(base))
    val fpBefore = AnnLake.fingerprint(LogLake.snapshot(spark, dir))
    val asgD = postingsLike(delta)
    LogLake.append(spark, dir, asgD)
    // the q158 certificate: maintained == untouched ⊎ delta
    val expected = AnnLake.fpPlus(fpBefore, AnnLake.fingerprint(asgD))
    assert(AnnLake.fingerprint(LogLake.snapshot(spark, dir)) == expected,
      "a correct append must satisfy the certificate")

    // corruption 1: flip one bit of one stored cell id (7 XOR 1 via an
    // out-of-band merge — the maintained table no longer equals the
    // rebuild, and the certificate must trip)
    import LogLake.MergeClause._
    import spark.implicits._
    LogLake.mergeClauses(spark, dir, Seq(9L).toDF("vec_id"), Seq("vec_id"),
      Seq(MatchedUpdate(None, Map("c_id" -> (col("target.c_id") + 1L)))))
    assert(AnnLake.fingerprint(LogLake.snapshot(spark, dir)) != expected,
      "a one-byte cell-id flip must trip the certificate")
    // undo; corruption 2: flip one residual ELEMENT (array payload)
    LogLake.mergeClauses(spark, dir, Seq(9L).toDF("vec_id"), Seq("vec_id"),
      Seq(MatchedUpdate(None, Map("c_id" -> (col("target.c_id") - 1L)))))
    assert(AnnLake.fingerprint(LogLake.snapshot(spark, dir)) == expected)
    LogLake.mergeClauses(spark, dir, Seq(7L).toDF("vec_id"), Seq("vec_id"),
      Seq(MatchedUpdate(None, Map("r" -> array(lit(-4L), lit(1L), lit(9L))))))
    assert(AnnLake.fingerprint(LogLake.snapshot(spark, dir)) != expected,
      "a flipped residual element must trip the certificate")
  }

  test("delete certificate passes on a correct erasure and trips on a dropped survivor") {
    val dir = fresh("delete")
    LogLake.create(spark, dir, postingsLike(base ++ delta))
    import spark.implicits._
    import LogLake.MergeClause._
    val deleted = Seq(2L, 9L).toDF("vec_id")
    val fpT0 = AnnLake.fingerprint(LogLake.snapshot(spark, dir))
    val fpErased = AnnLake.fingerprint(
      LogLake.snapshot(spark, dir).join(deleted, Seq("vec_id")))
    LogLake.mergeClauses(spark, dir, deleted, Seq("vec_id"),
      Seq(MatchedDelete(None)))
    // the q161/q163 certificate: t0 == maintained ⊎ erased
    val maintained = LogLake.snapshot(spark, dir)
    assert(fpT0 == AnnLake.fpPlus(AnnLake.fingerprint(maintained), fpErased),
      "a correct erasure must satisfy the certificate")
    assert(maintained.join(deleted, Seq("vec_id"), "left_semi").isEmpty)

    // corruption: erase one SURVIVOR out-of-band (a row the rebuild
    // keeps) — count and sum both shift, the certificate must trip
    LogLake.mergeClauses(spark, dir, Seq(4L).toDF("vec_id"), Seq("vec_id"),
      Seq(MatchedDelete(None)))
    assert(fpT0 != AnnLake.fpPlus(
      AnnLake.fingerprint(LogLake.snapshot(spark, dir)), fpErased),
      "a dropped survivor must trip the certificate")
  }
}
