package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.LogLake

/** VACUUM AS A DATAFLOW (round 15): [[LogLake.vacuumJob]] reclaims the
  * same set [[LogLake.vacuum]] would — keep-set (current ∪ tagged ∪
  * branch-base, DV sidecars included), directory listing, and victim
  * anti-join all run as jobs, the snapshot-assemble counter stays
  * flat, and pinned point-in-time reads survive exactly like the
  * driver path's. */
class DistributedVacuumSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"llvac-$name").toString + "/t"

  /** 12 appends (chk at v10) → delete rewrite (PRE-tag orphans) → tag
    * → update rewrite (tag-pinned generation) → MoR delete (live DV
    * sidecar) → branch at head. */
  private def build(): String = {
    val dir = tmp("t")
    LogLake.createEmpty(dir, Seq((1L, "x")).toDF("k", "v").schema)
    LogLake.setTableProperties(dir, Map(
      "loglake.checkpoint.format" -> "parquet",
      "loglake.checkpoint.partSizeFiles" -> "4",
      "loglake.planning.distributed" -> "true"))
    (0 until 12).foreach(i =>
      LogLake.append(spark, dir,
        Seq((i * 100L, s"a$i"), (i * 100L + 50L, s"b$i")).toDF("k", "v")
          .repartition(1)))
    LogLake.delete(spark, dir, col("k") < 300L)              // v13: orphans
    LogLake.setTag(dir, "pin")                               // pins v13
    LogLake.update(spark, dir, col("k") === 750L,
      Map("v" -> lit("u2")))                                 // v14: pinned gen
    LogLake.delete(spark, dir, col("k") === 1150L, mor = true) // v15: DV
    LogLake.createBranch(spark, dir, "wip")                  // base = v15
    dir
  }

  private def listAll(dir: String): Set[String] = {
    def ls(sub: String): Seq[String] = {
      val d = new java.io.File(dir, sub)
      if (!d.isDirectory) Nil
      // local-FS .crc sidecars ride their data file through both
      // vacuum paths (ChecksumFileSystem) and are never named victims
      else d.listFiles().filter(f => f.isFile && !f.getName.startsWith("."))
        .map(f => if (sub.isEmpty) f.getName else s"$sub/${f.getName}").toSeq
    }
    (ls("data") ++ ls("dv") ++ ls("_loglake/cdc") ++
      ls("").filter(n => n.endsWith(".parquet") && !n.startsWith("_") &&
        !n.startsWith("."))).toSet
  }

  test("vacuumJob sweeps the driver path's exact set, counter flat") {
    val dir = build()
    val expected = LogLake.vacuum(dir, olderThanMs = 0L, dryRun = true).toSet
    assert(expected.nonEmpty, "fixture must produce reclaimable orphans")
    val before = listAll(dir)
    LogLake.clearSnapshotCache()
    val assembles = LogLake.snapshotAssembles.get()
    val n = LogLake.vacuumJob(spark, dir, olderThanMs = 0L)
    assert(LogLake.snapshotAssembles.get() == assembles,
      "distributed vacuum must not assemble table state on the driver")
    assert(n == expected.size,
      s"vacuumJob counted $n victims, driver dry-run named ${expected.size}")
    val swept = before -- listAll(dir)
    assert(swept == expected,
      s"swept set diverged: extra=${swept -- expected} " +
        s"missing=${expected -- swept}")
    // the table, the tagged version, and the branch still read
    LogLake.clearSnapshotCache()
    assert(LogLake.snapshot(spark, dir).count() == 17L)
    val tagged = LogLake.snapshot(spark, dir,
      Some(LogLake.tags(dir)("pin"))).count()
    assert(tagged == 18L, s"tagged (pre-update, post-delete) read got $tagged")
    assert(spark.read.format("loglake").option("branch", "wip")
      .load(dir).count() == 17L)
  }

  test("vacuumJob dry run deletes nothing and counts the same set") {
    val dir = build()
    val expected = LogLake.vacuum(dir, olderThanMs = 0L, dryRun = true).size
    val before = listAll(dir)
    assert(LogLake.vacuumJob(spark, dir, olderThanMs = 0L, dryRun = true)
      == expected)
    assert(listAll(dir) == before, "dry run must not delete")
  }

  test("vacuumJob honors the age horizon like the driver path") {
    val dir = build()
    // everything is younger than an hour: nothing is eligible
    assert(LogLake.vacuumJob(spark, dir, olderThanMs = 3600L * 1000) == 0L)
    assert(LogLake.vacuum(dir, olderThanMs = 3600L * 1000, dryRun = true)
      .isEmpty)
  }

  test("a version with no eligible lazy plan falls back, set unchanged") {
    // no checkpoint (4 commits only) → keepRows' driver fallback; the
    // swept set must still match
    val dir = tmp("nochk")
    LogLake.createEmpty(dir, Seq((1L, "x")).toDF("k", "v").schema)
    LogLake.setTableProperties(dir,
      Map("loglake.planning.distributed" -> "true"))
    (0 until 3).foreach(i =>
      LogLake.append(spark, dir, Seq((i.toLong, s"v$i")).toDF("k", "v")
        .repartition(1)))
    LogLake.delete(spark, dir, col("k") === 1L) // rewrite → orphan
    val expected = LogLake.vacuum(dir, olderThanMs = 0L, dryRun = true).toSet
    val before = listAll(dir)
    val n = LogLake.vacuumJob(spark, dir, olderThanMs = 0L)
    assert(n == expected.size && (before -- listAll(dir)) == expected)
    LogLake.clearSnapshotCache()
    assert(LogLake.snapshot(spark, dir).count() == 2L)
  }
}
