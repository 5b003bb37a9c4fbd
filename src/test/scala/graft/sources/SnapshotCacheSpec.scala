package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The snapshot cache ([[graft.sources.LogLake]] `resolve`): a version's
  * state is assembled once per process, then served from the LRU on
  * every later resolve — validation (fresh listing, existence errors)
  * still runs every time, and a drop-and-recreate at the same path is
  * caught by the manifest-identity component of the key. */
class SnapshotCacheSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"snapcache-$name").toString + "/t"

  private def assembles: Long = LogLake.snapshotAssembles.get()

  test("a repeated resolve of the same version hits the cache; a commit misses once") {
    val dir = tmp("hit")
    LogLake.create(spark, dir, spark.range(100).select(col("id").as("k")))
    LogLake.activeState(dir) // warm
    val before = assembles
    (1 to 5).foreach { _ =>
      val (files, schema) = LogLake.activeState(dir)
      assert(files.nonEmpty && schema.fieldNames.sameElements(Array("k")))
    }
    assert(assembles == before, "repeated same-version resolves must not reassemble")
    // a new commit is a new version — exactly one more assembly
    LogLake.append(spark, dir, spark.range(10).select(col("id").as("k")))
    assert(spark.read.format("loglake").load(dir).count() == 110L)
    assert(assembles > before)
    // pinned time travel to the OLD version also serves from cache
    val mid = assembles
    val (v1files, _) = LogLake.activeState(dir, Some(1L))
    assert(v1files.map(_.rows).sum == 100L)
    assert(assembles == mid, "a previously-assembled pinned version must hit")
  }

  test("vacuum above the threshold deletes through a Spark job, same result") {
    val dir = tmp("distvac")
    LogLake.create(spark, dir,
      spark.range(40).repartition(8).select(col("id").as("k")))
    LogLake.overwrite(spark, dir,
      spark.range(5).select(col("id").as("k"))) // retires 8 files
    val prev = LogLake.vacuumDistributedThreshold
    LogLake.vacuumDistributedThreshold = 2
    try {
      val dry = LogLake.vacuum(dir, olderThanMs = -1000L, dryRun = true,
        spark = spark)
      assert(dry.size >= 8)
      val swept = LogLake.vacuum(dir, olderThanMs = -1000L, spark = spark)
      assert(swept.toSet == dry.toSet)
      // the files are really gone and the table still reads
      val dd = new java.io.File(dir, "data")
      assert(!swept.exists(s => new java.io.File(dir, s).exists()),
        "distributed vacuum left orphans behind")
      assert(spark.read.format("loglake").load(dir).count() == 5L)
      assert(dd.listFiles().count(_.getName.endsWith(".parquet")) >= 1)
    } finally LogLake.vacuumDistributedThreshold = prev
  }

  test("drop-and-recreate at the same path is never served stale state") {
    val dir = tmp("recreate")
    LogLake.create(spark, dir, spark.range(7).select(col("id").as("k")))
    assert(spark.read.format("loglake").load(dir).count() == 7L)
    // wipe the table and re-create version 1 with DIFFERENT content
    def wipe(f: java.io.File): Unit = {
      val kids = f.listFiles(); if (kids != null) kids.foreach(wipe); f.delete()
    }
    wipe(new java.io.File(dir))
    Thread.sleep(5) // ensure a distinguishable manifest mtime
    LogLake.create(spark, dir,
      spark.range(23).select(col("id").as("k"), lit("x").as("v")))
    val t = spark.read.format("loglake").load(dir)
    assert(t.count() == 23L)
    assert(t.schema.fieldNames.sameElements(Array("k", "v")),
      "recreated table must serve the NEW schema, not the cached one")
  }
}
