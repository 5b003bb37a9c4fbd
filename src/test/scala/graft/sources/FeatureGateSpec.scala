package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.LogLake.Manifest

/** The manifest PROTOCOL GATE (Delta's table-features contract): each
  * commit records the full set of format features its state depends on;
  * a reader that does not implement one must refuse loudly at resolve —
  * a column-mapping-ignorant reader would otherwise serve physical
  * names as data, a DV-ignorant one would resurrect deleted rows.
  * Lives in `graft.sources` to reach the package-private codec. */
class FeatureGateSpec extends graft.SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"featgate-$name").toString + "/t"

  private def kv(pairs: (Long, String)*): DataFrame =
    pairs.toSeq.toDF("k", "v")

  private def lastManifest(dir: String): Manifest = LogLake.history(dir).last

  test("plain tables record no features and keep reading unchanged") {
    val dir = tmp("plain")
    LogLake.create(spark, dir, kv(1L -> "a"))
    LogLake.append(spark, dir, kv(2L -> "b"))
    assert(LogLake.history(dir).forall(_.features.isEmpty))
    // the manifest bytes carry no features key at all — byte-compatible
    // with every pre-gate reader
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sessionState.newHadoopConf())
    val lp = new Path(dir, "_loglake")
    f.listStatus(lp).filter(_.getPath.getName.endsWith(".json")).foreach { s =>
      val bytes = WireLog.readSmallFile(f, s.getPath).get
      assert(!bytes.contains("\"features\""), s"unexpected features in $s")
    }
    assert(LogLake.snapshot(spark, dir).count() == 2L)
  }

  test("each gated capability stamps its feature at the next commit, monotonically") {
    // column mapping (two rows in one file so the MoR delete below is
    // partial — a fully-dead file drops whole and needs no DV feature)
    val m = tmp("mapped")
    LogLake.create(spark, m, kv(1L -> "a", 3L -> "c").coalesce(1))
    LogLake.renameColumn(spark, m, "v", "val")
    assert(lastManifest(m).features == Set("columnMapping"))
    // features are monotone: a later plain append keeps the set
    LogLake.append(spark, m, Seq((2L, "b")).toDF("k", "val"))
    assert(lastManifest(m).features == Set("columnMapping"))

    // deletion vectors — and the set unions across capabilities
    LogLake.delete(spark, m, col("k") === 1L, mor = true)
    assert(lastManifest(m).features == Set("columnMapping", "deletionVectors"))
    // OPTIMIZE purges the DVs but the protocol never downgrades
    LogLake.optimize(spark, m, 1)
    assert(lastManifest(m).features == Set("columnMapping", "deletionVectors"))

    // partition columns
    val p = tmp("part")
    LogLake.create(spark, p, Seq((1L, "x"), (2L, "y")).toDF("k", "part"),
      partitionBy = Seq("part"))
    assert(lastManifest(p).features == Set("partitionColumns"))

    // generated + identity columns stamp at the next data commit
    val g = tmp("gen")
    LogLake.create(spark, g, Seq((1L, 2L, 0L)).toDF("a", "b", "id"))
    LogLake.setGeneratedColumn(spark, g, "b", "a * 2")
    LogLake.setIdentityColumn(g, "id")
    LogLake.append(spark, g, Seq((3L, 6L)).toDF("a", "b"))
    assert(lastManifest(g).features == Set("generatedColumns", "identityColumns"))
  }

  test("a reader without a required feature refuses loudly, never misreads") {
    val dir = tmp("future")
    LogLake.create(spark, dir, kv(1L -> "a"))
    val v = LogLake.currentVersion(dir)
    // a future build commits a manifest gated on a feature this build
    // does not implement (simulated by hand-publishing version v+1)
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sessionState.newHadoopConf())
    val future = Manifest(v + 1, "append", "", v,
      LogLake.activeState(dir)._2.json, Nil, Nil,
      ts = System.currentTimeMillis(),
      features = Set("rowTrackingV9", "vectorIndexes"))
    WireLog.writeSmallFile(f,
      new Path(dir, f"_loglake/${v + 1}%020d.json"),
      LogLake.renderManifest(future))
    val e = intercept[UnsupportedOperationException] {
      LogLake.activeState(dir)
    }
    assert(e.getMessage.contains("rowTrackingV9") &&
      e.getMessage.contains("vectorIndexes") &&
      e.getMessage.contains("does not support"))
    // reads pinned BEFORE the upgrade commit still serve: the feature
    // set is resolved per target version
    assert(LogLake.snapshot(spark, dir, Some(v)).count() == 1L)
  }

  test("checkpoints carry the feature set — O(tail) replay keeps the gate") {
    val dir = tmp("chk")
    LogLake.create(spark, dir, kv(1L -> "a"))
    LogLake.renameColumn(spark, dir, "v", "val")
    // cross a checkpoint boundary (interval 10)
    (0 until 12).foreach(i =>
      LogLake.append(spark, dir, Seq((10L + i, s"r$i")).toDF("k", "val")))
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sessionState.newHadoopConf())
    val chk = f.listStatus(new Path(dir, "_loglake")).toSeq
      .filter(_.getPath.getName.startsWith("chk-"))
    assert(chk.nonEmpty, "expected a checkpoint past version 10")
    chk.foreach { s =>
      val in = f.open(s.getPath)
      val parsed = try LogLake.parseCheckpointStream(in) finally in.close()
      assert(parsed.features == Set("columnMapping"),
        s"checkpoint ${s.getPath.getName} lost the feature set")
    }
    assert(LogLake.snapshot(spark, dir).count() == 13L)
  }

  test("branches stamp a WRITER feature: reads stay open, foreign writes/maintenance refuse") {
    val dir = tmp("writer")
    LogLake.create(spark, dir, kv(1L -> "a", 2L -> "b"))
    LogLake.createBranch(spark, dir, "wip")
    // the audit commit carries the writer feature, reader set untouched
    val m = lastManifest(dir)
    assert(m.op == "branch" && m.writerFeatures == Set("branches") &&
      m.features.isEmpty)
    // and it inherits monotonically through later commits
    LogLake.append(spark, dir, kv(3L -> "c"))
    assert(lastManifest(dir).writerFeatures == Set("branches"))
    // a FUTURE writer feature this build lacks: hand-publish a commit
    val v = LogLake.currentVersion(dir)
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sessionState.newHadoopConf())
    val future = Manifest(v + 1, "append", "", v,
      LogLake.activeState(dir)._2.json, Nil, Nil,
      ts = System.currentTimeMillis(),
      writerFeatures = Set("branchesV9"))
    WireLog.writeSmallFile(f,
      new Path(dir, f"_loglake/${v + 1}%020d.json"),
      LogLake.renderManifest(future))
    LogLake.clearSnapshotCache()
    // READS keep working — that is the whole point of the split
    assert(LogLake.snapshot(spark, dir).count() == 3L)
    // writes refuse loudly
    val ew = intercept[UnsupportedOperationException] {
      LogLake.append(spark, dir, kv(9L -> "z"))
    }
    assert(ew.getMessage.contains("branchesV9") &&
      ew.getMessage.contains("writer feature"))
    // maintenance refuses loudly too (vacuum would sweep pinned state)
    intercept[UnsupportedOperationException] { LogLake.vacuum(dir) }
    intercept[UnsupportedOperationException] { LogLake.cleanupMetadata(dir) }
  }

  test("writer features round-trip the checkpoint codec") {
    val dir = tmp("wchk")
    LogLake.create(spark, dir, kv(1L -> "a"))
    LogLake.createBranch(spark, dir, "pin")
    (0 until 12).foreach(i =>
      LogLake.append(spark, dir, kv((10L + i) -> s"r$i")))
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sessionState.newHadoopConf())
    val chk = f.listStatus(new Path(dir, "_loglake")).toSeq
      .filter(_.getPath.getName.startsWith("chk-"))
    assert(chk.nonEmpty)
    chk.foreach { s =>
      val in = f.open(s.getPath)
      val parsed = try LogLake.parseCheckpointStream(in) finally in.close()
      assert(parsed.writerFeatures == Set("branches"),
        s"checkpoint ${s.getPath.getName} lost the writer feature set")
    }
  }
}
