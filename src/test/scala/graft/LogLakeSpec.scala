package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.LogLake

/** The native ACID table layer (`loglake`): atomic commit log over
  * parquet — versioned manifests, CAS publication, snapshot isolation,
  * time travel, MERGE upsert, stats-based file skipping, vacuum. The
  * concurrency tests construct the exact directory/log states the races
  * produce (two writers cannot be interleaved deterministically in a
  * test), mirroring WireLogSpec's approach.
  */
class LogLakeSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"loglake-$name").toString + "/t"

  private def kv(pairs: (Long, String)*): DataFrame =
    pairs.toSeq.toDF("k", "v")

  private def sortedRows(df: DataFrame): Seq[(Long, String)] =
    df.select("k", "v").as[(Long, String)].collect().toSeq.sorted

  test("create + snapshot round-trips; append adds a version; time travel reads the old one") {
    val dir = tmp("basic")
    assert(LogLake.create(spark, dir, kv(1L -> "a", 2L -> "b")) == 1L)
    assert(LogLake.append(spark, dir, kv(3L -> "c")) == 2L)
    assert(LogLake.currentVersion(dir) == 2L)
    assert(sortedRows(LogLake.snapshot(spark, dir)) ==
      Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(sortedRows(LogLake.snapshot(spark, dir, asOf = Some(1L))) ==
      Seq(1L -> "a", 2L -> "b"))
    val e = intercept[IllegalArgumentException] {
      LogLake.snapshot(spark, dir, asOf = Some(9L))
    }
    assert(e.getMessage.contains("does not exist"))
  }

  test("create on an existing table fails loudly") {
    val dir = tmp("recreate")
    LogLake.create(spark, dir, kv(1L -> "a"))
    val e = intercept[IllegalArgumentException] {
      LogLake.create(spark, dir, kv(2L -> "b"))
    }
    assert(e.getMessage.contains("already exists"))
  }

  test("replayed commit (same txnId) is a no-op and leaves no orphan that survives vacuum") {
    val dir = tmp("replay")
    LogLake.create(spark, dir, kv(1L -> "a"))
    val v = LogLake.append(spark, dir, kv(2L -> "b"), txnId = "job-7:epoch-0")
    // the retried job replays the SAME logical commit with different bytes
    val v2 = LogLake.append(spark, dir, kv(2L -> "b"), txnId = "job-7:epoch-0")
    assert(v == v2, "a replayed txn must return the original version")
    assert(LogLake.currentVersion(dir) == v)
    assert(sortedRows(LogLake.snapshot(spark, dir)) == Seq(1L -> "a", 2L -> "b"),
      "replay must not duplicate rows")
    // nothing unreferenced should remain once vacuumed
    LogLake.vacuum(dir, olderThanMs = 0L)
    assert(sortedRows(LogLake.snapshot(spark, dir)) == Seq(1L -> "a", 2L -> "b"))
  }

  test("concurrent appends both land (retry at the next version)") {
    val dir = tmp("c-append")
    LogLake.create(spark, dir, kv(1L -> "a"))
    // two writers race: simulate B committing version 2 between A's read
    // of the current version and A's publish — A's CAS at 2 loses and A
    // must retry at 3, landing BOTH appends
    val a = new Thread { // appends genuinely race via parallel threads
      var v = 0L
      override def run(): Unit = v = LogLake.append(spark, dir, kv(2L -> "b"))
    }
    val b = new Thread {
      var v = 0L
      override def run(): Unit = v = LogLake.append(spark, dir, kv(3L -> "c"))
    }
    a.start(); b.start(); a.join(60000); b.join(60000)
    assert(Set(a.v, b.v) == Set(2L, 3L), s"both appends must land, got ${(a.v, b.v)}")
    assert(sortedRows(LogLake.snapshot(spark, dir)) ==
      Seq(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("concurrent commit under a merge fails loudly (snapshot conflict), table intact") {
    val dir = tmp("c-merge")
    LogLake.create(spark, dir, kv(1L -> "a", 2L -> "b"))
    // a foreign append lands AFTER the merge read its snapshot: simulate
    // by publishing version 2 out from under a merge built against v1 —
    // construct the conflict by appending first, then attempting a merge
    // whose readVersion we pin via the private flow: easiest equivalent
    // is two real threads where one append wins the race window.
    // Deterministic variant: capture state, append, then merge must still
    // succeed (it reads v2); so instead drive the conflict through the
    // public API by racing a slow merge against a fast append.
    val mergeErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val m = new Thread {
      override def run(): Unit =
        try {
          // a merge whose source evaluation is slow enough for the append
          // to land mid-flight on most schedules; if the append happens to
          // finish first, the merge legitimately succeeds — both outcomes
          // are asserted consistent below (serializable either way)
          LogLake.merge(spark, dir,
            kv(2L -> "B2").withColumn("v", concat(col("v"), lit(""))),
            keyCols = Seq("k"))
        } catch { case t: Throwable => mergeErr.set(t) }
    }
    val app = new Thread {
      override def run(): Unit = LogLake.append(spark, dir, kv(9L -> "z"))
    }
    m.start(); app.start(); m.join(120000); app.join(120000)
    val rows = sortedRows(LogLake.snapshot(spark, dir)).toMap
    if (mergeErr.get() != null) {
      // merge lost: it must have failed LOUDLY with a conflict, and its
      // update must be absent in full (no partial write)
      assert(mergeErr.get().getMessage.contains("concurrent commit"),
        s"unexpected merge failure: ${mergeErr.get().getMessage}")
      assert(rows == Map(1L -> "a", 2L -> "b", 9L -> "z"))
    } else {
      // merge won the race (or append landed after): both effects present
      assert(rows == Map(1L -> "a", 2L -> "B2", 9L -> "z"))
    }
  }

  test("snapshot isolation: an open snapshot keeps reading its version across a merge") {
    val dir = tmp("iso")
    LogLake.create(spark, dir, kv(1L -> "a", 2L -> "b"))
    val snap = LogLake.snapshot(spark, dir) // resolves v1's files NOW
    LogLake.merge(spark, dir, kv(1L -> "A!"), keyCols = Seq("k")) // rewrites v1's file
    assert(sortedRows(LogLake.snapshot(spark, dir)) == Seq(1L -> "A!", 2L -> "b"))
    assert(sortedRows(snap) == Seq(1L -> "a", 2L -> "b"),
      "the pre-merge snapshot must still read version 1's data")
  }

  test("merge = upsert: updates matched keys, inserts new ones, rewrites only touched files") {
    val dir = tmp("merge")
    // two files: keys 1-2 and 3-4 (repartitionByRange on k gives stable file split)
    LogLake.create(spark, dir,
      kv(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d").repartitionByRange(2, col("k")),
      statsCols = Seq("k"))
    val before = LogLake.activeState(dir)._1.map(_.path).toSet
    assert(before.size == 2, s"fixture: expected 2 data files, got ${before.size}")
    LogLake.merge(spark, dir, kv(1L -> "A!", 9L -> "i"), keyCols = Seq("k"),
      statsCols = Seq("k"))
    assert(sortedRows(LogLake.snapshot(spark, dir)) ==
      Seq(1L -> "A!", 2L -> "b", 3L -> "c", 4L -> "d", 9L -> "i"))
    val m = LogLake.history(dir).last
    assert(m.op == "merge")
    assert(m.removes.size == 1, "only the file containing key 1 may be rewritten")
    val after = LogLake.activeState(dir)._1.map(_.path).toSet
    assert(after.intersect(before).size == 1, "the untouched file must carry over")
  }

  test("stats-based file skipping prunes a range scan to the intersecting files") {
    val dir = tmp("skip")
    // 4 range-partitioned files over k = 0..99 → min/max stats per file
    val df = spark.range(0, 100).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v"))
    LogLake.create(spark, dir, df.repartitionByRange(4, col("k")), statsCols = Seq("k"))
    val (kept, total) = LogLake.pruneFiles(dir, "k", 10L, 30L)
    assert(total == 4)
    assert(kept.size < total, s"a 10..30 scan over 4 range files must prune, kept ${kept.size}")
    val got = LogLake.scanRange(spark, dir, "k", 10L, 30L)
      .select("k").as[Long].collect().sorted
    assert(got.toSeq == (10L to 30L), "skipping must not change results")
    // unbounded side + no-stats column stay correct
    assert(LogLake.scanRange(spark, dir, "k", null, 5L).count() == 6)
    assert(LogLake.pruneFiles(dir, "v", "a", "z")._1.size == 4,
      "a column without stats cannot prune")
  }

  test("overwrite replaces content; vacuum reclaims the old generation; old version then fails loudly") {
    val dir = tmp("vac")
    LogLake.create(spark, dir, kv(1L -> "a", 2L -> "b"))
    LogLake.overwrite(spark, dir, kv(7L -> "x"))
    assert(sortedRows(LogLake.snapshot(spark, dir)) == Seq(7L -> "x"))
    // time travel still works before vacuum…
    assert(sortedRows(LogLake.snapshot(spark, dir, asOf = Some(1L))) ==
      Seq(1L -> "a", 2L -> "b"))
    // dry run lists the reclaim set without touching a byte
    val wouldDelete = LogLake.vacuum(dir, olderThanMs = 0L, dryRun = true)
    assert(wouldDelete.nonEmpty)
    assert(sortedRows(LogLake.snapshot(spark, dir, asOf = Some(1L))) ==
      Seq(1L -> "a", 2L -> "b"), "dry run must not delete anything")
    val deleted = LogLake.vacuum(dir, olderThanMs = 0L)
    assert(deleted.sorted == wouldDelete.sorted,
      "the real vacuum must reclaim exactly the dry-run list")
    assert(sortedRows(LogLake.snapshot(spark, dir)) == Seq(7L -> "x"),
      "the current snapshot must survive vacuum")
    // …and fails loudly (files gone), not silently-empty, after
    val e = intercept[Exception] {
      LogLake.snapshot(spark, dir, asOf = Some(1L)).collect()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .take(8).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msgs.toLowerCase.contains("not exist") || msgs.toLowerCase.contains("no such"),
      s"expected missing-file failure, got: $msgs")
  }

  test("vacuum vs already-resolved readers: the current snapshot keeps reading; a pinned old snapshot fails loudly mid-scan") {
    val dir = tmp("vac-grace")
    LogLake.create(spark, dir, kv(1L -> "a", 2L -> "b"))
    LogLake.overwrite(spark, dir, kv(7L -> "x"))
    // both readers resolve their file lists BEFORE the vacuum — the
    // frames pin exactly those paths (snapshot isolation)
    val cur = LogLake.snapshot(spark, dir)
    val old = LogLake.snapshot(spark, dir, asOf = Some(1L))
    assert(sortedRows(old) == Seq(1L -> "a", 2L -> "b"))
    LogLake.vacuum(dir, olderThanMs = 0L)
    // the active set is never swept: a current-version reader is
    // untouched by a concurrent vacuum — the grace contract
    assert(sortedRows(cur) == Seq(7L -> "x"))
    // the old generation is physically gone: the pinned reader fails
    // LOUDLY mid-scan (missing file), never silently partial/empty —
    // the retention horizon is the grace window, size it above the
    // longest-running query
    val e = intercept[Exception] { old.collect() }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .take(8).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msgs.toLowerCase.contains("not exist") ||
      msgs.toLowerCase.contains("no such"),
      s"expected a loud missing-file failure, got: $msgs")
  }

  test("vacuum's age horizon protects files staged by an in-flight commit") {
    val dir = tmp("vac-horizon")
    LogLake.create(spark, dir, kv(1L -> "a"))
    LogLake.overwrite(spark, dir, kv(2L -> "b"))
    // freshly-unreferenced generation + default horizon → kept
    assert(LogLake.vacuum(dir).isEmpty,
      "files younger than the horizon must not be reclaimed")
    assert(LogLake.vacuum(dir, olderThanMs = 0L).nonEmpty)
  }

  test("checkpoints keep replay O(tail): state, schema, and OLD txn replays resolve through them") {
    val dir = tmp("chk")
    LogLake.create(spark, dir, kv(1L -> "a"))
    LogLake.append(spark, dir, kv(2L -> "b"), txnId = "early-txn") // version 2
    for (i <- 3L to 13L) LogLake.append(spark, dir, kv(i -> s"v$i"))
    // versions 10 is past CheckpointInterval → a checkpoint must exist
    val f = graft.sources.WireLog.fs(dir)
    assert(f.exists(new org.apache.hadoop.fs.Path(dir,
      s"${LogLake.LogDir}/chk-${"%020d".format(10)}.json")),
      "a checkpoint must be written at version 10")
    // checkpointed resolution equals a full-history replay
    val viaChk = LogLake.activeState(dir)._1.map(_.path).toSet
    val full = {
      val active = scala.collection.mutable.LinkedHashMap[String, String]()
      LogLake.history(dir).foreach { m =>
        m.removes.foreach(active.remove)
        m.adds.foreach(a => active(a.path) = a.path)
      }
      active.keySet.toSet
    }
    assert(viaChk == full, "checkpointed state must equal full log replay")
    // a txn committed BELOW the checkpoint is still recognized as a replay
    val v = LogLake.append(spark, dir, kv(99L -> "dup"), txnId = "early-txn")
    assert(v == 2L, "an old txn must resolve through the checkpoint's txn map")
    assert(LogLake.currentVersion(dir) == 13L)
    // time travel below the checkpoint still works (manifests are kept)
    assert(sortedRows(LogLake.snapshot(spark, dir, asOf = Some(2L))) ==
      Seq(1L -> "a", 2L -> "b"))
  }

  test("optimize zorder compacts files, keeps content identical, and improves pruning") {
    val dir = tmp("opt")
    import spark.implicits._
    // two correlated-ish dims over 0..99 × 0..99, written UNCLUSTERED
    // (hash-partitioned) so every file spans the full range of both
    val df = spark.range(0, 10000).select(
      (col("id") % 100).as("x"), (col("id") / 100).cast("long").as("y"),
      concat(lit("r"), col("id")).as("v"))
    LogLake.create(spark, dir, df.repartition(8), statsCols = Seq("x", "y"))
    val (beforeKept, beforeTotal) = LogLake.pruneFiles(dir, "x", 10L, 19L)
    assert(beforeTotal == 8 && beforeKept.size == 8,
      "fixture: hash layout must be unprunable on x")
    val fpBefore = LogLake.snapshot(spark, dir).toJSON.collect().sorted.mkString("\n").hashCode

    LogLake.optimize(spark, dir, numFiles = 4, zorderCols = Seq("x", "y"),
      statsCols = Seq("x", "y"))

    val (files, _) = LogLake.activeState(dir)
    assert(files.size == 4, s"optimize must compact to 4 files, got ${files.size}")
    val fpAfter = LogLake.snapshot(spark, dir).toJSON.collect().sorted.mkString("\n").hashCode
    assert(fpAfter == fpBefore, "optimize must not change the table's content")
    val (afterKeptX, _) = LogLake.pruneFiles(dir, "x", 10L, 19L)
    val (afterKeptY, _) = LogLake.pruneFiles(dir, "y", 10L, 19L)
    assert(afterKeptX.size < 4 || afterKeptY.size < 4,
      s"z-order layout must prune at least one dimension's range scan " +
        s"(kept x=${afterKeptX.size}, y=${afterKeptY.size} of 4)")
    // and the pruned scans stay correct
    assert(LogLake.scanRange(spark, dir, "x", 10L, 19L).count() == 1000)
    assert(LogLake.scanRange(spark, dir, "y", 10L, 19L).count() == 1000)
    // replayed optimize is a no-op through txnId
    val vOpt = LogLake.currentVersion(dir)
    assert(LogLake.optimize(spark, dir, 4, Seq("x", "y"), Seq("x", "y"),
      txnId = "opt-1") == vOpt + 1)
    assert(LogLake.optimize(spark, dir, 4, Seq("x", "y"), Seq("x", "y"),
      txnId = "opt-1") == vOpt + 1)
  }

  test("incremental optimize compacts only small files; large files stay byte-identical") {
    val dir = tmp("iopt")
    // one big create + a drizzle of small appends — the steady-state
    // shape of a streamed-into table
    val big = spark.range(0, 50000).select(col("id").as("k"),
      concat(lit("r"), col("id")).as("v"))
    LogLake.create(spark, dir, big.coalesce(1), statsCols = Seq("k"))
    (0 until 4).foreach { i =>
      LogLake.append(spark, dir, spark.range(50000 + i * 10, 50010 + i * 10)
        .select(col("id").as("k"), concat(lit("r"), col("id")).as("v")))
    }
    val before = LogLake.activeState(dir)._1
    assert(before.size >= 5, s"fixture: want a big file + small drizzle, got $before")
    val bigFile = before.maxBy(_.bytes)

    // threshold above the drizzle, below the big file
    LogLake.optimize(spark, dir, numFiles = 1,
      statsCols = Seq("k"), onlySmallerThan = bigFile.bytes)
    val after = LogLake.activeState(dir)._1
    assert(after.size == 2,
      s"${before.size - 1} small files → 1, big untouched: got ${after.size}")
    assert(after.exists(a => a.path == bigFile.path && a.bytes == bigFile.bytes),
      "the already-compact file must not rewrite")
    assert(LogLake.snapshot(spark, dir).count() == 50040L)

    // nothing left below the threshold → no-op, version unchanged
    val v = LogLake.currentVersion(dir)
    assert(LogLake.optimize(spark, dir, 1, statsCols = Seq("k"),
      onlySmallerThan = 1024L) == v)

    // a DV'd file counts as maintenance work regardless of size: its
    // pending deletes materialize and the vector purges
    LogLake.delete(spark, dir, col("k") === 7L, mor = true)
    LogLake.optimize(spark, dir, numFiles = 1, statsCols = Seq("k"),
      onlySmallerThan = 1024L)
    val finalState = LogLake.activeState(dir)._1
    assert(finalState.forall(_.dv.isEmpty), "incremental optimize purges DVs")
    assert(LogLake.snapshot(spark, dir).count() == 50039L)
  }

  test("timestampAsOf resolves versions by commit-file mtime, the Delta rule") {
    val dir = tmp("tt")
    import spark.implicits._
    LogLake.create(spark, dir, Seq(1L -> "a").toDF("k", "v"))              // v1
    val t1 = System.currentTimeMillis()
    Thread.sleep(1200)
    LogLake.append(spark, dir, Seq(2L -> "b").toDF("k", "v"))              // v2
    Thread.sleep(1200)
    LogLake.append(spark, dir, Seq(3L -> "c").toDF("k", "v"))              // v3

    assert(LogLake.versionAtTimestamp(dir, t1) == 1L)
    assert(LogLake.versionAtTimestamp(dir, System.currentTimeMillis()) == 3L)
    // provider option, millis form: state as of t1 is just v1
    val rows = spark.read.format("loglake")
      .option("timestampAsOf", t1.toString).load(dir)
      .select("k").as[Long].collect().toSeq.sorted
    assert(rows == Seq(1L))
    // predating the table is loud
    val e = intercept[Exception] {
      spark.read.format("loglake").option("timestampAsOf", "100").load(dir).count()
    }
    assert(e.getMessage.contains("predates"), s"got: ${e.getMessage}")
    // exclusive with versionAsOf
    intercept[IllegalArgumentException] {
      spark.read.format("loglake").option("timestampAsOf", t1.toString)
        .option("versionAsOf", "1").load(dir).count()
    }
  }

  test("CHECK constraints: add validates existing data, writes enforce, NULL passes, drop lifts, clone inherits") {
    val dir = tmp("ck")
    import spark.implicits._
    LogLake.create(spark, dir,
      Seq((1L, Some(10.0)), (2L, Some(20.0))).toDF("k", "reading"))

    // add-time validation: the current table must satisfy the rule
    intercept[IllegalArgumentException] {
      LogLake.addCheckConstraint(spark, dir, "reading_high", "reading > 15")
    }
    LogLake.addCheckConstraint(spark, dir, "reading_pos", "reading >= 0")
    assert(LogLake.checkConstraints(dir) == Map("reading_pos" -> "reading >= 0"))

    // a violating append fails loudly, names the constraint, commits NOTHING
    val vBefore = LogLake.currentVersion(dir)
    val e = intercept[IllegalArgumentException] {
      LogLake.append(spark, dir, Seq((3L, Some(-5.0))).toDF("k", "reading"))
    }
    assert(e.getMessage.contains("reading_pos"), s"got: ${e.getMessage}")
    assert(LogLake.currentVersion(dir) == vBefore, "violation must not commit")
    assert(LogLake.snapshot(spark, dir).count() == 2L)

    // NULL is SQL-unknown: it PASSES a CHECK, like every SQL engine
    LogLake.append(spark, dir,
      Seq((4L, None: Option[Double])).toDF("k", "reading"))
    assert(LogLake.snapshot(spark, dir).count() == 3L)

    // the streaming sink path enforces too (it rides append/writeData)
    val in = java.nio.file.Files.createTempDirectory("ck-in").toString
    Seq((9L, Some(-1.0))).toDF("k", "reading")
      .coalesce(1).write.mode("overwrite").parquet(in)
    val q = spark.readStream.schema(LogLake.activeState(dir)._2).parquet(in)
      .writeStream.format("loglake").option("path", dir)
      .option("checkpointLocation", tmp("ck-chk"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    val se = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(120000)
    }
    assert(se.getCause.getMessage.contains("reading_pos"))
    assert(LogLake.snapshot(spark, dir).count() == 3L)

    // drop lifts the rule; a clone made while constrained inherits it
    val cl = tmp("ck-clone")
    LogLake.cloneShallow(spark, dir, cl)
    assert(LogLake.checkConstraints(cl) == Map("reading_pos" -> "reading >= 0"))
    intercept[IllegalArgumentException] {
      LogLake.append(spark, cl, Seq((5L, Some(-1.0))).toDF("k", "reading"))
    }
    LogLake.dropCheckConstraint(dir, "reading_pos")
    LogLake.append(spark, dir, Seq((5L, Some(-1.0))).toDF("k", "reading"))
    assert(LogLake.snapshot(spark, dir).count() == 4L)
    // the clone's rule survives the source's drop (independent tables)
    assert(LogLake.checkConstraints(cl).nonEmpty)
  }

  test("shallow clone: zero-copy table, immediately independent, optimize localizes") {
    val src = tmp("cl-src"); val dst = tmp("cl-dst")
    import spark.implicits._
    val df = spark.range(0, 2000).select(col("id").as("k"),
      concat(lit("r"), col("id")).as("v"))
    LogLake.create(spark, src, df.repartition(4), statsCols = Seq("k"))
    // clone a DV-carrying snapshot: the sidecar reference travels too
    LogLake.delete(spark, src, col("k") === 99L, mor = true)
    LogLake.cloneShallow(spark, src, dst)

    def names(dir: String): Set[String] = {
      val f = graft.sources.WireLog.fs(dir)
      val dd = new org.apache.hadoop.fs.Path(dir, LogLake.DataDir)
      if (!f.exists(dd)) Set.empty
      else f.listStatus(dd).map(_.getPath.getName).toSet
    }
    assert(names(dst).isEmpty, "shallow clone must copy zero data files")
    assert(LogLake.snapshot(spark, dst).count() == 1999L)
    assert(LogLake.snapshot(spark, dst).filter(col("k") === 99L).count() == 0L,
      "the cloned snapshot reads through the source's deletion vector")
    // the format read works on the clone too (DV fallback path)
    assert(spark.read.format("loglake").load(dst).count() == 1999L)

    // divergence: writes on the clone never touch the source, and vice versa
    LogLake.append(spark, dst, Seq(9001L -> "x").toDF("k", "v"))
    LogLake.append(spark, src, Seq(9002L -> "y").toDF("k", "v"))
    assert(LogLake.snapshot(spark, dst).count() == 2000L)
    assert(LogLake.snapshot(spark, src).count() == 2000L)
    assert(LogLake.snapshot(spark, dst).filter(col("k") === 9002L).count() == 0L)
    assert(LogLake.snapshot(spark, src).filter(col("k") === 9001L).count() == 0L)

    // stats survived the clone: a range scan still prunes on the clone
    val (kept, total) = LogLake.pruneFiles(dst, "k", 0L, 10L)
    assert(kept.size < total, s"clone must keep file stats (kept ${kept.size}/$total)")

    // OPTIMIZE on the clone localizes the data (and purges the DV);
    // afterwards the clone survives a source vacuum entirely
    LogLake.optimize(spark, dst, numFiles = 2, statsCols = Seq("k"))
    assert(names(dst).nonEmpty, "optimize must write local files")
    assert(LogLake.activeState(dst)._1.forall(a => !a.path.startsWith("/")),
      "optimize must leave only table-relative paths in the clone's manifest")
    LogLake.vacuum(src, olderThanMs = -1000) // aggressive: delete everything unreferenced
    assert(LogLake.snapshot(spark, dst).count() == 2000L)
    // and the clone's own vacuum never reached into the source
    assert(LogLake.snapshot(spark, src).count() == 2000L)
  }

  test("streaming append is exactly-once across restart (txn-carried idempotence)") {
    val dir = tmp("stream")
    val in = Files.createTempDirectory("loglake-stream-in").toString
    val chk = Files.createTempDirectory("loglake-stream-chk").toString
    import spark.implicits._
    def produce(from: Long, until: Long): Unit =
      (from until until).map(i => (i, s"m$i")).toDF("k", "v")
        .write.mode("append").parquet(in)
    def drain(): Unit = {
      val src = spark.readStream.schema("k LONG, v STRING").parquet(in)
      val q = LogLake.streamAppend(src, dir, chk)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      assert(!q.isActive)
    }
    produce(0, 50)
    drain()
    produce(50, 80)
    drain() // restart from checkpoint: only the new files flow
    val versionsAfter = LogLake.currentVersion(dir)
    drain() // nothing new: no version may appear
    assert(LogLake.currentVersion(dir) == versionsAfter,
      "an empty restart must not commit")
    assert(sortedRows(LogLake.snapshot(spark, dir)) ==
      (0L until 80L).map(i => i -> s"m$i"),
      "exactly-once: every record once, none twice")
  }

  test("append validates the schema: exact match or additive nullable evolution only") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = tmp("evolve")
    LogLake.create(spark, dir, kv(1L -> "a"))
    // additive nullable column evolves the schema; old files read it as NULL
    val evolved = spark.createDataFrame(
      java.util.List.of(Row(2L, "b", java.lang.Long.valueOf(7L))),
      StructType(Seq(StructField("k", LongType), StructField("v", StringType),
        StructField("extra", LongType, nullable = true))))
    LogLake.append(spark, dir, evolved)
    val got = LogLake.snapshot(spark, dir)
      .select("k", "v", "extra").as[(Long, String, Option[Long])].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a", None), (2L, "b", Some(7L))),
      "old files must read the evolved column as NULL")
    // a retyped column is rejected loudly (silent acceptance would
    // corrupt reads of every older file)
    val retyped = spark.createDataFrame(
      java.util.List.of(Row(3L, 9)),
      StructType(Seq(StructField("k", LongType), StructField("v", IntegerType))))
    val e1 = intercept[IllegalArgumentException] { LogLake.append(spark, dir, retyped) }
    assert(e1.getMessage.contains("retype"))
    // dropping a column is not an append
    val dropped = spark.createDataFrame(
      java.util.List.of(Row(java.lang.Long.valueOf(3L))),
      StructType(Seq(StructField("k", LongType))))
    val e2 = intercept[IllegalArgumentException] { LogLake.append(spark, dir, dropped) }
    assert(e2.getMessage.contains("missing table columns"))
  }

  test("changeFeed surfaces exactly the changed rows; copied rows cancel") {
    val dir = tmp("cdf")
    LogLake.create(spark, dir,
      kv(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d").repartitionByRange(2, col("k")))
    LogLake.merge(spark, dir, kv(1L -> "A!", 9L -> "i"), keyCols = Seq("k"))
    val ch = LogLake.changeFeed(spark, dir, 1L, 2L)
      .select("_change_type", "k", "v", "_commit_version")
      .as[(String, Long, String, Long)].collect().toSet
    // the merge rewrote the file holding keys 1-2: row 2 was COPIED and
    // must cancel; only the genuine update (delete old + insert new)
    // and the genuine insert may surface, all stamped version 2
    assert(ch == Set(
      ("delete", 1L, "a", 2L),
      ("insert", 1L, "A!", 2L),
      ("insert", 9L, "i", 2L)))
    // an empty range yields an empty, correctly-shaped feed
    assert(LogLake.changeFeed(spark, dir, 2L, 2L).count() == 0)
  }

  test("delete is copy-on-write: only matching files rewrite, all-match files drop, no-match is a no-op") {
    val dir = tmp("delete")
    // three 1-row files with disjoint keys → the touch set is exact
    LogLake.create(spark, dir, kv(1L -> "a").repartition(1))
    LogLake.append(spark, dir, kv(2L -> "b").repartition(1))
    LogLake.append(spark, dir, kv(3L -> "c").repartition(1))
    val before = LogLake.activeState(dir)._1.map(_.path).toSet
    assert(before.size == 3)

    // matches ONLY file {2}: that file drops entirely (all rows match),
    // files {1} and {3} must carry over under their ORIGINAL paths
    assert(LogLake.delete(spark, dir, col("k") === 2L) == 4L)
    val after = LogLake.activeState(dir)._1.map(_.path).toSet
    assert(sortedRows(LogLake.snapshot(spark, dir)) == Seq(1L -> "a", 3L -> "c"))
    assert(before.intersect(after).size == 2,
      "the two untouched files must survive as the same physical files")

    // no row matches → no commit at all
    assert(LogLake.delete(spark, dir, col("k") === 99L) == 4L)
    assert(LogLake.currentVersion(dir) == 4L)

    // NULL condition rows survive, as in SQL DELETE
    LogLake.append(spark, dir, Seq((4L, null: String)).toDF("k", "v"))
    LogLake.delete(spark, dir, col("v") === "zzz")
    assert(LogLake.snapshot(spark, dir).count() == 3,
      "a NULL-valued predicate must not delete the row")
  }

  test("update rewrites matched rows in matched files only; unknown set-column fails") {
    val dir = tmp("update")
    LogLake.create(spark, dir, kv(1L -> "a").repartition(1))
    LogLake.append(spark, dir, kv(2L -> "b").repartition(1))
    val before = LogLake.activeState(dir)._1.map(_.path).toSet

    LogLake.update(spark, dir, col("k") === 2L,
      set = Map("v" -> concat(col("v"), lit("!"))))
    assert(sortedRows(LogLake.snapshot(spark, dir)) == Seq(1L -> "a", 2L -> "b!"))
    val after = LogLake.activeState(dir)._1.map(_.path).toSet
    assert(before.intersect(after).size == 1,
      "the untouched file must survive as the same physical file")

    val e = intercept[IllegalArgumentException] {
      LogLake.update(spark, dir, col("k") === 1L, set = Map("nope" -> lit(1)))
    }
    assert(e.getMessage.contains("unknown column"))
  }

  test("restore rewinds content as a new commit; history stays; vacuumed target fails loudly") {
    val dir = tmp("restore")
    // one file so the delete provably rewrites it into a new generation
    LogLake.create(spark, dir, kv(1L -> "a", 2L -> "b").repartition(1)) // v1: file A
    LogLake.delete(spark, dir, col("k") === 1L)                         // v2: file B
    assert(sortedRows(LogLake.snapshot(spark, dir)) == Seq(2L -> "b"))

    assert(LogLake.restore(spark, dir, toVersion = 1L) == 3L)           // v3: back to A
    assert(sortedRows(LogLake.snapshot(spark, dir)) == Seq(1L -> "a", 2L -> "b"))
    // the in-between version is still reachable (history intact)
    assert(sortedRows(LogLake.snapshot(spark, dir, asOf = Some(2L))) == Seq(2L -> "b"))
    // restoring to the current version is a no-op
    assert(LogLake.restore(spark, dir, toVersion = 3L) == 3L)

    // vacuum reclaims v2's rewritten generation (inactive since v3);
    // restoring INTO the reclaimed version must fail loudly
    assert(LogLake.vacuum(dir, olderThanMs = 0L).nonEmpty)
    val e = intercept[java.io.IOException] {
      LogLake.restore(spark, dir, toVersion = 2L)
    }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("manifest log survives a crashed writer's garbage in _tmp") {
    val dir = tmp("crashed")
    LogLake.create(spark, dir, kv(1L -> "a"))
    // a writer died mid-stage: orphan staging dir + orphan manifest tmp
    val f = graft.sources.WireLog.fs(dir)
    f.mkdirs(new org.apache.hadoop.fs.Path(dir, s"${LogLake.LogDir}/_tmp/w-dead"))
    val o = f.create(new org.apache.hadoop.fs.Path(dir,
      s"${LogLake.LogDir}/_tmp/m-dead"), true)
    o.write("{not json".getBytes("UTF-8")); o.close()
    assert(LogLake.currentVersion(dir) == 1L)
    assert(sortedRows(LogLake.snapshot(spark, dir)) == Seq(1L -> "a"))
    assert(LogLake.append(spark, dir, kv(2L -> "b")) == 2L)
  }

  test("racing merge-on-read deletes: serializable — both land in sequence or the loser fails loudly") {
    val dir = tmp("dv-race")
    LogLake.create(spark, dir,
      spark.range(0, 100).select(col("id").as("k"),
        concat(lit("r"), col("id")).as("v")))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def deleter(key: Long) = new Thread {
      override def run(): Unit =
        try LogLake.delete(spark, dir, col("k") === key, mor = true)
        catch { case t: Throwable => errs.add(t) }
    }
    val a = deleter(10L); val b = deleter(20L)
    a.start(); b.start(); a.join(120000); b.join(120000)
    val snap = LogLake.snapshot(spark, dir)
    errs.forEach(t => assert(t.getMessage.contains("concurrent commit"),
      s"a losing MoR delete must fail loudly as a snapshot conflict: ${t.getMessage}"))
    if (errs.isEmpty) {
      // both serialized: both vectors applied, nothing else lost
      assert(snap.count() == 98L)
      assert(snap.filter(col("k").isin(10L, 20L)).count() == 0L)
    } else {
      // the loser's delete is absent IN FULL — no partial vector
      assert(snap.count() == 99L)
      assert(snap.filter(col("k").isin(10L, 20L)).count() == 1L)
    }
  }

  test("deletion vectors: point deletes rewrite zero data files; reads, CDC, optimize, vacuum honor them") {
    val dir = tmp("dv")
    val df = spark.range(0, 4000)
      .select(col("id").as("k"), concat(lit("r"), col("id")).as("v"))
      .repartitionByRange(4, col("k"))
    LogLake.create(spark, dir, df, statsCols = Seq("k")) // v1: 4 range files
    def dataFiles(): Set[String] = {
      val f = graft.sources.WireLog.fs(dir)
      f.listStatus(new org.apache.hadoop.fs.Path(dir, LogLake.DataDir))
        .map(_.getPath.getName).toSet
    }
    val gen0 = dataFiles()

    // v2, v3: two MoR point deletes — ZERO data files rewritten, the
    // second delete merges into the first file's existing vector
    LogLake.delete(spark, dir, col("k") === 1500L, mor = true)
    assert(dataFiles() == gen0, "a merge-on-read delete must not touch data files")
    LogLake.delete(spark, dir, col("k") === 1501L, mor = true)
    assert(dataFiles() == gen0)
    val (files3, _) = LogLake.activeState(dir)
    assert(files3.count(_.dv.nonEmpty) == 1, "one file masked")
    assert(files3.find(_.dv.nonEmpty).get.dvRows == 2L, "vectors merged")
    val snap3 = LogLake.snapshot(spark, dir)
    assert(snap3.count() == 3998L)
    assert(snap3.filter(col("k").isin(1500L, 1501L)).count() == 0L)

    // v4: MoR update writes ONLY the matched row as new data
    LogLake.update(spark, dir, col("k") === 10L, Map("v" -> lit("X")), mor = true)
    assert((dataFiles() -- gen0).size == 1, "one new file: the updated rows")
    val snap4 = LogLake.snapshot(spark, dir)
    assert(snap4.count() == 3998L)
    assert(snap4.filter(col("k") === 10L).select("v").head().getString(0) == "X")

    // the 100 TB posture of the masked read: the DV positions side
    // BROADCASTS (it is deleted-position volume, bytes-to-kilobytes)
    // against the NATIVE vectorized parquet scan — never a shuffle of
    // the data side, never a non-native scan
    locally {
      val qe = snap4.queryExecution
      snap4.count() // materialize so AQE settles its final plan
      val finalPlan = qe.executedPlan.toString
      assert(finalPlan.contains("BroadcastHashJoin") &&
        finalPlan.contains("LeftAnti"),
        s"DV masking must be a broadcast anti-join, got:\n$finalPlan")
      assert(finalPlan.contains("FileScan parquet") ||
        finalPlan.contains("Scan parquet"),
        "the data side must stay a native parquet scan")
    }

    // time travel ignores later vectors; CDC surfaces exactly the
    // masked/updated rows, never rows an older vector already hid
    assert(LogLake.snapshot(spark, dir, Some(1L)).count() == 4000L)
    val cf2 = LogLake.changeFeed(spark, dir, 1L, 2L)
    assert(cf2.filter(col("_change_type") === "delete")
      .select("k").as[Long].collect().toSeq == Seq(1500L))
    assert(cf2.filter(col("_change_type") === "insert").count() == 0L)
    // v4 is a pure UPDATE commit: its diff sides carry Delta's
    // update_preimage/update_postimage labels, not delete/insert
    val cf4 = LogLake.changeFeed(spark, dir, 3L, 4L)
    assert(cf4.filter(col("_change_type") === "update_preimage")
      .select("k").as[Long].collect().toSeq == Seq(10L))
    assert(cf4.filter(col("_change_type") === "update_postimage")
      .select("v").as[String].collect().toSeq == Seq("X"))
    assert(cf4.schema("_commit_timestamp").dataType ==
      org.apache.spark.sql.types.TimestampType)

    // v5: a delete that kills EVERY live row of a file drops the file —
    // target the top range file via its own manifest stats (range
    // partitioning picks its own boundaries)
    val before5 = LogLake.activeState(dir)._1
    val top = before5.filter(_.stats.contains("k")).maxBy(_.stats("k").min.toLong)
    LogLake.delete(spark, dir, col("k") >= top.stats("k").min.toLong, mor = true)
    assert(LogLake.activeState(dir)._1.size == before5.size - 1,
      "the fully-dead file drops entirely, no sidecar")
    val live = 3998L - top.rows
    assert(LogLake.snapshot(spark, dir).count() == live)

    // the format read serves the DV-masked snapshot while vectors are
    // active (merge-on-read fallback relation — no refusal, no
    // resurrection; the native FileIndex path resumes after OPTIMIZE)
    assert(spark.read.format("loglake").load(dir).count() == live)

    // OPTIMIZE materializes the deletes: content identical, vectors
    // purged, the native-format read works again
    LogLake.optimize(spark, dir, numFiles = 2)
    assert(LogLake.activeState(dir)._1.forall(_.dv.isEmpty))
    assert(LogLake.activeState(dir)._1.forall(_.stats.contains("k")),
      "stats columns inherit through a maintenance rewrite — OPTIMIZE " +
        "must not silently turn file skipping off")
    assert(spark.read.format("loglake").load(dir).count() == live)
    assert(spark.read.format("loglake").load(dir)
      .filter(col("k") === 10L).select("v").head().getString(0) == "X")

    // vacuum reclaims the orphaned sidecars along with old file gens
    val swept = LogLake.vacuum(dir, olderThanMs = -1000L)
    assert(swept.exists(_.startsWith(s"${LogLake.DvDir}/")),
      s"dv sidecars must be vacuumed, swept: $swept")
    assert(LogLake.snapshot(spark, dir).count() == live, "vacuum keeps the live state")
  }

  test("broad merge-on-read delete: ~1M rows across many files, sidecars written executor-side") {
    // The wide-delete shape that used to be the engine's one data-sized
    // driver path: positions now flow scan task → per-file sidecar
    // write task → driver sees only (file, sidecar, cardinality)
    // triples, so this commit's driver contact is manifest-sized no
    // matter how many rows die. This spec pins the semantics at a scale
    // where the old collect() would have shipped ~4 MB of positions —
    // structurally identical to the 100 TB case, just smaller.
    val dir = tmp("dv-broad")
    val n = 1000000L
    val df = spark.range(0, n)
      .select(col("id").as("k"), (col("id") % 97).as("v"))
      .repartitionByRange(16, col("k"))
    LogLake.create(spark, dir, df, statsCols = Seq("k")) // 16 range files
    def files() = LogLake.activeState(dir)._1

    // ~half the rows die, spread across EVERY file
    LogLake.delete(spark, dir, col("k") % 2 === 0L, mor = true)
    val f1 = files()
    assert(f1.size == 16 && f1.forall(_.dv.nonEmpty),
      "every file masks, none rewrites")
    assert(f1.map(_.dvRows).sum == n / 2)
    val snap = LogLake.snapshot(spark, dir)
    assert(snap.count() == n / 2)
    assert(snap.filter(col("k") % 2 === 0L).count() == 0L)

    // a second broad delete MERGES into every existing vector; files
    // whose every physical row is now dead drop with no sidecar
    LogLake.delete(spark, dir, col("k") < 500000L || col("k") % 4 === 1L,
      mor = true)
    val f2 = files()
    val expectLive = spark.range(0, n)
      .filter(col("id") % 2 =!= 0L)
      .filter(!(col("id") < 500000L || col("id") % 4 === 1L)).count()
    assert(f2.map(a => a.rows - a.dvRows).sum == expectLive)
    assert(f2.size < 16, "fully-dead low-range files must drop entirely")
    assert(LogLake.snapshot(spark, dir).count() == expectLive)
    assert(LogLake.snapshot(spark, dir)
      .agg(sum(col("k")).as("s")).head().getLong(0) ==
      spark.range(500000L, n).filter(col("id") % 4 === 3L)
        .agg(sum(col("id"))).head().getLong(0))
  }

  test("deep clone: independent copy, DVs carried, survives source vacuum") {
    val src = tmp("dcl-src"); val dst = tmp("dcl-dst")
    import spark.implicits._
    val df = spark.range(0, 2000).select(col("id").as("k"),
      concat(lit("r"), col("id")).as("v"))
    LogLake.create(spark, src, df.repartition(4), statsCols = Seq("k"))
    LogLake.delete(spark, src, col("k") === 99L, mor = true)
    LogLake.cloneDeep(spark, src, dst)

    // copied, not referenced: every manifest path is clone-local
    val adds = LogLake.history(dst).head.adds
    assert(adds.forall(a => a.path.startsWith("data/")))
    assert(adds.exists(_.dv.nonEmpty), "the deletion vector copied too")
    assert(adds.forall(a => a.dv.isEmpty || a.dv.startsWith("dv/")))
    // stats carried verbatim — skipping works without a recompute
    assert(adds.forall(_.stats.contains("k")))
    assert(LogLake.snapshot(spark, dst).count() == 1999L)
    assert(LogLake.snapshot(spark, dst).filter(col("k") === 99L).count() == 0L)

    // the deep clone's defining property: source vacuum can't break it
    LogLake.optimize(spark, src, 1) // orphans the source generation
    LogLake.vacuum(src, olderThanMs = -1000L)
    assert(LogLake.snapshot(spark, dst).count() == 1999L)
  }

  test("in-commit timestamps: monotonic, drive time travel, mtime fallback for old manifests") {
    val dir = tmp("ict")
    LogLake.create(spark, dir, kv(1L -> "a"))
    LogLake.append(spark, dir, kv(2L -> "b"))
    LogLake.append(spark, dir, kv(3L -> "c"))
    val ts = (1L to 3L).map(v => LogLake.commitTimestamp(dir, v).getTime)
    assert(ts == ts.sorted && ts.distinct == ts, s"not strictly monotonic: $ts")
    // the manifests carry the timestamp (not mtime-derived)
    assert(LogLake.history(dir).forall(_.ts > 0L))
    assert(LogLake.history(dir).map(_.ts) == ts)
    // timestampAsOf resolves by the in-commit clock (binary search)
    assert(LogLake.versionAtTimestamp(dir, ts(1)) == 2L)
    assert(LogLake.versionAtTimestamp(dir, ts(1) - 1L) == 1L)
    assert(LogLake.versionAtTimestamp(dir, ts(2) + 1000L) == 3L)
    intercept[IllegalArgumentException] {
      LogLake.versionAtTimestamp(dir, ts(0) - 1000L)
    }
    // pre-ICT manifest (no ts field): readers fall back to file mtime
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sessionState.newHadoopConf())
    val p2 = new org.apache.hadoop.fs.Path(dir, f"_loglake/${2L}%020d.json")
    val stripped = graft.sources.WireLog.readSmallFile(f, p2).get
      .replaceAll(""","ts":\d+""", "")
    f.delete(p2, false)
    val out = f.create(p2, true)
    try out.write(stripped.getBytes("UTF-8")) finally out.close()
    assert(LogLake.history(dir)(1).ts == 0L)
    assert(LogLake.commitTimestamp(dir, 2L).getTime ==
      f.getFileStatus(p2).getModificationTime)
    // change feed timestamps ride the same clock
    val cdf = LogLake.changeFeed(spark, dir, 0L, 3L)
      .select("_commit_version", "_commit_timestamp").distinct()
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    assert(cdf(1L) == ts(0) && cdf(3L) == ts(2))
  }

  test("NOT NULL columns reject null writes; nothing commits") {
    val dir = tmp("notnull")
    // k: BIGINT from a product encoder — nullable = false in the schema
    LogLake.create(spark, dir, kv(1L -> "a"))
    assert(!LogLake.activeState(dir)._2("k").nullable)
    val withNull = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(null, "x"), org.apache.spark.sql.Row(7L, "y")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType, nullable = true))))
    val e = intercept[IllegalArgumentException] {
      LogLake.append(spark, dir, withNull)
    }
    assert(e.getMessage.contains("IS NOT NULL"))
    assert(e.getMessage.contains("nothing committed"))
    assert(LogLake.currentVersion(dir) == 1L)
    assert(LogLake.snapshot(spark, dir).count() == 1L)
    // an UPDATE cannot null a NOT NULL column either
    val e2 = intercept[IllegalArgumentException] {
      LogLake.update(spark, dir, col("k") === 1L,
        Map("k" -> lit(null).cast("long")))
    }
    assert(e2.getMessage.contains("IS NOT NULL"))
    // nullable columns still take nulls freely
    LogLake.append(spark, dir, spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(9L, null)),
      LogLake.activeState(dir)._2))
    assert(LogLake.snapshot(spark, dir).filter(col("v").isNull).count() == 1L)
  }
}
