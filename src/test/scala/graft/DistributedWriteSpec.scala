package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.LogLake

/** WRITE-PATH DISCOVERY AS A JOB (round 14): with
  * `loglake.planning.distributed = true` and a parquet-body checkpoint,
  * MERGE / mergeClauses / UPDATE / DELETE discover their candidate and
  * touched files through the checkpoint-part prune — the
  * snapshot-assemble counter stays flat through every mutation, and the
  * committed results match the eager path bit for bit. Also pinned:
  * the schema-only write validation (finishStaged, DDL preconditions)
  * reads the manifest, never resolved state. */
class DistributedWriteSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"llwrite-$name").toString + "/t"

  /** 12-commit table (checkpoint at v10), k in [0, 1200) step 50. */
  private def build(distributed: Boolean): String = {
    val dir = tmp(if (distributed) "dist" else "eager")
    LogLake.createEmpty(dir, Seq((1L, "x")).toDF("k", "v").schema)
    LogLake.setTableProperties(dir, Map(
      "loglake.checkpoint.format" -> "parquet",
      "loglake.checkpoint.partSizeFiles" -> "4",
      "loglake.planning.distributed" -> distributed.toString))
    (0 until 12).foreach(i =>
      LogLake.append(spark, dir,
        Seq((i * 100L, s"a$i"), (i * 100L + 50L, s"b$i")).toDF("k", "v")
          .repartition(1)))
    dir
  }

  private def rows(dir: String): Seq[(Long, String)] = {
    LogLake.clearSnapshotCache()
    LogLake.snapshot(spark, dir).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
  }

  test("merge discovers touched files without assembling state; eager parity") {
    val d = build(distributed = true)
    val e = build(distributed = false)
    val src = Seq((150L, "upd"), (9999L, "ins")).toDF("k", "v")
    LogLake.clearSnapshotCache()
    val before = LogLake.snapshotAssembles.get()
    LogLake.merge(spark, d, src, keyCols = Seq("k"))
    assert(LogLake.snapshotAssembles.get() == before,
      "distributed merge discovery must not assemble table state")
    LogLake.merge(spark, e, src, keyCols = Seq("k"))
    assert(rows(d) == rows(e))
    // the upsert really landed
    assert(rows(d).count(_._2 == "upd") == 1 && rows(d).contains((9999L, "ins")))
  }

  test("mergeClauses (incl. conditional NMBS) stays distributed; eager parity") {
    import LogLake.MergeClause._
    val d = build(distributed = true)
    val e = build(distributed = false)
    val src = Seq((250L, "u"), (7777L, "i")).toDF("k", "v")
    val clauses = Seq(
      MatchedUpdate(None, Map("v" -> col("source.v"))),
      NotMatchedInsert(None, Map("k" -> col("source.k"), "v" -> col("source.v"))),
      // conditional NMBS: constraint-pruned candidate discovery
      NotMatchedBySourceUpdate(Some(col("target.k") === 1100L),
        Map("v" -> lit("aged"))))
    LogLake.clearSnapshotCache()
    val before = LogLake.snapshotAssembles.get()
    LogLake.mergeClauses(spark, d, src, Seq("k"), clauses)
    assert(LogLake.snapshotAssembles.get() == before,
      "distributed mergeClauses discovery must not assemble table state")
    LogLake.mergeClauses(spark, e, src, Seq("k"), clauses)
    assert(rows(d) == rows(e))
    assert(rows(d).contains((1100L, "aged")) && rows(d).contains((7777L, "i")))
  }

  test("update and delete (cow + mor) discover candidates as a job; eager parity") {
    val d = build(distributed = true)
    val e = build(distributed = false)
    LogLake.clearSnapshotCache()
    val before = LogLake.snapshotAssembles.get()
    LogLake.update(spark, d, col("k") === 350L, Map("v" -> lit("u350")))
    LogLake.delete(spark, d, col("k").between(500L, 560L))
    LogLake.delete(spark, d, col("k") === 750L, mor = true)
    assert(LogLake.snapshotAssembles.get() == before,
      "distributed update/delete discovery must not assemble table state")
    LogLake.update(spark, e, col("k") === 350L, Map("v" -> lit("u350")))
    LogLake.delete(spark, e, col("k").between(500L, 560L))
    LogLake.delete(spark, e, col("k") === 750L, mor = true)
    assert(rows(d) == rows(e))
    assert(rows(d).contains((350L, "u350")) &&
      !rows(d).exists(r => r._1 == 500L || r._1 == 550L || r._1 == 750L))
  }

  test("partition-predicate DELETE stays metadata-only AND unassembled under the opt-in") {
    val dir = tmp("pdel")
    LogLake.create(spark, dir,
      Seq((1L, "A"), (2L, "B"), (3L, "C"), (4L, "B")).toDF("k", "s"),
      partitionBy = Seq("s"))
    LogLake.setTableProperties(dir, Map(
      "loglake.checkpoint.format" -> "parquet",
      "loglake.checkpoint.partSizeFiles" -> "4",
      "loglake.planning.distributed" -> "true"))
    (0 until 11).foreach(i =>
      LogLake.append(spark, dir,
        Seq((100L + i, "A"), (200L + i, "B")).toDF("k", "s")))
    val beforePaths = LogLake.activeState(dir)._1.map(_.path).toSet
    LogLake.clearSnapshotCache()
    val before = LogLake.snapshotAssembles.get()
    val deleted = LogLake.delete(spark, dir, col("s") === "B")
    assert(deleted > 0L)
    assert(LogLake.snapshotAssembles.get() == before,
      "partition delete under the opt-in must not assemble table state")
    val after = LogLake.activeState(dir)._1
    assert(after.forall(a => beforePaths.contains(a.path)),
      "metadata-only: no file rewritten")
    assert(after.forall(_.partitionValues("s") != "B"))
    assert(LogLake.snapshot(spark, dir).filter(col("s") === "B").count() == 0L)
  }

  test("replaceWhere classifies and rewrites its region without assembling state") {
    val d = build(distributed = true)
    val e = build(distributed = false)
    val repl = Seq((500L, "r0"), (520L, "r1")).toDF("k", "v")
    LogLake.clearSnapshotCache()
    val before = LogLake.snapshotAssembles.get()
    LogLake.overwriteWhere(spark, d, repl, col("k").between(500L, 599L))
    assert(LogLake.snapshotAssembles.get() == before,
      "distributed replaceWhere must not assemble table state")
    LogLake.overwriteWhere(spark, e, repl, col("k").between(500L, 599L))
    assert(rows(d) == rows(e))
    assert(rows(d).contains((500L, "r0")) && rows(d).contains((520L, "r1")) &&
      !rows(d).exists(_._1 == 550L))
    // a row outside the region still fails loudly, nothing committed
    val vBefore = LogLake.currentVersion(d)
    intercept[IllegalArgumentException] {
      LogLake.overwriteWhere(spark, d,
        Seq((9L, "out")).toDF("k", "v"), col("k").between(500L, 599L))
    }
    assert(LogLake.currentVersion(d) == vBefore)
  }

  test("incremental OPTIMIZE and the autoCompact trigger discover via the job") {
    val d = build(distributed = true)
    val e = build(distributed = false)
    LogLake.clearSnapshotCache()
    val before = LogLake.snapshotAssembles.get()
    // every file in these fixtures is tiny — incremental OPTIMIZE
    // discovers them all through the job and compacts
    LogLake.optimize(spark, d, numFiles = 2,
      onlySmallerThan = 16L * 1024 * 1024)
    assert(LogLake.snapshotAssembles.get() == before,
      "distributed incremental OPTIMIZE must not assemble table state")
    LogLake.optimize(spark, e, numFiles = 2,
      onlySmallerThan = 16L * 1024 * 1024)
    assert(rows(d) == rows(e))
    assert(LogLake.activeState(d)._1.size <= 2)
    // OPTIMIZE WHERE over a partitioned distributed table: the region
    // classifier rides candidates from the stats job
    val pd = tmp("ow")
    LogLake.create(spark, pd,
      Seq((1L, "A"), (2L, "B"), (3L, "A"), (4L, "B")).toDF("k", "s"),
      partitionBy = Seq("s"))
    LogLake.setTableProperties(pd, Map(
      "loglake.checkpoint.format" -> "parquet",
      "loglake.checkpoint.partSizeFiles" -> "4",
      "loglake.planning.distributed" -> "true"))
    (0 until 11).foreach(i =>
      LogLake.append(spark, pd, Seq((10L + i, "A"), (50L + i, "B")).toDF("k", "s")))
    val beforeB = LogLake.activeState(pd)._1
      .filter(_.partitionValues("s") == "B").map(_.path).toSet
    LogLake.clearSnapshotCache()
    val b2 = LogLake.snapshotAssembles.get()
    LogLake.optimize(spark, pd, numFiles = 1,
      where = Some(col("s") === "A"))
    assert(LogLake.snapshotAssembles.get() == b2,
      "distributed OPTIMIZE WHERE must not assemble table state")
    val after = LogLake.activeState(pd)._1
    assert(after.filter(_.partitionValues("s") == "B").map(_.path).toSet ==
      beforeB, "files outside the WHERE region must be untouched")
    assert(after.count(_.partitionValues("s") == "A") == 1,
      "the A region must have compacted to one file")
  }

  test("review pins: cross-typed merge keys, empty WHERE region, no-table error") {
    // a STRING-typed source key against the long k column must not
    // let the envelope prune the matching file — the merge must
    // UPDATE, never insert a duplicate (Spark coerces "150" to 150
    // in the join; the lexicographic envelope would disagree)
    val d = build(distributed = true)
    LogLake.merge(spark, d,
      Seq(("150", "upd-str")).toDF("k", "v"), keyCols = Seq("k"))
    assert(rows(d).count(_._1 == 150L) == 1,
      "cross-typed merge key must update in place, not duplicate")
    assert(rows(d).contains((150L, "upd-str")))
    // OPTIMIZE WHERE over a partition region that matches nothing is
    // a NO-OP, not a misdiagnosed "partition columns only" error
    val pd = tmp("emptyregion")
    LogLake.create(spark, pd, Seq((1L, "A")).toDF("k", "s"),
      partitionBy = Seq("s"))
    LogLake.setTableProperties(pd,
      Map("loglake.planning.distributed" -> "true"))
    val v = LogLake.currentVersion(pd)
    assert(LogLake.optimize(spark, pd, 1,
      where = Some(col("s") === "nope")) == v)
    // mutations against a nonexistent table fail with the classic
    // error, not an NPE
    val e = intercept[IllegalArgumentException] {
      LogLake.delete(spark, tmp("missing"), col("k") === 1L)
    }
    assert(e.getMessage.contains("no table at"))
  }

  test("a churned log bootstraps a COMPLETE first checkpoint (exact part count)") {
    // compaction before the first checkpoint makes the historical add
    // count far exceed the active count — the part layout must size
    // from the EXACT active count or the i-of-n group tears forever
    val dir = tmp("churn")
    LogLake.createEmpty(dir, Seq((1L, "x")).toDF("k", "v").schema)
    LogLake.setTableProperties(dir, Map(
      "loglake.checkpoint.format" -> "parquet",
      "loglake.checkpoint.partSizeFiles" -> "4",
      // force the bootstrap JOB at toy scale (auto-select would route
      // this fixture to the driver replay)
      "loglake.checkpoint.bootstrapJobMinManifestBytes" -> "0",
      "loglake.planning.distributed" -> "true"))
    (0 until 6).foreach(i =>
      LogLake.append(spark, dir, Seq((i.toLong, s"v$i")).toDF("k", "v")
        .repartition(1)))                       // v2..v7: 6 files
    LogLake.optimize(spark, dir, numFiles = 1)  // v8: 6 -> 1 file
    LogLake.append(spark, dir, Seq((100L, "a")).toDF("k", "v")) // v9
    LogLake.append(spark, dir, Seq((200L, "b")).toDF("k", "v")) // v10 -> chk
    val chk = new java.io.File(dir, "_loglake").listFiles()
      .map(_.getName).filter(_.startsWith("chk-"))
    assert(chk.nonEmpty, "the churned log must still checkpoint at v10")
    LogLake.clearSnapshotCache()
    val before = LogLake.snapshotAssembles.get()
    // the lazy index resolves THROUGH the group — a torn group would
    // route eager (assembles) or lose rows
    val df = spark.read.format("loglake").load(dir)
    assert(df.count() == 8L)
    assert(LogLake.snapshotAssembles.get() == before,
      "a complete bootstrap group must serve the lazy plan")
  }

  test("schema-only write validation reads the manifest, not resolved state") {
    val dir = build(distributed = true)
    LogLake.clearSnapshotCache()
    val before = LogLake.snapshotAssembles.get()
    // append validates NOT NULL/generated invariants against the table
    // schema — that lookup must be manifest-sized
    LogLake.append(spark, dir, Seq((424242L, "app")).toDF("k", "v"))
    assert(LogLake.snapshotAssembles.get() == before,
      "append's schema validation must not assemble table state")
    assert(LogLake.declaredSchema(dir).fieldNames.toSeq == Seq("k", "v"))
  }

  test("DESCRIBE DETAIL surfaces the lazy-plan diagnosis and counters") {
    // eligible table: distributed + parquet checkpoint
    val d = build(distributed = true)
    LogLake.clearSnapshotCache()
    val row = LogLake.detailDf(spark, d).head()
    assert(row.getAs[String]("lazyPlan") == "eligible",
      s"got '${row.getAs[String]("lazyPlan")}'")
    assert(row.getAs[Long]("snapshotAssembles") >= 0L &&
      row.getAs[Long]("planJobs") >= 0L &&
      row.getAs[Long]("distributedCheckpointWrites") >= 0L)
    // property off: the reason names it
    val e = build(distributed = false)
    LogLake.clearSnapshotCache()
    assert(LogLake.detailDf(spark, e).head().getAs[String]("lazyPlan")
      .contains("loglake.planning.distributed"))
    // explicit json bodies: the reason names the format
    val j = tmp("jdiag")
    LogLake.createEmpty(j, Seq((1L, "x")).toDF("k", "v").schema)
    LogLake.setTableProperties(j, Map(
      "loglake.checkpoint.format" -> "json",
      "loglake.planning.distributed" -> "true"))
    (0 until 12).foreach(i =>
      LogLake.append(spark, j, Seq((i.toLong, s"v$i")).toDF("k", "v")))
    LogLake.clearSnapshotCache()
    assert(LogLake.detailDf(spark, j).head().getAs[String]("lazyPlan")
      .contains("json"))
    // the SQL surface shows the same columns
    val sqlRow = spark.sql(s"DESCRIBE DETAIL '$d'").head()
    assert(sqlRow.schema.fieldNames.contains("lazyPlan"))
  }

  test("insert-only merge past every envelope still inherits stats columns") {
    // ADVICE r14: the inheritance basis must NOT be the pruned
    // candidate set — an append-style upsert whose keys sit outside
    // every file's envelope empties the prune, and a Nil basis would
    // commit the new files with NO data-column stats, silently turning
    // file skipping off. Pinning config: default collection DISABLED
    // (dataSkippingNumIndexedCols=0) with an explicit stats policy on
    // k established by the appends — the narrowed basis cannot hide
    // behind the first-32 default. Both paths, plus the fresh-region
    // replaceWhere shape.
    for (distributed <- Seq(true, false)) {
      val dir = tmp(if (distributed) "sbdist" else "sbeager")
      LogLake.createEmpty(dir, Seq((1L, "x")).toDF("k", "v").schema)
      LogLake.setTableProperties(dir, Map(
        "loglake.checkpoint.format" -> "parquet",
        "loglake.checkpoint.partSizeFiles" -> "4",
        "loglake.dataSkippingNumIndexedCols" -> "0",
        "loglake.planning.distributed" -> distributed.toString))
      (0 until 12).foreach(i =>
        LogLake.append(spark, dir,
          Seq((i * 100L, s"a$i"), (i * 100L + 50L, s"b$i")).toDF("k", "v")
            .repartition(1), statsCols = Seq("k")))
      def newStats(mutate: => Unit): Seq[Map[String, _]] = {
        LogLake.clearSnapshotCache()
        val beforePaths = LogLake.activeState(dir)._1.map(_.path).toSet
        mutate
        LogLake.clearSnapshotCache()
        LogLake.activeState(dir)._1.filterNot(a => beforePaths(a.path))
          .map(_.stats)
      }
      // keys far outside [0, 1200): candidate prune provably empties
      val ins = newStats(LogLake.merge(spark, dir,
        Seq((900000L, "i1"), (900001L, "i2")).toDF("k", "v"), Seq("k")))
      assert(ins.nonEmpty && ins.forall(_.contains("k")),
        s"insert-only merge files must carry inherited k stats, got $ins")
      // fresh-region backfill: no existing file matches the predicate
      val bf = newStats(LogLake.overwriteWhere(spark, dir,
        Seq((500000L, "bf")).toDF("k", "v"), col("k") >= 500000L && col("k") < 600000L))
      assert(bf.nonEmpty && bf.forall(_.contains("k")),
        s"fresh-region replaceWhere files must carry inherited k stats, got $bf")
    }
  }

  test("mid-life stats enablement: inheritance reads the part's footer union, not its first record") {
    // ADVICE r15: sampling only the FIRST record of each checkpoint
    // part under-inherits when stats collection was enabled mid-life —
    // older stat-less files lead the part AND the manifest tail can be
    // stat-less too, so the one sampled record hides the policy. The
    // policy footer (round 16) carries the part's full stats-key
    // union. Layout pinned here: stat-less files first (v2-v5), a
    // k-stats era in the middle (v6-v9), stat-less again through the
    // checkpoint boundary and the whole tail (v10-v13) — the union is
    // visible ONLY through the footer.
    val dir = tmp("midlife")
    LogLake.createEmpty(dir, Seq((1L, "x")).toDF("k", "v").schema)
    LogLake.setTableProperties(dir, Map(
      "loglake.checkpoint.format" -> "parquet",
      "loglake.checkpoint.partSizeFiles" -> "32",
      "loglake.dataSkippingNumIndexedCols" -> "0",
      "loglake.planning.distributed" -> "true"))
    (0 until 12).foreach { i =>
      val stats = if (i >= 4 && i < 8) Seq("k") else Nil
      LogLake.append(spark, dir,
        Seq((i * 100L, s"a$i")).toDF("k", "v").repartition(1),
        statsCols = stats)
    }
    LogLake.clearSnapshotCache()
    val beforePaths = LogLake.activeState(dir)._1.map(_.path).toSet
    // insert-only merge far outside every envelope (prune empties too)
    LogLake.merge(spark, dir, Seq((900000L, "i1")).toDF("k", "v"), Seq("k"))
    LogLake.clearSnapshotCache()
    val fresh = LogLake.activeState(dir)._1.filterNot(a => beforePaths(a.path))
    assert(fresh.nonEmpty && fresh.forall(_.stats.contains("k")),
      s"mid-life stats policy must inherit from the footer union, got " +
        s"${fresh.map(_.stats)}")
  }
}
