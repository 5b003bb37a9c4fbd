package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

import graft.sources.{LazyLogLakeFileIndex, LogLake, LogLakeFileIndex}

/** THE 10⁸-FILE READ PLAN ([[LazyLogLakeFileIndex]]): with
  * `loglake.planning.distributed = true` and a parquet-body checkpoint,
  * `spark.read.format("loglake")` plans WITHOUT assembling table state
  * — construction reads part footers + the manifest tail, and file
  * skipping runs as a Spark job per scan. Pinned here: identical
  * answers to the eager index, real skipping (lastScanFiles), zero
  * snapshot assembly, and every safety guard that routes back to the
  * eager index (DVs, partition columns, json bodies, no checkpoint,
  * cache hit). */
class LazyIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"lllazy-$name").toString + "/t"

  private def build(props: Map[String, String] = Map.empty): String = {
    val dir = tmp("t")
    LogLake.createEmpty(dir, Seq((1L, "x")).toDF("k", "v").schema)
    LogLake.setTableProperties(dir, props ++ Map(
      "loglake.checkpoint.format" -> "parquet",
      "loglake.checkpoint.partSizeFiles" -> "4",
      "loglake.planning.distributed" -> "true"))
    (0 until 12).foreach(i =>
      LogLake.append(spark, dir,
        Seq((i * 100L, s"a$i"), (i * 100L + 50L, s"b$i")).toDF("k", "v")
          .repartition(1)))
    // a tail on top of the checkpoint: COW rewrite + fresh add
    LogLake.delete(spark, dir, col("k") === 150L)
    LogLake.append(spark, dir, Seq((2000L, "t1")).toDF("k", "v"))
    dir
  }

  private def index(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s.relation.location
    }.get

  test("lazy read == eager read, skipping works, state never assembles") {
    val dir = build()
    LogLake.clearSnapshotCache()
    val before = LogLake.snapshotAssembles.get()
    val df = spark.read.format("loglake").load(dir)
    val idx = index(df)
    assert(idx.isInstanceOf[LazyLogLakeFileIndex],
      s"expected the lazy index, got ${idx.getClass.getSimpleName}")
    val lazyIdx = idx.asInstanceOf[LazyLogLakeFileIndex]
    assert(lazyIdx.sizeInBytes > 0L)
    // full scan answer
    assert(df.count() == 24L) // 25 rows, one deleted
    assert(df.agg(sum("k")).head().getLong(0) ==
      (0 until 12).map(i => i * 100L + i * 100L + 50L).sum - 150L + 2000L)
    // a narrow filter plans through the job and SKIPS files
    val narrow = spark.read.format("loglake").load(dir)
      .filter(col("k").between(300L, 360L))
    assert(narrow.count() == 2L)
    val lidx = index(narrow).asInstanceOf[LazyLogLakeFileIndex]
    assert(lidx.lastScanFiles < 6 && lidx.planJobs >= 1,
      s"expected skipping via the job, scanned ${lidx.lastScanFiles}")
    // through it all: not one snapshot assembled
    assert(LogLake.snapshotAssembles.get() == before,
      "the lazy path must never assemble table state")
    // and the eager path (property off) agrees exactly
    LogLake.setTableProperties(dir,
      Map("loglake.planning.distributed" -> "false"))
    val eager = spark.read.format("loglake").load(dir)
    assert(index(eager).isInstanceOf[LogLakeFileIndex])
    assert(eager.orderBy("k").collect().toSeq ==
      spark.read.format("loglake").load(dir).orderBy("k").collect().toSeq)
  }

  test("time travel plans lazily too, against the pinned version's tail") {
    val dir = build()
    LogLake.append(spark, dir, Seq((9999L, "late")).toDF("k", "v"))
    LogLake.clearSnapshotCache()
    val before = LogLake.snapshotAssembles.get()
    // v14 = createEmpty(v1) + 12 appends (v2..v13) + the COW delete of
    // k=150; the later commits (t1, late) are beyond the pinned target
    val v14 = spark.read.format("loglake").option("versionAsOf", "14")
      .load(dir)
    assert(index(v14).isInstanceOf[LazyLogLakeFileIndex])
    assert(v14.count() == 23L)
    assert(!v14.filter(col("k") === 150L || col("k") === 2000L ||
      col("k") === 9999L).head(1).nonEmpty)
    assert(LogLake.snapshotAssembles.get() == before)
  }

  test("safety guards route back to the eager index") {
    // active DVs → the native scan can't mask rows → never the lazy
    // FileIndex (under distributed planning they take the job-scoped
    // MoR relation — the dedicated test below; the probe here is
    // simply that the read stays correct)
    val dvDir = build()
    LogLake.delete(spark, dvDir, col("k") === 450L, mor = true)
    LogLake.clearSnapshotCache()
    assert(spark.read.format("loglake").load(dvDir).count() == 23L)
    // EXPLICIT json checkpoint bodies → no aggregate footers → eager
    val jsonDir = tmp("json")
    LogLake.createEmpty(jsonDir, Seq((1L, "x")).toDF("k", "v").schema)
    LogLake.setTableProperties(jsonDir, Map(
      "loglake.checkpoint.format" -> "json",
      "loglake.planning.distributed" -> "true"))
    (0 until 12).foreach(i =>
      LogLake.append(spark, jsonDir, Seq((i.toLong, s"v$i")).toDF("k", "v")
        .repartition(1)))
    LogLake.clearSnapshotCache()
    val jdf = spark.read.format("loglake").load(jsonDir)
    assert(index(jdf).isInstanceOf[LogLakeFileIndex])
    assert(jdf.count() == 12L)
    // no checkpoint yet → eager
    val youngDir = tmp("young")
    LogLake.createEmpty(youngDir, Seq((1L, "x")).toDF("k", "v").schema)
    LogLake.setTableProperties(youngDir, Map(
      "loglake.checkpoint.format" -> "parquet",
      "loglake.planning.distributed" -> "true"))
    (0 until 3).foreach(i =>
      LogLake.append(spark, youngDir, Seq((i.toLong, s"v$i")).toDF("k", "v")))
    LogLake.clearSnapshotCache()
    assert(index(spark.read.format("loglake").load(youngDir))
      .isInstanceOf[LogLakeFileIndex])
  }

  /** One partitioned lazy table for the three partition cases below:
    * statuses A/B/C + a NULL partition + an escape-hostile value, a
    * parquet checkpoint under the first 13 commits, and a tail holding
    * a metadata-only partition DELETE (drops status=B) plus a fresh
    * append. */
  private def buildPartitioned(): String = {
    val dir = tmp("part")
    val weird = "x=1/y 2%"
    def batch(i: Int) = Seq(
      (i * 10L, "A", s"a$i"), (i * 10L + 1L, "C", s"c$i")
    ).toDF("k", "status", "v")
    LogLake.create(spark, dir,
      Seq((1L, "A", "s"), (2L, "B", "s"), (3L, null, "s"), (4L, weird, "s"))
        .toDF("k", "status", "v"),
      partitionBy = Seq("status"))
    LogLake.setTableProperties(dir, Map(
      "loglake.checkpoint.format" -> "parquet",
      "loglake.checkpoint.partSizeFiles" -> "4",
      "loglake.planning.distributed" -> "true"))
    (0 until 11).foreach(i => LogLake.append(spark, dir, batch(i)))
    // tail: metadata-only partition delete + an append
    LogLake.delete(spark, dir, col("status") === "B")
    LogLake.append(spark, dir, Seq((999L, "A", "tail")).toDF("k", "status", "v"))
    dir
  }

  test("partitioned tables plan lazily: real partitionSchema, exact tuple admission, eager parity") {
    val dir = buildPartitioned()
    LogLake.clearSnapshotCache()
    val before = LogLake.snapshotAssembles.get()
    val df = spark.read.format("loglake").load(dir)
    val li = index(df)
    assert(li.isInstanceOf[LazyLogLakeFileIndex],
      s"expected the lazy index, got ${li.getClass.getSimpleName}")
    assert(li.partitionSchema.fieldNames.toSeq == Seq("status"))
    // full read: the B partition is gone (metadata-only tail delete)
    assert(df.count() == 26L) // 4 seed - 1 B + 22 appends + 1 tail
    // a partition-selective read admits tuples exactly and prunes in
    // the job: only the A files scan
    val aOnly = spark.read.format("loglake").load(dir)
      .filter(col("status") === "A")
    assert(aOnly.count() == 13L) // seed A + 11 appends + tail
    val lidx = index(aOnly).asInstanceOf[LazyLogLakeFileIndex]
    assert(lidx.planJobs >= 2, // tuple admission + file skipping
      s"expected tuple + prune jobs, ran ${lidx.planJobs}")
    assert(lidx.lastScanFiles == 13,
      s"expected the 13 status=A files, scanned ${lidx.lastScanFiles}")
    // NULL partitions admit only via IS NULL; the weird value's path
    // escaping round-trips through tuples
    assert(spark.read.format("loglake").load(dir)
      .filter(col("status").isNull).count() == 1L)
    assert(spark.read.format("loglake").load(dir)
      .filter(col("status") === "x=1/y 2%").select("k").head().getLong(0) == 4L)
    // through it all: not one snapshot assembled
    assert(LogLake.snapshotAssembles.get() == before,
      "the partitioned lazy path must never assemble table state")
    // eager parity, bit for bit
    LogLake.setTableProperties(dir,
      Map("loglake.planning.distributed" -> "false"))
    LogLake.clearSnapshotCache()
    val eager = spark.read.format("loglake").load(dir)
    assert(index(eager).isInstanceOf[LogLakeFileIndex])
    assert(eager.orderBy("k").collect().toSeq ==
      df.orderBy("k").collect().toSeq)
  }

  test("a MoR window keeps the distributed plan: DV survivors mask in the frame-backed relation") {
    val dir = build()
    // tail DV: delta in-place update on a checkpoint-resident file
    LogLake.delete(spark, dir, col("k") === 450L, mor = true)
    LogLake.clearSnapshotCache()
    val before = LogLake.snapshotAssembles.get()
    def relOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collectFirst {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation
      }.get
    val df = spark.read.format("loglake").load(dir)
    assert(relOf(df).isInstanceOf[graft.sources.LogLakeLazyDvRelation],
      s"expected the lazy DV relation, got ${relOf(df).getClass.getSimpleName}")
    assert(df.count() == 23L) // 24 before, one masked by the DV
    assert(df.filter(col("k") === 450L).count() == 0L,
      "the DV-masked row must not resurrect")
    // stats skipping still scopes the masked plan through the job
    val narrow = spark.read.format("loglake").load(dir)
      .filter(col("k").between(300L, 360L))
    assert(narrow.count() == 2L)
    val rel = relOf(narrow).asInstanceOf[graft.sources.LogLakeLazyDvRelation]
    assert(rel.planJobs >= 1 && rel.lastScanFiles < 6,
      s"expected job-backed skipping, scanned ${rel.lastScanFiles} in ${rel.planJobs} jobs")
    assert(LogLake.snapshotAssembles.get() == before,
      "a MoR window must not knock the table back to eager assembly")
    // checkpoint-resident DVs too: roll a fresh checkpoint PAST the
    // MoR delete, so the sidecar rides a part body, not the tail
    (0 until 10).foreach(i =>
      LogLake.append(spark, dir, Seq((5000L + i, s"x$i")).toDF("k", "v")))
    LogLake.clearSnapshotCache()
    val before2 = LogLake.snapshotAssembles.get()
    val df2 = spark.read.format("loglake").load(dir)
    assert(relOf(df2).isInstanceOf[graft.sources.LogLakeLazyDvRelation])
    assert(df2.count() == 33L)
    assert(df2.filter(col("k") === 450L).count() == 0L)
    assert(LogLake.snapshotAssembles.get() == before2)
    // eager parity, bit for bit
    LogLake.setTableProperties(dir,
      Map("loglake.planning.distributed" -> "false"))
    LogLake.clearSnapshotCache()
    assert(spark.read.format("loglake").load(dir).orderBy("k").collect().toSeq ==
      df2.orderBy("k").collect().toSeq)
  }

  test("dynamic partition pruning survives the lazy plan") {
    val dir = buildPartitioned()
    val dimDir = tmp("dim")
    Seq(("A", "keep"), ("C", "drop")).toDF("status", "cls")
      .write.parquet(dimDir)
    LogLake.clearSnapshotCache()
    val before = LogLake.snapshotAssembles.get()
    val fact = spark.read.format("loglake").load(dir)
    assert(index(fact).isInstanceOf[LazyLogLakeFileIndex])
    val q = fact.join(broadcast(spark.read.parquet(dimDir)), Seq("status"))
      .filter(col("cls") === "keep")
      .agg(count(lit(1)).as("n"), sum("k").as("s"))
    assert(q.queryExecution.optimizedPlan.exists(_.expressions.exists(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))),
      s"no DPP filter planted:\n${q.queryExecution.optimizedPlan}")
    val r = q.head()
    assert(r.getLong(0) == 13L)
    assert(LogLake.snapshotAssembles.get() == before)
  }

  /** Bucketed distributed table: create-time spec, then enough appends
    * for a parquet checkpoint. 4 buckets on k; rows k = 1..n. */
  private def buildBucketed(n: Int): String = {
    val dir = tmp("bkt")
    LogLake.create(spark, dir,
      (1 to 40).map(i => (i.toLong, s"v$i")).toDF("k", "v"),
      bucketBy = Seq("k"), numBuckets = 4)
    LogLake.setTableProperties(dir, Map(
      "loglake.checkpoint.format" -> "parquet",
      "loglake.checkpoint.partSizeFiles" -> "16",
      "loglake.planning.distributed" -> "true"))
    var next = 41
    while (next <= n) {
      val hi = math.min(next + 39, n)
      LogLake.append(spark, dir,
        (next to hi).map(i => (i.toLong, s"v$i")).toDF("k", "v"))
      next = hi + 1
    }
    dir
  }

  test("bucketed tables plan lazily: no-exchange join, eager parity, flat counter") {
    val l = buildBucketed(520)
    val r = buildBucketed(520)
    LogLake.clearSnapshotCache()
    val before = LogLake.snapshotAssembles.get()
    val lf = spark.read.format("loglake").load(l)
    assert(index(lf).isInstanceOf[LazyLogLakeFileIndex],
      s"bucketed + distributed must take the lazy index, got " +
        index(lf).getClass.getSimpleName)
    // the q142-class pin: co-located SMJ with NO shuffle exchange,
    // riding the lazy index's listFiles job
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val j = lf.join(spark.read.format("loglake").load(r)
        .select(col("k"), col("v").as("w")), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed lazy join must not shuffle:\n$plan")
      assert(j.count() == 520L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
    assert(LogLake.snapshotAssembles.get() == before,
      "the bucketed lazy plan must never assemble table state")
    // eager parity, bit for bit
    LogLake.setTableProperties(l,
      Map("loglake.planning.distributed" -> "false"))
    LogLake.clearSnapshotCache()
    val eager = spark.read.format("loglake").load(l)
    assert(index(eager).isInstanceOf[LogLakeFileIndex])
    assert(eager.orderBy("k").collect().toSeq ==
      lf.orderBy("k").collect().toSeq)
  }

  test("bucketed distributed MERGE bounds discovery to the keys' buckets") {
    val dir = buildBucketed(520)
    LogLake.clearSnapshotCache()
    val before = LogLake.snapshotAssembles.get()
    // one updated key + one insert outside every envelope: candidate
    // discovery rides the skipping job with the bucket-id keep
    LogLake.merge(spark, dir,
      Seq((7L, "upd"), (99999L, "ins")).toDF("k", "v"), Seq("k"))
    assert(LogLake.snapshotAssembles.get() == before,
      "bucketed distributed merge discovery must not assemble state")
    LogLake.clearSnapshotCache()
    val after = LogLake.snapshot(spark, dir)
    assert(after.filter(col("v") === "upd").count() == 1L)
    assert(after.filter(col("k") === 99999L).count() == 1L)
    assert(after.count() == 521L)
    // the merge's rewrite kept every file tagged (layout preserved)
    assert(LogLake.allBucketTagged(LogLake.activeState(dir)._1))
  }

  test("a foreign untagged file degrades the bucketed lazy plan to an unbucketed scan") {
    // ADVICE r15: the lazy path used to hand the planner a BucketSpec
    // unconditionally — one untagged active file (foreign manifest)
    // made every read FAIL loudly under distributed planning while the
    // eager path degraded gracefully. Round 16: the parts' policy
    // footers + the manifest tail prove all-tagged; when they can't,
    // the lazy relation drops the spec and stays READABLE, mirroring
    // the eager degrade. Simulated foreign writer: rename one
    // tail-add's data file to an untagged name and patch its manifest.
    val dir = buildBucketed(520) // checkpoint at v10, tail beyond it
    LogLake.append(spark, dir,
      Seq((9001L, "foreign")).toDF("k", "v").repartition(1))
    // tamper: the latest manifest's single add loses its bucket tag
    val log = new java.io.File(dir, "_loglake")
    val numbered = """(\d+)\.json""".r
    val manifest = log.listFiles().flatMap(f => f.getName match {
      case numbered(v) => Some(v.toLong -> f)
      case _ => None
    }).maxBy(_._1)._2
    val body = new String(Files.readAllBytes(manifest.toPath), "UTF-8")
    val tagged = """data/[0-9a-f-]+_(\d+)\.parquet""".r
    val hit = tagged.findFirstIn(body).getOrElse(
      fail(s"no tagged add in ${manifest.getName}"))
    val foreign = hit.replaceAll("""_(\d+)\.parquet$""", ".foreign.parquet")
    assert(new java.io.File(dir, hit).renameTo(new java.io.File(dir, foreign)))
    Files.write(manifest.toPath, body.replace(hit, foreign).getBytes("UTF-8"))
    // the local FS checksums sidecar .crc files — drop the stale ones
    // (a real foreign writer brings its own object store)
    new java.io.File(log, s".${manifest.getName}.crc").delete()
    LogLake.clearSnapshotCache()
    // the read STAYS lazy and STAYS readable — just unbucketed
    val df = spark.read.format("loglake").load(dir)
    assert(index(df).isInstanceOf[LazyLogLakeFileIndex],
      "the untagged file must not knock the table off the lazy plan")
    val scan = df.queryExecution.sparkPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    assert(scan.relation.bucketSpec.isEmpty,
      "an untagged active file must drop the BucketSpec (foreign writer)")
    assert(df.count() == 521L, "the degraded scan must still serve every row")
    assert(df.filter(col("k") === 9001L).count() == 1L)
  }

  test("a legacy pre-policy-footer part keeps the BucketSpec via the name-scan fallback") {
    // ADVICE r16: a checkpoint written before the policy footer existed
    // answers readUntagged with None — treating that as untrusted
    // silently dropped bucket-id pruning for every existing bucketed
    // table until its next checkpoint rewrite. The fallback streams
    // that part's file NAMES once instead.
    val dir = try {
      graft.sources.CheckpointParquet.writePolicyFooter = false
      buildBucketed(520)
    } finally graft.sources.CheckpointParquet.writePolicyFooter = true
    LogLake.clearSnapshotCache()
    val df = spark.read.format("loglake").load(dir)
    assert(index(df).isInstanceOf[LazyLogLakeFileIndex],
      "a legacy part must not knock the table off the lazy plan")
    val scan = df.queryExecution.sparkPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    assert(scan.relation.bucketSpec.nonEmpty,
      "all-tagged legacy parts must keep the BucketSpec through the " +
        "name-scan fallback, not silently degrade")
    assert(df.count() == 520L)
  }

  test("default posture (no property): auto-lazy above the checkpoint-size threshold") {
    // VERDICT r15 #3: a naive user's huge table must not plan eagerly
    // just because nobody discovered loglake.planning.distributed. The
    // explicit property still wins both ways.
    val dir = tmp("auto")
    LogLake.createEmpty(dir, Seq((1L, "x")).toDF("k", "v").schema)
    LogLake.setTableProperties(dir, Map(
      "loglake.checkpoint.format" -> "parquet",
      "loglake.checkpoint.partSizeFiles" -> "4"))
    (0 until 12).foreach(i =>
      LogLake.append(spark, dir,
        Seq((i * 10L, s"a$i")).toDF("k", "v").repartition(1)))
    // small table, no property: below the 64 MiB default → eager
    LogLake.clearSnapshotCache()
    assert(index(spark.read.format("loglake").load(dir))
      .isInstanceOf[LogLakeFileIndex],
      "a small table with no property must keep the eager index")
    // same table "at scale": the threshold property models a checkpoint
    // past the auto mark — the read plans lazily with NO
    // planning.distributed property set, and DESCRIBE DETAIL says so
    LogLake.setTableProperties(dir,
      Map("loglake.planning.autoMinCheckpointBytes" -> "1"))
    LogLake.clearSnapshotCache()
    val before = LogLake.snapshotAssembles.get()
    val df = spark.read.format("loglake").load(dir)
    assert(index(df).isInstanceOf[LazyLogLakeFileIndex],
      "above the threshold with no property, planning must go lazy")
    assert(df.count() == 12L)
    assert(LogLake.snapshotAssembles.get() == before)
    LogLake.clearSnapshotCache()
    assert(LogLake.detailDf(spark, dir).head().getAs[String]("lazyPlan")
      == "eligible", "DESCRIBE DETAIL must surface auto-eligibility")
    // explicit false overrides auto-on
    LogLake.setTableProperties(dir,
      Map("loglake.planning.distributed" -> "false"))
    LogLake.clearSnapshotCache()
    assert(index(spark.read.format("loglake").load(dir))
      .isInstanceOf[LogLakeFileIndex],
      "explicit false must win over the auto threshold")
  }

  test("a pre-parquet table auto-migrates at its next checkpoint and goes lazy") {
    // simulate a pre-round-13 table: json checkpoint bodies on disk,
    // NO format property — flipping on distributed planning alone must
    // unlock the lazy plan at the next checkpoint (round 15: the body
    // format defaults to parquet under the distributed posture)
    val dir = tmp("mig")
    LogLake.createEmpty(dir, Seq((1L, "x")).toDF("k", "v").schema)
    (0 until 11).foreach(i => // v2..v12 — a JSON checkpoint at v10
      LogLake.append(spark, dir, Seq((i.toLong, s"v$i")).toDF("k", "v")
        .repartition(1)))
    assert(new java.io.File(dir, "_loglake").listFiles()
      .exists(_.getName == f"chk-${10L}%020d.json"),
      "fixture must hold a pre-migration json checkpoint")
    LogLake.setTableProperties(dir,
      Map("loglake.planning.distributed" -> "true"))
    // before the next checkpoint: still eager (json body, no footers)
    LogLake.clearSnapshotCache()
    assert(index(spark.read.format("loglake").load(dir))
      .isInstanceOf[LogLakeFileIndex])
    // commits up to the next checkpoint cadence (v20)
    (11 until 19).foreach(i =>
      LogLake.append(spark, dir, Seq((i.toLong, s"v$i")).toDF("k", "v")
        .repartition(1)))
    assert(new java.io.File(dir, "_loglake").listFiles()
      .exists(_.getName == f"chk-${20L}%020d.parquet"),
      "the first post-upgrade checkpoint must be parquet")
    LogLake.clearSnapshotCache()
    val before = LogLake.snapshotAssembles.get()
    val df = spark.read.format("loglake").load(dir)
    assert(index(df).isInstanceOf[LazyLogLakeFileIndex],
      "the parquet checkpoint must unlock the lazy plan")
    assert(df.count() == 19L)
    assert(LogLake.snapshotAssembles.get() == before)
  }
}
