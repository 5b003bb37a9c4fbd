package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec}
import org.apache.spark.sql.functions._

import graft.sources.LogLake

/** Hash-bucketed loglake tables (Hive/Spark bucketing on the ACID
  * format): the create-time spec pins `pmod(murmur3(cols), n)` as the
  * only legal file layout, every write path conforms (append, MERGE,
  * OPTIMIZE, streaming epochs), and the native scan surfaces
  * `HashPartitioning` so joins and aggregations on the bucket keys run
  * with ZERO shuffle — at 100 TB the difference between a co-located
  * merge and re-shuffling the fact table on every query. Bucket ids
  * ride the file NAME (Spark's `_%05d` tag): the staged part index is
  * the bucket id because the pre-write `repartition(n, cols)` uses
  * exactly HashPartitioning's partition-id expression. */
class BucketedLakeSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"llbkt-$name").toString + "/t"

  private def sample(from: Int, to: Int): DataFrame =
    (from to to).map(i => (i.toLong, s"v$i", i % 5)).toDF("k", "v", "grp")

  /** Runs `f` with broadcast joins and AQE off so the exchange (or its
    * absence) is structurally visible in the executed plan. */
  private def forcedSmj[A](f: => A): A = {
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      f
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  private def assertNoShuffle(df: DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle, got:\n$plan")
  }

  test("create with bucketBy: tagged files, recorded feature, spec readable") {
    val dir = tmp("basic")
    LogLake.create(spark, dir, sample(1, 100), bucketBy = Seq("k"), numBuckets = 4)
    val spec = LogLake.bucketSpec(dir).get
    assert(spec.cols == Seq("k") && spec.n == 4 && spec.sortCols.isEmpty)
    val (files, _) = LogLake.activeState(dir)
    assert(files.nonEmpty && LogLake.allBucketTagged(files),
      s"every data file must carry a bucket tag: ${files.map(_.path)}")
    assert(LogLake.history(dir).last.features.contains("bucketing"))
    // round-trip correctness through the native bucketed scan
    assert(spark.read.format("loglake").load(dir).as[(Long, String, Int)]
      .collect().toSeq.sorted ==
      sample(1, 100).as[(Long, String, Int)].collect().toSeq.sorted)
  }

  test("bucketed x bucketed join: no shuffle exchange, same result as plain join") {
    val l = tmp("joinL"); val r = tmp("joinR")
    LogLake.create(spark, l, sample(1, 500), bucketBy = Seq("k"), numBuckets = 8)
    LogLake.create(spark, r, sample(200, 700).select(col("k"), col("v").as("w")),
      bucketBy = Seq("k"), numBuckets = 8)
    // a second append per side: multiple files per bucket must still co-locate
    LogLake.append(spark, l, sample(501, 600))
    LogLake.append(spark, r, sample(701, 800).select(col("k"), col("v").as("w")))
    forcedSmj {
      val lf = spark.read.format("loglake").load(l)
      val rf = spark.read.format("loglake").load(r)
      val j = lf.join(rf, "k")
      assertNoShuffle(j)
      val expected = sample(1, 600).join(
        sample(200, 800).select(col("k"), col("v").as("w")), "k").count()
      assert(j.count() == expected)
    }
  }

  test("groupBy on the bucket key aggregates without an exchange") {
    val dir = tmp("agg")
    LogLake.create(spark, dir, sample(1, 300), bucketBy = Seq("k"), numBuckets = 4)
    forcedSmj {
      val agg = spark.read.format("loglake").load(dir).groupBy("k").count()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucket-key aggregation must not shuffle, got:\n$plan")
      assert(agg.count() == 300)
    }
  }

  test("equality predicate prunes to one bucket's files") {
    val dir = tmp("prune")
    LogLake.create(spark, dir, sample(1, 400), bucketBy = Seq("k"), numBuckets = 8)
    // the planner auto-disables bucketed scans that remove no exchange
    // (a pure filter query) — pin it on so the bucket PRUNING shows
    val prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val q = spark.read.format("loglake").load(dir).filter(col("k") === 7L)
      assert(q.count() == 1)
      val scan = q.queryExecution.executedPlan.collectFirst {
        case s: FileSourceScanExec => s
      }.get
      assert(scan.toString.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected single-bucket scan, got:\n$scan")
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
    }
  }

  test("OPTIMIZE compacts to one file per bucket and keeps the layout; ZORDER refuses") {
    val dir = tmp("opt")
    LogLake.create(spark, dir, sample(1, 200),
      bucketBy = Seq("k"), numBuckets = 4, bucketSortBy = Seq("k"))
    LogLake.append(spark, dir, sample(201, 400))
    LogLake.append(spark, dir, sample(401, 600))
    assert(LogLake.activeState(dir)._1.size > 4)
    LogLake.optimize(spark, dir, numFiles = 1)
    val (files, _) = LogLake.activeState(dir)
    assert(files.size == 4 && LogLake.allBucketTagged(files),
      s"post-OPTIMIZE layout must be one tagged file per bucket: ${files.map(_.path)}")
    assert(spark.read.format("loglake").load(dir).count() == 600)
    val e = intercept[IllegalArgumentException] {
      LogLake.optimize(spark, dir, numFiles = 1, zorderCols = Seq("k"))
    }
    assert(e.getMessage.contains("ZORDER"))
  }

  test("sorted buckets after OPTIMIZE: SMJ with neither shuffle nor sort") {
    val l = tmp("srtL"); val r = tmp("srtR")
    for ((d, rename) <- Seq((l, false), (r, true))) {
      val df0 = sample(1, 400)
      val df = if (rename) df0.select(col("k"), col("v").as("w")) else df0
      LogLake.create(spark, d, df,
        bucketBy = Seq("k"), numBuckets = 4, bucketSortBy = Seq("k"))
      LogLake.optimize(spark, d, numFiles = 1) // one file per bucket
    }
    // bucketed-scan sort propagation is opt-in since Spark 3.0 (it
    // needs the one-file-per-bucket check at planning time)
    val prev = spark.conf
      .get("spark.sql.legacy.bucketedTableScan.outputOrdering")
    try forcedSmj {
      spark.conf
        .set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val j = spark.read.format("loglake").load(l)
        .join(spark.read.format("loglake").load(r), "k")
      assertNoShuffle(j)
      val sorts = j.queryExecution.executedPlan.collect { case s: SortExec => s }
      assert(sorts.isEmpty,
        s"sorted one-file-per-bucket sides need no SortExec:\n${j.queryExecution.executedPlan}")
      assert(j.count() == 400)
    } finally spark.conf
      .set("spark.sql.legacy.bucketedTableScan.outputOrdering", prev)
  }

  test("MERGE rewrite keeps every file bucket-tagged and the join co-located") {
    val dir = tmp("merge")
    LogLake.create(spark, dir, sample(1, 100), bucketBy = Seq("k"), numBuckets = 4)
    LogLake.merge(spark, dir,
      sample(50, 150).select(col("k"), col("v"), col("grp")), Seq("k"))
    val (files, _) = LogLake.activeState(dir)
    assert(LogLake.allBucketTagged(files),
      s"post-MERGE files must stay tagged: ${files.map(_.path)}")
    assert(spark.read.format("loglake").load(dir).count() == 150)
  }

  test("MERGE discovery is bucket-bounded: a one-key merge reads ~one bucket, not the table") {
    val dir = tmp("mergeprune")
    LogLake.create(spark, dir, sample(1, 4000), bucketBy = Seq("k"), numBuckets = 8)
    def bytesDuring(f: => Unit): Long = {
      val bytes = new java.util.concurrent.atomic.AtomicLong()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null)
            bytes.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
      }
      spark.sparkContext.addSparkListener(listener)
      try { f; Thread.sleep(2000) }
      finally spark.sparkContext.removeSparkListener(listener)
      bytes.get()
    }
    val fullScan = bytesDuring {
      spark.read.format("loglake").load(dir).agg(sum("k")).collect(); ()
    }
    val mergeRead = bytesDuring {
      LogLake.merge(spark, dir,
        Seq((7L, "updated", 0)).toDF("k", "v", "grp"), Seq("k"))
    }
    // discovery + rewrite each read ~1 of 8 buckets; without pruning
    // discovery alone reads the whole table
    assert(mergeRead < fullScan,
      s"bucket-pruned merge must read less than a full scan " +
        s"($mergeRead vs $fullScan)")
    assert(spark.read.format("loglake").load(dir)
      .filter(col("k") === 7L).select("v").head().getString(0) == "updated")
    assert(spark.read.format("loglake").load(dir).count() == 4000)
  }

  test("deep clone keeps the bucket layout") {
    val src = tmp("cloneS"); val dst = tmp("cloneD")
    LogLake.create(spark, src, sample(1, 100), bucketBy = Seq("k"), numBuckets = 4)
    LogLake.cloneDeep(spark, src, dst)
    assert(LogLake.bucketSpec(dst).exists(_.n == 4))
    assert(LogLake.allBucketTagged(LogLake.activeState(dst)._1))
    forcedSmj {
      val j = spark.read.format("loglake").load(dst)
        .join(spark.read.format("loglake").load(src).select(col("k")), "k")
      assertNoShuffle(j)
      assert(j.count() == 100)
    }
  }

  test("partitioned + bucketed: partition pruning and bucket layout compose") {
    val dir = tmp("partbkt")
    LogLake.create(spark, dir,
      (1 to 300).map(i => (i.toLong, s"v$i", if (i % 2 == 0) "E" else "O"))
        .toDF("k", "v", "par"),
      partitionBy = Seq("par"), bucketBy = Seq("k"), numBuckets = 4)
    val (files, _) = LogLake.activeState(dir)
    assert(files.forall(_.partitionValues.contains("par")))
    assert(LogLake.allBucketTagged(files))
    val q = spark.read.format("loglake").load(dir).filter(col("par") === "E")
    assert(q.count() == 150)
  }

  test("SQL DDL: CLUSTERED BY ... SORTED BY ... INTO n BUCKETS via the catalog") {
    val db = s"bktsql${System.nanoTime() % 100000}"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS loglake.$db")
    spark.sql(s"CREATE TABLE loglake.$db.bt (k BIGINT, v STRING) USING loglake " +
      "CLUSTERED BY (k) SORTED BY (k) INTO 4 BUCKETS")
    spark.sql(s"INSERT INTO loglake.$db.bt SELECT id, CAST(id AS STRING) " +
      "FROM range(0, 100)")
    val warehouse = spark.conf.get("spark.sql.catalog.loglake.warehouse")
    val dir = s"$warehouse/$db/bt"
    val spec = LogLake.bucketSpec(dir).get
    assert(spec.cols == Seq("k") && spec.n == 4 && spec.sortCols == Seq("k"))
    assert(LogLake.allBucketTagged(LogLake.activeState(dir)._1))
    assert(spark.sql(s"SELECT count(*) FROM loglake.$db.bt").head().getLong(0) == 100)
    // DESCRIBE DETAIL surfaces the layout and the protocol features
    val det = spark.sql(s"DESCRIBE DETAIL loglake.$db.bt").collect().head
    assert(det.getAs[scala.collection.Seq[String]]("clusteringColumns")
      .toSeq == Seq("k"))
    assert(det.getAs[Long]("numBuckets") == 4L)
    assert(det.getAs[scala.collection.Seq[String]]("tableFeatures")
      .contains("bucketing"))
    // SHOW CREATE TABLE renders the SORTED layout (a plain bucket()
    // would silently drop SORTED BY on a DDL round-trip)
    val ddl = spark.sql(s"SHOW CREATE TABLE loglake.$db.bt")
      .head().getString(0)
    assert(ddl.contains("sorted_bucket") || ddl.contains("SORTED BY"),
      s"sorted bucket layout missing from SHOW CREATE TABLE:\n$ddl")
    spark.sql(s"DROP TABLE loglake.$db.bt")
    spark.sql(s"DROP NAMESPACE loglake.$db")
  }

  test("guards: create-only, disjoint from partition columns, bucket count bounds") {
    val dir = tmp("guard")
    LogLake.create(spark, dir, sample(1, 10))
    intercept[IllegalArgumentException] {
      LogLake.create(spark, dir, sample(1, 10), bucketBy = Seq("k"), numBuckets = 4)
    }
    val dir2 = tmp("guard2")
    val e = intercept[IllegalArgumentException] {
      LogLake.create(spark, dir2,
        sample(1, 10).withColumn("par", lit("x")),
        partitionBy = Seq("par"), bucketBy = Seq("par"), numBuckets = 4)
    }
    assert(e.getMessage.contains("partition column"))
    intercept[IllegalArgumentException] {
      LogLake.create(spark, tmp("guard3"), sample(1, 10),
        bucketBy = Seq("k"), numBuckets = 0)
    }
    // dropping a bucket-spec column would make the table unwritable
    // (every write re-buckets on it) — refused; RENAME is fine (the
    // spec stores rename-stable physical names)
    val dir4 = tmp("guard4")
    LogLake.create(spark, dir4, sample(1, 10), bucketBy = Seq("k"), numBuckets = 2)
    assert(intercept[IllegalArgumentException] {
      LogLake.dropColumn(spark, dir4, "k")
    }.getMessage.contains("bucket spec"))
    LogLake.renameColumn(spark, dir4, "k", "key")
    LogLake.append(spark, dir4,
      sample(11, 20).withColumnRenamed("k", "key"))
    assert(spark.read.format("loglake").load(dir4).count() == 20)
  }
}
