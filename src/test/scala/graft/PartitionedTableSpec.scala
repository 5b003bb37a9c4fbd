package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.LogLake

/** Identity partition columns on loglake tables (the Iceberg identity /
  * Delta partitionColumns design): the partition tuple is recorded per
  * file in the manifest AND the columns stay in the data files, so
  * every read path is unchanged; pruning rides the auto-recorded
  * identity stats; a partition-predicate DELETE drops whole files
  * metadata-only. */
class PartitionedTableSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"llpart-$name").toString + "/t"

  private def rows(df: DataFrame): Seq[(Long, String, String)] =
    df.select("k", "status", "v").as[(Long, String, String)].collect().toSeq.sorted

  private def sample(n: Int): DataFrame =
    (1 to n).map(i => (i.toLong, if (i % 3 == 0) "C" else if (i % 2 == 0) "B" else "A",
      s"v$i")).toDF("k", "status", "v")

  test("create with partitionBy: one file per partition value, tuple in the manifest, columns still in the data files") {
    val dir = tmp("basic")
    LogLake.create(spark, dir, sample(30), partitionBy = Seq("status"))
    assert(LogLake.partitionColumns(dir) == Seq("status"))
    val (files, _) = LogLake.activeState(dir)
    assert(files.size == 3, s"one file per partition value, got ${files.size}")
    assert(files.map(_.partitionValues("status")).sorted == Seq("A", "B", "C"))
    // identity stats were auto-recorded (min = max = the tuple value)
    files.foreach { a =>
      val s = a.stats("status")
      assert(s.min == s.max && s.min == a.partitionValues("status"))
    }
    // the partition column is IN the data files — full rows read back
    assert(rows(LogLake.snapshot(spark, dir)) == rows(sample(30)))
  }

  test("appends re-cluster by the spec; partition-filtered native reads prune files") {
    val dir = tmp("prune")
    LogLake.create(spark, dir, sample(20), partitionBy = Seq("status"))
    LogLake.append(spark, dir, sample(40).filter(col("k") > 20))
    val (files, _) = LogLake.activeState(dir)
    assert(files.size == 6 && files.forall(_.partitionValues.contains("status")))
    val q = spark.read.format("loglake").load(dir).filter(col("status") === "C")
    // execute THIS frame's plan so its scan metrics populate
    assert(q.collect().length == 13)
    val scan = q.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    assert(scan.metrics("numFiles").value == 2L,
      s"expected the two status=C files, got ${scan.metrics("numFiles").value}")
  }

  test("partition-predicate DELETE is metadata-only: whole files drop, no data read or written") {
    val dir = tmp("del")
    LogLake.create(spark, dir, sample(30), partitionBy = Seq("status"))
    val before = LogLake.activeState(dir)._1.map(_.path).toSet
    val v = LogLake.delete(spark, dir, col("status") === "B")
    assert(v == 2L)
    val after = LogLake.activeState(dir)._1
    // no rewrite: surviving files are the ORIGINAL files, nothing new
    assert(after.map(_.path).toSet.subsetOf(before))
    assert(after.size == 2 && after.forall(_.partitionValues("status") != "B"))
    assert(rows(LogLake.snapshot(spark, dir)) ==
      rows(sample(30).filter(col("status") =!= "B")))
    // IN-list predicates ride the same path
    LogLake.delete(spark, dir, col("status").isin("C", "Z"))
    val after2 = LogLake.activeState(dir)._1
    assert(after2.map(_.path).toSet.subsetOf(before) && after2.size == 1)
    // a non-partition predicate still takes the rewrite path, correctly
    LogLake.delete(spark, dir, col("k") <= 5L)
    assert(rows(LogLake.snapshot(spark, dir)) ==
      rows(sample(30).filter(col("status") === "A" && col("k") > 5)))
  }

  test("partition DELETE reads zero data bytes (the metadata-only PROOF)") {
    // the file-accounting test above is satisfiable by an accidental
    // empty-rewrite too (all touched rows match ⇒ no new files); this
    // pins the real invariant: the fast path never opens a data file.
    // Regression guard for the lazy-ColumnNodeExpression classifier bug
    // (tree inspection on the unconverted wrapper saw no attributes and
    // silently routed every Column-API partition delete to the rewrite).
    val dir = tmp("delproof")
    LogLake.create(spark, dir, sample(30), partitionBy = Seq("status"))
    val bytesRead = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          bytesRead.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      LogLake.delete(spark, dir, col("status") === "B")
      Thread.sleep(2000) // listener events drain asynchronously
      assert(bytesRead.get() == 0L,
        s"partition delete read ${bytesRead.get()} bytes — not metadata-only")
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(rows(LogLake.snapshot(spark, dir)) ==
      rows(sample(30).filter(col("status") =!= "B")))
  }

  test("partitionsDf inventories live tuples with file/row/byte counts, metadata-only") {
    val dir = tmp("inv")
    LogLake.create(spark, dir, sample(30), partitionBy = Seq("status"))
    LogLake.append(spark, dir, sample(30).filter(col("status") === "A"))
    val inv = LogLake.partitionsDf(spark, dir)
      .select("status", "num_files", "num_rows")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    val expected = sample(30).groupBy("status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(inv.map(_._1) == inv.map(_._1).distinct) // one row per tuple
    inv.foreach { case (s, nf, nr) =>
      val base = expected(s)
      assert(nr == (if (s == "A") base * 2 else base))
      assert(nf == (if (s == "A") 2L else 1L))
    }
    intercept[IllegalArgumentException] {
      LogLake.partitionsDf(spark, tmp("notpart")) // unpartitioned/missing
    }
  }

  test("null partition values round-trip and NULL never matches a delete predicate") {
    val dir = tmp("nulls")
    val df = Seq((1L, "A", "x"), (2L, null, "y"), (3L, "B", "z"), (4L, null, "w"))
      .toDF("k", "status", "v")
    LogLake.create(spark, dir, df, partitionBy = Seq("status"))
    val (files, _) = LogLake.activeState(dir)
    assert(files.size == 3)
    assert(files.count(_.partitionValues("status") ==
      LogLake.NullPartitionValue) == 1)
    assert(LogLake.snapshot(spark, dir).filter(col("status").isNull).count() == 2L)
    // status <> 'A' is NULL for null rows → they survive, as in SQL
    LogLake.delete(spark, dir, col("status") =!= "A")
    assert(LogLake.snapshot(spark, dir).select("k").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L, 4L))
    // the null partition drops only via an explicit IS NULL
    LogLake.delete(spark, dir, col("status").isNull)
    assert(LogLake.snapshot(spark, dir).select("k").as[Long].collect().toSeq ==
      Seq(1L))
  }

  test("escaped partition values (slash, equals, percent, space) round-trip the path encoding") {
    val dir = tmp("esc")
    val vals = Seq("a/b", "x=y", "100%", "two words", "plain")
    val df = vals.zipWithIndex.map { case (s, i) => (i.toLong, s, "p") }
      .toDF("k", "status", "v")
    LogLake.create(spark, dir, df, partitionBy = Seq("status"))
    val (files, _) = LogLake.activeState(dir)
    assert(files.map(_.partitionValues("status")).sorted == vals.sorted)
    LogLake.delete(spark, dir, col("status") === "a/b")
    assert(LogLake.snapshot(spark, dir).filter(col("status") === "a/b").count() == 0L)
    assert(LogLake.snapshot(spark, dir).count() == 4L)
  }

  test("merge and update rewrites preserve the partition layout; optimize compacts per partition") {
    val dir = tmp("rewr")
    LogLake.create(spark, dir, sample(30), partitionBy = Seq("status"))
    LogLake.append(spark, dir, sample(60).filter(col("k") > 30))
    // copy-on-write update touches only matched files and re-clusters
    LogLake.update(spark, dir, col("k") % 10 === 0, Map("v" -> lit("X")))
    val files = LogLake.activeState(dir)._1
    assert(files.forall(_.partitionValues.contains("status")))
    assert(LogLake.snapshot(spark, dir).filter(col("v") === "X").count() == 6L)
    LogLake.optimize(spark, dir, numFiles = 1)
    val compacted = LogLake.activeState(dir)._1
    assert(compacted.size == 3,
      s"optimize on a partitioned table compacts to one file per partition, got ${compacted.size}")
    assert(compacted.map(_.partitionValues("status")).sorted == Seq("A", "B", "C"))
    assert(rows(LogLake.snapshot(spark, dir)) ==
      rows(sample(60).withColumn("v",
        when(col("k") % 10 === 0, "X").otherwise(col("v")))))
  }

  test("partition spec survives clone; drop of a partition column is rejected; rename keeps the spec working") {
    val dir = tmp("ddl"); val cl = tmp("ddl-clone")
    LogLake.create(spark, dir, sample(12), partitionBy = Seq("status"))
    LogLake.cloneShallow(spark, dir, cl)
    assert(LogLake.partitionColumns(cl) == Seq("status"))
    LogLake.append(spark, cl, sample(24).filter(col("k") > 12))
    assert(LogLake.activeState(cl)._1.forall(_.partitionValues.contains("status")))
    intercept[IllegalArgumentException] {
      LogLake.dropColumn(spark, dir, "status")
    }
    // rename: spec is keyed by PHYSICAL name — metadata DELETE still works
    LogLake.renameColumn(spark, dir, "status", "grade")
    LogLake.delete(spark, dir, col("grade") === "B")
    val files = LogLake.activeState(dir)._1
    assert(files.size == 2 && files.forall(_.partitionValues("status") != "B"))
    assert(LogLake.snapshot(spark, dir).filter(col("grade") === "B").count() == 0L)
  }

  test("replaceWhere: partition region swaps metadata-only; general region rewrites survivors; outside rows rejected") {
    val dir = tmp("rw")
    LogLake.create(spark, dir, sample(30), partitionBy = Seq("status"))
    val before = LogLake.activeState(dir)._1.map(_.path).toSet

    // partition region: old B files DROP (no rewrite of other files)
    val newB = sample(30).filter(col("status") === "B")
      .withColumn("v", lit("nb"))
    LogLake.overwriteWhere(spark, dir, newB, col("status") === "B")
    val after = LogLake.activeState(dir)._1
    assert(after.count(a => before(a.path)) == 2,
      "A and C files must carry over untouched")
    assert(rows(LogLake.snapshot(spark, dir)) ==
      rows(sample(30).withColumn("v",
        when(col("status") === "B", "nb").otherwise(col("v")))))

    // a row OUTSIDE the region aborts before anything commits
    val vBefore = LogLake.currentVersion(dir)
    intercept[IllegalArgumentException] {
      LogLake.overwriteWhere(spark, dir,
        sample(30).filter(col("status") =!= "B"), col("status") === "B")
    }
    assert(LogLake.currentVersion(dir) == vBefore)

    // general (non-partition) region: keyed slice replaces, others survive
    LogLake.overwriteWhere(spark, dir,
      sample(30).filter(col("k") <= 10).withColumn("v", lit("lo")),
      col("k") <= 10)
    assert(rows(LogLake.snapshot(spark, dir)) ==
      rows(sample(30).withColumn("v",
        when(col("k") <= 10, "lo")
          .when(col("status") === "B", "nb").otherwise(col("v")))))

    // provider surface: mode overwrite + option("replaceWhere", ...)
    sample(30).filter(col("status") === "C").withColumn("v", lit("pc"))
      .write.format("loglake").mode("overwrite")
      .option("replaceWhere", "status = 'C'").save(dir)
    assert(spark.read.format("loglake").load(dir)
      .filter(col("v") === "pc").count() == 10L)
    assert(spark.read.format("loglake").load(dir).count() == 30L)
  }

  test("SQL: CREATE TABLE PARTITIONED BY + INSERT through the catalog; DESCRIBE shows the transform") {
    val wh = Files.createTempDirectory("llpart-sql").toString
    spark.conf.set("spark.sql.catalog.llp", "graft.sources.LogLakeCatalog")
    spark.conf.set("spark.sql.catalog.llp.warehouse", wh)
    try {
      spark.sql("CREATE TABLE llp.ns.t (k BIGINT, status STRING, v STRING) " +
        "PARTITIONED BY (status)")
      assert(LogLake.partitionColumns(s"$wh/ns/t") == Seq("status"))
      sample(20).createOrReplaceTempView("llp_src")
      spark.sql("INSERT INTO llp.ns.t SELECT k, status, v FROM llp_src")
      val files = LogLake.activeState(s"$wh/ns/t")._1
      assert(files.size == 3 && files.forall(_.partitionValues.contains("status")))
      assert(spark.sql("SELECT COUNT(*) FROM llp.ns.t WHERE status = 'C'")
        .head().getLong(0) == 6L)
      val desc = spark.sql("DESCRIBE TABLE EXTENDED llp.ns.t")
        .collect().map(_.mkString(" ")).mkString("\n")
      assert(desc.contains("status"), s"DESCRIBE should surface partitioning:\n$desc")
      intercept[UnsupportedOperationException] {
        spark.sql("CREATE TABLE llp.ns.bad (k BIGINT, ts TIMESTAMP) " +
          "PARTITIONED BY (days(ts))")
      }
    } finally {
      spark.conf.unset("spark.sql.catalog.llp")
      spark.conf.unset("spark.sql.catalog.llp.warehouse")
    }
  }

  test("partitionBy rejects non-roundtripping types, unknown and duplicate columns, and existing tables") {
    val dir = tmp("rej")
    val df = Seq((1L, 0.5, "a")).toDF("k", "score", "v")
    intercept[IllegalArgumentException] {
      LogLake.create(spark, dir, df, partitionBy = Seq("score")) // double
    }
    intercept[IllegalArgumentException] {
      LogLake.create(spark, dir, df, partitionBy = Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      LogLake.create(spark, dir, df, partitionBy = Seq("v", "v"))
    }
    LogLake.create(spark, dir, sample(6), partitionBy = Seq("status"))
    intercept[IllegalArgumentException] {
      LogLake.create(spark, tmp("rej2"), sample(6)) // fine — then re-create partitioned on the SAME dir
      LogLake.create(spark, dir, sample(6), partitionBy = Seq("status"))
    }
    // streaming sink appends inherit the spec too (exactly-once path)
    val chk = Files.createTempDirectory("llpart-chk").toString
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)]
    src.addData((100L, "A", "s1"), (101L, "B", "s2"))
    val q = LogLake.streamAppend(
      src.toDF().toDF("k", "status", "v"), dir, chk)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val files = LogLake.activeState(dir)._1
    assert(files.forall(_.partitionValues.contains("status")))
    assert(LogLake.snapshot(spark, dir).count() == 8L)
  }
}
