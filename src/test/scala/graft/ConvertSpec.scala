package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.LogLake

/** CONVERT TO LOGLAKE (Delta's CONVERT TO DELTA): adopt an existing
  * flat parquet directory in place — zero bytes rewritten, stats
  * collected in one pass, files retired by later rewrites reclaimed by
  * vacuum like any generation. */
class ConvertSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"convert-$name").toString + "/t"

  private def fsOf(dir: String) = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI("file:///"), spark.sessionState.newHadoopConf())

  test("convert adopts files in place: same names, same bytes, stats from v1") {
    val dir = tmp("adopt")
    Seq(1L -> "a", 2L -> "b", 3L -> "c").toDF("k", "v")
      .repartition(2).write.parquet(dir)
    val f = fsOf(dir)
    val before = f.listStatus(new Path(dir)).filter(_.isFile)
      .map(s => s.getPath.getName -> s.getModificationTime).toMap

    assert(LogLake.convert(spark, dir, statsCols = Seq("k")) == 1L)

    // zero rewrite: every original file still there, untouched
    before.foreach { case (n, mtime) =>
      assert(f.exists(new Path(dir, n)))
      assert(f.getFileStatus(new Path(dir, n)).getModificationTime == mtime)
    }
    assert(LogLake.snapshot(spark, dir).select("k", "v").as[(Long, String)]
      .collect().toSeq.sorted == Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    // stats landed: manifest carries k bounds for every non-empty file
    val m = LogLake.history(dir).head
    assert(m.op == "convert")
    assert(m.adds.filter(_.rows > 0).forall(_.stats.contains("k")))
    // and the table behaves like any loglake table from here
    LogLake.append(spark, dir, Seq(9L -> "z").toDF("k", "v"))
    assert(LogLake.snapshot(spark, dir).count() == 4L)
  }

  test("rewrites retire converted originals; vacuum reclaims them from the root") {
    val dir = tmp("retire")
    Seq(1L -> "a", 2L -> "b").toDF("k", "v").coalesce(1).write.parquet(dir)
    LogLake.convert(spark, dir)
    val f = fsOf(dir)
    val original = LogLake.history(dir).head.adds.head.path
    assert(!original.contains("/")) // root-level name
    LogLake.optimize(spark, dir, 1) // rewrite into data/
    assert(f.exists(new Path(dir, original))) // orphaned, not yet reclaimed
    val swept = LogLake.vacuum(dir, olderThanMs = -1000L)
    assert(swept.contains(original))
    assert(!f.exists(new Path(dir, original)))
    assert(LogLake.snapshot(spark, dir).count() == 2L)
  }

  test("SQL: CONVERT TO LOGLAKE parquet.`path` and quoted-path forms") {
    val dir = tmp("sql")
    Seq(1L -> "a").toDF("k", "v").write.parquet(dir)
    val row = spark.sql(s"CONVERT TO LOGLAKE parquet.`$dir`").collect().head
    assert(row.getAs[Long]("version") == 1L)
    assert(spark.sql(s"DESCRIBE HISTORY '$dir'")
      .select("operation").as[String].head() == "convert")
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"CONVERT TO LOGLAKE '$dir'")
    }
    assert(e.getMessage.contains("already a loglake table"))
  }

  test("Hive-partitioned layouts and double conversion fail loudly") {
    val dir = tmp("hive")
    Seq((1L, "a", "x"), (2L, "b", "y")).toDF("k", "v", "p")
      .write.partitionBy("p").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      LogLake.convert(spark, dir)
    }
    assert(e.getMessage.contains("flat parquet directory"))
  }
}
