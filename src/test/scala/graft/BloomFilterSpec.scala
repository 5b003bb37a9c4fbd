package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.LogLake

/** Parquet bloom-filter indexes (`loglake.bloomFilter.columns`): the
  * staged files of a configured table carry a native parquet bloom
  * per row group, so pushed point predicates skip row groups min/max
  * stats cannot (a needle id inside every file's value range). Footer
  * inspection proves the blooms exist; reads stay correct. */
class BloomFilterSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"bloom-$name").toString + "/t"

  private def kv(n: Int): DataFrame =
    spark.range(n).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v")).coalesce(1)

  /** bloom offsets per column of the table's first data file */
  private def bloomOffsets(dir: String): Map[String, Long] = {
    val file = LogLake.activeState(dir)._1.head.path
    val in = HadoopInputFile.fromPath(
      new Path(s"$dir/$file"), new Configuration())
    val r = ParquetFileReader.open(in)
    try {
      r.getFooter.getBlocks.get(0).getColumns.asScala
        .map(c => c.getPath.toDotString -> c.getBloomFilterOffset).toMap
    } finally r.close()
  }
  private implicit class ListAsScala[A](l: java.util.List[A]) {
    def asScala: Seq[A] = {
      val b = Seq.newBuilder[A]
      l.forEach(a => b += a)
      b.result()
    }
  }

  test("configured columns carry a bloom filter; others and unconfigured tables do not") {
    val dir = tmp("on")
    LogLake.createEmpty(dir, kv(1).schema)
    LogLake.setTableProperties(dir, Map(
      "loglake.bloomFilter.columns" -> "k",
      "loglake.bloomFilter.ndv.k" -> "1000"))
    LogLake.append(spark, dir, kv(1000))
    val offs = bloomOffsets(dir)
    assert(offs("k") >= 0L, s"k should carry a bloom, got $offs")
    assert(offs("v") < 0L, s"v is unconfigured, got $offs")

    val plain = tmp("off")
    LogLake.create(spark, plain, kv(100))
    assert(bloomOffsets(plain).values.forall(_ < 0L),
      "no property, no blooms")
  }

  test("blooms survive column mapping (physical names) and point lookups stay exact") {
    val dir = tmp("mapped")
    LogLake.createEmpty(dir, kv(1).schema)
    LogLake.setTableProperties(dir, Map(
      "loglake.bloomFilter.columns" -> "k"))
    LogLake.append(spark, dir, kv(500))
    // rename k -> key: the property keeps naming the LOGICAL column,
    // later files bloom the stable PHYSICAL name underneath
    LogLake.renameColumn(spark, dir, "k", "key")
    LogLake.setTableProperties(dir, Map(
      "loglake.bloomFilter.columns" -> "key"))
    LogLake.append(spark, dir,
      spark.range(1000, 1500).select(col("id").as("key"),
        concat(lit("v"), col("id")).as("v")).coalesce(1))
    val files = LogLake.activeState(dir)._1
    val newest = files.last.path
    val in = HadoopInputFile.fromPath(
      new Path(s"$dir/$newest"), new Configuration())
    val r = ParquetFileReader.open(in)
    val offs =
      try r.getFooter.getBlocks.get(0).getColumns.asScala
        .map(c => c.getPath.toDotString -> c.getBloomFilterOffset).toMap
      finally r.close()
    // the mapped file stores the key under its stable PHYSICAL name
    // (the one chunk that is not the untouched "v")
    val physKey = offs.keys.filterNot(_ == "v")
    assert(physKey.nonEmpty && !offs.contains("key"),
      s"expected a mapped physical chunk, got ${offs.keys}")
    assert(physKey.forall(offs(_) >= 0L),
      s"renamed column's physical chunk should carry a bloom: $offs")
    val hits = spark.read.format("loglake").load(dir)
      .filter(col("key") === 123L).select("key", "v")
      .as[(Long, String)].collect().toSeq
    assert(hits == Seq((123L, "v123")))
    val misses = spark.read.format("loglake").load(dir)
      .filter(col("key") === 123456L).count()
    assert(misses == 0L)
  }
}
