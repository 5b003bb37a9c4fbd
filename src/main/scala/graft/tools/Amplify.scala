package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

/** Corpus amplifier for the scaling-curve harness (VERDICT r4 #3): derive
  * a `factor`× larger corpus FROM the driver's sf0.1 testdata so the
  * similarity-family curve gets a third decade without synthesizing new
  * distributions.
  *
  * Construction is chosen so the MEASUREMENT stays honest:
  *  - documents: replica r suffixes every word with r, so every shingle
  *    differs across replicas — replicas of one doc are NOT near-dups of
  *    each other (naive duplication would manufacture O(factor²)
  *    candidate pairs per doc, a quadratic blowup the real corpus does
  *    not have). Within each replica the near-dup structure of sf0.1 is
  *    preserved verbatim, so the corpus is `factor` independent sf0.1's:
  *    10× the data, the same pair density per doc.
  *  - embeddings: replica r rotates the component vector by 7·r
  *    positions — norm-preserving, and a rotated copy decorrelates from
  *    its source, so replicas spread across LSH buckets instead of
  *    piling into one (same reasoning as above, vector-space version).
  *
  * Other tables are copied as-is (the curve queries only read
  * documents/embeddings; Bench's warmup query reads lineitem).
  *
  * Usage: `sbt "runMain graft.tools.Amplify /root/testdata/sf0.1 /tmp/sfx1 10"`
  */
object Amplify {

  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args.take(3)
    val factor = factorS.toInt
    val spark = graft.Sessions.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(out))
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events"))
      Files.copy(Paths.get(s"$src/$t.parquet"), Paths.get(s"$out/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)

    val docs = spark.read.parquet(s"$src/documents.parquet")
    (0 until factor).map { r =>
      val text =
        if (r == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", "$1" + r.toString)
      docs.select(
        (col("doc_id") + lit(r * 10000000L)).as("doc_id"),
        text.as("text"), col("lang"), col("source"))
    }.reduce(_ unionByName _)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    (0 until factor).map { r =>
      val k = (7 * r) % 64
      val rot =
        if (k == 0) col("embedding")
        else concat(slice(col("embedding"), k + 1, 64 - k),
          slice(col("embedding"), 1, k))
      emb.select(
        (col("vec_id") + lit(r * 10000000L)).as("vec_id"),
        rot.as("embedding"), col("label"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // lineitem too (r18, VERDICT r17 #2 — the parallel-scaling probe
    // solo-benches the q96 rank kernel on amplified data): replica r
    // offsets the order key so per-order structure is preserved and
    // the key space stays disjoint; value columns are copied verbatim,
    // which is harmless here (no pair-quadratic structure to distort —
    // the rank kernel's cost is rows × log(rows), not pair density).
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    (0 until factor).map { r =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(r * 100000000L))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    val (nd, ne, nl) = (spark.read.parquet(s"$out/documents.parquet").count(),
      spark.read.parquet(s"$out/embeddings.parquet").count(),
      spark.read.parquet(s"$out/lineitem.parquet").count())
    println(s"[amplify] $out: $nd docs, $ne embeddings, $nl lineitem (${factor}x $src)")
    spark.stop()
  }
}
