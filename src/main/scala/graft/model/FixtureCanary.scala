package graft.model

import org.apache.spark.sql.SparkSession

/** Standing guard against harness fixture drift.
  *
  * The driver regenerates `/root/testdata/sf*` between rounds and has
  * already changed a physical type once (`events.ts`
  * TIMESTAMP(NANOS) → TIMESTAMP(MICROS)), which silently broke every
  * events-reading query at analysis time. This canary pins the RESOLVED
  * Spark type of every column the query registry reads (under the
  * `graft.Sessions` config — nanosAsLong, UTC) and reports any deviation
  * as a named, greppable message. It runs in two places:
  *
  *  - `FixtureCanarySpec`: one red test per drifted table, at all SFs;
  *  - `graft.Verify` preflight: `[canary] FIXTURE DRIFT …` on stderr
  *    before any query runs, so a driver log shows the root cause on
  *    line one instead of 20+ opaque DATATYPE_MISMATCH failures.
  *
  * Types are compared by `catalogString` (nullability-blind — parquet
  * footers don't round-trip ArrayType.containsNull reliably). Timestamp
  * columns accept every encoding the harness has ever shipped; the table
  * loaders in [[Tables]] normalize them (see `Tables.events`).
  */
object FixtureCanary {
  /** Timestamp encodings seen from the harness so far: TIMESTAMP(MICROS)
    * without UTC adjustment resolves as timestamp_ntz (inferTimestampNTZ
    * default-on in Spark 4), with adjustment as timestamp.
    */
  private val AnyTimestamp = Set("timestamp", "timestamp_ntz")

  /** events.ts additionally resolves as bigint when the file is
    * TIMESTAMP(NANOS) and `spark.sql.legacy.parquet.nanosAsLong=true`.
    */
  private val EventsTs = AnyTimestamp + "bigint"

  /** table → (column → allowed resolved catalogStrings). Every column any
    * registry query touches is listed; an unexpected/missing column is
    * drift too.
    */
  val expected: Map[String, Map[String, Set[String]]] = Map(
    "region" -> Map(
      "r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Map(
      "n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Map(
      "c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Map(
      "s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Map(
      "p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Map(
      "o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> AnyTimestamp, "o_orderpriority" -> Set("string")),
    "lineitem" -> Map(
      "l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> AnyTimestamp),
    "events" -> Map(
      "event_id" -> Set("bigint"), "ts" -> EventsTs,
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Map(
      "doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Map(
      "vec_id" -> Set("bigint"), "embedding" -> Set("array<float>"),
      "label" -> Set("int"))
  )

  /** Drift messages for one table (empty = clean). */
  def driftTable(spark: SparkSession, dir: String, table: String): Seq[String] = {
    val cols = expected(table)
    val path = s"$dir/$table.parquet"
    try {
      val actual = spark.read.parquet(path).schema
        .map(f => f.name -> f.dataType.catalogString).toMap
      val missing = cols.keys.filterNot(actual.contains).toSeq.sorted
        .map(c => s"FIXTURE DRIFT: $path lost column `$c`")
      val retyped = cols.toSeq.sortBy(_._1).flatMap { case (c, allowed) =>
        actual.get(c).filterNot(allowed.contains).map(t =>
          s"FIXTURE DRIFT: $path column `$c` resolves as $t, expected one of " +
            allowed.toSeq.sorted.mkString("{", ", ", "}"))
      }
      val extra = actual.keys.filterNot(cols.contains).toSeq.sorted
        .map(c => s"FIXTURE DRIFT: $path grew unexpected column `$c` " +
          s"(${actual(c)}) — pin it here once a loader/query depends on it")
      missing ++ retyped ++ extra
    } catch {
      case e: Exception =>
        Seq(s"FIXTURE DRIFT: cannot read $path: ${e.getMessage}")
    }
  }

  /** Drift messages for every harness table under `dir` (empty = clean). */
  def drift(spark: SparkSession, dir: String): Seq[String] =
    expected.keys.toSeq.sorted.flatMap(driftTable(spark, dir, _))
}
