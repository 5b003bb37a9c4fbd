package graft.sources

import org.scalacheck.{Gen, Prop, Properties}

import graft.sources.LogLake.{AddFile, ColStats, Manifest}

/** The manifest JSON codec is the table format's durability boundary —
  * every field that survives `parse(render(m))` byte-for-byte is a
  * field the history can trust across versions. Property-pinned over
  * adversarial content: stats strings with quotes/newlines/unicode,
  * Hive-escaped partition values, the round-10 `cdc` and `ts` fields,
  * empty and absent optionals (absent must decode to the defaults so
  * OLD manifests keep parsing). Lives in the `graft.sources` package
  * to reach the codec without widening it to public. */
object ManifestCodecProps extends Properties("ManifestCodec") {

  private val nastyString: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.const(""),
    Gen.const("with \"quotes\" and \\backslashes\\"),
    Gen.const("line\nbreak\ttab"),
    Gen.const("ünïcødé — π≈3.14159 ≤ ∞"),
    Gen.const("part=val%3D/slash%2F"),
    Gen.asciiPrintableStr)

  private val genStats: Gen[ColStats] = for {
    t <- Gen.oneOf("long", "double", "decimal", "string", "null")
    mn <- nastyString
    mx <- nastyString
    n <- Gen.chooseNum(0L, Long.MaxValue)
  } yield ColStats(t, mn, mx, n)

  private val genAdd: Gen[AddFile] = for {
    path <- Gen.oneOf(
      Gen.identifier.map(s => s"data/$s.parquet"),
      Gen.identifier.map(s => s"/abs/external/$s.parquet"),
      Gen.identifier.map(s => s"$s.parquet"))
    rows <- Gen.chooseNum(0L, Long.MaxValue)
    nStats <- Gen.chooseNum(0, 4)
    stats <- Gen.mapOfN(nStats, Gen.zip(Gen.identifier, genStats))
    bytes <- Gen.oneOf(Gen.const(-1L), Gen.chooseNum(0L, Long.MaxValue))
    dv <- Gen.oneOf(Gen.const(""), Gen.identifier.map(s => s"dv/$s.dv"))
    dvRows <- Gen.chooseNum(0L, 1000000L)
    nPv <- Gen.chooseNum(0, 3)
    pv <- Gen.mapOfN(nPv, Gen.zip(Gen.identifier, nastyString))
    brid <- Gen.oneOf(Gen.const(-1L), Gen.const(-2L),
      Gen.chooseNum(0L, Long.MaxValue))
  } yield AddFile(path, rows, stats, bytes, dv,
    if (dv.isEmpty) 0L else dvRows, pv, brid)

  private val genManifest: Gen[Manifest] = for {
    v <- Gen.chooseNum(1L, Long.MaxValue)
    op <- Gen.oneOf("create", "append", "merge", "delete", "update",
      "optimize", "restore", "clone", "convert", "overwrite")
    txn <- Gen.oneOf(Gen.const(""), Gen.identifier)
    readV <- Gen.chooseNum(0L, Long.MaxValue)
    schema <- nastyString // stored opaque — any string must survive
    adds <- Gen.listOfN(3, genAdd).flatMap(l => Gen.someOf(l)).map(_.toSeq)
    removes <- Gen.listOf(Gen.identifier.map(s => s"data/$s.parquet"))
      .map(_.toSeq)
    cdc <- Gen.listOf(Gen.identifier.map(s => s"_loglake/cdc/$s.parquet"))
      .map(_.toSeq)
    ts <- Gen.oneOf(Gen.const(0L), Gen.chooseNum(1L, Long.MaxValue))
    features <- Gen.oneOf(
      Gen.const(Set.empty[String]),
      Gen.someOf("columnMapping", "deletionVectors", "partitionColumns",
        "futureFeatureX", "row-tracking/v2").map(_.toSet))
  } yield Manifest(v, op, txn, readV, schema, adds, removes, cdc, ts, features)

  property("parse(render(m)) == m") = Prop.forAll(genManifest) { m =>
    LogLake.parseManifest(LogLake.renderManifest(m)) == m
  }

  property("pre-round-10 manifests decode to the defaults") = {
    val m = Manifest(3L, "append", "t1", 2L, "{}",
      Seq(AddFile("data/a.parquet", 10L, Map("k" -> ColStats("long", "1", "9", 0L)))),
      Seq("data/old.parquet"))
    val json = LogLake.renderManifest(m)
    val back = LogLake.parseManifest(json)
    Prop(!json.contains("\"cdc\"") && !json.contains("\"ts\"") &&
      !json.contains("\"features\"") &&
      back == m && back.cdc.isEmpty && back.ts == 0L && back.features.isEmpty)
  }

  property("a NEW reader decodes a feature-bearing manifest it does not implement") = {
    // the gate lives at resolve, not in the codec: parsing must never
    // be the thing that breaks on an unknown feature tag
    val m = Manifest(4L, "append", "", 3L, "{}", Nil, Nil,
      features = Set("some-feature-from-2030"))
    Prop(LogLake.parseManifest(LogLake.renderManifest(m)) == m)
  }
}
