package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{AvroDecodePlc, AvroEncodePlc, Hamming64, ImageMetaExpr, Md560, ScaledDotProduct, ToFixed6, WavMetaExpr}

/** Engine extensions, injected via
  * `spark.sql.extensions=graft.GraftExtensions` (see [[Sessions]]):
  * registers the custom codegen functions so they are first-class SQL
  * (`SELECT scaled_dot(a, b) ...`) as well as Column API citizens.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension: native as-of join (logical node built by
    // graft.plans.AsofJoin.asofLeft, planned to SortMergeAsofJoinExec)
    ext.injectPlannerStrategy(_ => new graft.plans.AsofJoinStrategy)
    // loglake SQL surface: lowers MERGE/DELETE/UPDATE on LogLakeCatalog
    // tables onto the commit log, and swaps catalog reads onto the
    // native pushdown relation (Delta's DeltaAnalysis shape)
    ext.injectResolutionRule(session => new graft.sources.LogLakeSqlRule(session))
    // metadata-only COUNT(*): unfiltered snapshot counts answer from
    // the manifest (exact per-file rows minus DV cardinalities) — the
    // scan collapses to a LocalRelation, zero data bytes at any size
    ext.injectOptimizerRule(_ => new graft.sources.LogLakeMetadataOnlyCountRule)
    // audit DDL the stock grammar lacks: DESCRIBE HISTORY / DETAIL
    // (delegating parser — claims only its statements)
    ext.injectParser((_, delegate) => new graft.sources.GraftSqlParser(delegate))
    ext.injectFunction((
      new FunctionIdentifier("scaled_dot"),
      new ExpressionInfo(classOf[ScaledDotProduct].getName, "scaled_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"scaled_dot requires exactly 2 arguments (array<float>, array<float>), got ${children.size}")
        ScaledDotProduct(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("md5_60"),
      new ExpressionInfo(classOf[Md560].getName, "md5_60"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"md5_60 requires exactly 1 argument (string|binary), got ${children.size}")
        Md560(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("fixed6"),
      new ExpressionInfo(classOf[ToFixed6].getName, "fixed6"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"fixed6 requires exactly 1 argument (double), got ${children.size}")
        ToFixed6(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("avro_encode_plc"),
      new ExpressionInfo(classOf[AvroEncodePlc].getName, "avro_encode_plc"),
      (children: Seq[Expression]) => {
        require(children.size == 4,
          s"avro_encode_plc requires exactly 4 arguments (string, string, double, double), got ${children.size}")
        AvroEncodePlc(children(0), children(1), children(2), children(3))
      }))
    ext.injectFunction((
      new FunctionIdentifier("avro_decode_plc"),
      new ExpressionInfo(classOf[AvroDecodePlc].getName, "avro_decode_plc"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"avro_decode_plc requires exactly 1 argument (binary), got ${children.size}")
        AvroDecodePlc(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("image_meta"),
      new ExpressionInfo(classOf[ImageMetaExpr].getName, "image_meta"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"image_meta requires exactly 1 argument (binary), got ${children.size}")
        ImageMetaExpr(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("wav_meta"),
      new ExpressionInfo(classOf[WavMetaExpr].getName, "wav_meta"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"wav_meta requires exactly 1 argument (binary), got ${children.size}")
        WavMetaExpr(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("hamming64"),
      new ExpressionInfo(classOf[Hamming64].getName, "hamming64"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"hamming64 requires exactly 2 arguments (bigint, bigint), got ${children.size}")
        Hamming64(children(0), children(1))
      }))
  }
}
