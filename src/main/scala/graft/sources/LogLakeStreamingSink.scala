package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{GraftParquetSpool, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType

/** One spooled epoch file: staged under `_loglake/_tmp/`, adopted (or
  * discarded) by the driver's epoch commit. */
final case class LogLakeStreamCommit(path: String, rows: Long)
  extends WriterCommitMessage

/** DSv2 streaming write — what `df.writeStream.toTable("loglake.ns.t")`
  * plans onto (the catalog table's STREAMING_WRITE capability).
  *
  * Executors spool each epoch's rows straight to parquet staging files
  * using Spark's OWN parquet writer ([[GraftParquetSpool]] wraps the
  * `ParquetFileFormat` factory `FileFormatWriter` itself uses — same
  * codec, same row codec), under the table's PHYSICAL column names.
  * The driver's epoch commit then ADOPTS the staged files: rename into
  * `data/`, one metadata-sized stats+constraint aggregate
  * (`finishStaged` — the identical post-staging pass every batch write
  * runs), one manifest commit. No second write of the data: epoch cost
  * is spool volume + a stats read, the same as the DSv1
  * `format("loglake")` sink.
  *
  * Exactly-once: the commit's txnId is `stream-<queryId>:<epochId>` —
  * a crash-replayed epoch finds its txn in the log, deletes its fresh
  * spool files, and no-ops (the Delta streaming-sink contract).
  *
  * Partitioned tables spool unclustered, so the epoch commit routes
  * through [[LogLake.append]] instead (one re-cluster pass over the
  * epoch's volume — the price of the one-file-per-partition layout
  * invariant; never table volume). */
final class LogLakeStreamingWrite(dir: String, queryId: String,
    writeSchema: StructType) extends StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val spark = SparkSession.active
    val (_, tableSchema) = LogLake.activeState(dir)
    // fail before any row spools: this writer adopts spool files
    // verbatim and cannot run the identity-assignment pass — see the
    // matching guard in LogLake.commitSpooled
    require(LogLake.identityColumns(dir).isEmpty,
      s"loglake: table at $dir has GENERATED ALWAYS AS IDENTITY " +
        "column(s) — the DSv2 streaming writer cannot assign them; " +
        "use LogLake.streamAppend (foreachBatch) instead")
    require(tableSchema.fieldNames.sameElements(writeSchema.fieldNames),
      s"loglake: streaming write columns ${writeSchema.fieldNames.mkString(",")} " +
        s"must match table columns ${tableSchema.fieldNames.mkString(",")} " +
        "in order (Spark's output resolver aligns them — a mismatch here " +
        "means the table schema changed after the query planned; restart)")
    val spool = GraftParquetSpool(spark, LogLake.physSchema(tableSchema))
    new LogLakeSpoolWriterFactory(dir, spool)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val spooled = messages.toSeq.collect { case m: LogLakeStreamCommit => m }
    LogLake.commitSpooled(SparkSession.active, dir,
      spooled.map(m => m.path -> m.rows), s"stream-$queryId:$epochId")
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val f = WireLog.fs(dir)
    messages.collect { case m: LogLakeStreamCommit =>
      f.delete(new Path(m.path), false)
    }
  }
}

private[sources] final class LogLakeSpoolWriterFactory(dir: String,
    spool: GraftParquetSpool) extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    val name = GraftParquetSpool.freshName(epochId, partitionId)
    val path = s"$dir/${LogLake.LogDir}/_tmp/$name"
    val out = spool.open(path, epochId, partitionId, taskId)
    new DataWriter[InternalRow] {
      private var rows = 0L
      override def write(record: InternalRow): Unit = {
        out.write(record); rows += 1
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        LogLakeStreamCommit(path, rows)
      }
      override def abort(): Unit = {
        try out.close() catch { case _: Exception => () }
        WireLog.fs(dir).delete(new Path(path), false)
      }
      override def close(): Unit = ()
    }
  }
}
