package org.apache.spark.sql

import java.util.UUID

import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Executor-side parquet spool for custom DSv2 writers: wraps Spark's
  * own `ParquetFileFormat.prepareWrite` `OutputWriterFactory` (the
  * exact writer `FileFormatWriter` uses — same codec, same
  * `ParquetWriteSupport` row codec) behind a serializable handle that
  * graft code can ship into `StreamingDataWriterFactory` tasks. Built
  * on the DRIVER (where the session configures the factory), opened
  * per task. Lives in the `org.apache.spark.sql` package because the
  * datasource writer surface is `private[sql]`. */
final class GraftParquetSpool private (
    factory: OutputWriterFactory,
    conf: SerializableConfiguration,
    schema: StructType) extends Serializable {

  /** Open one spool file; the returned writer is single-threaded and
    * must be closed exactly once. */
  def open(path: String, epochId: Long, partitionId: Int,
      taskId: Long): GraftParquetSpool.SpoolWriter = {
    val attempt = new TaskAttemptID(
      new TaskID(s"graft-spool-$epochId", epochId.toInt, TaskType.MAP, partitionId),
      (taskId % Int.MaxValue).toInt)
    val tac = new TaskAttemptContextImpl(conf.value, attempt)
    val out = factory.newInstance(path, schema, tac)
    new GraftParquetSpool.SpoolWriter {
      override def write(row: InternalRow): Unit = out.write(row)
      override def close(): Unit = out.close()
    }
  }
}

object GraftParquetSpool {

  trait SpoolWriter {
    def write(row: InternalRow): Unit
    def close(): Unit
  }

  /** Build on the driver: configures a parquet write job for `schema`
    * and captures its configuration for executor-side task contexts. */
  def apply(spark: SparkSession, schema: StructType): GraftParquetSpool = {
    val job = Job.getInstance(
      spark.asInstanceOf[classic.SparkSession].sessionState.newHadoopConf())
    val factory = new ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty, schema)
    new GraftParquetSpool(factory,
      new SerializableConfiguration(job.getConfiguration), schema)
  }

  def freshName(epochId: Long, partitionId: Int): String =
    s"stream-$epochId-$partitionId-${UUID.randomUUID()}.parquet"
}
