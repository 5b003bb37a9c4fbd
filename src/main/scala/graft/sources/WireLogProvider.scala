package graft.sources

import java.io.DataOutputStream
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `wirelog` — a complete DataSourceV2 streaming connector (SURVEY.md
  * §2.1 R4/R5's capability class, built without the absent kafka-sql
  * jar): micro-batch SOURCE with checkpointed offsets and exactly-once
  * replay, plus streaming SINK with coordinated, idempotent epoch
  * commits, over the [[WireLog]] segment-log topic layout. Messages are
  * (key, binary value) exactly like Kafka records; the value is the
  * Confluent-framed Avro PLCData payload
  * (`/root/reference/producer/sensor_data_producer.py:67-72`), decoded
  * downstream by `Streams.fromWire`.
  *
  * Source semantics: an offset is the highest committed segment number
  * (`{"maxSeg":n}`); a micro-batch is the half-open segment range
  * `(start, end]`, planned one InputPartition per part file so a
  * many-part segment fans out across executors. Segments are immutable
  * once their `_COMMITTED` marker exists, so replaying a batch from the
  * checkpoint re-reads byte-identical data — the property the
  * reference's manual offset commit loses (SURVEY.md §2.3 B1).
  *
  * Sink semantics: each task stages its rows to `_tmp/epoch-e/…` and
  * reports the staged file in its commit message; the DRIVER publishes
  * segment `base + e` only in `commit(epochId, …)`, marker last, where
  * `base` is claimed once per writer identity (checkpoint-derived, so
  * stable across restarts) as one past the highest committed segment.
  * A replayed epoch finds its own ownership stamp on the segment and
  * cleans up instead of duplicating; a segment committed by anyone
  * else fails the commit loudly instead of silently dropping the epoch
  * — two-phase commit exactly like Spark's own file sinks.
  */
class WireLogProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "wirelog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WireLogProvider.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new WireLogTable(WireLogProvider.dir(properties.asScala.toMap))
}

object WireLogProvider {
  // value is nullable: a null value is the Kafka tombstone shape, framed
  // as length -1 (WireLog.writeRecord) and round-tripped as NULL
  val Schema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", BinaryType, nullable = true),
    StructField("segment", LongType, nullable = false),
    StructField("pos", IntegerType, nullable = false)))

  private def dir(options: Map[String, String]): String =
    options.getOrElse("path",
      throw new IllegalArgumentException("wirelog requires a path option"))
}

class WireLogTable(dir: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"wirelog:$dir"
  override def schema(): StructType = WireLogProvider.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    // ACCEPT_ANY_SCHEMA: the write schema (key?, value) is narrower than
    // the read schema (… segment, pos are read-side metadata) — the same
    // asymmetry the Kafka connector declares; newWriteBuilder validates
    // the columns it actually needs, by name
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ,
      TableCapability.STREAMING_WRITE, TableCapability.BATCH_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // Kafka's maxOffsetsPerTrigger analog, in this layout's offset unit:
    // cap how many segments one micro-batch admits so a deep backlog
    // drains in bounded batches (bounded state/memory per batch) instead
    // of one giant catch-up batch
    val maxSegs = Option(options.get("maxSegmentsPerTrigger")).map(_.toInt)
    maxSegs.foreach(n => require(n > 0,
      s"maxSegmentsPerTrigger must be positive, got $n"))
    // …and the maxBytesPerTrigger analog: when segment SIZES skew (one
    // fat bulk-load segment between many small epochs), a count-based
    // cap still admits an unbounded volume in one batch — the byte cap
    // bounds each batch by data volume instead. Both compose (composite
    // read limit): a batch stops at whichever cap it hits first.
    val maxBytes = Option(options.get("maxBytesPerTrigger")).map(_.toLong)
    maxBytes.foreach(n => require(n > 0,
      s"maxBytesPerTrigger must be positive, got $n"))
    new ScanBuilder {
      override def build(): Scan = new WireLogScan(dir, maxSegs, maxBytes)
    }
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val schema = info.schema()
    val valIdx = schema.fieldNames.indexOf("value")
    require(valIdx >= 0,
      s"wirelog sink requires a binary `value` column; got ${schema.simpleString}")
    require(schema(valIdx).dataType == BinaryType,
      s"wirelog sink `value` must be BINARY, got ${schema(valIdx).dataType}")
    val keyIdx = schema.fieldNames.indexOf("key")
    if (keyIdx >= 0) require(schema(keyIdx).dataType == StringType,
      s"wirelog sink `key` must be STRING, got ${schema(keyIdx).dataType}")
    // Writer identity must be stable across RESTARTS of the same query
    // (so a crash-replayed epoch maps to the same segment number) and
    // distinct between different queries writing the same topic. The
    // checkpoint location is exactly that; fall back to queryId.
    val writerId = {
      val ident = Option(info.options.get("checkpointLocation"))
        .filter(_.nonEmpty).getOrElse(info.queryId())
      java.security.MessageDigest.getInstance("MD5")
        .digest(ident.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
    }
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite =
          new WireLogStreamingWrite(dir, keyIdx, valIdx, writerId)
        override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
          new WireLogBatchWrite(dir, keyIdx, valIdx)
      }
    }
  }
}

/** Batch append: one `df.write.format("wirelog")` job publishes ONE
  * segment at the next unused number (hwm-aware, so it composes with
  * retention and live streaming writers the same way `WireLog.append`
  * does). The job-unique stamp means a re-submitted job appends a NEW
  * segment — batch writes have no replay identity, matching a plain
  * Kafka produce. */
class WireLogBatchWrite(dir: String, keyIdx: Int, valIdx: Int)
  extends org.apache.spark.sql.connector.write.BatchWrite {
  private val scope = s"batch-${UUID.randomUUID()}"
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): org.apache.spark.sql.connector.write.DataWriterFactory =
    WireBatchWriterFactory(dir, keyIdx, valIdx, scope)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val f = WireLog.fs(dir)
    val staged = messages.collect {
      case WirePartCommit(pid, path, n) if n > 0 => (pid, new HPath(path))
    }.sortBy(_._1).map(_._2).toSeq
    if (staged.nonEmpty)
      WireLog.publishSegment(f, dir, WireLog.nextSegment(dir), staged,
        stamp = scope)
    f.delete(new HPath(dir, s"${WireLog.TmpDir}/$scope"), true)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    WireLog.fs(dir).delete(new HPath(dir, s"${WireLog.TmpDir}/$scope"), true)
}

class WireLogScan(dir: String, maxSegsPerTrigger: Option[Int] = None,
    maxBytesPerTrigger: Option[Long] = None) extends Scan {
  override def readSchema(): StructType = WireLogProvider.Schema
  override def description(): String = s"wirelog scan of $dir"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new WireLogMicroBatchStream(dir, maxSegsPerTrigger, maxBytesPerTrigger)
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val f = WireLog.fs(dir)
      WireLog.listSegments(dir).flatMap { case (seg, p) =>
        WireLog.listParts(f, p).map(part => WirePartition(seg, part.toString))
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory = WireReaderFactory
  }
}

case class WireLogOffset(maxSeg: Long) extends Offset {
  override def json(): String = s"""{"maxSeg":$maxSeg}"""
}

class WireLogMicroBatchStream(dir: String, maxSegsPerTrigger: Option[Int] = None,
    maxBytesPerTrigger: Option[Long] = None)
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadLimit, ReadMaxBytes, ReadMaxFiles}

  // high-water mark of segments already observed committed: committed
  // segments are immutable, so each trigger's listing only pays the
  // per-segment _COMMITTED existence RPC for segments ABOVE this mark —
  // O(new segments) per trigger, not O(all segments ever written)
  @volatile private var seenCommitted = 0L

  private def refreshSeen(): Long = {
    val newest = WireLog.listSegments(dir, seenCommitted).lastOption.map(_._1)
    newest.foreach(n => seenCommitted = math.max(seenCommitted, n))
    seenCommitted
  }

  override def initialOffset(): Offset = WireLogOffset(0L)
  override def latestOffset(): Offset = WireLogOffset(refreshSeen())

  // ---- SupportsAdmissionControl: maxSegmentsPerTrigger (the Kafka
  // maxOffsetsPerTrigger analog — segments are this layout's offset
  // unit). The engine calls latestOffset(start, limit) instead of
  // latestOffset() when this interface is present; Trigger.AvailableNow
  // keeps issuing capped batches until reportLatestOffset is reached.
  // SupportsTriggerAvailableNow is implemented NATIVELY (like the Kafka
  // source): Spark's AvailableNowDataStreamWrapper explicitly IGNORES
  // read limits for wrapped sources (it logs "the read limit ... is
  // ignored" and substitutes allAvailable), so a capped drain only
  // works if the source itself pins the run's end offset and keeps
  // honoring the limit per batch.
  @volatile private var availableNowEnd: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(refreshSeen())

  override def getDefaultReadLimit: ReadLimit = {
    val limits = maxSegsPerTrigger.map(n => ReadLimit.maxFiles(n)).toSeq ++
      maxBytesPerTrigger.map(b => ReadLimit.maxBytes(b)).toSeq
    limits match {
      case Seq()    => ReadLimit.allAvailable()
      case Seq(one) => one
      case many     => ReadLimit.compositeLimit(many.toArray)
    }
  }
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val newest = availableNowEnd.getOrElse(refreshSeen())
    // (segment-count cap, byte cap) — a composite limit takes the
    // tightest of each kind, matching Spark's "admit the minimum any
    // sub-limit allows" composite semantics
    def caps(l: ReadLimit): (Long, Long) = l match {
      case mf: ReadMaxFiles => (mf.maxFiles().toLong, Long.MaxValue)
      case mb: ReadMaxBytes => (Long.MaxValue, mb.maxBytes())
      case c: CompositeReadLimit => c.getReadLimits.map(caps)
        .reduce((a, b) => (math.min(a._1, b._1), math.min(a._2, b._2)))
      case _ => (Long.MaxValue, Long.MaxValue)
    }
    val (segCap, byteCap) = caps(limit)
    val s = start.asInstanceOf[WireLogOffset].maxSeg
    val f = WireLog.fs(dir)
    // segment numbers may skip (wasted numbers, empty epochs): cap by
    // COUNT and VOLUME of committed segments admitted, not by number
    // arithmetic. The FIRST segment is always admitted even when it
    // alone exceeds the byte cap — otherwise one fat segment would
    // wedge the stream forever (same rule as Kafka admitting at least
    // one record batch).
    var admitted = 0L
    var bytes = 0L
    var last = s
    val it = WireLog.listSegments(dir, floor = s).iterator
      .takeWhile(_._1 <= newest)
    var stop = false
    while (it.hasNext && !stop) {
      val (n, p) = it.next()
      // skip the per-part size listing entirely when no byte cap is set
      val sz = if (byteCap == Long.MaxValue) 0L
        else f.listStatus(p).iterator
          .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
          .map(_.getLen).sum
      if (admitted == 0 || (admitted < segCap && bytes + sz <= byteCap)) {
        admitted += 1; bytes += sz; last = n
      } else stop = true
    }
    WireLogOffset(last)
  }
  override def reportLatestOffset(): Offset =
    WireLogOffset(availableNowEnd.getOrElse(seenCommitted))
  override def deserializeOffset(json: String): Offset =
    WireLogOffset("""-?\d+""".r.findFirstIn(json).map(_.toLong).getOrElse(
      throw new IllegalArgumentException(s"bad wirelog offset: $json")))
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[WireLogOffset].maxSeg,
      end.asInstanceOf[WireLogOffset].maxSeg)
    val f = WireLog.fs(dir)
    WireLog.listSegments(dir, floor = s)
      .filter { case (seg, _) => seg <= e }
      .flatMap { case (seg, p) =>
        WireLog.listParts(f, p).map(part => WirePartition(seg, part.toString))
      }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = WireReaderFactory
  // Kafka-style retention: consumed segments stay until a retention
  // sweep, so a second consumer group (another query) can re-read them.
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class WirePartition(segment: Long, partPath: String) extends InputPartition

object WireReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[WirePartition]
    new PartitionReader[InternalRow] {
      private val it = WireLog.readPart(
        WireLog.fs(p.partPath), new HPath(p.partPath))
      private var pos = -1
      private var cur: (String, Array[Byte]) = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); pos += 1; true } else false
      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](
          if (cur._1 == null) null else UTF8String.fromString(cur._1),
          cur._2, p.segment, pos))
      // a scan that stops early (limit, task failure) must release the
      // part file's stream — PartIterator.close() is idempotent
      override def close(): Unit = it.close()
    }
  }
}

case class WirePartCommit(partitionId: Int, stagedPath: String, records: Long)
  extends WriterCommitMessage

/** Serializable factory shipped to executors (MUST NOT capture the
  * driver-side [[WireLogStreamingWrite]], which is not serializable). */
case class WireWriterFactory(dir: String, keyIdx: Int, valIdx: Int)
  extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new WirePartWriter(dir, keyIdx, valIdx, partitionId, taskId, s"epoch-$epochId")
}

/** Batch twin of [[WireWriterFactory]]: one `df.write` job = one
  * segment, staged under a job-unique scope. */
case class WireBatchWriterFactory(dir: String, keyIdx: Int, valIdx: Int,
    scope: String) extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new WirePartWriter(dir, keyIdx, valIdx, partitionId, taskId, scope)
}

class WireLogStreamingWrite(dir: String, keyIdx: Int, valIdx: Int,
    writerId: String)
  extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    WireWriterFactory(dir, keyIdx, valIdx)

  // epoch → segment mapping: base + epochId, where base is claimed once
  // per writer identity as one past the topic's high-water mark and
  // persisted in the topic (`_writer-<id>`). A restart of the same
  // query re-reads the same base, so a crash-replayed epoch republishes
  // the SAME segment number and the ownership stamp makes it a no-op; a
  // topic with pre-existing segments (another writer, a demo append)
  // can never collide because base starts past them. Deriving the
  // number from epochId alone (the previous scheme) silently DISCARDED
  // an epoch whenever its number was already taken. Upgrade boundary:
  // a checkpoint whose last epoch committed under the OLD scheme and
  // crashed before Spark's commit log recorded it will replay that
  // epoch under a fresh base — duplicated once; stamp-less topics
  // written before the scheme change should start a new topic dir.
  private lazy val base: Long =
    WireLog.claimWriterBase(WireLog.fs(dir), dir, writerId)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val f = WireLog.fs(dir)
    val staged = messages.collect {
      case WirePartCommit(pid, path, n) if n > 0 => (pid, new HPath(path))
    }.sortBy(_._1).map(_._2).toSeq
    // an all-empty epoch publishes nothing — segment numbers may skip,
    // which the half-open (start, end] batch range handles naturally
    if (staged.nonEmpty)
      WireLog.publishSegment(f, dir, base + epochId, staged,
        stamp = s"$writerId:$epochId")
    f.delete(new HPath(dir, s"${WireLog.TmpDir}/epoch-$epochId"), true)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    WireLog.fs(dir).delete(new HPath(dir, s"${WireLog.TmpDir}/epoch-$epochId"), true)
}

/** Task-side staged writer: speculative attempts stage to distinct
  * UUID-suffixed files; the commit coordinator admits one winner per
  * partition and only its staged file reaches `publishSegment`. */
class WirePartWriter(dir: String, keyIdx: Int, valIdx: Int,
    partitionId: Int, taskId: Long, writeScope: String)
  extends DataWriter[InternalRow] {
  private val staged = new HPath(dir,
    s"${WireLog.TmpDir}/$writeScope/p$partitionId-t$taskId-${UUID.randomUUID()}")
  private lazy val out: DataOutputStream =
    new DataOutputStream(WireLog.fs(dir).create(staged, true))
  private var records = 0L

  override def write(row: InternalRow): Unit = {
    val key = if (keyIdx < 0 || row.isNullAt(keyIdx)) null
      else row.getUTF8String(keyIdx).toString
    // null value = tombstone, framed as length -1 — getBinary on a null
    // field is undefined (empty array or NPE depending on row class)
    val value = if (row.isNullAt(valIdx)) null else row.getBinary(valIdx)
    WireLog.writeRecord(out, key, value)
    records += 1
  }
  override def commit(): WriterCommitMessage = {
    if (records > 0) out.close()
    WirePartCommit(partitionId, staged.toString, records)
  }
  override def abort(): Unit = {
    if (records > 0) out.close()
    WireLog.fs(dir).delete(staged, false)
  }
  override def close(): Unit = ()
}
