package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Segment-log layout and record framing shared by the wirelog DSv2
  * source, sink, and the test producer — a file-backed stand-in for the
  * reference's Kafka topic (`consumer/sensor_data_consumer.py:47-62`):
  * a topic is a directory of immutable, monotonically numbered segment
  * directories, a message is a (key, Confluent-framed-Avro value) pair,
  * and the committed segment number is the offset.
  *
  * ```
  * dir/
  *   seg-00000000000000000001/part-00000..   one segment = one append or
  *   seg-00000000000000000001/_COMMITTED     one sink epoch; immutable
  *   _tmp/epoch-<e>/…                        in-flight writer output
  * ```
  *
  * Visibility protocol: a segment EXISTS only once its `_COMMITTED`
  * marker does; parts are moved in first, the marker is renamed in
  * last, and renames are atomic on HDFS-like filesystems — a reader
  * listing the directory can never observe a half-written segment.
  * All I/O goes through the Hadoop FileSystem API, so the same code
  * runs on HDFS/S3A on a cluster (a production build would ship the
  * session's hadoopConf to executors; the framing and protocol are
  * unchanged).
  *
  * Record framing inside a part file: big-endian `[keyLen][keyBytes]
  * [valueLen][valueBytes]`, keyLen = -1 for a null key.
  */
object WireLog {

  val SegPrefix = "seg-"
  val Committed = "_COMMITTED"
  val TmpDir = "_tmp"

  def fs(dir: String): FileSystem = new Path(dir).getFileSystem(new Configuration())

  def segName(n: Long): String = f"$SegPrefix$n%020d"

  /** Committed segment numbers + paths, ascending. */
  def listSegments(dir: String): Seq[(Long, Path)] = {
    val f = fs(dir)
    val base = new Path(dir)
    if (!f.exists(base)) return Seq.empty
    f.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(SegPrefix))
      .filter(s => f.exists(new Path(s.getPath, Committed)))
      .map(s => (s.getPath.getName.stripPrefix(SegPrefix).toLong, s.getPath))
      .sortBy(_._1)
  }

  /** Part files of one committed segment, ascending by name. */
  def listParts(f: FileSystem, seg: Path): Seq[Path] =
    f.listStatus(seg).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(_.getPath).sortBy(_.getName)

  def writeRecord(out: DataOutputStream, key: String, value: Array[Byte]): Unit = {
    if (key == null) out.writeInt(-1)
    else {
      val kb = key.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb)
    }
    out.writeInt(value.length); out.write(value)
  }

  /** Iterate a part file's framed records; the iterator owns the stream
    * and closes it at EOF (readers must drain or close explicitly). */
  def readPart(f: FileSystem, part: Path): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private val in = new DataInputStream(f.open(part))
      private var nextRec: (String, Array[Byte]) = fetch()
      private def fetch(): (String, Array[Byte]) =
        try {
          val kl = in.readInt()
          val key = if (kl < 0) null else {
            val kb = new Array[Byte](kl); in.readFully(kb); new String(kb, "UTF-8")
          }
          val vl = in.readInt()
          val vb = new Array[Byte](vl); in.readFully(vb)
          (key, vb)
        } catch { case _: EOFException => in.close(); null }
      override def hasNext: Boolean = nextRec != null
      override def next(): (String, Array[Byte]) = {
        val r = nextRec; nextRec = fetch(); r
      }
    }

  /** Atomically publish a finished segment: move staged part files in,
    * then rename the `_COMMITTED` marker last. No-op if the segment is
    * already committed (idempotent replay). */
  def publishSegment(f: FileSystem, dir: String, seg: Long,
      stagedParts: Seq[Path]): Unit = {
    val segPath = new Path(dir, segName(seg))
    val marker = new Path(segPath, Committed)
    if (f.exists(marker)) {
      stagedParts.foreach(p => f.delete(p, false))
      return
    }
    f.mkdirs(segPath)
    stagedParts.zipWithIndex.foreach { case (p, i) =>
      f.rename(p, new Path(segPath, f"part-$i%05d"))
    }
    val tmpMarker = new Path(segPath, s".$Committed.tmp")
    f.create(tmpMarker, true).close()
    f.rename(tmpMarker, marker)
  }

  /** Test/demo producer: append one segment holding `records`. */
  def append(dir: String, records: Seq[(String, Array[Byte])]): Long = {
    val f = fs(dir)
    val next = listSegments(dir).lastOption.map(_._1).getOrElse(0L) + 1
    val staged = new Path(dir, s"$TmpDir/append-${java.util.UUID.randomUUID()}")
    val out = new DataOutputStream(f.create(staged, true))
    records.foreach { case (k, v) => writeRecord(out, k, v) }
    out.close()
    publishSegment(f, dir, next, Seq(staged))
    next
  }
}
