package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{MessageType, MessageTypeParser}

import LogLake.{AddFile, Checkpoint, ColStats}

/** PARQUET CHECKPOINT BODIES (VERDICT r12 #5 — Delta's parquet
  * checkpoints): the checkpoint's FILE LIST as a columnar parquet file
  * instead of one JSON document. The JSON manifest tail is untouched —
  * commits stay human-readable, small, and tree-parsed; only the
  * checkpoint (the 10⁷-entry accelerator) changes representation,
  * opt-in per table via `loglake.checkpoint.format = parquet`.
  *
  * Why parquet here: column-chunked bodies mean object-store RANGED
  * reads (a future stats-only consumer can fetch the `path`+`st`
  * columns without the rest), dictionary+RLE+Snappy shrink the bytes
  * well below the JSON rendering, and the format is readable by ANY
  * engine — a debugging `read_parquet()` away. The header
  * (version/schema/txns/features) rides the parquet FOOTER's key-value
  * metadata on part 1, exactly where the JSON format carries it in the
  * document head; parts 2..n carry only their file slice. Naming,
  * part grouping, and the torn-group rule are IDENTICAL to the JSON
  * layout (`chk-<v>[.p<i>-of-<n>].parquet`) — [[LogLake]] dispatches
  * purely on the extension.
  *
  * The reader streams row groups straight into
  * [[PackedAddFiles.GrowingBuilder]], so a 10⁷-file parquet checkpoint
  * parses into compressed blocks without ever holding 10⁷ live
  * objects — same heap posture as the JSON stream parser.
  */
private[graft] object CheckpointParquet {

  /** One row per active file; pv/st as repeated groups (the example
    * API's map rendering). Field names match the JSON encoding. */
  private val Schema: MessageType = MessageTypeParser.parseMessageType(
    """message loglake_checkpoint {
      |  required binary path (UTF8);
      |  required int64 rows;
      |  required int64 bytes;
      |  required binary dv (UTF8);
      |  required int64 dvRows;
      |  required int64 brid;
      |  repeated group pv {
      |    required binary k (UTF8);
      |    required binary v (UTF8);
      |  }
      |  repeated group st {
      |    required binary c (UTF8);
      |    required binary t (UTF8);
      |    required binary mn (UTF8);
      |    required binary mx (UTF8);
      |    required int64 nulls;
      |  }
      |}""".stripMargin)

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Footer metadata keys (part 1 carries the full header). */
  private val KVersion = "loglake.version"
  private val KSchema = "loglake.schema"
  private val KTxns = "loglake.txns"
  private val KFeatures = "loglake.features"
  private val KWFeatures = "loglake.wfeatures"
  /** Per-part slice aggregates (every part carries its OWN slice's),
    * so planning surfaces — sizeInBytes estimates, DV routing — read
    * one footer instead of the body ([[LazyLogLakeFileIndex]]). */
  private val KAggFiles = "loglake.part.files"
  private val KAggBytes = "loglake.part.bytes"
  private val KAggRows = "loglake.part.rows"
  private val KAggDvs = "loglake.part.dvs"
  /** Round 16 (ADVICE r15): the part's POLICY aggregates — the union of
    * stats-column keys across every record (so stats inheritance never
    * depends on which file happens to be first in a part), and the
    * count of files whose NAME carries no parseable bucket tag (so
    * bucketed lazy plans and bucket-id pruning can verify the tags are
    * trustworthy from one footer read instead of a body scan). */
  private val KStatsCols = "loglake.part.statscols"
  private val KAggUntagged = "loglake.part.untagged"

  /** (fileCount, sumBytes where known, sumRows, dvCount) for one part,
    * from its footer alone — None for parts written before the
    * aggregates existed. */
  final case class PartAgg(files: Long, bytes: Long, rows: Long, dvs: Long)

  /** Footer key-value metadata, memoized per part PATH: checkpoint
    * part files are immutable once named, and the three policy readers
    * below are consulted on every relation build / merge of a
    * lazy-planned table — without the memo each consult re-opened the
    * footer (ADVICE r16: readStatsCols + readUntagged opened the same
    * footer twice per operation). LRU-bounded so a long-lived JVM over
    * thousands of scratch tables stays flat; eviction costs one footer
    * re-read, never a stampede. */
  private val footerKvCache =
    new java.util.LinkedHashMap[String, Map[String, String]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Map[String, String]]): Boolean =
        size() > 8192
    }

  private def footerKv(conf: Configuration, src: Path): Map[String, String] = {
    val key = src.toString
    footerKvCache.synchronized {
      val hit = footerKvCache.get(key)
      if (hit != null) return hit
    }
    // open(file, options): the no-options overload constructs a fresh
    // hadoop Configuration per call (classpath scan) — see WireLog.sharedConf
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(src, conf),
      org.apache.parquet.HadoopReadOptions.builder(conf, src).build())
    val kv = try r.getFooter.getFileMetaData.getKeyValueMetaData finally r.close()
    val m = {
      import scala.jdk.CollectionConverters._
      kv.asScala.toMap
    }
    footerKvCache.synchronized { footerKvCache.put(key, m) }
    m
  }

  def readAggregates(conf: Configuration, src: Path): Option[PartAgg] = {
    val kv = footerKv(conf, src)
    for {
      f <- kv.get(KAggFiles).map(_.toLong)
      b <- kv.get(KAggBytes).map(_.toLong)
      rw <- kv.get(KAggRows).map(_.toLong)
      d <- kv.get(KAggDvs).map(_.toLong)
    } yield PartAgg(f, b, rw, d)
  }

  /** The part's stats-column key union — None for parts written before
    * the policy footer existed (callers fall back to record sampling). */
  def readStatsCols(conf: Configuration, src: Path): Option[Seq[String]] =
    footerKv(conf, src).get(KStatsCols).map { json =>
      val arr = mapper.readTree(json)
      (0 until arr.size()).map(arr.get(_).asText())
    }

  /** The part's count of bucket-untagged file names — None for parts
    * written before the footer existed (callers fall back to the eager
    * name scan, see [[LogLake.lazyBucketTagsTrusted]]). */
  def readUntagged(conf: Configuration, src: Path): Option[Long] =
    footerKv(conf, src).get(KAggUntagged).map(_.toLong)

  /** TEST-ONLY: when false, [[write]] omits the round-16 policy keys
    * (stats-col union + untagged count) so specs can fabricate a
    * faithful PRE-policy-footer part and exercise the legacy
    * fallbacks; never flipped outside tests. */
  private[graft] var writePolicyFooter = true

  def write(conf: Configuration, dest: Path, c: Checkpoint,
      files: Iterator[AddFile], header: Boolean): Unit = {
    val meta = new java.util.HashMap[String, String]()
    meta.put(KVersion, c.version.toString)
    if (header) {
      meta.put(KSchema, c.schemaJson)
      val tx = mapper.createObjectNode()
      c.txns.toSeq.sortBy(_._1).foreach { case (k, v) => tx.put(k, v) }
      meta.put(KTxns, mapper.writeValueAsString(tx))
      if (c.features.nonEmpty)
        meta.put(KFeatures, c.features.toSeq.sorted.mkString(","))
      if (c.writerFeatures.nonEmpty)
        meta.put(KWFeatures, c.writerFeatures.toSeq.sorted.mkString(","))
    }
    val ws = new AggGroupWriteSupport(Schema, meta)
    val writer = new AggBuilder(
        org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(dest, conf), ws)
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    val gf = new SimpleGroupFactory(Schema)
    try files.foreach { a =>
      ws.aFiles += 1; ws.aRows += a.rows
      if (a.bytes > 0) ws.aBytes += a.bytes
      if (a.dv.nonEmpty) ws.aDvs += 1
      ws.aStatsCols ++= a.stats.keysIterator
      new Path(a.path).getName match {
        case LogLake.BucketTagName(_) => ()
        case _ => ws.aUntagged += 1
      }
      val g = gf.newGroup()
      g.add("path", a.path)
      g.add("rows", a.rows)
      g.add("bytes", a.bytes)
      g.add("dv", a.dv)
      g.add("dvRows", a.dvRows)
      g.add("brid", a.baseRowId)
      a.partitionValues.toSeq.sortBy(_._1).foreach { case (k, v) =>
        val pg = g.addGroup("pv"); pg.add("k", k); pg.add("v", v)
      }
      a.stats.toSeq.sortBy(_._1).foreach { case (cname, s) =>
        val sg = g.addGroup("st")
        sg.add("c", cname); sg.add("t", s.tpe)
        sg.add("mn", s.min); sg.add("mx", s.max)
        sg.add("nulls", s.nulls)
      }
      writer.write(g)
    } finally writer.close()
  }

  /** Group write support whose `finalizeWrite` stamps the slice
    * aggregates accumulated DURING the stream into the footer — the
    * builder-time metadata can't know them for an iterator-fed part. */
  private final class AggGroupWriteSupport(schema: MessageType,
      base: java.util.Map[String, String])
      extends org.apache.parquet.hadoop.api.WriteSupport[Group] {
    var aFiles = 0L; var aBytes = 0L; var aRows = 0L; var aDvs = 0L
    var aUntagged = 0L
    val aStatsCols = scala.collection.mutable.TreeSet.empty[String]
    private var gw: org.apache.parquet.example.data.GroupWriter = _
    override def init(conf: Configuration)
        : org.apache.parquet.hadoop.api.WriteSupport.WriteContext =
      new org.apache.parquet.hadoop.api.WriteSupport.WriteContext(schema, base)
    override def prepareForWrite(
        rc: org.apache.parquet.io.api.RecordConsumer): Unit =
      gw = new org.apache.parquet.example.data.GroupWriter(rc, schema)
    override def write(g: Group): Unit = gw.write(g)
    override def finalizeWrite()
        : org.apache.parquet.hadoop.api.WriteSupport.FinalizedWriteContext = {
      val m = new java.util.HashMap[String, String]()
      m.put(KAggFiles, aFiles.toString)
      m.put(KAggBytes, aBytes.toString)
      m.put(KAggRows, aRows.toString)
      m.put(KAggDvs, aDvs.toString)
      if (writePolicyFooter) {
        m.put(KAggUntagged, aUntagged.toString)
        val cols = mapper.createArrayNode()
        aStatsCols.foreach(cols.add)
        m.put(KStatsCols, mapper.writeValueAsString(cols))
      }
      new org.apache.parquet.hadoop.api.WriteSupport.FinalizedWriteContext(m)
    }
  }

  private final class AggBuilder(out: org.apache.parquet.io.OutputFile,
      ws: AggGroupWriteSupport)
      extends org.apache.parquet.hadoop.ParquetWriter.Builder[Group, AggBuilder](out) {
    override def self(): AggBuilder = this
    override def getWriteSupport(conf: Configuration)
        : org.apache.parquet.hadoop.api.WriteSupport[Group] = ws
  }

  /** Header fields from the FOOTER alone — (version, schemaJson, txns,
    * features, writerFeatures). One ranged read; parts 2..n (no
    * header) return empties for everything but the version. The
    * distributed checkpoint WRITER derives the next generation's
    * header from here without touching the previous body. */
  def readHeader(conf: Configuration, src: Path)
      : (Long, String, Map[String, Long], Set[String], Set[String]) = {
    val in = HadoopInputFile.fromPath(src, conf)
    val kv = {
      val r = ParquetFileReader.open(in,
        org.apache.parquet.HadoopReadOptions.builder(conf, src).build())
      try r.getFooter.getFileMetaData.getKeyValueMetaData finally r.close()
    }
    def opt(k: String): Option[String] = Option(kv.get(k))
    val version = opt(KVersion).map(_.toLong).getOrElse(
      throw new java.io.IOException(
        s"loglake: parquet checkpoint $src has no version metadata"))
    val schema = opt(KSchema).getOrElse("")
    val txns: Map[String, Long] = opt(KTxns).map { j =>
      val node = mapper.readTree(j)
      val b = Map.newBuilder[String, Long]
      node.fields().forEachRemaining(e => b += e.getKey -> e.getValue.asLong())
      b.result()
    }.getOrElse(Map.empty)
    def featSet(k: String): Set[String] =
      opt(k).map(_.split(",").filter(_.nonEmpty).toSet).getOrElse(Set.empty)
    (version, schema, txns, featSet(KFeatures), featSet(KWFeatures))
  }

  private def decode(g: Group): AddFile = {
    val nPv = g.getFieldRepetitionCount("pv")
    val pv =
      if (nPv == 0) Map.empty[String, String]
      else {
        val b = Map.newBuilder[String, String]
        var i = 0
        while (i < nPv) {
          val pg = g.getGroup("pv", i)
          b += pg.getString("k", 0) -> pg.getString("v", 0)
          i += 1
        }
        b.result()
      }
    val nSt = g.getFieldRepetitionCount("st")
    val st =
      if (nSt == 0) Map.empty[String, ColStats]
      else {
        val b = Map.newBuilder[String, ColStats]
        var i = 0
        while (i < nSt) {
          val sg = g.getGroup("st", i)
          b += sg.getString("c", 0) -> ColStats(sg.getString("t", 0),
            sg.getString("mn", 0), sg.getString("mx", 0),
            sg.getLong("nulls", 0))
          i += 1
        }
        b.result()
      }
    AddFile(g.getString("path", 0), g.getLong("rows", 0), st,
      g.getLong("bytes", 0), g.getString("dv", 0), g.getLong("dvRows", 0),
      pv, g.getLong("brid", 0))
  }

  def read(conf: Configuration, src: Path): Checkpoint = {
    val (version, schema, txns, features, writerFeatures) =
      readHeader(conf, src)

    val files = new PackedAddFiles.GrowingBuilder
    val reader: ParquetReader[Group] =
      ParquetReader.builder(new GroupReadSupport(), src).withConf(conf).build()
    try {
      var g = reader.read()
      while (g != null) {
        files += decode(g)
        g = reader.read()
      }
    } finally reader.close()
    Checkpoint(version, schema, files.result(), txns,
      features, writerFeatures)
  }

  /** The part's FIRST AddFile alone — a stats-shape sample for write
    * paths that need the table's stats-column policy (which columns
    * carry min/max) without reading any body beyond one record. */
  def readFirst(conf: Configuration, src: Path): Option[AddFile] = {
    val reader: ParquetReader[Group] =
      ParquetReader.builder(new GroupReadSupport(), src).withConf(conf).build()
    try Option(reader.read()).map(decode) finally reader.close()
  }

  /** Does `p` hold for every record's path in this part? Streams the
    * body decoding only the path field — the LEGACY-part fallback for
    * policy questions the footer cannot answer (parts written before
    * the policy footer existed, ADVICE r16); short-circuits on the
    * first counterexample. */
  def forallPaths(conf: Configuration, src: Path)(p: String => Boolean): Boolean = {
    val reader: ParquetReader[Group] =
      ParquetReader.builder(new GroupReadSupport(), src).withConf(conf).build()
    try {
      var g = reader.read()
      while (g != null) {
        if (!p(g.getString("path", 0))) return false
        g = reader.read()
      }
      true
    } finally reader.close()
  }
}
