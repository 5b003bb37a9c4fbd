package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

/** The Delta DDL the stock Spark grammar does not have — audit
  * (`DESCRIBE HISTORY` / `DESCRIBE DETAIL`) and maintenance
  * (`OPTIMIZE` / `VACUUM` / `RESTORE`) — grafted in front of the
  * session parser (Delta's own technique: a delegating parser that
  * claims only its statements and hands EVERYTHING else through
  * verbatim, injected via `SparkSessionExtensions.injectParser`).
  *
  * ```sql
  * DESCRIBE HISTORY loglake.db.t               -- commit trail, newest first
  * DESCRIBE HISTORY '/path/to/t'               -- same, by table path
  * DESCRIBE DETAIL  loglake.db.t               -- one-row snapshot summary
  * OPTIMIZE loglake.db.t ZORDER BY (a, b)      -- incremental compaction
  * OPTIMIZE loglake.db.t WHERE part = 'x'      -- partition-scoped
  * VACUUM loglake.db.t RETAIN 0.0 HOURS DRY RUN
  * RESTORE TABLE loglake.db.t TO VERSION AS OF 3
  * RESTORE TABLE loglake.db.t TO TIMESTAMP AS OF '2026-01-01'
  * ```
  *
  * The audit statements are manifest-sized at any table scale — the
  * log walk in [[LogLake.historyDf]] / one snapshot resolve in
  * [[LogLake.detailDf]]; no data file is ever opened. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  /** A statement TARGET: a (possibly backticked) identifier chain or a
    * quoted path — never free text with spaces/parens, so a stock
    * statement whose string literal or comment happens to contain
    * "SHALLOW CLONE" (a CTAS, say) is never claimed away from the
    * delegate parser. */
  private val T = """(?:'[^']*'|"[^"]*"|(?:[\w.]|`[^`]*`)+)"""
  private val Hist = s"""(?is)\\s*DESC(?:RIBE)?\\s+HISTORY\\s+($T)\\s*;?\\s*""".r
  private val Detail = s"""(?is)\\s*DESC(?:RIBE)?\\s+DETAIL\\s+($T)\\s*;?\\s*""".r
  private val Optim =
    s"""(?is)\\s*OPTIMIZE\\s+($T)(?:\\s+WHERE\\s+(.+?))?(?:\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\))?\\s*;?\\s*""".r
  private val Vac =
    s"""(?is)\\s*VACUUM\\s+($T)(?:\\s+RETAIN\\s+([0-9.]+)\\s+HOURS)?(\\s+DRY\\s+RUN)?\\s*;?\\s*""".r
  private val Restore =
    s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?($T)\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+([0-9]+)\\s*;?\\s*""".r
  private val RestoreTs =
    s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?($T)\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*""".r
  private val Convert =
    s"""(?is)\\s*CONVERT\\s+TO\\s+LOGLAKE\\s+($T)\\s*;?\\s*""".r
  private val Clone =
    s"""(?is)\\s*CREATE\\s+TABLE\\s+($T)\\s+(SHALLOW|DEEP)\\s+CLONE\\s+($T)\\s*;?\\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Hist(target) => LogLakeHistoryCommand(target.trim)
    case Detail(target) => LogLakeDetailCommand(target.trim)
    case Restore(target, v) => LogLakeRestoreCommand(target.trim, v.toLong)
    case RestoreTs(target, t) => LogLakeRestoreTimestampCommand(target.trim, t)
    case Optim(target, where, zorder) => LogLakeOptimizeCommand(target.trim,
      Option(zorder).toSeq.flatMap(_.split(',')).map(_.trim.stripPrefix("`")
        .stripSuffix("`")).filter(_.nonEmpty), Option(where).map(_.trim))
    case Vac(target, retain, dry) => LogLakeVacuumCommand(target.trim,
      Option(retain).map(_.toDouble), dry != null)
    case Clone(tgt, mode, src) => LogLakeCloneCommand(tgt.trim, src.trim,
      mode.equalsIgnoreCase("deep"))
    case Convert(target) => LogLakeConvertCommand(target.trim)
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

private[sources] object DescribeTarget {

  /** Resolve the statement's target — `'path'`, `"path"`, or a
    * catalog identifier whose catalog is a [[LogLakeCatalog]] — to the
    * table directory. Resolution happens at EXECUTION time (the parser
    * must stay side-effect-free and sessionless). */
  def dir(session: SparkSession, target: String): String = {
    val t = target.trim
    if ((t.startsWith("'") && t.endsWith("'") && t.length >= 2) ||
        (t.startsWith("\"") && t.endsWith("\"") && t.length >= 2))
      return t.substring(1, t.length - 1)
    val parts = session.sessionState.sqlParser.parseMultipartIdentifier(t)
    val resolved = parts match {
      case Seq(one) =>
        session.sessionState.catalogManager.currentCatalog match {
          case c: LogLakeCatalog =>
            Some(c -> Identifier.of(
              session.sessionState.catalogManager.currentNamespace, one))
          case _ => None
        }
      case cat +: rest =>
        try session.sessionState.catalogManager.catalog(cat) match {
          case c: LogLakeCatalog =>
            Some(c -> Identifier.of(rest.init.toArray, rest.last))
          case _ => None
        } catch { case _: Exception => None }
    }
    resolved match {
      case Some((c, ident)) => c.loadTable(ident) match {
        case t: LogLakeV2Table => t.dir
        case other => throw new IllegalArgumentException(
          s"loglake: $target is not a loglake table (${other.getClass.getName})")
      }
      case None => throw new IllegalArgumentException(
        s"loglake: DESCRIBE HISTORY/DETAIL takes a loglake catalog table " +
          s"or a quoted table path, got '$target'")
    }
  }

  def attrs(s: StructType): Seq[Attribute] =
    s.fields.toSeq.map(f => AttributeReference(f.name, f.dataType, f.nullable)())

  /** Directory for a table identifier that need not exist yet (CLONE
    * targets) — quoted path, or a loglake-catalog identifier mapped
    * through the catalog's warehouse layout. */
  def newTableDir(session: SparkSession, target: String): String = {
    val t = target.trim
    if ((t.startsWith("'") && t.endsWith("'") && t.length >= 2) ||
        (t.startsWith("\"") && t.endsWith("\"") && t.length >= 2))
      return t.substring(1, t.length - 1)
    val parts = session.sessionState.sqlParser.parseMultipartIdentifier(t)
    parts match {
      case cat +: rest if rest.nonEmpty =>
        try session.sessionState.catalogManager.catalog(cat) match {
          case c: LogLakeCatalog =>
            return c.tableDir(Identifier.of(rest.init.toArray, rest.last))
          case _ =>
        } catch { case _: Exception => }
      case _ =>
    }
    throw new IllegalArgumentException(
      s"loglake: CLONE target must be a loglake catalog identifier or a " +
        s"quoted path, got '$target'")
  }
}

/** `CREATE TABLE t [SHALLOW|DEEP] CLONE src` — Delta's CLONE DDL:
  * SHALLOW references the source snapshot's files (metadata-only,
  * instant, source VACUUM can break it); DEEP copies them
  * executor-parallel into an independent table. */
final case class LogLakeCloneCommand(target: String, source: String,
    deep: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DescribeTarget.attrs(StructType(Seq(
    StructField("version", LongType, nullable = false))))

  override def run(session: SparkSession): Seq[Row] = {
    val src = DescribeTarget.dir(session, source)
    val dst = DescribeTarget.newTableDir(session, target)
    val v =
      if (deep) LogLake.cloneDeep(session, src, dst)
      else LogLake.cloneShallow(session, src, dst)
    Seq(Row(v))
  }
}

/** `DESCRIBE HISTORY` — [[LogLake.historyDf]] rows, newest first. */
final case class LogLakeHistoryCommand(target: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DescribeTarget.attrs(StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("operation", StringType, nullable = false),
    StructField("txnId", StringType, nullable = true),
    StructField("readVersion", LongType, nullable = false),
    StructField("numAddedFiles", LongType, nullable = false),
    StructField("numAddedRows", LongType, nullable = false),
    StructField("numRemovedFiles", LongType, nullable = false),
    StructField("numRemovedRows", LongType, nullable = false),
    StructField("numChangeFiles", LongType, nullable = false))))

  override def run(session: SparkSession): Seq[Row] =
    LogLake.historyDf(session, DescribeTarget.dir(session, target))
      .collect().toSeq
}

/** `OPTIMIZE t [ZORDER BY (c, …)]` — Delta's maintenance DDL, lowered
  * onto [[LogLake.optimize]]'s INCREMENTAL form: only files below the
  * target size (`spark.loglake.optimize.targetFileSizeBytes`, default
  * 128 MB — the Delta/parquet sweet spot) or carrying deletion vectors
  * rewrite; the output file count is sized so compacted data lands AT
  * the target. Steady-state cost tracks small-file volume, never table
  * size. Returns (version, file counts before/after). */
final case class LogLakeOptimizeCommand(target: String,
    zorderCols: Seq[String], where: Option[String] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DescribeTarget.attrs(StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("numFilesBefore", LongType, nullable = false),
    StructField("numFilesAfter", LongType, nullable = false))))

  override def run(session: SparkSession): Seq[Row] = {
    val dir = DescribeTarget.dir(session, target)
    val targetBytes = session.conf
      .getOption("spark.loglake.optimize.targetFileSizeBytes")
      .map(_.toLong).getOrElse(128L * 1024 * 1024)
    val before = LogLake.detailDf(session, dir)
      .select("numFiles", "sizeInBytes").collect().head
    val numOut = math.max(1L,
      (before.getLong(1) + targetBytes - 1) / targetBytes).toInt
    val v = LogLake.optimize(session, dir, numOut, zorderCols,
      onlySmallerThan = targetBytes,
      where = where.map(org.apache.spark.sql.functions.expr))
    val after = LogLake.detailDf(session, dir).select("numFiles")
      .collect().head.getLong(0)
    Seq(Row(v, before.getLong(0), after))
  }
}

/** `VACUUM t [RETAIN n HOURS] [DRY RUN]` — Delta's reclamation DDL on
  * [[LogLake.vacuum]]; returns the (to-be-)deleted paths. */
final case class LogLakeVacuumCommand(target: String,
    retainHours: Option[Double], dryRun: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DescribeTarget.attrs(StructType(Seq(
    StructField("path", StringType, nullable = false))))

  override def run(session: SparkSession): Seq[Row] = {
    val dir = DescribeTarget.dir(session, target)
    val ms = retainHours.map(h => (h * 3600 * 1000).toLong)
      .getOrElse(7L * 24 * 3600 * 1000)
    LogLake.vacuum(dir, olderThanMs = ms, dryRun = dryRun).map(Row(_))
  }
}

/** `RESTORE [TABLE] t TO VERSION AS OF n` — Delta's RESTORE on
  * [[LogLake.restore]]: the rollback is itself a NEW commit, history
  * stays intact. */
final case class LogLakeRestoreCommand(target: String,
    toVersion: Long) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DescribeTarget.attrs(StructType(Seq(
    StructField("restoredVersion", LongType, nullable = false),
    StructField("newVersion", LongType, nullable = false))))

  override def run(session: SparkSession): Seq[Row] = {
    val dir = DescribeTarget.dir(session, target)
    val v = LogLake.restore(session, dir, toVersion)
    Seq(Row(toVersion, v))
  }
}

/** `RESTORE [TABLE] t TO TIMESTAMP AS OF '<ts>'` — resolves through
  * the same monotonic in-commit clock as every time-travel read. */
final case class LogLakeRestoreTimestampCommand(target: String,
    timestamp: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DescribeTarget.attrs(StructType(Seq(
    StructField("restoredVersion", LongType, nullable = false),
    StructField("newVersion", LongType, nullable = false))))

  override def run(session: SparkSession): Seq[Row] = {
    val dir = DescribeTarget.dir(session, target)
    val toVersion = LogLake.versionAtTimestamp(dir,
      LogLake.parseTimestampMillis(timestamp))
    val v = LogLake.restore(session, dir, toVersion)
    Seq(Row(toVersion, v))
  }
}

/** `CONVERT TO LOGLAKE parquet.`/path`` (or a quoted path) — Delta's
  * CONVERT on [[LogLake.convert]]: adopt an existing flat parquet
  * directory in place, zero bytes rewritten. */
final case class LogLakeConvertCommand(target: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DescribeTarget.attrs(StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("numConvertedFiles", LongType, nullable = false))))

  override def run(session: SparkSession): Seq[Row] = {
    val t = target.trim
    val dir =
      if (t.toLowerCase(java.util.Locale.ROOT).startsWith("parquet."))
        t.substring("parquet.".length).stripPrefix("`").stripSuffix("`")
      else if ((t.startsWith("'") && t.endsWith("'")) ||
        (t.startsWith("\"") && t.endsWith("\"")))
        t.substring(1, t.length - 1)
      else throw new IllegalArgumentException(
        "loglake: CONVERT TO LOGLAKE takes parquet.`/path` or a quoted " +
          s"path to a flat parquet directory, got '$target'")
    val v = LogLake.convert(session, dir)
    Seq(Row(v, LogLake.detailDf(session, dir)
      .select("numFiles").collect().head.getLong(0)))
  }
}

/** `DESCRIBE DETAIL` — [[LogLake.detailDf]]'s one-row summary. */
final case class LogLakeDetailCommand(target: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DescribeTarget.attrs(StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("location", StringType, nullable = false),
    StructField("version", LongType, nullable = false),
    StructField("numFiles", LongType, nullable = false),
    StructField("numRows", LongType, nullable = false),
    StructField("sizeInBytes", LongType, nullable = false),
    StructField("partitionColumns", ArrayType(StringType), nullable = false),
    StructField("properties", MapType(StringType, StringType), nullable = false))))

  override def run(session: SparkSession): Seq[Row] =
    LogLake.detailDf(session, DescribeTarget.dir(session, target))
      .collect().toSeq
}
