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
    s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?($T)\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+([0-9]+|'[\\w-]+')\\s*;?\\s*""".r
  private val RestoreTs =
    s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?($T)\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*""".r
  private val Convert =
    s"""(?is)\\s*CONVERT\\s+TO\\s+LOGLAKE\\s+($T)\\s*;?\\s*""".r
  private val Clone =
    s"""(?is)\\s*CREATE\\s+TABLE\\s+($T)\\s+(SHALLOW|DEEP)\\s+CLONE\\s+($T)\\s*;?\\s*""".r
  private val AddCons =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+($T)\\s+ADD\\s+CONSTRAINT\\s+(\\w+)\\s+CHECK\\s*\\((.+)\\)\\s*;?\\s*""".r
  private val DropCons =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+($T)\\s+DROP\\s+CONSTRAINT\\s+(\\w+)\\s*;?\\s*""".r
  /** Delta's selective-overwrite INSERT: `INSERT INTO t REPLACE WHERE
    * <predicate> <query>` — the predicate/query split happens on the
    * first TOP-LEVEL query keyword (a parenthesized subquery inside the
    * predicate is not a split point). */
  private val InsertReplace =
    s"""(?is)\\s*INSERT\\s+INTO\\s+($T)\\s+REPLACE\\s+WHERE\\s+(.+?)\\s*;?\\s*""".r
  private val ShowParts =
    s"""(?is)\\s*SHOW\\s+PARTITIONS\\s+($T)\\s*;?\\s*""".r
  /** Iceberg-style named refs: `ALTER TABLE t CREATE TAG name [AS OF
    * VERSION n]` / `ALTER TABLE t DROP TAG name` / `SHOW TAGS t`. */
  private val CreateTag =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+($T)\\s+CREATE\\s+TAG\\s+([\\w-]+)(?:\\s+AS\\s+OF\\s+VERSION\\s+([0-9]+))?\\s*;?\\s*""".r
  private val DropTag =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+($T)\\s+DROP\\s+TAG\\s+([\\w-]+)\\s*;?\\s*""".r
  private val ShowTags =
    s"""(?is)\\s*SHOW\\s+TAGS\\s+($T)\\s*;?\\s*""".r
  /** Writable branch refs (write-audit-publish): `ALTER TABLE t
    * CREATE BRANCH name [AS OF VERSION n]` / `ALTER TABLE t PUBLISH
    * BRANCH name` / `ALTER TABLE t DROP BRANCH name` / `SHOW
    * BRANCHES t`. */
  private val CreateBranch =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+($T)\\s+CREATE\\s+BRANCH\\s+([\\w-]+)(?:\\s+AS\\s+OF\\s+VERSION\\s+([0-9]+))?\\s*;?\\s*""".r
  private val PublishBranch =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+($T)\\s+PUBLISH\\s+BRANCH\\s+([\\w-]+)\\s*;?\\s*""".r
  private val DropBranch =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+($T)\\s+DROP\\s+BRANCH\\s+([\\w-]+)\\s*;?\\s*""".r
  private val ShowBranches =
    s"""(?is)\\s*SHOW\\s+BRANCHES\\s+($T)\\s*;?\\s*""".r
  /** Atomic replace (round 17 — Delta's CREATE OR REPLACE TABLE): the
    * AS-SELECT form commits contents + schema as ONE overwrite-class
    * commit on the existing log, time travel preserved ([[LogLake
    * .replaceTable]]). Only the AS form is claimed — a bare column-list
    * CREATE OR REPLACE stays with the delegate/catalog path. */
  private val CreateOrReplace =
    s"""(?is)\\s*CREATE\\s+OR\\s+REPLACE\\s+TABLE\\s+($T)\\s+AS\\s+((?:SELECT|VALUES|WITH|TABLE)\\b.+?)\\s*;?\\s*""".r
  /** Column DEFAULTs (round 17): `ALTER TABLE t ALTER COLUMN c SET
    * DEFAULT <expr>` / `… DROP DEFAULT` — write-time fill on appends
    * that omit the column ([[LogLake.setColumnDefault]]). */
  private val SetDefault =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+($T)\\s+ALTER\\s+COLUMN\\s+(\\w+)\\s+SET\\s+DEFAULT\\s+(.+?)\\s*;?\\s*""".r
  private val DropDefault =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+($T)\\s+ALTER\\s+COLUMN\\s+(\\w+)\\s+DROP\\s+DEFAULT\\s*;?\\s*""".r

  /** SQL-drivable ANN search over a persisted index (round 17):
    * `ANN SEARCH '<indexRoot>' FROM <queryTable> WHERE <predicate>` —
    * rewrites at parse time into [[graft.ops.AnnLake.searchIndex]]'s
    * fully-distributed plan (books broadcast, probe ranking from the
    * cell summary, ADC over stored codes, list-resident re-rank), so
    * the SQL path and the Scala path are the SAME plan, never a
    * driver-side collect. The WHERE clause is mandatory: an unbounded
    * query-vector scan is the one corpus-sized read the search
    * contract forbids. */
  private val AnnSearch =
    s"""(?is)\\s*ANN\\s+SEARCH\\s+($T)\\s+FROM\\s+($T)\\s+WHERE\\s+(.+?)\\s*;?\\s*""".r

  /** `CREATE TABLE t (…)` with column-level GENERATED clauses — claimed
    * only when the balanced column body actually contains GENERATED
    * ALWAYS (the stock grammar rejects the clause); plain CREATEs stay
    * with the delegate/catalog path. */
  private val CreateCols =
    s"""(?is)\\s*CREATE\\s+TABLE\\s+($T)\\s*\\((.+)""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Hist(target) => LogLakeHistoryCommand(target.trim)
    case Detail(target) => LogLakeDetailCommand(target.trim)
    case Restore(target, v) => LogLakeRestoreCommand(target.trim, v.trim)
    case RestoreTs(target, t) => LogLakeRestoreTimestampCommand(target.trim, t)
    case Optim(target, where, zorder) => LogLakeOptimizeCommand(target.trim,
      Option(zorder).toSeq.flatMap(_.split(',')).map(_.trim.stripPrefix("`")
        .stripSuffix("`")).filter(_.nonEmpty), Option(where).map(_.trim))
    case Vac(target, retain, dry) => LogLakeVacuumCommand(target.trim,
      Option(retain).map(_.toDouble), dry != null)
    case Clone(tgt, mode, src) => LogLakeCloneCommand(tgt.trim, src.trim,
      mode.equalsIgnoreCase("deep"))
    case Convert(target) => LogLakeConvertCommand(target.trim)
    case ShowParts(target) => LogLakeShowPartitionsCommand(target.trim)
    case CreateTag(target, name, v) =>
      LogLakeSetTagCommand(target.trim, name, Option(v).map(_.toLong))
    case DropTag(target, name) => LogLakeDropTagCommand(target.trim, name)
    case ShowTags(target) => LogLakeShowTagsCommand(target.trim)
    case CreateBranch(target, name, v) =>
      LogLakeCreateBranchCommand(target.trim, name, Option(v).map(_.toLong))
    case PublishBranch(target, name) =>
      LogLakePublishBranchCommand(target.trim, name)
    case DropBranch(target, name) =>
      LogLakeDropBranchCommand(target.trim, name)
    case ShowBranches(target) => LogLakeShowBranchesCommand(target.trim)
    case AddCons(target, name, expr) =>
      LogLakeAddConstraintCommand(target.trim, name, expr.trim)
    case DropCons(target, name) =>
      LogLakeDropConstraintCommand(target.trim, name)
    case InsertReplace(target, rest) =>
      GraftSqlShapes.splitReplaceWhere(rest) match {
        case Some((pred, query)) =>
          LogLakeInsertReplaceWhereCommand(target.trim, pred, query)
        case None => throw new IllegalArgumentException(
          "loglake: INSERT INTO … REPLACE WHERE needs '<predicate> " +
            s"<SELECT|VALUES|WITH|TABLE …>' after WHERE, got: $rest")
      }
    case CreateCols(target, rest)
        if GraftSqlShapes.hasGeneratedClause(rest) =>
      GraftSqlShapes.parseCreateGenerated(target.trim, rest)
    case CreateOrReplace(target, query) =>
      LogLakeCreateOrReplaceCommand(target.trim, query.trim)
    case DropDefault(target, column) =>
      LogLakeDropColumnDefaultCommand(target.trim, column)
    case SetDefault(target, column, e) =>
      LogLakeSetColumnDefaultCommand(target.trim, column, e.trim)
    case AnnSearch(root, src, pred) =>
      val session = org.apache.spark.sql.SparkSession.active
      val rootDir = root.trim.stripPrefix("'").stripSuffix("'")
        .stripPrefix("\"").stripSuffix("\"")
      graft.ops.AnnLake.searchIndex(session, rootDir,
        session.table(src.trim)
          .filter(org.apache.spark.sql.functions.expr(pred)))
        .queryExecution.logical
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
    StructField("numChangeFiles", LongType, nullable = false),
    StructField("rebaseDistance", LongType, nullable = true),
    StructField("tableFeatures", org.apache.spark.sql.types.ArrayType(
      StringType, containsNull = false), nullable = false))))

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
    LogLake.vacuum(dir, olderThanMs = ms, dryRun = dryRun,
      spark = session).map(Row(_))
  }
}

/** `RESTORE [TABLE] t TO VERSION AS OF n` — Delta's RESTORE on
  * [[LogLake.restore]]: the rollback is itself a NEW commit, history
  * stays intact. */
final case class LogLakeRestoreCommand(target: String,
    toRef: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DescribeTarget.attrs(StructType(Seq(
    StructField("restoredVersion", LongType, nullable = false),
    StructField("newVersion", LongType, nullable = false))))

  override def run(session: SparkSession): Seq[Row] = {
    val dir = DescribeTarget.dir(session, target)
    // strip the quotes and resolve through the ONE ref rule (digit-only
    // tag names are refused at setTag, so bare digits are unambiguous)
    val toVersion = LogLake.resolveVersionRef(dir,
      toRef.stripPrefix("'").stripSuffix("'"))
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

/** `CREATE OR REPLACE TABLE t AS <query>` — atomic replace: one
  * overwrite-class commit swaps schema + contents on the SAME log
  * (readers see old-or-new whole; time travel to the pre-replace
  * version keeps serving), or a plain CREATE when the target does not
  * exist. The stock catalog path would drop-then-create — two commits
  * and a lost history. */
final case class LogLakeCreateOrReplaceCommand(target: String,
    query: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DescribeTarget.attrs(StructType(Seq(
    StructField("version", LongType, nullable = false))))

  override def run(session: SparkSession): Seq[Row] = {
    val dir = DescribeTarget.newTableDir(session, target)
    Seq(Row(LogLake.replaceTable(session, dir, session.sql(query))))
  }
}

final case class LogLakeSetColumnDefaultCommand(target: String,
    column: String, exprSql: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(session: SparkSession): Seq[Row] = {
    LogLake.setColumnDefault(session,
      DescribeTarget.dir(session, target), column, exprSql)
    Seq.empty
  }
}

final case class LogLakeDropColumnDefaultCommand(target: String,
    column: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(session: SparkSession): Seq[Row] = {
    LogLake.dropColumnDefault(DescribeTarget.dir(session, target), column)
    Seq.empty
  }
}

/** Sessionless string surgery for the statements the delegating parser
  * claims beyond regex reach: balanced-paren extraction for CREATE
  * column bodies and the top-level predicate/query split of
  * `INSERT … REPLACE WHERE`. Quote-aware (single quotes and backticks);
  * type resolution stays deferred to execution like every command
  * here. */
private[sources] object GraftSqlShapes {

  /** Scan `s` tracking paren depth and quote state; `f(i, depth)` is
    * called at each unquoted char, and a `true` return stops the scan
    * there. Returns the stop index or -1. */
  private def scan(s: String)(f: (Int, Int) => Boolean): Int = {
    var depth = 0; var i = 0
    var inStr = false; var inTick = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (inTick) { if (c == '`') inTick = false }
      else c match {
        case '\'' => inStr = true
        case '`' => inTick = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ => if (f(i, depth)) return i
      }
      if (!inStr && !inTick && (c == '(' || c == ')') && f(i, depth)) return i
      i += 1
    }
    -1
  }

  /** `rest` begins just after a CREATE's opening paren: the balanced
    * column body and whatever trails the matching close paren. */
  private[sources] def balancedBody(rest: String): Option[(String, String)] = {
    val close = scan(rest)((i, depth) => depth == -1 && rest.charAt(i) == ')')
    if (close < 0) None
    else Some((rest.substring(0, close), rest.substring(close + 1)))
  }

  /** Split one column body on its TOP-LEVEL commas. */
  private[sources] def topLevelSplit(body: String): Seq[String] = {
    val cuts = scala.collection.mutable.ArrayBuffer[Int]()
    scan(body) { (i, depth) =>
      if (depth == 0 && body.charAt(i) == ',') cuts += i
      false
    }
    val bounds = -1 +: cuts.toSeq :+ body.length
    bounds.sliding(2).map { case Seq(a, b) => body.substring(a + 1, b).trim }
      .filter(_.nonEmpty).toSeq
  }

  private def topLevelIndexOf(s: String, word: String): Int = {
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    val w = word.toLowerCase(java.util.Locale.ROOT)
    scan(s) { (i, depth) =>
      depth == 0 && lower.startsWith(w, i) &&
        (i == 0 || !Character.isLetterOrDigit(lower.charAt(i - 1))) &&
        (i + w.length >= s.length ||
          !Character.isLetterOrDigit(lower.charAt(i + w.length)))
    }
  }

  private[sources] def hasGeneratedClause(rest: String): Boolean =
    balancedBody(rest).exists { case (body, _) =>
      topLevelSplit(body).exists(c => topLevelIndexOf(c, "generated") >= 0)
    }

  /** `<predicate> <SELECT|VALUES|WITH|TABLE …>` → (predicate, query),
    * splitting at the first top-level query keyword. */
  private[sources] def splitReplaceWhere(rest: String): Option[(String, String)] = {
    val idx = Seq("select", "values", "with", "table")
      .map(k => topLevelIndexOf(rest, k)).filter(_ >= 0)
    idx.minOption.filter(_ > 0).map(i =>
      (rest.substring(0, i).trim, rest.substring(i).trim))
  }

  private val IdentityClause =
    """(?is)\s*IDENTITY\s*(?:\(\s*START\s+WITH\s+(-?\d+)\s*(?:INCREMENT\s+BY\s+(-?\d+)\s*)?\))?\s*(.*)""".r

  /** One parsed column of a GENERATED-bearing CREATE TABLE. */
  private[sources] final case class GenColDef(name: String, typeSql: String,
      notNull: Boolean, genExpr: Option[String],
      identity: Option[(Long, Long)])

  private def parseColDef(c: String): GenColDef = {
    val (name, afterName) =
      if (c.startsWith("`")) {
        val end = c.indexOf('`', 1)
        require(end > 0, s"loglake: unterminated backtick in column def: $c")
        (c.substring(1, end), c.substring(end + 1))
      } else {
        val sp = c.indexWhere(Character.isWhitespace)
        require(sp > 0, s"loglake: column def needs 'name TYPE …', got: $c")
        (c.substring(0, sp), c.substring(sp))
      }
    val genAt = topLevelIndexOf(afterName, "generated")
    val modifiers = if (genAt < 0) "" else afterName.substring(genAt)
    val beforeGen = if (genAt < 0) afterName else afterName.substring(0, genAt)
    val nnAt = topLevelIndexOf(beforeGen, "not")
    val notNull = nnAt >= 0 &&
      beforeGen.substring(nnAt).matches("(?is)NOT\\s+NULL\\s*")
    val typeSql = (if (nnAt >= 0 && notNull) beforeGen.substring(0, nnAt)
      else beforeGen).trim
    require(typeSql.nonEmpty, s"loglake: column $name has no type in: $c")
    if (genAt < 0) return GenColDef(name, typeSql, notNull, None, None)
    val m = """(?is)GENERATED\s+ALWAYS\s+AS\s+(.*)""".r
    modifiers match {
      case m(tail0) =>
        val tail = tail0.trim
        if (tail.toLowerCase(java.util.Locale.ROOT).startsWith("identity")) {
          tail match {
            case IdentityClause(start, step, trailing) =>
              require(trailing.trim.isEmpty,
                s"loglake: unexpected trailing '$trailing' after IDENTITY in: $c")
              GenColDef(name, typeSql, notNull, None, Some((
                Option(start).map(_.toLong).getOrElse(1L),
                Option(step).map(_.toLong).getOrElse(1L))))
            case other => throw new IllegalArgumentException(
              s"loglake: IDENTITY takes '(START WITH n [INCREMENT BY m])', got: $other")
          }
        } else {
          require(tail.startsWith("("),
            s"loglake: GENERATED ALWAYS AS needs a parenthesized expression, got: $tail")
          balancedBody(tail.substring(1)) match {
            case Some((expr, trailing)) if trailing.trim.isEmpty =>
              GenColDef(name, typeSql, notNull, Some(expr.trim), None)
            case Some((_, trailing)) => throw new IllegalArgumentException(
              s"loglake: unexpected trailing '$trailing' after the generation " +
                s"expression in: $c")
            case None => throw new IllegalArgumentException(
              s"loglake: unbalanced parens in generation expression: $tail")
          }
        }
      case _ => throw new IllegalArgumentException(
        s"loglake: only GENERATED ALWAYS AS (expr) / GENERATED ALWAYS AS " +
          s"IDENTITY column clauses are supported, got: $modifiers")
    }
  }

  private val Trailing =
    """(?is)\s*(?:USING\s+loglake\s*)?(?:PARTITIONED\s+BY\s*\(([^)]*)\)\s*)?;?\s*""".r

  private[sources] def parseCreateGenerated(target: String,
      rest: String): LogicalPlan = {
    val (body, trailing) = balancedBody(rest).getOrElse(
      throw new IllegalArgumentException(
        s"loglake: unbalanced column list in CREATE TABLE $target"))
    val cols = topLevelSplit(body).map(parseColDef)
    val parts = trailing match {
      case Trailing(p) => Option(p).toSeq.flatMap(_.split(','))
        .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
      case other => throw new IllegalArgumentException(
        s"loglake: unsupported clause(s) after the column list of a " +
          s"GENERATED CREATE TABLE: '$other' (supported: USING loglake, " +
          "PARTITIONED BY (…))")
    }
    LogLakeCreateGeneratedCommand(target, cols, parts)
  }
}

/** `SHOW PARTITIONS t` — the live partition inventory straight from
  * the manifest ([[LogLake.partitionsDf]]: metadata-only at any table
  * size), rendered Hive-style (`col=value/...`) with per-partition
  * file/live-row/byte counts. Stock Spark cannot serve this for the
  * loglake catalog (no SupportsPartitionManagement — the spec is
  * immutable identity columns), so the delegating parser claims it. */
final case class LogLakeShowPartitionsCommand(target: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DescribeTarget.attrs(StructType(Seq(
    StructField("partition", StringType, nullable = false),
    StructField("num_files", LongType, nullable = false),
    StructField("num_rows", LongType, nullable = false),
    StructField("size_in_bytes", LongType, nullable = false))))
  override def run(session: SparkSession): Seq[Row] = {
    val dir = DescribeTarget.dir(session, target)
    val df = LogLake.partitionsDf(session, dir)
    val partCols = df.columns.dropRight(3)
    df.collect().toSeq.map { r =>
      val rendered = partCols.zipWithIndex.map { case (c, i) =>
        s"$c=${if (r.isNullAt(i)) LogLake.NullPartitionValue else r.get(i)}"
      }.mkString("/")
      Row(rendered, r.getLong(partCols.length),
        r.getLong(partCols.length + 1), r.getLong(partCols.length + 2))
    }.sortBy(_.getString(0))
  }
}

/** `ALTER TABLE t ADD CONSTRAINT name CHECK (expr)` — Delta's
  * constraint DDL on [[LogLake.addCheckConstraint]]: the current table
  * must already satisfy the expression (one snapshot scan), then every
  * later write validates it on the staged-file stats pass. */
final case class LogLakeAddConstraintCommand(target: String, name: String,
    expr: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(session: SparkSession): Seq[Row] = {
    LogLake.addCheckConstraint(session,
      DescribeTarget.dir(session, target), name, expr)
    Nil
  }
}

/** `ALTER TABLE t DROP CONSTRAINT name`. */
final case class LogLakeDropConstraintCommand(target: String,
    name: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(session: SparkSession): Seq[Row] = {
    LogLake.dropCheckConstraint(DescribeTarget.dir(session, target), name)
    Nil
  }
}

/** `ALTER TABLE t CREATE TAG name [AS OF VERSION n]` — a named ref
  * ([[LogLake.setTag]]): pins the version against vacuum and metadata
  * retention; read back with `VERSION AS OF 'name'`. */
final case class LogLakeSetTagCommand(target: String, name: String,
    version: Option[Long]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(session: SparkSession): Seq[Row] = {
    LogLake.setTag(DescribeTarget.dir(session, target), name, version)
    Nil
  }
}

final case class LogLakeDropTagCommand(target: String,
    name: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(session: SparkSession): Seq[Row] = {
    LogLake.deleteTag(DescribeTarget.dir(session, target), name)
    Nil
  }
}

final case class LogLakeShowTagsCommand(target: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DescribeTarget.attrs(StructType(Seq(
    StructField("tag", StringType, nullable = false),
    StructField("version", LongType, nullable = false))))
  override def run(session: SparkSession): Seq[Row] =
    LogLake.tags(DescribeTarget.dir(session, target)).toSeq.sortBy(_._1)
      .map { case (t, v) => Row(t, v) }
}

/** `ALTER TABLE t CREATE BRANCH name [AS OF VERSION n]` — a writable
  * staging head ([[LogLake.createBranch]]); write to it with any API
  * against [[LogLake.branchDir]], then `PUBLISH BRANCH` lands the net
  * delta on main as one atomic commit (write-audit-publish). */
final case class LogLakeCreateBranchCommand(target: String, name: String,
    version: Option[Long]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DescribeTarget.attrs(StructType(Seq(
    StructField("baseVersion", LongType, nullable = false))))
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(LogLake.createBranch(session,
      DescribeTarget.dir(session, target), name, version)))
}

final case class LogLakePublishBranchCommand(target: String,
    name: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DescribeTarget.attrs(StructType(Seq(
    StructField("version", LongType, nullable = false))))
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(LogLake.publishBranch(session,
      DescribeTarget.dir(session, target), name)))
}

final case class LogLakeDropBranchCommand(target: String,
    name: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(session: SparkSession): Seq[Row] = {
    LogLake.dropBranch(DescribeTarget.dir(session, target), name)
    Nil
  }
}

final case class LogLakeShowBranchesCommand(target: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DescribeTarget.attrs(StructType(Seq(
    StructField("branch", StringType, nullable = false),
    StructField("baseVersion", LongType, nullable = false),
    StructField("headVersion", LongType, nullable = false))))
  override def run(session: SparkSession): Seq[Row] = {
    val dir = DescribeTarget.dir(session, target)
    LogLake.branches(dir).toSeq.sortBy(_._1).map { case (b, base) =>
      Row(b, base, LogLake.currentVersion(LogLake.branchDir(dir, b)))
    }
  }
}

/** `INSERT INTO t REPLACE WHERE <predicate> <query>` — Delta's
  * selective overwrite as SQL, lowered onto [[LogLake.overwriteWhere]]:
  * one atomic commit replaces exactly the predicate's region with the
  * query's rows (partition predicates resolve metadata-only; incoming
  * rows outside the region are rejected loudly before anything
  * commits). Columns align by POSITION, standard INSERT semantics. */
final case class LogLakeInsertReplaceWhereCommand(target: String,
    predicate: String, query: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DescribeTarget.attrs(StructType(Seq(
    StructField("version", LongType, nullable = false))))
  override def run(session: SparkSession): Seq[Row] = {
    val dir = DescribeTarget.dir(session, target)
    val df = session.sql(query)
    // positional alignment to the table's NON-identity columns: an
    // ALWAYS identity column can never be supplied, so the query must
    // not produce it (the engine assigns fresh values to the region's
    // replacement rows)
    val ids = LogLake.identityColumns(dir).keySet
    val cols = LogLake.cleanSchema(LogLake.activeState(dir)._2).fieldNames
      .filterNot(ids)
    require(df.columns.length == cols.length,
      s"loglake: REPLACE WHERE query produces ${df.columns.length} " +
        s"column(s), table $target takes ${cols.length} " +
        s"(${cols.mkString(", ")} — identity columns are engine-assigned)")
    val v = LogLake.overwriteWhere(session, dir, df.toDF(cols.toIndexedSeq: _*),
      org.apache.spark.sql.functions.expr(predicate))
    Seq(Row(v))
  }
}

/** `CREATE TABLE t (… GENERATED ALWAYS AS (expr) / AS IDENTITY …)` —
  * the Delta column clauses the stock grammar lacks, lowered onto
  * createEmpty + setGeneratedColumn/setIdentityColumn (the path-API
  * features, now reachable from SQL alone). Types resolve through the
  * session parser at execution; the empty table trivially passes the
  * generation-consistency scan, so clause order never matters. */
private[sources] final case class LogLakeCreateGeneratedCommand(target: String,
    cols: Seq[GraftSqlShapes.GenColDef], partitionBy: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DescribeTarget.attrs(StructType(Seq(
    StructField("version", LongType, nullable = false))))
  override def run(session: SparkSession): Seq[Row] = {
    val dir = DescribeTarget.newTableDir(session, target)
    val schema = StructType(cols.map(c => StructField(c.name,
      session.sessionState.sqlParser.parseDataType(c.typeSql),
      nullable = !c.notNull)))
    val v = LogLake.createEmpty(dir, schema, partitionBy = partitionBy)
    cols.foreach { c =>
      c.genExpr.foreach(e => LogLake.setGeneratedColumn(session, dir, c.name, e))
      c.identity.foreach { case (start, step) =>
        LogLake.setIdentityColumn(dir, c.name, start, step) }
    }
    Seq(Row(v))
  }
}

/** `DESCRIBE DETAIL` — [[LogLake.detailDf]]'s one-row summary. */
final case class LogLakeDetailCommand(target: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    DescribeTarget.attrs(LogLake.DetailSchema)

  override def run(session: SparkSession): Seq[Row] =
    LogLake.detailDf(session, DescribeTarget.dir(session, target))
      .collect().toSeq
}
