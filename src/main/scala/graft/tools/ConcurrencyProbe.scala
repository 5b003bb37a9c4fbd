package graft.tools

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.sources.LogLake

/** MULTI-PROCESS concurrent-writer stress probe (VERDICT r10 #5): the
  * CAS commit protocol's in-process race specs (`LogLakeSpec`) prove
  * the read-back rule under threads; a real object-store deployment
  * races SEPARATE JVMs with no shared memory at all. This probe forks
  * N worker JVMs (same classpath + --add-opens as the parent) against
  * ONE table directory — appenders (optimistic, auto-retry), mergers
  * and an optimizer (serializable, whole-op retry on snapshot
  * conflict) — then asserts from the commit log alone:
  *
  *   1. versions are contiguous 1..V — no gap, no duplicate (no commit
  *      lost, no commit double-published);
  *   2. every serializable op's manifest has readVersion == version-1
  *      (it really did re-validate against its immediate parent);
  *   3. every row a worker reported committed is in the final snapshot
  *      EXACTLY once (appends tagged (worker, seq) — nothing lost,
  *      nothing duplicated);
  *   4. every version a worker reported is in the log with the op it
  *      claimed.
  *
  * Prints one JSON line (commit/retry counts per role) and exits
  * nonzero on any violation. Results land in BASELINE.md.
  *
  * Run: `sbt "runMain graft.tools.ConcurrencyProbe"` (or raw java with
  * the build's --add-opens list, see tools/scaling_curve.sh).
  */
object ConcurrencyProbe {

  private case class Claim(role: String, txn: String, version: Long, retries: Long)

  def main(args: Array[String]): Unit = args.toList match {
    case "--worker" :: role :: dir :: out :: id :: Nil => worker(role, dir, out, id.toInt)
    case _ => driver()
  }

  // ------------------------------------------------------------ worker

  private def worker(role: String, dir: String, out: String, id: Int): Unit = {
    val spark = Sessions.builder("local[2]", 2)
      .appName(s"concprobe-$role-$id").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val claims = scala.collection.mutable.ArrayBuffer[Claim]()

    def serializableRetry(txn: String)(op: => Long): (Long, Long) = {
      var retries = 0L
      while (true) {
        try return (op, retries)
        catch {
          case e: java.io.IOException if retries < 50 &&
              e.getMessage != null && e.getMessage.contains("concurrent commit") =>
            retries += 1
            Thread.sleep(20L + scala.util.Random.nextInt(80))
        }
      }
      throw new IllegalStateException("unreachable")
    }

    role match {
      case "append" =>
        (0 until 5).foreach { i =>
          val txn = s"w$id-append-$i"
          val df = Seq.tabulate(100)(j => (id, i, j.toLong)).toDF("w", "i", "j")
          val v = LogLake.append(spark, dir, df, txnId = txn)
          claims += Claim(role, txn, v, 0L)
        }
      case "merge" =>
        (0 until 3).foreach { i =>
          val txn = s"w$id-merge-$i"
          // upsert over the SEED keys only (w = -1): row count stays
          // put, every merge rewrites the same contended file set
          val src = Seq.tabulate(50)(j => (-1, id * 10 + i, j.toLong))
            .toDF("w", "i", "j")
          val (v, r) = serializableRetry(txn)(
            LogLake.merge(spark, dir, src, Seq("w", "j"), txnId = txn))
          claims += Claim(role, txn, v, r)
        }
      case "optimize" =>
        (0 until 2).foreach { i =>
          val txn = s"w$id-opt-$i"
          val (v, r) = serializableRetry(txn)(
            LogLake.optimize(spark, dir, numFiles = 2, txnId = txn))
          claims += Claim(role, txn, v, r)
          Thread.sleep(200)
        }
    }
    val json = claims.map(c =>
      s"""{"role":"${c.role}","txn":"${c.txn}","version":${c.version},"retries":${c.retries}}""")
      .mkString("[", ",", "]")
    Files.write(Paths.get(out), json.getBytes("UTF-8"))
    spark.stop()
  }

  // ------------------------------------------------------------ driver

  private def driver(): Unit = {
    val spark = Sessions.builder("local[4]", 4).appName("concprobe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = Files.createTempDirectory("concprobe").toString
    val dir = s"$base/t"
    // seed: the contended merge keys (w = -1)
    LogLake.create(spark, dir,
      Seq.tabulate(50)(j => (-1, -1, j.toLong)).toDF("w", "i", "j"))

    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.filter(_.startsWith("--add-opens")).toSeq
    val cp = System.getProperty("java.class.path")
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString

    val workers = Seq.tabulate(3)(i => ("append", i)) ++
      Seq.tabulate(2)(i => ("merge", 100 + i)) ++ Seq(("optimize", 200))
    val procs = workers.map { case (role, id) =>
      val out = s"$base/claims-$role-$id.json"
      val cmd = (Seq(javaBin, "-Xmx3g", "-cp", cp) ++ jvmArgs ++
        Seq("graft.tools.ConcurrencyProbe", "--worker", role, dir, out,
          id.toString)).asJava
      val pb = new ProcessBuilder(cmd)
      pb.redirectErrorStream(true)
      pb.redirectOutput(new java.io.File(s"$base/log-$role-$id.txt"))
      (role, id, out, pb.start())
    }
    val exits = procs.map { case (role, id, out, p) =>
      val code = if (p.waitFor(15, java.util.concurrent.TimeUnit.MINUTES))
        p.exitValue() else { p.destroyForcibly(); -1 }
      (role, id, out, code)
    }
    var violations = List.empty[String]
    exits.filter(_._4 != 0).foreach { case (role, id, _, code) =>
      violations ::= s"worker $role-$id exited $code (see $base/log-$role-$id.txt)"
    }

    // parse every worker's claims
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val claims = exits.filter(_._4 == 0).flatMap { case (_, _, out, _) =>
      mapper.readTree(new String(Files.readAllBytes(Paths.get(out)), "UTF-8"))
        .elements().asScala.map(n => Claim(n.get("role").asText(),
          n.get("txn").asText(), n.get("version").asLong(),
          n.get("retries").asLong())).toSeq
    }

    // 1+2+4: log structure — contiguous, serializable parents, claims present
    val hist = LogLake.history(dir)
    val versions = hist.map(_.version)
    if (versions != (1L to versions.size.toLong))
      violations ::= s"version gap/duplicate: $versions"
    // a serializable op may commit ABOVE its read version only by
    // rebasing over provably non-conflicting winners — re-derive the
    // commit protocol's rule from the log alone and check every
    // intervening manifest against it
    val byVersion = hist.map(m => m.version -> m).toMap
    val safeCarrier = Set("optimize", "delete")
    hist.filter(m => Set("merge", "optimize", "overwrite", "delete",
        "update")(m.op))
      .foreach { m =>
        val ourRm = m.removes.toSet
        ((m.readVersion + 1) until m.version).map(byVersion).foreach { w =>
          val ok = w.schemaJson == m.schemaJson &&
            w.removes.forall(p => !ourRm(p)) &&
            (w.removes.isEmpty && w.op == "append" ||
              safeCarrier(w.op) || safeCarrier(m.op))
          if (!ok) violations ::=
            s"${m.op}@${m.version} (read ${m.readVersion}) rebased over " +
              s"conflicting ${w.op}@${w.version}"
        }
      }
    val byTxn = hist.filter(_.txnId.nonEmpty).map(m => m.txnId -> m).toMap
    claims.foreach { c =>
      byTxn.get(c.txn) match {
        case None => violations ::= s"claimed txn ${c.txn} missing from the log"
        case Some(m) if m.version != c.version =>
          violations ::= s"txn ${c.txn} claimed v${c.version}, log has v${m.version}"
        case _ =>
      }
    }

    // 3: every appended row present exactly once
    val snap = LogLake.snapshot(spark, dir)
    val appendCells = snap.filter(col("w") >= 0)
      .groupBy("w", "i").agg(count(lit(1)).as("cnt"))
      .as[(Int, Int, Long)].collect()
      .map { case (w, i, c) => (w, i) -> c }.toMap
    val claimedAppends = claims.filter(_.role == "append")
      .map(c => c.txn.split("-") match {
        case Array(w, _, i) => (w.stripPrefix("w").toInt, i.toInt)
      })
    claimedAppends.foreach { cell =>
      appendCells.get(cell) match {
        case Some(100L) =>
        case other => violations ::=
          s"append cell $cell has ${other.getOrElse(0L)} rows, expected 100"
      }
    }
    if (appendCells.size != claimedAppends.size)
      violations ::= s"snapshot has ${appendCells.size} append cells, " +
        s"workers claimed ${claimedAppends.size}"
    // merge keys intact (upserts never add/drop seed rows)
    val seedCount = snap.filter(col("w") === -1).count()
    if (seedCount != 50L) violations ::= s"seed keys: $seedCount, expected 50"

    val retrySum = claims.groupBy(_.role).view
      .mapValues(cs => (cs.size, cs.map(_.retries).sum)).toMap
    println(s"""{"metric":"concurrency_probe","workers":${workers.size},""" +
      s""""versions":${versions.size},""" +
      s""""claims":${claims.size},""" +
      retrySum.toSeq.sortBy(_._1).map { case (r, (n, rt)) =>
        s""""${r}_commits":$n,"${r}_retries":$rt""" }.mkString(",") +
      s""","violations":${violations.size}}""")
    violations.reverse.foreach(v => System.err.println(s"VIOLATION: $v"))
    spark.stop()
    if (violations.nonEmpty) sys.exit(1)
  }
}
