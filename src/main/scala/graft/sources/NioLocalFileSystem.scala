package graft.sources

import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem whose chmod is an in-process java.nio call.
  *
  * Without libhadoop (this environment ships none), Hadoop's
  * `RawLocalFileSystem.setPermission` forks `/bin/chmod` PER CALL —
  * measured 283 subprocess forks in one loglake-heavy query (q141:
  * every staged part, checkpoint part, manifest and directory pays
  * one), each a fork+exec out of a multi-GB-RSS JVM. `setPermission`
  * is the ONLY exec site in hadoop 3.4.2's RawLocalFileSystem (both
  * the mkdirs-with-mode and create-with-permission paths route through
  * it), so overriding just it removes every per-file fork while
  * preserving semantics: the same 9 permission bits are applied, via
  * `Files.setPosixFilePermissions`. Bits NIO cannot express (sticky/
  * setuid/setgid) fall back to the parent's shell path — loglake never
  * sets them, so the fallback is dead in practice but keeps the
  * override exactly as capable as what it replaces.
  */
final class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, perm: FsPermission): Unit = {
    val bits: Int = perm.toShort & 0xffff
    if ((bits & ~0x1ff) != 0) super.setPermission(p, perm)
    else {
      val order = Array(
        OWNER_READ, OWNER_WRITE, OWNER_EXECUTE,
        GROUP_READ, GROUP_WRITE, GROUP_EXECUTE,
        OTHERS_READ, OTHERS_WRITE, OTHERS_EXECUTE)
      val set = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
      var i = 0
      while (i < 9) {
        if ((bits & (1 << (8 - i))) != 0) set.add(order(i))
        i += 1
      }
      java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, set)
      ()
    }
  }
}

/** The `fs.file.impl` registration point: LocalFileSystem's checksum
  * layer over the fork-free raw FS. Wired in [[graft.Sessions]]
  * (Spark's hadoop conf — parquet writers, committers, scans) and
  * [[WireLog.fs]] (the table formats' direct metadata I/O). */
class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem)
