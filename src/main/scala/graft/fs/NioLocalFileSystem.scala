package graft.fs

import java.nio.file.Files
import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._
import java.util.EnumSet

import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}

/** RawLocalFileSystem whose `setPermission` is pure-JVM java.nio instead
  * of a forked `chmod` subprocess.
  *
  * Without libhadoop (NativeIO) — the stock situation on this and most
  * non-Hadoop-native hosts, announced by the NativeCodeLoader warning at
  * startup — `RawLocalFileSystem.setPermission` falls back to
  * `Shell.execCommand("chmod", ...)`: one fork/exec of a subprocess from
  * the multi-GB JVM PER created file and directory. Every parquet store
  * write pays it (file create, .crc create, each mkdirs level, committer
  * dirs). Measured on q_compact_apply's 720-directory fragment write:
  * the write stage ran 325 s of task time for 9.6 s of CPU — 97% of it
  * blocked in ProcessImpl.forkAndExec under RawLocalFileSystem
  * .setPermission (thread dump, optimization guide §7.3) — and dropped
  * to ~2 s of task time with this class installed. On a real cluster
  * (HDFS/S3) this code path is never taken; locally it removes a
  * pathological constant from every store-building lane without touching
  * what any query computes.
  *
  * Setuid/setgid/sticky bits fall back to the stock shell path — java
  * PosixFilePermission cannot express them (never used by Spark's
  * committers; the fallback keeps semantics exact if anything ever asks).
  */
class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit =
    if (permission != null) {
      val m: Int = permission.toShort.toInt
      if ((m & ~0x1ff) != 0) super.setPermission(p, permission)
      else {
        val s = EnumSet.noneOf(classOf[PosixFilePermission])
        if ((m & 0x100) != 0) s.add(OWNER_READ)
        if ((m & 0x080) != 0) s.add(OWNER_WRITE)
        if ((m & 0x040) != 0) s.add(OWNER_EXECUTE)
        if ((m & 0x020) != 0) s.add(GROUP_READ)
        if ((m & 0x010) != 0) s.add(GROUP_WRITE)
        if ((m & 0x008) != 0) s.add(GROUP_EXECUTE)
        if ((m & 0x004) != 0) s.add(OTHERS_READ)
        if ((m & 0x002) != 0) s.add(OTHERS_WRITE)
        if ((m & 0x001) != 0) s.add(OTHERS_EXECUTE)
        // Fall back to the stock shell-chmod path when the file store has
        // no POSIX attribute view (FAT/some NFS mounts) — the nio call
        // throws UnsupportedOperationException there, where the shell path
        // would have worked (round-20 advice).
        try { Files.setPosixFilePermissions(pathToFile(p).toPath, s); () }
        catch {
          case _: UnsupportedOperationException =>
            super.setPermission(p, permission)
        }
      }
    }
}

/** The checksummed local filesystem (what `file://` resolves to by
  * default) over [[NioRawLocalFileSystem]] — register with
  * `spark.hadoop.fs.file.impl=graft.fs.NioLocalFileSystem`. Read/write
  * semantics (CRC sidecars included) are stock LocalFileSystem's; only
  * the permission syscall path changes. */
class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem)
