package graft.sources

import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.{FsAction, FsPermission}

/** Local filesystem with a fork-free `setPermission`.
  *
  * Without libhadoop native IO (absent from this image, and from many
  * container deployments), `RawLocalFileSystem.setPermission` shells out
  * to `/bin/chmod` — and the LOCAL create path calls it for EVERY file
  * (`LocalFSFileOutputStream` ctor), so each created file costs TWO
  * process forks (data file + its `.crc` sidecar) at ~5–10 ms each.
  * Executor thread sampling showed the forks dominating partitioned
  * writes (a 90-partition day layout paid ~180 forks per append).
  *
  * This subclass applies the same permission bits through
  * `java.nio.file.Files.setPosixFilePermissions` — one syscall, exactly
  * what Hadoop's native `NativeIO.chmod` path does when the native lib
  * is present. Semantics are unchanged: same bits, same checksummed
  * LocalFileSystem wrapper (the manifest claim protocol relies on
  * ChecksumFileSystem's pair-coherent rename). Sticky/special bits and
  * non-POSIX stores fall back to the shell path.
  *
  * Wired via `spark.hadoop.fs.file.impl` in [[graft.GraftSession]] — an
  * engine-level platform default, not a bench tune: on a real cluster it
  * governs only `file://` scratch/staging traffic and is strictly the
  * native-lib behavior.
  */
class FastLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem)

class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    if (permission == null) return
    if (permission.getStickyBit) { super.setPermission(p, permission); return }
    try {
      val perms = new java.util.HashSet[PosixFilePermission]()
      def add(a: FsAction, r: PosixFilePermission, w: PosixFilePermission,
          x: PosixFilePermission): Unit = {
        if (a.implies(FsAction.READ)) perms.add(r)
        if (a.implies(FsAction.WRITE)) perms.add(w)
        if (a.implies(FsAction.EXECUTE)) perms.add(x)
      }
      add(permission.getUserAction, OWNER_READ, OWNER_WRITE, OWNER_EXECUTE)
      add(permission.getGroupAction, GROUP_READ, GROUP_WRITE, GROUP_EXECUTE)
      add(permission.getOtherAction, OTHERS_READ, OTHERS_WRITE, OTHERS_EXECUTE)
      java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, perms)
    } catch {
      case _: UnsupportedOperationException | _: java.io.IOException =>
        super.setPermission(p, permission) // non-POSIX store: shell path
    }
  }
}
