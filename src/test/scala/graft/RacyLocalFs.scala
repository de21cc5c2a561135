package graft

import java.net.URI
import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A local FileSystem with S3-family create semantics: `create(f,
  * overwrite = false)` NEVER fails on an existing file — the atomic
  * exclusive-create the lease protocol leans on simply does not exist
  * (object stores have no atomic create-if-absent PUT). Registered
  * under the `racy:` scheme in specs to prove the generation protocol
  * stays correct when the lease degrades to advisory and BOTH cold
  * writers win it. */
class RacyLocalFs extends RawLocalFileSystem {
  override def getScheme: String = "racy"
  override def getUri: URI = URI.create("racy:///")

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    super.create(f, true, bufferSize, replication, blockSize, progress)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    super.create(f, permission, true, bufferSize, replication, blockSize,
      progress)
}
