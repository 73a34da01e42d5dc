package graft

import java.io.File
import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Local-directory-backed `gs://` FileSystem — the test double for the S5
  * object-store path. Registered via `fs.gs.impl` exactly like the real
  * GCS connector; maps `gs://<bucket>/<key>` → `<fs.gs.fake.root>/<bucket>/
  * <key>` so the whole pipeline (listing, glob, codec, read) exercises a
  * foreign scheme end-to-end without network.
  */
class FakeGsFileSystem extends FileSystem {

  private var fsUri: URI = _
  private var root: String = _
  private var local: FileSystem = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    fsUri = URI.create(s"gs://${name.getAuthority}")
    root = conf.get("fs.gs.fake.root", "/tmp/fake-gcs")
    local = FileSystem.getLocal(conf).getRawFileSystem
  }

  override def getScheme: String = "gs"
  override def getUri: URI = fsUri

  private def toLocal(p: Path): Path = {
    val u = p.toUri
    new Path(new File(root, u.getAuthority + u.getPath).getAbsolutePath)
  }

  private def fromLocal(p: Path): Path = {
    val abs = new File(p.toUri.getPath).getAbsolutePath
    val rel = abs.stripPrefix(new File(root).getAbsolutePath).stripPrefix("/")
    val slash = rel.indexOf('/')
    if (slash < 0) new Path(s"gs://$rel/")
    else new Path(s"gs://${rel.substring(0, slash)}${rel.substring(slash)}")
  }

  private def wrap(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication, st.getBlockSize,
      st.getModificationTime, st.getAccessTime, st.getPermission, st.getOwner,
      st.getGroup, fromLocal(st.getPath))

  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    local.open(toLocal(f), bufferSize)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val lp = toLocal(f)
    local.mkdirs(lp.getParent)
    local.create(lp, permission, overwrite, bufferSize, replication, blockSize, progress)
  }

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    local.append(toLocal(f), bufferSize, progress)

  override def rename(src: Path, dst: Path): Boolean =
    local.rename(toLocal(src), toLocal(dst))

  override def delete(f: Path, recursive: Boolean): Boolean =
    local.delete(toLocal(f), recursive)

  override def listStatus(f: Path): Array[FileStatus] =
    local.listStatus(toLocal(f)).map(wrap)

  override def setWorkingDirectory(dir: Path): Unit = ()
  override def getWorkingDirectory: Path = new Path(fsUri.toString + "/")

  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    local.mkdirs(toLocal(f), permission)

  override def getFileStatus(f: Path): FileStatus =
    wrap(local.getFileStatus(toLocal(f)))
}
