package graft.plans

import java.net.URI
import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.plans.Icelite.CommitConflictException

/** THE load-bearing atomicity seam of the snapshot commit protocol.
  *
  * An icelite commit is exactly one atomic "create this immutable version
  * file iff it does not exist" ([[Icelite.writeSnapshot]]); everything
  * else (data files, side manifests) is crash-safe orphan garbage until
  * that create lands. How to get an atomic exclusive create differs per
  * storage system, so it is pluggable:
  *
  *  - [[LocalLinkCommitStore]] (default for local paths): write a temp
  *    file, `Files.createLink` to the final name — POSIX `link(2)` fails
  *    with EEXIST atomically. The production-grade choice for local/NFS
  *    filesystems with hard links.
  *  - [[HadoopCommitStore]]: `FileSystem.create(path, overwrite=false)`
  *    via the Hadoop FileSystem API — on HDFS the exclusive create is
  *    atomic at the NameNode (second creator gets
  *    FileAlreadyExistsException). The choice for `hdfs://` roots. NOTE
  *    on semantics per scheme: on `file://` Hadoop's RawLocalFileSystem
  *    implements create(overwrite=false) as check-then-create — NOT
  *    atomic — so local roots should keep the link store (the default
  *    does); on S3A, create is read-after-write-visible but NOT
  *    conditional before Hadoop's S3A conditional-write support — object
  *    stores want a real CAS store (below).
  *  - Object stores / external lock services: implement [[CommitStore]]
  *    over a conditional PUT (S3 `If-None-Match`, GCS
  *    `ifGenerationMatch=0`, OSS `x-oss-forbid-overwrite`) or a lock/CAS
  *    table (DynamoDB, ZooKeeper), and select it by fully-qualified class
  *    name via `-Dgraft.commit.store=com.example.S3CasCommitStore` (needs
  *    a no-arg constructor). The contract to uphold is below.
  *
  * Contract: `publishAtomic` MUST (1) make `bytes` visible at `target`
  * all-or-nothing — a concurrent reader sees the complete file or no
  * file; (2) throw [[Icelite.CommitConflictException]] if `target`
  * already exists, without damaging the existing file; (3) leave no
  * partial file behind on failure. Reference analogue: DataX's ODPS
  * writer commits uploaded blocks in one masterUpload.commit(blocks)
  * call (`odpswriter/.../OdpsWriter.java:43-110`) — same
  * stage-everything-then-one-atomic-publish shape.
  */
trait CommitStore {
  /** Publish `bytes` at `target` (a `file:`/`hdfs:`/... URI), atomically,
    * iff nothing exists there; see the trait contract. */
  def publishAtomic(target: URI, bytes: Array[Byte]): Unit
}

/** Temp file + hard link (`link(2)` EEXIST = lost the race). Local-path
  * default; requires a filesystem with hard links — without them it falls
  * back to exists-check + ATOMIC_MOVE, which keeps the single-writer
  * contract but has a documented race window (use [[HadoopCommitStore]]
  * or a CAS store there instead). */
object LocalLinkCommitStore extends CommitStore {
  override def publishAtomic(target: URI, bytes: Array[Byte]): Unit = {
    val t = Paths.get(target)
    val tmp = t.resolveSibling(s".tmp-${t.getFileName}-${java.util.UUID.randomUUID()}")
    Files.write(tmp, bytes)
    try {
      try Files.createLink(t, tmp)
      catch {
        case _: UnsupportedOperationException =>
          // fs without hard links: ATOMIC_MOVE would silently REPLACE an
          // existing target (POSIX rename), losing the conflict check —
          // pre-check existence to keep the single-writer contract (a
          // race window remains on such filesystems; documented)
          if (Files.exists(t))
            throw new CommitConflictException(
              s"commit conflict: $target already exists")
          Files.move(tmp, t, StandardCopyOption.ATOMIC_MOVE)
        case e: java.nio.file.FileAlreadyExistsException =>
          throw new CommitConflictException(
            s"commit conflict: $target already exists", e)
      }
    } finally Files.deleteIfExists(tmp)
  }
  override def toString = "local-link"
}

/** Hadoop FileSystem exclusive create — atomic on HDFS (NameNode
  * namespace op); see [[CommitStore]] scaladoc for per-scheme semantics.
  * Bytes are written straight into the exclusively-created file: a reader
  * racing the write can observe the path before `close()`, so metadata
  * readers over such roots should treat a parse failure on the LATEST
  * version as transient (the tiny version JSON closes in one write). A
  * failed write deletes the partial file (we own it — create succeeded). */
class HadoopCommitStore(conf: org.apache.hadoop.conf.Configuration)
    extends CommitStore {
  def this() = this(new org.apache.hadoop.conf.Configuration())
  override def publishAtomic(target: URI, bytes: Array[Byte]): Unit = {
    val dst = new org.apache.hadoop.fs.Path(target)
    val fs = dst.getFileSystem(conf)
    val out =
      try fs.create(dst, /* overwrite = */ false)
      catch {
        case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
          throw new CommitConflictException(
            s"commit conflict: $target already exists", e)
        case e: java.io.IOException if fs.exists(dst) =>
          // some FileSystem impls signal exclusive-create failure as a
          // plain IOException ("File already exists: ...")
          throw new CommitConflictException(
            s"commit conflict: $target already exists", e)
      }
    var ok = false
    try { out.write(bytes); ok = true }
    finally {
      out.close()
      if (!ok) fs.delete(dst, false) // our partial file; best-effort cleanup
    }
  }
  override def toString = "hadoop-create"
}

object CommitStore {
  /** Selection override: `local` | `hadoop` | a fully-qualified
    * [[CommitStore]] class name (no-arg constructor) — the object-store
    * extension point. Unset = scheme-based default. */
  val SelectProp = "graft.commit.store"

  private val custom =
    new java.util.concurrent.ConcurrentHashMap[String, CommitStore]()

  /** Resolve the store for a table root. Default: local paths (no scheme
    * or `file:`) take the hard-link store; any other scheme (`hdfs://`,
    * ...) takes the Hadoop store. `-Dgraft.commit.store` overrides. */
  def forRoot(root: String): CommitStore =
    sys.props.get(SelectProp) match {
      case None | Some("") =>
        // absolute local paths (the common case) never reach URI parsing —
        // a path with spaces/brackets is not a valid URI but is a fine path
        val scheme =
          if (root.startsWith("/")) null
          else scala.util.Try(new URI(root).getScheme).getOrElse(null)
        if (scheme == null || scheme == "file") LocalLinkCommitStore
        // the LIVE session Hadoop conf, so runtime-registered
        // fs.<scheme>.impl entries (object-store mounts, test schemes)
        // resolve without a restart
        else new HadoopCommitStore(Hfs.conf)
      case Some("local") => LocalLinkCommitStore
      case Some("hadoop") => new HadoopCommitStore(Hfs.conf)
      case Some(cls) => custom.computeIfAbsent(cls, c =>
        Class.forName(c).getDeclaredConstructor()
          .newInstance().asInstanceOf[CommitStore])
    }
}
