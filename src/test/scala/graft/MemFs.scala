package graft

import java.io.{ByteArrayOutputStream, FileNotFoundException, IOException}
import java.net.URI
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A minimal in-memory Hadoop `FileSystem` registered under the
  * `graftmem://` scheme, test-scope only. It exists to prove the engine's
  * file I/O (`FileIo.enumerate`, Spark scans, the Spark commit protocol)
  * rides the Hadoop `FileSystem` abstraction rather than `file://`
  * specifics — the same seam the reference reaches FTP/OSS through
  * (`txtfilereader`/`osswriter`): any scheme with an `fs.<scheme>.impl`
  * entry works without touching engine code. State is JVM-static, which
  * matches `local[*]` executors sharing the driver JVM.
  */
class MemFs extends FileSystem {
  import MemFs._

  private var uri: URI = URI.create("graftmem:///")
  private var cwd: Path = new Path("/")

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    uri = URI.create(name.getScheme + "://" +
      Option(name.getAuthority).getOrElse("") + "/")
    setConf(conf)
  }

  override def getScheme: String = "graftmem"
  override def getUri: URI = uri
  override def getWorkingDirectory: Path = cwd
  override def setWorkingDirectory(dir: Path): Unit = { cwd = dir }

  /** Normalized absolute key: the URI path with no trailing slash. */
  private def key(f: Path): String = {
    val p = f.toUri.getPath
    val abs = if (p.startsWith("/")) p else s"/${cwd.toUri.getPath}/$p"
    val clean = abs.replaceAll("/+", "/")
    if (clean.length > 1 && clean.endsWith("/")) clean.dropRight(1) else clean
  }

  private def qualify(k: String): Path = makeQualified(new Path(k))

  private def isDir(k: String): Boolean = {
    if (k == "/") return true
    // containsKey, NOT contains: CHM.contains(x) is the legacy Hashtable
    // VALUE-containment method
    if (dirs.containsKey(k)) return true
    val prefix = k + "/"
    files.keySet.stream.anyMatch(_.startsWith(prefix)) ||
      dirs.keySet.stream.anyMatch(_.startsWith(prefix))
  }

  override def getFileStatus(f: Path): FileStatus = {
    val k = key(f)
    val bytes = files.get(k)
    if (bytes != null)
      new FileStatus(bytes.length.toLong, false, 1, BlockSize,
        mtimes.getOrDefault(k, 0L), qualify(k))
    else if (isDir(k))
      new FileStatus(0L, true, 1, BlockSize, 0L, qualify(k))
    else throw new FileNotFoundException(s"graftmem: $k")
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val k = key(f)
    if (files.containsKey(k)) return Array(getFileStatus(f))
    if (!isDir(k)) throw new FileNotFoundException(s"graftmem: $k")
    val prefix = if (k == "/") "/" else k + "/"
    val children = scala.collection.mutable.SortedSet.empty[String]
    files.keySet.forEach { fk =>
      if (fk.startsWith(prefix))
        children += prefix + fk.stripPrefix(prefix).takeWhile(_ != '/')
    }
    dirs.keySet.forEach { dk =>
      if (dk.startsWith(prefix) && dk != k)
        children += prefix + dk.stripPrefix(prefix).takeWhile(_ != '/')
    }
    children.toArray.map(c => getFileStatus(new Path(c)))
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    var k = key(f)
    while (k != "/" && !k.isEmpty) {
      if (files.containsKey(k)) throw new IOException(s"file exists: $k")
      dirs.put(k, java.lang.Boolean.TRUE)
      k = k.substring(0, math.max(k.lastIndexOf('/'), 0)) match {
        case "" => "/"
        case p  => p
      }
      if (k == "/") k = ""
    }
    true
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val bytes = files.get(key(f))
    if (bytes == null) throw new FileNotFoundException(s"graftmem: ${key(f)}")
    new FSDataInputStream(new MemInputStream(bytes))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val k = key(f)
    if (isDir(k) && !files.containsKey(k))
      throw new IOException(s"is a directory: $k")
    if (!overwrite) {
      // reserve the key ATOMICALLY at create time (not at close): two
      // racing exclusive creators must see exactly one winner, or the
      // CommitStore race tests over this scheme would pass vacuously.
      // The loser of putIfAbsent gets the exclusive-create failure; a
      // reader racing the winner can observe the empty placeholder —
      // exactly the documented HadoopCommitStore visibility caveat
      // (metadata readers treat a parse failure on the latest version
      // as transient).
      if (files.putIfAbsent(k, Array.emptyByteArray) != null)
        throw new FileAlreadyExistsException(s"graftmem: $k")
    }
    mkdirs(f.getParent, permission)
    val buf = new ByteArrayOutputStream()
    new FSDataOutputStream(new java.io.FilterOutputStream(buf) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        buf.write(b, off, len)
      override def close(): Unit = {
        super.close()
        files.put(k, buf.toByteArray)
        mtimes.put(k, java.lang.Long.valueOf(System.currentTimeMillis()))
      }
    }, null)
  }

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("graftmem: append")

  /** HDFS semantics: renaming onto an existing directory moves src INTO it
    * (`dst/srcName`) — the case the Spark/Hadoop output committer exercises
    * when merging `_temporary` task dirs into the job output. */
  override def rename(src: Path, dst: Path): Boolean = {
    val sk = key(src)
    val dk0 = key(dst)
    if (!files.containsKey(sk) && !isDir(sk)) return false
    val dk =
      if (isDir(dk0) && !files.containsKey(dk0))
        (if (dk0 == "/") "" else dk0) + "/" + sk.substring(sk.lastIndexOf('/') + 1)
      else dk0
    if (files.containsKey(sk)) {
      if (files.containsKey(dk)) return false
      files.put(dk, files.remove(sk))
      Option(mtimes.remove(sk)).foreach(mtimes.put(dk, _))
      return true
    }
    // directory: rekey every file/dir under sk/
    val prefix = sk + "/"
    val movedFiles = new java.util.ArrayList[String]()
    files.keySet.forEach(fk => if (fk.startsWith(prefix)) movedFiles.add(fk))
    movedFiles.forEach { fk =>
      val nk = dk + "/" + fk.stripPrefix(prefix)
      files.put(nk, files.remove(fk))
      Option(mtimes.remove(fk)).foreach(mtimes.put(nk, _))
    }
    val movedDirs = new java.util.ArrayList[String]()
    dirs.keySet.forEach(dd =>
      if (dd == sk || dd.startsWith(prefix)) movedDirs.add(dd))
    movedDirs.forEach { dd =>
      dirs.remove(dd)
      dirs.put(if (dd == sk) dk else dk + "/" + dd.stripPrefix(prefix),
        java.lang.Boolean.TRUE)
    }
    dirs.put(dk, java.lang.Boolean.TRUE)
    true
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val k = key(f)
    if (files.remove(k) != null) { mtimes.remove(k); return true }
    if (!isDir(k)) return false
    val prefix = if (k == "/") "/" else k + "/"
    val hasChildren = files.keySet.stream.anyMatch(_.startsWith(prefix)) ||
      dirs.keySet.stream.anyMatch(d => d.startsWith(prefix))
    if (hasChildren && !recursive)
      throw new IOException(s"directory not empty: $k")
    val fks = new java.util.ArrayList[String]()
    files.keySet.forEach(fk => if (fk.startsWith(prefix)) fks.add(fk))
    fks.forEach { fk => files.remove(fk); mtimes.remove(fk) }
    val dks = new java.util.ArrayList[String]()
    dirs.keySet.forEach(dd => if (dd == k || dd.startsWith(prefix)) dks.add(dd))
    dks.forEach(dirs.remove(_))
    true
  }
}

object MemFs {
  val BlockSize: Long = 32L * 1024 * 1024

  /** JVM-global store: path -> bytes (files), path -> marker (dirs).
    *
    * Anchored in `System.getProperties` rather than plain statics: under
    * sbt's layered classloaders, Hadoop can resolve `fs.graftmem.impl`
    * through a thread-context classloader that yields a SECOND copy of
    * this companion object with its own empty maps. System properties are
    * one per JVM and the stored values are JDK types, so every copy of
    * the class resolves to the same maps. */
  private def anchor[T](key: String, mk: => T): T = {
    val props = System.getProperties
    props.synchronized {
      Option(props.get(key)) match {
        case Some(v) => v.asInstanceOf[T]
        case None    => val v = mk; props.put(key, v); v
      }
    }
  }
  val files: ConcurrentHashMap[String, Array[Byte]] =
    anchor("graft.test.memfs.files", new ConcurrentHashMap[String, Array[Byte]]())
  val dirs: ConcurrentHashMap[String, java.lang.Boolean] =
    anchor("graft.test.memfs.dirs", new ConcurrentHashMap[String, java.lang.Boolean]())
  val mtimes: ConcurrentHashMap[String, java.lang.Long] =
    anchor("graft.test.memfs.mtimes", new ConcurrentHashMap[String, java.lang.Long]())
  def clear(): Unit = { files.clear(); dirs.clear(); mtimes.clear() }

  private class MemInputStream(bytes: Array[Byte]) extends FSInputStream {
    private var pos = 0
    override def seek(p: Long): Unit = {
      if (p < 0 || p > bytes.length) throw new IOException(s"bad seek $p")
      pos = p.toInt
    }
    override def getPos: Long = pos.toLong
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(): Int =
      if (pos >= bytes.length) -1 else { val b = bytes(pos) & 0xff; pos += 1; b }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (pos >= bytes.length) return -1
      val n = math.min(len, bytes.length - pos)
      System.arraycopy(bytes, pos, b, off, n); pos += n; n
    }
    override def available(): Int = bytes.length - pos
  }
}
