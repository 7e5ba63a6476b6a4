package graft.plans

import java.net.URI
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.ConcurrentHashMap

import graft.plans.Icelite.CommitConflictException

/** Conditional-PUT commit backend — the API shape object stores expose:
  * "create this key iff absent" in ONE call (S3 `If-None-Match: *`, GCS
  * `ifGenerationMatch=0`, OSS `x-oss-forbid-overwrite`), success or a
  * precondition failure, nothing else. A [[CasCommitStore]] needs exactly
  * this one verb, so a production adapter is a ~10-line class over the
  * vendor SDK's put call. */
trait CasBackend {
  /** Atomically bind `bytes` to `key` iff `key` is unbound.
    * @return true = this caller created the object; false = lost (an
    *         object already exists — its bytes MUST be untouched). */
  def putIfAbsent(key: String, bytes: Array[Byte]): Boolean
}

/** The in-memory object-store fake: a concurrent map whose `putIfAbsent`
  * IS the conditional put — atomic, all-or-nothing, loser never damages
  * the winner. Single-JVM by nature; the race specs hammer it with
  * concurrent publishers to prove [[CasCommitStore]] maps the API shape
  * to the commit contract correctly. */
class InMemoryCasBackend extends CasBackend {
  val objects = new ConcurrentHashMap[String, Array[Byte]]()
  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean =
    objects.putIfAbsent(key, bytes.clone()) == null
  override def toString = "cas-mem"
}

/** A real cross-process conditional put over a shared mount:
  * `O_CREAT|O_EXCL` single exclusive write — POSIX guarantees exactly one
  * creator across processes, which is the same one-verb shape. Caveat
  * (shared with [[HadoopCommitStore]], documented there): a reader racing
  * the write can observe the path before the bytes land, so metadata
  * readers treat a parse failure on the LATEST version as transient; the
  * in-memory fake and real object stores are strictly all-or-nothing. */
class ExclusiveCreateCasBackend extends CasBackend {
  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean =
    try {
      Files.write(Paths.get(new URI(key)), bytes,
        StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    }
  override def toString = "cas-excl"
}

/** The object-store exemplar of the [[CommitStore]] seam: publish-if-
  * absent expressed through a conditional-put API ([[CasBackend]]) rather
  * than filesystem link/create verbs. One round trip per commit, no
  * temp files, no rename — the protocol object stores actually offer.
  *
  * Selected by class name (`-Dgraft.commit.store=graft.plans.CasCommitStore`,
  * no-arg constructor = the cross-process exclusive-create backend), or
  * constructed directly over any [[CasBackend]] — the production S3/GCS/OSS
  * adapter slots in as the backend, the store logic above it is already
  * race-proven by the spec matrix. */
class CasCommitStore(val backend: CasBackend) extends CommitStore {
  def this() = this(new ExclusiveCreateCasBackend())
  override def publishAtomic(target: URI, bytes: Array[Byte]): Unit =
    if (!backend.putIfAbsent(target.toString, bytes))
      throw new CommitConflictException(
        s"commit conflict: $target already exists")
  override def toString = s"cas($backend)"
}
