package graft.storage

import java.nio.file.{Files, Path}
import java.util.UUID

/** Byte-level IO seam under the [[Manifest]] journal (and its
  * transaction decision files): every journal read, list, and — the
  * load-bearing one — every ATOMIC EXCLUSIVE claim of a version slot
  * goes through one of these.
  *
  * Claim strategy per store (the part that must be chosen per
  * filesystem, because "exactly one concurrent writer wins the slot"
  * is the whole correctness story of the optimistic journal):
  *  - local POSIX ([[NioJournalStore]]): hard-link creation — atomic
  *    and exclusive, content fully written before the name appears;
  *  - HDFS-like stores ([[HadoopJournalStore]]): write a temp file,
  *    then rename-if-absent (`FileSystem.rename` fails when the
  *    destination exists — atomic at the namenode, and the content is
  *    complete before the name appears);
  *  - S3-family object stores: Hadoop's s3a rename is copy+delete,
  *    NOT atomic — the journal there needs a conditional put
  *    (`If-None-Match`, what Delta's S3 LogStore or a DynamoDB mutex
  *    provide). [[HadoopJournalStore]] refuses rather than guesses.
  */
trait JournalStore {
  def mkdirs(dir: Path): Unit
  /** Child FILE names of `dir` (empty when the dir is missing). */
  def list(dir: Path): Seq[String]
  def exists(file: Path): Boolean
  def read(file: Path): Array[Byte]
  /** Atomically claim `file` with content `bytes`. True = our claim
    * won; false = the slot was already (or concurrently) taken. A
    * reader never observes a partially-written claim. */
  def writeExclusive(file: Path, bytes: Array[Byte]): Boolean
  def delete(file: Path): Unit
}

/** Local-FS journal IO — the hard-link claim (fast path). */
object NioJournalStore extends JournalStore {
  def mkdirs(dir: Path): Unit = Files.createDirectories(dir)

  def list(dir: Path): Seq[String] =
    if (!Files.isDirectory(dir)) Nil
    else {
      import scala.jdk.CollectionConverters._
      val s = Files.list(dir)
      try s.iterator().asScala.filter(Files.isRegularFile(_))
        .map(_.getFileName.toString).toList
      finally s.close()
    }

  def exists(file: Path): Boolean = Files.exists(file)

  def read(file: Path): Array[Byte] = Files.readAllBytes(file)

  def writeExclusive(file: Path, bytes: Array[Byte]): Boolean = {
    if (Files.exists(file)) return false
    val tmp = file.resolveSibling(s"${file.getFileName}.tmp.${UUID.randomUUID()}")
    Files.write(tmp, bytes)
    try {
      try { Files.createLink(file, tmp); true }
      catch {
        case _: UnsupportedOperationException =>
          // FS without hard links: fail-if-exists move (atomic within
          // a directory on every mainstream FS)
          try { Files.move(tmp, file); true }
          catch { case _: java.nio.file.FileAlreadyExistsException => false }
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } finally Files.deleteIfExists(tmp)
  }

  def delete(file: Path): Unit = Files.deleteIfExists(file)
}

/** Journal IO through the Hadoop FileSystem API — the shared-storage
  * path (HDFS, ABFS, ...). Local `file:` paths keep the hard-link
  * claim (Hadoop's local FS create/rename are NOT atomic); true
  * rename-if-absent stores claim via temp-write + rename. */
class HadoopJournalStore(conf: org.apache.hadoop.conf.Configuration)
    extends JournalStore {
  private def hp(p: Path): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(p.toUri)
  private def fsOf(p: org.apache.hadoop.fs.Path) = p.getFileSystem(conf)
  /** Overridable so specs can drive the rename-if-absent claim over a
    * local FS. */
  protected def isLocal(p: org.apache.hadoop.fs.Path): Boolean = {
    val scheme = fsOf(p).getUri.getScheme
    scheme == "file" || scheme == null
  }

  def mkdirs(dir: Path): Unit = { fsOf(hp(dir)).mkdirs(hp(dir)); () }

  def list(dir: Path): Seq[String] = {
    val d = hp(dir)
    val fs = fsOf(d)
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).toSeq.filter(_.isFile).map(_.getPath.getName)
  }

  def exists(file: Path): Boolean = fsOf(hp(file)).exists(hp(file))

  def read(file: Path): Array[Byte] = {
    val f = hp(file)
    val fs = fsOf(f)
    val len = fs.getFileStatus(f).getLen.toInt
    val in = fs.open(f)
    try {
      val buf = new Array[Byte](len)
      in.readFully(0, buf)
      buf
    } finally in.close()
  }

  /** Stores with VERIFIED atomic rename-fails-when-destination-exists
    * semantics — the contract the exclusive claim below depends on.
    * An allowlist, not an s3 denylist: a connector with overwriting
    * rename (gs, older wasb) would silently drop a concurrent writer's
    * commit — the exact hazard the journal exists to prevent — so
    * unknown schemes are refused, not trusted. */
  protected def atomicRenameSchemes: Set[String] =
    Set("hdfs", "webhdfs", "viewfs", "abfs", "abfss", "o3fs", "ofs")

  def writeExclusive(file: Path, bytes: Array[Byte]): Boolean = {
    val target = hp(file)
    if (isLocal(target)) return NioJournalStore.writeExclusive(file, bytes)
    val fs = fsOf(target)
    val scheme = fs.getUri.getScheme
    require(atomicRenameSchemes.contains(scheme),
      s"journal on '$scheme' is not on the verified atomic rename-if-absent " +
        "allowlist; object stores (s3a, gs, wasb) need a conditional-put " +
        "claim — use ConditionalPutJournalStore(new S3HttpObjectStore(...)) " +
        "there")
    if (fs.exists(target)) return false
    val tmp = new org.apache.hadoop.fs.Path(target.getParent,
      s"${target.getName}.tmp.${UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    // rename-if-absent: FileSystem.rename fails (false) when the
    // destination exists — the atomic claim on HDFS-like stores
    val won = try fs.rename(tmp, target)
      catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
    if (!won) fs.delete(tmp, false)
    won
  }

  def delete(file: Path): Unit = { fsOf(hp(file)).delete(hp(file), false); () }
}

/** The minimal object-store surface the journal needs, with the exact
  * compare-and-set semantics S3 conditional writes ship
  * (`PutObject` + `If-None-Match: *` → 412 when the key exists; GCS
  * `ifGenerationMatch=0` and Azure `If-None-Match: *` are the same
  * contract): a FLAT key namespace, no rename, no directories, and one
  * atomic create-if-absent primitive. */
trait ConditionalObjectApi {
  /** Atomic create-if-absent — the `If-None-Match: *` PUT. True = the
    * key was created with `bytes`; false = the key already existed
    * (the 412 Precondition Failed arm), content untouched. Concurrent
    * callers: exactly one true. */
  def putIfAbsent(key: String, bytes: Array[Byte]): Boolean
  def get(key: String): Option[Array[Byte]]
  /** Keys starting with `prefix`, lexicographic (S3 list order). */
  def listPrefix(prefix: String): Seq[String]
  def delete(key: String): Unit
}

/** In-memory [[ConditionalObjectApi]] — the spec double for S3-family
  * conditional writes. `ConcurrentHashMap.putIfAbsent` IS the CAS the
  * real stores provide, so races exercised over this fake exercise the
  * same arbitration the production path would. */
final class InMemoryObjectStore extends ConditionalObjectApi {
  private val objects =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()

  def putIfAbsent(key: String, bytes: Array[Byte]): Boolean =
    objects.putIfAbsent(key, bytes.clone()) == null

  def get(key: String): Option[Array[Byte]] =
    Option(objects.get(key)).map(_.clone())

  def listPrefix(prefix: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    objects.keySet().asScala.filter(_.startsWith(prefix)).toSeq.sorted
  }

  def delete(key: String): Unit = { objects.remove(key); () }

  def size: Int = objects.size()
}

/** Journal IO over an object store with conditional-put — the
  * s3a/gs/wasb deployment shape [[HadoopJournalStore]] refuses. The
  * exclusive slot claim is a SINGLE `If-None-Match: *` PUT: no temp
  * file, no rename (object stores have none worth trusting), no
  * partial-content window (a PUT is all-or-nothing). Directories don't
  * exist in a flat keyspace, so `mkdirs` is a no-op and `list` is a
  * prefix scan over `<dir>/` trimmed to immediate children — exactly
  * how the reference treats its backup bucket layout
  * (`/root/reference/storage/object_storage.go`). */
final class ConditionalPutJournalStore(api: ConditionalObjectApi)
    extends JournalStore {
  private def key(p: Path): String = p.toString.replace('\\', '/')

  def mkdirs(dir: Path): Unit = () // flat keyspace: nothing to create

  def list(dir: Path): Seq[String] = {
    val prefix = key(dir) + "/"
    api.listPrefix(prefix)
      .map(_.stripPrefix(prefix))
      .filter(!_.contains('/')) // immediate children only
  }

  def exists(file: Path): Boolean = api.get(key(file)).isDefined

  def read(file: Path): Array[Byte] =
    api.get(key(file)).getOrElse(
      throw new java.nio.file.NoSuchFileException(file.toString))

  def writeExclusive(file: Path, bytes: Array[Byte]): Boolean =
    api.putIfAbsent(key(file), bytes)

  def delete(file: Path): Unit = api.delete(key(file))
}
