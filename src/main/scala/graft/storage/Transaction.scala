package graft.storage

import java.nio.file.{Files, Path}
import java.util.UUID
import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.SparkSession

/** Multi-statement transaction over copy-on-write tables — the analog
  * of the reference's session-scoped BEGIN/COMMIT/ROLLBACK wrapping a
  * DuckDB transaction (`/root/reference/backend/session.go:87-145`,
  * routed at `/root/reference/backend/executor.go:80`).
  *
  * How it works:
  * - Tables opened through [[table]] run every DML statement against a
  *   staged, in-memory manifest ([[Manifest.TableIO]] seam): data files
  *   land on disk immediately (they are invisible until a manifest
  *   references them), manifest versions accumulate only in this map.
  *   Reads through the same handles see the staged state
  *   (read-your-writes); every other reader keeps seeing the
  *   pre-transaction snapshot.
  * - [[commit]] publishes with a two-phase protocol: (1) place each
  *   staged table's manifest in its journal slot carrying
  *   `txn.pending = <id>` — the normal optimistic slot claim, so any
  *   concurrent writer since [[table]] first read the table causes a
  *   clean conflict abort; (2) atomically claim the transaction's
  *   decision file as "commit". The single decision-file creation is
  *   the visibility point: before it, readers resolve every pending
  *   manifest back to the previous version of EVERY table; after it,
  *   all tables flip together. Crash between (1) and (2) leaves
  *   pending manifests that readers force-abort after a grace period —
  *   also via the decision file, so the arbitration cannot split.
  * - [[rollback]] discards the staged map; nothing was ever visible.
  *   Orphaned data files are reclaimed by [[GraftTable.vacuum]].
  *
  * At 100 TB this is the same metadata-only commit Delta/Iceberg run:
  * the transaction's cost is O(tables touched) tiny JSON writes plus
  * one marker file, never proportional to data size.
  */
final class Transaction private[graft] (
    val spark: SparkSession, txnDir: Path) {

  val id: String = UUID.randomUUID().toString

  private val staged = TrieMap.empty[Path, Manifest]
  private val readVersions = TrieMap.empty[Path, Long]
  @volatile private var closed = false

  private object TxnIO extends Manifest.TableIO {
    def load(table: Path): Manifest =
      staged.getOrElse(table, {
        val m = Manifest.load(table)
        readVersions.putIfAbsent(table, m.version)
        m
      })
    def commit(table: Path, m: Manifest): Manifest = {
      require(!closed, "transaction already closed")
      readVersions.putIfAbsent(table, m.version)
      val out = m.copy(version = m.version + 1)
      staged.put(table, out)
      out
    }
  }

  /** Open a table handle whose reads and DML run inside this
    * transaction. Validates existence like [[GraftTable.open]] — the
    * `IF [NOT] EXISTS` probes rely on the not-found signal being
    * raised HERE, inside a transaction too. */
  def table(path: Path): GraftTable = {
    TxnIO.load(path) // staged hit, or Manifest.load's typed not-found
    new GraftTable(spark, path, TxnIO)
  }

  /** Tables with staged changes. */
  def dirtyTables: Seq[Path] = staged.keys.toSeq

  /** Publish all staged tables atomically. Throws
    * ConcurrentModificationException (staging discarded, nothing
    * published) if any staged table was committed to by someone else
    * since this transaction first read it. */
  def commit(): Unit = {
    require(!closed, "transaction already closed")
    closed = true
    if (staged.isEmpty) return
    Manifest.store.mkdirs(txnDir)
    try {
      staged.foreach { case (p, m) =>
        val pending = m.copy(
          version = readVersions(p),
          props = m.props
            + (Manifest.PendingProp -> id)
            + (Manifest.TxnDirProp -> txnDir.toAbsolutePath.toString))
        Manifest.commit(p, pending)
      }
    } catch {
      case e: java.util.ConcurrentModificationException =>
        // Decide "abort" so any pending manifests already placed are
        // permanently invisible, then surface the conflict.
        Manifest.tryDecide(txnDir, id, "abort")
        throw e
    }
    if (!Manifest.tryDecide(txnDir, id, "commit"))
      throw new java.util.ConcurrentModificationException(
        s"transaction $id was force-aborted by a concurrent reader")
  }

  /** Discard all staged changes; the journal never sees them. */
  def rollback(): Unit = {
    closed = true
    staged.clear()
  }

  // ------------------------------------------------------------------
  // Savepoints (the psycopg/ORM nested-transaction shape): a savepoint
  // is a SNAPSHOT of the staged manifest map — manifests are immutable
  // values, so the snapshot is O(tables touched) references. Data
  // files staged after a savepoint become invisible orphans on
  // rollback-to (vacuum reclaims them), exactly like a full rollback.
  // Names are a flat map (PG's destroy-later-savepoints nesting is
  // approximated by redefinition — the loop shape ORMs emit).

  private val savepoints =
    TrieMap.empty[String, (Long, Map[Path, Manifest])]
  private val spSeq = new java.util.concurrent.atomic.AtomicLong(0)

  def savepoint(name: String): Unit = {
    require(!closed, "transaction already closed")
    savepoints.put(name.toLowerCase, (spSeq.incrementAndGet(), staged.toMap))
  }

  /** Restore the staged state to `name`'s snapshot. The savepoint
    * itself survives (PG semantics: roll back to it repeatedly) but
    * savepoints established AFTER it are destroyed — rolling back to
    * an outer point then "forward" to an inner one would resurrect
    * writes the application already saw discarded. */
  def rollbackTo(name: String): Unit = {
    require(!closed, "transaction already closed")
    val (seq, snap) = savepoints.getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(
        s"savepoint \"$name\" does not exist"))
    savepoints.filterInPlace { case (_, (s, _)) => s <= seq }
    staged.clear()
    staged ++= snap
  }

  def release(name: String): Unit = {
    require(!closed, "transaction already closed")
    if (savepoints.remove(name.toLowerCase).isEmpty)
      throw new IllegalArgumentException(
        s"savepoint \"$name\" does not exist")
  }
}
