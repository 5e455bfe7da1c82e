package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.storage.{GraftTable, Manifest, Transaction}

/** The engine facade: a warehouse of databases holding copy-on-write
  * tables and stored views, session variables, and a SQL entry point —
  * the analog of the reference's catalog provider + session layer
  * (`/root/reference/catalog/provider.go:296-372` CREATE/DROP catalog,
  * `/root/reference/catalog/database.go:127-424` tables + views,
  * `/root/reference/backend/session.go:87-203` vars + transactions,
  * `/root/reference/pgserver/duck_handler.go:133-233` prepared
  * statements / schema probe).
  *
  * Layout: `<warehouse>/<db>/<table>/` (manifest + parquet) plus
  * `<warehouse>/<db>/_views.json` and `<warehouse>/_vars.json` — the
  * metadata the reference hides inside DuckDB's catalog and the
  * `__sys__.persistent_variable` table
  * (`/root/reference/catalog/internal_tables.go:174-180`).
  */
final class Engine(parentSession: SparkSession, val warehouse: Path) {
  /** Engine-private child session (round-13 verdict #2): every Engine
    * gets its own `newSession()` — an ISOLATED temp-view catalog over
    * the shared SparkContext, cache, and builder-time confs. Before
    * this, `registerReferenced` bound BARE table names session-globally
    * (ownership map keyed by name), so two Engines with same-named
    * tables (`t`, `acct`, ... — six query defs each create a `t`)
    * racing in one SparkSession could rebind each other's views between
    * analysis and execution — silent wrong-table reads with plausible
    * row counts. Child-session catalogs make the bare name PER ENGINE;
    * no lock, no ident rewriting, and `spark.newSession()` carries the
    * SparkSessionExtensions (injected Catalyst functions) along. */
  val spark: SparkSession = parentSession.newSession()
  SparkEntry.configure(spark)
  graft.functions.MySqlShims.registerSession(this)
  private val mapper = new ObjectMapper()
  Files.createDirectories(warehouse)

  /** Bind external parquet reference tables (testdata) into THIS
    * engine's isolated SQL namespace, so engine SQL can join its own
    * tables against them. Replaces the old pattern of registering on
    * the caller's session (invisible to the child catalog). */
  def bindTables(sfDir: String, names: String*): Unit =
    names.foreach(n => Tables.load(spark, sfDir, n).createOrReplaceTempView(n))

  @volatile private var currentDb = "main"
  if (!Files.isDirectory(warehouse.resolve("main"))) createDatabase("main")

  // ------------------------------------------------------------------
  // Databases (A18, A27)

  def createDatabase(name: String): Unit = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"), s"bad db name $name")
    val d = warehouse.resolve(name)
    require(!Files.exists(d), s"database exists: $name")
    Files.createDirectories(d)
  }

  def dropDatabase(name: String, cascade: Boolean = false): Unit = {
    val d = warehouse.resolve(name)
    require(Files.isDirectory(d), s"no such database: $name")
    if (!cascade) require(listTables(name).isEmpty, s"database $name not empty")
    deleteRecursively(d)
    // stale temp-view bindings over the deleted files must not survive
    // (they would serve FileNotFound — or worse, a later re-created
    // generation could collide with a cached (path, version) owner)
    unregisterAll()
  }

  def listDatabases(): Seq[String] =
    Files.list(warehouse).iterator().asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString)
      .filterNot(_.startsWith("_")).toSeq.sorted

  def use(db: String): Unit = {
    require(Files.isDirectory(warehouse.resolve(db)), s"no such database: $db")
    unregisterAll() // stale temp views must not shadow the new db
    currentDb = db
  }
  def currentDatabase: String = currentDb

  // ------------------------------------------------------------------
  // Tables (A19, A26) + views (A2)

  private def split(name: String): (String, String) = name.split('.') match {
    case Array(db, t) => (db, t)
    case Array(t) => (currentDb, t)
    case _ => throw new IllegalArgumentException(s"bad table name $name")
  }

  def createTable(name: String, schema: StructType, pkCols: Seq[String] = Nil,
      props: Map[String, String] = Map.empty): GraftTable = {
    val (db, t) = split(name)
    GraftTable.create(spark, warehouse.resolve(db).resolve(t), schema, pkCols,
      props = props)
  }

  def table(name: String): GraftTable = {
    val (db, t) = split(name)
    val p = warehouse.resolve(db).resolve(t)
    // inside BEGIN...COMMIT, DML stages and reads see their own writes
    activeTxn match {
      case Some(txn) => txn.table(p)
      case None => GraftTable.open(spark, p)
    }
  }

  /** The frame a table name BINDS to in SQL: a plain table's read(),
    * or — for a partitioned PARENT (PG declarative partitioning,
    * pg_dump replay) — the union of its attached children. An empty
    * parent (no children yet) reads as its own empty frame. Scale:
    * unionByName of N child scans is exactly the plan PG's planner
    * builds (an Append of child scans), and each branch carries its
    * recorded BOUNDS as a filter — a WHERE contradicting a child's
    * bounds folds that branch to empty (Catalyst constraint
    * propagation + PruneFilters + PropagateEmptyRelation), which is
    * PG-style partition pruning: at 100 TB the difference between
    * scanning one partition and all of them. Children only ever hold
    * in-bounds rows (routed INSERT, validated ATTACH), so the filter
    * never changes results. */
  private[graft] def tableFrame(name: String): org.apache.spark.sql.DataFrame =
    tableFrame(name, depth = 0)

  /** Recursive for SUBPARTITIONED trees (a child may itself be a
    * parent); the depth cap turns a malformed props cycle into a loud
    * error instead of a stack overflow. */
  private def tableFrame(name: String,
      depth: Int): org.apache.spark.sql.DataFrame = {
    require(depth < 32, s"partition tree under $name deeper than 32 levels")
    val t = table(name)
    val kids = t.partitionChildren
    if (kids.isEmpty) t.read()
    else {
      // HASH children are NEVER bounds-filtered on read: a restored
      // pg_dump placed rows by PG's partition hash, which this
      // engine's routing hash cannot reproduce — filtering would
      // silently hide those rows. RANGE/LIST bounds ARE row
      // properties (and enforced as child CHECKs), so their filters
      // stay — they are what makes partition pruning work.
      val spec = t.partitionBy.flatMap(by =>
        scala.util.Try(Partitioning.parse(by)).toOption)
        .filter(_.strategy != "HASH")
      kids.map { case (c, b) =>
        val df = tableFrame(c, depth + 1)
        spec.flatMap(s =>
          scala.util.Try(Partitioning.boundPredicateSql(s, b)).toOption.flatten)
          .map(p => df.filter(org.apache.spark.sql.functions.expr(p)))
          .getOrElse(df)
      }.reduce(_.unionByName(_))
    }
  }

  // ------------------------------------------------------------------
  // Multi-statement transactions (A24,
  // `/root/reference/backend/session.go:87-145`): session-scoped, like
  // the reference's wrapped DuckDB txn. DML between begin() and
  // commit() stages per-table manifests; commit publishes all of them
  // atomically (one decision-file creation — see
  // [[graft.storage.Transaction]]); rollback discards. DDL
  // (CREATE/DROP/ALTER) auto-commits as in MySQL.

  @volatile private var activeTxn: Option[Transaction] = None

  def begin(): Transaction = synchronized {
    require(activeTxn.isEmpty, "transaction already open")
    val t = new Transaction(spark, warehouse.resolve("_txn"))
    activeTxn = Some(t)
    t
  }

  def commit(): Unit = synchronized {
    val t = activeTxn.getOrElse(throw new IllegalStateException("no open transaction"))
    activeTxn = None
    t.commit()
  }

  def rollback(): Unit = synchronized {
    val t = activeTxn.getOrElse(throw new IllegalStateException("no open transaction"))
    activeTxn = None
    t.rollback()
  }

  def inTransaction: Boolean = activeTxn.isDefined

  /** The open transaction, for savepoint routing. */
  def currentTransaction: Option[Transaction] = activeTxn

  /** DROP TABLE — deferred delete (uniform with the engine's version-
    * retention story everywhere else, round-5 verdict #9): one atomic
    * rename retires the JOURNAL (`_manifest` → `_dropped.<ts>.<id>`),
    * the data files stay untouched — a concurrent reader pinned to a
    * pre-drop snapshot keeps scanning its immutable files (a directory
    * move would break its absolute paths just as surely as deletion).
    * The table stops existing for the catalog (existence IS the
    * `_manifest` dir); re-CREATE of the same name works immediately,
    * and the old generation's files — now referenced only by retired
    * journal versions — are reclaimed by [[vacuumDropped]]. */
  def dropTable(name: String): Unit = {
    val (db, t) = split(name)
    val d = warehouse.resolve(db).resolve(t)
    require(Files.isDirectory(d.resolve("_manifest")), s"no such table: $name")
    val retired = d.resolve(
      s"_dropped.${System.currentTimeMillis()}.${java.util.UUID.randomUUID()}")
    Files.move(d.resolve("_manifest"), retired)
    Engine.partCache.remove(d)
    if (db == currentDb) unregister(t)
  }

  /** Reclaim dropped-table storage: for every table directory holding
    * retired journals older than `minAgeMs` (the grace window for
    * pinned readers), delete the whole dir when nothing else claims it;
    * when a live re-created table — or a NEWER retired generation still
    * inside its own grace window, possibly pinned by a reader — shares
    * the dir, reclaim only the data files the expired journals
    * reference (generations never share data files: every write lands
    * under a fresh UUID) plus the journals themselves. Returns
    * directories + journals removed. */
  def vacuumDropped(minAgeMs: Long = 600000L): Long = {
    val cutoff = System.currentTimeMillis() - minAgeMs
    var removed = 0L
    listDatabases().foreach { db =>
      val dbDir = warehouse.resolve(db)
      Files.list(dbDir).iterator().asScala.toSeq
        .filter(Files.isDirectory(_)).foreach { tdir =>
          val allRetired = Files.list(tdir).iterator().asScala.toSeq
            .filter(_.getFileName.toString.startsWith("_dropped."))
          val expired = allRetired.filter(
            _.getFileName.toString.split('.').lift(1).exists(ts =>
              ts.forall(_.isDigit) && ts.toLong <= cutoff))
          if (expired.nonEmpty) {
            val live = Files.isDirectory(tdir.resolve("_manifest"))
            if (!live && expired.size == allRetired.size) {
              // nothing else claims this dir — whole-dir reclaim
              deleteRecursively(tdir); removed += 1
            } else {
              // a live re-created table or a NEWER retired generation
              // (still inside its own grace window, possibly pinned by
              // a reader) shares the dir: reclaim only the data files
              // the expired journals reference, then the journals
              // Data-file reclaim through the Hadoop FS API, same as
              // GraftTable.vacuum: manifest entries may be plain paths
              // OR URIs (and, post-rename, may reference pre-rename
              // absolute paths) — java.nio on the raw string silently
              // fails to delete either, leaking storage.
              val conf = spark.sessionState.newHadoopConf()
              expired.foreach { r =>
                val listing = Files.list(r)
                try listing.iterator().asScala
                  .filter(_.getFileName.toString.endsWith(".json"))
                  .foreach { mf =>
                    val raw = mapper.readValue(Files.readAllBytes(mf),
                      classOf[java.util.Map[String, Object]])
                    raw.get("files") match {
                      case l: java.util.List[_] => l.asScala.foreach { f =>
                        val p0 = new org.apache.hadoop.fs.Path(f.toString)
                        // a rename moved the dir but not the journal's
                        // absolute entries: re-home onto this table dir
                        val p =
                          if (p0.toUri.getPath != null &&
                              !new java.io.File(p0.toUri.getPath).exists()) {
                            val rel = p0.toUri.getPath
                              .split("/data/", 2).lift(1)
                            rel.fold(p0)(s => new org.apache.hadoop.fs.Path(
                              tdir.resolve("data").resolve(s).toUri))
                          } else p0
                        val fs = p.getFileSystem(conf)
                        if (fs.exists(p)) { fs.delete(p, false); () }
                      }
                      case _ => ()
                    }
                  }
                finally listing.close()
                deleteRecursively(r); removed += 1
              }
            }
          }
        }
    }
    removed
  }

  /** RENAME TABLE (A20's table-level form; MySQL `RENAME TABLE a TO b`
    * / `ALTER TABLE a RENAME TO b`). A manifest-preserving directory
    * move — version history, clustering metadata, and time travel all
    * survive the rename. */
  def renameTable(from: String, to: String): Unit = {
    val (fromDb, f) = split(from)
    val (toDb, t) = split(to)
    val src = warehouse.resolve(fromDb).resolve(f)
    val dst = warehouse.resolve(toDb).resolve(t)
    require(Files.isDirectory(src.resolve("_manifest")), s"no such table: $from")
    require(!Files.exists(dst), s"target exists: $to")
    // partition pointers are NAME-based: a renamed CHILD must re-key
    // the parent's `partchild.*` entry and a renamed PARENT must
    // re-point every child's `partof` (PG renames either side
    // transparently; an orphaned pointer would break parent reads and
    // bounds routing). Cross-database renames of a linked table stay
    // loud — childRef resolves children in the parent's database —
    // and the check runs BEFORE the move so a refusal changes nothing.
    val props = table(s"$fromDb.$f").manifest.props
    val linked = props.contains("partof") ||
      props.keys.exists(_.startsWith("partchild."))
    require(!linked || fromDb == toDb,
      s"cannot rename $from across databases: it participates in a " +
        "partition tree (detach first)")
    Files.move(src, dst)
    // manifests record absolute data-file paths (immutable snapshots);
    // re-anchor every version so history and time travel survive the move
    val (srcPrefix, dstPrefix) = (src.toString, dst.toString)
    val listing = Files.list(dst.resolve("_manifest"))
    val manifests =
      try listing.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".json")).toList
      finally listing.close()
    manifests.foreach { mf =>
      val raw = mapper.readValue(Files.readAllBytes(mf),
        classOf[java.util.Map[String, Object]])
      def rehome(p: String): String =
        if (p.startsWith(srcPrefix)) dstPrefix + p.stripPrefix(srcPrefix) else p
      raw.get("files") match {
        case l: java.util.List[_] =>
          raw.asInstanceOf[java.util.Map[String, Object]]
            .put("files", l.asScala.map(e => rehome(e.toString)).asJava)
        case _ => ()
      }
      // fileStats is keyed by the same absolute paths: leaving the old
      // keys would silently disable merge-probe pruning after a rename
      raw.get("fileStats") match {
        case m: java.util.Map[_, _] =>
          val patched = new java.util.LinkedHashMap[String, Object]()
          m.asScala.foreach { case (k, v) =>
            patched.put(rehome(k.toString), v.asInstanceOf[Object])
          }
          raw.asInstanceOf[java.util.Map[String, Object]].put("fileStats", patched)
        case _ => ()
      }
      // atomic replace: a crash mid-rewrite must never leave a
      // truncated manifest version (same discipline as
      // Manifest.commit's tmp+link protocol)
      val tmp = mf.resolveSibling(mf.getFileName.toString + ".tmp")
      Files.write(tmp, mapper.writeValueAsBytes(raw))
      Files.move(tmp, mf,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    props.get("partof").foreach(parent =>
      table(s"$toDb.$parent").renameProp(s"partchild.$f", s"partchild.$t"))
    props.keys.filter(_.startsWith("partchild.")).toSeq
      .map(_.stripPrefix("partchild."))
      .foreach(c => table(s"$toDb.$c").setProps("partof" -> t))
    if (fromDb == currentDb) unregister(f)
    if (toDb == currentDb) unregister(t)
  }

  def listTables(db: String = currentDb): Seq[String] = {
    val d = warehouse.resolve(db)
    if (!Files.isDirectory(d)) Nil
    else Files.list(d).iterator().asScala
      .filter(p => Files.isDirectory(p.resolve("_manifest")))
      .map(_.getFileName.toString).toSeq.sorted
  }

  /** Stored views: definition persisted, expanded at query time
    * (`/root/reference/catalog/database.go:331-424`). */
  def createView(name: String, sqlText: String): Unit = synchronized {
    val (db, v) = split(name)
    val views = loadViews(db) + (v -> sqlText)
    writeJsonAtomic(warehouse.resolve(db).resolve("_views.json"), views.asJava)
  }

  def dropView(name: String): Unit = synchronized {
    val (db, v) = split(name)
    val views = loadViews(db) - v
    writeJsonAtomic(warehouse.resolve(db).resolve("_views.json"), views.asJava)
    if (db == currentDb) unregister(v)
  }

  // ------------------------------------------------------------------
  // User-defined types (PG CREATE TYPE ... AS ENUM / CREATE DOMAIN —
  // the reference's DuckDB backend supports both; pg_dump replays
  // them before the tables that use them). Persisted per warehouse as
  // `_types.json`: name → kind :: payload list ("enum" :: values, or
  // "domain" :: base type spelling). Columns typed with an enum store
  // as STRING plus an auto CHECK over the value set; a domain column
  // resolves to its base type (SqlRouter.resolveUserType).

  /** name (lowercase) → (kind, payload). */
  def userTypes: Map[String, (String, Seq[String])] = synchronized {
    val f = warehouse.resolve("_types.json")
    if (!Files.exists(f)) Map.empty
    else mapper.readValue(Files.readAllBytes(f),
      classOf[java.util.Map[String, java.util.List[String]]])
      .asScala.map { case (k, v) =>
        val l = v.asScala.toSeq
        k -> (l.head, l.tail)
      }.toMap
  }

  private def writeTypes(ts: Map[String, (String, Seq[String])]): Unit = {
    val enc = ts.map { case (k, (kind, payload)) =>
      k -> (kind +: payload).asJava
    }
    writeJsonAtomic(warehouse.resolve("_types.json"), enc.asJava)
  }

  def createEnumType(name: String, values: Seq[String]): Unit = synchronized {
    writeTypes(userTypes + (name.toLowerCase -> ("enum", values)))
  }

  def createDomainType(name: String, base: String): Unit = synchronized {
    writeTypes(userTypes + (name.toLowerCase -> ("domain", Seq(base))))
  }

  /** DROP TYPE/DOMAIN; false when the name is unknown. */
  def dropUserType(name: String): Boolean = synchronized {
    val ts = userTypes
    val k = name.toLowerCase
    if (!ts.contains(k)) false
    else { writeTypes(ts - k); true }
  }

  /** Catalog-file write discipline: tmp + atomic move (a crash mid-
    * write must never leave a truncated _views/_vars.json — every
    * statement in the db would then fail parsing it), read-modify-write
    * callers synchronized on the engine so concurrent updates don't
    * erase each other. */
  private def writeJsonAtomic(f: Path, value: Object): Unit = {
    val tmp = f.resolveSibling(
      f.getFileName.toString + "." + java.util.UUID.randomUUID() + ".tmp")
    Files.write(tmp, mapper.writeValueAsBytes(value))
    Files.move(tmp, f,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def listViews(db: String = currentDb): Seq[String] = loadViews(db).keys.toSeq.sorted

  /** View name → definition text for a database (A34's pg_views needs
    * the definitions, not just the names). */
  private[graft] def viewDefs(db: String = currentDb): Map[String, String] =
    loadViews(db)

  private def loadViews(db: String): Map[String, String] = {
    val f = warehouse.resolve(db).resolve("_views.json")
    if (!Files.exists(f)) Map.empty
    else mapper.readValue(Files.readAllBytes(f), classOf[java.util.Map[String, String]])
      .asScala.toMap
  }

  // ------------------------------------------------------------------
  // SQL entry (A1-A4 scans/SELECT via Catalyst; views expanded first)

  /** Run SQL with the referenced tables and views registered lazily.
    * Catalyst owns parsing, optimization, and execution — the engine
    * contributes the catalog binding only. */
  def sql(q: String): DataFrame = {
    registerReferenced(q)
    spark.sql(q)
  }

  /** Parameterized SQL (A28 prepared-statement execute). */
  def sql(q: String, params: Map[String, Any]): DataFrame = {
    registerReferenced(q)
    spark.sql(q, params)
  }

  /** Positional-parameter SQL (`?` placeholders — the MySQL prepared-
    * statement form; Spark 3.5+ posarg binding). */
  def sql(q: String, args: Array[Any]): DataFrame = {
    registerReferenced(q)
    spark.sql(q, args)
  }

  // ------------------------------------------------------------------
  // Session prepared statements (A28 as SQL: MySQL PREPARE/EXECUTE/
  // DEALLOCATE — the reference holds these per connection,
  // `pgserver/connection_handler.go:563-777`; here per Engine).

  private val prepared = scala.collection.concurrent.TrieMap.empty[String, String]

  def prepare(name: String, sqlText: String): Unit = prepared(name) = sqlText

  def executePrepared(name: String, args: Array[Any]): DataFrame = {
    val text = prepared.getOrElse(name,
      throw new IllegalArgumentException(s"unknown prepared statement $name"))
    if (args.isEmpty) sql(text) else sql(text, args)
  }

  def deallocate(name: String): Unit = prepared.remove(name)

  /** A28 schema probe: result schema without execution (the analog of
    * the reference's `SELECT * FROM (q) LIMIT 0` NULL-param trick —
    * Spark analysis is lazy, so `.schema` never launches a job). */
  def probeSchema(q: String): StructType = {
    registerReferenced(q)
    spark.sql(q).schema
  }

  // Lazy catalog binding: a statement registers only the tables and
  // views its text references, and a table is re-materialized only when
  // its manifest version moved since last registration (one directory
  // listing per referenced table to find out — no manifest JSON read,
  // no view re-analysis, for the unchanged/unreferenced rest). The
  // eager alternative (re-open every table + re-analyze every view per
  // statement) is O(catalog size) driver work per query — the metadata
  // bottleneck at thousands of tables.
  private val registeredViews = scala.collection.mutable.Set.empty[String]

  /** Temp-view ownership: view name → (table directory, manifest
    * version bound). PER ENGINE since round 14 — the child-session
    * catalog makes names engine-local, so ownership only needs to
    * notice this engine's own committed writes (any commit bumps the
    * journal version → rebind) and database switches. */
  private val viewOwners =
    scala.collection.concurrent.TrieMap.empty[String, (Path, Long)]

  private def idents(s: String): Set[String] =
    // \w+ (not letter-led): CREATE TABLE accepts digit-led names like
    // `2024_data`, so the reference scan must tokenize them whole —
    // pure numeric literals also match but never collide with a table
    "\\w+".r.findAllIn(s).map(_.toLowerCase).toSet

  private def registerReferenced(q: String): Unit = synchronized {
    drainReplicationBeforeRead(idents(q))
    val allTables = listTables()
    val allViews = loadViews(currentDb)
    // transitive closure: a referenced view's definition may reference
    // further tables/views not named in the statement itself
    var ids = idents(q)
    var views = Map.empty[String, String]
    var grew = true
    while (grew) {
      val hit = allViews.filter { case (v, _) =>
        ids.contains(v.toLowerCase) && !views.contains(v)
      }
      grew = hit.nonEmpty
      views ++= hit
      ids ++= hit.values.flatMap(idents)
    }
    // pg_catalog / information_schema emulation (A34): a statement
    // that references a rewritten `__sys__<rel>` / `__is__<rel>` name —
    // directly or through a view definition in the closure above —
    // gets the frame registered from live metadata (metadata-sized,
    // no jobs)
    ids.filter(n => n.startsWith("__sys__") || n.startsWith("__is__"))
      .foreach(PgCatalog.registerIfKnown(this, _))
    allTables.filter(t => ids.contains(t.toLowerCase)).foreach { t =>
      val p = warehouse.resolve(currentDb).resolve(t)
      if (inTransaction) {
        // staged manifests live in memory: always rebind for
        // read-your-writes, and drop the ownership entry so the next
        // non-txn statement rebinds from the published journal
        tableFrame(t).createOrReplaceTempView(t)
        viewOwners.remove(t)
      } else {
        // ownership is PER ENGINE (the child-session catalog makes
        // names engine-local) and keyed by (table dir, raw journal
        // version): any committed write forces a rebind; an unchanged
        // table is one directory listing, zero manifest reads, zero
        // re-analysis
        val v = Manifest.latestVersion(p).getOrElse(-1L)
        // partitioned-parent detection WITHOUT a manifest read on the
        // cached path: the (dir, version) pair pins the props, so the
        // children list is cacheable; a parent ALWAYS rebinds (its
        // children's data moves under the parent's unchanged version —
        // DDL-rare tables, a few manifest reads per statement, no jobs)
        val cached = Engine.partCache.get(p)
        val kids = if (cached != null && cached._1 == v) cached._2
        else {
          val k = table(t).partitionChildren.map(_._1)
          Engine.partCache.put(p, (v, k))
          k
        }
        if (kids.nonEmpty) {
          tableFrame(t).createOrReplaceTempView(t)
          viewOwners.remove(t)
        } else if (!viewOwners.get(t).contains((p, v))) {
          table(t).read().createOrReplaceTempView(t)
          viewOwners.put(t, (p, v))
        }
      }
    }
    // views after tables so definitions resolve against them; analysis
    // is plan-only (no manifest reads, no jobs). spark.sql analyzes
    // EAGERLY, so a view defined over another view must register after
    // its dependency — Map order is arbitrary, so fixpoint-iterate:
    // each pass registers every view whose dependencies now resolve.
    var pendingViews = views
    var progressed = true
    while (pendingViews.nonEmpty && progressed) {
      progressed = false
      pendingViews.foreach { case (v, defn) =>
        try {
          spark.sql(defn).createOrReplaceTempView(v)
          registeredViews += v
          pendingViews -= v
          progressed = true
        } catch {
          case _: org.apache.spark.sql.AnalysisException => () // next pass
        }
      }
    }
    // remainder (genuinely broken definitions): surface the real error
    pendingViews.foreach { case (v, defn) =>
      spark.sql(defn).createOrReplaceTempView(v)
      registeredViews += v
    }
  }

  /** Read-your-writes over the replication surface (r17 verdict #2;
    * the reference flushes pending CDC deltas before ANY data query —
    * `backend/executor.go:55-61` flush-then-execute,
    * `binlog_replica_applier.go:779-863` continuous apply): every SQL
    * entry drains committed-but-unapplied frames BEFORE binding
    * tables, so a SELECT issued between polls sees the replicated
    * state, not the pre-apply snapshot.
    *
    * Scope discipline: only LIVE daemons trigger a drain. A RUNNING
    * replica IO thread drains its whole pending window (the window
    * itself names the tables — [[applyReplicaLog]]'s discovery arm);
    * an ENABLED subscription with a RUNNING apply daemon refreshes
    * when the statement references one of its tables. Poll-only
    * surfaces (STOP REPLICA'd logs, host-less subscriptions) keep
    * their explicit REFRESH/apply contract — and an engine with no
    * live daemon pays one volatile read plus one empty-map check per
    * statement. The drain's own frame walk is O(new bytes), so a
    * quiet stream costs a file-size probe. */
  private def drainReplicationBeforeRead(ids: Set[String]): Unit = {
    if (replicaRunning) applyReplicaLog(Nil)
    if (!subClients.isEmpty) {
      subscriptions.foreach { case (name, sub) =>
        if (sub.getOrElse("enabled", "false") == "true" &&
            subscriptionDaemonRunning(name) &&
            sub.getOrElse("tables", "").split(',')
              .exists(t => t.nonEmpty && ids.contains(t.toLowerCase)))
          refreshSubscription(name)
      }
    }
  }

  private def unregister(name: String): Unit = synchronized {
    spark.catalog.dropTempView(name)
    viewOwners.remove(name)
    registeredViews -= name
  }

  /** Drop every binding registered from this warehouse — used when the
    * current database changes so stale names can't shadow the new
    * database's tables. */
  private def unregisterAll(): Unit = synchronized {
    viewOwners.filter(_._2._1.startsWith(warehouse)).keys.foreach { n =>
      spark.catalog.dropTempView(n)
      viewOwners.remove(n)
    }
    registeredViews.foreach(spark.catalog.dropTempView(_))
    registeredViews.clear()
  }

  // ------------------------------------------------------------------
  // information_schema (SURVEY §2.B Scans row / A26): catalog metadata
  // as queryable DataFrames, built from the manifests.

  def informationSchemaTables(): DataFrame = {
    import spark.implicits._
    listDatabases().flatMap { db =>
      listTables(db).map { t =>
        val m = table(s"$db.$t").manifest
        (db, t, "BASE TABLE", m.files.size.toLong, m.version)
      } ++ listViews(db).map(v => (db, v, "VIEW", 0L, 0L))
    }.toDF("table_schema", "table_name", "table_type", "n_files", "version")
  }

  def informationSchemaColumns(): DataFrame = {
    import spark.implicits._
    listDatabases().flatMap { db =>
      listTables(db).flatMap { t =>
        val m = table(s"$db.$t").manifest
        m.schema.fields.zipWithIndex.map { case (f, i) =>
          (db, t, f.name, i + 1, f.dataType.simpleString, f.nullable,
            m.pkCols.contains(f.name))
        }
      }
    }.toDF("table_schema", "table_name", "column_name", "ordinal_position",
      "data_type", "is_nullable", "is_primary_key")
  }

  // ------------------------------------------------------------------
  // Diagnostics area (SHOW WARNINGS). The engine REFUSES bad
  // statements instead of warning, so this stays empty except for the
  // few places a statement succeeds with a caveat worth surfacing —
  // join-DML multi-match collapse being the first (round-9 verdict
  // #7). MySQL lifecycle: the area persists until the next
  // non-diagnostic statement (the router clears it).

  private val warningsBuf =
    scala.collection.mutable.ArrayBuffer.empty[(String, Int, String)]

  def addWarning(level: String, code: Int, message: String): Unit =
    synchronized { warningsBuf += ((level, code, message)) }

  def warnings: Seq[(String, Int, String)] = synchronized { warningsBuf.toSeq }

  def clearWarnings(): Unit = synchronized { warningsBuf.clear() }

  // ------------------------------------------------------------------
  // Session dialect (round-9 verdict #3: one flag instead of per-arm
  // heuristics). Every statement the router sees is scanned for
  // unambiguous dialect markers (backticks / `@@` sysvars / MySQL-only
  // SETs → mysql; PG-only GUC SETs / `SET x TO y` / DISCARD → pg) and
  // the LATEST evidence wins — a session that replays a mysqldump and
  // then a pg_dump flips mid-session, matching whichever tool is
  // currently talking. Statements with no marker leave the flag
  // untouched. While no evidence has arrived the old var-based
  // heuristic (pgSessionEvidence in SqlRouter) initializes the answer.
  // Session-scoped: never persisted, never shared across engines.

  @volatile private var sessionDialectVar: Option[String] = None

  /** `Some("pg")` / `Some("mysql")` once evidence has been seen. */
  def sessionDialect: Option[String] = sessionDialectVar

  /** Record dialect evidence (router-driven; latest evidence wins). */
  def observeDialect(d: String): Unit = {
    require(d == "pg" || d == "mysql", s"unknown dialect '$d'")
    sessionDialectVar = Some(d)
  }

  // ------------------------------------------------------------------
  // Session + persisted variables (A25)

  // session vars are scoped to THIS engine (warehouse), not the shared
  // SparkSession: two engines over one session must not see each
  // other's SET state (and dialect evidence like statement_timeout
  // must not leak across databases)
  private val varPrefix =
    s"graft.var.${Integer.toHexString(warehouse.toAbsolutePath.toString.hashCode)}."

  def setVar(key0: String, value: String, persist: Boolean = false): Unit = {
    // variable names are case-insensitive in BOTH dialects (PG folds
    // GUC names, MySQL sysvars likewise): normalize once on write so
    // `SET TimeZone` and `SHOW timezone` meet at one key
    val key = key0.toLowerCase
    spark.conf.set(s"$varPrefix$key", value)
    if (persist) synchronized {
      val f = warehouse.resolve("_vars.json")
      val cur: Map[String, String] =
        if (Files.exists(f))
          mapper.readValue(Files.readAllBytes(f), classOf[java.util.Map[String, String]]).asScala.toMap
        else Map.empty
      writeJsonAtomic(f, (cur + (key -> value)).asJava)
    }
  }

  /** RESET analog: drop the session-scoped value (the persisted global,
    * if any, shows through again — PG's session/system layering). */
  def unsetVar(key: String): Unit =
    spark.conf.unset(s"$varPrefix${key.toLowerCase}")

  /** DISCARD ALL / RESET ALL: drop every session-scoped variable
    * (persisted globals show through again). */
  def clearSessionVars(): Unit =
    spark.conf.getAll.keys.filter(_.startsWith(varPrefix))
      .foreach(spark.conf.unset)

  /** All variables visible to SHOW VARIABLES: persisted globals
    * overlaid by session-scoped settings. */
  def listVars(): Map[String, String] = {
    val f = warehouse.resolve("_vars.json")
    val persisted: Map[String, String] =
      if (Files.exists(f))
        mapper.readValue(Files.readAllBytes(f), classOf[java.util.Map[String, String]]).asScala.toMap
      else Map.empty
    val session = spark.conf.getAll.collect {
      case (k, v) if k.startsWith(varPrefix) => k.stripPrefix(varPrefix) -> v
    }
    persisted ++ session
  }

  def getVar(key0: String): Option[String] = {
    val key = key0.toLowerCase
    spark.conf.getOption(s"$varPrefix$key").orElse {
      val f = warehouse.resolve("_vars.json")
      if (!Files.exists(f)) None
      else Option(mapper.readValue(Files.readAllBytes(f),
        classOf[java.util.Map[String, String]]).get(key))
    }
  }

  // ------------------------------------------------------------------
  // BACKUP / RESTORE (A39,
  // `/root/reference/pgserver/backup_handler.go:28-175`): each table's
  // current snapshot exported as parquet + a metadata manifest. The
  // destination can be any Hadoop-FS URI (s3a://... on a real cluster —
  // same code path); the snapshot read is distributed, nothing flows
  // through the driver.

  def backupDatabase(db: String, destDir: Path): Unit = {
    Files.createDirectories(destDir)
    val names = listTables(db)
    Files.write(destDir.resolve("_tables.json"),
      mapper.writeValueAsBytes(names.asJava))
    // per-table exports are INDEPENDENT Spark write jobs over disjoint
    // snapshots into disjoint directories — running a few concurrently
    // back-fills the executor slots one small table's write tail leaves
    // idle (guide §2.6), so a many-table database backs up in
    // ~max(table) instead of sum(tables)
    inParallel(names, maxThreads = 4) { t =>
      val tbl = table(s"$db.$t")
      val m = tbl.manifest
      tbl.read().write.mode("overwrite")
        .parquet(destDir.resolve(t).resolve("data").toString)
      Files.write(destDir.resolve(t).resolve("_meta.json"),
        mapper.writeValueAsBytes(Map(
          "schema" -> m.schema.json,
          "pkCols" -> m.pkCols.asJava,
          "autoInc" -> java.lang.Long.valueOf(m.autoInc),
          "props" -> m.props.asJava).asJava))
    }
    val views = loadViews(db)
    Files.write(destDir.resolve("_views.json"), mapper.writeValueAsBytes(views.asJava))
  }

  /** Run `body` over `items` on a small fixed pool, propagating the
    * first failure; sequential for 0/1 items. Used by backup/restore,
    * whose per-table work is independent by construction. */
  private def inParallel[T](items: Seq[T], maxThreads: Int)(
      body: T => Unit): Unit = {
    if (items.size <= 1) { items.foreach(body); return }
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.min(items.size, maxThreads))
    val ec = scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      import scala.concurrent.{Await, Future}
      val fs = items.map(it => Future(body(it))(ec))
      fs.foreach(Await.result(_, scala.concurrent.duration.Duration(30, "min")))
    } finally pool.shutdown()
  }

  def restoreDatabase(db: String, srcDir: Path): Unit = {
    // Validate the whole backup BEFORE the destructive swap — a bad
    // path must fail with the database untouched (the reference
    // downloads + verifies the .db file first, restore_handler.go).
    val tf = srcDir.resolve("_tables.json")
    require(Files.isRegularFile(tf), s"not a backup directory: $srcDir")
    val names = mapper.readValue(Files.readAllBytes(tf),
      classOf[java.util.List[String]]).asScala.toSeq
    names.foreach { t =>
      require(Files.isRegularFile(srcDir.resolve(t).resolve("_meta.json")),
        s"backup is missing table metadata: $t")
    }
    if (!Files.isDirectory(warehouse.resolve(db))) createDatabase(db)
    // RESTORE replaces the database's current content (the reference
    // swaps in the downloaded .db file wholesale) — views included: a
    // view absent from the backup must not survive the restore
    listTables(db).foreach(t => dropTable(s"$db.$t"))
    listViews(db).foreach(v => dropView(s"$db.$v"))
    // independent per-table restores (disjoint target dirs, disjoint
    // source data) — same §2.6 overlap as backupDatabase above
    inParallel(names, maxThreads = 4) { t =>
      val meta = mapper.readValue(Files.readAllBytes(srcDir.resolve(t).resolve("_meta.json")),
        classOf[java.util.Map[String, Object]])
      val schema = org.apache.spark.sql.types.DataType
        .fromJson(meta.get("schema").asInstanceOf[String])
        .asInstanceOf[StructType]
      val props = meta.get("props")
        .asInstanceOf[java.util.Map[String, String]].asScala.toMap
      val tbl = GraftTable.create(spark, warehouse.resolve(db).resolve(t), schema,
        meta.get("pkCols").asInstanceOf[java.util.List[String]].asScala.toSeq,
        meta.get("autoInc").asInstanceOf[Number].longValue(),
        props)
      // a partitioned PARENT owns no files (its rows live in the
      // children, each restored as its own table; the partchild.*
      // pointers in props relink the tree) — inserting its empty
      // backup frame would trip the parent-never-holds-files guard
      if (!props.contains("partition.by"))
        tbl.insert(spark.read.schema(schema)
          .parquet(srcDir.resolve(t).resolve("data").toString))
    }
    val vf = srcDir.resolve("_views.json")
    if (Files.exists(vf)) {
      val views = mapper.readValue(Files.readAllBytes(vf),
        classOf[java.util.Map[String, String]]).asScala
      views.foreach { case (v, defn) => createView(s"$db.$v", defn) }
    }
  }

  // ------------------------------------------------------------------
  // Subscriptions (C11; reference
  // `pgserver/subscription_handler.go:15-383`): CREATE SUBSCRIPTION
  // reads the publisher's current WAL position FIRST, then snapshots
  // every published table (the reference attaches the publisher via
  // postgres_scanner and runs `CREATE TABLE ... AS FROM` per table),
  // then streams changes from the recorded position — the copy/stream
  // overlap re-applies idempotently (LWW condense). The local
  // publisher analog in the connection string: `warehouse=<path>`
  // names the source warehouse (the ATTACH analog), `dbname=<db>` the
  // published database, `framelog=<dir>` + `slot=<name>` its WAL
  // (FrameLog offsets are LSNs; PgOutputEncoder writes the frames).
  // Persisted per warehouse as `_subscriptions.json`.
  // [[refreshSubscription]] is the synchronous poll-apply surface; the
  // continuous form is the same pipeline under Structured Streaming
  // (framelog source → decodeSlotStreamsStateful → CdcMerge, C1/C2).

  /** Live apply-worker daemons, one per ENABLED subscription whose
    * connection names a HOST (the reference's subscription handler
    * streams from the publisher continuously,
    * `pgserver/subscription_handler.go:202-290`; ours is the exact
    * analog of START REPLICA → [[graft.streaming.MySqlBinlogClient]]):
    * a [[graft.streaming.PgReplicationClient]] appends the publisher's
    * pgoutput frames to the subscription's framelog slot, and the
    * poll/REFRESH path consumes them unchanged — the daemon moves
    * bytes, REFRESH moves state. */
  private val subClients = new java.util.concurrent.ConcurrentHashMap[
    String, graft.streaming.PgReplicationClient]()
  private val subDaemonLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** True while `name`'s live apply daemon runs (spec/ops surface). */
  def subscriptionDaemonRunning(name: String): Boolean =
    Option(subClients.get(name)).exists(_.isRunning)

  /** Converge `name`'s apply daemon to its PERSISTED state — an
    * idempotent reconciler, called OUTSIDE the engine monitor (a
    * daemon stop joins its thread for up to 10 s; holding the global
    * lock through that would stall every synchronized Engine
    * operation). Per-subscription serialization + reading the flag
    * INSIDE the lock means any interleaving of ENABLE/DISABLE/DROP
    * converges to the last-written flag: the reconcile that runs last
    * reads it and acts on it, never on its caller's stale intent.
    * A stop always completes (join) before a restart can begin, so
    * two appenders never share a framelog file. */
  private def reconcileSubDaemon(name: String): Unit = {
    val lock = subDaemonLocks.computeIfAbsent(name, _ => new Object)
    lock.synchronized {
      val sub = subscriptions.get(name) // engine-synchronized read
      val kv = sub.map(s => connKv(s("connection"))).getOrElse(Map.empty)
      val want = sub.exists(_.getOrElse("enabled", "false") == "true") &&
        kv.contains("host")
      val running = Option(subClients.get(name)).exists(_.isRunning)
      if (!want) {
        Option(subClients.remove(name)).foreach(_.stop())
      } else if (!running) {
        Option(subClients.remove(name)).foreach(_.stop()) // dead entry
        val s = sub.get
        val dir = java.nio.file.Paths.get(kv.getOrElse("framelog",
          throw new IllegalArgumentException(
            "a live subscription (host=...) needs framelog=<dir> — " +
              "the local WAL landing directory its REFRESH reads")))
        Files.createDirectories(dir)
        val slot = kv.getOrElse("slot", s("publication"))
        val cl = new graft.streaming.PgReplicationClient(
          kv("host"),
          kv.get("port").map(_.trim.toInt).getOrElse(5432),
          kv.getOrElse("user", "postgres"),
          kv.getOrElse("dbname", "main"),
          slot, s("publication"), dir,
          password = kv.get("password"),
          sslContext =
            if (kv.get("sslmode").exists(_.startsWith("require")))
              Some(javax.net.ssl.SSLContext.getDefault)
            else None)
        subClients.put(name, cl.start())
      }
    }
  }

  /** name → {connection, publication, db, tables, enabled, lsn}. */
  def subscriptions: Map[String, Map[String, String]] = synchronized {
    val f = warehouse.resolve("_subscriptions.json")
    if (!Files.exists(f)) Map.empty
    else mapper.readValue(Files.readAllBytes(f),
      classOf[java.util.Map[String, java.util.Map[String, String]]])
      .asScala.map { case (k, v) => k -> v.asScala.toMap }.toMap
  }

  private def writeSubscriptions(m: Map[String, Map[String, String]]): Unit =
    synchronized {
      writeJsonAtomic(warehouse.resolve("_subscriptions.json"),
        m.map { case (k, v) => k -> v.asJava }.asJava)
    }

  /** PG-style `key=value ...` connection string (reference
    * `subscription_handler.go:68-146` parse shape; values here may be
    * filesystem paths — a value runs to the next ` key=` token, so
    * paths containing spaces parse whole instead of silently
    * truncating at the first space). */
  private def connKv(conn: String): Map[String, String] =
    """(\w+)=((?:(?!\s+\w+=).)*)""".r.findAllMatchIn(conn)
      .map { m =>
        val v0 = m.group(2).trim
        // inner-quoted values (paths with spaces) unwrap; PG conninfo
        // quoting — a quoted value that kept its quotes would resolve
        // to a nonexistent path and a silently dead subscription
        val v = if (v0.length >= 2 && v0.head == '\'' && v0.last == '\'')
          v0.substring(1, v0.length - 1)
        else v0
        m.group(1).toLowerCase -> v
      }
      .filter(_._2.nonEmpty) // empty value = key absent, not Paths.get("")
      .toMap



  def createSubscription(name: String, connection: String,
      publication: String): Unit = {
    require(!subscriptions.contains(name),
      s"""subscription "$name" already exists""")
    val kv = connKv(connection)
    // live-daemon config validates BEFORE any snapshot or catalog
    // write — a failed CREATE must not leave a half-created enabled
    // subscription behind (the retry would hit "already exists")
    kv.get("host").foreach { _ =>
      require(kv.contains("framelog"),
        "a live subscription (host=...) needs framelog=<dir> — " +
          "the local WAL landing directory its REFRESH reads")
      kv.get("port").foreach { p =>
        val t = p.trim
        require(t.nonEmpty && t.length <= 5 && t.forall(_.isDigit) &&
          t.toInt >= 1 && t.toInt <= 65535,
          s"invalid port in subscription connection: $p")
      }
    }
    val srcWh = java.nio.file.Paths.get(kv.getOrElse("warehouse",
      throw new IllegalArgumentException(
        "CREATE SUBSCRIPTION connection needs warehouse=<path> " +
          "(the local analog of host/dbname)")))
    require(Files.isDirectory(srcWh), s"publisher warehouse not found: $srcWh")
    val srcDb = kv.getOrElse("dbname", "main")
    val slot = kv.getOrElse("slot", publication)
    // 1. WAL position BEFORE the copy (reference: pg_current_wal_lsn
    //    first — changes landing during the copy re-apply, idempotent).
    //    ONE walk yields both the LSN and the byte position (the poll
    //    resume point): two walks could disagree about the tail under
    //    concurrent appends and silently skip a frame. The walk stops
    //    at the last COMMIT record, never mid-transaction.
    val (bytePos0, lsnOpt) = kv.get("framelog")
      .map(d => graft.streaming.FrameLog.endAtPgCommit(
        java.nio.file.Paths.get(d), slot, 0L))
      .getOrElse((0L, None))
    val lsn0 = lsnOpt.getOrElse(0L)
    // 2. snapshot every published table into the CURRENT database
    val src = new Engine(spark, srcWh)
    val tables = src.listTables(srcDb)
    require(tables.nonEmpty, s"publication $publication is empty: " +
      s"no tables in $srcDb at $srcWh")
    tables.foreach(tn => require(!listTables().contains(tn),
      s"subscription target table $tn already exists in $currentDb"))
    tables.foreach { tn =>
      val st = src.table(s"$srcDb.$tn")
      val m = st.manifest
      val local = GraftTable.create(spark,
        warehouse.resolve(currentDb).resolve(tn),
        m.schema, m.pkCols, m.autoInc, m.props)
      if (!m.props.contains("partition.by")) local.insert(st.read())
    }
    // 3. persist enabled with the pre-copy checkpoint (LSN + byte pos).
    //    Re-read, re-check the name, and write in ONE synchronized RMW
    //    (the check at the top is a fast-fail; the snapshot between it
    //    and here runs unlocked, so two concurrent CREATEs could
    //    otherwise interleave and silently drop one catalog entry —
    //    same discipline as refreshSubscription's advance())
    val entry = Map(
      "connection" -> connection, "publication" -> publication,
      "db" -> currentDb, "tables" -> tables.mkString(","),
      "enabled" -> "true", "lsn" -> lsn0.toString,
      "bytepos" -> bytePos0.toString)
    synchronized {
      val subs = subscriptions
      require(!subs.contains(name),
        s"""subscription "$name" already exists""")
      writeSubscriptions(subs + (name -> entry))
    }
    // live publisher (host= in the conninfo): start the apply daemon —
    // CREATE SUBSCRIPTION defaults to enabled (PG semantics)
    reconcileSubDaemon(name)
  }

  def alterSubscription(name: String, enabled: Boolean): Unit = {
    synchronized { // atomic RMW under the engine monitor; the daemon
      // action runs OUTSIDE it via the reconciler (stop joins a
      // thread; the reconciler converges to the flag this RMW wrote,
      // so interleaved ENABLE/DISABLE can't strand a contradiction)
      val subs = subscriptions
      val sub = subs.getOrElse(name, throw new IllegalArgumentException(
        s"""subscription "$name" does not exist"""))
      writeSubscriptions(subs.updated(name,
        sub.updated("enabled", enabled.toString)))
    }
    // ENABLE resumes the live apply daemon; DISABLE stops it (PG:
    // DISABLE stops the apply worker; the slot's WAL waits upstream)
    reconcileSubDaemon(name)
  }

  def dropSubscription(name: String): Unit = {
    synchronized {
      val subs = subscriptions
      require(subs.contains(name),
        s"""subscription "$name" does not exist""")
      // PG semantics: the subscribed tables and their data survive
      writeSubscriptions(subs - name)
    }
    reconcileSubDaemon(name)
  }

  /** Restart the apply daemons of every ENABLED live subscription —
    * the ops surface for process restarts (PG restarts apply workers
    * with the server). Deliberately NOT run at Engine construction:
    * harness engines are constructed per query by the dozen, and
    * auto-starting network daemons there would be wrong (the same
    * recorded decision as the replica controller's
    * `running` flag — ENGINEERING_NOTES r16). Reconciler-based, so a
    * racing ALTER converges to the persisted flag. */
  def resumeSubscriptionDaemons(): Unit =
    subscriptions.keys.foreach(reconcileSubDaemon)

  /** Poll-apply: decode and LWW-merge every framelog frame past the
    * checkpoint into the subscribed tables, then advance the
    * checkpoint. Disabled subscriptions apply NOTHING (PG: DISABLE
    * pauses the apply worker; the frames wait in the log). Returns the
    * number of frames applied. */
  def refreshSubscription(name: String): Long = {
    val sub = subscriptions.getOrElse(name,
      throw new IllegalArgumentException(
        s"""subscription "$name" does not exist"""))
    if (sub("enabled") != "true") return 0L
    val kv = connKv(sub("connection"))
    val dir = kv.getOrElse("framelog", return 0L) // snapshot-only sub
    val slot = kv.getOrElse("slot", sub("publication"))
    val ckpt = sub("lsn").toLong
    // O(new bytes) per poll: resume the header walk at the stored byte
    // position, freeze the window end NOW at the last COMMIT boundary
    // (a window cut mid-transaction would hand the stateless decoder a
    // Begin-less suffix on the NEXT poll — a permanently wedged
    // subscription; appends racing this refresh wait for the next),
    // and hand the scan the exact byte range — the log's total size
    // never enters the cost. Subscriptions persisted before the byte
    // checkpoint existed resume from 0 once (the LSN filter keeps that
    // correct, just not O(new)).
    val from = sub.getOrElse("bytepos", "0").toLong
    val (to, _) = graft.streaming.FrameLog.endAtPgCommit(
      java.nio.file.Paths.get(dir), slot, from)
    if (to <= from) return 0L
    import org.apache.spark.sql.functions.{col, count, lit, max}
    val frames = spark.read.format("framelog")
      .option(s"range.$slot", s"$from:$to").load(dir)
      .filter(col("slot") === slot && col("off") > ckpt)
      .persist() // one file read: ONE tagged decode pass below
    try {
      val head = frames.agg(max(col("off")).as("mx"),
        count(lit(1)).as("n")).collect()(0)
      // advance AGAINST THE CURRENT catalog entry, touching only the
      // checkpoint keys — a concurrent ALTER (e.g. DISABLE issued
      // while this apply ran) must not be reverted by a stale snapshot
      def advance(lsn: Option[Long]): Unit = synchronized {
        val subs = subscriptions
        subs.get(name).foreach { cur =>
          val upd = lsn.foldLeft(cur.updated("bytepos", to.toString))(
            (m, v) => m.updated("lsn", v.toString))
          writeSubscriptions(subs.updated(name, upd))
        }
      }
      if (head.isNullAt(0)) {
        // window held only pre-checkpoint frames: advance the byte pos
        advance(None)
        return 0L
      }
      val (maxOff, n) = (head.getLong(0), head.getLong(1))
      // ONE tagged decode pass for the whole window (the pgoutput twin
      // of applyReplicaLog's multi-table apply): a subscription
      // publishing many tables parses the window's bytes once, then
      // each table's slice is a filter + struct projection over the
      // persisted decode
      val tbls = sub("tables").split(',').filter(_.nonEmpty).toSeq
      if (tbls.size == 1) {
        // single-table subscription: decode straight into the apply —
        // the tagged pass below would pay a persist + count
        // materialization job this window doesn't need
        val t = table(s"${sub("db")}.${tbls.head}")
        graft.streaming.CdcMerge.applyBatch(t,
          graft.streaming.PgOutputDecoder.decodeSlotStreams(
            frames, "slot", "off", "payload",
            s"public.${tbls.head}", t.schema), Some(to - from))
      } else if (tbls.nonEmpty) {
        val byRel = tbls.map(tn =>
          s"public.$tn" -> table(s"${sub("db")}.$tn").schema)
        val decoded = graft.streaming.PgOutputDecoder
          .decodeSlotStreamsMulti(frames, "slot", "off", "payload", byRel)
          .persist()
        try {
          decoded.count() // materialize the single pass before the splits
          tbls.zipWithIndex.foreach { case (tn, i) =>
            val t = table(s"${sub("db")}.$tn")
            val slice = decoded.filter(col(s"relation") === s"public.$tn")
              .select(t.schema.fieldNames.toSeq
                .map(f => col(s"__t_$i.`$f`").as(f)) ++
                graft.streaming.CdcMerge.metaCols.map(col): _*)
            graft.streaming.CdcMerge.applyBatch(t, slice, Some(to - from))
          }
        } finally decoded.unpersist()
      }
      advance(Some(maxOff))
      n
    } finally frames.unpersist()
  }

  // ------------------------------------------------------------------
  // MySQL replica controller (the reference's binlog replication
  // statement surface — `binlogreplication/binlog_replica_controller.go:
  // 94-360` and its e2e `binlog_replication_test.go`): CHANGE
  // REPLICATION SOURCE TO / CHANGE REPLICATION FILTER / START / STOP /
  // RESET REPLICA / SHOW REPLICA STATUS. The IO thread is
  // [[graft.streaming.MySqlBinlogClient]] (the live TCP replica
  // daemon, C1) appending frames to `<warehouse>/_replica/`; the
  // SQL-apply side is the framelog pipeline (C1/C6/C7), with the
  // recorded REPLICATE_DO/IGNORE_TABLE filters feeding
  // CdcMerge.filterTables (C10). Config persists as `_replica.json`
  // so a restarted engine can resume (the reference persists its
  // running state the same way). GTID auto-positioning is the ONLY
  // mode, exactly like the reference.

  @volatile private var replicaClientVar
      : Option[graft.streaming.MySqlBinlogClient] = None

  def replicaConfig: Map[String, String] = synchronized {
    val f = warehouse.resolve("_replica.json")
    if (!Files.exists(f)) Map.empty
    else mapper.readValue(Files.readAllBytes(f),
      classOf[java.util.Map[String, String]]).asScala.toMap
  }

  private def writeReplicaConfig(m: Map[String, String]): Unit =
    synchronized {
      writeJsonAtomic(warehouse.resolve("_replica.json"), m.asJava)
    }

  def replicaRunning: Boolean = replicaClientVar.exists(_.isRunning)

  /** CHANGE REPLICATION SOURCE TO — keys are already normalized
    * (SOURCE_/MASTER_ stripped, lowercased) by the router. */
  def changeReplicationSource(opts: Map[String, String]): Unit = {
    require(!replicaRunning,
      "This operation cannot be performed with a running replica io " +
        "thread; run STOP REPLICA first")
    // the reference supports GTID positioning only and errors the
    // same way (binlog_replication_test.go:364-368)
    opts.get("auto_position").foreach(v =>
      require(v.trim != "0", "SOURCE_AUTO_POSITION cannot be disabled"))
    require(!opts.contains("log_file") && !opts.contains("log_pos"),
      "only GTID auto-positioning is supported: " +
        "SOURCE_LOG_FILE/SOURCE_LOG_POS cannot be set")
    writeReplicaConfig(replicaConfig ++
      opts.map { case (k, v) => s"source.$k" -> v })
  }

  /** MySQL semantics: a filter type NOT named in the statement keeps
    * its previous value (None); a named one replaces — including with
    * an empty list, which CLEARS it. */
  def changeReplicationFilter(doTables: Option[Seq[String]],
      ignoreTables: Option[Seq[String]]): Unit = synchronized {
    require(!replicaRunning,
      "This operation cannot be performed with a running replica io " +
        "thread; run STOP REPLICA first")
    val base = replicaConfig
    val withDo = doTables.fold(base)(ts =>
      base + ("filter.do_table" -> ts.mkString(",")))
    val withBoth = ignoreTables.fold(withDo)(ts =>
      withDo + ("filter.ignore_table" -> ts.mkString(",")))
    writeReplicaConfig(withBoth)
  }

  /** Recorded C10 filters for the apply pipeline
    * (CdcMerge.filterTables): (do-tables, ignore-tables). */
  def replicaFilters: (Seq[String], Seq[String]) = {
    val c = replicaConfig
    def split(k: String) =
      c.getOrElse(k, "").split(',').map(_.trim).filter(_.nonEmpty).toSeq
    (split("filter.do_table"), split("filter.ignore_table"))
  }

  /** Apply the recorded REPLICATE_DO/IGNORE_TABLE filters to a decoded
    * change stream — the SQL-thread-side filter, exactly where MySQL
    * applies REPLICATE_* rules (reference
    * `binlogreplication/binlog_replica_filtering.go`). An accepted
    * CHANGE REPLICATION FILTER must ACT: this is the apply pipeline's
    * enforcement point (decode → filterReplicaTables → condense →
    * merge). `db.table` entries match the `dbCol`/`tableCol` pair. */
  def filterReplicaTables(events: DataFrame, dbCol: String,
      tableCol: String): DataFrame = {
    def toPairs(ts: Seq[String]): Set[(String, String)] =
      ts.map { qt =>
        qt.split('.') match {
          case Array(d, t) => (d, t)
          case _ => throw new IllegalArgumentException(
            s"replication filter entries are db.table, got: $qt")
        }
      }.toSet
    val (doT, ignT) = replicaFilters
    graft.streaming.CdcMerge.filterTables(events, dbCol, tableCol,
      toPairs(doT), toPairs(ignT))
  }

  def startReplica(): Unit = synchronized {
    if (replicaRunning) {
      // MySQL logs warning 3083 and keeps the running threads
      addWarning("Note", 3083,
        "Replication thread(s) for channel '' are already running.")
      return
    }
    val c = replicaConfig
    require(c.keys.exists(_.startsWith("source.")),
      "server is not configured as a replication replica")
    val host = c.getOrElse("source.host", "").trim
    require(host.nonEmpty, "Invalid (empty) hostname")
    val user = c.getOrElse("source.user", "").trim
    require(user.nonEmpty, "Invalid (empty) username")
    val dir = warehouse.resolve("_replica")
    Files.createDirectories(dir)
    def flag(k: String): Boolean =
      c.get(k).exists(v => v.trim != "0" && !v.trim.equalsIgnoreCase("off"))
    val cl = new graft.streaming.MySqlBinlogClient(
      host,
      c.getOrElse("source.port", "3306").trim.toInt,
      user,
      c.getOrElse("source.password", ""),
      "replica",
      dir,
      // default matches BOTH MySQL's SOURCE_CONNECT_RETRY=60 and what
      // replicaStatus displays — a 1s default would hammer the primary
      // while the status claimed 60s spacing
      reconnectBackoffMs =
        c.get("source.connect_retry").map(_.trim.toLong * 1000)
          .getOrElse(60000L),
      maxRetries = c.get("source.retry_count").map(_.trim.toInt).getOrElse(100),
      heartbeatPeriodMs =
        c.get("source.heartbeat_period").map(s =>
          (s.trim.toDouble * 1000).toLong).getOrElse(30000L),
      // SOURCE_SSL=1 → TLS with the platform default trust store
      // (an accepted option MUST act — a silently-plaintext "ssl"
      // would ship credentials the user asked to encrypt);
      // GET_SOURCE_PUBLIC_KEY=1 → caching_sha2 full-auth RSA fallback
      sslContext =
        if (flag("source.ssl")) Some(javax.net.ssl.SSLContext.getDefault)
        else None,
      allowPublicKeyRetrieval = flag("source.public_key"))
    replicaClientVar = Some(cl.start())
    writeReplicaConfig(replicaConfig + ("running" -> "true"))
  }

  def stopReplica(): Unit = synchronized {
    if (!replicaRunning)
      addWarning("Note", 3084,
        "Replication thread(s) for channel '' are already stopped.")
    replicaClientVar.foreach(_.stop())
    replicaClientVar = None
    if (replicaConfig.nonEmpty)
      writeReplicaConfig(replicaConfig + ("running" -> "false"))
  }

  /** RESET REPLICA forgets the replication position; ALL also drops
    * the source configuration (MySQL semantics). */
  def resetReplica(all: Boolean): Unit = synchronized {
    require(!replicaRunning,
      "This operation cannot be performed with a running replica io " +
        "thread; run STOP REPLICA first")
    Files.deleteIfExists(warehouse.resolve("_replica").resolve("replica.gtidpos"))
    if (all) writeReplicaConfig(Map.empty)
  }

  /** SHOW REPLICA STATUS row (column, value) pairs; empty when the
    * server was never configured as a replica (MySQL returns an empty
    * set there). */
  def replicaStatus: Seq[(String, String)] = {
    val c = replicaConfig
    if (c.isEmpty || !c.keys.exists(_.startsWith("source."))) return Nil
    val cl = replicaClientVar
    val gtid: Map[String, String] = cl.map(_.executed).filter(_.nonEmpty)
      .getOrElse {
        val f = warehouse.resolve("_replica").resolve("replica.gtidpos")
        if (!Files.exists(f)) Map.empty
        else new String(Files.readAllBytes(f),
          java.nio.charset.StandardCharsets.UTF_8).linesIterator
          .filter(_.nonEmpty).map { l =>
            val Array(sid, ivs) = l.split("=", 2); sid -> ivs
          }.toMap
      }
    Seq(
      "Channel_Name" -> "",
      "Source_Host" -> c.getOrElse("source.host", ""),
      "Source_Port" -> c.getOrElse("source.port", "3306"),
      "Source_User" -> c.getOrElse("source.user", ""),
      "Connect_Retry" -> c.getOrElse("source.connect_retry", "60"),
      "Auto_Position" -> "1",
      "Replica_IO_Running" -> cl.map(_.ioState).getOrElse("No"),
      // a daemon whose retries exhausted is DEAD, not paused — both
      // threads report No and Last_IO_Error carries the cause
      // (monitoring on either signal must see the outage)
      "Replica_SQL_Running" -> (if (cl.exists(_.isRunning)) "Yes" else "No"),
      "Replicate_Do_Table" -> c.getOrElse("filter.do_table", ""),
      "Replicate_Ignore_Table" -> c.getOrElse("filter.ignore_table", ""),
      "Executed_Gtid_Set" -> gtid.toSeq.sorted
        .map { case (s, iv) => s"$s:$iv" }.mkString(","),
      "Last_IO_Error" -> cl.flatMap(_.lastError)
        .map(e => Option(e.getMessage).getOrElse(e.toString)).getOrElse(""))
  }

  /** SQL-apply side of the replica, poll form (the reference's applier
    * thread applies row events as they arrive,
    * `binlogreplication/binlog_replica_applier.go:864-1266`; here the
    * IO thread's flushed framelog applies in batches — the exact
    * discipline of [[refreshSubscription]]): decode every frame in
    * the window [apply checkpoint, last binlog txn boundary), honor
    * the recorded REPLICATE_* filters (C10), LWW-condense + CoW-merge
    * each named table (C6/C7), then advance the checkpoint. `tables`
    * are local `db.table` names matching the primary's TABLE_MAP
    * names; decode specs derive from each table's declared schema
    * ([[graft.streaming.BinlogRowDecoder.specsFor]]). The window cut
    * ([[graft.streaming.FrameLog.endAtMyCommit]]) never splits a
    * transaction, so a poll racing the IO thread stays safe. Returns
    * the number of frames consumed. */
  def applyReplicaLog(tables: Seq[String],
      crc32Checksum: Boolean = false): Long = {
    val dir = warehouse.resolve("_replica")
    val slot = "replica"
    if (!Files.isDirectory(dir)) return 0L
    val from = replicaConfig.getOrElse("apply.bytepos", "0").toLong
    val (to, _) = graft.streaming.FrameLog.endAtMyCommit(dir, slot, from)
    if (to <= from) return 0L
    import org.apache.spark.sql.functions.col
    val frames = spark.read.format("framelog")
      .option(s"range.$slot", s"$from:$to").load(dir.toString)
      .persist() // one file read: discovery scan + ONE decode pass
    try {
      val n = frames.count()
      // per-table admission with filterTables' exact rule (the row-
      // level enforcement point): DO-list admits when set, IGNORE wins
      val (doT, ignT) = replicaFilters
      def admitted(qt: String): Boolean =
        !ignT.contains(qt) && (doT.isEmpty || doT.contains(qt))
      // empty `tables` = DISCOVER them from the window itself (r17
      // verdict #5; the TABLE_MAP/TRUNCATE header scan), restricted to
      // tables that exist locally — the read-your-writes drain has no
      // caller-supplied list. The checkpoint advance below is
      // window-wide either way, matching the documented contract:
      // callers name every replicated table (or name none and let the
      // window name them).
      val targets0 =
        if (tables.nonEmpty) tables
        else graft.streaming.BinlogEventDecoder
          .windowTables(frames, "payload", crc32Checksum)
          .filter { qt =>
            qt.split('.') match {
              case Array(db, t) => listTables(db).contains(t)
              case _ => false
            }
          }
      val targets = targets0.filter(admitted)
      if (targets.nonEmpty) {
        val specsByTable = targets.map(qt => qt ->
          graft.streaming.BinlogRowDecoder.specsFor(table(qt).schema))
        // decode types follow the wire specs; the table may declare a
        // wider/different Spark type (BOOL rides TINYINT) — cast data
        // columns back to the declared schema before the merge. TIME
        // is the one non-cast conversion: Time2 decodes to
        // MICROSECONDS, while Spark's numeric↔interval casts speak
        // SECONDS (q120's oracle pins that), so divide first — exact,
        // since |µs| ≤ 838h·3.6e9 ≈ 3e15 < 2^53
        def aligned(df: org.apache.spark.sql.DataFrame, qt: String,
            refSql: String => String,
            decType: String => org.apache.spark.sql.types.DataType)
            : org.apache.spark.sql.DataFrame =
          df.select(
            table(qt).schema.fields.map { f =>
              (f.dataType, decType(f.name)) match {
                case (it: org.apache.spark.sql.types.DayTimeIntervalType,
                    org.apache.spark.sql.types.LongType) =>
                  org.apache.spark.sql.functions.expr(
                    s"make_dt_interval(0, 0, 0, " +
                      s"CAST(${refSql(f.name)} / 1000000.0 " +
                      s"AS DECIMAL(20,6)))")
                    .cast(it).as(f.name)
                case _ => org.apache.spark.sql.functions
                  .expr(refSql(f.name)).cast(f.dataType).as(f.name)
              }
            }.toSeq ++
              graft.streaming.CdcMerge.metaCols.map(col): _*)
        if (targets.size == 1) {
          // single-table window: decode straight into the apply — the
          // tagged pass below would pay a persist + count
          // materialization job this window doesn't need
          val qt = targets.head
          val decoded = graft.streaming.BinlogEventDecoder
            .decodeSlotStreams(frames, "slot", "off", "payload", qt,
              specsByTable.head._2, crc32Checksum)
          graft.streaming.CdcMerge.applyBatch(table(qt),
            aligned(decoded, qt, n => s"`$n`",
              n => decoded.schema(n).dataType), Some(to - from))
        } else {
          // ONE tagged decode pass for the whole window (r17 verdict
          // #5): the per-table loop used to re-parse every event's
          // bytes once per replicated table
          val decoded = graft.streaming.BinlogEventDecoder
            .decodeSlotStreamsMulti(frames, "slot", "off", "payload",
              specsByTable, crc32Checksum)
            .persist()
          try {
            decoded.count() // materialize the pass before the splits
            targets.zipWithIndex.foreach { case (qt, i) =>
              val st = decoded.schema(s"__t_$i").dataType
                .asInstanceOf[org.apache.spark.sql.types.StructType]
              val slice = decoded.filter(col("relation") === qt)
              graft.streaming.CdcMerge.applyBatch(table(qt),
                aligned(slice, qt, n => s"`__t_$i`.`$n`",
                  n => st(n).dataType), Some(to - from))
            }
          } finally decoded.unpersist()
        }
      }
      // advance AGAINST THE CURRENT config, touching only the apply
      // key — a concurrent CHANGE/STOP must not be reverted
      synchronized {
        writeReplicaConfig(replicaConfig + ("apply.bytepos" -> to.toString))
      }
      n
    } finally frames.unpersist()
  }

  // ------------------------------------------------------------------

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toSeq.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}

object Engine {
  /** table dir → (manifest version, attached-children names). A
    * manifest version pins its props, so the children LIST is cacheable
    * by the same key the ownership check already computes — the cached
    * non-partitioned path stays zero-manifest-read. ONE live entry per
    * table: a newer version REPLACES the old (mirrors viewOwners'
    * rebind semantics), so a long CDC session's many commits never grow
    * the map; drop evicts, so a recreated dir never reads a stale
    * children list. */
  private[graft] val partCache =
    new java.util.concurrent.ConcurrentHashMap[Path, (Long, Seq[String])]()

  /** SHOW REPLICA STATUS column order — shared by the populated row
    * ([[Engine.replicaStatus]]) and the never-configured EMPTY SET,
    * which must still carry the full column list (MySQL does; tools
    * index columns before checking row count). */
  private[graft] val replicaStatusCols: Seq[String] = Seq(
    "Channel_Name", "Source_Host", "Source_Port", "Source_User",
    "Connect_Retry", "Auto_Position", "Replica_IO_Running",
    "Replica_SQL_Running", "Replicate_Do_Table", "Replicate_Ignore_Table",
    "Executed_Gtid_Set", "Last_IO_Error")
}
