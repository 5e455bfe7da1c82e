package graft.queries

import java.nio.file.Files
import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.storage.GraftTable
import graft.streaming.CdcMerge

/** CDC semantics exercised through the *real* storage engine and
  * declared to the oracle declaratively: the driver's events table is
  * interpreted as a change stream (event_id = log position, the LSN/
  * GTID analog; event_type → action), run through condense + merge into
  * a copy-on-write [[GraftTable]], and the resulting final state is
  * compared against a DuckDB window/arg_max formulation of the same
  * last-writer-wins semantics (reference C6/C7,
  * `/root/reference/delta/controller.go:137-697`).
  */
object CdcQueries {

  /** Per-scale-factor /tmp path for the q106/q109 byte-level fixtures
    * (r14 ADVICE: the fixed path raced when two harnesses ran the same
    * query at DIFFERENT scale factors — last writer won and the other's
    * oracle read foreign bytes). The fn side derives the tag from its
    * `dir` argument; the ORACLE side is a static string frozen at class
    * init, so Verify/Bench set `graft.sf.dir` FIRST thing in main() and
    * the two spellings agree within any one harness run. Same-sf
    * concurrent runs still share a path — inherent, the oracle SQL must
    * name one file. */
  private[queries] def sfScopedPath(stem: String, dir: String): String =
    s"/tmp/${stem}_${dir.replaceAll("[^A-Za-z0-9.]", "_")}.tsv"
  private val oracleSfDir =
    sys.props.getOrElse("graft.sf.dir", "/root/testdata/sf0.01")

  /** Per-statement wall-time instrumentation for the DML chains (r15
    * verdict #3: the driver's q108 cold time regressed 3.9× in an
    * epoch the builder cannot reproduce — attribute, don't assume).
    * Wraps a chain's `run`, accumulates (ms, statement-head) pairs,
    * and emits ONE compact stderr line so any harness log self-
    * attributes which statement family carried the time. Costs two
    * nanoTime calls per statement. */
  private[queries] final class StmtTimer(tag: String) {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    def apply[A](q: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      val ms = (System.nanoTime() - t0) / 1000000
      buf += s"${q.replaceAll("\\s+", " ").take(24).trim}=${ms}"
      r
    }
    def report(): Unit = {
      System.err.println(s"[$tag-stmts] ${buf.mkString(" ")}")
      StmtTimer.last.put(tag, buf.mkString(" "))
    }
  }

  /** The most recent per-statement line per chain, for the BENCH
    * artifact (r16 verdict #2: StmtTimer's stderr lines sit outside
    * the driver's 2000-char stdout tail, so a chain's drift was
    * unattributable from the artifact alone — Bench re-emits the
    * outlier chains' lines inside the tail budget). */
  object StmtTimer {
    val last = new java.util.concurrent.ConcurrentHashMap[String, String]()
  }

  // event_type → action (FIXTURES.md §4: 0=delete, 1=update, 2=insert)
  private val actionSpark =
    when(col("event_type") === "error", 0)
      .when(col("event_type") === "signup", 2).otherwise(1)
  private val actionDuck =
    "CASE WHEN event_type = 'error' THEN 0 WHEN event_type = 'signup' THEN 2 ELSE 1 END"

  // --------------------------------------------------------------------
  // q40 — condense: per user, the last change by log position. Runs the
  // engine's actual CdcMerge.condense (max_by partial-agg plan).
  private val q40 = QueryDef(
    "q40_cdc_condense",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("value"), col("event_id"),
          actionSpark.as("action"),
          lit("g").as("txn_group"), col("event_id").as("txn_seq"),
          lit(0L).as("txn_stmt"))
      CdcMerge.condense(ev, Seq("user_id"))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("action").as("last_action"), col("value").as("last_value"))
        .orderBy(col("user_id"))
    },
    Some(s"""SELECT user_id, arg_max(event_id, event_id) AS last_event_id,
      arg_max($actionDuck, event_id) AS last_action,
      arg_max(value, event_id) AS last_value
      FROM events GROUP BY user_id ORDER BY user_id"""))

  // --------------------------------------------------------------------
  // q41 — full CDC apply through the storage engine: seed a table with
  // one row per even user, stream the events through condense + merge,
  // return the table's final state. The oracle states the equivalent
  // last-writer-wins semantics declaratively.
  private val q41 = QueryDef(
    "q41_cdc_apply",
    (s, dir) => {
      val schema = StructType(Seq(
        StructField("user_id", LongType), StructField("value", DoubleType)))
      val ev = Tables.load(s, dir, "events")
      val warehouse = Files.createTempDirectory("graft_cdc_apply")
      val t = GraftTable.create(s, warehouse.resolve("t"), schema, Seq("user_id"))
      val initial = ev.select(col("user_id")).distinct()
        .filter(col("user_id") % 2 === 0)
        .withColumn("value", lit(-1.0))
      t.insert(initial)
      val batch = ev.select(col("user_id"), col("value"),
        actionSpark.as("action"),
        lit("g").as("txn_group"), col("event_id").as("txn_seq"),
        lit(0L).as("txn_stmt"))
      CdcMerge.applyBatch(t, batch)
      t.read().orderBy(col("user_id"))
    },
    // Every seeded user also appears in the stream, so the final state
    // is exactly: last event wins, deletes remove the row (seeded or
    // streamed-in), upserts/updates materialize it.
    Some(s"""WITH last AS (
        SELECT user_id, arg_max(value, event_id) AS value,
          arg_max($actionDuck, event_id) AS action
        FROM events GROUP BY user_id)
      SELECT user_id, value FROM last WHERE action <> 0
      ORDER BY user_id"""))

  // --------------------------------------------------------------------
  // q42 — event-time tumbling-window aggregation (the Structured
  // Streaming window surface run in batch mode; the streaming variant
  // with watermark is asserted equal in StreamingWindowSpec). Output
  // window starts as NTZ so both engines emit naive UTC timestamps.
  private val q42 = QueryDef(
    "q42_windowed_counts",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(timestamp_micros(expr("ts div 1000")).as("tsm"),
          col("event_type"), col("value"))
      ev.groupBy(window(col("tsm"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(28, 4)))
            .cast("double").as("total"))
        .select(col("window.start").cast("timestamp_ntz").as("w_start"),
          col("event_type"), col("n"), col("total"))
        .orderBy(col("w_start"), col("event_type"))
    },
    Some("""SELECT date_trunc('hour', make_timestamp(epoch_us(ts))) AS w_start,
      event_type, count(*) AS n,
      CAST(sum(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2 ORDER BY w_start, event_type"""))

  // --------------------------------------------------------------------
  // q43 — sessionization: split each user's event stream at >30-minute
  // gaps (lag + cumulative boundary sum — one shuffle on user_id, two
  // ordered window passes, no self-join). Timestamps as µs longs to
  // match DuckDB's ns→µs parquet coercion.
  private val q43 = QueryDef(
    "q43_sessionize",
    (s, dir) => {
      val gapUs = 30L * 60 * 1000000
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), expr("ts div 1000").as("tsu"), col("event_id"))
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("tsu"), col("event_id"))
      ev.withColumn("prev", lag(col("tsu"), 1).over(wOrd))
        .withColumn("boundary",
          when(col("prev").isNull || col("tsu") - col("prev") > gapUs, 1).otherwise(0))
        .withColumn("session_id", sum(col("boundary")).over(
          wOrd.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("tsu")).as("session_start"), max(col("tsu")).as("session_end"))
        .orderBy(col("user_id"), col("session_id"))
    },
    Some("""WITH ev AS (SELECT user_id, epoch_us(ts) AS tsu, event_id FROM events),
      flagged AS (SELECT *,
          CASE WHEN lag(tsu) OVER w IS NULL
            OR tsu - lag(tsu) OVER w > 1800000000 THEN 1 ELSE 0 END AS boundary
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
      sess AS (SELECT *, CAST(sum(boundary) OVER (PARTITION BY user_id
          ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flagged)
      SELECT user_id, session_id, count(*) AS n_events,
        min(tsu) AS session_start, max(tsu) AS session_end
      FROM sess GROUP BY user_id, session_id
      ORDER BY user_id, session_id"""))

  // --------------------------------------------------------------------
  // q81 — MySQL DML edge statements routed as SQL through the real
  // engine (reference /root/reference/backend/executor.go:84-116,
  // main_test.go:840-869): seed, REPLACE INTO ... SELECT, INSERT IGNORE,
  // INSERT ... ON DUPLICATE KEY UPDATE, then read the final state. The
  // oracle states each step's set semantics declaratively.
  private val q81 = QueryDef(
    "q81_replace_upsert",
    (s, dir) => {
      import graft.{Engine, SqlRouter}
      val e = new Engine(s, Files.createTempDirectory("graft_q81"))
      e.bindTables(dir, "customer")
      def run(q: String): Unit = SqlRouter.execute(e, q)
      run("CREATE TABLE t (id BIGINT PRIMARY KEY, v STRING, hits INT)")
      // the upsert chain runs inside ONE transaction: each statement
      // reads the previous one's staged manifest and the journal sees
      // a single atomic publish — the batched-apply shape a real CDC
      // writer uses (and exercises txn read-your-writes under oracle)
      run("BEGIN")
      run("INSERT INTO t SELECT c_custkey, c_name, 0 FROM customer WHERE c_custkey <= 600")
      run("REPLACE INTO t SELECT c_custkey, upper(c_name), 1 FROM customer WHERE c_custkey BETWEEN 301 AND 900")
      run("INSERT IGNORE INTO t SELECT c_custkey, 'ignored', 9 FROM customer WHERE c_custkey BETWEEN 500 AND 1000")
      run("INSERT INTO t SELECT c_custkey, c_name, 5 FROM customer WHERE c_custkey BETWEEN 880 AND 920 " +
        "ON DUPLICATE KEY UPDATE hits = hits + VALUES(hits)")
      run("COMMIT")
      SqlRouter.execute(e, "SELECT id, v, hits FROM t ORDER BY id").df.get
    },
    Some("""WITH seed AS (SELECT c_custkey AS id, c_name AS v, 0 AS hits
        FROM customer WHERE c_custkey <= 600),
      rep AS (SELECT c_custkey AS id, upper(c_name) AS v, 1 AS hits
        FROM customer WHERE c_custkey BETWEEN 301 AND 900),
      ign AS (SELECT c_custkey AS id, 'ignored' AS v, 9 AS hits
        FROM customer WHERE c_custkey BETWEEN 500 AND 1000),
      odku AS (SELECT c_custkey AS id, c_name AS v, 5 AS hits
        FROM customer WHERE c_custkey BETWEEN 880 AND 920),
      s2 AS (SELECT * FROM rep UNION ALL
        SELECT * FROM seed WHERE id NOT IN (SELECT id FROM rep)),
      s3 AS (SELECT * FROM s2 UNION ALL
        SELECT * FROM ign WHERE id NOT IN (SELECT id FROM s2)),
      s4 AS (SELECT s3.id, s3.v, s3.hits + coalesce(o.hits, 0) AS hits
          FROM s3 LEFT JOIN odku o ON s3.id = o.id
        UNION ALL
        SELECT o.id, o.v, o.hits FROM odku o
          WHERE o.id NOT IN (SELECT id FROM s3))
      SELECT id, v, CAST(hits AS INT) AS hits FROM s4 ORDER BY id"""))

  // --------------------------------------------------------------------
  // q102 — multi-table DML routed as SQL through the real engine
  // (reference GMS surface `/root/reference/main_test.go:948`
  // TestUpdate / enginetest delete-joins): PG UPDATE ... FROM, the
  // MySQL join-UPDATE spelling, tuple-SET, and DELETE ... USING, each
  // applying through the CoW merge path, then the final state read
  // back. The oracle states every step declaratively (left-join CASE
  // for the guarded updates, NOT EXISTS for the join delete). All
  // arithmetic is single IEEE ops over the parquet doubles — bit-exact
  // across engines.
  private val q102 = QueryDef(
    "q102_join_dml",
    (s, dir) => {
      import graft.{Engine, SqlRouter}
      val e = new Engine(s, Files.createTempDirectory("graft_q102"))
      e.bindTables(dir, "customer")
      val tm = new StmtTimer("q102")
      def run(q: String): Unit = tm(q)(SqlRouter.execute(e, q))
      run("CREATE TABLE t (id BIGINT PRIMARY KEY, v STRING, bal DOUBLE)")
      run("CREATE TABLE adj (id BIGINT PRIMARY KEY, delta DOUBLE)")
      run("INSERT INTO t SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey <= 500")
      run("INSERT INTO adj SELECT c_custkey, CAST(c_nationkey AS DOUBLE) " +
        "FROM customer WHERE c_custkey BETWEEN 200 AND 700")
      // PG spelling: join update via FROM
      run("UPDATE t SET bal = bal + a.delta FROM adj a WHERE t.id = a.id AND a.delta > 10")
      // MySQL spelling: explicit JOIN, target from the SET qualifier
      run("UPDATE t JOIN adj ON t.id = adj.id SET t.v = upper(t.v) WHERE adj.delta <= 10")
      // tuple-SET, positional expansion
      run("UPDATE t SET (v, bal) = (concat(v, '!'), bal * 2) WHERE id <= 100")
      // join delete
      run("DELETE FROM t USING adj WHERE t.id = adj.id AND adj.delta > 20")
      tm.report()
      SqlRouter.execute(e, "SELECT id, v, bal FROM t ORDER BY id").df.get
    },
    Some("""WITH seed AS (SELECT c_custkey AS id, c_name AS v, c_acctbal AS bal
        FROM customer WHERE c_custkey <= 500),
      adj AS (SELECT c_custkey AS id, CAST(c_nationkey AS DOUBLE) AS delta
        FROM customer WHERE c_custkey BETWEEN 200 AND 700),
      s1 AS (SELECT s.id, s.v,
          CASE WHEN a.id IS NOT NULL AND a.delta > 10
            THEN s.bal + a.delta ELSE s.bal END AS bal
        FROM seed s LEFT JOIN adj a ON s.id = a.id),
      s2 AS (SELECT s.id,
          CASE WHEN a.id IS NOT NULL AND a.delta <= 10
            THEN upper(s.v) ELSE s.v END AS v, s.bal
        FROM s1 s LEFT JOIN adj a ON s.id = a.id),
      s3 AS (SELECT id,
          CASE WHEN id <= 100 THEN concat(v, '!') ELSE v END AS v,
          CASE WHEN id <= 100 THEN bal * 2 ELSE bal END AS bal
        FROM s2),
      s4 AS (SELECT * FROM s3 s WHERE NOT EXISTS
          (SELECT 1 FROM adj a WHERE a.id = s.id AND a.delta > 20))
      SELECT id, v, bal FROM s4 ORDER BY id"""))

  // --------------------------------------------------------------------
  // q103 — the session-DML lifecycle under the oracle gate: autocommit
  // implicit transactions, rollback, savepoints (round-9 staged-map
  // snapshots), and MySQL's batched ORDER BY/LIMIT DML, all routed as
  // SQL through the real engine. The statements exercise the txn
  // machinery; the oracle states only the SURVIVING rows declaratively
  // (custkeys are contiguous FROM 0, so id<=400 is 401 rows, "the 10
  // smallest" is id<=9, and "delete the 50 largest" keeps id<=350).
  // bal+1 is one IEEE op — bit-exact both sides.
  private val q103 = QueryDef(
    "q103_session_dml",
    (s, dir) => {
      import graft.{Engine, SqlRouter}
      val e = new Engine(s, Files.createTempDirectory("graft_q103"))
      e.bindTables(dir, "customer")
      val tm = new StmtTimer("q103")
      def run(q: String): Unit = tm(q)(SqlRouter.execute(e, q))
      run("CREATE TABLE t (id BIGINT PRIMARY KEY, v STRING, bal DOUBLE)")
      run("INSERT INTO t SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey <= 400")
      run("SET autocommit = 0") // implicit txn opens
      run("DELETE FROM t WHERE id > 300") // staged...
      run("ROLLBACK") // ...discarded; a fresh implicit txn opens
      run("UPDATE t SET bal = bal + 1 WHERE id <= 100")
      run("SAVEPOINT s1")
      run("UPDATE t SET bal = 0 WHERE id <= 50") // staged past s1...
      run("ROLLBACK TO SAVEPOINT s1") // ...undone, bal+1 survives
      run("UPDATE t SET v = upper(v) ORDER BY id LIMIT 10")
      run("DELETE FROM t ORDER BY id DESC LIMIT 50")
      run("COMMIT")
      run("SET autocommit = 1")
      tm.report()
      SqlRouter.execute(e, "SELECT id, v, bal FROM t ORDER BY id").df.get
    },
    Some("""SELECT c_custkey AS id,
        CASE WHEN c_custkey <= 9 THEN upper(c_name) ELSE c_name END AS v,
        CASE WHEN c_custkey <= 100 THEN c_acctbal + 1 ELSE c_acctbal END AS bal
      FROM customer WHERE c_custkey <= 350 ORDER BY id"""))

  // --------------------------------------------------------------------
  // q104 — the DDL lifecycle under the oracle gate (round-9 verdict
  // #5): CREATE with auto-inc, explicit-id seeding (which must advance
  // the counter, A23 MySQL semantics), auto-assigned rows surviving a
  // delete (no id reuse), ALTER ADD with backfill default, ALTER ADD
  // GENERATED (lazy per-row backfill + recompute on UPDATE), MODIFY,
  // RENAME COLUMN and RENAME TABLE — all routed as SQL, with the
  // oracle stating only the final state. score arithmetic is single
  // IEEE ops over small literals — bit-exact across engines.
  private val q104 = QueryDef(
    "q104_ddl_lifecycle",
    (s, dir) => {
      import graft.{Engine, SqlRouter}
      val e = new Engine(s, Files.createTempDirectory("graft_q104"))
      e.bindTables(dir, "customer")
      val tm = new StmtTimer("q104")
      def run(q: String): Unit = tm(q)(SqlRouter.execute(e, q))
      run("CREATE TABLE d (id BIGINT NOT NULL AUTO_INCREMENT, label STRING, " +
        "score DOUBLE, PRIMARY KEY (id))")
      // explicit ids advance the counter to max(id)+1
      run("INSERT INTO d SELECT c_custkey + 1, c_name, c_acctbal " +
        "FROM customer WHERE c_custkey <= 150")
      run("INSERT INTO d (label, score) VALUES ('auto_a', 0.5)") // id 152
      run("DELETE FROM d WHERE label = 'auto_a'")
      run("INSERT INTO d (label, score) VALUES ('auto_b', 0.25)") // id 153, not 152
      run("ALTER TABLE d ADD COLUMN bonus DOUBLE DEFAULT 2.0 NOT NULL")
      run("ALTER TABLE d ADD COLUMN total DOUBLE GENERATED ALWAYS AS " +
        "(score + bonus) STORED")
      run("UPDATE d SET bonus = 5.0 WHERE id <= 50") // generated recomputes
      run("ALTER TABLE d MODIFY COLUMN label VARCHAR(100)")
      run("ALTER TABLE d RENAME COLUMN bonus TO extra")
      run("ALTER TABLE d RENAME TO d2")
      tm.report()
      SqlRouter.execute(e,
        "SELECT id, label, score, extra, total FROM d2 ORDER BY id").df.get
    },
    Some("""WITH seed AS (
        SELECT CAST(c_custkey + 1 AS BIGINT) AS id, c_name AS label,
          c_acctbal AS score
        FROM customer WHERE c_custkey <= 150
        UNION ALL SELECT 153, 'auto_b', 0.25),
      widened AS (SELECT id, label, score,
          CASE WHEN id <= 50 THEN 5.0 ELSE 2.0 END AS extra
        FROM seed)
      SELECT id, label, score, extra, score + extra AS total
      FROM widened ORDER BY id"""))

  // --------------------------------------------------------------------
  // q105 — unique-index ON CONFLICT arbiters under the oracle gate
  // (round-9 verdict #2, reference `catalog/table.go:555-638`): the
  // UNIQUE KEY records at CREATE, a DO UPDATE batch keyed on the
  // unique column accumulates into existing rows (which keep their
  // PRIMARY KEYS) while inserting the rest, and a DO NOTHING batch
  // addressed via ON CONSTRAINT <name> inserts only novel keys. The
  // oracle restates each batch declaratively. hits are integer sums.
  private val q105 = QueryDef(
    "q105_unique_arbiter",
    (s, dir) => {
      import graft.{Engine, SqlRouter}
      val e = new Engine(s, Files.createTempDirectory("graft_q105"))
      e.bindTables(dir, "customer")
      val tm = new StmtTimer("q105")
      def run(q: String): Unit = tm(q)(SqlRouter.execute(e, q))
      run("CREATE TABLE t (id BIGINT PRIMARY KEY, email STRING, hits INT, " +
        "UNIQUE KEY uq_email (email))")
      run("INSERT INTO t SELECT c_custkey, concat('e', CAST(c_custkey AS STRING)), 1 " +
        "FROM customer WHERE c_custkey <= 300")
      run("INSERT INTO t SELECT c_custkey + 10000, concat('e', CAST(c_custkey AS STRING)), 5 " +
        "FROM customer WHERE c_custkey BETWEEN 200 AND 400 " +
        "ON CONFLICT (email) DO UPDATE SET hits = hits + excluded.hits")
      run("INSERT INTO t SELECT c_custkey + 20000, concat('e', CAST(c_custkey AS STRING)), 9 " +
        "FROM customer WHERE c_custkey BETWEEN 350 AND 450 " +
        "ON CONFLICT ON CONSTRAINT uq_email DO NOTHING")
      // round-11: an EXPRESSION arbiter (PG expression-index surface,
      // `catalog/table.go:555-638`): mixed-case emails collide only
      // through lower(email) — existing rows accumulate, the rest
      // insert with their original casing
      run("CREATE UNIQUE INDEX uq_lower ON t (lower(email))")
      run("INSERT INTO t SELECT c_custkey + 30000, concat('E', CAST(c_custkey AS STRING)), 3 " +
        "FROM customer WHERE c_custkey BETWEEN 400 AND 500 " +
        "ON CONFLICT (lower(email)) DO UPDATE SET hits = hits + excluded.hits")
      tm.report()
      SqlRouter.execute(e,
        "SELECT id, email, hits FROM t ORDER BY id").df.get
    },
    Some("""WITH seed AS (
        SELECT CAST(c_custkey AS BIGINT) AS id,
          concat('e', CAST(c_custkey AS VARCHAR)) AS email, 1 AS hits
        FROM customer WHERE c_custkey <= 300),
      up AS (SELECT CAST(c_custkey + 10000 AS BIGINT) AS id,
          concat('e', CAST(c_custkey AS VARCHAR)) AS email, 5 AS hits
        FROM customer WHERE c_custkey BETWEEN 200 AND 400),
      s1 AS (SELECT s.id, s.email, s.hits + coalesce(u.hits, 0) AS hits
          FROM seed s LEFT JOIN up u ON s.email = u.email
        UNION ALL
        SELECT u.id, u.email, u.hits FROM up u
          WHERE u.email NOT IN (SELECT email FROM seed)),
      ign AS (SELECT CAST(c_custkey + 20000 AS BIGINT) AS id,
          concat('e', CAST(c_custkey AS VARCHAR)) AS email, 9 AS hits
        FROM customer WHERE c_custkey BETWEEN 350 AND 450),
      s2 AS (SELECT * FROM s1
        UNION ALL
        SELECT i.id, i.email, i.hits FROM ign i
          WHERE i.email NOT IN (SELECT email FROM s1)),
      up3 AS (SELECT CAST(c_custkey + 30000 AS BIGINT) AS id,
          concat('E', CAST(c_custkey AS VARCHAR)) AS email, 3 AS hits
        FROM customer WHERE c_custkey BETWEEN 400 AND 500),
      s3 AS (SELECT s.id, s.email, s.hits + coalesce(u.hits, 0) AS hits
          FROM s2 s LEFT JOIN up3 u ON lower(u.email) = lower(s.email)
        UNION ALL
        SELECT u.id, u.email, u.hits FROM up3 u
          WHERE lower(u.email) NOT IN (SELECT lower(email) FROM s2))
      SELECT id, email, CAST(hits AS INT) AS hits FROM s3 ORDER BY id"""))

  // --------------------------------------------------------------------
  // q106 — OUTFILE dialect compatibility proven by a FOREIGN reader:
  // the engine exports with MySQL FIELDS ESCAPED BY encoding and loads
  // it back through its own LOAD DATA (the round-trip the Spark side
  // returns); the ORACLE reads the very same file with DuckDB's
  // read_csv using the reference's exact option mapping
  // (`backend/loaddata.go:160-190`: sep='\t', quote='', escape='',
  // nullstr='\N') — so the hash gate fails unless the bytes on disk
  // parse identically in an independent engine. Content is the plain
  // corpus (names carry no tabs/newlines; the gnarly escape cases are
  // byte-asserted in SqlRouterSpec — DuckDB, like the reference,
  // cannot decode the `\` escapes read_csv-side).
  private val q106 = QueryDef(
    "q106_outfile_duckdb",
    (s, dir) => {
      import graft.{Engine, SqlRouter}
      val e = new Engine(s, Files.createTempDirectory("graft_q106"))
      e.bindTables(dir, "customer")
      def run(q: String): Unit = SqlRouter.execute(e, q)
      run("CREATE TABLE src (id BIGINT PRIMARY KEY, name STRING, bal DOUBLE)")
      run("INSERT INTO src SELECT c_custkey, c_name, c_acctbal FROM customer " +
        "WHERE c_custkey <= 250")
      run("UPDATE src SET name = NULL WHERE id % 50 = 0") // \N spellings
      // per-sf path (r14 ADVICE): concurrent harnesses at different
      // scale factors no longer collide; see sfScopedPath.
      val f = sfScopedPath("graft_q106_outfile", dir)
      new java.io.File(f).delete() // OUTFILE refuses overwrite (1086)
      run(s"SELECT id, name, bal FROM src ORDER BY id INTO OUTFILE '$f'")
      run("CREATE TABLE back (id BIGINT PRIMARY KEY, name STRING, bal DOUBLE)")
      run(s"LOAD DATA INFILE '$f' INTO TABLE back")
      SqlRouter.execute(e, "SELECT id, name, bal FROM back ORDER BY id").df.get
    },
    Some(raw"""SELECT id, name, bal
      FROM read_csv('${sfScopedPath("graft_q106_outfile", oracleSfDir)}',
        auto_detect = false,
        header = false, sep = '\t', quote = '', escape = '',
        nullstr = '\N',
        columns = {'id': 'BIGINT', 'name': 'VARCHAR', 'bal': 'DOUBLE'})
      ORDER BY id"""))

  // --------------------------------------------------------------------
  // q107 — round-10's surfaces composed under the hash gate: a user
  // enum type, a table carrying the FULL constraint surface (auto-inc,
  // default, unique key, named CHECK, enum column), SHOW CREATE TABLE
  // replayed THROUGH the router as a second table (the behavior
  // round-trip), and an ON CONFLICT upsert arbitrated by the
  // REPLAYED unique index. The oracle restates the final state
  // declaratively; bal + 99.0 is one IEEE add — bit-exact both sides.
  private val q107 = QueryDef(
    "q107_showcreate_roundtrip",
    (s, dir) => {
      import graft.{Engine, SqlRouter}
      val e = new Engine(s, Files.createTempDirectory("graft_q107"))
      e.bindTables(dir, "customer")
      val tm = new StmtTimer("q107")
      def run(q: String): Unit = tm(q)(SqlRouter.execute(e, q))
      run("CREATE TYPE tier AS ENUM ('basic', 'gold')")
      run("CREATE TABLE acct (id BIGINT NOT NULL AUTO_INCREMENT, " +
        "name STRING, t tier, bal DOUBLE DEFAULT 0.5, PRIMARY KEY (id), " +
        "UNIQUE KEY uq_name (name), CONSTRAINT nonneg CHECK (bal >= -100000))")
      run("INSERT INTO acct SELECT c_custkey + 1, c_name, " +
        "CASE WHEN c_custkey % 3 = 0 THEN 'gold' ELSE 'basic' END, c_acctbal " +
        "FROM customer WHERE c_custkey <= 200")
      val ddl = SqlRouter.execute(e, "SHOW CREATE TABLE acct")
        .df.get.collect()(0).getString(1)
      run(ddl.replace("CREATE TABLE acct", "CREATE TABLE acct2"))
      run("INSERT INTO acct2 SELECT id, name, t, bal FROM acct")
      // the upsert keys on the unique index the SHOW CREATE replay
      // carried over — names 150..200 accumulate, 201..250 insert
      run("INSERT INTO acct2 SELECT c_custkey + 10000, c_name, 'gold', 99.0 " +
        "FROM customer WHERE c_custkey BETWEEN 150 AND 250 " +
        "ON CONFLICT (name) DO UPDATE SET bal = bal + excluded.bal")
      run("INSERT INTO acct2 VALUES (20000, 'zzz_new', 'basic', 0.5)")
      tm.report()
      SqlRouter.execute(e,
        "SELECT id, name, t, bal FROM acct2 ORDER BY id").df.get
    },
    Some("""WITH seed AS (
        SELECT CAST(c_custkey + 1 AS BIGINT) AS id, c_name AS name,
          CASE WHEN c_custkey % 3 = 0 THEN 'gold' ELSE 'basic' END AS t,
          c_acctbal AS bal
        FROM customer WHERE c_custkey <= 200),
      up AS (SELECT CAST(c_custkey + 10000 AS BIGINT) AS id,
          c_name AS name, 'gold' AS t, 99.0 AS bal
        FROM customer WHERE c_custkey BETWEEN 150 AND 250),
      s1 AS (SELECT s.id, s.name, s.t,
          CASE WHEN u.name IS NOT NULL THEN s.bal + 99.0 ELSE s.bal END AS bal
        FROM seed s LEFT JOIN up u ON s.name = u.name
        UNION ALL
        SELECT u.id, u.name, u.t, u.bal FROM up u
          WHERE u.name NOT IN (SELECT name FROM seed)),
      fin AS (SELECT * FROM s1
        UNION ALL SELECT 20000, 'zzz_new', 'basic', 0.5)
      SELECT id, name, t, bal FROM fin ORDER BY id"""))

  // --------------------------------------------------------------------
  // q108 — MySQL counter semantics THROUGH the merge machinery (round-10
  // verdict #1, reference `catalog/table.go:785-949`): explicit ids
  // written by REPLACE, the ON DUPLICATE KEY insert arm, and INSERT
  // IGNORE must all advance the auto-inc counter past max(id), so the
  // next bare INSERT takes counter+explicit-max, never a stale low id.
  // Each auto-assigned probe row's id is therefore fully determined by
  // the preceding explicit id — the hash gate fails if ANY of the three
  // merge-family paths leaves the counter stale. Seed rows use explicit
  // ids (deterministic name↔id mapping); every later insert is one row.
  private val q108 = QueryDef(
    "q108_autoinc_merge",
    (s, dir) => {
      import graft.{Engine, SqlRouter}
      val e = new Engine(s, Files.createTempDirectory("graft_q108"))
      e.bindTables(dir, "customer")
      val tm = new StmtTimer("q108")
      def run(q: String): Unit = tm(q)(SqlRouter.execute(e, q))
      run("CREATE TABLE t (id BIGINT NOT NULL AUTO_INCREMENT, v STRING, " +
        "n INT, PRIMARY KEY (id))")
      run("INSERT INTO t SELECT c_custkey, c_name, 1 FROM customer " +
        "WHERE c_custkey <= 100") // explicit seed: counter -> 101
      run("INSERT INTO t (v, n) VALUES ('auto_a', 1)") // id 101
      run("REPLACE INTO t VALUES (50, 'rep50', 9)")    // replaces id 50
      run("REPLACE INTO t VALUES (500, 'rep', 2)")     // counter -> 501
      run("INSERT INTO t (v, n) VALUES ('auto_b', 3)") // id 501, not 102
      run("INSERT INTO t VALUES (800, 'odku', 4) " +
        "ON DUPLICATE KEY UPDATE n = n + 1")           // counter -> 801
      run("INSERT INTO t (v, n) VALUES ('auto_c', 5)") // id 801
      run("INSERT IGNORE INTO t VALUES (900, 'ign', 6)") // counter -> 901
      run("INSERT INTO t (v, n) VALUES ('auto_d', 7)") // id 901
      tm.report()
      SqlRouter.execute(e, "SELECT id, v, n FROM t ORDER BY id").df.get
    },
    Some("""WITH seed AS (
        SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS v, 1 AS n
        FROM customer WHERE c_custkey <= 100 AND c_custkey <> 50),
      fin AS (SELECT * FROM seed
        UNION ALL SELECT 50, 'rep50', 9
        UNION ALL SELECT 101, 'auto_a', 1
        UNION ALL SELECT 500, 'rep', 2
        UNION ALL SELECT 501, 'auto_b', 3
        UNION ALL SELECT 800, 'odku', 4
        UNION ALL SELECT 801, 'auto_c', 5
        UNION ALL SELECT 900, 'ign', 6
        UNION ALL SELECT 901, 'auto_d', 7)
      SELECT id, v, CAST(n AS INT) AS n FROM fin ORDER BY id"""))

  // --------------------------------------------------------------------
  // q109 — LOAD DATA LINES surface proven by a FOREIGN reader (the
  // q106 pattern): a fixture file with \r\n terminators and a LINES
  // STARTING BY prefix — junk before the prefix drops, prefix-less
  // lines skip entirely (MySQL manual semantics; the reference's
  // DuckDB builder degrades multi-char terminators and drops the
  // prefix — `backend/loaddata.go:162-167`). The engine loads it via
  // LOAD DATA; the ORACLE reads the very same bytes with DuckDB's
  // read_csv (new_line='\r\n') restating the prefix rule with
  // strpos/substr — so the hash gate fails unless both engines parse
  // the bytes identically.
  private val q109 = QueryDef(
    "q109_loaddata_lines",
    (s, dir) => {
      import graft.{Engine, SqlRouter}
      val e = new Engine(s, Files.createTempDirectory("graft_q109"))
      def run(q: String): Unit = SqlRouter.execute(e, q)
      // per-sf path like q106: the bytes are sf-independent, but a
      // concurrent writeString on one shared path could expose a
      // truncated file to the other harness's reader
      val f = sfScopedPath("graft_q109_lines", dir)
      val body = new StringBuilder
      (1 to 200).foreach { i =>
        if (i % 10 == 0) body.append("line without the marker\r\n")
        else body.append(s"junk$i>>$i\tname_$i\r\n")
      }
      java.nio.file.Files.writeString(java.nio.file.Paths.get(f),
        body.toString)
      run("CREATE TABLE t (id BIGINT PRIMARY KEY, name STRING)")
      run(s"LOAD DATA INFILE '$f' INTO TABLE t " +
        "FIELDS TERMINATED BY '\\t' " +
        "LINES STARTING BY '>>' TERMINATED BY '\\r\\n'")
      SqlRouter.execute(e, "SELECT id, name FROM t ORDER BY id").df.get
    },
    Some(raw"""SELECT CAST(substr(c0, strpos(c0, '>>') + 2) AS BIGINT) AS id,
        c1 AS name
      FROM read_csv('${sfScopedPath("graft_q109_lines", oracleSfDir)}',
        auto_detect = false,
        header = false, sep = '\t', quote = '', escape = '',
        new_line = '\r\n', null_padding = true,
        columns = {'c0': 'VARCHAR', 'c1': 'VARCHAR'})
      WHERE strpos(c0, '>>') > 0
      ORDER BY id"""))

  // --------------------------------------------------------------------
  // q110 — PG declarative partitioning end-to-end under the hash gate
  // (round-11 verdict #1; reference `pgserver/stmt.go` restore
  // surface): a RANGE parent with two bounded children + DEFAULT,
  // INSERT routed through the parent by bounds, UPDATE/DELETE fanned
  // out per child, then one partition DETACHED — the oracle restates
  // the whole lifecycle in DuckDB as WHERE-bounded selects over
  // `orders`, so the hash fails if routing misplaces one row, a
  // fan-out statement misses a child, or detach fails to shrink the
  // parent's union. Price rides as DECIMAL(18,2) end-to-end (oracle
  // determinism discipline — no float sums).
  private val q110 = QueryDef(
    "q110_partitioned_routing",
    (s, dir) => {
      import graft.{Engine, SqlRouter}
      val e = new Engine(s, Files.createTempDirectory("graft_q110"))
      e.bindTables(dir, "orders")
      val tm = new StmtTimer("q110")
      def run(q: String): Unit = tm(q)(SqlRouter.execute(e, q))
      run("CREATE TABLE po (okey BIGINT, prio STRING, " +
        "price DECIMAL(18,2)) PARTITION BY RANGE (okey)")
      run("CREATE TABLE po_lo PARTITION OF po " +
        "FOR VALUES FROM (MINVALUE) TO (20000)")
      run("CREATE TABLE po_mid PARTITION OF po " +
        "FOR VALUES FROM (20000) TO (40000)")
      run("CREATE TABLE po_hi PARTITION OF po DEFAULT")
      run("INSERT INTO po SELECT o_orderkey, o_orderpriority, " +
        "CAST(o_totalprice AS DECIMAL(18,2)) FROM orders")
      run("UPDATE po SET prio = 'X' WHERE okey % 10 = 0")
      run("DELETE FROM po WHERE okey % 7 = 3")
      run("ALTER TABLE po DETACH PARTITION po_mid")
      tm.report()
      SqlRouter.execute(e,
        "SELECT 'lo' AS part, count(*) AS cnt, " +
          "CAST(sum(price) AS DECIMAL(18,2)) AS amt, " +
          "count(CASE WHEN prio = 'X' THEN 1 END) AS flagged FROM po_lo " +
        "UNION ALL SELECT 'mid', count(*), " +
          "CAST(sum(price) AS DECIMAL(18,2)), " +
          "count(CASE WHEN prio = 'X' THEN 1 END) FROM po_mid " +
        "UNION ALL SELECT 'hi', count(*), " +
          "CAST(sum(price) AS DECIMAL(18,2)), " +
          "count(CASE WHEN prio = 'X' THEN 1 END) FROM po_hi " +
        "UNION ALL SELECT 'parent', count(*), " +
          "CAST(sum(price) AS DECIMAL(18,2)), " +
          "count(CASE WHEN prio = 'X' THEN 1 END) FROM po " +
        "ORDER BY part").df.get
    },
    Some("""WITH base AS (
        SELECT o_orderkey AS okey,
          CASE WHEN o_orderkey % 10 = 0 THEN 'X' ELSE o_orderpriority END AS prio,
          CAST(o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders WHERE NOT (o_orderkey % 7 = 3)),
      lo AS (SELECT * FROM base WHERE okey < 20000),
      mid AS (SELECT * FROM base WHERE okey >= 20000 AND okey < 40000),
      hi AS (SELECT * FROM base WHERE okey >= 40000),
      fin AS (
        SELECT 'lo' AS part, count(*) AS cnt,
          CAST(sum(price) AS DECIMAL(18,2)) AS amt,
          count(CASE WHEN prio = 'X' THEN 1 END) AS flagged FROM lo
        UNION ALL SELECT 'mid', count(*),
          CAST(sum(price) AS DECIMAL(18,2)),
          count(CASE WHEN prio = 'X' THEN 1 END) FROM mid
        UNION ALL SELECT 'hi', count(*),
          CAST(sum(price) AS DECIMAL(18,2)),
          count(CASE WHEN prio = 'X' THEN 1 END) FROM hi
        UNION ALL SELECT 'parent', count(*),
          CAST(sum(price) AS DECIMAL(18,2)),
          count(CASE WHEN prio = 'X' THEN 1 END)
        FROM (SELECT * FROM lo UNION ALL SELECT * FROM hi))
      SELECT part, cnt, amt, flagged FROM fin ORDER BY part"""))

  // --------------------------------------------------------------------
  // q111 — the merge family THROUGH a partitioned parent, under the
  // hash gate (extends q110; reference `pgserver/stmt.go` +
  // `backend/loaddata.go` merge semantics): REPLACE, INSERT IGNORE
  // (both the all-conflict and the all-new shape), MySQL ODKU with
  // VALUES(), and PG ON CONFLICT DO UPDATE with a discriminating
  // WHERE guard all route per child — exact because a unique key on a
  // partitioned table must include the partition key — and each
  // explicit-id statement advances the PARENT's auto-inc counter, so
  // the closing auto-assign row's id is max(explicit)+1. The oracle
  // restates every step as CASE folds over `customer`; the guard rows
  // (`n < 5`) split the ODKU-touched set from the untouched set, so a
  // wrong guard, a misrouted child, or a stale counter each flip the
  // hash. A closing partition-key UPDATE moves rows between children
  // (PG >=11 row movement: delete + bounds-routed re-insert), shifting
  // the per-partition aggregates — and its RETURNING clause (the
  // frozen post-SET images, r12 verdict #4) folds into the gate as the
  // 'moved' row. Balances ride DECIMAL(18,2) end-to-end.
  private val q111 = QueryDef(
    "q111_partitioned_merge",
    (s, dir) => {
      import graft.{Engine, SqlRouter}
      val e = new Engine(s, Files.createTempDirectory("graft_q111"))
      e.bindTables(dir, "customer")
      val tm = new StmtTimer("q111")
      def run(q: String): Unit = tm(q)(SqlRouter.execute(e, q))
      run("CREATE TABLE pc (id BIGINT NOT NULL AUTO_INCREMENT, " +
        "name STRING, bal DECIMAL(18,2), seg STRING, n INT, " +
        "PRIMARY KEY (id)) PARTITION BY RANGE (id)")
      run("CREATE TABLE pc_lo PARTITION OF pc " +
        "FOR VALUES FROM (MINVALUE) TO (500)")
      run("CREATE TABLE pc_hi PARTITION OF pc DEFAULT")
      run("INSERT INTO pc SELECT c_custkey, c_name, " +
        "CAST(c_acctbal AS DECIMAL(18,2)), c_mktsegment, 0 FROM customer")
      // REPLACE re-images every tenth row with n=1
      run("REPLACE INTO pc SELECT c_custkey, c_name, " +
        "CAST(c_acctbal AS DECIMAL(18,2)), c_mktsegment, 1 FROM customer " +
        "WHERE c_custkey % 10 = 0")
      // IGNORE: all-conflict (no-op), then a +5000-shifted batch —
      // only ids ABOVE the seeded max are genuinely new and land in
      // pc_hi (at sf>=0.1 the shifted ids overlap seeded PKs and the
      // engine correctly drops them); the surviving rows push the
      // explicit-id high-water mark to max(custkey % 100 = 0) + 5000
      run("INSERT IGNORE INTO pc SELECT c_custkey, 'clobber', 0, 'X', 9 " +
        "FROM customer WHERE c_custkey % 7 = 0")
      run("INSERT IGNORE INTO pc SELECT c_custkey + 5000, c_name, " +
        "CAST(c_acctbal AS DECIMAL(18,2)), c_mktsegment, 2 FROM customer " +
        "WHERE c_custkey % 100 = 0")
      // MySQL ODKU: every 25th seeded row gains VALUES(n) = 5
      run("INSERT INTO pc SELECT c_custkey, c_name, " +
        "CAST(c_acctbal AS DECIMAL(18,2)), c_mktsegment, 5 FROM customer " +
        "WHERE c_custkey % 25 = 0 ON DUPLICATE KEY UPDATE n = n + VALUES(n)")
      // PG ON CONFLICT: guard n < 5 updates only rows the ODKU did
      // NOT touch (every 20th that is not a 100th)
      run("INSERT INTO pc SELECT c_custkey, c_name, " +
        "CAST(c_acctbal AS DECIMAL(18,2)), c_mktsegment, 100 FROM customer " +
        "WHERE c_custkey % 20 = 0 " +
        "ON CONFLICT (id) DO UPDATE SET n = pc.n + excluded.n " +
        "WHERE pc.n < 5")
      // the counter advanced through EVERY routed merge path above
      run("INSERT INTO pc (name, bal, seg, n) VALUES ('auto', 0, 'AUTO', 0)")
      // PG >=11 row movement: changing the partition key re-routes the
      // matched rows from pc_lo into pc_hi (delete + bounds-routed
      // re-insert) — the per-partition aggregates shift or the hash
      // fails. RETURNING (r12 verdict #4) answers the frozen post-SET
      // images; their fold joins the gate as the 'moved' row.
      val movedDf = tm("UPDATE pc movement")(SqlRouter.execute(e,
        "UPDATE pc SET id = id + 10000 WHERE id < 500 AND id % 250 = 0 " +
          "RETURNING id, bal").df.get)
      // round-15 (r14 verdict #3): the RETURNING fold was the ONE gate
      // row the fresh-engine self-check could not recompute from
      // committed state. Persist the fold into a scratch table INSIDE
      // the chain — the gate's 'moved' row then derives from committed
      // files (the fold frame evaluates exactly once, at this insert),
      // and the recheck below covers ALL 5 rows.
      // round-16 (r15 verdict #1): the hashed channel carries NO raw
      // DECIMAL — amounts ride as BIGINT cents (exact at scale 2; the
      // encoding r15's 27 green value probes proved safe on the
      // driver's comparator, whose decimal canonicalization diverges
      // on trailing-zero/NULL cells). The balances themselves still
      // flow DECIMAL(18,2) end-to-end through the DML above; only the
      // gate's OUTPUT encoding changes.
      run("CREATE TABLE pc_moved (mpart STRING, mcnt BIGINT, " +
        "mamt BIGINT, mntot BIGINT)")
      e.table("pc_moved").insert(movedDf.agg(
        count(lit(1)).as("mcnt"),
        sum("bal").multiply(lit(100)).cast("long").as("mamt"),
        max("id").cast("long").as("mntot"))
        .select(lit("moved").as("mpart"), col("mcnt"), col("mamt"),
          col("mntot")))
      val gateSql =
        "SELECT 'auto' AS part, count(*) AS cnt, " +
          "CAST(sum(bal) * 100 AS BIGINT) AS amt_c, " +
          "CAST(max(id) AS BIGINT) AS ntot FROM pc WHERE seg = 'AUTO' " +
        "UNION ALL SELECT 'hi', count(*), " +
          "CAST(sum(bal) * 100 AS BIGINT), " +
          "CAST(sum(n) AS BIGINT) FROM pc_hi " +
        "UNION ALL SELECT 'lo', count(*), " +
          "CAST(sum(bal) * 100 AS BIGINT), " +
          "CAST(sum(n) AS BIGINT) FROM pc_lo " +
        "UNION ALL SELECT 'parent', count(*), " +
          "CAST(sum(bal) * 100 AS BIGINT), " +
          "CAST(sum(n) AS BIGINT) FROM pc " +
        "UNION ALL SELECT mpart, mcnt, mamt, mntot FROM pc_moved"
      tm.report()
      val gate = SqlRouter.execute(e, gateSql).df.get.orderBy("part")
      // ---- round-13 verdict #1: INSTRUMENT the driver-only hash gap.
      // (a) Materialize ONCE and print the 5 gate rows to stderr, so
      // any harness log (Verify, Bench, the driver's) records the
      // exact values that get hashed; returning a frame built from the
      // collected rows also makes the result immune to re-evaluation.
      // (b) Self-check: a FRESH engine over the same committed
      // warehouse recomputes ALL 5 gate rows (round 15: the persisted
      // 'moved' fold included). Any divergence — catalog race, stale
      // binding, lost write — turns the silent hash flip into a LOUD
      // err the driver gate records. It runs CONCURRENTLY with the
      // primary collect (independent engines over immutable committed
      // files) so the check costs ~no wall.
      val recheckF = scala.concurrent.Future {
        val e2 = new Engine(s, e.warehouse)
        SqlRouter.execute(e2, gateSql).df.get.orderBy("part").collect()
      }(scala.concurrent.ExecutionContext.global)
      val rows = gate.collect()
      def render(rs: Array[org.apache.spark.sql.Row]): String =
        rs.map(r => s"${r.getString(0)}:${r.getLong(1)}/" +
          s"${if (r.isNullAt(2)) "null" else r.getLong(2).toString}/" +
          s"${if (r.isNullAt(3)) "null" else r.getLong(3).toString}")
          .mkString(" ")
      System.err.println(s"[q111-gate] ${render(rows)}")
      // r15 ADVICE: 120s was tight for a loaded epoch at larger sf;
      // bound generously and NAME the self-check so a timeout never
      // reads as divergence.
      val recheck =
        try scala.concurrent.Await.result(recheckF,
          scala.concurrent.duration.Duration(600, "s"))
        catch {
          case t: java.util.concurrent.TimeoutException =>
            throw new IllegalStateException(
              "q111 fresh-engine self-check timed out after 600s " +
                "(epoch load, NOT divergence)", t)
        }
      if (render(rows) != render(recheck))
        throw new IllegalStateException(
          s"q111 self-check diverged: first=[${render(rows)}] " +
            s"fresh-engine=[${render(recheck)}]")
      s.createDataFrame(java.util.Arrays.asList(rows: _*), gate.schema)
    },
    Some("""WITH mx AS (SELECT max(c_custkey) AS m,
        greatest(max(c_custkey),
          max(CASE WHEN c_custkey % 100 = 0 THEN c_custkey END) + 5000)
          AS hwm
      FROM customer),
      seeded AS (
        SELECT c_custkey AS id, c_name AS name,
          CAST(c_acctbal AS DECIMAL(18,2)) AS bal, c_mktsegment AS seg,
          CASE WHEN c_custkey % 10 = 0 THEN 1 ELSE 0 END AS n
        FROM customer),
      withnew AS (
        SELECT * FROM seeded
        UNION ALL
        SELECT c_custkey + 5000, c_name, CAST(c_acctbal AS DECIMAL(18,2)),
          c_mktsegment, 2
        FROM customer WHERE c_custkey % 100 = 0
          AND c_custkey + 5000 > (SELECT m FROM mx)),
      odku AS (
        SELECT id, name, bal, seg,
          CASE WHEN id % 25 = 0 AND id <= (SELECT m FROM mx)
            THEN n + 5 ELSE n END AS n
        FROM withnew),
      conflicted AS (
        SELECT id, name, bal, seg,
          CASE WHEN id % 20 = 0 AND id <= (SELECT m FROM mx) AND n < 5
            THEN n + 100 ELSE n END AS n
        FROM odku),
      fin0 AS (
        SELECT * FROM conflicted
        UNION ALL
        SELECT (SELECT hwm FROM mx) + 1, 'auto',
          CAST(0 AS DECIMAL(18,2)), 'AUTO', 0),
      fin AS (
        SELECT CASE WHEN id < 500 AND id % 250 = 0 THEN id + 10000
          ELSE id END AS id, name, bal, seg, n
        FROM fin0),
      moved AS (
        SELECT id + 10000 AS id, bal FROM fin0
        WHERE id < 500 AND id % 250 = 0),
      agg AS (
        SELECT 'auto' AS part, count(*) AS cnt,
          CAST(sum(bal) * 100 AS BIGINT) AS amt_c,
          CAST(max(id) AS BIGINT) AS ntot FROM fin WHERE seg = 'AUTO'
        UNION ALL SELECT 'hi', count(*),
          CAST(sum(bal) * 100 AS BIGINT),
          CAST(sum(n) AS BIGINT) FROM fin WHERE id >= 500
        UNION ALL SELECT 'lo', count(*),
          CAST(sum(bal) * 100 AS BIGINT),
          CAST(sum(n) AS BIGINT) FROM fin WHERE id < 500
        UNION ALL SELECT 'moved', count(*),
          CAST(sum(bal) * 100 AS BIGINT),
          CAST(max(id) AS BIGINT) FROM moved
        UNION ALL SELECT 'parent', count(*),
          CAST(sum(bal) * 100 AS BIGINT),
          CAST(sum(n) AS BIGINT) FROM fin)
      SELECT part, cnt, amt_c, ntot FROM agg ORDER BY part"""))

  // --------------------------------------------------------------------
  // q112 — column ALTERs THROUGH a partitioned parent, under the hash
  // gate (round-13 verdict #4: the r13 tree-fan semantics were
  // spec-only; reference `catalog/table.go:223-479` column DDL). ADD
  // COLUMN with DEFAULT backfills every leaf, post-ALTER DML routes,
  // RENAME + MODIFY recurse, SET DEFAULT applies to a later routed
  // insert, and DROP COLUMN narrows the tree — each step shifts the
  // per-partition aggregates or the hash fails. The oracle restates
  // the chain as CASE folds over `customer`; balances ride
  // DECIMAL(18,2) end-to-end, tier sums are integer-exact.
  private val q112 = QueryDef(
    "q112_partitioned_alter",
    (s, dir) => {
      import graft.{Engine, SqlRouter}
      val e = new Engine(s, Files.createTempDirectory("graft_q112"))
      e.bindTables(dir, "customer")
      val tm = new StmtTimer("q112")
      def run(q: String): Unit = tm(q)(SqlRouter.execute(e, q))
      run("CREATE TABLE pal (id BIGINT NOT NULL, name STRING, " +
        "bal DECIMAL(18,2), PRIMARY KEY (id)) PARTITION BY RANGE (id)")
      run("CREATE TABLE pal_lo PARTITION OF pal " +
        "FOR VALUES FROM (MINVALUE) TO (700)")
      run("CREATE TABLE pal_hi PARTITION OF pal DEFAULT")
      run("INSERT INTO pal SELECT c_custkey, c_name, " +
        "CAST(c_acctbal AS DECIMAL(18,2)) FROM customer")
      // ADD COLUMN w/ DEFAULT fans to every leaf; existing rows read 3
      run("ALTER TABLE pal ADD COLUMN tier INT DEFAULT 3 NOT NULL")
      // post-ALTER DML through the parent sees the new column
      run("UPDATE pal SET tier = 1 WHERE id % 4 = 0")
      // RENAME + type MODIFY recurse through the tree
      run("ALTER TABLE pal RENAME COLUMN bal TO amount")
      run("ALTER TABLE pal MODIFY COLUMN tier BIGINT")
      // SET DEFAULT applies to a later routed insert (omitted columns)
      run("ALTER TABLE pal ALTER COLUMN name SET DEFAULT 'anon'")
      run("INSERT INTO pal (id, amount) VALUES (100000000, 12.50)")
      // fold the defaulted name into the gate before dropping it
      run("UPDATE pal SET tier = tier + 10 WHERE name = 'anon'")
      run("ALTER TABLE pal ADD CONSTRAINT amt_floor CHECK (amount >= -1000)")
      run("ALTER TABLE pal DROP COLUMN name")
      tm.report()
      SqlRouter.execute(e,
        "SELECT 'hi' AS part, count(*) AS cnt, " +
          "CAST(sum(amount) AS DECIMAL(18,2)) AS amt, " +
          "CAST(sum(tier) AS BIGINT) AS ts FROM pal_hi " +
        "UNION ALL SELECT 'lo', count(*), " +
          "CAST(sum(amount) AS DECIMAL(18,2)), " +
          "CAST(sum(tier) AS BIGINT) FROM pal_lo " +
        "UNION ALL SELECT 'parent', count(*), " +
          "CAST(sum(amount) AS DECIMAL(18,2)), " +
          "CAST(sum(tier) AS BIGINT) FROM pal " +
        "ORDER BY part").df.get
    },
    Some("""WITH seeded AS (
        SELECT c_custkey AS id, c_name AS name,
          CAST(c_acctbal AS DECIMAL(18,2)) AS amount, 3 AS tier
        FROM customer),
      t1 AS (SELECT id, name, amount,
          CASE WHEN id % 4 = 0 THEN 1 ELSE tier END AS tier FROM seeded),
      t2 AS (SELECT * FROM t1
        UNION ALL SELECT 100000000, 'anon', CAST(12.50 AS DECIMAL(18,2)), 3),
      t3 AS (SELECT id, amount,
          CASE WHEN name = 'anon' THEN tier + 10 ELSE tier END AS tier
        FROM t2),
      agg AS (
        SELECT 'hi' AS part, count(*) AS cnt,
          CAST(sum(amount) AS DECIMAL(18,2)) AS amt,
          CAST(sum(tier) AS BIGINT) AS ts FROM t3 WHERE id >= 700
        UNION ALL SELECT 'lo', count(*),
          CAST(sum(amount) AS DECIMAL(18,2)),
          CAST(sum(tier) AS BIGINT) FROM t3 WHERE id < 700
        UNION ALL SELECT 'parent', count(*),
          CAST(sum(amount) AS DECIMAL(18,2)),
          CAST(sum(tier) AS BIGINT) FROM t3)
      SELECT part, cnt, amt, ts FROM agg ORDER BY part"""))

  // --------------------------------------------------------------------
  // q113 — the storage LIFECYCLE through a partitioned tree, under the
  // hash gate (round-14: BACKUP/RESTORE and VACUUM/OPTIMIZE were
  // spec-only; reference `pgserver/backup_handler.go:28-175` +
  // `catalog/provider.go` restore, VACUUM analog): seed + delete
  // (leaves dead CoW generations), OPTIMIZE (compaction), VACUUM
  // RETAIN 0 (dead-file reclaim), BACKUP the database, mutate AFTER
  // the backup, DROP, RESTORE (partition tree relinked), and read the
  // per-partition aggregates — which must show the BACKED-UP state,
  // not the post-backup mutation. Every lifecycle op that corrupted a
  // file list, lost a partition link, or reclaimed a LIVE file flips
  // the hash.
  private val q113 = QueryDef(
    "q113_lifecycle_backup_restore",
    (s, dir) => {
      import graft.{Engine, SqlRouter}
      val wh = Files.createTempDirectory("graft_q113")
      val e = new Engine(s, wh)
      e.bindTables(dir, "customer")
      val tm = new StmtTimer("q113")
      def run(q: String): Unit = tm(q)(SqlRouter.execute(e, q))
      run("CREATE DATABASE lc")
      run("USE lc")
      e.bindTables(dir, "customer") // USE drops engine-side bindings
      run("CREATE TABLE lt (id BIGINT NOT NULL, name STRING, " +
        "bal DECIMAL(18,2), PRIMARY KEY (id)) PARTITION BY RANGE (id)")
      run("CREATE TABLE lt_lo PARTITION OF lt " +
        "FOR VALUES FROM (MINVALUE) TO (800)")
      run("CREATE TABLE lt_hi PARTITION OF lt DEFAULT")
      run("INSERT INTO lt SELECT c_custkey, c_name, " +
        "CAST(c_acctbal AS DECIMAL(18,2)) FROM customer")
      // dead CoW generations on both children
      run("DELETE FROM lt WHERE id % 3 = 0")
      run("UPDATE lt SET bal = bal + 1.00 WHERE id % 5 = 0")
      run("OPTIMIZE lt")
      run("VACUUM lt RETAIN 0 SECONDS")
      val bdir = Files.createTempDirectory("graft_q113_backup")
      run(s"BACKUP DATABASE lc TO '$bdir'")
      // post-backup mutation MUST NOT survive the restore
      run("DELETE FROM lt WHERE id < 100")
      run("USE main")
      run("DROP DATABASE lc CASCADE")
      run(s"RESTORE DATABASE lc FROM '$bdir'")
      run("USE lc")
      // round-16 (r15 verdict #1): BIGINT cents in the hashed channel —
      // raw DECIMAL stays out of the gate output (see q111 note).
      val gateSql =
        "SELECT 'hi' AS part, count(*) AS cnt, " +
          "CAST(sum(bal) * 100 AS BIGINT) AS amt_c FROM lt_hi " +
        "UNION ALL SELECT 'lo', count(*), " +
          "CAST(sum(bal) * 100 AS BIGINT) FROM lt_lo " +
        "UNION ALL SELECT 'parent', count(*), " +
          "CAST(sum(bal) * 100 AS BIGINT) FROM lt " +
        "ORDER BY part"
      // the q111 treatment (r14 verdict #2): materialize ONCE, print
      // the gate rows to stderr so the driver's log records the exact
      // hashed values, and have a FRESH engine over the restored
      // warehouse recompute them — a restore that relinked the
      // partition tree differently for a new reader (vs the session
      // that performed it) becomes a LOUD err instead of a silent
      // driver-side hash flip. Runs concurrently with the primary
      // collect (immutable committed files).
      tm.report()
      val recheckF = scala.concurrent.Future {
        val e2 = new Engine(s, wh)
        SqlRouter.execute(e2, "USE lc")
        SqlRouter.execute(e2, gateSql).df.get.collect()
      }(scala.concurrent.ExecutionContext.global)
      val gate = SqlRouter.execute(e, gateSql).df.get
      val rows = gate.collect()
      def render(rs: Array[org.apache.spark.sql.Row]): String =
        rs.map(r => s"${r.getString(0)}:${r.getLong(1)}/" +
          s"${if (r.isNullAt(2)) "null" else r.getLong(2).toString}")
          .mkString(" ")
      System.err.println(s"[q113-gate] ${render(rows)}")
      // r15 ADVICE: generous bound + named timeout (see q111).
      val recheck =
        try scala.concurrent.Await.result(recheckF,
          scala.concurrent.duration.Duration(600, "s"))
        catch {
          case t: java.util.concurrent.TimeoutException =>
            throw new IllegalStateException(
              "q113 fresh-engine self-check timed out after 600s " +
                "(epoch load, NOT divergence)", t)
        }
      if (render(rows) != render(recheck))
        throw new IllegalStateException(
          s"q113 self-check diverged: first=[${render(rows)}] " +
            s"fresh-engine=[${render(recheck)}]")
      s.createDataFrame(java.util.Arrays.asList(rows: _*), gate.schema)
    },
    Some("""WITH seeded AS (
        SELECT c_custkey AS id,
          CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        FROM customer WHERE NOT (c_custkey % 3 = 0)),
      st AS (SELECT id,
          CASE WHEN id % 5 = 0 THEN CAST(bal + 1.00 AS DECIMAL(18,2))
            ELSE bal END AS bal
        FROM seeded),
      agg AS (
        SELECT 'hi' AS part, count(*) AS cnt,
          CAST(sum(bal) * 100 AS BIGINT) AS amt_c FROM st WHERE id >= 800
        UNION ALL SELECT 'lo', count(*),
          CAST(sum(bal) * 100 AS BIGINT) FROM st WHERE id < 800
        UNION ALL SELECT 'parent', count(*),
          CAST(sum(bal) * 100 AS BIGINT) FROM st)
      SELECT part, cnt, amt_c FROM agg ORDER BY part"""))

  // --------------------------------------------------------------------
  // q114 — round-15 upsert-edge semantics under the hash gate (MySQL
  // any-unique-key arbitration; reference delegates to GMS which
  // implements full MySQL semantics — `backend/executor.go:84-116`):
  // the ORM upsert idiom (AUTO_INCREMENT PK omitted, ONE unique index)
  // arbitrates ODKU / INSERT IGNORE / REPLACE on that index; all-NULL
  // VALUES batches trigger id assignment (the mysqldump replay shape);
  // NULL arbiter values never conflict (four NULL-em rows all insert);
  // and the counter advances through EVERY path — the closing row's id
  // is fully determined by the statement sizes, so the oracle derives
  // it from counts over `customer`. Auto-assigned ids inside multi-row
  // batches are order-dependent, so the gate groups by em and exposes
  // only order-independent facts (per-em n sums, group counts, the
  // final deterministic id).
  private val q114 = QueryDef(
    "q114_unique_upsert_family",
    (s, dir) => {
      import graft.{Engine, SqlRouter}
      val e = new Engine(s, Files.createTempDirectory("graft_q114"))
      e.bindTables(dir, "customer")
      val tm = new StmtTimer("q114")
      def run(q: String): Unit = tm(q)(SqlRouter.execute(e, q))
      run("CREATE TABLE t (id BIGINT NOT NULL AUTO_INCREMENT, em STRING, " +
        "n INT, PRIMARY KEY (id), UNIQUE KEY uq_em (em))")
      run("INSERT INTO t SELECT c_custkey + 1, concat('e', CAST(c_custkey AS STRING)), 1 " +
        "FROM customer WHERE c_custkey <= 200")
      // all-NULL VALUES: NULL at the auto position assigns (r15)
      run("INSERT INTO t VALUES (NULL, 'null_a', 7), (NULL, 'null_b', 7)")
      // implied-arbiter ODKU: existing ems accumulate, novel ems insert
      run("INSERT INTO t (em, n) SELECT concat('e', CAST(c_custkey AS STRING)), 10 " +
        "FROM customer WHERE c_custkey BETWEEN 100 AND 250 " +
        "ON DUPLICATE KEY UPDATE n = n + VALUES(n)")
      // implied-arbiter IGNORE: only novel ems land
      run("INSERT IGNORE INTO t (em, n) SELECT concat('e', CAST(c_custkey AS STRING)), 3 " +
        "FROM customer WHERE c_custkey BETWEEN 240 AND 280")
      // implied-arbiter REPLACE: conflicting ems re-image under new ids
      run("REPLACE INTO t (em, n) SELECT concat('e', CAST(c_custkey AS STRING)), 9 " +
        "FROM customer WHERE c_custkey BETWEEN 50 AND 60")
      // NULL arbiter values never conflict: both rows insert
      run("INSERT IGNORE INTO t (em, n) VALUES (NULL, 5), (NULL, 5)")
      // the counter advanced by every batch's FULL size: this id is
      // deterministic even though in-batch assignments are not
      run("INSERT INTO t (em, n) VALUES ('zz_final', 0)")
      tm.report()
      SqlRouter.execute(e,
        "SELECT coalesce(em, '~null') AS em2, CAST(sum(n) AS BIGINT) AS sn, " +
          "count(*) AS c, CAST(CASE WHEN coalesce(em, '') = 'zz_final' " +
          "THEN max(id) END AS BIGINT) AS fid " +
        "FROM t GROUP BY em ORDER BY em2").df.get
    },
    Some("""WITH seed AS (
        SELECT concat('e', CAST(c_custkey AS VARCHAR)) AS em, 1 AS n
        FROM customer WHERE c_custkey <= 200),
      odku AS (SELECT concat('e', CAST(c_custkey AS VARCHAR)) AS em, 10 AS n
        FROM customer WHERE c_custkey BETWEEN 100 AND 250),
      ign AS (SELECT concat('e', CAST(c_custkey AS VARCHAR)) AS em, 3 AS n
        FROM customer WHERE c_custkey BETWEEN 240 AND 280),
      rep AS (SELECT concat('e', CAST(c_custkey AS VARCHAR)) AS em
        FROM customer WHERE c_custkey BETWEEN 50 AND 60),
      s1 AS (
        SELECT s.em, CASE WHEN o.em IS NOT NULL THEN s.n + o.n ELSE s.n END AS n
        FROM seed s LEFT JOIN odku o ON s.em = o.em
        UNION ALL
        SELECT o.em, o.n FROM odku o WHERE o.em NOT IN (SELECT em FROM seed)),
      s2 AS (
        SELECT * FROM s1
        UNION ALL
        SELECT i.em, i.n FROM ign i WHERE i.em NOT IN (SELECT em FROM s1)),
      s3 AS (
        SELECT em, CASE WHEN em IN (SELECT em FROM rep) THEN 9 ELSE n END AS n
        FROM s2),
      fid AS (
        SELECT CAST(max(CASE WHEN c_custkey <= 200 THEN c_custkey + 1 END)
          + 1 + 2
          + count(CASE WHEN c_custkey BETWEEN 100 AND 250 THEN 1 END)
          + count(CASE WHEN c_custkey BETWEEN 240 AND 280 THEN 1 END)
          + count(CASE WHEN c_custkey BETWEEN 50 AND 60 THEN 1 END)
          + 2 AS BIGINT) AS v
        FROM customer),
      allr AS (
        SELECT em, n FROM s3
        UNION ALL SELECT 'null_a', 7
        UNION ALL SELECT 'null_b', 7
        UNION ALL SELECT CAST(NULL AS VARCHAR), n
          FROM (VALUES (5), (5)) v(n)
        UNION ALL SELECT 'zz_final', 0),
      agg AS (
        SELECT coalesce(em, '~null') AS em2, CAST(sum(n) AS BIGINT) AS sn,
          count(*) AS c,
          CASE WHEN coalesce(em, '') = 'zz_final'
            THEN (SELECT v FROM fid) END AS fid
        FROM allr GROUP BY em)
      SELECT em2, sn, c, CAST(fid AS BIGINT) AS fid FROM agg ORDER BY em2"""))

  // --------------------------------------------------------------------
  // q115 — LOAD DATA's column-list / @var / SET-transform surface under
  // the hash gate, proven by a FOREIGN reader (the q109 pattern;
  // reference `backend/loaddata.go:24-34,250-268` — its fast path takes
  // plain column lists, the GMS row engine the SET/@var forms): three
  // fixture files load through (em, @x) with SET transforms, an omitted
  // AUTO_INCREMENT key, a DEFAULT-filled column, and REPLACE/IGNORE
  // arbitrating on the implied unique index. The ORACLE reads the very
  // same bytes with DuckDB's read_csv and restates every load
  // declaratively — per-em sums plus an id-facts row (count distinct,
  // max) that pins the counter discipline without depending on
  // in-batch id order.
  private val q115 = QueryDef(
    "q115_loaddata_transform",
    (s, dir) => {
      import graft.{Engine, SqlRouter}
      val e = new Engine(s, Files.createTempDirectory("graft_q115"))
      def run(q: String): Unit = SqlRouter.execute(e, q)
      def write(stem: String, lines: Seq[String]): String = {
        val f = sfScopedPath(stem, dir)
        java.nio.file.Files.writeString(java.nio.file.Paths.get(f),
          lines.mkString("", "\n", "\n"))
        f
      }
      val f1 = write("graft_q115_f1", (1 to 300).map(i => s"k$i\t$i"))
      val f2 = write("graft_q115_f2",
        (200 to 400).map(i => s"k$i\t${i + 1000}"))
      val f3 = write("graft_q115_f3", (350 to 450).map(i => s"k$i\t7"))
      run("CREATE TABLE lt (id BIGINT NOT NULL AUTO_INCREMENT, em STRING, " +
        "n INT, d DOUBLE DEFAULT 2.5, PRIMARY KEY (id), " +
        "UNIQUE KEY uq_em (em))")
      run(s"LOAD DATA INFILE '$f1' INTO TABLE lt (em, @x) " +
        "SET n = CAST(@x AS INT) * 2")
      run(s"LOAD DATA INFILE '$f2' REPLACE INTO TABLE lt (em, @x) " +
        "SET n = CAST(@x AS INT)")
      run(s"LOAD DATA INFILE '$f3' IGNORE INTO TABLE lt (em, @x) " +
        "SET n = CAST(@x AS INT)")
      SqlRouter.execute(e,
        "SELECT em, CAST(sum(n) AS BIGINT) AS sn, count(*) AS c, " +
          "CAST(max(d) AS DOUBLE) AS dd FROM lt GROUP BY em " +
        "UNION ALL SELECT '__ids', count(DISTINCT id), count(*), " +
          "CAST(max(id) AS DOUBLE) FROM lt " +
        "ORDER BY em").df.get
    },
    Some(raw"""WITH f1 AS (SELECT c0 AS em, 2 * CAST(c1 AS INT) AS n
        FROM read_csv('${sfScopedPath("graft_q115_f1", oracleSfDir)}',
          auto_detect = false, header = false, sep = '\t', quote = '',
          escape = '', columns = {'c0': 'VARCHAR', 'c1': 'VARCHAR'})),
      f2 AS (SELECT c0 AS em, CAST(c1 AS INT) AS n
        FROM read_csv('${sfScopedPath("graft_q115_f2", oracleSfDir)}',
          auto_detect = false, header = false, sep = '\t', quote = '',
          escape = '', columns = {'c0': 'VARCHAR', 'c1': 'VARCHAR'})),
      f3 AS (SELECT c0 AS em, CAST(c1 AS INT) AS n
        FROM read_csv('${sfScopedPath("graft_q115_f3", oracleSfDir)}',
          auto_detect = false, header = false, sep = '\t', quote = '',
          escape = '', columns = {'c0': 'VARCHAR', 'c1': 'VARCHAR'})),
      s2 AS (
        SELECT f2.em, f2.n FROM f2
        UNION ALL
        SELECT f1.em, f1.n FROM f1 WHERE f1.em NOT IN (SELECT em FROM f2)),
      s3 AS (
        SELECT * FROM s2
        UNION ALL
        SELECT f3.em, f3.n FROM f3 WHERE f3.em NOT IN (SELECT em FROM s2)),
      ids AS (
        SELECT (SELECT count(*) FROM f1) + (SELECT count(*) FROM f2)
          + (SELECT count(*) FROM f3) AS maxid,
          (SELECT count(*) FROM s3) AS total),
      agg AS (
        SELECT em, CAST(n AS BIGINT) AS sn, CAST(1 AS BIGINT) AS c,
          2.5 AS dd FROM s3
        UNION ALL
        SELECT '__ids', total, total, CAST(maxid AS DOUBLE) FROM ids)
      SELECT em, sn, c, dd FROM agg ORDER BY em"""))

  // --------------------------------------------------------------------
  // q116 — the SUBSCRIPTION lifecycle under the hash gate (r15 verdict
  // #4; reference `pgserver/subscription_handler.go:15-383`, bootstrap
  // `main.go:181-185`): a publisher warehouse seeds from `customer`;
  // CREATE SUBSCRIPTION records the publisher's WAL position and
  // snapshots the table; post-snapshot transactions (update / insert /
  // delete) publish as REAL pgoutput frames (PgOutputEncoder →
  // FrameLog) and apply via ALTER SUBSCRIPTION REFRESH (pgoutput
  // decode → LWW condense → CoW merge); DISABLE provably pauses the
  // apply (a refresh that applies anything throws), ENABLE resumes
  // from the checkpoint. The oracle restates the whole stream as CASE
  // folds over `customer`. The gate is INT/BIGINT/STRING only (the
  // r16 decimal-channel discipline).
  private val q116 = QueryDef(
    "q116_subscription_lifecycle",
    (s, dir) => {
      import graft.{Engine, SqlRouter}
      import graft.streaming.{CdcMerge, FrameLog, PgOutputEncoder}
      val pubWh = Files.createTempDirectory("graft_q116_pub")
      val subWh = Files.createTempDirectory("graft_q116_sub")
      val fl = Files.createTempDirectory("graft_q116_fl")
      val pub = new Engine(s, pubWh)
      pub.bindTables(dir, "customer")
      val tm = new StmtTimer("q116")
      SqlRouter.execute(pub, "CREATE TABLE acct (id BIGINT NOT NULL, " +
        "seg STRING, n INT, PRIMARY KEY (id))")
      tm("seed publisher")(SqlRouter.execute(pub,
        "INSERT INTO acct SELECT c_custkey, c_mktsegment, 0 FROM customer"))
      val acctSchema = pub.table("acct").schema
      // the publisher's row images, driver-side ONLY to author wire
      // frames (the fixture-file pattern of q109/q115 — a production
      // publisher's daemon writes these bytes from the wire)
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("id"),
          col("c_mktsegment").as("seg"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      // sf-derived insert shift (review r16: a FIXED +1000000 collides
      // with real custkeys at sf>=7 — engine would LWW-overwrite where
      // the oracle UNION ALLs; q111 guards the same pattern via mx/hwm)
      val shift = cust.map(_._1).max + 1000L

      val sub = new Engine(s, subWh)
      tm("CREATE SUBSCRIPTION")(SqlRouter.execute(sub,
        s"CREATE SUBSCRIPTION s16 CONNECTION " +
          s"'warehouse=$pubWh dbname=main framelog=$fl slot=s16' " +
          "PUBLICATION p16"))

      // post-snapshot stream: update every 10th (n=1), insert shifted
      // novel rows (n=2), delete every 7th-offset-3 — three txns
      def chg(a: Int, vs: Seq[Any]) = PgOutputEncoder.Change(a, vs)
      val (t1, l1) = PgOutputEncoder.txn(1000000L, 11L, 16384, "public",
        "acct", acctSchema, cust.filter(_._1 % 10 == 0)
          .map(c => chg(CdcMerge.ActionUpdate, Seq(c._1, c._2, 1))).toSeq)
      val (t2, l2) = PgOutputEncoder.txn(l1, 12L, 16384, "public",
        "acct", acctSchema, cust.filter(_._1 % 100 == 0)
          .map(c => chg(CdcMerge.ActionInsert,
            Seq(c._1 + shift, "NEW", 2))).toSeq)
      val (t3, l3) = PgOutputEncoder.txn(l2, 13L, 16384, "public",
        "acct", acctSchema, cust.filter(_._1 % 7 == 3)
          .map(c => chg(CdcMerge.ActionDelete, Seq(c._1, null, null))).toSeq)
      FrameLog.append(fl, "s16", t1 ++ t2 ++ t3)
      tm("REFRESH 3txn")(SqlRouter.execute(sub,
        "ALTER SUBSCRIPTION s16 REFRESH"))

      // lifecycle pause: DISABLE, publish, refresh MUST apply nothing
      SqlRouter.execute(sub, "ALTER SUBSCRIPTION s16 DISABLE")
      val (t4, _) = PgOutputEncoder.txn(l3, 14L, 16384, "public",
        "acct", acctSchema, cust.filter(_._1 % 5 == 4)
          .map(c => chg(CdcMerge.ActionDelete, Seq(c._1, null, null))).toSeq)
      FrameLog.append(fl, "s16", t4)
      val paused = SqlRouter.execute(sub, "ALTER SUBSCRIPTION s16 REFRESH")
      if (paused.affected != 0L) throw new IllegalStateException(
        s"q116: DISABLED subscription applied ${paused.affected} frames")
      // resume applies exactly the waiting txn
      SqlRouter.execute(sub, "ALTER SUBSCRIPTION s16 ENABLE")
      tm("REFRESH resumed")(SqlRouter.execute(sub,
        "ALTER SUBSCRIPTION s16 REFRESH"))
      SqlRouter.execute(sub, "DROP SUBSCRIPTION s16") // tables survive
      tm.report()
      SqlRouter.execute(sub,
        "SELECT seg, count(*) AS c, CAST(sum(n) AS BIGINT) AS sn, " +
          "CAST(max(id) AS BIGINT) AS mx FROM acct GROUP BY seg " +
        "ORDER BY seg").df.get
    },
    Some("""WITH mx AS (SELECT max(c_custkey) AS m,
        max(c_custkey) + 1000 AS shift FROM customer),
      base AS (
        SELECT c_custkey AS id, c_mktsegment AS seg,
          CASE WHEN c_custkey % 10 = 0 THEN 1 ELSE 0 END AS n
        FROM customer),
      withnew AS (
        SELECT * FROM base
        UNION ALL
        SELECT c_custkey + (SELECT shift FROM mx), 'NEW', 2 FROM customer
        WHERE c_custkey % 100 = 0),
      fin AS (
        SELECT * FROM withnew
        WHERE NOT (id % 7 = 3 AND id <= (SELECT m FROM mx))
          AND NOT (id % 5 = 4 AND id <= (SELECT m FROM mx)))
      SELECT seg, count(*) AS c, CAST(sum(n) AS BIGINT) AS sn,
        CAST(max(id) AS BIGINT) AS mx FROM fin GROUP BY seg
      ORDER BY seg"""))

  // --------------------------------------------------------------------
  // q117 — the MySQL-side replication pipeline under the hash gate,
  // the binlog twin of q116 (reference `binlogreplication/*.go` e2e
  // runs a real primary; `binlog/rbr.go` row decode): BinlogEncoder (a
  // local primary analog) writes GTID-framed binlog v4 transactions —
  // UPDATE_ROWS with before/after images, WRITE_ROWS, DELETE_ROWS with
  // key images — into a framelog; the batch decode
  // (BinlogEventDecoder.decodeSlotStreams → BinlogRowDecoder) feeds
  // the LWW condense + CoW merge, and the oracle restates the stream
  // as CASE folds over `customer`. Gate is INT/BIGINT/STRING only.
  private val q117 = QueryDef(
    "q117_binlog_pipeline",
    (s, dir) => {
      import graft.{Engine, SqlRouter}
      import graft.streaming.{BinlogEncoder => BE, BinlogEventDecoder,
        BinlogRowDecoder => BRD, CdcMerge, FrameLog}
      val e = new Engine(s, Files.createTempDirectory("graft_q117"))
      e.bindTables(dir, "customer")
      SqlRouter.execute(e, "CREATE TABLE acct (id BIGINT NOT NULL, " +
        "seg STRING, n INT, PRIMARY KEY (id))")
      SqlRouter.execute(e, "INSERT INTO acct SELECT c_custkey, " +
        "c_mktsegment, 0 FROM customer")
      val specs = Seq(BRD.ColSpec("id", BRD.Int64),
        BRD.ColSpec("seg", BRD.Varchar(64)),
        BRD.ColSpec("n", BRD.Int32))
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("id"),
          col("c_mktsegment").as("seg"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      val shift = cust.map(_._1).max + 1000L
      val sid = (1 to 16).map(_.toByte).toArray
      // txn 1: UPDATE_ROWS before/after images for every 9th row
      val (t1, o1) = BE.txn(1L, sid, 1L, 7L, "main", "acct", specs,
        cust.filter(_._1 % 9 == 0).map(c =>
          BE.Upd(Seq(c._1, c._2, 0), Seq(c._1, c._2, 1))).toSeq)
      // txn 2: WRITE_ROWS of shifted novel ids
      val (t2, o2) = BE.txn(o1, sid, 2L, 7L, "main", "acct", specs,
        cust.filter(_._1 % 50 == 0).map(c =>
          BE.Ins(Seq(c._1 + shift, "NEW", 2))).toSeq)
      // txn 3: DELETE_ROWS key images (non-key columns null)
      val (t3, _) = BE.txn(o2, sid, 3L, 7L, "main", "acct", specs,
        cust.filter(_._1 % 6 == 3).map(c =>
          BE.Del(Seq(c._1, null, null))).toSeq)
      val fl = Files.createTempDirectory("graft_q117_fl")
      FrameLog.append(fl, "m1", Seq((0L, BE.fde())) ++ t1 ++ t2 ++ t3)
      val frames = s.read.format("framelog").load(fl.toString)
      val decoded = BinlogEventDecoder.decodeSlotStreams(frames,
        "slot", "off", "payload", "main.acct", specs)
      CdcMerge.applyBatch(e.table("acct"), decoded)
      SqlRouter.execute(e,
        "SELECT seg, count(*) AS c, CAST(sum(n) AS BIGINT) AS sn, " +
          "CAST(max(id) AS BIGINT) AS mx FROM acct GROUP BY seg " +
        "ORDER BY seg").df.get
    },
    Some("""WITH mx AS (SELECT max(c_custkey) AS m,
        max(c_custkey) + 1000 AS shift FROM customer),
      base AS (
        SELECT c_custkey AS id, c_mktsegment AS seg,
          CASE WHEN c_custkey % 9 = 0 THEN 1 ELSE 0 END AS n
        FROM customer),
      withnew AS (
        SELECT * FROM base
        UNION ALL
        SELECT c_custkey + (SELECT shift FROM mx), 'NEW', 2 FROM customer
        WHERE c_custkey % 50 = 0),
      fin AS (
        SELECT * FROM withnew
        WHERE NOT (id % 6 = 3 AND id <= (SELECT m FROM mx)))
      SELECT seg, count(*) AS c, CAST(sum(n) AS BIGINT) AS sn,
        CAST(max(id) AS BIGINT) AS mx FROM fin GROUP BY seg
      ORDER BY seg"""))

  // --------------------------------------------------------------------
  // q118 — the replica-controller DAEMON chain under the hash gate
  // (r16 verdict #1; reference
  // `binlogreplication/binlog_replica_controller.go:94-360` configure/
  // start/stop/status, `binlog_replica_applier.go:108-482` the IO
  // thread): a scripted primary (ReplicaControllerSpec's server loop)
  // serves BinlogEncoder-authored GTID/XID transactions over the REAL
  // MySQL wire; CHANGE REPLICATION SOURCE TO → START REPLICA runs the
  // live TCP daemon (handshake, auth, checksum/heartbeat registration,
  // COM_BINLOG_DUMP_GTID) appending to the _replica framelog; STOP
  // REPLICA flushes; Engine.applyReplicaLog decodes → LWW-condenses →
  // CoW-merges — the daemon twin of q117 (which drives the same decode
  // from fixture bytes with no network). The hashed result carries the
  // final table state AND the persisted Executed_Gtid_Set.
  private val q118 = QueryDef(
    "q118_replica_controller",
    (s, dir) => {
      import java.io.{DataInputStream, DataOutputStream}
      import java.net.ServerSocket
      import java.nio.charset.StandardCharsets
      import graft.{Engine, SqlRouter}
      import graft.streaming.{BinlogEncoder => BE,
        BinlogRowDecoder => BRD}
      val e = new Engine(s, Files.createTempDirectory("graft_q118"))
      e.bindTables(dir, "customer")
      val tm = new StmtTimer("q118")
      SqlRouter.execute(e, "CREATE TABLE acct (id BIGINT NOT NULL, " +
        "seg STRING, n INT, PRIMARY KEY (id))")
      tm("seed")(SqlRouter.execute(e, "INSERT INTO acct SELECT " +
        "c_custkey, c_mktsegment, 0 FROM customer"))
      // wire fixtures authored driver-side from the publisher's row
      // images (the q116/q117 pattern; a real primary's binlog IS
      // these bytes) — specs derive from the replicated schema exactly
      // as the apply side will derive them
      val specs = BRD.specsFor(e.table("acct").schema)
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("id"),
          col("c_mktsegment").as("seg"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      val shift = cust.map(_._1).max + 1000L
      val sid = (1 to 16).map(_.toByte).toArray
      val sidHex = sid.map(b => f"$b%02x").mkString
      val (t1, o1) = BE.txn(1L, sid, 1L, 7L, "main", "acct", specs,
        cust.filter(_._1 % 8 == 0).map(c =>
          BE.Upd(Seq(c._1, c._2, 0), Seq(c._1, c._2, 1))).toSeq)
      val (t2, o2) = BE.txn(o1, sid, 2L, 7L, "main", "acct", specs,
        cust.filter(_._1 % 40 == 0).map(c =>
          BE.Ins(Seq(c._1 + shift, "NEW", 2))).toSeq)
      val (t3, _) = BE.txn(o2, sid, 3L, 7L, "main", "acct", specs,
        cust.filter(_._1 % 11 == 5).map(c =>
          BE.Del(Seq(c._1, null, null))).toSeq)
      val stream = Seq(BE.fde()) ++ (t1 ++ t2 ++ t3).map(_._2)

      // scripted primary: handshake → accept auth → OK the checksum +
      // heartbeat registrations → accept COM_BINLOG_DUMP_GTID → stream
      // the events → hold until the replica disconnects
      def le(n: Long, bytes: Int): Array[Byte] =
        (0 until bytes).map(i => ((n >> (8 * i)) & 0xff).toByte).toArray
      def catB(parts: Array[Byte]*): Array[Byte] = {
        val o = new java.io.ByteArrayOutputStream(); parts.foreach(o.write)
        o.toByteArray
      }
      def writePacket(out: DataOutputStream, seq: Int,
          p: Array[Byte]): Unit = {
        out.writeByte(p.length & 0xff); out.writeByte((p.length >> 8) & 0xff)
        out.writeByte((p.length >> 16) & 0xff); out.writeByte(seq & 0xff)
        out.write(p)
      }
      def readPacket(in: DataInputStream): Array[Byte] = {
        val h = new Array[Byte](4); in.readFully(h)
        val len = (h(0) & 0xff) | ((h(1) & 0xff) << 8) | ((h(2) & 0xff) << 16)
        val b = new Array[Byte](len); in.readFully(b); b
      }
      val scramble = (21 to 40).map(_.toByte).toArray
      val handshake = catB(Array(10.toByte),
        "8.0.0-scripted".getBytes(StandardCharsets.UTF_8), Array(0.toByte),
        le(7L, 4), scramble.take(8), Array(0.toByte), le(0xffffL, 2),
        Array(33.toByte), le(2L, 2), le(0x0008L, 2), Array(21.toByte),
        Array.fill(10)(0.toByte), scramble.drop(8), Array(0.toByte),
        "mysql_native_password".getBytes(StandardCharsets.UTF_8),
        Array(0.toByte))
      val ok = Array[Byte](0x00, 0x00, 0x00, 0x02, 0x00, 0x00, 0x00)
      val server = new ServerSocket(0)
      val primary = new Thread(() => {
        try {
          val sock = server.accept()
          val in = new DataInputStream(sock.getInputStream)
          val out = new DataOutputStream(sock.getOutputStream)
          writePacket(out, 0, handshake); out.flush()
          readPacket(in) // HandshakeResponse41
          writePacket(out, 2, ok); out.flush()
          readPacket(in) // SET @master_binlog_checksum
          writePacket(out, 1, ok); out.flush()
          readPacket(in) // SET @master_heartbeat_period
          writePacket(out, 1, ok); out.flush()
          readPacket(in) // COM_BINLOG_DUMP_GTID
          stream.zipWithIndex.foreach { case (ev, i) =>
            writePacket(out, i + 1, catB(Array(0.toByte), ev))
          }
          out.flush()
          Thread.sleep(60000) // hold the dump open until STOP REPLICA
        } catch { case _: Throwable => () }
      }, "q118-scripted-primary")
      primary.setDaemon(true)
      primary.start()

      SqlRouter.execute(e, "CHANGE REPLICATION SOURCE TO " +
        s"SOURCE_HOST='127.0.0.1', SOURCE_PORT=${server.getLocalPort}, " +
        "SOURCE_USER='repl', SOURCE_PASSWORD='secret', " +
        "SOURCE_CONNECT_RETRY=1")
      tm("START REPLICA")(SqlRouter.execute(e, "START REPLICA"))
      // the IO thread owns the wire; wait until its executed set covers
      // all three transactions (the e2e suites poll replica state the
      // same way, binlog_replication_test.go)
      val want = s"$sidHex:1-3"
      def gtidSet(): String =
        e.replicaStatus.toMap.getOrElse("Executed_Gtid_Set", "")
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      tm("stream wait") {
        while (gtidSet() != want && System.nanoTime() < deadline)
          Thread.sleep(50)
      }
      if (gtidSet() != want) throw new IllegalStateException(
        s"q118: replica never reached $want; status=" +
          e.replicaStatus.mkString("|"))
      tm("STOP REPLICA")(SqlRouter.execute(e, "STOP REPLICA"))
      server.close()
      // STOP persisted the position: SHOW REPLICA STATUS reads it back
      // from disk, not the (gone) client
      val st = SqlRouter.execute(e, "SHOW REPLICA STATUS").df.get
      val row = st.collect()(0)
      val persisted = row.getString(st.columns.indexOf("Executed_Gtid_Set"))
      if (persisted != want) throw new IllegalStateException(
        s"q118: persisted gtid set '$persisted' != '$want'")
      // SQL-apply: decode the flushed framelog, condense, CoW-merge
      val applied = tm("applyReplicaLog")(
        e.applyReplicaLog(Seq("main.acct")))
      if (applied == 0L) throw new IllegalStateException(
        "q118: apply consumed no frames")
      tm.report()
      SqlRouter.execute(e,
        "SELECT seg, count(*) AS c, CAST(sum(n) AS BIGINT) AS sn, " +
          "CAST(max(id) AS BIGINT) AS mx FROM acct GROUP BY seg " +
        "ORDER BY seg").df.get
        .withColumn("gtid", lit(persisted))
    },
    Some(s"""WITH mx AS (SELECT max(c_custkey) AS m,
        max(c_custkey) + 1000 AS shift FROM customer),
      base AS (
        SELECT c_custkey AS id, c_mktsegment AS seg,
          CASE WHEN c_custkey % 8 = 0 THEN 1 ELSE 0 END AS n
        FROM customer),
      withnew AS (
        SELECT * FROM base
        UNION ALL
        SELECT c_custkey + (SELECT shift FROM mx), 'NEW', 2 FROM customer
        WHERE c_custkey % 40 = 0),
      fin AS (
        SELECT * FROM withnew
        WHERE NOT (id % 11 = 5 AND id <= (SELECT m FROM mx)))
      SELECT seg, count(*) AS c, CAST(sum(n) AS BIGINT) AS sn,
        CAST(max(id) AS BIGINT) AS mx,
        '0102030405060708090a0b0c0d0e0f10:1-3' AS gtid
      FROM fin GROUP BY seg ORDER BY seg"""))

  // --------------------------------------------------------------------
  // q120 — §1.2 type fidelity as an oracle-gated alltypes round-trip
  // (r16 verdict #5; reference `catalog/type_mapping.go:120-332` and
  // its e2e `binlog_replication_alltypes_test.go`): CREATE a table
  // covering the MySQL type surface — signed/unsigned integer tiers
  // (UBIGINT → DECIMAL(20,0)), FLOAT/DOUBLE, DECIMAL at p=38, the
  // temporal family (DATE, DATETIME(6), TIMESTAMP, TIME at its
  // ±838:59:59 range, YEAR), BIT(12), ENUM/SET, VARCHAR/TEXT,
  // VARBINARY/BLOB (hex literals), JSON — INSERT boundary rows (max,
  // min, all-NULL, ordinary), and SELECT back through casts that stay
  // in the gate's INT/BIGINT/STRING channel (DECIMAL → STRING, TIME →
  // seconds, FLOAT/DOUBLE → exact-dyadic integer products, binary →
  // hex). The oracle is the planted constant table — any TypeMapper /
  // literal-normalization / write-funnel drift flips the hash.
  private val q120 = QueryDef(
    "q120_alltypes_roundtrip",
    (s, dir) => {
      import graft.{Engine, SqlRouter}
      val e = new Engine(s, Files.createTempDirectory("graft_q120"))
      SqlRouter.execute(e, """CREATE TABLE alltypes (
        id BIGINT NOT NULL,
        c_ti TINYINT, c_tiu TINYINT UNSIGNED,
        c_si SMALLINT, c_siu SMALLINT UNSIGNED,
        c_mi MEDIUMINT, c_miu MEDIUMINT UNSIGNED,
        c_i INT, c_iu INT UNSIGNED,
        c_bi BIGINT, c_biu BIGINT UNSIGNED,
        c_f FLOAT, c_d DOUBLE, c_dec DECIMAL(38,10),
        c_date DATE, c_dt DATETIME(6), c_ts TIMESTAMP, c_time TIME,
        c_year YEAR, c_bit BIT(12),
        c_enum ENUM('a','b','c'), c_set SET('x','y','z'),
        c_vc VARCHAR(20), c_txt TEXT,
        c_vb VARBINARY(20), c_blob BLOB, c_json JSON,
        PRIMARY KEY (id))""")
      SqlRouter.execute(e, """INSERT INTO alltypes VALUES
        (1, 127, 255, 32767, 65535, 8388607, 16777215,
         2147483647, 4294967295, 9223372036854775807,
         18446744073709551615, 3.5, 2.25,
         '1234567890123456789012345678.0123456789',
         '9999-12-31', '9999-12-31 23:59:59.999999',
         '2038-01-19 03:14:07', INTERVAL '838:59:59' HOUR TO SECOND,
         2155, 0xFFF, 'c', 'x,y,z', 'varchar max', 'text value',
         0xDEADBEEF, 0x0ABC, '{"k":[1,2]}'),
        (2, -128, 0, -32768, 0, -8388608, 0,
         -2147483648, 0, -9223372036854775808, 0, -3.5, -2.25,
         '-1234567890123456789012345678.0123456789',
         '1000-01-01', '1000-01-01 00:00:00',
         '1970-01-01 00:00:01', INTERVAL '-838:59:59' HOUR TO SECOND,
         1901, 0x0000, 'a', 'x', '', '', 0x00, 0x0000, '{}'),
        (3, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
         NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
         NULL, NULL, NULL, NULL, NULL, NULL),
        (4, 7, 42, 1234, 5678, 12345, 54321, 1000000, 3000000000,
         123456789012345, 9876543210, 0.5, 1.5, '42.0000000001',
         '2024-06-15', '2024-06-15 12:34:56.789', '2024-06-15 12:34:56',
         INTERVAL '12:30:45' HOUR TO SECOND, 2024, 0xA5A, 'b', 'y,z',
         'hello', 'world', 0xCAFE, 0x05A5, '{"a":1}')""")
      SqlRouter.execute(e, """SELECT id,
          CAST(c_ti AS BIGINT) AS ti, CAST(c_tiu AS BIGINT) AS tiu,
          CAST(c_si AS BIGINT) AS si, CAST(c_siu AS BIGINT) AS siu,
          CAST(c_mi AS BIGINT) AS mi, CAST(c_miu AS BIGINT) AS miu,
          CAST(c_i AS BIGINT) AS i, CAST(c_iu AS BIGINT) AS iu,
          c_bi AS bi, CAST(c_biu AS STRING) AS biu,
          CAST(c_f * 2 AS BIGINT) AS f2, CAST(c_d * 4 AS BIGINT) AS d4,
          CAST(c_dec AS STRING) AS dec_s,
          CAST(c_date AS STRING) AS date_s, CAST(c_dt AS STRING) AS dt_s,
          CAST(c_ts AS STRING) AS ts_s, CAST(c_time AS BIGINT) AS time_s,
          CAST(c_year AS BIGINT) AS yr, hex(c_bit) AS bit_h,
          c_enum AS en, c_set AS st, c_vc AS vc, c_txt AS txt,
          hex(c_vb) AS vb_h, hex(c_blob) AS blob_h, c_json AS js
        FROM alltypes ORDER BY id""").df.get
    },
    Some("""SELECT * FROM (VALUES
        (1, 127, 255, 32767, 65535, 8388607, 16777215,
         2147483647, 4294967295, 9223372036854775807,
         '18446744073709551615', 7, 9,
         '1234567890123456789012345678.0123456789',
         '9999-12-31', '9999-12-31 23:59:59.999999',
         '2038-01-19 03:14:07', 3020399, 2155, '0FFF',
         'c', 'x,y,z', 'varchar max', 'text value',
         'DEADBEEF', '0ABC', '{"k":[1,2]}'),
        (2, -128, 0, -32768, 0, -8388608, 0,
         -2147483648, 0, -9223372036854775808, '0', -7, -9,
         '-1234567890123456789012345678.0123456789',
         '1000-01-01', '1000-01-01 00:00:00',
         '1970-01-01 00:00:01', -3020399, 1901, '0000',
         'a', 'x', '', '', '00', '0000', '{}'),
        (3, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
         NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
         NULL, NULL, NULL, NULL, NULL, NULL),
        (4, 7, 42, 1234, 5678, 12345, 54321, 1000000, 3000000000,
         123456789012345, '9876543210', 1, 6, '42.0000000001',
         '2024-06-15', '2024-06-15 12:34:56.789', '2024-06-15 12:34:56',
         45045, 2024, '0A5A', 'b', 'y,z', 'hello', 'world',
         'CAFE', '05A5', '{"a":1}'))
      AS t(id, ti, tiu, si, siu, mi, miu, i, iu, bi, biu, f2, d4,
        dec_s, date_s, dt_s, ts_s, time_s, yr, bit_h, en, st, vc, txt,
        vb_h, blob_h, js)
      ORDER BY id"""))

  // --------------------------------------------------------------------
  // q121 — the LIVE PG subscription daemon chain under the hash gate:
  // the pgoutput twin of q118 (r17 verdict #3; reference
  // `pgserver/subscription_handler.go:202-290` CREATE SUBSCRIPTION
  // starts a continuous apply worker, `logrepl/replication.go:222-683`
  // the replication connection). A scripted publisher speaks the PG
  // replication sub-protocol over real TCP (startup → AuthenticationOk
  // → START_REPLICATION → CopyBoth → XLogData stream); CREATE
  // SUBSCRIPTION with host= snapshots the publisher warehouse AND
  // starts PgReplicationClient, whose daemon lands the stream in the
  // subscription's framelog slot; REFRESH decodes/condenses/merges;
  // the persisted pg_subscription position is verified against the
  // authored stream's final commit LSN before the gate frame emits.
  // Gate channel stays INT/BIGINT/STRING.
  private val q121 = QueryDef(
    "q121_live_subscription",
    (s, dir) => {
      import java.io.{DataInputStream, DataOutputStream}
      import java.net.ServerSocket
      import java.nio.charset.StandardCharsets
      import graft.{Engine, SqlRouter}
      import graft.streaming.{CdcMerge, FrameLog, PgOutputEncoder}
      val pubWh = Files.createTempDirectory("graft_q121_pub")
      val fl = Files.createTempDirectory("graft_q121_fl")
      val pub = new Engine(s, pubWh)
      pub.bindTables(dir, "customer")
      val tm = new StmtTimer("q121")
      SqlRouter.execute(pub, "CREATE TABLE acct (id BIGINT NOT NULL, " +
        "seg STRING, n INT, PRIMARY KEY (id))")
      tm("seed publisher")(SqlRouter.execute(pub,
        "INSERT INTO acct SELECT c_custkey, c_mktsegment, 0 FROM customer"))
      val acctSchema = pub.table("acct").schema
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("id"),
          col("c_mktsegment").as("seg"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      val shift = cust.map(_._1).max + 1000L
      // post-snapshot stream, authored from the publisher's row images
      // (q116's fixture pattern — a real publisher's WAL IS these
      // bytes): update every 12th (n=1), insert every 60th shifted
      // (n=3), delete every 13th-offset-2
      def chg(a: Int, vs: Seq[Any]) = PgOutputEncoder.Change(a, vs)
      val (t1, l1) = PgOutputEncoder.txn(1000000L, 21L, 16384, "public",
        "acct", acctSchema, cust.filter(_._1 % 12 == 0)
          .map(c => chg(CdcMerge.ActionUpdate, Seq(c._1, c._2, 1))).toSeq)
      val (t2, l2) = PgOutputEncoder.txn(l1, 22L, 16384, "public",
        "acct", acctSchema, cust.filter(_._1 % 60 == 0)
          .map(c => chg(CdcMerge.ActionInsert,
            Seq(c._1 + shift, "NEW", 3))).toSeq)
      val (t3, l3) = PgOutputEncoder.txn(l2, 23L, 16384, "public",
        "acct", acctSchema, cust.filter(_._1 % 13 == 2)
          .map(c => chg(CdcMerge.ActionDelete, Seq(c._1, null, null))).toSeq)
      val stream = t1 ++ t2 ++ t3
      val lastCommit = l3 - 1

      // scripted publisher: PG v3 startup → AuthenticationOk →
      // ReadyForQuery → accept START_REPLICATION → CopyBothResponse →
      // XLogData frames → reply-requested keepalive (forces the
      // daemon's flush) → hold until the daemon disconnects
      def be(n: Long, w: Int): Array[Byte] =
        (0 until w).reverseIterator
          .map(i => ((n >> (8 * i)) & 0xff).toByte).toArray
      def catB(parts: Array[Byte]*): Array[Byte] = {
        val o = new java.io.ByteArrayOutputStream(); parts.foreach(o.write)
        o.toByteArray
      }
      def writeMsg(out: DataOutputStream, tpe: Char,
          body: Array[Byte]): Unit = {
        out.writeByte(tpe); out.writeInt(4 + body.length); out.write(body)
        out.flush()
      }
      val server = new ServerSocket(0)
      val publisher = new Thread(() => {
        try {
          val sock = server.accept()
          val in = new DataInputStream(sock.getInputStream)
          val out = new DataOutputStream(sock.getOutputStream)
          val len = in.readInt(); in.readFully(new Array[Byte](len - 4))
          writeMsg(out, 'R', be(0L, 4)) // AuthenticationOk
          writeMsg(out, 'Z', Array('I'.toByte))
          val tpe = in.readByte().toChar // 'Q' START_REPLICATION
          val qlen = in.readInt(); in.readFully(new Array[Byte](qlen - 4))
          if (tpe == 'Q') {
            writeMsg(out, 'W', catB(Array(0.toByte), be(0L, 2)))
            stream.foreach { case (off, payload) =>
              writeMsg(out, 'd', catB(Array('w'.toByte), be(off, 8),
                be(off, 8), be(0L, 8), payload))
            }
            writeMsg(out, 'd', catB(Array('k'.toByte), be(lastCommit, 8),
              be(0L, 8), Array(1.toByte))) // reply-requested → flush
            val sin = sock.getInputStream
            try while (sin.read() >= 0) ()
            catch { case _: Throwable => () }
          }
          try sock.close() catch { case _: Throwable => () }
        } catch { case _: Throwable => () }
      }, "q121-scripted-publisher")
      publisher.setDaemon(true)
      publisher.start()

      val sub = new Engine(s, Files.createTempDirectory("graft_q121_sub"))
      tm("CREATE SUBSCRIPTION live")(SqlRouter.execute(sub,
        s"CREATE SUBSCRIPTION s21 CONNECTION " +
          s"'warehouse=$pubWh dbname=main host=127.0.0.1 " +
          s"port=${server.getLocalPort} user=repl framelog=$fl " +
          "slot=s21' PUBLICATION p21"))
      if (!sub.subscriptionDaemonRunning("s21"))
        throw new IllegalStateException("q121: apply daemon did not start")
      // the daemon owns the wire; wait until the framelog's last
      // commit boundary reaches the authored stream's end
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      tm("stream wait") {
        while (!FrameLog.endAtPgCommit(fl, "s21", 0L)._2.contains(lastCommit)
            && System.nanoTime() < deadline)
          Thread.sleep(50)
      }
      val landed = FrameLog.endAtPgCommit(fl, "s21", 0L)._2
      if (!landed.contains(lastCommit)) throw new IllegalStateException(
        s"q121: daemon never landed the stream (last commit $landed, " +
          s"want $lastCommit)")
      val applied = tm("REFRESH")(SqlRouter.execute(sub,
        "ALTER SUBSCRIPTION s21 REFRESH"))
      if (applied.affected == 0L) throw new IllegalStateException(
        "q121: REFRESH applied no frames")
      // persisted position check (the q118 Executed_Gtid_Set twin):
      // pg_subscription's LSN must be the stream's final commit
      val pos = sub.subscriptions("s21")("lsn")
      if (pos != lastCommit.toString) throw new IllegalStateException(
        s"q121: persisted subscription lsn $pos != $lastCommit")
      tm("DROP SUBSCRIPTION")(SqlRouter.execute(sub,
        "DROP SUBSCRIPTION s21")) // stops the daemon; tables survive
      server.close()
      tm.report()
      SqlRouter.execute(sub,
        "SELECT seg, count(*) AS c, CAST(sum(n) AS BIGINT) AS sn, " +
          "CAST(max(id) AS BIGINT) AS mx FROM acct GROUP BY seg " +
        "ORDER BY seg").df.get
        .withColumn("pos", lit("applied"))
    },
    Some("""WITH mx AS (SELECT max(c_custkey) AS m,
        max(c_custkey) + 1000 AS shift FROM customer),
      base AS (
        SELECT c_custkey AS id, c_mktsegment AS seg,
          CASE WHEN c_custkey % 12 = 0 THEN 1 ELSE 0 END AS n
        FROM customer),
      withnew AS (
        SELECT * FROM base
        UNION ALL
        SELECT c_custkey + (SELECT shift FROM mx), 'NEW', 3 FROM customer
        WHERE c_custkey % 60 = 0),
      fin AS (
        SELECT * FROM withnew
        WHERE NOT (id % 13 = 2 AND id <= (SELECT m FROM mx)))
      SELECT seg, count(*) AS c, CAST(sum(n) AS BIGINT) AS sn,
        CAST(max(id) AS BIGINT) AS mx, 'applied' AS pos
      FROM fin GROUP BY seg ORDER BY seg"""))

  val defs: Seq[QueryDef] =
    Seq(q40, q41, q42, q43, q81, q102, q103, q104, q105, q106, q107, q108,
      q109, q110, q111, q112, q113, q114, q115, q116, q117, q118, q120,
      q121)
}
