package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class EngineSpec extends SparkSpec {
  import spark.implicits._

  private def freshEngine() = new Engine(spark, tmpDir("graft_wh"))

  private val xy = StructType(Seq(
    StructField("x", IntegerType), StructField("y", IntegerType)))

  test("database lifecycle + USE") {
    val e = freshEngine()
    assert(e.listDatabases() === Seq("main"))
    e.createDatabase("db2")
    assert(e.listDatabases() === Seq("db2", "main"))
    e.use("db2")
    assert(e.currentDatabase === "db2")
    intercept[Exception] { e.use("nope") }
    e.use("main")
    e.dropDatabase("db2")
    assert(e.listDatabases() === Seq("main"))
  }

  test("table lifecycle + qualified names") {
    val e = freshEngine()
    e.createDatabase("other")
    e.createTable("xy", xy, Seq("x"))
    e.createTable("other.uv", xy)
    assert(e.listTables() === Seq("xy"))
    assert(e.listTables("other") === Seq("uv"))
    e.table("xy").insert(Seq((1, 2)).toDF("x", "y"))
    assert(e.table("xy").read().count() === 1)
    e.dropTable("other.uv")
    assert(e.listTables("other") === Nil)
  }

  test("DROP TABLE is deferred: a pinned reader still completes its scan") {
    val e = freshEngine()
    e.createTable("pinned", xy, Seq("x"))
    e.table("pinned").insert(Seq((1, 2), (3, 4)).toDF("x", "y"))
    val snapshot = e.table("pinned").read() // lazy: paths bound, not read
    e.dropTable("pinned")
    assert(e.listTables() === Nil)
    intercept[Exception] { e.table("pinned").read() }
    // the pre-drop DataFrame scans its immutable files untouched
    assert(snapshot.orderBy("x").as[(Int, Int)].collect() ===
      Array((1, 2), (3, 4)))
    // re-CREATE of the same name starts empty, old data invisible
    e.createTable("pinned", xy, Seq("x"))
    assert(e.table("pinned").read().count() === 0L)
  }

  test("vacuumDropped reclaims retired tables, spares re-created ones") {
    val e = freshEngine()
    e.createTable("a", xy); e.table("a").insert(Seq((1, 1)).toDF("x", "y"))
    e.createTable("b", xy); e.table("b").insert(Seq((2, 2)).toDF("x", "y"))
    e.dropTable("a")
    e.dropTable("b")
    e.createTable("b", xy) // re-created over the dropped dir
    assert(e.vacuumDropped(minAgeMs = 0) === 2L)
    // a's directory is gone entirely; b survives with a clean journal
    assert(!java.nio.file.Files.exists(e.warehouse.resolve("main").resolve("a")))
    assert(e.listTables() === Seq("b"))
    assert(e.table("b").read().count() === 0L)
    import scala.jdk.CollectionConverters._
    val residue = java.nio.file.Files.list(
      e.warehouse.resolve("main").resolve("b")).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("_dropped")).toSeq
    assert(residue === Nil)
    // within the grace window nothing is touched
    e.dropTable("b")
    assert(e.vacuumDropped(minAgeMs = 3600000L) === 0L)
  }

  test("SQL over engine tables and stored views") {
    val e = freshEngine()
    e.createTable("users", StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType))), Seq("id"))
    e.table("users").insert(Seq((1, "ann"), (2, "bo")).toDF("id", "name"))
    e.createView("myview", "SELECT id, upper(name) AS uname FROM users")
    val rows = e.sql("SELECT uname FROM myview WHERE id = 2").as[String].collect()
    assert(rows === Array("BO"))
    assert(e.listViews() === Seq("myview"))
    e.dropView("myview")
    assert(e.listViews() === Nil)
  }

  test("parameterized SQL + schema probe without execution") {
    val e = freshEngine()
    e.createTable("t", xy, Seq("x"))
    e.table("t").insert(Seq((1, 10), (2, 20)).toDF("x", "y"))
    val df = e.sql("SELECT y FROM t WHERE x = :px", Map("px" -> 2))
    assert(df.as[Int].collect() === Array(20))
    val sch = e.probeSchema("SELECT x + 1 AS x1, 'a' AS tag FROM t")
    assert(sch.fieldNames === Array("x1", "tag"))
    assert(sch("x1").dataType === IntegerType)
  }

  test("session + persisted variables") {
    val e = freshEngine()
    e.setVar("k1", "v1")
    assert(e.getVar("k1") === Some("v1"))
    e.setVar("k2", "v2", persist = true)
    assert(e.getVar("k2") === Some("v2"))
    assert(e.getVar("missing") === None)
  }

  test("information_schema views reflect catalog state") {
    val e = freshEngine()
    e.createTable("t1", xy, Seq("x"))
    e.createView("v1", "SELECT x FROM t1")
    val tabs = e.informationSchemaTables()
      .select("table_name", "table_type").as[(String, String)].collect().toSet
    assert(tabs === Set(("t1", "BASE TABLE"), ("v1", "VIEW")))
    val cols = e.informationSchemaColumns()
      .orderBy("ordinal_position")
      .select("column_name", "data_type", "is_primary_key")
      .as[(String, String, Boolean)].collect()
    assert(cols === Array(("x", "int", true), ("y", "int", false)))
  }

  test("backup + restore round-trips tables, metadata, and views") {
    val e = freshEngine()
    e.createTable("t1", xy, Seq("x"), props = Map("generated.y" -> "x * 2"))
    e.table("t1").insert(Seq((1, 0), (2, 0)).toDF("x", "y"))
    e.createView("v1", "SELECT x FROM t1 WHERE x > 1")
    val dest = tmpDir("backup_dest")
    e.backupDatabase("main", dest)

    val e2 = new Engine(spark, tmpDir("restore_wh"))
    e2.restoreDatabase("restored", dest)
    e2.use("restored")
    assert(e2.listTables() === Seq("t1"))
    assert(e2.table("t1").read().orderBy("x").as[(Int, Int)].collect()
      === Array((1, 2), (2, 4)))
    assert(e2.table("t1").manifest.pkCols === Seq("x"))
    assert(e2.table("t1").manifest.props.get("generated.y") === Some("x * 2"))
    assert(e2.sql("SELECT x FROM v1").as[Int].collect() === Array(2))
  }

  test("backup + restore round-trips a partition TREE (r13)") {
    // the parent owns no files; its rows live in the children and the
    // partchild.*/partof props relink the tree on restore — the old
    // path crashed inserting the parent's empty backup frame into the
    // parent-never-holds-files guard
    val e = freshEngine()
    def run(q: String) = SqlRouter.execute(e, q)
    run("CREATE TABLE pt (id BIGINT NOT NULL AUTO_INCREMENT, v STRING, " +
      "PRIMARY KEY (id)) PARTITION BY RANGE (id)")
    run("CREATE TABLE pt_lo PARTITION OF pt FOR VALUES FROM (0) TO (100)")
    run("CREATE TABLE pt_hi PARTITION OF pt DEFAULT")
    run("INSERT INTO pt VALUES (1, 'a'), (200, 'b')")
    val dest = tmpDir("backup_tree")
    e.backupDatabase("main", dest)
    val e2 = new Engine(spark, tmpDir("restore_tree_wh"))
    e2.restoreDatabase("restored", dest)
    e2.use("restored")
    def run2(q: String) = SqlRouter.execute(e2, q)
    // tree relinked: parent reads the union, routing works, the
    // counter survived
    assert(run2("SELECT count(*) FROM pt").df.get.as[Long].head() === 2L)
    run2("INSERT INTO pt VALUES (50, 'c'), (300, 'd')")
    assert(run2("SELECT count(*) FROM pt_lo").df.get.as[Long].head() === 2L)
    assert(run2("SELECT count(*) FROM pt_hi").df.get.as[Long].head() === 2L)
    run2("INSERT INTO pt (v) VALUES ('auto')")
    assert(run2("SELECT max(id) FROM pt").df.get.as[Long].head() === 301L)
  }

  test("ALTER: add column with default, rename, drop — metadata only") {
    val e = freshEngine()
    e.createTable("t", xy, Seq("x"))
    val t = e.table("t")
    t.insert(Seq((1, 10)).toDF("x", "y"))
    val filesBefore = t.manifest.files

    t.addColumn("z", StringType, nullable = false, defaultSql = Some("'dflt'"))
    assert(t.manifest.files === filesBefore) // no rewrite
    assert(t.read().select("z").as[String].collect() === Array("dflt"))

    t.insert(Seq((2, 20, "zz")).toDF("x", "y", "z"))
    t.renameColumn("y", "why")
    assert(t.read().orderBy("x").select("x", "why", "z")
      .as[(Int, Int, String)].collect() === Array((1, 10, "dflt"), (2, 20, "zz")))

    // rows written before AND after the rename both resolve
    t.insert(Seq((3, 30, "z3")).toDF("x", "why", "z"))
    assert(t.read().filter(col("x") === 3).select("why").as[Int].collect() === Array(30))

    t.dropColumn("z")
    assert(t.read().columns === Array("x", "why"))
    intercept[IllegalArgumentException] { t.dropColumn("x") } // pk protected
  }

  test("ALTER MODIFY column type: metadata-only, mixed-generation files") {
    val e = freshEngine()
    e.createTable("t", xy, Seq("x"))
    val t = e.table("t")
    t.insert(Seq((1, 10)).toDF("x", "y"))
    val filesBefore = t.manifest.files

    t.modifyColumnType("y", LongType) // INT → BIGINT widening
    assert(t.manifest.files === filesBefore) // no rewrite
    assert(t.schema("y").dataType === LongType)
    // new writes arrive typed per the NEW schema; storage stays INT
    t.insert(Seq((2, 3_000L)).toDF("x", "y"))
    assert(t.read().orderBy("x").select("y").as[Long].collect()
      === Array(10L, 3000L))

    // further modify to STRING: cast chain still reads one physical type
    t.modifyColumnType("y", StringType)
    assert(t.read().orderBy("x").select("y").as[String].collect()
      === Array("10", "3000"))
    // rename keeps the storage-type pin attached to the column
    t.renameColumn("y", "ystr")
    assert(t.read().orderBy("x").select("ystr").as[String].collect()
      === Array("10", "3000"))
    // modify back to the original physical type drops the pin
    t.modifyColumnType("ystr", IntegerType)
    assert(!t.manifest.props.contains("phystype.ystr"))
    // DML through the modified column
    assert(t.update(col("ystr") === 10, Map("ystr" -> lit(11))) === 1)
    assert(t.read().orderBy("x").select("ystr").as[Int].collect()
      === Array(11, 3000))
  }

  test("DML still works on renamed columns (physical mapping in writes+reads)") {
    val e = freshEngine()
    e.createTable("t", xy, Seq("x"))
    val t = e.table("t")
    t.insert(Seq((1, 10), (2, 20), (3, 30)).toDF("x", "y"))
    t.renameColumn("y", "why")
    assert(t.update(col("why") === 20, Map("why" -> lit(99))) === 1)
    assert(t.delete(col("why") === 30) === 1)
    t.merge(Seq((1, 11, 1), (4, 40, 2)).toDF("x", "why", "action"))
    assert(t.read().orderBy("x").as[(Int, Int)].collect()
      === Array((1, 11), (2, 99), (4, 40)))
  }

  test("lazy catalog: a broken view doesn't fail unrelated queries") {
    val e = freshEngine()
    e.createTable("keep", xy, Seq("x"))
    e.table("keep").insert(Seq((1, 10)).toDF("x", "y"))
    e.createTable("gone", xy, Seq("x"))
    e.createView("broken_view", "SELECT * FROM gone")
    e.dropTable("gone") // view definition now dangles
    // eager registration analyzed every view per statement and threw here
    assert(e.sql("SELECT count(*) FROM keep").as[Long].head() === 1)
    // referencing the broken view still fails, as it must
    intercept[Exception] { e.sql("SELECT * FROM broken_view").collect() }
  }

  test("lazy catalog: unreferenced/unchanged tables cost no manifest reads") {
    val e = freshEngine()
    (1 to 20).foreach { i =>
      e.createTable(s"t$i", xy, Seq("x"))
      e.table(s"t$i").insert(Seq((i, i * 10)).toDF("x", "y"))
    }
    e.sql("SELECT count(*) FROM t7").collect() // bind t7 once
    val before = graft.storage.Manifest.loadCount.get()
    (1 to 5).foreach { _ =>
      assert(e.sql("SELECT sum(y) FROM t7").as[Long].head() === 70L)
    }
    // 5 queries over a 20-table catalog: the unchanged referenced table
    // re-binds zero times → zero manifest JSON reads for ANY table
    assert(graft.storage.Manifest.loadCount.get() === before)
    // a write moves t7's version: exactly the next statement rebinds
    e.table("t7").insert(Seq((99, 20)).toDF("x", "y"))
    assert(e.sql("SELECT sum(y) FROM t7").as[Long].head() === 90L)
  }

  // ------------------------------------------------------------------
  // engine review regressions (round 6)

  test("views defined over views register in dependency order") {
    val e = freshEngine()
    e.createTable("base", xy)
    e.table("base").insert(Seq((1, 2)).toDF("x", "y"))
    // created in REVERSE dependency order: the view map recalls "outer"
    // before "inner" exists in the session
    e.createView("outer_v", "SELECT x2 FROM inner_v")
    e.createView("inner_v", "SELECT x * 2 AS x2 FROM base")
    spark.catalog.dropTempView("outer_v"); spark.catalog.dropTempView("inner_v")
    assert(e.sql("SELECT * FROM outer_v").as[Int].head() === 2)
  }

  test("RENAME TABLE re-anchors per-file PK stats with the files") {
    val e = freshEngine()
    e.createTable("rs", StructType(Seq(StructField("id", LongType),
      StructField("v", StringType))), Seq("id"))
    e.table("rs").insert(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(e.table("rs").manifest.fileStats.nonEmpty)
    e.renameTable("rs", "rs2")
    val m = e.table("rs2").manifest
    assert(m.fileStats.nonEmpty)
    // stats keys must point at the files as re-homed
    assert(m.fileStats.keySet === m.files.toSet)
  }

  test("RESTORE drops views absent from the backup") {
    val e = freshEngine()
    e.createTable("t", xy)
    val backupDir = tmpDir("graft_backup_views")
    e.backupDatabase("main", backupDir)
    e.createView("post_backup_v", "SELECT 1 AS one")
    e.restoreDatabase("main", backupDir)
    assert(!e.listViews("main").contains("post_backup_v"))
  }

  test("dropDatabase unbinds stale temp views") {
    val e = freshEngine()
    e.createDatabase("tmpdb")
    e.use("tmpdb")
    e.createTable("t", xy)
    e.table("t").insert(Seq((1, 2)).toDF("x", "y"))
    assert(e.sql("SELECT * FROM t").count() === 1) // binds the temp view
    e.use("main")
    e.dropDatabase("tmpdb", cascade = true)
    e.use("main")
    // the stale binding must not serve the deleted files
    val err = intercept[Exception](e.sql("SELECT * FROM t").collect())
    assert(!err.isInstanceOf[java.io.FileNotFoundException])
  }

  test("vacuumDropped partial reclaim deletes data files even after a rename") {
    val e = freshEngine()
    e.createTable("r", xy)
    e.table("r").insert(Seq((1, 1)).toDF("x", "y"))
    // the dir moves main/r -> main/s; the journals move WITH it but
    // their absolute file entries still name the pre-rename path —
    // the java.nio string-delete silently failed on those (leak)
    e.renameTable("r", "s")
    e.dropTable("s")
    e.createTable("s", xy) // live re-create forces the PARTIAL path
    assert(e.vacuumDropped(minAgeMs = 0) === 1L)
    import scala.jdk.CollectionConverters._
    val dataDir = e.warehouse.resolve("main").resolve("s").resolve("data")
    val leaked =
      if (!java.nio.file.Files.isDirectory(dataDir)) Nil
      else java.nio.file.Files.walk(dataDir).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    assert(leaked === Nil) // the dropped generation's files are gone
  }

  test("vacuumDropped spares a newer retired generation in its grace window") {
    val e = freshEngine()
    e.createTable("g", xy)
    e.table("g").insert(Seq((1, 1)).toDF("x", "y"))
    e.dropTable("g")
    val tdir = e.warehouse.resolve("main").resolve("g")
    // age the first generation's retired journal past any cutoff
    import scala.jdk.CollectionConverters._
    val retired1 = java.nio.file.Files.list(tdir).iterator()
      .asScala.filter(_.getFileName.toString.startsWith("_dropped.")).toSeq.head
    val aged = tdir.resolve("_dropped.1." +
      retired1.getFileName.toString.split('.').last)
    java.nio.file.Files.move(retired1, aged)
    // second generation: re-create, insert, snapshot a reader, drop NOW
    e.createTable("g", xy)
    e.table("g").insert(Seq((2, 2)).toDF("x", "y"))
    val pinned = e.table("g").read()
    e.dropTable("g")
    assert(e.vacuumDropped(minAgeMs = 600000L) === 1L) // only gen 1
    assert(pinned.count() === 1) // gen 2's files survive its window
    // once gen 2 expires too, the whole dir goes
    assert(e.vacuumDropped(minAgeMs = 0L) === 1L)
    assert(!java.nio.file.Files.exists(tdir))
  }
}
