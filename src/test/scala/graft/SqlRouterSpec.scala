package graft

class SqlRouterSpec extends SparkSpec {
  import spark.implicits._

  private def exec(e: Engine, q: String) = SqlRouter.execute(e, q)

  test("end-to-end SQL statement surface") {
    val e = new Engine(spark, tmpDir("router_wh"))
    exec(e, "CREATE TABLE users (id BIGINT PRIMARY KEY, name STRING, bal DOUBLE)")
    assert(e.listTables() === Seq("users"))

    val ins = exec(e, "INSERT INTO users VALUES (1, 'ann', 10.5), (2, 'bo', 20.0)")
    assert(ins.affected === 2)
    val ins2 = exec(e, "INSERT INTO users SELECT 3, 'cy', 30.0")
    assert(ins2.affected === 1)

    val sel = exec(e, "SELECT name FROM users WHERE bal > 15 ORDER BY id")
    assert(sel.df.get.as[String].collect() === Array("bo", "cy"))

    val upd = exec(e, "UPDATE users SET bal = bal * 2 WHERE name = 'ann'")
    assert(upd.affected === 1)
    assert(exec(e, "SELECT bal FROM users WHERE id = 1").df.get.as[Double].head() === 21.0)

    val del = exec(e, "DELETE FROM users WHERE id = 2")
    assert(del.affected === 1)
    assert(exec(e, "SELECT count(*) FROM users").df.get.as[Long].head() === 2)

    exec(e, "CREATE VIEW rich AS SELECT * FROM users WHERE bal > 25")
    assert(exec(e, "SELECT name FROM rich").df.get.as[String].collect() === Array("cy"))

    exec(e, "ALTER TABLE users ADD COLUMN tag STRING DEFAULT 'x' NOT NULL")
    assert(exec(e, "SELECT tag FROM users WHERE id = 1").df.get.as[String].head() === "x")
    exec(e, "ALTER TABLE users RENAME COLUMN tag TO label")
    exec(e, "ALTER TABLE users MODIFY COLUMN label VARCHAR(64)")
    exec(e, "ALTER TABLE users ALTER COLUMN label TYPE STRING")
    exec(e, "ALTER TABLE users DROP COLUMN label")

    exec(e, "INSERT INTO users VALUES (9, 'zed', 1.0)")
    exec(e, "ANALYZE TABLE users COMPUTE STATISTICS")
    assert(e.table("users").manifest.props("stats.rowCount") === "3")
    exec(e, "OPTIMIZE users")
    assert(e.table("users").manifest.files.size === 1)
    assert(exec(e, "VACUUM users").affected > 0)

    exec(e, "TRUNCATE TABLE users")
    assert(exec(e, "SELECT count(*) FROM users").df.get.as[Long].head() === 0)
    // time travel reads any retained pre-truncate version
    val latest = e.table("users").history().last
    assert(exec(e, s"SELECT * FROM users VERSION AS OF ${latest - 1}")
      .df.get.count() > 0)

    exec(e, "CREATE DATABASE analytics")
    exec(e, "USE analytics")
    assert(e.currentDatabase === "analytics")
    exec(e, "CREATE TABLE t (a INT)")
    assert(e.listTables("analytics") === Seq("t"))
    exec(e, "DROP TABLE t")
    exec(e, "USE main")
    exec(e, "DROP DATABASE analytics")
  }

  test("CREATE TABLE AS SELECT") {
    val e = new Engine(spark, tmpDir("router_ctas"))
    exec(e, "CREATE TABLE src (a INT, b STRING)")
    exec(e, "INSERT INTO src VALUES (1, 'x'), (2, 'y'), (3, 'z')")
    val r = exec(e, "CREATE TABLE dst AS SELECT a * 10 AS a10, b FROM src WHERE a > 1")
    assert(r.affected === 2)
    assert(exec(e, "SELECT a10 FROM dst ORDER BY a10").df.get.as[Int].collect()
      === Array(20, 30))
    assert(e.table("dst").schema.fieldNames === Array("a10", "b"))
  }

  test("composite primary key parse") {
    val e = new Engine(spark, tmpDir("router_pk"))
    exec(e, "CREATE TABLE kv (a INT, b INT, v STRING, PRIMARY KEY (a, b))")
    assert(e.table("kv").manifest.pkCols === Seq("a", "b"))
  }
}
