package graft

/** Round-13 verdict #5: explicit 0 through an AUTO_INCREMENT column.
  * DECIDED semantics (Manifest.withFiles scaladoc): the engine behaves
  * as if MySQL's NO_AUTO_VALUE_ON_ZERO mode were always on —
  *  - explicit 0 is STORED LITERALLY (default MySQL would re-assign;
  *    PG identity and the 0-based testdata keys both want the literal),
  *  - explicit NULL is a LOUD error, never a silent assign trigger,
  *  - assignment happens only when the column is OMITTED.
  * These pins keep dump replays and the q111 oracle (custkeys start at
  * 0) deterministic across rounds. */
class AutoIncZeroSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def exec(e: Engine, q: String) = SqlRouter.execute(e, q)

  test("explicit 0 is stored literally and the counter still advances past max") {
    val e = new Engine(spark, tmpDir("autoinc_zero"))
    exec(e, "CREATE TABLE t (id BIGINT NOT NULL AUTO_INCREMENT, v STRING, " +
      "PRIMARY KEY (id))")
    exec(e, "INSERT INTO t VALUES (0, 'zero'), (5, 'five')")
    // 0 survives as 0 — NOT re-assigned to the next counter value
    assert(exec(e, "SELECT v FROM t WHERE id = 0").df.get
      .as[String].head() === "zero")
    // the explicit batch advanced the counter past ITS max (5 -> 6),
    // and the 0 row neither re-assigned nor stalled the counter at 1
    exec(e, "INSERT INTO t (v) VALUES ('auto')")
    assert(exec(e, "SELECT id FROM t WHERE v = 'auto'").df.get
      .as[Long].head() === 6L)
    assert(exec(e, "SELECT count(*), count(DISTINCT id) FROM t").df.get
      .as[(Long, Long)].head() === ((3L, 3L)))
  }

  test("explicit NULL into an AUTO_INCREMENT column is loud, not an assign") {
    val e = new Engine(spark, tmpDir("autoinc_null"))
    exec(e, "CREATE TABLE t (id BIGINT NOT NULL AUTO_INCREMENT, v STRING, " +
      "PRIMARY KEY (id))")
    intercept[Exception](exec(e, "INSERT INTO t VALUES (NULL, 'x')"))
    assert(exec(e, "SELECT count(*) FROM t").df.get.as[Long].head() === 0L)
  }

  test("UPDATE that nulls a NOT NULL / PK column is loud, nothing committed") {
    val e = new Engine(spark, tmpDir("autoinc_updnull"))
    exec(e, "CREATE TABLE t (id BIGINT NOT NULL AUTO_INCREMENT, v STRING, " +
      "PRIMARY KEY (id))")
    exec(e, "INSERT INTO t VALUES (1, 'a'), (2, 'b')")
    intercept[Exception](exec(e, "UPDATE t SET id = NULL WHERE id = 2"))
    // the copy-on-write rewrite aborted before its manifest commit
    assert(exec(e, "SELECT count(*), CAST(min(id) AS BIGINT), " +
      "CAST(max(id) AS BIGINT) FROM t").df.get
      .as[(Long, Long, Long)].head() === ((2L, 1L, 2L)))
  }

  test("explicit 0 through a PARTITIONED parent routes and stays literal") {
    val e = new Engine(spark, tmpDir("autoinc_zero_part"))
    exec(e, "CREATE TABLE p (id BIGINT NOT NULL AUTO_INCREMENT, v STRING, " +
      "PRIMARY KEY (id)) PARTITION BY RANGE (id)")
    exec(e, "CREATE TABLE p_lo PARTITION OF p FOR VALUES FROM (0) TO (10)")
    exec(e, "CREATE TABLE p_hi PARTITION OF p DEFAULT")
    exec(e, "INSERT INTO p VALUES (0, 'zero'), (50, 'fifty')")
    assert(exec(e, "SELECT v FROM p_lo WHERE id = 0").df.get
      .as[String].head() === "zero")
    exec(e, "INSERT INTO p (v) VALUES ('auto')") // counter -> 51
    assert(exec(e, "SELECT id FROM p WHERE v = 'auto'").df.get
      .as[Long].head() === 51L)
  }
}
