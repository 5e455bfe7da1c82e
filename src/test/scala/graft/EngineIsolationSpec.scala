package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import scala.jdk.CollectionConverters._

/** Round-13 verdict #2: two Engines in one outer SparkSession used to
  * share a session-global temp-view namespace keyed by BARE table name,
  * so concurrent Engines with same-named tables (`t` appears in six
  * query defs) could rebind each other's views between one another's
  * analysis and execution — silent wrong-table reads. Engines now own a
  * child session (`newSession()`): these specs pin the isolation, the
  * concurrency, and that the child session still resolves the injected
  * Catalyst functions and builder confs. */
class EngineIsolationSpec extends SparkSpec {

  test("two engines with the SAME table name read their own content") {
    val a = new Engine(spark, tmpDir("iso_a"))
    val b = new Engine(spark, tmpDir("iso_b"))
    SqlRouter.execute(a, "CREATE TABLE t (id BIGINT PRIMARY KEY, v STRING)")
    SqlRouter.execute(b, "CREATE TABLE t (id BIGINT PRIMARY KEY, v STRING)")
    SqlRouter.execute(a, "INSERT INTO t VALUES (1, 'alpha')")
    SqlRouter.execute(b, "INSERT INTO t VALUES (1, 'bravo'), (2, 'bravo2')")
    // interleaved: A registers t, B registers t, then A EXECUTES — the
    // exact window the old bare-name channel corrupted
    val fa = a.sql("SELECT v FROM t ORDER BY id")
    val fb = b.sql("SELECT v FROM t ORDER BY id")
    assert(fa.collect().map(_.getString(0)).toSeq == Seq("alpha"))
    assert(fb.collect().map(_.getString(0)).toSeq == Seq("bravo", "bravo2"))
    assert(a.sql("SELECT count(*) FROM t").collect()(0).getLong(0) == 1L)
  }

  test("concurrent same-named engines never cross-read (16 threads x 20)") {
    val pool = Executors.newFixedThreadPool(16)
    try {
      val engines = (0 until 4).map { i =>
        val e = new Engine(spark, tmpDir(s"iso_c$i"))
        SqlRouter.execute(e, "CREATE TABLE t (id BIGINT PRIMARY KEY, tag INT)")
        SqlRouter.execute(e,
          s"INSERT INTO t SELECT id, $i FROM range(${100 * (i + 1)})")
        (e, i)
      }
      val start = new CountDownLatch(1)
      val tasks = (0 until 16).map { k =>
        val (e, i) = engines(k % 4)
        pool.submit(new java.util.concurrent.Callable[Seq[(Long, Long)]] {
          def call() = {
            start.await()
            (0 until 20).map { _ =>
              val r = e.sql(
                "SELECT count(*), CAST(max(tag) AS BIGINT) FROM t").collect()(0)
              (r.getLong(0), r.getLong(1))
            }
          }
        })
      }
      start.countDown()
      tasks.zipWithIndex.foreach { case (f, k) =>
        val i = k % 4
        f.get(300, TimeUnit.SECONDS).foreach { case (cnt, tag) =>
          assert(cnt == 100L * (i + 1), s"engine $i read foreign row count")
          assert(tag == i.toLong, s"engine $i read foreign tag $tag")
        }
      }
    } finally pool.shutdownNow()
  }

  test("child session resolves injected functions, shims, and confs") {
    val e = new Engine(spark, tmpDir("iso_fn"))
    // codegen Expressions registered per session by SparkEntry.configure
    val r = e.spark.sql(
      "SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F))").collect()(0)
    assert(math.abs(r.getDouble(0) - 11.0) < 1e-9)
    // MySQL shims (registerSession)
    assert(e.sql("SELECT my_list_contains(my_split_list_str('a,b,c'), 'b')")
      .collect()(0).getBoolean(0))
    // builder-time confs inherit through newSession
    assert(e.spark.conf.get("spark.sql.session.timeZone") == "UTC")
  }

  test("external binds are engine-local and survive registerReferenced") {
    val a = new Engine(spark, tmpDir("iso_x1"))
    val b = new Engine(spark, tmpDir("iso_x2"))
    import spark.implicits._
    // bindTables-equivalent: an external frame registered into ONE
    // engine's namespace is invisible to the other
    Seq((1L, "only-a")).toDF("id", "v").createOrReplaceTempView("ext_probe")
    // outer-session views are NOT visible inside an engine's catalog
    val seen = scala.util.Try(a.sql("SELECT * FROM ext_probe").collect())
    assert(seen.isFailure, "outer-session temp view leaked into engine")
    Tables.load(a.spark, "/root/testdata/sf0.001", "region")
      .createOrReplaceTempView("region")
    assert(a.sql("SELECT count(*) FROM region").collect()(0).getLong(0) == 5L)
    val leaked = scala.util.Try(b.sql("SELECT count(*) FROM region").collect())
    assert(leaked.isFailure, "engine A's bind leaked into engine B")
  }
}
