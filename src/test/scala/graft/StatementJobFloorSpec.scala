package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Regression guard for the per-statement Spark-job floor (r15 verdict
  * #5): multi-statement DML chains pay a fixed scheduling cost per
  * job, so tiny literal-VALUES statements must stay on the
  * driver-local fast paths (LocalRelation detection in
  * GraftTable.indexedLocal / pickPerKey / merge). Bounds are lenient
  * (+1 over the measured count) so AQE/runtime drift doesn't flake,
  * but a regression to the r15 shape (5-job auto-insert, 9-job ODKU)
  * trips loudly. */
class StatementJobFloorSpec extends SparkSpec {
  test("literal DML statements stay under the job-count bounds") {
    val jobs = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val e = new Engine(spark, Files.createTempDirectory("graft_jobfloor"))
      def run(q: String): Int = {
        Thread.sleep(200) // let the listener queue drain
        val j0 = jobs.get()
        SqlRouter.execute(e, q)
        Thread.sleep(200)
        jobs.get() - j0
      }
      run("CREATE TABLE t (id BIGINT NOT NULL AUTO_INCREMENT, v STRING, " +
        "n INT, PRIMARY KEY (id))")
      run("INSERT INTO t VALUES (1, 'seed', 0), (2, 'seed', 0)")
      val autoIns = run("INSERT INTO t (v, n) VALUES ('a', 1)")
      assert(autoIns <= 2, s"auto-assign literal INSERT ran $autoIns jobs " +
        "(driver-local id fast path regressed)")
      val rep = run("REPLACE INTO t VALUES (1, 'rep', 9)")
      assert(rep <= 5, s"literal REPLACE ran $rep jobs")
      val ign = run("INSERT IGNORE INTO t VALUES (2, 'ign', 6)")
      assert(ign <= 3, s"literal INSERT IGNORE ran $ign jobs")
      val odku = run("INSERT INTO t VALUES (2, 'odku', 4) " +
        "ON DUPLICATE KEY UPDATE n = n + 1")
      assert(odku <= 8, s"literal ODKU ran $odku jobs")
      // semantics survived the fast paths
      import spark.implicits._
      assert(SqlRouter.execute(e, "SELECT id, v, n FROM t ORDER BY id")
        .df.get.as[(Long, String, Int)].collect().toSeq ===
        Seq((1L, "rep", 9), (2L, "seed", 1), (3L, "a", 1)))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
