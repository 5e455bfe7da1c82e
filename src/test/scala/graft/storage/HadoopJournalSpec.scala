package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The manifest journal (and decision files) running entirely through
  * the Hadoop FileSystem API — the shared-storage deployment shape.
  * The existing journal semantics (optimistic slot claim, two-phase
  * txn visibility, vacuum) must hold unchanged over a `file://` Hadoop
  * FS instance. */
class HadoopJournalSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("pk", LongType), StructField("val", StringType)))

  private def withHadoopStore[A](body: => A): A = {
    val prev = Manifest.store
    Manifest.store = new HadoopJournalStore(spark.sessionState.newHadoopConf())
    try body finally Manifest.store = prev
  }

  test("create/insert/time-travel over the Hadoop journal store") {
    withHadoopStore {
      val t = GraftTable.create(spark, tmpDir("hj_basic"), schema, Seq("pk"))
      t.insert(Seq((1L, "a")).toDF("pk", "val"))
      t.insert(Seq((2L, "b")).toDF("pk", "val"))
      assert(t.read().count() === 2L)
      assert(t.readVersion(1L).count() === 1L) // v0 create, v1 first insert
      assert(t.history() === Seq(0L, 1L, 2L))
    }
  }

  test("concurrent commits over the Hadoop store: one writer per slot") {
    withHadoopStore {
      val t = GraftTable.create(spark, tmpDir("hj_race"), schema, Seq("pk"))
      t.insert(Seq((1L, "a")).toDF("pk", "val"))
      val base = t.manifest
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val start = new java.util.concurrent.CountDownLatch(1)
      val threads = (0 until 8).map { i =>
        new Thread(() => {
          start.await()
          try {
            Manifest.commit(t.path, base.copy(props = Map("writer" -> i.toString)))
            wins.incrementAndGet()
          } catch { case _: java.util.ConcurrentModificationException => () }
        })
      }
      threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
      assert(wins.get === 1)
      assert(t.manifest.version === base.version + 1)
    }
  }

  test("transaction visibility flips atomically over the Hadoop store") {
    withHadoopStore {
      val warehouse = tmpDir("hj_txn")
      val t1 = GraftTable.create(spark, warehouse.resolve("t1"), schema, Seq("pk"))
      val t2 = GraftTable.create(spark, warehouse.resolve("t2"), schema, Seq("pk"))
      val txn = new Transaction(spark, warehouse.resolve("_txn"))
      txn.table(t1.path).insert(Seq((1L, "a")).toDF("pk", "val"))
      txn.table(t2.path).insert(Seq((2L, "b")).toDF("pk", "val"))
      // nothing visible pre-commit
      assert(t1.read().count() === 0L && t2.read().count() === 0L)
      txn.commit()
      assert(t1.read().count() === 1L && t2.read().count() === 1L)
      // rollback path: stage then discard
      val txn2 = new Transaction(spark, warehouse.resolve("_txn"))
      txn2.table(t1.path).insert(Seq((9L, "x")).toDF("pk", "val"))
      txn2.rollback()
      assert(t1.read().count() === 1L)
    }
  }

  test("vacuum reclaims unreferenced files through the Hadoop FS API") {
    withHadoopStore {
      val t = GraftTable.create(spark, tmpDir("hj_vac"), schema, Seq("pk"))
      (1 to 3).foreach(i => t.insert(Seq((i.toLong, s"r$i")).toDF("pk", "val")))
      t.delete(col("pk") === 2L)
      val removed = t.vacuum(keepVersions = 1, minAgeMs = 0)
      assert(removed > 0)
      assert(t.read().orderBy("pk").as[(Long, String)].collect() ===
        Array((1L, "r1"), (3L, "r3")))
      assert(t.history() === Seq(t.manifest.version))
    }
  }

  test("a scheme off the atomic-rename allowlist is refused, not trusted") {
    // gs / wasb-style overwriting rename would silently drop a
    // concurrent writer's commit; unknown schemes must hard-fail
    val store = new HadoopJournalStore(spark.sessionState.newHadoopConf()) {
      override protected def isLocal(p: org.apache.hadoop.fs.Path) = false
    }
    val err = intercept[IllegalArgumentException](
      store.writeExclusive(tmpDir("hj_refuse").resolve("v1.json"), Array[Byte](1)))
    assert(err.getMessage.contains("allowlist"))
  }

  test("rename-if-absent claim: first writer wins, loser sees false") {
    // force the non-local arm (temp write + rename) on a local FS
    val store = new HadoopJournalStore(spark.sessionState.newHadoopConf()) {
      override protected def isLocal(p: org.apache.hadoop.fs.Path) = false
      override protected def atomicRenameSchemes = Set("file")
    }
    val dir = tmpDir("hj_claim")
    val slot = dir.resolve("v000000007.json")
    assert(store.writeExclusive(slot, "first".getBytes("UTF-8")))
    assert(!store.writeExclusive(slot, "second".getBytes("UTF-8")))
    assert(new String(store.read(slot), "UTF-8") === "first")
    // no temp residue
    assert(store.list(dir) === Seq("v000000007.json"))
  }
}
