package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.types._

/** The manifest journal (and transaction decision files) arbitrated by
  * conditional-put — the object-store deployment shape where rename
  * cannot be trusted (s3a is copy+delete; gs rename overwrites). The
  * claim is a single `If-None-Match: *` PUT against
  * [[InMemoryObjectStore]], whose `putIfAbsent` has the exact CAS
  * semantics S3 conditional writes give, so every race below exercises
  * the same arbitration a real bucket would. */
class ConditionalPutJournalSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("pk", LongType), StructField("val", StringType)))

  private def withCasStore[A](body: InMemoryObjectStore => A): A = {
    val prev = Manifest.store
    val api = new InMemoryObjectStore
    Manifest.store = new ConditionalPutJournalStore(api)
    try body(api) finally Manifest.store = prev
  }

  test("conditional-put API: concurrent creates — exactly one winner") {
    val api = new InMemoryObjectStore
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val start = new java.util.concurrent.CountDownLatch(1)
    val threads = (0 until 16).map { i =>
      new Thread(() => {
        start.await()
        if (api.putIfAbsent("bucket/slot", Array(i.toByte))) wins.incrementAndGet()
      })
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
    assert(wins.get === 1)
    // the 412 losers did not clobber the winner's content
    assert(api.get("bucket/slot").get.length === 1)
  }

  test("create/insert/time-travel over the conditional-put journal") {
    withCasStore { _ =>
      val t = GraftTable.create(spark, tmpDir("cp_basic"), schema, Seq("pk"))
      t.insert(Seq((1L, "a")).toDF("pk", "val"))
      t.insert(Seq((2L, "b")).toDF("pk", "val"))
      assert(t.read().count() === 2L)
      assert(t.readVersion(1L).count() === 1L)
      assert(t.history() === Seq(0L, 1L, 2L))
    }
  }

  test("8-writer commit race over conditional-put: one slot claim wins") {
    withCasStore { _ =>
      val t = GraftTable.create(spark, tmpDir("cp_race"), schema, Seq("pk"))
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

  test("transaction visibility flips atomically over conditional-put") {
    withCasStore { _ =>
      val warehouse = tmpDir("cp_txn")
      val t1 = GraftTable.create(spark, warehouse.resolve("t1"), schema, Seq("pk"))
      val t2 = GraftTable.create(spark, warehouse.resolve("t2"), schema, Seq("pk"))
      val txn = new Transaction(spark, warehouse.resolve("_txn"))
      txn.table(t1.path).insert(Seq((1L, "a")).toDF("pk", "val"))
      txn.table(t2.path).insert(Seq((2L, "b")).toDF("pk", "val"))
      assert(t1.read().count() === 0L && t2.read().count() === 0L)
      txn.commit()
      assert(t1.read().count() === 1L && t2.read().count() === 1L)
      val txn2 = new Transaction(spark, warehouse.resolve("_txn"))
      txn2.table(t1.path).insert(Seq((9L, "x")).toDF("pk", "val"))
      txn2.rollback()
      assert(t1.read().count() === 1L)
    }
  }

  test("racing decision files: one verdict, both observers agree") {
    withCasStore { api =>
      val txnDir = tmpDir("cp_decide").resolve("_txn")
      val store = Manifest.store
      val commit = "commit".getBytes("UTF-8")
      val abort = "abort".getBytes("UTF-8")
      val f = txnDir.resolve("txn42.decided")
      val r = (0 until 2).map(i =>
        store.writeExclusive(f, if (i == 0) commit else abort))
      assert(r.count(identity) === 1) // one verdict wrote
      // both observers read the SAME verdict (no torn/overwritten state)
      assert(new String(store.read(f), "UTF-8") ===
        new String(api.get(f.toString).get, "UTF-8"))
    }
  }

  test("flat-keyspace list: immediate children only, lexicographic") {
    val api = new InMemoryObjectStore
    val store = new ConditionalPutJournalStore(api)
    val dir = java.nio.file.Paths.get("/wh/db/t/_manifest")
    store.mkdirs(dir) // no-op, must not throw
    assert(store.writeExclusive(dir.resolve("v000000001.json"), Array(1)))
    assert(store.writeExclusive(dir.resolve("v000000000.json"), Array(0)))
    api.putIfAbsent("/wh/db/t/_manifest/nested/deep.json", Array(9))
    api.putIfAbsent("/wh/db/t/_manifestX/v9.json", Array(9)) // sibling prefix
    assert(store.list(dir) === Seq("v000000000.json", "v000000001.json"))
    assert(store.read(dir.resolve("v000000000.json")).toSeq === Seq(0.toByte))
    intercept[java.nio.file.NoSuchFileException](
      store.read(dir.resolve("missing.json")))
  }
}
