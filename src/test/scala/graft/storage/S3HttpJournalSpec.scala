package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.types._

/** [[S3HttpObjectStore]] against [[FakeS3Server]] — the real-store
  * binding for the conditional-put journal, exercised over actual HTTP
  * sockets with SigV4 enabled end to end (the fake recomputes the
  * signature from the wire, so canonicalization bugs fail here the way
  * a real bucket would fail them). The races mirror
  * [[ConditionalPutJournalSpec]]: same arbitration, now through the
  * `If-None-Match: *` PUT of an S3-compatible endpoint. */
class S3HttpJournalSpec extends SparkSpec {
  import spark.implicits._

  private val creds = Some(("AKFAKE", "secretkey"))
  private val schema = StructType(Seq(
    StructField("pk", LongType), StructField("val", StringType)))

  private def withS3[A](body: (FakeS3Server, S3HttpObjectStore) => A): A = {
    val server = new FakeS3Server("journal", credentials = creds)
    val api = new S3HttpObjectStore(server.endpoint, "journal",
      credentials = creds)
    try body(server, api) finally server.stop()
  }

  private def withS3Journal[A](body: FakeS3Server => A): A =
    withS3 { (server, api) =>
      val prev = Manifest.store
      Manifest.store = new ConditionalPutJournalStore(api)
      try body(server) finally Manifest.store = prev
    }

  test("HTTP If-None-Match PUT: 16 concurrent claimers, exactly one 200") {
    withS3 { (server, api) =>
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val start = new java.util.concurrent.CountDownLatch(1)
      val threads = (0 until 16).map { i =>
        new Thread(() => {
          start.await()
          if (api.putIfAbsent("race/slot", Array(i.toByte)))
            wins.incrementAndGet()
        })
      }
      threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
      assert(wins.get === 1)
      assert(server.contents("race/slot").get.length === 1)
      assert(server.sigFailures.get === 0)
      // the loser's 412 left the winner's byte in place
      assert(api.get("race/slot").map(_.length) === Some(1))
    }
  }

  test("get/delete/list round-trip; list paginates past the page size") {
    withS3 { (server, api) =>
      assert(api.get("missing") === None)
      // 5 keys > pageSize 2 → the continuation loop must run
      (1 to 5).foreach(i => assert(api.putIfAbsent(s"m/v$i", Array(i.toByte))))
      assert(api.putIfAbsent("other/v9", Array(9.toByte)))
      assert(api.listPrefix("m/") === (1 to 5).map(i => s"m/v$i"))
      assert(api.get("m/v3").get.toSeq === Seq(3.toByte))
      api.delete("m/v3")
      assert(api.get("m/v3") === None)
      assert(api.listPrefix("m/") === Seq("m/v1", "m/v2", "m/v4", "m/v5"))
      assert(server.sigFailures.get === 0)
    }
  }

  test("create/insert/time-travel over the HTTP-backed journal") {
    withS3Journal { server =>
      val t = GraftTable.create(spark, tmpDir("s3_basic"), schema, Seq("pk"))
      t.insert(Seq((1L, "a")).toDF("pk", "val"))
      t.insert(Seq((2L, "b")).toDF("pk", "val"))
      assert(t.read().count() === 2L)
      assert(t.readVersion(1L).count() === 1L)
      assert(t.history() === Seq(0L, 1L, 2L))
      assert(server.sigFailures.get === 0)
      assert(server.requests.get > 0)
    }
  }

  test("8-writer commit race over the HTTP journal: one slot claim wins") {
    withS3Journal { server =>
      val t = GraftTable.create(spark, tmpDir("s3_race"), schema, Seq("pk"))
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
      assert(server.sigFailures.get === 0)
    }
  }

  test("racing decision files over HTTP: one verdict wins") {
    withS3Journal { server =>
      val f = tmpDir("s3_decide").resolve("_txn").resolve("txn7.decided")
      val store = Manifest.store
      val r = Seq(store.writeExclusive(f, "commit".getBytes("UTF-8")),
        store.writeExclusive(f, "abort".getBytes("UTF-8")))
      assert(r === Seq(true, false))
      assert(new String(store.read(f), "UTF-8") === "commit")
      assert(server.sigFailures.get === 0)
    }
  }

  test("409 ConditionalRequestConflict: retried, then settled by existence") {
    withS3 { (server, api) =>
      // transient conflicts, key still free → the claim must WIN after
      // retrying, not report a phantom 'exists'
      server.conflictPuts.set(2)
      assert(api.putIfAbsent("c/slot", Array(1)))
      assert(server.contents("c/slot").get.toSeq === Seq(1.toByte))
      // conflicts through every retry, but ANOTHER writer's object
      // exists → the existence check settles it: false is truthful
      server.conflictPuts.set(1000)
      server.preload("c/won", Array(9))
      assert(!api.putIfAbsent("c/won", Array(2)))
      server.conflictPuts.set(0)
      assert(server.contents("c/won").get.toSeq === Seq(9.toByte))
    }
  }

  test("a conflict that never resolves and no object errors out (not false)") {
    val server = new FakeS3Server("journal", credentials = creds)
    try {
      val api = new S3HttpObjectStore(server.endpoint, "journal",
        credentials = creds, conflictRetries = 2, conflictBackoffMs = 10L)
      server.conflictPuts.set(100) // conflicts forever, key never created
      val e = intercept[java.io.IOException](api.putIfAbsent("c/dead", Array(1)))
      assert(e.getMessage.contains("conflict"))
      // a false here would make the journal report a version with no
      // manifest behind it — the error is the honest answer
      assert(server.size === 0)
    } finally server.stop()
  }

  test("a wrong secret is rejected with 403 (SignatureDoesNotMatch)") {
    val server = new FakeS3Server("journal", credentials = creds)
    try {
      val bad = new S3HttpObjectStore(server.endpoint, "journal",
        credentials = Some(("AKFAKE", "WRONGsecret")))
      val e = intercept[java.io.IOException](bad.putIfAbsent("k", Array(1)))
      assert(e.getMessage.contains("403"))
      assert(server.sigFailures.get === 1)
      assert(server.size === 0)
    } finally server.stop()
  }
}
