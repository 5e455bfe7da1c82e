package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets

/** The MySQL replica-controller statement surface (reference
  * `binlogreplication/binlog_replica_controller.go:94-360` and its e2e
  * `binlog_replication_test.go`): CHANGE REPLICATION SOURCE TO /
  * CHANGE REPLICATION FILTER / START / STOP / RESET REPLICA / SHOW
  * REPLICA STATUS, with the reference's exact error/warning texts. */
class ReplicaControllerSpec extends SparkSpec {

  private def exec(e: Engine, q: String) = SqlRouter.execute(e, q)

  test("replica controller: configure, errors, status, reset") {
    val e = new Engine(spark, tmpDir("replctl"))
    // never configured: START errors, SHOW returns the empty set —
    // carrying the FULL status column list (MySQL does; tools index
    // columns before checking rows)
    val ex0 = intercept[Exception](exec(e, "START REPLICA"))
    assert(ex0.getMessage.contains(
      "server is not configured as a replication replica"))
    val empty = exec(e, "SHOW REPLICA STATUS").df.get
    assert(empty.collect().isEmpty &&
      empty.columns.contains("Replica_IO_Running") &&
      empty.columns.contains("Executed_Gtid_Set"))

    // incomplete configuration errors as early as possible (ref
    // binlog_replication_test.go:357-362)
    exec(e, "CHANGE REPLICATION SOURCE TO SOURCE_PORT=1234, " +
      "SOURCE_HOST='localhost'")
    val ex1 = intercept[Exception](exec(e, "START REPLICA"))
    assert(ex1.getMessage.contains("Invalid (empty) username"))

    // GTID auto-positioning is the only mode (ref :364-368)
    val ex2 = intercept[Exception](exec(e,
      "CHANGE REPLICATION SOURCE TO SOURCE_AUTO_POSITION=0"))
    assert(ex2.getMessage.contains("SOURCE_AUTO_POSITION cannot be disabled"))
    intercept[Exception](exec(e,
      "CHANGE REPLICATION SOURCE TO SOURCE_LOG_FILE='binlog.000001'"))
    // a typoed option refuses loudly rather than dropping silently
    intercept[Exception](exec(e,
      "CHANGE REPLICATION SOURCE TO SOURCE_PASWORD='oops'"))

    // legacy MASTER spelling, long hostname (ref TestShowReplicaStatus)
    val longHost = "really." * 12 + "com"
    exec(e, s"CHANGE MASTER TO MASTER_HOST='$longHost', " +
      "MASTER_USER='replicator'")
    val st = exec(e, "SHOW REPLICA STATUS").df.get.collect()(0)
    val cols = exec(e, "SHOW REPLICA STATUS").df.get.columns
    def col(n: String) = st.getString(cols.indexOf(n))
    assert(col("Source_Host") === longHost)
    assert(col("Source_User") === "replicator")
    assert(col("Source_Port") === "1234") // earlier option persists
    assert(col("Replica_IO_Running") === "No" &&
      col("Replica_SQL_Running") === "No")

    // filters persist, surface, and ENFORCE (the SQL-thread-side
    // filter point, reference binlog_replica_filtering.go). MySQL
    // semantics: a filter type NOT named keeps its previous value —
    // setting them in SEPARATE statements must not wipe each other.
    exec(e, "CHANGE REPLICATION FILTER REPLICATE_IGNORE_TABLE=(db1.t2)")
    exec(e, "CHANGE REPLICATION FILTER REPLICATE_DO_TABLE=(db1.t1, db1.t2)")
    assert(e.replicaFilters === (Seq("db1.t1", "db1.t2"), Seq("db1.t2")),
      "an unlisted filter type must keep its previous value")
    // a NAMED empty list clears exactly that type
    exec(e, "CHANGE REPLICATION FILTER REPLICATE_IGNORE_TABLE=()")
    assert(e.replicaFilters === (Seq("db1.t1", "db1.t2"), Seq()))
    exec(e, "CHANGE REPLICATION FILTER REPLICATE_IGNORE_TABLE=(db1.t2)")
    import spark.implicits._
    val ev = Seq(("db1", "t1", 1), ("db1", "t2", 2), ("db1", "t3", 3),
      ("db2", "t1", 4)).toDF("db", "tbl", "v")
    assert(e.filterReplicaTables(ev, "db", "tbl")
      .select("v").as[Int].collect().toSeq === Seq(1),
      "DO-list admits, IGNORE-list wins over DO, everything else drops")

    // malformed / ssl / public-key option handling
    val exM = intercept[Exception](exec(e,
      "CHANGE REPLICATION SOURCE TO SOURCE_AUTO_POSITION"))
    assert(exM.getMessage.contains("malformed"))
    exec(e, "CHANGE REPLICATION SOURCE TO GET_MASTER_PUBLIC_KEY=1, " +
      "SOURCE_SSL=1")
    assert(e.replicaConfig("source.public_key") === "1" &&
      e.replicaConfig("source.ssl") === "1")

    // STOP when stopped: warning 3084, not an error
    e.clearWarnings()
    exec(e, "STOP REPLICA")
    assert(e.warnings.exists(w => w._2 == 3084 &&
      w._3.contains("already stopped")))

    // RESET REPLICA ALL drops the configuration
    exec(e, "RESET REPLICA ALL")
    assert(exec(e, "SHOW REPLICA STATUS").df.get.collect().isEmpty)
  }

  test("replica controller: live scripted source, start/stop lifecycle") {
    // a minimal scripted primary: handshake -> accept auth -> accept
    // COM_BINLOG_DUMP_GTID -> stream FDE + one GTID/XID txn -> hold
    def le(n: Long, bytes: Int): Array[Byte] =
      (0 until bytes).map(i => ((n >> (8 * i)) & 0xff).toByte).toArray
    def cat(parts: Array[Byte]*): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream(); parts.foreach(o.write)
      o.toByteArray
    }
    def event(tpe: Int, body: Array[Byte]): Array[Byte] =
      cat(le(0L, 4), Array(tpe.toByte), le(1L, 4),
        le(19L + body.length, 4), le(0L, 4), le(0L, 2), body)
    def writePacket(out: DataOutputStream, seq: Int, p: Array[Byte]): Unit = {
      out.writeByte(p.length & 0xff); out.writeByte((p.length >> 8) & 0xff)
      out.writeByte((p.length >> 16) & 0xff); out.writeByte(seq & 0xff)
      out.write(p); out.flush()
    }
    def readPacket(in: DataInputStream): Array[Byte] = {
      val h = new Array[Byte](4); in.readFully(h)
      val len = (h(0) & 0xff) | ((h(1) & 0xff) << 8) | ((h(2) & 0xff) << 16)
      val b = new Array[Byte](len); in.readFully(b); b
    }
    val scramble = (21 to 40).map(_.toByte).toArray
    val handshake = cat(Array(10.toByte),
      "8.0.0-fake".getBytes(StandardCharsets.UTF_8), Array(0.toByte),
      le(7L, 4), scramble.take(8), Array(0.toByte), le(0xffffL, 2),
      Array(33.toByte), le(2L, 2), le(0x0008L, 2), Array(21.toByte),
      Array.fill(10)(0.toByte), scramble.drop(8), Array(0.toByte),
      "mysql_native_password".getBytes(StandardCharsets.UTF_8),
      Array(0.toByte))
    val ok = Array[Byte](0x00, 0x00, 0x00, 0x02, 0x00, 0x00, 0x00)
    val fde = event(15, cat(le(4L, 2), Array.fill(50)(0.toByte), le(0L, 4),
      Array(19.toByte), Array.fill(39)(0.toByte)))
    val sid = (1 to 16).map(_.toByte).toArray
    val gtid = event(33, cat(Array(0.toByte), sid, le(5L, 8)))
    val xid = event(16, le(99L, 8))

    val server = new ServerSocket(0)
    val t = new Thread(() => {
      try {
        val s = server.accept()
        val in = new DataInputStream(s.getInputStream)
        val out = new DataOutputStream(s.getOutputStream)
        writePacket(out, 0, handshake)
        readPacket(in) // HandshakeResponse41
        writePacket(out, 2, ok)
        readPacket(in) // register/settings queries or dump
        writePacket(out, 1, ok)
        readPacket(in)
        writePacket(out, 1, ok)
        readPacket(in) // COM_BINLOG_DUMP_GTID
        Seq(fde, gtid, xid).zipWithIndex.foreach { case (ev, i) =>
          writePacket(out, i + 1, cat(Array(0.toByte), ev))
        }
        Thread.sleep(30000) // hold the stream open until stop
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true)
    t.start()

    val e = new Engine(spark, tmpDir("replctl_live"))
    exec(e, s"CHANGE REPLICATION SOURCE TO SOURCE_HOST='127.0.0.1', " +
      s"SOURCE_PORT=${server.getLocalPort}, SOURCE_USER='repl', " +
      "SOURCE_PASSWORD='secret', SOURCE_CONNECT_RETRY=1")
    exec(e, "START REPLICA")
    // second START: warning 3083, threads keep running
    e.clearWarnings()
    exec(e, "START REPLICA")
    assert(e.warnings.exists(w => w._2 == 3083 &&
      w._3.contains("already running")))
    // the IO thread reaches the stream and marks the txn executed
    // (the frame appender buffers; the FILE is asserted after STOP,
    // which flushes it)
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    def gtidSet() = e.replicaStatus.toMap.getOrElse("Executed_Gtid_Set", "")
    while (gtidSet().isEmpty && System.nanoTime() < deadline)
      Thread.sleep(100)
    assert(gtidSet().nonEmpty, "txn not executed within 15s; status=" +
      e.replicaStatus.mkString("|"))
    val st = exec(e, "SHOW REPLICA STATUS").df.get.collect()(0)
    val cols = exec(e, "SHOW REPLICA STATUS").df.get.columns
    assert(st.getString(cols.indexOf("Replica_IO_Running")) === "Yes")
    assert(st.getString(cols.indexOf("Replica_SQL_Running")) === "Yes")
    // CHANGE while running refuses (MySQL: stop the io thread first)
    intercept[Exception](exec(e,
      "CHANGE REPLICATION SOURCE TO SOURCE_PORT=9"))
    exec(e, "STOP REPLICA")
    val st2 = exec(e, "SHOW REPLICA STATUS").df.get.collect()(0)
    assert(st2.getString(cols.indexOf("Replica_IO_Running")) === "No")
    // the GTID position survived the stop (persisted executed set)...
    assert(st2.getString(cols.indexOf("Executed_Gtid_Set")).nonEmpty)
    // ...and the flushed framelog holds the streamed events (C1 input)
    assert(graft.streaming.FrameLog.endState(
      e.warehouse.resolve("_replica"), "replica", 0L)._2.nonEmpty,
      "stop must flush the frame log")
    exec(e, "RESET REPLICA")
    val st3 = exec(e, "SHOW REPLICA STATUS").df.get.collect()(0)
    assert(st3.getString(cols.indexOf("Executed_Gtid_Set")).isEmpty,
      "RESET REPLICA must forget the replication position")
    server.close()
  }
}
