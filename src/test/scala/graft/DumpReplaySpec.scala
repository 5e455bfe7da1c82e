package graft

import graft.SqlRouter.executeScript

/** Dump-replay end-to-end (reference: the dump/shell ingest path,
  * `main_test.go:840-869`, `test/bats/mysql/load_data.bats`): feed a
  * `mysqldump --single-transaction`-shaped script and a pg_dump-shaped
  * COPY script through [[SqlRouter.executeScript]] verbatim — comments,
  * conditional comments, backticks, LOCK TABLES, table options, KEY
  * entries, multi-row INSERTs, SETs, post-data ALTER ADD CONSTRAINT —
  * and check the end state equals the rows the dump encodes. */
class DumpReplaySpec extends SparkSpec {
  import spark.implicits._

  test("mysqldump-shaped script replays to the exact table state") {
    val e = new Engine(spark, tmpDir("dump_mysql"))
    val script =
      """-- MySQL dump 10.13  Distrib 8.0.32, for Linux (x86_64)
        |--
        |-- Host: localhost    Database: shop
        |-- ------------------------------------------------------
        |/*!40101 SET @OLD_CHARACTER_SET_CLIENT=@@CHARACTER_SET_CLIENT */;
        |/*!40103 SET TIME_ZONE='+00:00' */;
        |
        |DROP TABLE IF EXISTS `alltypes`;
        |CREATE TABLE `alltypes` (
        |  `id` int NOT NULL,
        |  `c_small` smallint DEFAULT NULL,
        |  `c_dec` decimal(10,2) NOT NULL DEFAULT '0.00',
        |  `c_txt` varchar(100) DEFAULT NULL,
        |  `c_dt` datetime DEFAULT NULL,
        |  `c_enum` enum('low','high') DEFAULT 'low',
        |  PRIMARY KEY (`id`),
        |  KEY `idx_txt` (`c_txt`)
        |) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4 COLLATE=utf8mb4_0900_ai_ci;
        |
        |LOCK TABLES `alltypes` WRITE;
        |INSERT INTO `alltypes` VALUES (1,10,3.50,'a; b','2024-01-15 10:30:00','low'),(2,NULL,0.00,'it''s','2024-02-01 00:00:00','high');
        |INSERT INTO `alltypes` VALUES (3,7,12.25,NULL,NULL,'low');
        |UNLOCK TABLES;
        |SET @saved_cs_client = 'utf8mb4';
        |""".stripMargin
    executeScript(e, script)

    // end state: exactly the rows the dump encodes, typed faithfully
    val rows = e.sql("""SELECT id, c_small, CAST(c_dec AS STRING), c_txt,
        CAST(c_dt AS STRING), c_enum FROM alltypes ORDER BY id""")
      .as[(Int, Option[Short], String, Option[String], Option[String], String)]
      .collect()
    assert(rows === Array(
      (1, Some(10: Short), "3.50", Some("a; b"), Some("2024-01-15 10:30:00"), "low"),
      (2, None, "0.00", Some("it's"), Some("2024-02-01 00:00:00"), "high"),
      (3, Some(7: Short), "12.25", None, None, "low")))
    // structure: pk captured, column DEFAULT recorded, KEY entry dropped
    val m = e.table("alltypes").manifest
    assert(m.pkCols === Seq("id"))
    assert(m.props.get("default.c_dec") === Some("'0.00'"))
    assert(m.schema("id").nullable === false)
    assert(m.schema("c_dt").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    // the two INSERTs auto-staged into ONE journal version (create = v0)
    assert(e.table("alltypes").history() === Seq(0L, 1L))
    // pk semantics live: REPLACE INTO upserts by id after the replay
    SqlRouter.execute(e, "REPLACE INTO alltypes VALUES (3,8,1.00,'z',NULL,'high')")
    assert(e.sql("SELECT c_txt FROM alltypes WHERE id = 3")
      .as[String].head() === "z")
  }

  test("pg_dump-shaped script (COPY + post-data pkey) replays to the exact state") {
    val e = new Engine(spark, tmpDir("dump_pg"))
    // the bulk rows travel as a COPY file, the pg restore shape
    val csv = tmpDir("dump_pg_data").resolve("pgtypes.csv")
    java.nio.file.Files.write(csv,
      ("1,19.99,hello,true,2024-03-01 12:00:00\n" +
        "2,,\"with, comma\",false,\n" +
        "3,0.50,,true,2024-03-02 08:15:30\n").getBytes("UTF-8"))
    val script =
      s"""SET statement_timeout = 0;
         |SET client_encoding = 'UTF8';
         |SET standard_conforming_strings = 'on';
         |
         |CREATE TABLE pgtypes (
         |    id bigint NOT NULL,
         |    price numeric(12,2),
         |    note text,
         |    flag boolean,
         |    created timestamp without time zone
         |);
         |
         |COPY pgtypes FROM '${csv}' (FORMAT csv);
         |INSERT INTO pgtypes VALUES (4, 7.25, 'post-copy', false, NULL);
         |
         |ALTER TABLE ONLY pgtypes
         |    ADD CONSTRAINT pgtypes_pkey PRIMARY KEY (id);
         |""".stripMargin
    executeScript(e, script)

    val rows = e.sql("""SELECT id, CAST(price AS STRING), note, flag,
        CAST(created AS STRING) FROM pgtypes ORDER BY id""")
      .as[(Long, Option[String], Option[String], Option[Boolean], Option[String])]
      .collect()
    assert(rows === Array(
      (1L, Some("19.99"), Some("hello"), Some(true), Some("2024-03-01 12:00:00")),
      (2L, None, Some("with, comma"), Some(false), None),
      (3L, Some("0.50"), None, Some(true), Some("2024-03-02 08:15:30")),
      (4L, Some("7.25"), Some("post-copy"), Some(false), None)))
    val m = e.table("pgtypes").manifest
    assert(m.pkCols === Seq("id")) // the post-data ALTER landed
    assert(m.schema("created").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    assert(m.schema("note").dataType === org.apache.spark.sql.types.StringType)
    // pk semantics live after the post-data constraint
    SqlRouter.execute(e, "REPLACE INTO pgtypes VALUES (4, 9.99, 'upserted', true, NULL)")
    assert(e.sql("SELECT note FROM pgtypes WHERE id = 4").as[String].head()
      === "upserted")
  }

  test("pg_dump TEXT-format COPY (the actual default) replays bytea + escapes") {
    val e = new Engine(spark, tmpDir("dump_pg_text"))
    // pg_dump's default COPY format: tab-separated, escape sequences,
    // \N nulls, bytea as \x hex
    val data = tmpDir("dump_pg_text_data").resolve("blobs.txt")
    java.nio.file.Files.write(data,
      ("1\tline one\\nline two\t\\\\x48454c4c4f\n" +
        "2\t\\N\t\\N\n" +
        "3\ttab\\there\t\\\\x00ff\n").getBytes("UTF-8"))
    val script =
      s"""SET client_encoding = 'UTF8';
         |
         |CREATE TABLE blobs (
         |    id bigint NOT NULL,
         |    body text,
         |    payload bytea
         |);
         |
         |COPY blobs FROM '${data}';
         |
         |ALTER TABLE ONLY blobs
         |    ADD CONSTRAINT blobs_pkey PRIMARY KEY (id);
         |""".stripMargin
    executeScript(e, script)
    val rows = e.sql("SELECT id, body, payload FROM blobs ORDER BY id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.get(2)).map(_.asInstanceOf[Array[Byte]].toSeq)))
    assert(rows === Array(
      (1L, Some("line one\nline two"), Some("HELLO".getBytes("UTF-8").toSeq)),
      (2L, None, None),
      (3L, Some("tab\there"), Some(Seq[Byte](0x00, -1)))))
    assert(e.table("blobs").manifest.schema("payload").dataType ===
      org.apache.spark.sql.types.BinaryType)
  }
}
