package graft
object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    SparkEntry.configure(spark)
    import spark.implicits._
    def probe(tag: String, script: String)(check: Engine => Unit): Unit = {
      val e = new Engine(spark, java.nio.file.Files.createTempDirectory("probe" + tag))
      try { SqlRouter.executeScript(e, script); print(s"$tag: OK "); check(e); println() }
      catch { case ex: Throwable => println(s"$tag: FAIL " + ex.toString.linesIterator.next().take(130)) }
    }
    probe("pg_serial",
      """CREATE TABLE s1 (id serial PRIMARY KEY, v text);
        |INSERT INTO s1 (v) VALUES ('a'), ('b');
        |""".stripMargin) { e =>
      print("ids=" + e.sql("SELECT id FROM s1 ORDER BY id").as[Int].collect().toSeq)
    }
    probe("pg_bigserial",
      """CREATE TABLE s2 (id bigserial PRIMARY KEY, v text);
        |INSERT INTO s2 (v) VALUES ('a');
        |""".stripMargin) { e =>
      print("ids=" + e.sql("SELECT id FROM s2").as[Long].collect().toSeq)
    }
    probe("mysql_insert_set",
      """CREATE TABLE t1 (a INT, b STRING);
        |INSERT INTO t1 SET a = 1, b = 'x';
        |""".stripMargin) { e =>
      print("rows=" + e.sql("SELECT a, b FROM t1").as[(Option[Int], Option[String])].collect().toSeq)
    }
    probe("pg_truncate_multi",
      """CREATE TABLE ta (x INT); CREATE TABLE tb (y INT);
        |INSERT INTO ta VALUES (1); INSERT INTO tb VALUES (2);
        |TRUNCATE ta, tb RESTART IDENTITY CASCADE;
        |""".stripMargin) { e =>
      print("a=" + e.sql("SELECT count(*) FROM ta").as[Long].head() +
        " b=" + e.sql("SELECT count(*) FROM tb").as[Long].head())
    }
    probe("pg_returning",
      """CREATE TABLE tr (id bigint GENERATED ALWAYS AS IDENTITY, v text);
        |""".stripMargin) { e =>
      val r = SqlRouter.execute(e, "INSERT INTO tr (v) VALUES ('a') RETURNING id, v")
      print("df=" + r.df.map(_.collect().toSeq))
    }
    probe("mysql_on_update_ts",
      """CREATE TABLE tu (
        |  `id` int NOT NULL,
        |  `mt` timestamp NULL DEFAULT CURRENT_TIMESTAMP ON UPDATE CURRENT_TIMESTAMP,
        |  PRIMARY KEY (`id`)
        |);
        |INSERT INTO tu (`id`) VALUES (1);
        |""".stripMargin) { e =>
      print("rows=" + e.sql("SELECT count(*) FROM tu").as[Long].head())
      print(" mt_null=" + e.sql("SELECT mt IS NULL FROM tu").as[Boolean].head())
    }
    spark.stop()
  }
}
