package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MySqlShimsSpec extends SparkSpec {
  import spark.implicits._
  import MySqlShims._

  override def beforeAll(): Unit = {
    super.beforeAll()
    MySqlShims.register(spark)
  }

  test("format translation covers the common MySQL tokens") {
    assert(translateFormat("%Y-%m-%d") === "yyyy-MM-dd")
    assert(translateFormat("%H:%i:%s") === "HH:mm:ss")
    assert(translateFormat("%d/%b/%Y at %h%p") === "dd/MMM/yyyy' at 'hha")
    assert(translateFormat("100%%") === "100%")
  }

  test("str_to_date and date_format round-trip") {
    val df = Seq("2024-03-15 13:45:09").toDF("s")
    val ts = df.select(strToDate(col("s"), "%Y-%m-%d %H:%i:%s").as("t"))
    assert(ts.select(dateFormat(col("t"), "%d/%m/%Y %H:%i").as("o"))
      .as[String].head() === "15/03/2024 13:45")
  }

  test("group_concat is sorted and deterministic") {
    val df = Seq(("a", 3), ("a", 1), ("a", 2)).toDF("k", "v")
    val r = df.groupBy("k").agg(groupConcat(col("v"), "|").as("c"))
      .select("c").as[String].head()
    assert(r === "1|2|3")
  }

  test("substring_index matches MySQL semantics") {
    val df = Seq("www.apache.spark.org").toDF("s")
    assert(df.select(substringIndex(col("s"), ".", 2)).as[String].head()
      === "www.apache")
    assert(df.select(substringIndex(col("s"), ".", -1)).as[String].head()
      === "org")
  }

  test("pg_expandarray produces (x, n) with 1-based ordinality") {
    val df = Seq((1, Seq("a", "b", "c"))).toDF("id", "arr")
    val out = pgExpandArray(df, "arr").select("x", "n").as[(String, Int)].collect()
    assert(out === Array(("a", 1), ("b", 2), ("c", 3)))
  }

  test("registered SQL shims: my_list_contains, my_split_list_str, thread id") {
    val r = spark.sql(
      """SELECT my_list_contains(array(1, 2, 3), 2) AS a,
                my_list_contains(array(1, 2, 3), 9) AS b,
                my_split_list_str('x, y;z') AS c,
                ps_current_thread_id() AS tid""").collect().head
    assert(r.getBoolean(0) === true)
    assert(r.getBoolean(1) === false)
    assert(r.getSeq[String](2) === Seq("x", "y", "z"))
    assert(r.getLong(3) > 0)
    // stable within the session
    assert(spark.sql("SELECT ps_current_thread_id()").collect().head.getLong(0)
      === r.getLong(3))
  }

  test("transcode re-encodes bytes between charsets (A36)") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT transcode(X'636166E9', 'ISO-8859-1', 'UTF-8') AS u8,
                transcode(encode('café', 'UTF-8'), 'UTF-8', 'ISO-8859-1') AS l1,
                decode(transcode(X'636166E9', 'ISO-8859-1', 'UTF-8'), 'UTF-8') AS s
      """).collect().head
    assert(r.getAs[Array[Byte]](0).toSeq ===
      "café".getBytes("UTF-8").toSeq)
    assert(r.getAs[Array[Byte]](1).toSeq ===
      Seq[Byte]('c', 'a', 'f', 0xe9.toByte))
    assert(r.getString(2) === "café")
  }
}
