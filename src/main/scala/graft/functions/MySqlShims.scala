package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MySQL-dialect function surface (SURVEY §2.B last row + §2.D):
  * the ~dozen MySQL-only names the reference gets from GMS/sqlglot
  * translation (`/root/reference/transpiler/translate.go:102`), plus
  * the reference's own macros (A29–A33,
  * `/root/reference/catalog/internal_macro.go:33-109`,
  * `/root/reference/myfunc/ps.go:21-51`).
  *
  * Everything maps onto codegen'd Spark built-ins — no UDF in any hot
  * path; the only Scala UDF is the session-id function (constant per
  * session, evaluated once per row trivially).
  */
object MySqlShims {

  /** MySQL date-format tokens → Spark datetime pattern. Literal runs
    * are quoted so pattern letters in the input stay literal. An
    * UNMAPPED %x token is an error, never a silently-quoted letter
    * ('%I:%i' rendering the literal text "I:05" is worse than
    * failing); weekday tokens (%a/%W → E/EEEE) are FORMAT-only —
    * Spark's parser rejects 'E' — so parse translation refuses them. */
  private[functions] def translateFormat(mysql: String,
      forParse: Boolean = false): String = {
    val map = Map(
      'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'c' -> "M", 'd' -> "dd",
      'e' -> "d", 'H' -> "HH", 'k' -> "H", 'h' -> "hh", 'l' -> "h",
      'i' -> "mm", 's' -> "ss", 'S' -> "ss", 'f' -> "SSSSSS",
      'p' -> "a", 'M' -> "MMMM", 'b' -> "MMM", 'a' -> "EEE", 'W' -> "EEEE",
      'j' -> "DDD", 'T' -> "HH:mm:ss", 'r' -> "hh:mm:ss a")
    val out = new StringBuilder
    val lit = new StringBuilder
    def flushLit(): Unit = if (lit.nonEmpty) {
      val s = lit.toString
      if (s.exists(_.isLetter) || s.contains("'"))
        out.append("'").append(s.replace("'", "''")).append("'")
      else out.append(s)
      lit.clear()
    }
    var i = 0
    while (i < mysql.length) {
      val c = mysql.charAt(i)
      if (c == '%' && i + 1 < mysql.length) {
        val t = mysql.charAt(i + 1)
        if (t == '%') lit.append('%')
        else map.get(t) match {
          case Some(_) if forParse && (t == 'a' || t == 'W') =>
            throw new IllegalArgumentException(
              s"%$t (weekday name) is format-only: Spark cannot PARSE " +
                "day-of-week patterns")
          case Some(p) => flushLit(); out.append(p)
          case None => throw new IllegalArgumentException(
            s"unsupported MySQL date-format token %$t")
        }
        i += 2
      } else { lit.append(c); i += 1 }
    }
    flushLit()
    out.toString
  }

  /** MySQL STR_TO_DATE(str, '%Y-%m-%d ...') → timestamp. */
  def strToDate(e: Column, mysqlFormat: String): Column =
    to_timestamp(e, translateFormat(mysqlFormat, forParse = true))

  /** MySQL DATE_FORMAT(ts, fmt). */
  def dateFormat(e: Column, mysqlFormat: String): Column =
    date_format(e, translateFormat(mysqlFormat))

  /** MySQL GROUP_CONCAT(x ORDER BY x SEPARATOR sep) — deterministic
    * (sorted) variant, as used throughout the query pack. Non-string
    * inputs coerce to string first (MySQL semantics; concat_ws alone
    * rejects them) — note the sort is then LEXICOGRAPHIC, as MySQL's
    * ORDER BY over the casted expression would be. */
  def groupConcat(e: Column, sep: String = ","): Column =
    concat_ws(sep, sort_array(collect_list(e.cast("string"))))

  /** MySQL SUBSTRING_INDEX — Spark ships it natively; re-exported for
    * the dialect layer's completeness. */
  def substringIndex(e: Column, delim: String, count: Int): Column =
    substring_index(e, delim, count)

  /** A32: `information_schema._pg_expandarray(a)` — unnest with
    * 1-based ordinality → rows (x, n). */
  def pgExpandArray(df: DataFrame, arrCol: String): DataFrame =
    df.select(df.columns.map(col) :+
      posexplode(col(arrCol)).as(Seq("__pos", "x")): _*)
      .withColumn("n", col("__pos") + 1).drop("__pos")

  /** Register the SQL-callable shims (A29–A31) into the session. */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{ArrayContains, StringSplit, Literal}
    val fr = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    // A30 __sys__.my_list_contains(list, v) — backs PG `= ANY(...)`
    fr.createOrReplaceTempFunction("my_list_contains",
      exprs => ArrayContains(exprs(0), exprs(1)), "built-in")
    // A31 __sys__.my_split_list_str(s) — regexp split to array
    fr.createOrReplaceTempFunction("my_split_list_str",
      exprs => StringSplit(exprs(0), Literal.create("[,;\\s]+"), Literal(-1)), "built-in")
    // A32 as SQL: information_schema._pg_expandarray(a) → array of
    // (x, n) structs — element with 1-based ordinality. PG's form is a
    // set-returning function; Spark's dialect reaches the rows via
    // `inline(_pg_expandarray(a))` or a LATERAL VIEW explode (the
    // PgCompat scaladoc documents the spelling difference). Composed
    // from codegen'd collection expressions, no UDF.
    fr.createOrReplaceTempFunction("_pg_expandarray", { exprs =>
      import org.apache.spark.sql.catalyst.expressions._
      val arr = exprs.head
      ArraysZip(Seq(arr, new Sequence(Literal(1), Size(arr), None, None)),
        Seq(Literal("x"), Literal("n")))
    }, "built-in")
    // A29 ps_current_thread_id() — connection/session id analog
    val sessionId = java.util.UUID.randomUUID().getLeastSignificantBits.abs
    spark.udf.register("ps_current_thread_id", () => sessionId)
  }

  /** Engine-bound MySQL session functions — the connect-time surface
    * every client touches (mysql CLI `\s`, Connector/J handshakes,
    * ORM id-grabs): `DATABASE()`/`SCHEMA()`, `CONNECTION_ID()`,
    * `LAST_INSERT_ID()`. Values resolve at PLAN time from the owning
    * engine; on a shared SparkSession the last-registered engine wins
    * (the ps_current_thread_id precedent — one engine per session in
    * any real deployment). */
  def registerSession(engine: graft.Engine): Unit = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val fr = engine.spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    fr.createOrReplaceTempFunction("database",
      _ => Literal(engine.currentDatabase), "built-in")
    fr.createOrReplaceTempFunction("schema",
      _ => Literal(engine.currentDatabase), "built-in")
    val connId = java.util.UUID.randomUUID().getLeastSignificantBits.abs
    fr.createOrReplaceTempFunction("connection_id",
      _ => Literal(connId), "built-in")
    // MySQL: the FIRST auto-assigned id of the most recent INSERT in
    // this session (0 before any); the router records it on the
    // auto-inc insert paths
    fr.createOrReplaceTempFunction("last_insert_id",
      _ => Literal(engine.getVar("last_insert_id")
        .map(_.toLong).getOrElse(0L)), "built-in")
    // VERSION(): every client banner reads it. Dialect-aware at
    // ANALYSIS time (the builder lambda re-evaluates per statement):
    // a pg-shaped session gets the PG spelling matching
    // server_version, everyone else MySQL's matching @@version —
    // shadowing Spark's own version() for engine-routed statements.
    fr.createOrReplaceTempFunction("version",
      _ => Literal(
        if (engine.sessionDialect.contains("pg"))
          "PostgreSQL 15.0 (graft), 64-bit"
        else "8.0.33"), "built-in")
  }
}
