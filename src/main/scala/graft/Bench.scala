package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints per-query timings plus ONE headline JSON line.
  *
  * Output contract (driver log-tail capture truncates the FRONT of long
  * lines, and may keep only the last line):
  *   line 1: {"queries":{...ms-rounded...},"errs":{only failures}}
  *   line 2: {"queries":{...},"errs":{...},"sf":...,"oracle_total":...,
  *            "ratio":...,"metric":"total","value":N,"unit":"sec"}
  * The headline line repeats the per-query map (normally short enough to
  * survive: times are ms-rounded and errs is {} unless something failed)
  * and keeps metric/value LAST so the total survives front-truncation
  * even when the map does not. Line 1 is the redundant copy for diffing.
  *
  * When python3+duckdb are present (driver machines), the DuckDB oracle
  * for every SQL-expressible query runs in the SAME process epoch, so
  * the spark/duck ratio — the acceptance signal — is computed
  * intra-epoch and thermal drift cancels. Disable with
  * SPARK_GRAFT_ORACLE=0; absence of python/duckdb degrades to null. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.configure(spark)
    // noop sink: forces FULL evaluation of every output column —
    // count() would let Catalyst prune projections (and drop sorts),
    // under-measuring vs the oracle baseline which materializes rows.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // Drop state a query may leave behind (cached frames, the
    // localCheckpoint blocks iterative operators pin) so one query's
    // storage residue never steals execution memory from the next —
    // each timing measures that query alone.
    def reset(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // Warm through DISTINCT plan shapes (scan+agg, shuffle join, window)
    // — one warmup query leaves the others' codegen/exchange/sort paths
    // cold and the first measured query of that shape absorbs the JIT
    // cost (r5 bench showed q01 at 9.5s when measured cold vs 1.0s warm).
    Seq("q01_pricing_summary", "q02_revenue_by_nation", "q11_window_rank")
      .foreach { name =>
        try run(SparkEntry.queries(name))
        catch { case _: Throwable => () } // warmup only
        reset()
      }
    // A failing query must be VISIBLE: record its error string and exit
    // non-zero, so a regression can't masquerade as a near-zero "speedup".
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err: Option[String] =
        try { run(fn); None }
        catch { case e: Throwable => Some(Option(e.getMessage).getOrElse(e.getClass.getName)) }
      val dt = math.round((System.nanoTime() - t0) / 1e6) / 1e3 // ms precision
      reset()
      name -> (dt, err)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case '\r' => "\\r"; case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, (v, _)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // errs carries ONLY failing queries — the all-null map doubled the
    // r6 line length and pushed the timings map off the captured tail.
    val errs = results.collect { case (k, (_, Some(e))) =>
      s"\"" + k + "\":" + jstr(e.take(200))
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    val (oracleTotal, ratio) = runOracle(sfDir, results)
    val oracleJson = oracleTotal.fold("null")(t => (math.round(t * 1000) / 1e3).toString)
    val ratioJson = ratio.fold("null")(r => (math.round(r * 1000) / 1e3).toString)
    println(s"""{"queries":$qs,"errs":$errs}""")
    // headline fields LAST: log-tail capture truncates the FRONT of
    // long lines, and the total must survive truncation
    println(s"""{"queries":$qs,"errs":$errs,"sf":"$sfDir","oracle_total":$oracleJson,"ratio":$ratioJson,"metric":"total","value":$total,"unit":"sec"}""")
    spark.stop()
    if (results.values.exists(_._2.isDefined)) sys.exit(1)
  }

  /** Intra-epoch DuckDB oracle: total seconds over every oracleSql entry,
    * plus ratio = (spark time over the SAME queries) / oracle total.
    * Whole-process comparisons across rounds drift with machine thermals;
    * running both sides back-to-back makes the ratio the stable signal. */
  private def runOracle(
      sfDir: String,
      sparkTimes: Map[String, (Double, Option[String])]): (Option[Double], Option[Double]) = {
    if (sys.env.get("SPARK_GRAFT_ORACLE").contains("0")) return (None, None)
    try {
      val sqls = SparkEntry.oracleSql
      val tmp = java.io.File.createTempFile("oracle_sql", ".json")
      tmp.deleteOnExit()
      val body = sqls.toSeq.sortBy(_._1).map { case (k, v) =>
        def esc(s: String) = s.flatMap {
          case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => " "
          case '\r' => " "; case '\t' => " "; case c => c.toString
        }
        "\"" + k + "\":\"" + esc(v) + "\""
      }.mkString("{", ",", "}")
      java.nio.file.Files.write(tmp.toPath, body.getBytes("UTF-8"))
      val script =
        """import duckdb, json, sys, time
          |sqls = json.load(open(sys.argv[1])); sf = sys.argv[2]
          |con = duckdb.connect(); con.execute("PRAGMA threads=%s" % sys.argv[3])
          |for t in ["region","nation","customer","supplier","part","orders",
          |          "lineitem","events","documents","embeddings"]:
          |    con.execute("CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')" % (t, sf, t))
          |tot = 0.0
          |for name in sorted(sqls):
          |    t0 = time.time()
          |    try:
          |        con.execute(sqls[name]).fetchall(); tot += time.time() - t0
          |    except Exception:
          |        pass
          |print("ORACLE_TOTAL=%.3f" % tot)
          |""".stripMargin
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
      val pb = new ProcessBuilder("python3", "-c", script, tmp.getAbsolutePath, sfDir, cpus)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val outReader = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      val lines = scala.collection.mutable.ArrayBuffer.empty[String]
      val drain = new Thread(() => {
        var l = outReader.readLine()
        while (l != null) { lines += l; l = outReader.readLine() }
      })
      drain.setDaemon(true); drain.start()
      val done = proc.waitFor(1200, java.util.concurrent.TimeUnit.SECONDS)
      if (!done) { proc.destroyForcibly(); return (None, None) }
      drain.join(5000)
      val tot = lines.reverseIterator
        .collectFirst { case l if l.startsWith("ORACLE_TOTAL=") =>
          l.stripPrefix("ORACLE_TOTAL=").toDouble }
      val sparkLfl = sqls.keys.flatMap(k => sparkTimes.get(k).map(_._1)).sum
      (tot, tot.filter(_ > 0).map(t => sparkLfl / t))
    } catch { case _: Throwable => (None, None) }
  }
}
