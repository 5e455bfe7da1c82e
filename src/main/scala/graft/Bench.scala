package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints per-query timings plus ONE headline JSON line.
  *
  * Output contract (driver log-tail capture truncates the FRONT of long
  * lines, and may keep only the last lines):
  *   line 1: {"bench_q_1of2":{"q01":[spark,oracle],...}}
  *   line 2: {"bench_q_2of2":{...}}
  *   line 3: {"errs":{only failures},"oracle_failed":[...],
  *            "baseline_only":[...],"baseline_total":B,"sf":...,
  *            "oracle_total":...,"ratio":...,
  *            "metric":"total","value":N,"unit":"sec"}
  * The per-query map — qNN keys, 2-decimal [spark, oracle] second pairs
  * so a slow query is attributable to engine vs environment in one
  * read — travels on its own two lines AHEAD of the headline; the
  * headline line itself stays short enough to always parse, with
  * metric/value LAST so the total survives front-truncation regardless.
  *
  * q70/q72 are brute-force oracle anchors for the hash-checked pruned
  * tiers (q95/q97) — `baseline_only`: timed and reported, but excluded
  * from the headline total and the ratio, which reflect the production
  * paths the engine would actually run at scale.
  *
  * When python3+duckdb are present (driver machines), the DuckDB oracle
  * for every SQL-expressible query runs in the SAME process epoch, so
  * the spark/duck ratio — the acceptance signal — is computed
  * intra-epoch and thermal drift cancels. Oracle failures are NOT
  * swallowed: failed names are listed in `oracle_failed` and excluded
  * from BOTH sides of the ratio, keeping the query sets matched.
  * Disable with SPARK_GRAFT_ORACLE=0; absence of python/duckdb
  * degrades to null. */
object Bench {
  /** Quadratic brute baselines kept as the oracle anchors for the
    * hash-proven pruned twins (q95/q97) — never the production path. */
  private val BaselineOnly = Set("q70_knn_brute", "q72_cosine_pairs")

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
    // errs carries ONLY failing queries — the all-null map doubled the
    // r6 line length and pushed the timings map off the captured tail.
    val errs = results.collect { case (k, (_, Some(e))) =>
      s"\"" + k + "\":" + jstr(e.take(200))
    }.mkString("{", ",", "}")

    val (oracleTimes, oracleFailed) = runOracle(sfDir)

    // like-for-like set for the ratio: oracle succeeded, spark
    // succeeded, and not a baseline-only anchor — matched on BOTH sides
    val lfl = SparkEntry.oracleSql.keySet
      .filter(oracleTimes.contains)
      .filter(k => results.get(k).exists(_._2.isEmpty))
      .diff(BaselineOnly)
    val oracleTotal: Option[Double] =
      if (oracleTimes.isEmpty) None else Some(lfl.toSeq.map(oracleTimes).sum)
    val sparkLfl = lfl.toSeq.flatMap(k => results.get(k).map(_._1)).sum
    val ratio = oracleTotal.filter(_ > 0).map(t => sparkLfl / t)

    val total = results.collect {
      case (k, (v, _)) if !BaselineOnly.contains(k) => v }.sum
    val baselineTotal = results.collect {
      case (k, (v, _)) if BaselineOnly.contains(k) => v }.sum

    // per-query map: qNN keys, 2-decimal [spark, oracle] pairs, split
    // across two lines so each stays well inside the tail window
    def r2(v: Double): String = (math.round(v * 100) / 100.0).toString
    val perQ = results.toSeq.sortBy(_._1).map { case (name, (t, _)) =>
      val key = name.takeWhile(_ != '_')
      val o = oracleTimes.get(name).map(r2).getOrElse("null")
      s""""$key":[${r2(t)},$o]"""
    }
    val (h1, h2) = perQ.splitAt((perQ.size + 1) / 2)
    println(s"""{"bench_q_1of2":${h1.mkString("{", ",", "}")}}""")
    println(s"""{"bench_q_2of2":${h2.mkString("{", ",", "}")}}""")

    val oracleJson = oracleTotal.fold("null")(t => r2(t))
    val ratioJson = ratio.fold("null")(r => (math.round(r * 1000) / 1e3).toString)
    val failedJson = oracleFailed.sorted
      .map(n => "\"" + n.takeWhile(_ != '_') + "\"").mkString("[", ",", "]")
    val baselineJson = BaselineOnly.toSeq.sorted
      .map(n => "\"" + n.takeWhile(_ != '_') + "\"").mkString("[", ",", "]")
    // headline fields LAST: log-tail capture truncates the FRONT of
    // long lines, and the total must survive truncation
    println(s"""{"errs":$errs,"oracle_failed":$failedJson,"baseline_only":$baselineJson,"baseline_total":${r2(baselineTotal)},"sf":"$sfDir","oracle_total":$oracleJson,"ratio":$ratioJson,"metric":"total","value":${r2(total)},"unit":"sec"}""")
    spark.stop()
    if (results.values.exists(_._2.isDefined)) sys.exit(1)
  }

  /** Intra-epoch DuckDB oracle: PER-QUERY seconds over every oracleSql
    * entry plus the names that failed. Whole-process comparisons across
    * rounds drift with machine thermals; running both sides back-to-back
    * makes the ratio the stable signal, and per-query oracle times make
    * an anomalous epoch attributable in one read. */
  private def runOracle(sfDir: String): (Map[String, Double], Seq[String]) = {
    if (sys.env.get("SPARK_GRAFT_ORACLE").contains("0"))
      return (Map.empty, Nil)
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
          |for name in sorted(sqls):
          |    t0 = time.time()
          |    try:
          |        con.execute(sqls[name]).fetchall()
          |        print("ORACLE_Q %s=%.3f" % (name, time.time() - t0))
          |    except Exception:
          |        print("ORACLE_ERR %s" % name)
          |print("ORACLE_DONE")
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
        while (l != null) { lines.synchronized(lines += l); l = outReader.readLine() }
      })
      drain.setDaemon(true); drain.start()
      val done = proc.waitFor(1200, java.util.concurrent.TimeUnit.SECONDS)
      if (!done) { proc.destroyForcibly(); return (Map.empty, Nil) }
      drain.join(5000)
      val snap = lines.synchronized(lines.toVector)
      if (!snap.contains("ORACLE_DONE")) return (Map.empty, Nil)
      val times = snap.collect {
        case l if l.startsWith("ORACLE_Q ") =>
          val Array(n, t) = l.stripPrefix("ORACLE_Q ").split("=", 2)
          n -> t.toDouble
      }.toMap
      val failed = snap.collect {
        case l if l.startsWith("ORACLE_ERR ") => l.stripPrefix("ORACLE_ERR ")
      }
      (times, failed.toSeq)
    } catch { case _: Throwable => (Map.empty, Nil) }
  }
}
