package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints exactly one JSON line {"metric":...,"queries":{...}}.
  * A warmup query absorbs session/codegen init so per-query timings
  * are comparable to the DuckDB BASELINE. */
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
      val dt = (System.nanoTime() - t0) / 1e9
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
    val errs = results.map { case (k, (_, e)) =>
      s"\"" + k + "\":" + e.fold("null")(m => jstr(m.take(200)))
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    // headline fields LAST: log-tail capture truncates the FRONT of
    // long lines, and the total must survive truncation
    println(s"""{"queries":$qs,"errs":$errs,"sf":"$sfDir","metric":"total","value":$total,"unit":"sec"}""")
    spark.stop()
    if (results.values.exists(_._2.isDefined)) sys.exit(1)
  }
}
