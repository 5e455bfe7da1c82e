package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Session configs every entry point needs. `nanosAsLong` lets Spark
    * read the events table's INT64(TIMESTAMP_NANOS) column as raw nanos
    * (queries then treat it as a log position, the analog of the
    * reference's LSN/GTID ordering). */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    graft.functions.GraftFunctions.register(spark)
    graft.functions.MySqlShims.register(spark)
    spark
  }

  /** Every implemented operator, with its oracle where SQL-expressible. */
  def all: Seq[QueryDef] =
    RelationalQueries.defs ++ ExtendedQueries.defs ++ TextQueries.defs ++
      DedupQueries.defs ++ SimilarityQueries.defs ++ CdcQueries.defs ++
      EventQueries.defs ++ PipelineQueries.defs ++ CurationQueries.defs ++
      DiagQueries.defs // qx-prefixed driver-gate diagnostics (r15)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    configure(spark)
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> { (s: SparkSession, dir: String) =>
      configure(s); d.fn(s, dir)
    }).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracleSql.map(o => d.name -> o.linesIterator.map(_.trim).mkString(" "))).toMap
}
