package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registration of the driver-provided parquet tables as temp views.
  *
  * Schemas are discovered from the parquet footers at bootstrap
  * (FIXTURES.md §1) — never hand-declared. This mirrors the reference's
  * catalog bootstrap (`/root/reference/catalog/provider.go:108-240`) in
  * spirit: tables become queryable relations in a session catalog; here
  * Catalyst's analyzer resolves them, no custom resolution code needed.
  *
  * Scale note: `spark.read.parquet` on a directory of files partitions by
  * file/row-group automatically; at 100 TB these would be
  * `spark.read.parquet("s3a://bucket/table/")` with partition discovery —
  * the registration code is unchanged.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  // Parquet footer schemas cached per path: repeated query invocations
  // (Bench/Verify run ~50) skip the driver-side footer fetch.
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val cached = schemaCache.get(path)
    val df =
      if (cached != null) spark.read.schema(cached).parquet(path)
      else {
        val d = spark.read.parquet(path)
        schemaCache.putIfAbsent(path, d.schema)
        d
      }
    if (name == "events") normalizeEventTs(df) else df
  }

  /** The engine's contract is `events.ts` = INT64 epoch NANOS (the log
    * position, the analog of the reference's LSN/GTID ordering —
    * SURVEY §2.C). The driver has generated that column both as raw
    * INT64(TIMESTAMP_NANOS) (read as long under `nanosAsLong`) and as
    * annotated timestamp[us]; fold the timestamp spellings back to
    * nanos here so every consumer sees one type. The NTZ arm diffs
    * against the epoch IN NTZ SPACE — no session-timezone dependence. */
  private def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) => df.withColumn("ts",
        org.apache.spark.sql.functions.expr(
          "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000L"))
      case Some(TimestampType) => df.withColumn("ts",
        org.apache.spark.sql.functions.expr("unix_micros(ts) * 1000L"))
      case _ => df
    }
  }

  /** Register every driver table under `sfDir` as a temp view (idempotent). */
  def register(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}

/** One verifiable operator: a Spark implementation plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle query over
  * the same parquet tables. Column names/aliases MUST match between the
  * two — the driver's comparator sorts columns by name before hashing.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracleSql: Option[String])
