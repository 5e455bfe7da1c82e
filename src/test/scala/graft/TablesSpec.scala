package graft

import org.apache.spark.sql.functions._

/** The `events.ts` load-boundary contract: the driver has regenerated
  * that column under different physical spellings across rounds (raw
  * INT64 nanos; annotated timestamp[us] with and without tz), and
  * every consumer assumes epoch-nanos long. [[Tables.load]] must fold
  * ALL spellings to identical nanos — this spec writes the same
  * instants in each spelling and diffs the loaded values, so the next
  * fixture flip fails HERE with a named contract instead of as seven
  * analysis errors in the query smoke.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val micros: Seq[Long] = Seq(
    0L, 1L, 999999L, 1700000000000000L, 1767225600123456L)

  test("events.ts spellings all load as the same epoch nanos") {
    val base = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us")

    def loadTs(dir: java.nio.file.Path): Seq[(Long, Long)] =
      Tables.load(spark, dir.toString, "events")
        .select(col("event_id"), col("ts"))
        .as[(Long, Long)].collect().toSeq.sortBy(_._1)

    // spelling 1: raw long nanos (the nanosAsLong-era shape)
    val dLong = tmpDir("ts_long")
    base.select(col("event_id"), (col("us") * 1000L).as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dLong/events.parquet")

    // spelling 2: timestamp_ntz (annotated µs, isAdjustedToUTC=false)
    val dNtz = tmpDir("ts_ntz")
    base.select(col("event_id"),
        expr("timestampadd(MICROSECOND, us, TIMESTAMP_NTZ '1970-01-01 00:00:00')").as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dNtz/events.parquet")

    // spelling 3: timestamp (instant, isAdjustedToUTC=true)
    val dLtz = tmpDir("ts_ltz")
    base.select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dLtz/events.parquet")

    val expected = micros.zipWithIndex.map { case (us, i) => (i.toLong, us * 1000L) }
    assert(loadTs(dLong) === expected, "raw-long spelling")
    assert(loadTs(dNtz) === expected, "timestamp_ntz spelling")
    assert(loadTs(dLtz) === expected, "timestamp (instant) spelling")
  }
}
