package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Event-time windowed aggregation with watermark over a file stream —
  * the Structured Streaming surplus surface (SURVEY §2.C note) the
  * LLM-pipeline extensions rely on. Asserts the streaming result equals
  * the batch formulation on the same data.
  */
class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  test("windowed counts with watermark match the batch aggregation") {
    val src = tmpDir("win_src")
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (0 until 300).map { i =>
      (new java.sql.Timestamp(base + i * 60_000L), if (i % 3 == 0) "click" else "view", i.toDouble)
    }
    rows.toDF("tsm", "event_type", "value").repartition(3)
      .write.mode("append").parquet(src.toString + "/chunk")

    val schema = StructType(Seq(
      StructField("tsm", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val stream = spark.readStream.schema(schema).parquet(src.toString + "/*")
      .withWatermark("tsm", "10 minutes")
      .groupBy(window(col("tsm"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream
      .format("memory").queryName("win_agg")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("win_agg")
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .orderBy("ws", "event_type")
      .as[(java.sql.Timestamp, String, Long)].collect()
    val batch = rows.toDF("tsm", "event_type", "value")
      .groupBy(window(col("tsm"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .orderBy("ws", "event_type")
      .as[(java.sql.Timestamp, String, Long)].collect()
    assert(streamed === batch)
    assert(streamed.length === 5 * 2) // 300 minutes → 5 windows × 2 types
  }

  test("session_window groups stream events by 15-minute inactivity gaps") {
    val src = tmpDir("sess_src")
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // two bursts per user separated by a >15-minute gap
    val rows = Seq(0L, 1L, 2L, 60L, 61L).flatMap { m =>
      Seq(("u1", new java.sql.Timestamp(base + m * 60_000L)),
        ("u2", new java.sql.Timestamp(base + (m + 3) * 60_000L)))
    }
    rows.toDF("uid", "tsm").write.mode("append").parquet(src.toString + "/c")

    val schema = StructType(Seq(
      StructField("uid", StringType), StructField("tsm", TimestampType)))
    val q = spark.readStream.schema(schema).parquet(src.toString + "/*")
      .withWatermark("tsm", "5 minutes")
      .groupBy(session_window(col("tsm"), "15 minutes"), col("uid"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("sess_agg")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val out = spark.table("sess_agg")
      .select(col("uid"), col("n")).orderBy("uid", "n")
      .as[(String, Long)].collect()
    // each user: one 3-event burst and one 2-event burst
    assert(out === Array(("u1", 2L), ("u1", 3L), ("u2", 2L), ("u2", 3L)))
  }
}
