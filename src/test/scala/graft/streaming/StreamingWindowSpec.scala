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
}
