package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming surplus beyond the reference (SURVEY §2.C note): streaming
  * deduplication bounded by watermark, and a stream-stream interval
  * join with watermarks on both sides — the two stateful shapes a
  * continuous training-data ingest pipeline needs (exactly-once dedup
  * of re-delivered documents; joining documents to late-arriving
  * quality signals). State stays bounded because the watermark expires
  * keys/rows older than the lateness budget — the property that makes
  * these runnable forever on an unbounded 100 TB/day feed.
  */
class StreamingJoinDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("tsm", TimestampType),
    StructField("payload", StringType)))

  test("dropDuplicatesWithinWatermark dedups re-delivered rows") {
    val src = tmpDir("dedup_src")
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // every doc delivered twice (a retry storm), duplicates within the
    // 10-minute lateness budget
    val rows = (0 until 100).flatMap { i =>
      val t = new java.sql.Timestamp(base + i * 30_000L)
      val t2 = new java.sql.Timestamp(base + i * 30_000L + 5_000L)
      Seq((i.toLong, t, s"doc$i"), (i.toLong, t2, s"doc$i"))
    }
    rows.toDF("doc_id", "tsm", "payload").repartition(4)
      .write.mode("append").parquet(src.toString + "/chunk")

    val q = spark.readStream.schema(docSchema).parquet(src.toString + "/*")
      .withWatermark("tsm", "10 minutes")
      .dropDuplicatesWithinWatermark("doc_id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val out = spark.table("dedup_out")
    assert(out.count() === 100)
    assert(out.select(countDistinct(col("doc_id"))).as[Long].head() === 100)
  }

  test("stream-stream interval join with watermarks matches batch join") {
    val docDir = tmpDir("ssj_docs"); val sigDir = tmpDir("ssj_sigs")
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val docs = (0 until 60).map(i =>
      (i.toLong, new java.sql.Timestamp(base + i * 60_000L), s"doc$i"))
    // signal arrives 0–2 minutes after its doc; every 3rd doc unsignaled
    val sigs = (0 until 60).filter(_ % 3 != 0).map(i =>
      (i.toLong, new java.sql.Timestamp(base + i * 60_000L + (i % 3) * 60_000L),
        i * 0.5))
    docs.toDF("doc_id", "d_ts", "payload")
      .write.mode("append").parquet(docDir.toString + "/chunk")
    sigs.toDF("doc_id", "s_ts", "score")
      .write.mode("append").parquet(sigDir.toString + "/chunk")

    val sigSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("s_ts", TimestampType),
      StructField("score", DoubleType)))
    val dSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("d_ts", TimestampType),
      StructField("payload", StringType)))
    val dStream = spark.readStream.schema(dSchema)
      .parquet(docDir.toString + "/*").withWatermark("d_ts", "5 minutes")
    val sStream = spark.readStream.schema(sigSchema)
      .parquet(sigDir.toString + "/*").withWatermark("s_ts", "5 minutes")
    val dRen = dStream.withColumnRenamed("doc_id", "d_id")
    val j2 = dRen.join(sStream,
      col("d_id") === col("doc_id") &&
        col("s_ts") >= col("d_ts") &&
        col("s_ts") <= col("d_ts") + expr("INTERVAL 5 MINUTES"), "inner")
    val q = j2.select(col("d_id"), col("payload"), col("score"))
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("ssj_out").orderBy("d_id")
      .as[(Long, String, Double)].collect()
    val batch = docs.toDF("d_id", "d_ts", "payload")
      .join(sigs.toDF("doc_id", "s_ts", "score"),
        col("d_id") === col("doc_id") &&
          col("s_ts") >= col("d_ts") &&
          col("s_ts") <= col("d_ts") + expr("INTERVAL 5 MINUTES"))
      .select(col("d_id"), col("payload"), col("score"))
      .orderBy("d_id").as[(Long, String, Double)].collect()
    assert(streamed === batch)
    assert(streamed.length === sigs.length)
  }
}
