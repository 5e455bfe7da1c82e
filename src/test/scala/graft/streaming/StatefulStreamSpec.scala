package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}

/** Custom per-key state via mapGroupsWithState — the Structured
  * Streaming extension surface the pipeline uses for stateful
  * transforms beyond windows (running per-user aggregates that survive
  * across micro-batches), plus streaming dedup with watermark.
  */
case class Ev(uid: Long, amount: Double)
case class UserTotal(uid: Long, n: Long, total: Double)

class StatefulStreamSpec extends SparkSpec {
  import spark.implicits._

  test("mapGroupsWithState keeps running per-user totals across batches") {
    val src = tmpDir("state_src")
    val ckpt = tmpDir("state_ckpt")
    Seq(Ev(1, 10.0), Ev(1, 5.0), Ev(2, 7.0)).toDS()
      .write.parquet(src.toString + "/b1")

    val latest = new java.util.concurrent.ConcurrentHashMap[Long, (Long, Double)]()
    def run(): Map[Long, (Long, Double)] = {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Ev]].schema)
        .parquet(src.toString + "/*")
        .as[Ev]
        .groupByKey(_.uid)
        .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
          (uid: Long, evs: Iterator[Ev], state: GroupState[UserTotal]) =>
            val prev = state.getOption.getOrElse(UserTotal(uid, 0L, 0.0))
            val batch = evs.toSeq
            val next = UserTotal(uid, prev.n + batch.size,
              prev.total + batch.map(_.amount).sum)
            state.update(next)
            next
        }
      val q = stream.writeStream
        .outputMode("update").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[UserTotal], _: Long) =>
          b.collect().foreach(u => latest.put(u.uid, (u.n, u.total)))
        }
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      latest.asScala.toMap
    }

    assert(run() === Map(1L -> (2L, 15.0), 2L -> (1L, 7.0)))
    // second batch: state persists through the checkpoint
    Seq(Ev(1, 1.0), Ev(3, 2.0)).toDS().write.parquet(src.toString + "/b2")
    val r2 = run()
    assert(r2(1L) === (3L, 16.0)) // accumulated across batches
    assert(r2(3L) === (1L, 2.0))
  }

  test("streaming dedup within watermark drops replayed event ids") {
    val src = tmpDir("dedup_src")
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = Seq((1L, new java.sql.Timestamp(base)),
      (2L, new java.sql.Timestamp(base + 1000)),
      (1L, new java.sql.Timestamp(base + 2000)), // duplicate id replay
      (3L, new java.sql.Timestamp(base + 3000)))
    rows.toDF("event_id", "tsm").write.parquet(src.toString + "/b1")
    val q = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("tsm",
          org.apache.spark.sql.types.TimestampType))))
      .parquet(src.toString + "/*")
      .withWatermark("tsm", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("deduped").select("event_id")
      .as[Long].collect().sorted === Array(1L, 2L, 3L))
  }
}
