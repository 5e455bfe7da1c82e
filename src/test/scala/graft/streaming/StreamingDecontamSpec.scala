package graft.streaming

import graft.SparkSpec
import graft.operators.Operators
import graft.storage.GraftTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming decontamination against EVOLVING eval-set state — the
  * round-8 wire-up of the incremental bloom pieces: corpus batches
  * stream through `foreachBatch`, each probing the sketch AS OF its
  * processing time (fresh read of the persisted state row), with the
  * exact verify join removing sketch false positives. Eval batches
  * merge into the state BETWEEN micro-batch runs; the checkpoint makes
  * the two runs one logical stream. */
class StreamingDecontamSpec extends SparkSpec {
  import spark.implicits._
  graft.functions.GraftFunctions.register(spark)

  private val cap = 10000L

  test("batches probe the sketch as of their processing time") {
    val srcDir = tmpDir("sdc_src")
    val ckpt = tmpDir("sdc_ckpt")
    val stateT = GraftTable.create(spark, tmpDir("sdc_state"),
      StructType(Seq(StructField("id", IntegerType),
        StructField("sketch", BinaryType))), Seq("id"))
    val evalT = GraftTable.create(spark, tmpDir("sdc_eval"),
      StructType(Seq(StructField("g", StringType))), Nil)
    val outT = GraftTable.create(spark, tmpDir("sdc_out"),
      StructType(Seq(StructField("doc_id", LongType))), Nil)

    def mergeEval(grams: Seq[String]): Unit = {
      val s = Operators.bloomSketch(grams.toDF("g"), "g", cap)
      val prev = stateT.read().collect().headOption
        .map(_.getAs[Array[Byte]]("sketch"))
      stateT.replaceRows(Seq((1, prev.fold(s)(Operators.bloomMerge(_, s))))
        .toDF("id", "sketch"))
      evalT.insert(grams.toDF("g"))
    }

    def runStream(): Unit = {
      val q = spark.readStream
        .schema(StructType(Seq(StructField("doc_id", LongType),
          StructField("g", StringType))))
        .parquet(srcDir.toString + "/*")
        .writeStream
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val sketch = stateT.read().collect().head.getAs[Array[Byte]]("sketch")
          // sketch prefilter (no false negatives) → exact verify join
          val contaminated = Operators
            .bloomPrefilterWith(batch, "g", sketch)
            .join(evalT.read(), Seq("g"), "left_semi")
            .select(col("doc_id")).distinct()
          outT.insert(batch.select(col("doc_id")).distinct()
            .except(contaminated).toDF("doc_id"))
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // eval batch 1, then corpus chunk 1: docs 1 (hits e1) and 2 (hits
    // NOTHING yet — its gram only joins eval batch 2, which has not
    // arrived), and 3 (clean forever)
    mergeEval(Seq("e1_a", "e1_b"))
    Seq((1L, "e1_a"), (1L, "x1"), (2L, "e2_a"), (3L, "clean_a"))
      .toDF("doc_id", "g")
      .write.mode("append").parquet(srcDir.toString + "/chunk1")
    runStream()
    assert(outT.read().as[Long].collect().toSet === Set(2L, 3L),
      "chunk1: only the doc sharing an ALREADY-ARRIVED eval gram drops")

    // eval batch 2 merges in; corpus chunk 2 streams against the union
    mergeEval(Seq("e2_a", "e2_b"))
    Seq((4L, "e2_b"), (5L, "e1_b"), (6L, "clean_b"))
      .toDF("doc_id", "g")
      .write.mode("append").parquet(srcDir.toString + "/chunk2")
    runStream()
    assert(outT.read().as[Long].collect().toSet === Set(2L, 3L, 6L),
      "chunk2 probes the MERGED sketch: both eval batches contaminate")
  }
}
