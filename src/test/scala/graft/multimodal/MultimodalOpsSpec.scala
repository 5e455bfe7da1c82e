package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalOpsSpec extends SparkSpec {
  import MultimodalOps._

  test("synthetic corpus has the media schema and is deterministic") {
    val m1 = synthesize(spark, 30).collect().sortBy(_.media_id)
    val m2 = synthesize(spark, 30).collect().sortBy(_.media_id)
    assert(m1.map(_.media_id).toSeq === (0L until 30L))
    assert(m1.map(_.bytes.toSeq) === m2.map(_.bytes.toSeq)) // deterministic
    val df = synthesize(spark, 10).toDF()
    assert(df.schema.fieldNames === Array("media_id", "kind", "bytes", "meta"))
    assert(df.schema("bytes").dataType.typeName === "binary")
    assert(df.schema("meta").dataType.typeName === "struct")
  }

  test("feature extraction: fixed-size vectors, one per media row") {
    val media = synthesize(spark, 60).repartition(4)
    val feats = extractFeatures(media)
    assert(feats.count() === 60)
    val f = feats.collect()
    assert(f.forall(_.features.length === 8))
    // deterministic across runs
    val f2 = extractFeatures(synthesize(spark, 60).repartition(2)).collect()
    assert(f.sortBy(_.media_id).map(_.features.toSeq)
      === f2.sortBy(_.media_id).map(_.features.toSeq))
  }

  test("partitioning is preserved through the batch operator (no shuffle)") {
    val media = synthesize(spark, 40).repartition(5)
    assert(extractFeatures(media).rdd.getNumPartitions === 5)
  }

  test("resize updates bytes and metadata for images only") {
    val media = synthesize(spark, 30)
    val resized = resizeImages(media, 32, 32).collect()
    resized.filter(_.kind == "image").foreach { m =>
      assert(m.meta.width === 32 && m.meta.height === 32)
    }
    val untouched = media.filter(_.kind != "image").collect()
    val after = resized.filter(_.kind != "image").sortBy(_.media_id)
    assert(untouched.sortBy(_.media_id).map(_.bytes.toSeq).toSeq
      === after.map(_.bytes.toSeq).toSeq)
  }

  test("frame sampling explodes videos by stride") {
    val media = synthesize(spark, 30)
    val frames = sampleFrames(media, 2).collect()
    val videos = media.filter(_.kind == "video").collect()
    val expected = videos.map(v => (v.meta.nFrames + 1) / 2).sum
    assert(frames.length === expected)
    assert(frames.forall(_.frame_idx % 2 == 0))
  }
}
