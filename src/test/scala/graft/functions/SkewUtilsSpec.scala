package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewUtilsSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one key — the skew shape
  private def skewed() = (1 to 2000).map { i =>
    (if (i % 10 == 0) s"key${i % 7}" else "hot", i % 40, i.toLong)
  }.toDF("k", "v", "n")

  test("salted sum equals direct sum") {
    val direct = skewed().groupBy("k").agg(sum($"n").as("s"))
      .orderBy("k").as[(String, Long)].collect()
    val salted = SkewUtils.saltedSum(skewed(), Seq("k"), $"n", "s")
      .orderBy("k").as[(String, Long)].collect()
    assert(salted === direct)
  }

  test("salted count-distinct equals direct count-distinct") {
    val direct = skewed().groupBy("k").agg(countDistinct($"v").as("d"))
      .orderBy("k").as[(String, Long)].collect()
    val salted = SkewUtils.saltedCountDistinct(skewed(), Seq("k"), $"v", "d")
      .orderBy("k").as[(String, Long)].collect()
    assert(salted === direct)
  }
}
