package graft.functions

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish: key i appears ~N/i times
  private def corpus(n: Int): Seq[String] =
    (1 to 20).flatMap(i => Seq.fill(n / i)(s"k$i"))

  test("Misra-Gries finds every key above n/k with bounded error") {
    val data = corpus(1000)
    val n = data.size
    val k = 8
    val ds = spark.createDataset(scala.util.Random.shuffle(data)).repartition(7)
    val sketch = ds.select(new HeavyHitters(k).toColumn_).head()
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // guarantee 1: every key with freq > n/k is present
    exact.filter(_._2 > n / k).keys.foreach { key =>
      assert(sketch.contains(key), s"$key missing from sketch $sketch")
    }
    // guarantee 2: estimates within n/k of truth
    sketch.foreach { case (key, est) =>
      assert(est <= exact(key), s"$key overestimated")
      assert(exact(key) - est <= n / k, s"$key error too large")
    }
    assert(sketch.size <= k)
  }

  test("sketch is mergeable across partitionings (same guarantees)") {
    val data = corpus(400)
    val s1 = spark.createDataset(data).repartition(1)
      .select(new HeavyHitters(5).toColumn_).head()
    val s13 = spark.createDataset(data).repartition(13)
      .select(new HeavyHitters(5).toColumn_).head()
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    Seq(s1, s13).foreach { sk =>
      exact.filter(_._2 > data.size / 5).keys.foreach(key => assert(sk.contains(key)))
      sk.foreach { case (key, est) => assert(est <= exact(key)) }
    }
  }
}
