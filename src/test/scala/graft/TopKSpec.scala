package graft

import graft.functions.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[graft.functions.TopK]] — the bounded-state per-group top-k
  * aggregator must return EXACTLY the rows of the window formulation
  * (`row_number() OVER (PARTITION BY g ORDER BY score DESC, id)` then
  * `rank <= k`), independent of partitioning, including under score
  * ties and groups smaller than k. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random data: 7 groups × ~200 rows, scores from
  // a hash (collisions included on purpose: score = h % 50 ties often)
  private lazy val data = {
    val rows = for (i <- 0L until 1400L) yield {
      val g = (i * 2654435761L % 7).toInt
      val score = ((i * 40503L + 1299721L) % 50).toDouble / 7.0
      (g, score, i)
    }
    rows.toDF("g", "score", "id")
  }

  private def windowed(k: Int) = {
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    data.withColumn("rank", row_number().over(w)).filter($"rank" <= k)
      .select($"g", $"id", $"score", $"rank")
  }

  private def aggregated(k: Int, partitions: Int) = {
    val tk = TopK.topk(k)
    data.repartition(partitions)
      .groupBy($"g").agg(tk($"score", $"id").as("tk"))
      .select($"g", posexplode($"tk").as(Seq("p", "s")))
      .select($"g", $"s.id".as("id"), $"s.score".as("score"),
        ($"p" + 1).as("rank"))
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy($"g", $"rank").as[(Int, Long, Double, Int)].collect()

  test("equals the window formulation across partitionings and k") {
    for (k <- Seq(1, 5, 19); parts <- Seq(1, 4, 13)) {
      assert(sortedRows(aggregated(k, parts)) === sortedRows(windowed(k)),
        s"k=$k partitions=$parts")
    }
  }

  test("groups smaller than k return all rows, still ordered") {
    val small = Seq((1, 3.0, 10L), (1, 9.0, 11L), (2, 5.0, 12L)).toDF("g", "score", "id")
    val tk = TopK.topk(5)
    val out = small.groupBy($"g").agg(tk($"score", $"id").as("tk"))
      .select($"g", posexplode($"tk").as(Seq("p", "s")))
      .select($"g", $"s.id".as("id"), ($"p" + 1).as("rank"))
      .orderBy($"g", $"rank").as[(Int, Long, Int)].collect()
    assert(out === Array((1, 11L, 1), (1, 10L, 2), (2, 12L, 1)))
  }

  test("ties break by id ascending regardless of arrival order") {
    val tied = Seq((0, 1.0, 5L), (0, 1.0, 3L), (0, 1.0, 9L), (0, 1.0, 1L))
      .toDF("g", "score", "id").repartition(4)
    val tk = TopK.topk(2)
    val out = tied.groupBy($"g").agg(tk($"score", $"id").as("tk"))
      .select(posexplode($"tk").as(Seq("p", "s"))).select($"s.id")
      .as[Long].collect().sorted
    assert(out === Array(1L, 3L))
  }

  test("merge is associative at the unit level") {
    val agg = new TopK(3)
    def s(sc: Double, id: Long) = TopK.Scored(sc, id)
    val a = List(s(9, 1), s(7, 2), s(5, 3))
    val b = List(s(8, 0), s(7, 1), s(2, 9))
    val ab = agg.merge(a, b)
    assert(ab === List(s(9, 1), s(8, 0), s(7, 1)))
    // reduce respects capacity + tie order
    val r = Seq(s(5, 9), s(5, 2), s(9, 4), s(1, 1))
      .foldLeft(agg.zero)(agg.reduce)
    assert(r === List(s(9, 4), s(5, 2), s(5, 9)))
    assert(agg.merge(a, Nil) === a && agg.merge(Nil, b) === b)
  }
}
