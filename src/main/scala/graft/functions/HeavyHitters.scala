package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` — the
  * custom-aggregate extension surface of SURVEY §2.D (the reference has
  * none of its own; this is the sketch-style aggregate the plan
  * reserves the slot for).
  *
  * Guarantee: any key with true frequency > n/k appears in the result,
  * and every reported estimate is within n/k of the true count, where n
  * is the stream length — independent of input order or partitioning.
  * The buffer is a bounded map of ≤ k counters, merged associatively
  * (merge = counter sum + (k+1)-th-largest decrement), so Spark runs it
  * as a partial aggregation with map-side combine: O(k) state per
  * partition, one shuffle of sketches, never of rows.
  */
class HeavyHitters(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, s"heavy-hitters capacity k must be positive: $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], key: String): Map[String, Long] =
    add(buf, key, 1L)

  private def add(buf: Map[String, Long], key: String, w: Long): Map[String, Long] = {
    if (buf.contains(key)) buf.updated(key, buf(key) + w)
    else if (buf.size < k) buf.updated(key, w)
    else {
      // decrement-all step, batched: subtract the smallest counter
      val dec = math.min(w, buf.values.min)
      val kept = buf.view.mapValues(_ - dec).filter(_._2 > 0).toMap
      if (w - dec > 0) kept.updated(key, w - dec) else kept
    }
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (key, w)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + w)
    }
    if (summed.size <= k) summed
    else {
      // keep the k largest, decrement by the (k+1)-th largest
      val sorted = summed.toSeq.sortBy { case (key, w) => (-w, key) }
      val cut = sorted(k)._2
      sorted.take(k).map { case (key, w) => key -> (w - cut) }
        .filter(_._2 > 0).toMap
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  // output as a real MapType column (explodable), not opaque kryo bytes
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  def toColumn_ : TypedColumn[String, Map[String, Long]] = toColumn
}
