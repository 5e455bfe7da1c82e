package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state per-group top-k as a typed `Aggregator` — the scale
  * shape for exact KNN-style ranking (SURVEY §2.D custom-aggregate
  * surface, same slot family as [[HeavyHitters]]).
  *
  * The naive formulation — `row_number() OVER (PARTITION BY q ORDER BY
  * score DESC)` then `rank <= k` — shuffles and sorts EVERY candidate
  * row: for q queries × n corpus rows that is a q·n-row exchange, the
  * part of brute-force KNN that actually breaks at scale (the pairwise
  * compute is embarrassingly parallel; the all-pairs sort is not).
  * This aggregator keeps only the k best (score DESC, id ASC) rows per
  * group in its buffer, merged associatively, so Spark runs it as a
  * partial aggregation with map-side combine: O(k) state per group per
  * partition and a shuffle of k-row sketches, never of candidates.
  * Result rows are identical to the window formulation — the ordering
  * is total (ties broken by id), so top-k is unique.
  */
class TopK(k: Int)
    extends Aggregator[TopK.Scored, Seq[TopK.Scored], Seq[TopK.Scored]] {
  require(k > 0, s"top-k capacity must be positive: $k")

  /** Total order: higher score first, then lower id (deterministic
    * under ties regardless of partitioning or arrival order). */
  private def beats(a: TopK.Scored, b: TopK.Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  // buffer invariant: sorted best-first, length <= k
  override def zero: Seq[TopK.Scored] = Nil

  override def reduce(buf: Seq[TopK.Scored], x: TopK.Scored): Seq[TopK.Scored] =
    if (buf.length >= k && beats(buf.last, x)) buf
    else {
      val (pre, post) = buf.span(beats(_, x))
      (pre :+ x) ++ (if (buf.length >= k) post.dropRight(1) else post)
    }

  override def merge(a: Seq[TopK.Scored], b: Seq[TopK.Scored]): Seq[TopK.Scored] = {
    val out = Seq.newBuilder[TopK.Scored]
    var (xs, ys) = (a, b)
    var n = 0
    while (n < k && (xs.nonEmpty || ys.nonEmpty)) {
      if (ys.isEmpty || (xs.nonEmpty && beats(xs.head, ys.head))) {
        out += xs.head; xs = xs.tail
      } else { out += ys.head; ys = ys.tail }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[TopK.Scored]): Seq[TopK.Scored] = buf

  override def bufferEncoder: Encoder[Seq[TopK.Scored]] =
    ExpressionEncoder[Seq[TopK.Scored]]()
  // array<struct<score,id>> — posexplode in SQL recovers the rank
  override def outputEncoder: Encoder[Seq[TopK.Scored]] =
    ExpressionEncoder[Seq[TopK.Scored]]()
}

object TopK {
  /** One scored candidate; `id` is the tiebreaker. */
  case class Scored(score: Double, id: Long)

  /** Untyped-DataFrame handle: `topk(5)(col("sim"), col("n_id"))`. */
  def topk(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopK(k), ExpressionEncoder[Scored]())
}
