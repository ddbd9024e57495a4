package graft.ops

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One (score, id) candidate for the top-k buffer. */
case class Scored(score: Double, id: Long)

/** Bounded top-k as a typed `Aggregator` (the UDAF surface the
  * reference lacks, SURVEY §2.5 / §4.3): each partial buffer keeps at
  * most k candidates ordered by (score DESC, id ASC), so the shuffle
  * carries ≤ k rows per (group, mapper) instead of the whole table —
  * the scale path the window-function top-k (full shuffle + per-group
  * sort) cannot take. At 100 TB with k=3 this is the difference
  * between shuffling 100 TB and shuffling megabytes.
  */
class TopKAggregator(k: Int)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k >= 1,
    s"k must be positive (got $k) — k = 0 would make reduce() read " +
      "b.last on an empty buffer inside an executor task")

  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
    if (b.size >= k && ord.lteq(b.last, a)) b
    else ((b :+ a).sorted(ord)).take(k)

  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
    ((x ++ y).sorted(ord)).take(k)

  override def finish(b: Seq[Scored]): Seq[Scored] = b

  override def bufferEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()

  override def outputEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()
}

object TopKAggregator {
  /** Column function: `topK(3)(score, id)` inside `.agg(...)`. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAggregator(k), ExpressionEncoder[Scored]())
    (score, id) => fn(score, id)
  }
}
