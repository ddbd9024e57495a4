package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries frequent-items summary (Misra & Gries '82) as a typed
  * `Aggregator`, with the mergeable-summaries combine step (Agarwal et
  * al., PODS '12): each partial buffer holds at most `k` counters, so
  * the shuffle carries ≤ k (item, count) pairs per mapper no matter
  * how many rows streamed through it — the heavy-hitter analogue of
  * [[graft.ops.TopKAggregator]]'s bounded top-k buffer, and the third
  * mergeable sketch in the engine next to count-min and HLL.
  *
  * Guarantees (the textbook ones, preserved under merge):
  *   - never over-counts: est(x) ≤ exact(x);
  *   - under-counts by at most n/(k+1) total stream length n, so
  *     every item with exact(x) > n/(k+1) is IN the summary.
  *
  * The summary CONTENT depends on partition merge order (like any
  * MG/SpaceSaving deployment), so the oracle-checked surface exposes
  * only order-invariant facts: the exact heavy-hitter set and the
  * two guarantee booleans, which the theorems force to `true` on any
  * execution — a broken sketch hash-mismatches, a correct one never
  * does. Same verification pattern as `agg_approx_distinct`.
  */
class FreqItemsAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, "capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    // null items are not countable (and a null map key would crash
    // the buffer encoder at shuffle time) — skip them, matching SQL
    // aggregate null semantics
    if (a == null) b
    else b.get(a) match {
      case Some(c) => b.updated(a, c + 1)
      case None if b.size < k => b.updated(a, 1L)
      case None =>
        // full and unseen: the MG decrement step — one unit off every
        // counter AND the incoming item (k+1 units per event, which
        // is where the n/(k+1) bound comes from)
        b.iterator.map { case (i, c) => i -> (c - 1L) }
          .filter(_._2 > 0L).toMap
    }

  override def merge(x: Map[String, Long],
                     y: Map[String, Long]): Map[String, Long] = {
    val combined = y.foldLeft(x) { case (m, (i, c)) =>
      m.updated(i, m.getOrElse(i, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      // subtract the (k+1)-th largest count from everything: ≤ k
      // counters stay positive, and the subtraction only ever
      // lowers estimates (over-count impossible)
      val cut = combined.valuesIterator.toIndexedSeq
        .sorted(Ordering[Long].reverse).apply(k)
      combined.iterator.map { case (i, c) => i -> (c - cut) }
        .filter(_._2 > 0L).toMap
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object FreqItems {

  /** Column function: `sketch(12)(item)` inside `.agg(...)` — yields
    * a map<string,long> of ≤ k surviving counters.
    */
  def sketch(k: Int): Column => Column = {
    val fn = udaf(new FreqItemsAggregator(k), ExpressionEncoder[String]())
    c => fn(c)
  }

  /** Heavy hitters with the MG guarantees checked in-plan: for every
    * item whose EXACT count exceeds n/(k+1), report the exact count
    * plus two booleans — present-in-sketch and estimate-within-bound
    * (0 ≤ exact − est ≤ n/(k+1)) — that a correct sketch can never
    * fail. All comparisons are integer (count·(k+1) vs n), so the
    * output is bit-portable. The exact side is one groupBy (fine at
    * any scale — the verification is the point of this operator; use
    * [[sketch]] alone when only the summary is needed).
    */
  def heavyHittersVerified(df: DataFrame, item: Column,
                           k: Int): DataFrame = {
    val items = df.select(item.as("item")).filter(col("item").isNotNull)
    val exact = items.groupBy("item").agg(count(lit(1)).as("exact_n"))
    val total = exact.agg(sum("exact_n").as("__n"))
    val est = items.agg(sketch(k)(col("item")).as("__sk"))
      .select(explode(col("__sk")).as(Seq("item", "__est")))
    exact.crossJoin(broadcast(total))
      .filter(col("exact_n") * (k + 1) > col("__n"))
      .join(est, Seq("item"), "left")
      .select(col("item"), col("exact_n"),
        col("__est").isNotNull.as("in_sketch"),
        (col("__est").isNotNull && col("__est") <= col("exact_n") &&
          (col("exact_n") - col("__est")) * (k + 1) <= col("__n"))
          .as("within_bound"))
  }
}
