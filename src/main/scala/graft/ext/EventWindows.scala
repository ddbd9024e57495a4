package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time windowing and ordered joins. Batch and Structured
  * Streaming share these plan shapes — `window`/`session_window`
  * group-bys are watermark-ready: the same expressions run under
  * `readStream` with `.withWatermark("ts", ...)` prepended (see
  * graft.streaming.StreamOps).
  */
object EventWindows {

  /** Tumbling event-time windows with exact-decimal value sums.
    * decimal(38,2), not (18,2): under non-ANSI semantics a value at
    * or above 1e16 would cast to NULL and silently vanish from
    * sum_value while `n` still counted it — (38,2) keeps the sum
    * exact to 1e36, far past any real event value, and the oracle
    * (and the streaming twin) carry the same width.
    */
  def tumbling(events: DataFrame, duration: String): DataFrame =
    events.groupBy(window(col("ts"), duration), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(38,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding windows (each event lands in duration/slide windows). */
  def sliding(events: DataFrame, duration: String, slide: String): DataFrame =
    events.groupBy(window(col("ts"), duration, slide))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("n"))

  /** Session windows per key with a fixed inactivity gap; emits
    * session start/end (end = last event + gap, matching Spark's
    * `session_window` semantics) and event count.
    */
  def sessions(events: DataFrame, key: Column, gap: String,
               keyName: String = "user_id"): DataFrame =
    // keyName: a caller sessionizing by device/doc id should not get
    // its key emitted under a misleading "user_id" header; the
    // default keeps the registered query's schema
    events.groupBy(session_window(col("ts"), gap), key.as(keyName))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col(keyName), col("n"))

  /** Weekly cohort retention — the other core product-analytics
    * report next to [[funnel]]: users grouped by first-activity week
    * (the cohort), counted in each subsequent week they return.
    * Week buckets are ISO Monday truncations, and the week offset is
    * exact integer arithmetic on week-aligned epochs, so the matrix
    * is engine-reproducible. Shape at scale: one distinct over
    * (user, week) — the only corpus-sized shuffle — then a per-user
    * min and a final aggregation over the tiny (cohort, offset)
    * matrix; the (user, week) exchange is reused by the cohort min
    * (same clustering).
    */
  def retention(events: DataFrame, user: Column, ts: Column): DataFrame = {
    // ONE explicit exchange on user_id: it satisfies the distinct's
    // (user_id, w) clustering, the cohort min's user_id clustering
    // AND the join, so the activity pass shuffles once and every
    // consumer reuses it (pinned in PlanSpec)
    val act = events
      .select(user.as("user_id"), date_trunc("week", ts).as("w"))
      // NULL-ts events have no week and NULL-user events no cohort
      // identity: unfiltered they emit phantom (cohort, NULL) and
      // (NULL, NULL) matrix buckets no calendar week ever produced,
      // and the NULL-user rows would cohort unrelated anonymous
      // events together
      .filter(col("user_id").isNotNull && col("w").isNotNull)
      .repartition(col("user_id"))
      .distinct()
    val cohort = act.groupBy("user_id").agg(min("w").as("cw"))
    act.join(cohort, "user_id")
      // calendar-day difference, NOT epoch-seconds: datediff on the
      // truncated weeks is DST-proof (a spring-forward week spans
      // 601200 s, which would round an exact one-week return down to
      // offset 0 under epoch arithmetic in a non-UTC session zone).
      // count, not countDistinct: act is distinct on (user, week) and
      // a user's distinct weeks map to distinct offsets, so user_id is
      // already unique per (cohort, offset) group — a distinct
      // aggregate here would add a second corpus-sized exchange for
      // nothing
      .groupBy(col("cw").as("cohort_week"),
        expr("datediff(w, cw) div 7").as("week_k"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Ordered event-funnel detection — the MATCH_RECOGNIZE-lite every
    * product-analytics engine ships and Spark lacks: emit one row per
    * FINAL-step event that completes the step sequence
    * step₀ → step₁ → … → stepₖ within `within` per adjacent gap, in
    * order, per key. Greedy-latest matching is exact for this
    * existential pattern: the latest valid step-i event before a
    * step-(i+1) event is the best possible chain mate (any earlier
    * one only widens the gap), so one running-max window column per
    * step decides the whole pattern — no backtracking, no explosion.
    *
    * Shape at scale: ONE exchange on the key; every window pass
    * reuses the same (key, ts, tie) sort order, so k steps cost one
    * shuffle + one sort + k linear passes. `tie` breaks equal
    * timestamps (same-ts rows order by tie ascending), making the
    * row sequence — and therefore the match — total and
    * engine-reproducible.
    *
    * Output: (key, tie, ts, prev_ts) per completed final-step event,
    * where prev_ts is the matched penultimate-step timestamp.
    */
  def funnel(events: DataFrame, key: Column, ts: Column, tie: Column,
             eventType: Column, steps: Seq[String],
             within: String): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(steps.distinct.size == steps.size,
      "repeated step names make the greedy chain ambiguous")
    val base = events.select(key.as("key"), ts.as("ts"), tie.as("tie"),
      eventType.as("__etype"))
      // NULL keys are not ONE entity: Window.partitionBy groups every
      // null-key row into a single partition, chaining events from
      // unrelated anonymous users into funnels none of them completed
      // (the asofJoin null-key fence, applied here). NULL ts has no
      // event-time position in the chain and drops with it.
      .filter(col("key").isNotNull && col("ts").isNotNull)
    // strictly-preceding frame: a step cannot match itself, and
    // equal-ts rows resolve by the tie order
    val w = Window.partitionBy("key").orderBy(col("ts"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val chained = steps.dropRight(1).zipWithIndex.foldLeft(base) {
      case (df, (step, i)) =>
        val valid =
          if (i == 0) col("__etype") === step
          else col("__etype") === step && col(s"__c${i - 1}").isNotNull &&
            col("ts") <= col(s"__c${i - 1}") + expr(s"INTERVAL $within")
        df.withColumn(s"__c$i", max(when(valid, col("ts"))).over(w))
    }
    val last = steps.size - 1
    chained
      .filter(col("__etype") === steps(last) &&
        col(s"__c${last - 1}").isNotNull &&
        col("ts") <= col(s"__c${last - 1}") + expr(s"INTERVAL $within"))
      .select(col("key"), col("tie"), col("ts"),
        col(s"__c${last - 1}").as("prev_ts"))
  }

  /** Native AS-OF join via the custom plan node
    * (org.apache.spark.sql.graft.AsofJoin): logical node + strategy +
    * sorted-merge physical operator. Same contract and output as
    * [[asofJoin]]; prefer it when the union+window row blowup matters
    * (the right side ships only payload columns through the merge and
    * per-key state is O(1)).
    */
  def asofJoinNative(left: DataFrame, right: DataFrame, key: String,
                     ts: String, payloadCols: Seq[String]): DataFrame =
    org.apache.spark.sql.graft.AsofJoin
      .asofJoinNative(left, right, key, ts, payloadCols)

  /** Bucketed range join: points joined to the intervals containing
    * them ([start, end), same key). The naive form is a range-predicate
    * theta join — a per-key cross product that explodes on hot keys.
    * Here each interval is exploded onto the fixed-width time buckets
    * it covers and each point lands in exactly one bucket, so the join
    * is an EQUI-join on (key, bucket) with a residual range filter:
    * shuffle-partitionable, AQE-skew-splittable, no cross product.
    * Bucket ids are epoch-anchored microsecond multiples (exact long
    * arithmetic — no float division at bucket boundaries).
    *
    * @param bucketSeconds bucket width; choose ≈ the typical interval
    *        length so intervals explode to O(1) buckets each
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
                ts: String, start: String, end: String,
                bucketSeconds: Long): DataFrame = {
    require(!(points.columns ++ intervals.columns).contains("__bucket"),
      "inputs must not carry a __bucket column (reserved)")
    require(bucketSeconds >= 1 &&
      bucketSeconds <= Long.MaxValue / 1000000L,
      s"bucketSeconds ($bucketSeconds) must be in [1, Long.MaxValue/1e6]" +
        " — the micros bucket width must not overflow")
    val b = lit(bucketSeconds * 1000000L)
    def bucketOf(c: Column): Column = unix_micros(c) - pmod(unix_micros(c), b)
    val p = points.withColumn("__bucket", bucketOf(col(ts)))
    // a malformed interval (end < start, e.g. swapped columns) must
    // match nothing — unfiltered it would make sequence() throw
    // "Illegal sequence boundaries" and kill the whole job on one row.
    // A legitimate-looking SENTINEL interval (end = 9999-12-31) is the
    // same hazard one step later: its bucket sequence is ~10^9
    // elements, which sequence() rejects ("Too long sequence") or a
    // task OOMs materializing — so an over-long interval fails LOUD,
    // per row, naming the fix (raise bucketSeconds or clamp the ends)
    // instead of dying three frames deep in sequence()
    val maxBuckets = 4 << 20
    // the guard flows THROUGH the sequence's upper bound so it cannot
    // be pruned: the end bucket is only produced once the span check
    // passed
    val endBucket = when(
      (unix_micros(col(end)) - unix_micros(col(start))) / b
        >= maxBuckets,
      raise_error(concat(
        lit(s"EventWindows.rangeJoin: an interval spans more than " +
          s"$maxBuckets buckets at bucketSeconds=$bucketSeconds ("),
        col(start).cast("string"), lit(" .. "),
        col(end).cast("string"),
        lit(") — raise bucketSeconds or clamp sentinel end dates"))))
      .otherwise(bucketOf(col(end)))
    val i = intervals.filter(col(end) >= col(start))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(start)), endBucket, b)))
    p.join(i, Seq(key, "__bucket"))
      .filter(col(ts) >= col(start) && col(ts) < col(end))
      .drop("__bucket")
  }

  /** AS-OF join: for each left row, the latest right row with
    * `right.ts <= left.ts` on the same key — the operator Spark lacks
    * natively (DuckDB/Pandas `ASOF JOIN`, kdb `aj`).
    *
    * Implementation is the union-and-carry-forward shape: union both
    * sides tagged, sort by (key, ts, side) within partitions, and
    * carry the last right payload forward with an unbounded-preceding
    * `last(ignoreNulls)` window. ONE shuffle/sort, no range
    * explosion — at 100 TB this is a single sort-merge pass, vs the
    * naive range-join whose per-key cross product blows up on hot
    * keys. Right rows sort before left rows at equal ts, so `<=`
    * (inclusive) semantics hold.
    *
    * Null semantics match SQL joins, AsofJoinExec, and DuckDB ASOF: a
    * right row with null key or null ts never matches anything (they
    * are filtered before the union — otherwise a null ts sorts first
    * and its payload would be carried into every row of the key, and
    * null keys would match each other), and a left row with null
    * key/ts is preserved with null asof columns.
    *
    * @param left  (key, ts, ...leftCols)
    * @param right (key, ts, ...payload) — at most one row per
    *              (key, ts); pre-dedup with Dedup.lastWins otherwise
    * @param payloadCols right columns to carry (emitted with prefix
    *              "asof_")
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               payloadCols: Seq[String]): DataFrame = {
    require(!left.columns
        .exists(Set("__ts", "__side", "__payload", "__carried",
          "__within")),
      "left input must not carry __ts/__side/__payload/__carried/" +
        "__within columns (reserved by asofJoin's union-and-carry " +
        "encoding and asofJoinTolerance's bound projection)")
    val lOther = left.columns.filterNot(_ == key).toSeq
    val payload = struct((ts +: payloadCols).map(col): _*)
    val rTagged = right
      .filter(col(key).isNotNull && col(ts).isNotNull)
      .select(
      Seq(col(key), col(ts).as("__ts"), lit(0).as("__side"),
        payload.as("__payload")) ++
        lOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      Seq(col(key), col(ts).as("__ts"), lit(1).as("__side"),
        lit(null).cast(rTagged.schema("__payload").dataType)
          .as("__payload")) ++
        lOther.map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rTagged.unionByName(lTagged)
      .withColumn("__carried",
        last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(Seq(col(key)) ++ lOther.map(col) ++
        Seq(col(s"__carried.$ts").as(s"asof_$ts")) ++
        payloadCols.map(c => col(s"__carried.$c").as(s"asof_$c")): _*)
  }

  /** AS-OF join with a staleness bound (pandas `merge_asof(tolerance=)`
    * parity): a carried match older than `toleranceSeconds` before the
    * left timestamp is nulled out — a quote/sensor reading that stale
    * is no match at all. Same single sort-merge pass as [[asofJoin]];
    * the bound is one post-projection, no extra shuffle.
    */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, key: String,
                        ts: String, payloadCols: Seq[String],
                        toleranceSeconds: Long): DataFrame = {
    // the micros conversion must not overflow (a near-Long.MaxValue
    // "effectively unbounded" tolerance would wrap NEGATIVE and
    // silently null every asof column — the opposite intent), and a
    // negative tolerance is a caller bug, not an empty-match request
    require(toleranceSeconds >= 0 &&
      toleranceSeconds <= Long.MaxValue / 1000000L,
      s"toleranceSeconds ($toleranceSeconds) must be in " +
        "[0, Long.MaxValue/1e6] — for no bound use asofJoin directly")
    val asofCols = s"asof_$ts" +: payloadCols.map("asof_" + _)
    val within = col(s"asof_$ts").isNotNull &&
      unix_micros(col(ts)) - unix_micros(col(s"asof_$ts")) <=
        toleranceSeconds * 1000000L
    val bounded = asofJoin(left, right, key, ts, payloadCols)
      .withColumn("__within", within)
    asofCols.foldLeft(bounded)((d, c) =>
      d.withColumn(c, when(col("__within"), col(c))))
      .drop("__within")
  }
}
