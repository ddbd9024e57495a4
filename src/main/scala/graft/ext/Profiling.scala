package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-distribution diagnostics — the profile you run BEFORE a 100 TB
  * join or groupBy to find the keys that will melt a reducer. */
object Profiling {

  /** Exact equi-depth `q`-quantile binning of an integer `score`
    * within each `key` group — the feature-bucketing step every
    * curation pipeline runs on its quality scores (decile features,
    * percentile caps). PERCENTILE_DISC semantics: a boundary never
    * splits equal scores, and a tie group straddling a boundary lands
    * WHOLE in the lower bin (the same generous-downward contract as
    * TextAnalysis.scoreTerciles, which this generalizes from q=3 to
    * any q).
    *
    * All q−1 thresholds come from ONE aggregation per key: the
    * (score, count) histogram — bounded by the score's integer
    * domain, NOT the row count — folds once with a running count,
    * updating the whole threshold array per step (`zip_with`);
    * threshold_i is the largest score whose strictly-below count is
    * < n·i/q. The tiny per-key threshold row then broadcasts back
    * onto the input map-side: no per-row ranking window ever runs.
    *
    * Returns the input plus an int `bin` in [0, q) (0 = lowest
    * scores). `score` must be integral and bounded-domain (the
    * histogram is per distinct value).
    */
  def equidepthBins(scored: DataFrame, key: String, score: String,
                    q: Int): DataFrame = {
    require(q >= 2 && q <= 1024, "q must be in [2, 1024]")
    // NULL scores stay out of BOTH the histogram and __n (the
    // winsorize/madOutliers PERCENTILE_DISC-ignores-NULLs contract):
    // an unfiltered (key, NULL) struct sorts FIRST in the fold,
    // inflating the running count before any real value and shifting
    // — or with enough NULLs, nulling — every threshold. NULL-score
    // rows of a key with real scores still pass through below and
    // bin as 0 (score > t is NULL, the filter keeps nothing); a key
    // whose scores are ALL NULL has no quantiles to bin against and
    // drops with its thr row, like PERCENTILE_DISC over zero rows
    val hist = scored.filter(col(score).isNotNull)
      .groupBy(col(key), col(score).cast("long").as("__s"))
      .agg(count(lit(1)).as("__c"))
    val thr = hist.groupBy(key)
      .agg(sort_array(collect_list(struct(col("__s"), col("__c"))))
          .as("__h"),
        sum("__c").as("__n"))
      .select(col(key), expr(
        s"""aggregate(__h,
           |  named_struct('run', 0L,
           |    'th', transform(sequence(1, ${q - 1}), i -> 0L)),
           |  (acc, x) -> named_struct(
           |    'run', acc.run + x.__c,
           |    'th', zip_with(acc.th, sequence(1, ${q - 1}),
           |      (t, i) -> if(acc.run * $q < __n * cast(i as bigint),
           |                   x.__s, t)))).th""".stripMargin).as("__th"))
    // null-safe key equality (<=>): a NULL key group — first-class
    // here exactly as in keySkewProfile below — computes a threshold
    // row like any other group and must match it back; a plain
    // equi-join's three-valued NULL = NULL would silently drop every
    // null-key input row. <=> is still a hash-join key (PlanSpec pins
    // the broadcast), so the plan shape is unchanged.
    scored.join(broadcast(thr.withColumnRenamed(key, "__key")),
        col(key) <=> col("__key"))
      .withColumn("bin", expr(
        s"size(filter(__th, t -> cast($score as bigint) > t))"))
      .drop("__th", "__key")
  }

  /** Per-key winsorization — clamp `value` to its own group's
    * [loBp, hiBp] basis-point PERCENTILE_DISC band, the robust
    * feature-scaling step that tames heavy-tailed metrics before
    * they feed a model (a p99 cap a single sensor spike can't move
    * past the tail's own mass). Both thresholds fold from ONE
    * (value, count) histogram aggregation per key — bounded by the
    * value DOMAIN, not the row count (the [[equidepthBins]] /
    * [[madOutliers]] histogram contract) — and the tiny per-key
    * threshold row broadcasts back map-side; no per-row ranking
    * window ever runs. threshold_p = the largest v whose
    * strictly-below count · 10⁴ < n · bp, which IS
    * PERCENTILE_DISC(bp/10⁴) (smallest v with cume_dist ≥ p — same
    * prefix argument as the median fold, verified against DuckDB).
    *
    * All arithmetic exact integer; NULL keys are first-class (`<=>`);
    * NULL values pass through unclamped as NULL (PERCENTILE_DISC
    * ignores them, and Spark/DuckDB `least`/`greatest` disagree on
    * NULL propagation, so the clamp is explicitly guarded).
    *
    * Returns (id, key, v, lo, hi, v_wins).
    *
    * @param value integral column (pre-scale doubles to centi-units)
    */
  def winsorize(df: DataFrame, key: Column, id: Column, value: Column,
                loBp: Int, hiBp: Int): DataFrame = {
    val base = df.select(key.as("key"), id.as("id"),
      value.cast("long").as("v"))
    // the histogram keeps NULL-v rows as a (key, NULL) row so a key
    // whose values are ALL null still emits a (NULL, NULL) threshold
    // row and its rows survive the join (PERCENTILE_DISC-over-nothing
    // is NULL, not row-loss); collect_list then skips the null struct,
    // so null vs never enter the fold — the madOutliers contract
    val hist = base.groupBy(col("key"), col("v"))
      .agg(count(lit(1)).as("__c"))
    winsorizeFromHist(base, hist, loBp, hiBp)
  }

  /** [[winsorize]] with the (key, v, __c) value histogram supplied by
    * the caller — the shared-census entry point: several histogram-
    * fold operators over one table can derive their per-key
    * histograms from ONE materialized census stage instead of each
    * re-scanning and re-exchanging the table (the `shingle_pairs`
    * discipline). `hist` must cover exactly `base`'s rows, NULL-v
    * rows included as (key, NULL) groups.
    */
  def winsorizeFromHist(base: DataFrame, hist: DataFrame,
                        loBp: Int, hiBp: Int): DataFrame = {
    require(loBp >= 1 && hiBp <= 9999 && loBp < hiBp,
      s"basis points ($loBp, $hiBp) must satisfy 1 <= lo < hi <= 9999")
    val thr = hist.groupBy("key")
      .agg(sort_array(collect_list(when(col("v").isNotNull,
          struct(col("v"), col("__c"))))).as("__h"),
        sum(when(col("v").isNotNull, col("__c")).otherwise(0L))
          .as("__n"))
      .select(col("key").as("__k"), expr(
        s"""aggregate(__h,
           |  named_struct('run', 0L,
           |    'lo', cast(null as bigint), 'hi', cast(null as bigint)),
           |  (acc, x) -> named_struct(
           |    'run', acc.run + x.__c,
           |    'lo', if(acc.run * 10000 < __n * ${loBp}L, x.v, acc.lo),
           |    'hi', if(acc.run * 10000 < __n * ${hiBp}L, x.v, acc.hi)))
           |""".stripMargin).as("__t"))
      .select(col("__k"), col("__t.lo").as("lo"), col("__t.hi").as("hi"))
    base.join(broadcast(thr), col("key") <=> col("__k"))
      .select(col("id"), col("key"), col("v"), col("lo"), col("hi"),
        when(col("v").isNotNull,
          least(greatest(col("v"), col("lo")), col("hi")))
          .as("v_wins"))
  }

  /** Top-`k` heaviest keys of `key` with exact counts and integer
    * parts-per-million shares (ppm avoids a float fold whose last ulp
    * depends on fold order).
    *
    * Scale shape: one hash aggregation over the input (map-side
    * partial — a hot key combines before the shuffle, so profiling
    * skew never suffers the skew it measures), then
    * TakeOrderedAndProject for the top k — per-partition heaps, only
    * k rows per partition reach the driver-side merge. Rank and
    * cumulative share are computed by a broadcast triangular
    * self-join over the ALREADY-CAPPED k rows (k² ≤ 400 comparisons,
    * all map-side) — deliberately not an unpartitioned window, the
    * one plan shape this engine bans globally (PlanSpec's sweep)
    * because on unbounded input it funnels everything into one task.
    *
    * Returns (key, n, rank, share_ppm, cum_ppm), rank 1-based by
    * (n DESC, key NULLS FIRST) — NULL is a first-class key here
    * (a null-heavy join column is the single most common real skew
    * cause this profile exists to catch), so the tie-break treats
    * NULL as the smallest key instead of letting three-valued logic
    * drop the null row from its own rank join.
    */
  /** BENFORD first-digit profile — the classic fabricated-data
    * screen (naturally-occurring positive measurements follow
    * P(d) = log₁₀(1 + 1/d); synthetic or tampered columns usually
    * don't). Values quantize to positive micro-unit longs and the
    * leading digit comes off the DECIMAL STRING — never via
    * floating log10, whose libm rounding differs across engines.
    * One row per digit 1–9: observed count, observed ppm
    * (truncating integer division, both engines agree on
    * non-negative operands), the Benford expectation in ppm
    * (floor(log₁₀(1+1/d)·10⁶) constants), and the absolute
    * deviation — all exact integers. One hash aggregate; zero and
    * negative values are out of Benford's domain and drop.
    */
  def benfordProfile(df: DataFrame, value: Column): DataFrame = {
    val benfordPpm = Map(1 -> 301029L, 2 -> 176091L, 3 -> 124938L,
      4 -> 96910L, 5 -> 79181L, 6 -> 66946L, 7 -> 57991L,
      8 -> 51152L, 9 -> 45757L)
    val expected = benfordPpm.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("long")) { case (acc, (d, ppm)) =>
        when(col("digit") === d, lit(ppm)).otherwise(acc)
      }
    val counts = df
      // cast-FIRST like every sibling operator: on an IntegerType
      // column the int*int product wraps silently at value >= 2148,
      // reporting a wrong leading digit (or dropping the row via > 0)
      .select(floor(value.cast("double") * 1000000).cast("long")
        .as("__m"))
      .filter(col("__m") > 0)
      .select(substring(col("__m").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n_obs"))
    // EVERY digit 1-9 gets a row, observed or not: a digit entirely
    // absent from the data is the strongest fabrication signal and
    // must surface with dev_ppm = benford_ppm, not silently vanish
    // from the report
    val digits = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    // the grand total joins back as a broadcast of ONE row — never a
    // window (a constant-key window constant-folds into the banned
    // unpartitioned form)
    digits.join(counts, Seq("digit"), "left")
      .na.fill(0L, Seq("n_obs"))
      .crossJoin(broadcast(
        counts.agg(sum(col("n_obs")).as("__total"))))
      .select(col("digit"), col("n_obs"),
        // decimal multiply + integral div — the truncating integer
        // division the doc promises: a long product wraps past 2^63
        // and a double divide can round up across the oracle's floor
        expr("cast(n_obs as decimal(38,0)) * 1000000 div __total")
          .as("obs_ppm"),
        expected.as("benford_ppm"))
      .withColumn("dev_ppm", abs(col("obs_ppm") - col("benford_ppm")))
  }

  def keySkewProfile(df: DataFrame, key: Column, k: Int): DataFrame = {
    // upper bound mirrors the [1, 20] caps on pageRank/kHop iterations:
    // the rank/cumshare step is a deliberate k² broadcast self-join
    // (the price of the global no-unpartitioned-window ban), so k must
    // stay profile-sized — at k = 1000 that is 10⁶ map-side
    // comparisons, the most this diagnostic should ever cost
    require(k >= 1 && k <= 1000, "k must be in [1, 1000]")
    val counts = df.select(key.as("key")).groupBy("key")
      .agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum("n").as("__tot"))
    val top = counts.orderBy(col("n").desc, col("key")).limit(k)
    val peers = top.select(col("key").as("__k2"), col("n").as("__n2"))
    // each row pairs with every peer at-or-before it in (n DESC, key
    // NULLS FIRST) order — including itself, so no row is lost to the
    // inner join even when the key is NULL (a plain __k2 <= key would
    // be three-valued-NULL for the null-key row and silently drop the
    // heaviest key exactly when it is the interesting one)
    top.join(broadcast(peers),
        col("__n2") > col("n") ||
          (col("__n2") === col("n") &&
            (col("__k2").isNull ||
              (col("key").isNotNull && col("__k2") <= col("key")))))
      .groupBy("key", "n")
      .agg(count(lit(1)).cast("int").as("rank"),
        sum("__n2").as("__cum"))
      .crossJoin(broadcast(tot))
      .select(col("key"), col("n"), col("rank"),
        expr("n * 1000000 div __tot").as("share_ppm"),
        expr("__cum * 1000000 div __tot").as("cum_ppm"))
  }

  /** Target encoding of a categorical key — the classic tabular-ML
    * featurization (replace a category by its target mean) in EXACT
    * integer micro-units, two leakage disciplines at once:
    *
    *   - `enc_loo_micro`: leave-one-out — the category mean WITHOUT
    *     the row's own target, the standard train-time form (using
    *     the plain mean leaks each row's own label into its feature);
    *     NULL for singleton categories (nothing left out).
    *   - `enc_smooth_micro`: m-estimate smoothing toward the global
    *     mean, (Σ_cat + m·ḡ) / (n_cat + m) — the serve-time form
    *     that tames rare categories.
    *
    * Both finish with `div` truncation on decimal(38,0) sums, so the
    * features are bit-identical on any engine — a float mean fold is
    * not. Scale shape: one category aggregation + one global
    * aggregate broadcast back, then map-only per row; no window,
    * NULL keys first-class (`<=>`), NULL targets excluded from every
    * sum and encoded NULL.
    *
    * @param value integral target (pre-scale doubles to centi-units)
    */
  def targetEncode(df: DataFrame, key: Column, id: Column,
                   value: Column, m: Int = 10): DataFrame = {
    require(m >= 1 && m <= 1000000, "m must be in [1, 10^6]")
    val base = df.select(key.as("key"), id.as("id"),
      value.cast("long").as("v"))
    def d(c: Column): Column = c.cast("decimal(38,0)")
    val cat = base.groupBy("key")
      .agg(sum(d(col("v"))).as("__s"), count(col("v")).as("__n"))
      .withColumnRenamed("key", "__k")
    val glob = base.agg(sum(d(col("v"))).as("__gs"),
      count(col("v")).as("__gn"))
    base.join(broadcast(cat), col("key") <=> col("__k"))
      .crossJoin(broadcast(glob))
      .select(col("id"), col("key"), col("v"),
        when(col("v").isNotNull && col("__n") > 1,
          expr("((__s - v) * 1000000) div (__n - 1)").cast("long"))
          .as("enc_loo_micro"),
        when(col("v").isNotNull,
          // the EXACT m-estimate (Σ + m·ḡ)/(n + m) in one integer
          // quotient: a truncated intermediate mean (__gs div __gn)
          // collapses to whole raw units — for a 0/1 target the
          // global mean truncates to 0 and rare categories lose
          // their pull toward it entirely, the exact case smoothing
          // exists for. Decimal throughout: (__n + m)·__gn wraps a
          // long at ~1e12-row corpora
          expr(s"((__s * __gn + $m * __gs) * 1000000) " +
            s"div (cast(__n + $m as decimal(38,0)) * __gn)")
            .cast("long"))
          .as("enc_smooth_micro"))
  }

  /** Per-key two-sample Kolmogorov–Smirnov distance between two
    * snapshots of an integral metric — the distribution-drift monitor
    * every serving pipeline runs between training data and live
    * traffic. KS = max over values of |F_a(v) − F_b(v)|, computed
    * EXACTLY as integer cross-products: at each distinct value,
    * diff = |cumA·nB − cumB·nA|, and ks_ppm = ⌊10⁶·max(diff)⌋ div
    * (nA·nB) in decimal(38,0) — no float CDF anywhere, bit-identical
    * on any engine.
    *
    * Scale shape: both sides fold into ONE (key, value) histogram
    * (map-side combinable counts; per-task state is the distinct-
    * value census, never row lists), the running CDFs are a window
    * partitioned BY KEY over that bounded histogram (never over raw
    * rows — the global no-unpartitioned-window ban stays intact),
    * and one final per-key max. A key that lives on only one side
    * reports NULL ks_ppm (a one-sample KS is undefined), not a crash.
    *
    * Returns (key, n_a, n_b, ks_ppm). NULL keys are first-class;
    * NULL values are ignored on both sides (they are not a point on
    * either CDF).
    */
  def ksDrift(a: DataFrame, b: DataFrame, key: Column,
              value: Column): DataFrame = {
    def side(df: DataFrame, ca: Int, cb: Int): DataFrame =
      df.select(key.as("key"), value.cast("long").as("v"))
        .filter(col("v").isNotNull)
        .select(col("key"), col("v"), lit(ca).as("__a"),
          lit(cb).as("__b"))
    val hist = side(a, 1, 0).unionAll(side(b, 0, 1))
      .groupBy("key", "v")
      .agg(sum("__a").as("__ca"), sum("__b").as("__cb"))
    ksDriftFromHist(hist)
  }

  /** [[ksDrift]] from a caller-supplied merged (key, v, __ca, __cb)
    * histogram (counts of each distinct value on side a / side b) —
    * the shared-census entry point (see [[winsorizeFromHist]]).
    * Absent sides must be 0, not NULL; NULL-v rows are rejected here
    * (they are not a point on either CDF and would corrupt the
    * running-CDF window's ordering silently).
    */
  def ksDriftFromHist(hist0: DataFrame): DataFrame = {
    val hist = hist0.select(col("key"),
      when(col("v").isNull, raise_error(lit(
        "ksDriftFromHist: NULL value row in the histogram — filter " +
          "NULL vs out of the census projection first")))
        .otherwise(col("v")).as("v"),
      col("__ca"), col("__cb"))
    val w = Window.partitionBy("key").orderBy("v")
    val wAll = Window.partitionBy("key")
    def d(c: Column): Column = c.cast("decimal(38,0)")
    val cdf = hist
      .withColumn("__cuma", sum("__ca").over(w))
      .withColumn("__cumb", sum("__cb").over(w))
      .withColumn("__na", sum("__ca").over(wAll))
      .withColumn("__nb", sum("__cb").over(wAll))
    cdf.groupBy("key")
      .agg(max("__na").as("n_a"), max("__nb").as("n_b"),
        max(abs(d(col("__cuma")) * d(col("__nb")) -
          d(col("__cumb")) * d(col("__na")))).as("__md"))
      .select(col("key"), col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0,
          expr("(__md * 1000000) div (cast(n_a as decimal(38,0)) " +
            "* cast(n_b as decimal(38,0)))").cast("long"))
          .as("ks_ppm"))
  }

  /** Exact PERCENTILE_DISC(0.5) over a SORTED (v, __c) histogram
    * array column — med = the largest value whose strictly-below
    * count is < n/2, which IS the PERCENTILE_DISC(0.5) element
    * (smallest value with cume_dist ≥ 0.5; verified equivalent
    * against DuckDB on even, odd, and two-element groups). Duplicate
    * adjacent values fold identically to a merged entry (the running
    * count passes the n/2 threshold at the same element), which is
    * what lets MAD's deviation histogram reuse this WITHOUT
    * re-grouping equal deviations first. Expects `__n` (Σ __c) in
    * scope.
    */
  private def medianOfSortedHist(arr: String): String =
    s"""aggregate($arr,
       |  named_struct('run', 0L, 'th', cast(null as bigint)),
       |  (acc, x) -> named_struct(
       |    'run', acc.run + x.__c,
       |    'th', if(acc.run * 2 < __n, x.v, acc.th))).th""".stripMargin

  /** Robust per-key outlier detection — median/MAD (median absolute
    * deviation), the estimator monitoring pipelines use instead of
    * mean/stddev because one spike can't drag the threshold (50%
    * breakdown point vs 0 for z-scores). Flags rows where
    * |v − median| > `mult` · MAD; all arithmetic is exact integer
    * (`value` must already be integer-scaled, e.g. centi-units), so
    * the flag set is bit-identical on any engine.
    *
    * Scale shape: ONE bounded histogram aggregation per key (per-task
    * state is the key's distinct-value census, never its row list) —
    * MAD's median folds from an in-row array transform of the value
    * histogram — plus one equi-join of the tiny stats row back onto
    * the rows; no window, no driver collect. MAD = 0 (over half the
    * key's mass on one
    * value) degenerates to "flag anything off the median", the
    * standard MAD caveat — callers on near-constant streams should
    * pre-filter or raise `mult`.
    *
    * Key cardinality: the per-key stats frame (one med/MAD row per
    * key) joins back onto the rows UNHINTED by default, so AQE picks
    * broadcast when the domain is actually broadcast-sized (the
    * metric/entity monitoring shape) and degrades gracefully to a
    * shuffle join at an unbounded key domain (key = user/row id)
    * instead of OOMing the driver — a size gate measured on the real
    * stats stage. `pinBroadcastStats = true` restores the hard
    * broadcast pin for callers that know their domain and need the
    * map-side shape even with AQE off.
    *
    * Returns ONLY the anomalous rows: (id, key, v, med, dev, mad).
    */
  def madOutliers(df: DataFrame, key: Column, id: Column, value: Column,
                  mult: Int = 3,
                  pinBroadcastStats: Boolean = false): DataFrame = {
    val base = df.select(key.as("key"), id.as("id"),
      value.cast("long").as("v"))
    // SQL aggregate null semantics (PERCENTILE_DISC ignores NULLs): a
    // null v must not enter the histogram — an unfiltered null struct
    // sorts FIRST and corrupts the fold's running count. Null Vs also
    // never flag below (dev stays NULL, the > predicate is not-true),
    // matching the oracle's WHERE.
    val hist = base.filter(col("v").isNotNull)
      .groupBy(col("key"), col("v")).agg(count(lit(1)).as("__c"))
    madOutliersFromHist(base, hist, mult, pinBroadcastStats)
  }

  /** [[madOutliers]] with the (key, v, __c) value histogram supplied
    * by the caller — the shared-census entry point (see
    * [[winsorizeFromHist]]). NULL-v rows in `hist` are tolerated and
    * dropped here (a census shared with [[winsorizeFromHist]]
    * legitimately carries them).
    *
    * MULTI-histogram contract (round 17): duplicate (key, v) rows
    * are allowed and need no pre-merge — both median folds scan
    * running counts over the v-sorted array, so split counts for the
    * same v are exactly equivalent to one merged entry (the
    * `acc.run * 2 < __n` test is monotone in the prefix count and v
    * is constant across the duplicates), and `__n` is a plain sum.
    * Callers whose histogram comes from a FINER shared census (e.g.
    * ts_anomaly over the (user, type, late, v) events census) should
    * pass it unmerged when the (key, v) re-agg wouldn't combine —
    * a near-continuous value domain makes that exchange a pure extra
    * sequential stage. Re-aggregate first only when it genuinely
    * shrinks the histogram (small key × value domains, e.g. the
    * per-type winsorize/KS shapes).
    */
  def madOutliersFromHist(base: DataFrame, hist0: DataFrame,
                          mult: Int = 3,
                          pinBroadcastStats: Boolean = false): DataFrame = {
    require(mult >= 1 && mult <= 1000, "mult must be in [1, 1000]")
    val hist = hist0.filter(col("v").isNotNull)
    // GUARDED broadcast (round-13 ADVICE item): the stats frame is
    // one med/MAD row per key, so an unconditional broadcast pin was
    // a driver/executor OOM cliff at a 100×-scale key domain (key =
    // user id, say). Default (pinBroadcastStats = false): leave the join
    // UNHINTED and let AQE pick the strategy from the stats stage's
    // ACTUAL runtime size — a broadcast-sized key domain still gets
    // the broadcast join (verified in GraphTimeSeriesSpec: AQE
    // converts it at runtime), an oversized one degrades gracefully
    // to a shuffle join instead of crashing; this is a size gate
    // measured on the real data, cheaper and safer than any
    // key-count probe (which would re-run the census aggregation).
    // pinBroadcastStats = true keeps the old always-broadcast plan for
    // callers that KNOW their domain and must hold the map-side shape
    // even with AQE off.
    // ONE aggregation computes BOTH medians: the deviation histogram
    // is a pure array transform of the value histogram (|v − med|
    // per entry, counts carried), re-sorted in place — adjacent
    // duplicate deviations fold correctly (see medianOfSortedHist) —
    // so MAD never pays a second shuffle or a histogram-to-histogram
    // join. Per-key state stays the distinct-value census.
    //
    // INLINING TRAP (r10 regression, do not reintroduce): binding the
    // first median with `withColumn("med", <fold>)` and referencing
    // `med` inside the deviation-histogram transform lets
    // CollapseProject inline the O(d) interpreted fold INTO the
    // lambda body, re-executing it PER ARRAY ELEMENT — O(d²) per key
    // (measured 0.89 s → 2.46 s at sf0.1; ruinous at a 10⁴-distinct
    // value domain). The `transform(array(<med fold>), med -> …)[0]`
    // shape below is a let-binding: Catalyst has no rule that peels a
    // single-element transform, so the median fold is evaluated
    // exactly once per row and `med` is a true lambda variable in the
    // MAD fold. Same idiom as the aHash signature pass (commit
    // dbf0167); PlanSpec pins this row's runtime-shape.
    val madFold = medianOfSortedHist(
      """array_sort(transform(__h,
        |      x -> named_struct('v', abs(x.v - med), '__c', x.__c)))"""
        .stripMargin)
    val stats = hist.groupBy("key")
      .agg(sort_array(collect_list(struct(col("v"), col("__c"))))
          .as("__h"),
        sum("__c").as("__n"))
      .select(col("key").as("__mk"), expr(
        s"""transform(array(${medianOfSortedHist("__h")}),
           |  med -> named_struct('med', med, 'mad', $madFold))[0]"""
          .stripMargin).as("__s"))
      .select(col("__mk"), col("__s.med").as("med"),
        col("__s.mad").as("mad"))
    // null-safe key equality (<=>), same first-class-NULL contract as
    // equidepthBins/keySkewProfile above: a NULL-key series computes
    // its own median like any other and must match it back — a plain
    // equi-join's three-valued NULL = NULL would silently exempt
    // null-key rows from monitoring. stats is one tiny row per key;
    // see the guarded-broadcast note above for why the join is
    // unhinted by default (AQE runtime-size gate) and what
    // pinBroadcastStats = true restores.
    val statsSide = if (pinBroadcastStats) broadcast(stats) else stats
    base.join(statsSide, col("key") <=> col("__mk")).drop("__mk")
      .withColumn("dev", abs(col("v") - col("med")))
      // coalesce(…, false) is semantically identical for this filter
      // (NULL dev/mad must not flag) but BLOCKS constraint
      // propagation from inferring isnotnull(med)/isnotnull(mad) —
      // without it, InferFiltersFromConstraints pushes those below
      // the stats projection re-expressed as the FULL double-fold
      // transform, evaluating the interpreted folds 3× per key
      // (one per isnotnull + the projection itself; measured
      // 0.28 s → 0.84 s at sf0.1)
      .filter(coalesce(col("dev") > lit(mult.toLong) * col("mad"),
        lit(false)))
      .select("id", "key", "v", "med", "dev", "mad")
  }
}
