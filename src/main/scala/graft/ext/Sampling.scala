package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Random sampling (`df.sample`) is non-reproducible across runs,
  * partitionings, and engines — useless for auditable corpus curation.
  * Hash sampling decides membership from a salted hash of the row's
  * stable id, so the same (salt, id) is in or out everywhere: re-runs,
  * re-partitions, incremental appends, and an independent engine all
  * agree. This is the standard web-corpus downsampling shape (keep
  * id-hash mod 100 < rate), a pure narrow projection+filter with no
  * shuffle — embarrassingly parallel at 100 TB.
  */
object Sampling {

  /** Salted hash bucket of `id` in [0, 100). md5 (not xxhash) so an
    * external auditor — or the DuckDB oracle — can recompute
    * membership without Spark.
    */
  def hashBucket(id: Column, salt: String): Column =
    PortableHash.md5PrefixLong(concat(lit(salt), id.cast("string")), 7) % 100

  /** Full-width salted hash rank of `id` (60 bits of md5) — the sort
    * key for fixed-SIZE sampling: the n smallest ranks per stratum are
    * a uniform deterministic sample of exactly n rows.
    */
  def hashRank(id: Column, salt: String): Column =
    PortableHash.md5PrefixLong(concat(lit(salt), id.cast("string")), 15)

  /** Exactly `n` rows per stratum (fewer if the stratum is smaller):
    * the n smallest hash ranks, ties broken by id. Two-phase so a
    * giant stratum never funnels through one task (strata are often
    * LOW-cardinality — a handful of domains over billions of rows):
    * phase 1 ranks within (stratum, id-hash shard) — 32-way parallel
    * per stratum — and phase 2 re-ranks only the ≤ 32·n shard
    * winners. Top-n is distributive over any partition of the input,
    * so the result is row-identical to the single-window form.
    *
    * NULL-id rows are dropped (the same contract as every salted-hash
    * operator here): a NULL id hashes to a NULL rank, which sorts
    * FIRST under ascending ranking — so without the filter, NULL-id
    * rows would preferentially fill the n sample slots, chosen
    * arbitrarily among themselves (all their order keys tie at NULL),
    * i.e. a partitioning-dependent "sample".
    *
    * PRECONDITION: ids must be UNIQUE within a stratum. Duplicate ids
    * tie on the whole (rank, id) order key, and when the cut lands
    * inside a tie group, WHICH payload row survives is
    * partitioning-dependent (the twoPhaseTopN total-order contract).
    * Dedup ids upstream; a sample keyed on non-unique ids is not
    * auditable anyway.
    */
  def fixedSizeStratifiedSample(df: DataFrame, id: Column, stratum: Column,
                                n: Int, salt: String): DataFrame = {
    require(!df.columns.exists(Set("__st", "__sid", "__hr", "__rn")),
      "input must not carry __st/__sid/__hr/__rn columns (reserved " +
        "by the stratified ranking)")
    Ranking.twoPhaseTopN(
        df.filter(id.isNotNull)
          .withColumn("__st", stratum)
          .withColumn("__sid", id)
          .withColumn("__hr", hashRank(id, salt)),
        keys = Seq(col("__st")),
        order = Seq(col("__hr"), col("__sid")), n = n,
        // shard hash salted differently from the rank hash — see the
        // independence clause of twoPhaseTopN's contract
        shardOf = PortableHash.md5PrefixLong(
          concat(lit(salt), lit("shard:"), id.cast("string")), 7))
      .drop("__st", "__sid", "__hr", "__rn")
  }

  /** Keep rows whose hash bucket falls under their stratum's
    * percentage rate; strata not in `rates` use `defaultRate`.
    */
  def stratifiedHashSample(df: DataFrame, id: Column, stratum: Column,
                           rates: Map[String, Int], defaultRate: Int,
                           salt: String): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate): Column) {
      case (acc, (s, r)) => when(stratum === s, lit(r)).otherwise(acc)
    }
    df.filter(hashBucket(id, salt) < rate)
  }

  /** Domain-mix resampling: downsample each stratum toward TARGET
    * corpus proportions (the source-mixing stage of training-data
    * assembly — rebalance scraped sources to a prescribed recipe).
    * Per stratum s: rate_s = min(1, share_s · total / n_s), i.e. keep
    * everything from under-represented sources (a hash sample cannot
    * upsample) and thin over-represented ones; the realized mix hits
    * the recipe up to the clamped strata. Rates derive from the data
    * (one broadcast count join + one total row), the keep decision is
    * the same salted-hash predicate as [[stratifiedHashSample]] at
    * 1e-6 resolution — deterministic, partitioning-invariant, and
    * exactly reproducible by the oracle (the rate arithmetic is
    * correctly-rounded double ops on exact integers and shared
    * decimal literals).
    *
    * @param targetShares (stratum, share) in fixed order; unlisted
    *                     strata get `defaultShare`
    */
  /** Shared stratum-rate thinning behind [[domainMixSample]] and
    * [[temperatureSample]]: count strata, broadcast the counts and
    * total back, and keep rows whose 60-bit salted id hash falls
    * under floor(rate·1e6) per million. 60 hash bits, not 28: a
    * 28-bit hash mod 1e6 carries a ~0.4% modulo bias (2^28 is not a
    * multiple of 1e6), which would systematically skew every realized
    * rate and break the 1e-6 resolution contract; at 60 bits the
    * bias is ~4e-13. Rows with a NULL id hash to null and are
    * dropped — deterministic sampling needs a stable id; scrub or
    * synthesize ids upstream (the same contract as every salted-hash
    * operator here). A NULL STRATUM is a first-class stratum: the
    * count groupBy puts NULL-stratum rows in their own group, and the
    * null-safe (<=>) join matches them back, so they are counted in
    * the total AND thinned at their own rate like any other stratum —
    * a plain equi-join would drop them from the output while still
    * counting them in __total, silently inflating every other
    * stratum's realized rate.
    *
    * COMPATIBILITY NOTE: widening the hash from 7 to 15 hex chars
    * (the 28→60-bit change above) altered which (salt, id) rows each
    * rate selects. Sampling is deterministic per library version, not
    * across versions — pipelines pinned to pre-60-bit membership must
    * re-materialize their samples rather than expect this version to
    * reproduce the old (biased) selection.
    */
  /** The 60-bit salted per-million lottery — ONE definition of the
    * membership expression (and its modulo-bias rationale, see
    * [[rateThinned]]'s scaladoc) shared with [[tokenBudgetMix]]: the
    * expression is oracle-parity-critical, and a fix applied to one
    * inlined copy could silently miss the other.
    */
  private def ppmLottery(id: Column, salt: String): Column =
    PortableHash.md5PrefixLong(
      concat(lit(salt), id.cast("string")), 15) % 1000000L

  private def rateThinned(df: DataFrame, id: Column, stratum: Column,
                          salt: String)(rate: Column): DataFrame = {
    require(!df.columns.exists(Set("__st", "__ck", "__n", "__total")),
      "input must not carry __st/__ck/__n/__total columns (reserved " +
        "by the stratum-count join)")
    // NULL ids drop BEFORE the stratum counts, not just at the hash
    // filter: counted-but-never-kept rows would deflate every
    // realized rate below the recipe (rate = share*total/n computed
    // over rows the lottery can never select)
    val eligible = df.filter(id.isNotNull)
    val counts = eligible.groupBy(stratum.as("__st"))
      .agg(count(lit(1)).as("__n"))
    val total = counts.agg(sum("__n").as("__total"))
    val thresh = floor(rate * lit(1000000.0)).cast("long")
    eligible.withColumn("__st", stratum)
      .join(broadcast(counts.withColumnRenamed("__st", "__ck")),
        col("__st") <=> col("__ck"))
      .crossJoin(broadcast(total))
      .filter(ppmLottery(id, salt) < thresh)
      .drop("__st", "__ck", "__n", "__total")
  }

  def domainMixSample(df: DataFrame, id: Column, stratum: Column,
                      targetShares: Seq[(String, Double)],
                      defaultShare: Double, salt: String): DataFrame = {
    // duplicate stratum names: the when-chain fold makes the LAST
    // entry win silently, so a copy-pasted recipe line would thin a
    // stratum at the wrong share with no signal (the tokenBudgetMix
    // duplicate-source guard, applied to shares)
    require(targetShares.map(_._1).distinct.length == targetShares.length,
      "duplicate stratum names in targetShares: the last entry would " +
        "silently override the first")
    rateThinned(df, id, stratum, salt) {
      val share = targetShares.foldLeft(lit(defaultShare): Column) {
        case (acc, (s, w)) => when(col("__st") === s, lit(w)).otherwise(acc)
      }
      least(lit(1.0),
        share * col("__total").cast("double") / col("__n").cast("double"))
    }
  }

  /** Temperature-flattened domain resampling (the multilingual mixing
    * rule of mT5/XLM-R at α = 1/2): keep rate per stratum
    * r_s = min(1, c·sqrt(N/n_s)), so surviving counts for thinned
    * strata are ∝ sqrt(n_s) — head languages/domains flattened toward
    * the tail — with the literal `budget` constant c tuning global
    * retention. Deliberately UNNORMALIZED: the textbook q_s =
    * sqrt(n_s)/Σ_d sqrt(n_d) needs a float SUM over strata, whose
    * accumulation order no engine pins, so a normalized rate is not
    * bit-reproducible; the budget form keeps every rate a chain of
    * correctly-rounded ops on exact integers (divide → sqrt →
    * multiply) and changes nothing about the flattening exponent.
    * Same salted-hash thinning and reserved-column contract as
    * [[domainMixSample]].
    */
  def temperatureSample(df: DataFrame, id: Column, stratum: Column,
                        budget: Double, salt: String): DataFrame = {
    require(budget > 0, "budget constant must be positive")
    rateThinned(df, id, stratum, salt) {
      least(lit(1.0), lit(budget) *
        sqrt(col("__total").cast("double") / col("__n").cast("double")))
    }
  }

  /** Leakage-guarded train/val/test assignment: the salted hash of the
    * LEAKAGE KEY — the unit near-duplicates cluster under (source
    * domain, url host, dedup component id) — picks the split, NOT the
    * row id, so every document sharing the key lands in the same split
    * and eval can't silently contain near-copies of training text.
    * Per-mille thresholds on a 1000-bucket hash: buckets
    * [0, testPerMille) → "test", the next valPerMille → "val", rest →
    * "train". Map-only (one hash per row, no shuffle), reproducible
    * anywhere via the portable hash. A NULL leakage key hashes to
    * null, which falls through every bucket test into "train" — the
    * safe side (unknown-provenance docs can never leak into eval);
    * scrub null keys upstream if they should be excluded entirely.
    */
  def splitAssign(df: DataFrame, leakKey: Column, salt: String,
                  valPerMille: Int, testPerMille: Int): DataFrame = {
    require(valPerMille >= 0 && testPerMille >= 0 &&
      valPerMille + testPerMille <= 1000,
      "per-mille shares must be non-negative and sum to at most 1000")
    val bucket = PortableHash.md5PrefixLong(
      concat(lit(salt), leakKey.cast("string")), 7) % 1000
    df.withColumn("split",
      when(bucket < testPerMille, lit("test"))
        .when(bucket < testPerMille + valPerMille, lit("val"))
        .otherwise(lit("train")))
  }

  /** TEMPORAL split with an EMBARGO gap — the leakage-correct split
    * for time-ordered data (López de Prado's purged/embargoed
    * evaluation): hash splits leak future information into training
    * whenever rows correlate across time, so the eval set must be
    * strictly LATER than training, with a buffer zone between them
    * absorbing look-ahead bleed (features computed over windows that
    * straddle the cut). Rows before `cut − embargo` → "train", rows
    * in [cut − embargo, cut) → "embargo" (discarded from both
    * sides), rows at/after `cut` → "test"; a NULL timestamp falls to
    * "embargo" — the safe side, never trained on, never evaluated.
    * Map-only, no shuffle.
    */
  def splitTemporal(df: DataFrame, ts: Column, cut: Column,
                    embargo: Column): DataFrame =
    // the test branch is deliberately FIRST: with a negative embargo
    // (sign confusion upstream) the old train-first ordering labeled
    // rows in [cut, cut - embargo) as "train" — future data training
    // the model, the exact leakage this split exists to prevent.
    // Test-first makes every ts >= cut row "test" regardless of the
    // embargo operand's sign; for embargo >= 0 the assignment is
    // unchanged. The oracle carries the same CASE order.
    df.withColumn("split",
      when(ts >= cut, lit("test"))
        .when(ts < cut - embargo, lit("train"))
        .otherwise(lit("embargo")))

  /** Token-budget mixture planning — the pretraining-mix step that
    * turns "30% web, 50% code, 20% books inside a 1T-token budget"
    * into per-document REPEAT COUNTS (epochs): a source whose share
    * exceeds its corpus repeats whole (epochs = target div available,
    * the LLaMA/Gopher up-sampling), and the fractional remainder is a
    * salted-hash per-doc lottery at exactly remainder/available ppm —
    * deterministic, so the drawn mix is reproducible and auditable on
    * any engine (an RNG mix plan cannot be hash-checked).
    *
    * All arithmetic exact integer (ppm shares, div truncation);
    * expected drawn tokens per source = the ppm target to within the
    * hash lottery's sampling noise. Sources missing from `weights`
    * get zero budget and drop out. Map-only per doc after ONE
    * source-level aggregation broadcast back — no shuffle touches
    * the corpus itself.
    *
    * Returns (id, source, n_tokens, n_repeat) with n_repeat ≥ 1.
    */
  def tokenBudgetMix(df: DataFrame, id: Column, source: Column,
                     nTokens: Column, weightsPpm: Seq[(String, Long)],
                     budgetTokens: Long, salt: String): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(weightsPpm.nonEmpty && weightsPpm.map(_._2).forall(_ >= 0) &&
      weightsPpm.map(_._2).sum <= 1000000L,
      "weights are nonnegative ppm summing to at most 10^6")
    require(weightsPpm.map(_._1).distinct.length == weightsPpm.length,
      "duplicate source names in weightsPpm: the broadcast join would " +
        "emit every such source's docs once per entry")
    val spark = df.sparkSession
    // NULL ids drop up front (the salted-hash-operator contract):
    // a NULL id can never win the fractional lottery but WOULD ride
    // the whole-epoch term, emitting un-auditable (NULL, …) plan rows
    // while the lottery under-draws the source's token target
    val base = df.filter(id.isNotNull)
      .select(id.as("id"), source.as("source"),
        nTokens.cast("long").as("n_tokens"))
    val w = spark.createDataFrame(weightsPpm).toDF("source", "__wppm")
    val avail = base.groupBy("source")
      .agg(sum("n_tokens").as("__avail"))
      .join(broadcast(w), Seq("source")) // zero-weight sources drop
      .select(col("source"),
        expr(s"cast($budgetTokens as decimal(38,0)) * __wppm div 1000000")
          .as("__target"), col("__avail"))
      .select(col("source"),
        // a weighted source with ZERO available tokens cannot meet
        // any share: silently it would NULL its epochs (every doc
        // filtered, the source's budget share evaporating from the
        // recipe with no signal) and under ANSI it is a mid-job
        // DIVIDE_BY_ZERO — fail loudly naming the source instead
        when(col("__avail").isNull || col("__avail") <= 0,
          raise_error(concat(
            lit("Sampling.tokenBudgetMix: weighted source "),
            col("source"),
            lit(" has no available tokens (sum(n_tokens) is 0 or " +
              "NULL) — drop it from weightsPpm or fix the token " +
              "counts"))))
          .otherwise(expr("__target div __avail"))
          .cast("long").as("__epochs"),
        // remainder·10⁶ in decimal: at 10¹³ available tokens per
        // source the long product would overflow
        expr("((cast(__target as decimal(38,0)) % __avail) " +
          "* cast(1000000 as decimal(38,0))) div __avail")
          .cast("long").as("__frac_ppm"))
    base.join(broadcast(avail), Seq("source"))
      // 60-bit lottery hash (15 hex chars), NOT 28: 2^28 mod 10^6 ≠ 0,
      // so a 28-bit lottery carries the same ~0.4% modulo bias
      // rateThinned documents — a systematic over-draw for sources
      // whose __frac_ppm lands in the over-represented residue range,
      // breaking the expected-tokens-per-source guarantee. Same
      // COMPATIBILITY note as rateThinned: widening the hash changed
      // which ids win the fractional epoch; re-materialize pinned
      // samples rather than expect the old (biased) membership.
      .withColumn("__lot", ppmLottery(col("id"), salt))
      .withColumn("n_repeat",
        col("__epochs") +
          when(col("__lot") < col("__frac_ppm"), 1L).otherwise(0L))
      .filter(col("n_repeat") >= 1)
      .select("id", "source", "n_tokens", "n_repeat")
  }

  /** Deterministic contrastive negative sampling: each anchor id gets
    * up to `k` negatives — the ids at hash-ring offsets 1..k within
    * its salted hash bucket (wrap-around) — the in-batch-negatives
    * construction of contrastive/embedding training, made REPRODUCIBLE
    * (the portable md5 hash fixes both bucketing and ring order, so
    * any engine — or a later re-run — draws the identical negatives;
    * a random sampler can never be audited or hash-checked).
    *
    * Unbiased in the only sense that matters for negatives: the hash
    * ring is independent of content, so ring neighbors are a uniform
    * draw. An anchor never samples itself (offsets stop at bucket
    * size − 1) and never crosses buckets.
    *
    * Scale shape: ONE exchange on the bucket key (the ring windows),
    * then an equi-join back on (bucket, position) — co-partitioned,
    * no second logical shuffle. Windows are per-bucket; choose
    * `buckets` so corpus/buckets rows fit a task (the caller-owned
    * knob, same contract as every blocked op here). Returns
    * (anchor_id, j, neg_id), j in [1, min(k, bucketSize−1)].
    */
  def contrastiveNegatives(df: DataFrame, id: Column, k: Int,
                           buckets: Int, salt: String): DataFrame = {
    require(k >= 1 && k <= 64, "k must be in [1, 64]")
    require(buckets >= 1 && buckets <= (1 << 20),
      "buckets must be in [1, 2^20]")
    import org.apache.spark.sql.expressions.Window
    val base = df
      .select(id.as("anchor_id"))
      .withColumn("__h", hashRank(col("anchor_id"), salt))
      .withColumn("__b",
        PortableHash.md5PrefixLong(
          concat(lit(salt), lit("bkt:"), col("anchor_id").cast("string")),
          7) % buckets)
    val w = Window.partitionBy("__b").orderBy("__h", "anchor_id")
    val ring = base
      .withColumn("__pos", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("__b")))
    val peers = ring.select(col("__b").as("__pb"),
      col("__pos").as("__ppos"), col("anchor_id").as("neg_id"))
    ring
      // singleton buckets emit nothing — and must be filtered BEFORE
      // the explode: Spark's sequence(1, 0) flips to a DESCENDING
      // [1, 0], not an empty array
      .filter(col("__n") >= 2)
      .select(col("anchor_id"), col("__b"), col("__pos"), col("__n"),
        explode(sequence(lit(1L),
          least(lit(k.toLong), col("__n") - 1))).as("j"))
      .withColumn("__npos",
        (col("__pos") - 1 + col("j")) % col("__n") + 1)
      .join(peers, col("__b") === col("__pb") &&
        col("__npos") === col("__ppos"))
      // the documented never-samples-itself guarantee holds BY
      // CONSTRUCTION only when ids are unique (offsets stop at bucket
      // size - 1); duplicated ids occupy adjacent ring positions and
      // would return an anchor's own id as its negative — fence it
      // here so contrastive training can never see a self-pair (a
      // duplicated anchor still draws fewer than k negatives;
      // dedup ids upstream for the full-k draw)
      .filter(col("neg_id") =!= col("anchor_id"))
      .select("anchor_id", "j", "neg_id")
  }
}
