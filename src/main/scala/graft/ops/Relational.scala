package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators beyond the reference's single join (SURVEY
  * §2.5 gaps): top-k per group, semi/anti joins, exact decimal
  * aggregation helpers.
  *
  * Scale notes: `topKPerGroup` is a single shuffle-and-sort per key —
  * at 100 TB prefer a pre-aggregation if k is small relative to group
  * size (AQE handles skewed keys). `sumExact` keeps money sums
  * deterministic across partition orders (double addition is not
  * associative; decimal addition is), which also makes results
  * reproducible run-to-run on a cluster.
  */
object Relational {

  /** Exact sum of a double money column: decimal accumulate, double
    * result. Deterministic under any partitioning / AQE re-plan.
    */
  def sumExact(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Deterministic average: exact decimal sum over count. */
  def avgExact(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double") / count(c)

  /** Top-k rows per group by `ord` (add a tiebreaker for determinism). */
  def topKPerGroup(df: DataFrame, keys: Seq[String], ord: Seq[Column],
                   k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Skew-safe equi-join: the large side gets a uniform salt, the
    * small side is replicated to every salt value, and the join runs
    * on (key, salt) — a hot key's rows spread over `salts` reducers
    * instead of hammering one. The salt value itself is irrelevant to
    * correctness (any salt matches a replica), so `rand`-derived
    * salting stays deterministic IN RESULT even under task retries.
    * Use when AQE's skew-join split isn't available (e.g. a skewed
    * aggregate feeding a join stage) — otherwise prefer AQE.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit `salts` copies of each unmatched
    // small-side replica — only shapes that never null-extend the
    // replicated side are salt-safe
    require(joinType == "inner" || joinType == "left" ||
      joinType == "left_outer" || joinType == "leftouter",
      s"saltedJoin supports inner/left joins only, got $joinType")
    val saltedLarge = large.withColumn("__salt",
      (rand(seed = 42) * salts).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** AQE-delegated skew join — the complement of [[saltedJoin]] and
    * the path a 100 TB cluster leans on FIRST: keep the plan a plain
    * shuffle equi-join and let Spark's `OptimizeSkewedJoin` split an
    * oversized partition into advisory-sized chunks at runtime
    * (replicating the matching build-side partition per chunk). The
    * `SHUFFLE_MERGE` hint forces the sort-merge strategy so the skew
    * rule has a shuffle join to operate on — a broadcast pick (right
    * for a genuinely small dim, where skew is moot) would bypass it.
    * Unlike salting, the split factor is sized per-partition from
    * observed bytes, costs nothing when the data is uniform, and
    * needs no salt-count tuning.
    *
    * Semantics are exactly the plain equi-join's — skew splitting is
    * a physical re-plan, never a result change.
    */
  def aqeSkewJoin(fact: DataFrame, dim: DataFrame, key: String,
                  joinType: String = "inner"): DataFrame =
    fact.hint("SHUFFLE_MERGE").join(dim, Seq(key), joinType)

  /** Runtime-bloom-pruned fact×dim equi-join — the third scan-side
    * lever next to [[aqeSkewJoin]] and static partition pruning:
    * when the dim side carries a selective predicate, Spark's
    * `InjectRuntimeFilter` rule turns it into a bloom filter
    * evaluated AT THE FACT SCAN, so at 100 TB the fact side ships
    * only rows whose key might join instead of shuffling the full
    * table and discarding most of it at the join. The plan stays the
    * plain equi-join (`SHUFFLE_MERGE` hint keeps a shuffle join for
    * the filter to prune); injection itself is governed by the
    * `spark.sql.optimizer.runtime.bloomFilter.*` thresholds, sized
    * for cluster-scale inputs — the semantics never depend on whether
    * the filter fired (bloom false positives are re-checked by the
    * join).
    */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame, key: String,
                      joinType: String = "inner"): DataFrame =
    // mechanically IDENTICAL to aqeSkewJoin (the distinct behaviors
    // live in Spark config + the dim-side predicate, not the plan) —
    // delegate so a future hint change cannot diverge the two
    aqeSkewJoin(fact, dim, key, joinType)

  /** MERGE INTO semantics as one declarative plan — the CDC apply
    * every warehouse runs: `target` (unique `key`) merged with
    * `changes` (unique `key`, an `op` column of "upsert"/"delete" and
    * the new `payload`).
    *
    *   - matched + delete  → row dropped
    *   - matched + upsert  → payload replaced ("updated")
    *   - unmatched upsert  → row inserted ("inserted")
    *   - no change         → row kept ("kept")
    *   - delete of an absent key → no-op
    *
    * One full-outer join on the key — the exact shuffle MERGE INTO
    * costs in any engine; both sides pre-deduped by contract (feed a
    * last-wins dedup upstream for raw CDC logs). The action column
    * makes the plan auditable downstream (row-count reconciliation
    * per action is the standard load check).
    *
    * Row presence is tracked by an explicit marker, never by payload
    * nullability: an upsert carrying a NULL payload SETS the payload
    * to null (as MERGE does), and a matched target row whose stored
    * payload is null still reconciles as "updated", not "inserted".
    *
    * A change row whose `op` is NULL or not in {"upsert", "delete"}
    * raises at execution (`raise_error`) — malformed CDC input must
    * fail the merge, not silently no-op or insert a phantom row.
    */
  def mergeUpsert(target: DataFrame, changes: DataFrame): DataFrame = {
    val t = target.select(col("key"), col("payload").as("__tp"),
      lit(true).as("__tin"))
    val c = changes.select(col("key"), col("op"),
      col("payload").as("__cp"), lit(true).as("__cin"))
    t.join(c, Seq("key"), "full_outer")
      // malformed CDC input fails loudly instead of corrupting the
      // target: change rows by definition carry a non-null op, so a
      // present change row (its __cin marker survived the join) whose
      // op is NULL or unknown raises — silently treating it as "no
      // change" (matched) or a phantom null-payload insert (unmatched)
      // would corrupt the merge result
      .withColumn("__op",
        when(col("__cin").isNull ||
          col("op").isin("upsert", "delete"), col("op"))
          .otherwise(raise_error(concat(
            lit("mergeUpsert: change row with invalid op '"),
            coalesce(col("op"), lit("NULL")), lit("'")))))
      // deletes drop the row; a delete of an absent key drops its
      // own change row — both cases are the one predicate below
      .filter(col("__op").isNull || col("__op") =!= "delete")
      .select(col("key"),
        when(col("__cin").isNotNull, col("__cp")).otherwise(col("__tp"))
          .as("payload"),
        when(col("__cin").isNull, "kept")
          .when(col("__tin").isNull, "inserted")
          .otherwise("updated").as("action"))
  }

  /** Column-wise LAST-WRITER-WINS patch apply — the sparse-update CDC
    * shape [[mergeUpsert]]'s full-row images don't cover (DynamoDB
    * streams, Debezium partial updates, CRDT LWW-register maps):
    * each patch row carries `key`, a totally-ordered `seq` (the log's
    * LSN), and the patched columns, with NULL meaning "this patch
    * does not touch this column". The result overlays, PER COLUMN,
    * the latest non-null patch value onto `target`; keys present only
    * in the changelog insert (untouched columns stay NULL), and the
    * `action` column reports changelog presence (kept / patched /
    * inserted — "patched" means a patch row existed for the key, even
    * one that touched no column).
    *
    * Two shuffles, both keyed and partial-aggregable: the changelog
    * folds in ONE hash aggregate (`max_by(c, seq when c set)` per
    * column — map-side combinable, so a 100 TB changelog reduces
    * before it moves), then one full-outer join against the target on
    * the key. No window over the log (the per-key-ordered-scan
    * formulation would sort the whole changelog). Ties on `seq` (two
    * writers emitting the same LSN for one column) break to the
    * GREATER VALUE under the column's ordering — the LWW-register
    * tie rule: max over the (seq, value) pair is a total order, so
    * the fold stays commutative, associative and idempotent (i.e.
    * partition-order invariant and engine-reproducible) even on
    * duplicate seqs, where a bare max-by-seq would keep whichever
    * row a partial aggregate met first.
    */
  def patchApply(target: DataFrame, patches: DataFrame, key: String,
                 seq: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "patchApply: no patch columns")
    val aggs = cols.map(c =>
      max_by(col(c), when(col(c).isNotNull, struct(col(seq), col(c))))
        .as(s"__p_$c"))
    val folded = patches.groupBy(col(key))
      .agg(aggs.head, aggs.tail :+ lit(true).as("__pin"): _*)
    val t = target.select(
      col(key) +: cols.map(col) :+ lit(true).as("__tin"): _*)
    t.join(folded, Seq(key), "full_outer")
      .select(col(key) +:
        cols.map(c => coalesce(col(s"__p_$c"), col(c)).as(c)) :+
        when(col("__pin").isNull, "kept")
          .when(col("__tin").isNull, "inserted")
          .otherwise("patched").as("action"): _*)
  }

  /** EXISTS — rows of `df` with a match in `other`. */
  def semiJoin(df: DataFrame, other: DataFrame, cond: Column): DataFrame =
    df.join(other, cond, "left_semi")

  /** NOT EXISTS — rows of `df` with no match in `other`. */
  def antiJoin(df: DataFrame, other: DataFrame, cond: Column): DataFrame =
    df.join(other, cond, "left_anti")

  /** Per-group Pearson correlation with DETERMINISTIC results — the
    * built-in `corr` folds doubles, so its last bits depend on
    * partition order and can never hash-match an oracle or reproduce
    * run-to-run on a cluster. Here every accumulated quantity is
    * EXACT: inputs scale to centi-unit longs (floor(x·100)), each
    * per-row product is taken in decimal(38,0) — NOT long, where
    * |centi| past 2³¹ would silently wrap — and the six sums
    * accumulate in decimal(38,0) (map-side combinable, associative,
    * exact; products stay within 38 digits for any long input). The finishing math — two correctly-rounded
    * IEEE sqrts and one divide over identical exact values — is then
    * ONE fixed float sequence, bit-identical on any engine and any
    * partitioning. Output ppm (⌊corr·10⁶⌋), NULL when either
    * variance is 0.
    *
    * Returns (groupCols…, n, corr_ppm). Scale shape: a single hash
    * aggregation — the same cost as any groupBy.agg, no second pass,
    * no window.
    */
  def corrPpm(df: DataFrame, groupCols: Seq[String], x: Column,
              y: Column): DataFrame = {
    val cx = floor(x * 100).cast("long")
    val cy = floor(y * 100).cast("long")
    def d(c: Column): Column = c.cast("decimal(38,0)")
    // COMPLETE pairs only (the built-in corr / oracle semantics): an
    // incomplete pair would count into n while the moment sums skip
    // its null side — six moments over DIFFERENT row subsets, a
    // corr_ppm that can exceed ±10⁶ or flip sign
    val agged = df
      .select(groupCols.map(col) :+ cx.as("__x") :+ cy.as("__y"): _*)
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(d(col("__x"))).as("__sx"),
        sum(d(col("__y"))).as("__sy"),
        sum(d(col("__x")) * d(col("__y"))).as("__sxy"),
        sum(d(col("__x")) * d(col("__x"))).as("__sxx"),
        sum(d(col("__y")) * d(col("__y"))).as("__syy"))
    val nD = d(col("n"))
    val num = nD * col("__sxy") - col("__sx") * col("__sy")
    val vx = nD * col("__sxx") - col("__sx") * col("__sx")
    val vy = nD * col("__syy") - col("__sy") * col("__sy")
    val den = sqrt(vx.cast("double")) * sqrt(vy.cast("double"))
    // exact-or-loud (the TimeSeries.acf1 discipline): the FINISHING
    // products n·Σxx etc. can overflow decimal(38,0) to NULL on huge
    // groups of huge values even though every per-row product fits —
    // and a NULL vx reads through when() as the documented
    // zero-variance NULL, silently. __sx non-null (the group had
    // rows) with a NULL vx/vy/num IS an overflow.
    val overflow = col("__sx").isNotNull &&
      (vx.isNull || vy.isNull || num.isNull)
    agged.select(groupCols.map(col) :+ col("n") :+
      when(overflow, raise_error(lit(
          "Relational.corrPpm: n-scaled moment products past " +
            "decimal(38,0) — pre-aggregate or rescale the inputs")))
        .when(vx > 0 && vy > 0,
          floor(num.cast("double") / den * 1000000.0).cast("long"))
        .as("corr_ppm"): _*)
  }

  /** Snapshot diff between two versions of a keyed table — the
    * lakehouse table-diff / pipeline-regression probe: which rows did
    * this run ADD, REMOVE, or CHANGE relative to the last one? Rows
    * equal on every `compareCols` are dropped (the diff is the
    * output, not the table).
    *
    * Returns (key…, action ∈ {added, removed, changed},
    * old_<c>/new_<c> for each compare column); unchanged rows never
    * leave the join. Comparison is null-safe per column (`<=>`), so
    * NULL→value and value→NULL both read as a change and NULL→NULL
    * does not.
    *
    * Scale shape: ONE full-outer hash join on the key — the minimum
    * any diff pays — with both sides pruned to key + compare columns
    * before the exchange; the action/compare logic is a map-side
    * projection. `keyCols` must be unique per side (it is the row
    * identity; duplicate keys would cross-multiply in the join — run
    * a [[graft.ext.Quality.Unique]] check first if unsure).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keyCols: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty,
      "need key and compare columns")
    require(keyCols.intersect(compareCols).isEmpty,
      "key and compare columns must be disjoint")
    require(!keyCols.contains("action"),
      "'action' is the diff's own output column")
    val o = oldDf.select(
      keyCols.map(col) ++
        compareCols.map(c => col(c).as(s"old_$c")) :+
        lit(1).as("__o"): _*)
    val n = newDf.select(
      keyCols.map(col) ++
        compareCols.map(c => col(c).as(s"new_$c")) :+
        lit(1).as("__n"): _*)
    val changed = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    o.join(n, keyCols, "full_outer")
      .withColumn("action",
        when(col("__o").isNull, lit("added"))
          .when(col("__n").isNull, lit("removed"))
          .when(changed, lit("changed")))
      .filter(col("action").isNotNull)
      .select(keyCols.map(col) :+ col("action") :++
        compareCols.flatMap(c =>
          Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }

  /** One grain of a mergeable rollup: per-`keyCols` partial
    * aggregates (n, sum, min, max) of integral `value` — every
    * component an ALGEBRAIC aggregate, so two rollups merge into one
    * by re-aggregation ([[mergeRollups]]) without ever touching raw
    * rows again. This is the incremental-view-maintenance primitive:
    * at 100 TB the materialized base rollup is petabytes cheaper to
    * keep than re-scanning history per refresh, and each refresh
    * costs only the DELTA's scan plus a partials-sized merge.
    * (avg/stddev come free downstream from sum/n — never materialize
    * a non-mergeable mean.)
    */
  def rollupPartials(df: DataFrame, keyCols: Seq[String],
                     value: Column): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    df.select(keyCols.map(col) :+ value.cast("long").as("__v"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(count(col("__v")).as("n"), sum("__v").as("sum_v"),
        min("__v").as("min_v"), max("__v").as("max_v"))
  }

  /** Merge rollups of the same grain into one — sum the counts and
    * sums, min the mins, max the maxes. By algebraic-aggregate
    * associativity the result is BIT-IDENTICAL to rolling up the
    * concatenated raw inputs (the `rel_incremental_rollup` oracle
    * proves it corpus-wide against a full rescan). One union + one
    * hash aggregation over partials-sized inputs; grains must match
    * (same keyCols) and key sets may overlap arbitrarily.
    */
  def mergeRollups(rollups: Seq[DataFrame],
                   keyCols: Seq[String]): DataFrame = {
    require(rollups.nonEmpty, "need at least one rollup")
    rollups.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*)
      .agg(sum("n").as("n"), sum("sum_v").as("sum_v"),
        min("min_v").as("min_v"), max("max_v").as("max_v"))
  }
}
