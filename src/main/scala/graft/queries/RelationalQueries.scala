package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.ops.Relational._
import graft.ext.BitmapDistinct

/** Relational surface beyond the reference (SURVEY §2.5): grouped /
  * rolled-up aggregation, window functions, top-k, set ops, semi/anti
  * joins, JSON, date and string functions, and TPC-H-style analytical
  * joins. All double aggregates go through exact decimal accumulation
  * (`sumExact`) so Spark and DuckDB hash-match bit for bit.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_rollup" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(sumExact(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
    },

    // Exact per-group mode with a deterministic tie-break
    // ((count DESC, value ASC) via min_by over (-n, value)) — two
    // partial-agg-friendly hash aggregations, no per-group sort or
    // window; the (group, value) pair count combines map-side, so a
    // hot group's mode never funnels its raw rows anywhere.
    "agg_mode" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"), col("l_returnflag"))
        .agg(count(lit(1)).as("__n"))
        .groupBy("l_suppkey")
        .agg(
          min_by(col("l_returnflag"),
            struct(-col("__n"), col("l_returnflag"))).as("mode_flag"),
          max(col("__n")).as("mode_n"))
    },

    "agg_cube" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
    },

    "agg_grouping_sets" -> { (s, dir) =>
      t(s, dir, "lineitem").createOrReplaceTempView("li_gs")
      s.sql("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n
              |FROM li_gs
              |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
              |""".stripMargin)
    },

    // Exact interpolated quantiles. SCALE CONTRACT: `percentile` is a
    // TypedImperativeAggregate that BUFFERS EVERY VALUE of a group in
    // one task's memory before sorting — exactness has no mergeable
    // sublinear form. That is the right tool when groups are bounded
    // (here: a handful of return flags at test SF), and an OOM by
    // design when a group can be billions of rows; for unbounded
    // groups use agg_approx_quantiles (approx_percentile: KLL-style
    // mergeable sketch, constant memory per task, rank error ≤ the
    // configured accuracy) — same output shape, bounded everywhere.
    "agg_quantiles" -> { (s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, array(0.25, 0.5, 0.75))").as("q"))
        .select(col("l_returnflag"), col("q")(0).as("q25"),
          col("q")(1).as("q50"), col("q")(2).as("q75"))
    },

    // HyperLogLog++ distinct sketch — mergeable partial aggregates,
    // the cardinality path that doesn't shuffle every key. DuckDB's
    // sketch differs, so the oracle-checkable contract is the sketch's
    // accuracy bound: per group, emit the EXACT count plus a boolean
    // asserting |approx − exact| / exact < 5% (rsd is set to 1%, so
    // 5× slack never flakes). The oracle computes the exact count and
    // claims TRUE — an out-of-tolerance sketch hash-mismatches.
    "agg_approx_distinct" -> { (s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey"), 0.01)
            .as("__approx"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("__approx") - col("exact_parts")).cast("double") /
            col("exact_parts").cast("double") < 0.05).as("within_tol"))
    },

    // Mergeable sketch BLOBS (Datasketches HLL): per-group sketches
    // union to a grand total WITHOUT re-scanning raw rows — the
    // two-phase shape that lets 1000 executors sketch locally and a
    // coordinator merge kilobytes. Verified like agg_approx_distinct:
    // the unioned estimate must sit within 5% of the exact global
    // distinct, and the per-group sketch estimates must each match
    // their exact counts (lgConfigK 14 ≈ 0.8% rsd, 5× slack).
    "agg_hll_merge" -> { (s, dir) =>
      val perGroup = t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(hll_sketch_agg(col("l_partkey"), lit(14)).as("__sk"),
          countDistinct(col("l_partkey")).as("exact_parts"))
      val exactAll = t(s, dir, "lineitem")
        .agg(countDistinct(col("l_partkey")).as("__exact_all"))
      val merged = perGroup
        .agg(hll_union_agg(col("__sk")).as("__u"),
          sum(lit(1)).as("__ng"))
        .select(hll_sketch_estimate(col("__u")).as("__est_all"),
          col("__ng"))
      perGroup
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(hll_sketch_estimate(col("__sk")) - col("exact_parts"))
            .cast("double") / col("exact_parts").cast("double") < 0.05)
            .as("group_within_tol"))
        .crossJoin(broadcast(merged.crossJoin(broadcast(exactAll))
          .select((abs(col("__est_all") - col("__exact_all"))
            .cast("double") / col("__exact_all").cast("double") < 0.05)
            .as("union_within_tol"))))
    },

    // Sketch set-operations: audience overlap between event types
    // from the SAME mergeable per-group HLL sketches a 1000-executor
    // fleet would ship to a coordinator — |A∩B| by inclusion–
    // exclusion (est A + est B − est A∪B), never re-scanning raw
    // rows. The tiny per-type sketch table self-joins broadcast
    // (n_types², kilobytes); the exact intersection it is audited
    // against shuffles once on user_id with partial aggs. The
    // tolerance is union-relative (5% of |A∪B| + 2): inclusion–
    // exclusion error scales with the union cardinality, so an
    // intersection-relative bound would be statistically wrong for
    // small overlaps.
    "agg_hll_intersect" -> { (s, dir) =>
      val du = t(s, dir, "events")
        .select(col("event_type").as("et"), col("user_id")).distinct()
      val sk = du.groupBy("et")
        .agg(hll_sketch_agg(col("user_id"), lit(14)).as("__sk"),
          countDistinct(col("user_id")).as("__exact"))
      val pairs = sk.as("a")
        .join(broadcast(sk.as("b")), col("a.et") < col("b.et"))
        .select(col("a.et").as("et_a"), col("b.et").as("et_b"),
          col("a.__exact").as("exact_a"), col("b.__exact").as("exact_b"),
          (hll_sketch_estimate(col("a.__sk"))
            + hll_sketch_estimate(col("b.__sk"))
            - hll_sketch_estimate(hll_union(col("a.__sk"), col("b.__sk"))))
            .as("__est_inter"),
          hll_sketch_estimate(hll_union(col("a.__sk"), col("b.__sk")))
            .as("__est_union"))
      val exactInter = du.as("x")
        .join(du.as("y"), col("x.user_id") === col("y.user_id")
          && col("x.et") < col("y.et"))
        .groupBy(col("x.et").as("et_a"), col("y.et").as("et_b"))
        .agg(count(lit(1)).as("exact_inter"))
      pairs.join(exactInter, Seq("et_a", "et_b"), "left")
        .select(col("et_a"), col("et_b"), col("exact_a"), col("exact_b"),
          coalesce(col("exact_inter"), lit(0L)).as("exact_inter"),
          (abs(col("__est_inter") - coalesce(col("exact_inter"), lit(0L)))
            .cast("double")
            <= col("__est_union").cast("double") * 0.05 + 2.0)
            .as("inter_within_tol"))
    },

    "agg_stats" -> { (s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        sumExact(col("l_extendedprice")).as("sum_price"),
        avgExact(col("l_extendedprice")).as("avg_price"),
        countDistinct(col("l_partkey")).as("n_parts"))
    },

    // Deterministic Pearson correlation (quantity vs price per
    // return flag): exact decimal sums → one fixed IEEE finishing
    // sequence — the built-in corr's double fold is partition-order
    // sensitive and could never hash-match the oracle.
    "agg_corr" -> { (s, dir) =>
      corrPpm(t(s, dir, "lineitem"), Seq("l_returnflag"),
        col("l_quantity"), col("l_extendedprice"))
    },

    // long→wide pivot with an EXPLICIT value list — the at-scale
    // contract: enumerated pivot values keep the output schema static
    // (no extra pass to discover values, no surprise column count)
    "pivot_wide" -> { (s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sumExact(col("l_quantity")))
    },

    // wide→long unpivot (melt): ids stay, value columns become
    // (attr, val) rows — a zero-shuffle Generate
    "unpivot_long" -> { (s, dir) =>
      t(s, dir, "part").unpivot(
        Array(col("p_partkey")),
        Array(col("p_size").cast("double").as("p_size"),
          col("p_retailprice").as("p_retailprice")),
        "attr", "val")
    },

    // Sketched quantiles (approx_percentile), verified like the HLL
    // sketch: emit the exact interpolated quantiles plus a boolean
    // asserting the sketch landed within ±1.0 of each — an
    // out-of-tolerance sketch hash-mismatches the oracle's TRUE.
    "agg_approx_quantiles" -> { (s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, array(0.25, 0.5, 0.75))").as("__ex"),
          expr("approx_percentile(l_quantity, array(0.25, 0.5, 0.75), 10000)")
            .as("__ap"))
        .select(col("l_returnflag"),
          col("__ex")(0).as("q25"), col("__ex")(1).as("q50"),
          col("__ex")(2).as("q75"),
          ((abs(col("__ap")(0).cast("double") - col("__ex")(0)) <= 1.0) &&
            (abs(col("__ap")(1).cast("double") - col("__ex")(1)) <= 1.0) &&
            (abs(col("__ap")(2).cast("double") - col("__ex")(2)) <= 1.0))
            .as("within_tol"))
    },

    "win_distribution" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        ntile(4).over(w).as("quartile"),
        cume_dist().over(w).as("cd"),
        percent_rank().over(w).as("pr"))
    },

    "win_rank" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"))
    },

    "win_running" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("double").as("running_total"),
        count(lit(1)).over(w).as("running_n"))
    },

    "win_lag_lead" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"))
    },

    // Slowly-changing-dimension type-2 history build from a change
    // log — the warehouse merge every dimension load runs: change
    // capture is a lag-compare (drop rows whose tracked value equals
    // the previous event's), versioning is a lead over the surviving
    // change rows ([valid_from, valid_to) intervals, is_current on
    // the open row). Both windows partition on the same key, so the
    // change filter reuses the version window's exchange — one
    // shuffle total, no self-join against the dimension's history.
    "scd2_merge" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderstatus"),
          col("o_orderdate"), col("o_orderkey"))
        .withColumn("__prev", lag(col("o_orderstatus"), 1).over(w))
        .filter(col("__prev").isNull ||
          col("__prev") =!= col("o_orderstatus"))
        .select(col("o_custkey").as("custkey"),
          col("o_orderstatus").as("status"),
          col("o_orderdate").as("valid_from"),
          lead(col("o_orderdate"), 1).over(
            Window.partitionBy("o_custkey")
              .orderBy(col("o_orderdate"), col("o_orderkey")))
            .as("valid_to"))
        .withColumn("is_current", col("valid_to").isNull)
    },

    // MERGE INTO semantics (the warehouse CDC apply): the last event
    // per user becomes an upsert ('error' ⇒ delete) against the
    // customer balance table — matched rows update, unmatched upserts
    // insert, deletes drop, untouched rows keep, absent-key deletes
    // no-op. One full-outer shuffle, the exact cost MERGE pays in any
    // engine; the action column is the standard load-reconciliation
    // audit.
    "merge_upsert" -> { (s, dir) =>
      val target = t(s, dir, "customer")
        .select(col("c_custkey").as("key"),
          col("c_acctbal").as("payload"))
      val changes = t(s, dir, "events")
        .groupBy(col("user_id").as("key"))
        .agg(max_by(struct(col("event_type"), col("value")),
          struct(col("ts"), col("event_id"))).as("__l"))
        .select(col("key"),
          when(col("__l.event_type") === "error", "delete")
            .otherwise("upsert").as("op"),
          col("__l.value").as("payload"))
      mergeUpsert(target, changes)
    },

    // Column-wise LWW patch apply — the SPARSE-update CDC shape
    // (Debezium partial updates / DynamoDB streams): event_id is the
    // LSN, clicks/purchases patch the balance, views patch the
    // segment, signup/error rows patch nothing (all-NULL patches
    // still mark the key "patched"); user_id*11 pushes a tail of
    // keys past the customer range to exercise inserts.
    "cdc_patch_apply" -> { (s, dir) =>
      val target = t(s, dir, "customer").select(
        col("c_custkey").as("key"),
        floor(col("c_acctbal") * 100).cast("long").as("bal"),
        col("c_mktsegment").as("seg"))
      val patches = t(s, dir, "events").select(
        (col("user_id") * 11).as("key"),
        col("event_id").as("seq"),
        when(col("event_type").isin("click", "purchase"),
          floor(col("value") * 100).cast("long")).as("bal"),
        when(col("event_type") === "view",
          concat(lit("SEG_"), pmod(col("event_id"), lit(5))))
          .as("seg"))
      patchApply(target, patches, "key", "seq", Seq("bal", "seg"))
    },

    // Incremental EXACT-distinct maintenance — the aggregate the
    // algebraic partials (n/sum/min/max) can't carry: per-day user
    // sets as roaring-style bitmap partials built per slice, a
    // refresh unions artifact-sized bitmaps (never rescanning
    // history), counts exact by set-union associativity; the oracle
    // IS the full count(DISTINCT) rescan
    "rel_incremental_distinct" -> { (s, dir) =>
      val e = t(s, dir, "events").select(col("user_id"),
        to_date(col("ts")).as("day"))
      val cut = lit("2024-01-20").cast("date")
      val keys = Seq("day")
      BitmapDistinct.mergeDistinctPartials(Seq(
        BitmapDistinct.distinctPartials(
          e.filter(col("day") < cut), keys, col("user_id")),
        BitmapDistinct.distinctPartials(
          e.filter(col("day") >= cut), keys, col("user_id"))),
        keys)
        .select(col("day"), col("n_distinct").as("n_users"))
    },

    // Exact audience overlap per day — the exact twin of the HLL
    // intersect sketch row: per-day viewer and clicker bitmaps
    // intersect container-by-container; only days with a non-empty
    // overlap emit (matching SQL INTERSECT's empty-set absence)
    "rel_distinct_intersect" -> { (s, dir) =>
      val e = t(s, dir, "events").select(col("user_id"),
        col("event_type"), to_date(col("ts")).as("day"))
      val keys = Seq("day")
      def side(et: String) = BitmapDistinct.distinctPartials(
        e.filter(col("event_type") === et), keys, col("user_id"))
        .select(col("day"), col("bitmap"))
      side("view").withColumnRenamed("bitmap", "__bv")
        .join(side("click").withColumnRenamed("bitmap", "__bc"),
          Seq("day"))
        .select(col("day"), BitmapDistinct.intersectUdf(
          col("__bv"), col("__bc")).as("n_both"))
        .filter(col("n_both") > 0)
    },

    // Foreign-key DISCOVERY by containment ratio — the schema-
    // profiling pass that proposes join keys on an undocumented
    // lake: for each candidate (child, parent) column pair, the
    // share of child distinct values present in the parent, exact
    // integer ppm; both sides distinct BEFORE the join so the
    // shuffle carries key cardinalities, never row counts
    "rel_fk_discovery" -> { (s, dir) =>
      def containment(name: String, child: DataFrame, ccol: String,
                      parent: DataFrame, pcol: String): DataFrame = {
        val cd = child.select(col(ccol).as("__k")).distinct()
        val pd = parent.select(col(pcol).as("__pk")).distinct()
        cd.join(pd, col("__k") === col("__pk"), "left")
          .agg(count(lit(1)).as("n_child_keys"),
            sum(when(col("__pk").isNotNull, 1L).otherwise(0L))
              .as("n_contained"))
          .select(lit(name).as("candidate"), col("n_child_keys"),
            col("n_contained"),
            // decimal multiply + integral div keeps the promised
            // exact ppm: the long product wraps past ~9.2e12 keys
            // and a double divide rounds where the oracle // floors
            expr("cast(n_contained as decimal(38,0)) * 1000000" +
              " div n_child_keys").as("containment_ppm"))
      }
      containment("orders.o_custkey->customer.c_custkey",
          t(s, dir, "orders"), "o_custkey",
          t(s, dir, "customer"), "c_custkey")
        .unionByName(containment(
          "lineitem.l_orderkey->orders.o_orderkey",
          t(s, dir, "lineitem"), "l_orderkey",
          t(s, dir, "orders"), "o_orderkey"))
        .unionByName(containment(
          "events.user_id->customer.c_custkey",
          t(s, dir, "events"), "user_id",
          t(s, dir, "customer"), "c_custkey"))
    },

    // Snapshot diff between table versions — the lakehouse
    // regression probe. v2 is a deterministic mutation of orders
    // (drop %97 keys, bump %101 totalprices, add offset copies of
    // %103 keys), so the diff exercises all three actions; one
    // full-outer key join, unchanged rows never leave it.
    "rel_snapshot_diff" -> { (s, dir) =>
      val v1 = t(s, dir, "orders")
      val base = v1.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 101 === 0,
            col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
      val adds = v1.filter(col("o_orderkey") % 103 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 900000000L)
      snapshotDiff(v1, base.unionByName(adds), Seq("o_orderkey"),
        Seq("o_totalprice", "o_orderstatus"))
    },

    // Incremental view maintenance: the (user, day) rollup is
    // materialized once over history (here: days before the cut),
    // each refresh rolls up ONLY the delta and merges partials —
    // algebraic aggregates (n, sum, min, max) make the merge
    // bit-identical to a full rescan, which is exactly what the
    // oracle runs. At 100 TB the refresh cost is the delta scan plus
    // a partials-sized exchange, never the history scan.
    "rel_incremental_rollup" -> { (s, dir) =>
      val e = t(s, dir, "events").select(col("user_id"),
        to_date(col("ts")).as("day"),
        floor(col("value") * 100).as("v"))
      val cut = lit("2024-01-20").cast("date")
      val keys = Seq("user_id", "day")
      mergeRollups(Seq(
        rollupPartials(e.filter(col("day") < cut), keys, col("v")),
        rollupPartials(e.filter(col("day") >= cut), keys, col("v"))),
        keys)
    },

    "topk_per_group" -> { (s, dir) =>
      topKPerGroup(t(s, dir, "orders"), Seq("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    },

    // Same result as topk_per_group, via the typed Aggregator (UDAF):
    // partial top-k buffers merge map-side, so only k rows per
    // (group, mapper) reach the shuffle — the 100 TB form.
    "topk_agg" -> { (s, dir) =>
      val topk = graft.ops.TopKAggregator.topK(3)
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(topk(col("o_totalprice"), col("o_orderkey")).as("tk"))
        .select(col("o_custkey"), explode(col("tk")).as("r"))
        .select(col("o_custkey"), col("r.id").as("o_orderkey"),
          col("r.score").as("o_totalprice"))
    },

    "sort_limit" -> { (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    },

    // Skew-mitigated join: the salt decomposes one hot key's rows
    // across `salts` reducers. The oracle is the PLAIN join + same
    // aggregate — hash equality proves salting never changes results.
    "join_salted" -> { (s, dir) =>
      graft.ops.Relational.saltedJoin(
        t(s, dir, "lineitem").select(col("l_suppkey"), col("l_quantity")),
        t(s, dir, "supplier").select(col("s_suppkey").as("l_suppkey"),
          col("s_nationkey")),
        "l_suppkey", salts = 8)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"))
    },

    // The AQE twin of join_salted: a deliberately skewed derived key
    // (91% of lineitem lands on k=0) joined through aqeSkewJoin, so
    // at scale OptimizeSkewedJoin splits the hot partition at runtime
    // (PlanSpec pins the rule firing under production-shaped
    // thresholds). The oracle is the PLAIN join — skew handling is a
    // physical re-plan, never a result change.
    "join_skew_aqe" -> { (s, dir) =>
      val fact = t(s, dir, "lineitem").select(
        when(pmod(col("l_orderkey"), lit(100)) < 91, lit(0L))
          .otherwise(pmod(col("l_orderkey"), lit(100)) - 90).as("k"),
        col("l_extendedprice"))
      val dim = t(s, dir, "nation")
        .filter(col("n_nationkey") < 10)
        .select(col("n_nationkey").cast("bigint").as("k"), col("n_name"))
      graft.ops.Relational.aqeSkewJoin(fact, dim, "k")
        .groupBy("n_name")
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("rev"))
    },

    // Runtime bloom pruning: the dim side's selective predicate
    // becomes a bloom filter at the fact scan when the
    // runtime.bloomFilter thresholds qualify (PlanSpec pins the
    // injection under production-shaped thresholds). The oracle is
    // the PLAIN join — bloom false positives are re-checked by the
    // join, so pruning never changes results.
    "join_bloom_runtime" -> { (s, dir) =>
      graft.ops.Relational.bloomPrunedJoin(
        t(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_quantity")),
        t(s, dir, "orders")
          .filter(col("o_orderstatus") === "F" &&
            col("o_totalprice") > 100000.0)
          .select(col("o_orderkey").as("l_orderkey"),
            col("o_orderpriority")),
        "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("double").as("sum_qty"))
    },

    // RANGE window frame (value-based, unlike win_running's ROWS
    // frame): per customer, total spend over orders within 30 days
    // before each order — peer rows at equal dates all see the same
    // frame, THE semantic difference from a rows frame.
    "win_range_frame" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        // parquet ms-timestamps surface as TIMESTAMP_NTZ; cast through
        // session-zone (UTC) timestamp = DuckDB's naive-as-UTC epoch_ms
        .orderBy(unix_millis(col("o_orderdate").cast("timestamp")))
        .rangeBetween(-30L * 86400 * 1000, 0)
      t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("double").as("spend_30d"),
        count(lit(1)).over(w).as("n_30d"))
    },

    "join_semi" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      semiJoin(c, o, c("c_custkey") === o("o_custkey"))
        .select("c_custkey", "c_name")
    },

    "join_anti" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 100000)
      antiJoin(c, o, c("c_custkey") === o("o_custkey"))
        .select("c_custkey", "c_name")
    },

    // Full outer join of two per-user aggregates with genuinely
    // different key sets: users who clicked but never purchased (and
    // vice versa) keep their row with the other side null-coalesced.
    "join_full_outer" -> { (s, dir) =>
      val e = t(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_clicks"))
      val buys = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_purchases"))
      clicks.join(buys, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
          coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
    },

    // Gaps-and-islands: per-user runs of consecutive ACTIVE DAYS via
    // the date-minus-row-number constant-group trick — exact integer
    // day arithmetic, the classic streak analytic.
    "win_streaks" -> { (s, dir) =>
      val days = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val w = Window.partitionBy("user_id").orderBy("d")
      val grp = days
        .withColumn("__grp",
          datediff(col("d"), lit("1970-01-01")) - row_number().over(w))
      val streaks = grp.groupBy("user_id", "__grp")
        .agg(count(lit(1)).as("len"))
      streaks.groupBy("user_id")
        .agg(max("len").as("longest_streak"),
          count(lit(1)).as("n_streaks"))
    },

    "set_intersect" -> { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(
          t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
    },

    "set_except" -> { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .except(t(s, dir, "supplier").filter(col("s_suppkey") % 3 === 0)
          .select(col("s_nationkey").as("nationkey")))
    },

    // Scalar subquery: max() keeps the threshold fold-order-free
    // (a float avg would differ in the last ulp across engines).
    "sub_scalar" -> { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("ord_sq")
      s.sql("""SELECT o_orderkey, o_totalprice FROM ord_sq
              |WHERE o_totalprice > 0.9 * (SELECT max(o_totalprice)
              |                            FROM ord_sq)""".stripMargin)
    },

    "sub_in" -> { (s, dir) =>
      t(s, dir, "customer").createOrReplaceTempView("cust_sq")
      t(s, dir, "nation").createOrReplaceTempView("nat_sq")
      // NATION_1 plus NATION_10..19: the generated fixture's names are
      // synthetic, so 'NATION_1%' is the prefix that actually selects
      // a proper subset (11 of 25) — the IN-subquery is exercised on
      // both matching and non-matching customers.
      s.sql("""SELECT c_custkey, c_name FROM cust_sq
              |WHERE c_nationkey IN (SELECT n_nationkey FROM nat_sq
              |                      WHERE n_name LIKE 'NATION_1%')""".stripMargin)
    },

    "json_extract" -> { (s, dir) =>
      t(s, dir, "events").select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
    },

    "date_parts" -> { (s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate"), to_date(lit("2020-01-01")))
          .as("days_since"))
    },

    "str_funcs" -> { (s, dir) =>
      t(s, dir, "part").select(col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        length(col("p_name")).as("len"),
        lpad(col("p_brand"), 12, "*").as("pad"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("novowel"),
        levenshtein(col("p_name"), lit("widget")).as("lev"),
        concat_ws("|", col("p_brand"), col("p_type")).as("cw"),
        trim(col("p_name")).as("tr"))
    },

    "hash_funcs" -> { (s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        md5(col("text")).as("h_md5"),
        sha2(col("text"), 256).as("h_sha256"))
    },

    "tpch_q1" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sumExact(col("l_quantity")).as("sum_qty"),
          sumExact(col("l_extendedprice")).as("sum_base_price"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") -
              col("l_discount").cast("decimal(18,2)"))))
            .cast("double").as("sum_disc_price"),
          avgExact(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
    },

    // Canonical TPC-H Q3 predicates (spec §2.4.3): orders placed
    // before the cutoff, line items shipped after it — the selective
    // filters are what create the join-order pressure the query is
    // known for, and Catalyst pushes both below the joins.
    "tpch_q3" -> { (s, dir) =>
      val cutoff = lit("1995-03-15").cast("timestamp")
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < cutoff)
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(l("l_orderkey"), o("o_orderdate"))
        .agg(sum((l("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") -
            l("l_discount").cast("decimal(18,2)"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // Canonical TPC-H Q5 predicates (spec §2.4.5): one region, one
    // order-date year. The reference data starts 1995-01-01, so the
    // year window is 1996 rather than the spec's 1994 — same shape
    // (range prune on the fact table, broadcast-size region filter).
    // TPC-H Q7 volume shipping — the two-nation bidirectional join:
    // lineitem joins BOTH nation ends (supplier's and customer's),
    // the pair filter keeps the two directions, revenue rolls up per
    // (supp_nation, cust_nation, year). The nation dims broadcast;
    // the only big exchanges are the l-o and o-c key joins.
    "tpch_q7" -> { (s, dir) =>
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val su = t(s, dir, "supplier")
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("n1_key"),
          col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("n2_key"),
          col("n_name").as("cust_nation"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(su, l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n1), su("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), c("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_1" &&
          col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" &&
            col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum((l("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") -
            l("l_discount").cast("decimal(18,2)"))))
          .cast("double").as("revenue"))
    },

    // TPC-H Q18 large-volume customers — ONE hash aggregate over
    // lineitem serves BOTH roles (round-17 fusion): the textbook
    // formulation re-joins lineitem and re-groups to produce
    // sum_qty, but the final group key contains o_orderkey, which
    // functionally determines every other key column (orders PK) —
    // so the per-group sum IS the per-orderkey sum the qualifying
    // HAVING already computed. Carrying __q through the joins
    // eliminates the second lineitem scan, the fact-table re-join
    // AND the final group-by exchange (the aggregate-transposition
    // rewrite an FD-aware optimizer performs; Catalyst has no PK
    // metadata here, so it is applied by hand). The oracle stays the
    // independent textbook double-aggregation shape. Top-100 by a
    // bounded TakeOrdered, never a global sort.
    "tpch_q18" -> { (s, dir) =>
      val l = t(s, dir, "lineitem")
      // quantities are integer-valued (TPC-H: 1..50), so LONG sums
      // are exact and engine-identical — no decimal aggregation on
      // the hottest aggregate of the query
      val big = l.select(col("l_orderkey").as("__bk"),
          col("l_quantity").cast("long").as("__lq"))
        .groupBy(col("__bk"))
        .agg(sum(col("__lq")).as("__q"))
        .filter(col("__q") > 200)
      // UNHINTED joins, AQE runtime-size gate (same discipline as
      // Profiling.madOutliersFromHist): the >200-quantity HAVING
      // keeps ≤~8% of orders (BENCH_DRIFT_r12 scoping) — broadcast-
      // sized at bench scale, but DATA-PROPORTIONAL, so a pinned
      // broadcast() here is a driver OOM cliff at a 100×-scale run.
      // AQE reads the qualifying aggregate's ACTUAL runtime size and
      // converts both joins to broadcast when they fit, and degrades
      // to shuffle joins instead of crashing when the qualifying set
      // outgrows the broadcast budget.
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("__bk"))
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          col("__q").cast("double").as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    "tpch_q5" -> { (s, dir) =>
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val l = t(s, dir, "lineitem")
      val su = t(s, dir, "supplier")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(su, l("l_suppkey") === su("s_suppkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(n("n_name"))
        .agg(sum((l("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") -
            l("l_discount").cast("decimal(18,2)"))))
          .cast("double").as("revenue"))
    })

  private val rev =
    """CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "agg_mode" ->
      """WITH c AS (SELECT l_suppkey, l_returnflag, count(*) AS n
        |           FROM lineitem GROUP BY 1, 2)
        |SELECT l_suppkey, l_returnflag AS mode_flag, n AS mode_n FROM c
        |QUALIFY row_number() OVER (PARTITION BY l_suppkey
        |  ORDER BY n DESC, l_returnflag) = 1""".stripMargin,

    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin,

    "agg_quantiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS q25,
        |  quantile_cont(l_quantity, 0.50) AS q50,
        |  quantile_cont(l_quantity, 0.75) AS q75
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    // Exact distinct + the accuracy claim the sketch must meet: if
    // Spark's HLL drifts past 5%, within_tol flips false and the
    // hashes diverge — the sketch is verified, not just row-counted.
    "agg_approx_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS within_tol
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    // exact counts + the accuracy claims the sketch-union must meet;
    // a drifting per-group or merged estimate flips a boolean and
    // hash-mismatches
    "agg_hll_merge" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS group_within_tol, TRUE AS union_within_tol
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    // exact per-type and pairwise-intersection distincts + the
    // union-relative accuracy claim the inclusion–exclusion estimate
    // must meet; a drifting estimate flips the boolean
    "agg_hll_intersect" ->
      """WITH du AS (SELECT DISTINCT event_type AS et, user_id
        |  FROM events),
        |ex AS (SELECT et, count(*) AS exact_users FROM du GROUP BY 1),
        |inter AS (SELECT x.et AS et_a, y.et AS et_b,
        |    count(*) AS exact_inter
        |  FROM du x JOIN du y
        |    ON x.user_id = y.user_id AND x.et < y.et
        |  GROUP BY 1, 2)
        |SELECT a.et AS et_a, b.et AS et_b,
        |  a.exact_users AS exact_a, b.exact_users AS exact_b,
        |  COALESCE(i.exact_inter, 0) AS exact_inter,
        |  TRUE AS inter_within_tol
        |FROM ex a
        |JOIN ex b ON a.et < b.et
        |LEFT JOIN inter i ON i.et_a = a.et AND i.et_b = b.et""".stripMargin,

    // HUGEINT sums are int128-exact like Spark's decimal(38,0); the
    // finishing sqrt/divide sequence is written identically
    "agg_corr" ->
      """WITH c AS (SELECT l_returnflag,
        |    CAST(floor(l_quantity * 100) AS BIGINT) AS x,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |a AS (SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy
        |  FROM c GROUP BY 1)
        |SELECT l_returnflag, n,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |  THEN CAST(floor(
        |    CAST(n * sxy - sx * sy AS DOUBLE)
        |      / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |         * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
        |    * 1000000.0) AS BIGINT) END AS corr_ppm
        |FROM a""".stripMargin,


    "agg_stats" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        |  COUNT(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "pivot_wide" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F'
        |       THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
        |  CAST(SUM(CASE WHEN l_linestatus = 'O'
        |       THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS O
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "unpivot_long" ->
      """SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val
        |FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice', p_retailprice FROM part""".stripMargin,

    // exact quantiles + the accuracy claim the sketch must meet
    "agg_approx_quantiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS q25,
        |  quantile_cont(l_quantity, 0.5) AS q50,
        |  quantile_cont(l_quantity, 0.75) AS q75,
        |  TRUE AS within_tol
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "win_distribution" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  cume_dist() OVER w AS cd,
        |  percent_rank() OVER w AS pr
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin,

    "win_rank" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(rank() OVER w AS INT) AS rnk,
        |  CAST(dense_rank() OVER w AS INT) AS drnk,
        |  CAST(row_number() OVER w AS INT) AS rn
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin,

    "win_running" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_total,
        |  COUNT(*) OVER w AS running_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    // value-based frame: peers at the same date share one frame
    "win_range_frame" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS spend_30d,
        |  COUNT(*) OVER w AS n_30d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate)
        |             RANGE BETWEEN 2592000000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "join_salted" ->
      """SELECT s_nationkey, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1""".stripMargin,

    "join_bloom_runtime" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F' AND o_totalprice > 100000
        |GROUP BY 1""".stripMargin,

    "join_skew_aqe" ->
      """SELECT n_name, count(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |FROM lineitem JOIN nation
        |  ON n_nationkey = CASE WHEN l_orderkey % 100 < 91 THEN 0
        |                        ELSE l_orderkey % 100 - 90 END
        |WHERE n_nationkey < 10
        |GROUP BY 1""".stripMargin,

    "win_lag_lead" ->
      """SELECT o_orderkey, o_custkey,
        |  lag(o_orderkey, 1) OVER w AS prev_order,
        |  lead(o_orderkey, 1) OVER w AS next_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    "scd2_merge" ->
      """WITH ch AS (
        |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
        |    lag(o_orderstatus) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders)
        |SELECT o_custkey AS custkey, o_orderstatus AS status,
        |  o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER w AS valid_to,
        |  lead(o_orderdate) OVER w IS NULL AS is_current
        |FROM ch WHERE prev IS NULL OR prev <> o_orderstatus
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    // the oracle IS the full rescan the merge must reproduce — one
    // aggregation over all raw rows, never split at the cut; proves
    // the partial-merge is exact, not approximately refreshed
    "rel_incremental_rollup" ->
      """SELECT user_id, CAST(ts AS DATE) AS day,
        |  count(CAST(floor(value * 100) AS BIGINT)) AS n,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_v,
        |  min(CAST(floor(value * 100) AS BIGINT)) AS min_v,
        |  max(CAST(floor(value * 100) AS BIGINT)) AS max_v
        |FROM events GROUP BY 1, 2""".stripMargin,

    "rel_fk_discovery" ->
      """WITH c1 AS (SELECT DISTINCT o_custkey AS k FROM orders),
        |p1 AS (SELECT DISTINCT c_custkey AS k FROM customer),
        |c2 AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
        |p2 AS (SELECT DISTINCT o_orderkey AS k FROM orders),
        |c3 AS (SELECT DISTINCT user_id AS k FROM events),
        |p3 AS (SELECT DISTINCT c_custkey AS k FROM customer),
        |r AS (
        |  SELECT 'orders.o_custkey->customer.c_custkey' AS candidate,
        |    (SELECT count(*) FROM c1) AS n_child_keys,
        |    (SELECT count(*) FROM c1 JOIN p1 USING (k)) AS n_contained
        |  UNION ALL
        |  SELECT 'lineitem.l_orderkey->orders.o_orderkey',
        |    (SELECT count(*) FROM c2),
        |    (SELECT count(*) FROM c2 JOIN p2 USING (k))
        |  UNION ALL
        |  SELECT 'events.user_id->customer.c_custkey',
        |    (SELECT count(*) FROM c3),
        |    (SELECT count(*) FROM c3 JOIN p3 USING (k)))
        |SELECT candidate, CAST(n_child_keys AS BIGINT) AS n_child_keys,
        |  CAST(n_contained AS BIGINT) AS n_contained,
        |  CAST(n_contained * 1000000 // n_child_keys AS BIGINT)
        |    AS containment_ppm
        |FROM r""".stripMargin,

    "rel_incremental_distinct" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1""".stripMargin,

    "rel_distinct_intersect" ->
      """WITH v AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |           FROM events WHERE event_type = 'view'),
        |c AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |      FROM events WHERE event_type = 'click')
        |SELECT day, CAST(count(*) AS BIGINT) AS n_both
        |FROM (SELECT * FROM v INTERSECT SELECT * FROM c)
        |GROUP BY 1""".stripMargin,

    // same mutation literals; IS DISTINCT FROM mirrors the null-safe
    // per-column change test; +1.0 on a double is IEEE-identical
    "rel_snapshot_diff" ->
      """WITH v1 AS (SELECT o_orderkey, o_totalprice, o_orderstatus
        |            FROM orders),
        |v2 AS (SELECT o_orderkey,
        |         CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1.0
        |              ELSE o_totalprice END AS o_totalprice,
        |         o_orderstatus
        |       FROM orders WHERE o_orderkey % 97 <> 0
        |       UNION ALL
        |       SELECT o_orderkey + 900000000, o_totalprice,
        |         o_orderstatus
        |       FROM orders WHERE o_orderkey % 103 = 0),
        |j AS (SELECT coalesce(v1.o_orderkey, v2.o_orderkey)
        |          AS o_orderkey,
        |        v1.o_totalprice AS old_o_totalprice,
        |        v2.o_totalprice AS new_o_totalprice,
        |        v1.o_orderstatus AS old_o_orderstatus,
        |        v2.o_orderstatus AS new_o_orderstatus,
        |        v1.o_orderkey IS NOT NULL AS ino,
        |        v2.o_orderkey IS NOT NULL AS inn
        |      FROM v1 FULL OUTER JOIN v2
        |        ON v1.o_orderkey = v2.o_orderkey)
        |SELECT o_orderkey,
        |  CASE WHEN NOT ino THEN 'added'
        |       WHEN NOT inn THEN 'removed'
        |       WHEN old_o_totalprice IS DISTINCT FROM new_o_totalprice
        |         OR old_o_orderstatus IS DISTINCT FROM new_o_orderstatus
        |       THEN 'changed' END AS action,
        |  old_o_totalprice, new_o_totalprice,
        |  old_o_orderstatus, new_o_orderstatus
        |FROM j
        |WHERE (NOT ino) OR (NOT inn)
        |  OR old_o_totalprice IS DISTINCT FROM new_o_totalprice
        |  OR old_o_orderstatus IS DISTINCT FROM new_o_orderstatus""".stripMargin,


    "merge_upsert" ->
      """WITH last AS (
        |  SELECT user_id AS key,
        |    CASE WHEN event_type = 'error' THEN 'delete'
        |         ELSE 'upsert' END AS op,
        |    value AS payload
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) = 1),
        |tgt AS (SELECT c_custkey AS key, c_acctbal AS payload,
        |          TRUE AS tin
        |        FROM customer),
        |m AS (SELECT coalesce(t.key, c.key) AS key, t.payload AS tp,
        |        t.tin, c.op, c.payload AS cp
        |      FROM tgt t FULL OUTER JOIN last c ON t.key = c.key)
        |SELECT key,
        |  CASE WHEN op IS NOT NULL THEN cp ELSE tp END AS payload,
        |  CASE WHEN op IS NULL THEN 'kept'
        |       WHEN tin IS NULL THEN 'inserted'
        |       ELSE 'updated' END AS action
        |FROM m WHERE op IS NULL OR op <> 'delete'""".stripMargin,

    // per-column max over the non-null (seq, value) struct = the LWW
    // fold with the same tie rule as the Spark max_by(value,
    // struct(seq, value)): DuckDB struct comparison is lexicographic
    // and max skips NULLs, so an untouched column never competes and
    // duplicate seqs break to the greater value in both engines
    "cdc_patch_apply" ->
      """WITH p AS (
        |  SELECT user_id * 11 AS key, event_id AS seq,
        |    CASE WHEN event_type IN ('click', 'purchase')
        |         THEN CAST(floor(value * 100) AS BIGINT) END AS bal,
        |    CASE WHEN event_type = 'view'
        |         THEN 'SEG_' || CAST(event_id % 5 AS VARCHAR) END AS seg
        |  FROM events),
        |f AS (
        |  SELECT key,
        |    max(CASE WHEN bal IS NOT NULL THEN struct_pack(s := seq, v := bal) END).v AS pbal,
        |    max(CASE WHEN seg IS NOT NULL THEN struct_pack(s := seq, v := seg) END).v AS pseg,
        |    TRUE AS pin
        |  FROM p GROUP BY 1),
        |t AS (SELECT c_custkey AS key,
        |        CAST(floor(c_acctbal * 100) AS BIGINT) AS bal,
        |        c_mktsegment AS seg, TRUE AS tin
        |      FROM customer)
        |SELECT coalesce(t.key, f.key) AS key,
        |  coalesce(f.pbal, t.bal) AS bal,
        |  coalesce(f.pseg, t.seg) AS seg,
        |  CASE WHEN f.pin IS NULL THEN 'kept'
        |       WHEN t.tin IS NULL THEN 'inserted'
        |       ELSE 'patched' END AS action
        |FROM t FULL OUTER JOIN f ON t.key = f.key""".stripMargin,

    "topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey) <= 3""".stripMargin,

    "topk_agg" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey) <= 3""".stripMargin,

    "sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 100000)""".stripMargin,

    "join_full_outer" ->
      """WITH c AS (SELECT user_id, count(*) AS n_clicks FROM events
        |           WHERE event_type = 'click' GROUP BY 1),
        |p AS (SELECT user_id, count(*) AS n_purchases FROM events
        |      WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT coalesce(c.user_id, p.user_id) AS user_id,
        |  coalesce(n_clicks, 0) AS n_clicks,
        |  coalesce(n_purchases, 0) AS n_purchases
        |FROM c FULL OUTER JOIN p ON c.user_id = p.user_id""".stripMargin,

    // date - row_number is constant within a run of consecutive days;
    // both engines compute exact integer day arithmetic
    "win_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |             CAST(make_timestamp(epoch_us(ts)) AS DATE) AS d
        |           FROM events),
        |g AS (SELECT user_id,
        |        date_diff('day', DATE '1970-01-01', d)
        |          - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
        |      FROM d),
        |s AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2)
        |SELECT user_id, max(len) AS longest_streak,
        |  count(*) AS n_streaks
        |FROM s GROUP BY 1""".stripMargin,

    "set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier""".stripMargin,

    "set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier WHERE s_suppkey % 3 = 0""".stripMargin,

    "sub_scalar" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 0.9 * (SELECT max(o_totalprice) FROM orders)""".stripMargin,

    "sub_in" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_nationkey IN (SELECT n_nationkey FROM nation
        |                      WHERE n_name LIKE 'NATION_1%')""".stripMargin,

    "json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events""".stripMargin,

    "date_parts" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS d,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(datediff('day', DATE '2020-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since
        |FROM orders""".stripMargin,

    "str_funcs" ->
      """SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
        |  CAST(length(p_name) AS INT) AS len,
        |  lpad(p_brand, 12, '*') AS pad,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS novowel,
        |  CAST(levenshtein(p_name, 'widget') AS INT) AS lev,
        |  p_brand || '|' || p_type AS cw,
        |  trim(p_name) AS tr
        |FROM part""".stripMargin,

    "hash_funcs" ->
      """SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256
        |FROM documents""".stripMargin,

    "tpch_q1" ->
      s"""SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM($rev) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "tpch_q3" ->
      s"""SELECT l_orderkey, o_orderdate,
        |  CAST(SUM($rev) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "tpch_q7" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  CAST(SUM($rev) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3""".stripMargin,

    "tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        |  o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
        |    AS sum_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY 1
        |  HAVING SUM(CAST(l_quantity AS BIGINT)) > 200)
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "tpch_q5" ->
      s"""SELECT n_name,
        |  CAST(SUM($rev) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin)
}
