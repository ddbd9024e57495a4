package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext._
import graft.ops.Dedup
import graft.sources.Tables
import graft.queries.ExtensionSupport._

/** Graph, time-series, event-window, layout, and profiling
  * query surface, each mirrored by a DuckDB oracle.
  *
  * Split from the one-file registry by family (round 9); entries and
  * oracle SQL are byte-identical to the pre-split registry.
  */
private[queries] object GraphTimeQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Z-order layout key over (user_id, value): the per-bucket census
    // proves the interleave clusters both dimensions — the write-time
    // sort key for double-column data skipping.
    "layout_zorder" -> { (s, dir) =>
      t(s, dir, "events")
        .select(Layout.zorder16(pmod(col("user_id"), lit(65536)),
          pmod(floor(col("value")).cast("long"), lit(65536))).as("zkey"))
        .groupBy((col("zkey") / 4096L).cast("long").as("zbucket"))
        .agg(count(lit(1)).as("n"), min("zkey").as("zmin"),
          max("zkey").as("zmax"))
    },


    // Bucketed co-located join: both sides hash-bucketed into the
    // same bucket count on doc_id, so the join needs NO exchange on
    // either side (PlanSpec pins it) — the write-once/join-many
    // physical layout for repeated fact-table joins at corpus scale.
    // The result is the plain join's rows, so the oracle is ordinary
    // SQL over the raw table. Table names and the output path are
    // derived from (applicationId, dir): concurrent sessions (or
    // parallel bench/verify runs on one machine) never race on a
    // shared catalog name or directory, and the write itself runs
    // ONCE per (session, dir) — write-once/join-many is the entire
    // point of the layout, so re-paying the physical write on every
    // invocation both misrepresented the operator's cost and raced
    // against itself.
    "layout_bucket_join" -> { (s, dir) =>
      bucketedLayout(s, dir)
      val sfx = bucketedSuffix(s, dir)
      s.table(s"graft_docs_bkt_$sfx")
        .join(s.table(s"graft_stats_bkt_$sfx"), "doc_id")
        .select("doc_id", "lang", "n_chars", "n_tokens")
    },


    // Hilbert layout key over the same two dimensions: the
    // locality-better write-time sort (consecutive keys always
    // grid-adjacent), computed by the native codegen kernel.
    "layout_hilbert" -> { (s, dir) =>
      t(s, dir, "events")
        .select(Layout.hilbert(pmod(col("user_id"), lit(256)),
          pmod(floor(col("value")).cast("long"), lit(256)), bits = 8)
          .as("hkey"))
        .groupBy((col("hkey") / 1024L).cast("long").as("hbucket"))
        .agg(count(lit(1)).as("n"), min("hkey").as("hmin"),
          max("hkey").as("hmax"))
    },


    // -- Graph analytics --------------------------------------------
    // PageRank over the customer↔supplier trade graph (bipartite,
    // symmetric edges from co-appearing on an order) — the link-graph
    // quality prior web corpora weight documents by (Common Crawl
    // host-rank filtering). Integer micro-unit damping (17/20), three
    // unrolled rounds; one shuffle per round on dst with map-side
    // partial sums, edges degree-annotated and checkpointed once.
    "graph_pagerank" -> { (s, dir) =>
      val nodes = t(s, dir, "customer")
        .select((col("c_custkey") * 2).as("node_id"))
        .unionAll(t(s, dir, "supplier")
          .select((col("s_suppkey") * 2 + 1).as("node_id")))
      Graph.pageRankPrepared(prGraph(s, dir), nodes, iters = 3)
    },


    // Exact triangle count on the co-purchase graph (parts sharing an
    // order, support ≥ 2 — the support floor drops the ~99% noise
    // tail of support-1 pairs). Degree-ordered orientation bounds the
    // wedge join at O(m^1.5) regardless of hub degree.
    "graph_triangles" -> { (s, dir) =>
      Graph.triangleStats(
        copurchaseEdges(s, dir).select(col("u"), col("v")))
    },


    // Label-propagation communities of the same co-purchase graph —
    // local-majority voting (3 synchronous rounds, ties to the
    // smallest label), the community structure connectivity can't
    // see when the graph is one giant component. Fourth consumer of
    // the shared copurchase_edges stage.
    "graph_lpa" -> { (s, dir) =>
      Graph.labelPropagation(copurchaseEdges(s, dir), iters = 3)
        .select(col("id").as("item_id"), col("label"))
    },


    // Communities of the same co-purchase graph: connectivity over
    // the SHARED copurchase_edges stage (build the graph once, run
    // every analysis on it) via the alternating star-contraction
    // components loop. Nodes are the edge endpoints — parts in at
    // least one support-≥2 relationship.
    "graph_communities" -> { (s, dir) =>
      val e = copurchaseEdges(s, dir)
      val nodes = e.select(col("u").as("id"))
        .unionAll(e.select(col("v").as("id"))).distinct()
      DedupOps.connectedComponents(nodes,
          e.select(col("u").as("id_a"), col("v").as("id_b")))
        .select(col("id").as("item_id"),
          col("component_id").as("community_id"))
    },


    // Equi-depth decile features: each doc's length decile within its
    // language — the quality-score bucketing every curation pipeline
    // feeds its classifier. Exact PERCENTILE_DISC cuts from ONE
    // bounded histogram fold per language, broadcast back map-side —
    // never a per-doc ranking window.
    "feat_equidepth_bins" -> { (s, dir) =>
      Profiling.equidepthBins(
        docs(s, dir).select(col("doc_id"), col("lang"), col("n_chars")),
        key = "lang", score = "n_chars", q = 10)
    },


    // Per-type winsorization of the metric stream: clamp each event's
    // centi-value into its type's exact [p05, p95] PERCENTILE_DISC
    // band — heavy-tail feature scaling with the per-key histogram
    // derived from the SHARED events_census stage (one counted
    // census, three consumers), thresholds broadcast back map-side,
    // no ranking window.
    "feat_winsorize" -> { (s, dir) =>
      val base = t(s, dir, "events").select(
        col("event_type").as("key"), col("event_id").as("id"),
        floor(col("value") * 100).cast("long").as("v"))
      val hist = eventsCensus(s, dir)
        .groupBy(col("event_type").as("key"), col("v"))
        .agg(sum("c").as("__c"))
      Profiling.winsorizeFromHist(base, hist, loBp = 500, hiBp = 9500)
        .select(col("id").as("event_id"), col("key").as("event_type"),
          col("v"), col("lo"), col("hi"), col("v_wins"))
    },


    // Bounded-hop BFS from the ten highest-degree items over the SAME
    // shared co-purchase graph — "what's within 3 hops of the hubs",
    // the frontier-expansion pattern (recommendation neighborhoods,
    // contamination blast radius). Third consumer of the
    // copurchase_edges stage.
    "graph_khop" -> { (s, dir) =>
      val e = copurchaseEdges(s, dir)
      val und = e.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(e.select(col("v").as("src"), col("u").as("dst")))
      val seeds = e.select(col("u").as("id"))
        .unionAll(e.select(col("v").as("id")))
        .groupBy("id").agg(count(lit(1)).as("__d"))
        .orderBy(col("__d").desc, col("id")).limit(10)
        .select(col("id"))
      Graph.kHopDistances(und, seeds, hops = 3)
        .select(col("id").as("item_id"), col("dist"))
    },


    // Degree assortativity of the shared co-purchase graph — does the
    // graph wire hubs to hubs (assortative, > 0) or hubs to leaves
    // (disassortative, < 0)? Pearson over edge-endpoint degrees via
    // the SAME exact-moment corrPpm kernel agg_corr uses — decimal
    // sums, two correctly-rounded sqrts, one divide, hash-matching
    // ppm. Both edge orientations included so the measure is
    // symmetric.
    "graph_assortativity" -> { (s, dir) =>
      val e = copurchaseEdges(s, dir).select(col("u"), col("v"))
      val und = e.unionAll(
        e.select(col("v").as("u"), col("u").as("v")))
      val deg = und.groupBy(col("u").as("__node"))
        .agg(count(lit(1)).as("__d"))
      val paired = und
        .join(deg.select(col("__node").as("__nu"),
          col("__d").as("__du")), col("u") === col("__nu"))
        .join(deg.select(col("__node").as("__nv"),
          col("__d").as("__dv")), col("v") === col("__nv"))
        .withColumn("graph", lit("copurchase"))
      graft.ops.Relational.corrPpm(paired, Seq("graph"),
        col("__du"), col("__dv"))
    },


    // Common-neighbor / Jaccard link prediction over the SAME shared
    // co-purchase graph (fourth consumer of the copurchase_edges
    // stage): wedge-generated candidates only — pairs with no shared
    // neighbor never exist — hub centers degree-capped before the
    // deg² pair blow-up, scores in exact integer micro-units.
    "graph_common_neighbors" -> { (s, dir) =>
      Graph.commonNeighborScores(
        copurchaseEdges(s, dir).select(col("u"), col("v")),
        minCommon = 2, maxDeg = 200)
    },


    // -- Distribution profiling / layout planning --------------------
    // The skew probe you run before a 100 TB join: exact top-20
    // heavy-hitter keys with ppm shares. TakeOrderedAndProject cap,
    // cumulative window only over the capped 20 rows.
    // per-column completeness census — the profiling staple run
    // before any pipeline trusts a new table: null and exact-distinct
    // counts for every column in ONE scan (all aggregates in a single
    // HashAggregate, then a constant-width unpivot of the 1-row
    // result — no per-column passes)
    "stats_completeness" -> { (s, dir) =>
      val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      val aggs = cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"))) :+
        count(lit(1)).as("__n")
      val one = t(s, dir, "customer").agg(aggs.head, aggs.tail: _*)
      val pairs = cols.flatMap(c => Seq(lit(c),
        struct(col(s"__null_$c").as("n_null"),
          col(s"__dist_$c").as("n_distinct"), col("__n").as("n_rows"))))
      one.select(explode(map(pairs: _*)).as(Seq("col_name", "__s")))
        .select(col("col_name"), col("__s.n_rows").as("n_rows"),
          col("__s.n_null").as("n_null"),
          col("__s.n_distinct").as("n_distinct"))
    },

    // Benford first-digit screen over the events value column —
    // string-based leading digit (never libm log10), exact ppm math
    "stats_benford" -> { (s, dir) =>
      Profiling.benfordProfile(t(s, dir, "events"), col("value"))
    },

    "stats_key_skew" -> { (s, dir) =>
      Profiling.keySkewProfile(t(s, dir, "lineitem"), col("l_partkey"),
        k = 20)
    },


    // Small-file compaction plan over a simulated file manifest
    // (documents rolled into ~16-doc files per source): deterministic
    // prefix-sum binning to ~32 KiB output buckets. Planner cost is
    // manifest-sized, one shuffle on the partition key.
    "layout_compaction" -> { (s, dir) =>
      val files = docs(s, dir)
        .groupBy(col("source").as("part"),
          expr("doc_id div 16").as("file_id"))
        .agg(sum("n_chars").as("bytes"))
      Layout.compactionPlan(files, targetBytes = 32768)
    },


    // -- Time-series shaping -----------------------------------------
    // Hourly grid resample with last-observation-carried-forward per
    // user: per-key span grids (no global calendar join), keyed
    // windows only.
    "ts_resample_locf" -> { (s, dir) =>
      TimeSeries.resampleLocf(
        t(s, dir, "events")
          .select(col("user_id").as("key"), col("ts"), col("value")),
        slotSeconds = 3600)
        .select(col("key").as("user_id"), col("slot"), col("v_locf"),
          col("observed"))
    },


    // Per-user EWMA (α = 1/2) in integer micro-units over the sorted
    // event history — the sequential-recursion-as-sorted-array-fold
    // pattern, bit-exact on any engine.
    // CUSUM changepoint per user: the split maximizing the exact
    // scaled statistic |n·prefix − k·total| — one keyed window pass,
    // no mean division anywhere
    "ts_changepoint" -> { (s, dir) =>
      TimeSeries.cusumChangepoint(
        t(s, dir, "events")
          .select(col("user_id").as("key"), col("ts"), col("value"),
            col("event_id")),
        tie = col("event_id"))
        .select(col("key").as("user_id"), col("n_events"),
          col("cp_k"), col("max_abs_scaled"))
    },

    // lag-1 autocorrelation per user — exact scaled moments, no mean
    // ever materialized, one IEEE divide at the end
    "ts_acf1" -> { (s, dir) =>
      TimeSeries.acf1(
        t(s, dir, "events")
          .select(col("user_id").as("key"), col("ts"), col("value"),
            col("event_id")),
        tie = col("event_id"))
        .select(col("key").as("user_id"), col("n_events"),
          col("r1_ppm"))
    },

    "ts_ewma" -> { (s, dir) =>
      TimeSeries.ewmaFixed(
        t(s, dir, "events")
          .select(col("user_id").as("key"), col("ts"), col("value"),
            col("event_id")),
        tie = col("event_id"))
        .select(col("key").as("user_id"), col("n_events"),
          col("ewma_micros"))
    },


    // Hourly OHLC bars per event type — the metrics-rollup
    // compaction in ONE partial-agg-friendly aggregation: min_by /
    // max_by over (ts, event_id) pick open/close deterministically
    // under timestamp ties, micro-unit longs keep every column
    // bit-exact.
    "ts_ohlc" -> { (s, dir) =>
      TimeSeries.ohlcBars(
        t(s, dir, "events")
          .select(col("event_type").as("key"), col("ts"),
            col("value"), col("event_id")),
        bucketSeconds = 3600, tie = col("event_id"))
        .select(col("key").as("event_type"), col("bucket"),
          col("open_micros"), col("high_micros"), col("low_micros"),
          col("close_micros"), col("volume_micros"), col("n"))
    },


    // Declarative data-quality gate (the Deequ shape): the whole
    // row-level suite in ONE scan, uniqueness as a partial-agg
    // groupBy, referential integrity as a distinct-distinct anti
    // join. Thresholds chosen to exercise BOTH outcomes on the
    // fixture: the completeness/range/FK checks pass, the 90%-low-
    // discount and order-line-uniqueness checks genuinely fail.
    "quality_constraints" -> { (s, dir) =>
      Quality.report(t(s, dir, "lineitem"), Seq(
        Quality.Complete("l_quantity_complete", "l_quantity"),
        Quality.InRange("l_quantity_in_1_50", "l_quantity", 1.0, 50.0),
        Quality.InRange("l_discount_low_90pct", "l_discount",
          0.0, 0.05, minPpm = 900000L),
        Quality.Unique("order_line_unique",
          Seq("l_orderkey", "l_linenumber")),
        Quality.SubsetOf("orderkey_in_orders", "l_orderkey",
          t(s, dir, "orders"), "o_orderkey")))
    },


    // Robust per-user outlier flags on the metric stream — median/MAD
    // in exact centi-units (floor(value*100), the house double→long
    // idiom), mult = 3; only the anomalous events survive. The
    // monitoring shape: two bounded histogram folds per key, no
    // window, a hot user costs its distinct-value census not its row
    // list.
    "ts_anomaly" -> { (s, dir) =>
      val base = t(s, dir, "events").select(
        col("user_id").as("key"), col("event_id").as("id"),
        floor(col("value") * 100).cast("long").as("v"))
      // The census feeds the per-user histogram UNMERGED (duplicate
      // (key, v) rows across event_type/late cells — the
      // multi-histogram contract of madOutliersFromHist): a
      // groupBy(key, v) re-agg here combined 99 958 → 99 627 rows at
      // sf0.1 (0.3% — v is a near-continuous centi-metric, so the
      // finer census cells almost never share a (user, v)), i.e. a
      // full extra exchange + sequential stage for no volume
      // reduction, at any scale with this value-domain shape.
      val hist = eventsCensus(s, dir)
        .select(col("user_id").as("key"), col("v"), col("c").as("__c"))
      Profiling.madOutliersFromHist(base, hist, mult = 3)
        .select(col("id").as("event_id"), col("key").as("user_id"),
          col("v"), col("med"), col("dev"), col("mad"))
    },


    // Exact-integer target encoding of event_type against the metric:
    // leave-one-out micro-mean (train-time, no self-label leak) and
    // m=10-smoothed mean (serve-time); one category agg + one global
    // row broadcast back, map-only per row.
    "feat_target_encode" -> { (s, dir) =>
      Profiling.targetEncode(t(s, dir, "events"),
        key = col("event_type"), id = col("event_id"),
        value = floor(col("value") * 100), m = 10)
        .select(col("id").as("event_id"), col("key").as("event_type"),
          col("v"), col("enc_loo_micro"), col("enc_smooth_micro"))
    },


    // Exact-moment z-score standardization per event type: z =
    // (n·x − S)/√(n·Σx² − S²) — the mean and σ never materialize,
    // the sums stay exact decimal(38,0), and the finish is one
    // correctly-rounded IEEE sqrt + one divide (both bit-identical
    // cross-engine), so z_ppm hash-matches; zero variance → NULL
    "feat_standardize" -> { (s, dir) =>
      val base = t(s, dir, "events").select(
        col("event_type").as("key"), col("event_id"),
        floor(col("value") * 1000000).cast("long").as("v"))
      val stats = base.groupBy(col("key").as("__sk"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
          sum(col("v").cast("decimal(38,0)")).as("__s"),
          sum(col("v").cast("decimal(38,0)") * col("v")).as("__s2"))
      base.join(broadcast(stats), col("key") === col("__sk"))
        .withColumn("__den",
          col("__n") * col("__s2") - col("__s") * col("__s"))
        .select(col("event_id"), col("key").as("event_type"), col("v"),
          when(col("__den") <= 0, lit(null)).otherwise(
            floor((col("__n") * col("v") - col("__s")).cast("double")
              / sqrt(col("__den").cast("double")) * 1000000.0)
              .cast("long")).as("z_ppm"))
    },


    // Recency-weighted activity score per user as of mid-month —
    // exact integer half-life-per-day decay (10⁶ >> age_days), one
    // map-side-combinable aggregation; the trending primitive with
    // no float exp() anywhere.
    "ts_decay_score" -> { (s, dir) =>
      TimeSeries.decayScore(
        t(s, dir, "events").select(col("user_id").as("key"), col("ts")),
        asOf = "2024-01-15")
        .select(col("key").as("user_id"), col("n_events"),
          col("decay_score"))
    },


    // Distribution drift between the month's two halves, per event
    // type: exact integer two-sample KS (cross-product CDF compare
    // over one merged value histogram, keyed window — the global
    // unpartitioned-window ban holds). The train-vs-serve drift
    // monitor.
    "stats_drift_ks" -> { (s, dir) =>
      val hist = eventsCensus(s, dir)
        .filter(col("v").isNotNull)
        .groupBy(col("event_type").as("key"), col("v"))
        .agg(sum(when(!col("late"), col("c")).otherwise(0L)).as("__ca"),
          sum(when(col("late"), col("c")).otherwise(0L)).as("__cb"))
      Profiling.ksDriftFromHist(hist)
        .select(col("key").as("event_type"), col("n_a"), col("n_b"),
          col("ks_ppm"))
    },


    // Per-user OLS drift of the metric stream — exact integer moment
    // sums (x re-based to each user's first event, y in centi-units),
    // one fixed IEEE divide at the finish; two co-partitioned hash
    // aggs, no window. slope_micro = ⌊10⁶ · centi-units/second⌋.
    "ts_trend" -> { (s, dir) =>
      TimeSeries.linearTrendMicro(
        t(s, dir, "events").select(col("user_id").as("key"),
          col("ts"), col("value")))
        .select(col("key").as("user_id"), col("n"),
          col("slope_micro"), col("mean_centi"))
    },


    // -- Event-time windowing / ordered joins ------------------------
    "ew_tumbling" -> { (s, dir) =>
      EventWindows.tumbling(t(s, dir, "events"), "1 hour")
    },


    "ew_sliding" -> { (s, dir) =>
      EventWindows.sliding(t(s, dir, "events"), "1 hour", "15 minutes")
    },


    "ew_sessions" -> { (s, dir) =>
      EventWindows.sessions(t(s, dir, "events"), col("user_id"),
        "30 minutes")
    },


    // Weekly cohort retention matrix: first-activity week × weeks
    // since, distinct returning users — exact integer week offsets.
    "ew_retention" -> { (s, dir) =>
      EventWindows.retention(t(s, dir, "events"), col("user_id"),
        col("ts"))
    },


    // Ordered funnel (MATCH_RECOGNIZE-lite): signup → click →
    // purchase per user, each gap ≤ 1 day; greedy-latest chain,
    // one exchange + one sort for the whole pattern.
    "ew_funnel" -> { (s, dir) =>
      EventWindows.funnel(t(s, dir, "events"), col("user_id"),
        col("ts"), col("event_id"), col("event_type"),
        steps = Seq("signup", "click", "purchase"), within = "1 day")
    },


    // Range join: every event inside the 2-hour window after a signup
    // by the same user (bucket width = 1h ⇒ each interval covers ≤ 3
    // buckets).
    "ew_range_join" -> { (s, dir) =>
      val e = t(s, dir, "events")
      val signups = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("win_start"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("win_end"))
      EventWindows.rangeJoin(
        e.select(col("user_id"), col("ts"), col("event_id")),
        signups, "user_id", "ts", "win_start", "win_end",
        bucketSeconds = 3600)
        .select("event_id", "user_id", "ts", "win_start")
    },


    // Interval join via the STREAMING operator's batch twin (the same
    // plan minus watermarks — withWatermark is a no-op on batch): all
    // clicks within the hour after a view by the same user. This is
    // the oracle-checked half of the stream/batch equivalence pair;
    // StreamSpec asserts the streaming run emits exactly these rows.
    "ew_interval_join" -> { (s, dir) =>
      val e = t(s, dir, "events")
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      graft.streaming.StreamOps.intervalJoin(views, clicks, "user_id",
        "0 seconds", "1 hour", "1 hour")
        .select(col("left_event_id").as("view_id"),
          col("left_user_id").as("user_id"), col("left_ts").as("view_ts"),
          col("right_event_id").as("click_id"), col("right_ts").as("click_ts"))
    },


    "ew_asof_join" -> { (s, dir) =>
      val e = t(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      val purchases = Dedup.lastWins(
        e.filter(col("event_type") === "purchase"),
        Seq("user_id", "ts"), col("event_id"), Seq("value"))
      EventWindows.asofJoin(clicks, purchases, "user_id", "ts",
        Seq("value"))
    },


    // The tolerance-bounded variant (pandas merge_asof parity): a
    // purchase more than a day before the click is no match.
    "ew_asof_tolerance" -> { (s, dir) =>
      val e = t(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      val purchases = Dedup.lastWins(
        e.filter(col("event_type") === "purchase"),
        Seq("user_id", "ts"), col("event_id"), Seq("value"))
      EventWindows.asofJoinTolerance(clicks, purchases, "user_id", "ts",
        Seq("value"), toleranceSeconds = 86400L)
    },


    // Same query through the custom plan node (logical + strategy +
    // sorted-merge SparkPlan) — oracle-checked end to end.
    "ew_asof_native" -> { (s, dir) =>
      val e = t(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      val purchases = Dedup.lastWins(
        e.filter(col("event_type") === "purchase"),
        Seq("user_id", "ts"), col("event_id"), Seq("value"))
      EventWindows.asofJoinNative(clicks, purchases, "user_id", "ts",
        Seq("value"))
    },
  )

  val oracleSql: Map[String, String] = Map(
    "graph_pagerank" ->
      s"""WITH ${pageRankCtes(3)}
         |SELECT node_id, r AS rank_micros FROM r3""".stripMargin,


    "graph_assortativity" ->
      (s"""WITH $copurchaseCtes,
        |und AS (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
        |deg AS (SELECT u AS node, count(*) AS d FROM und GROUP BY 1),
        |c AS (SELECT CAST(du.d * 100 AS BIGINT) AS x,
        |    CAST(dv.d * 100 AS BIGINT) AS y
        |  FROM und e JOIN deg du ON du.node = e.u
        |             JOIN deg dv ON dv.node = e.v),
        |a AS (SELECT count(*) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy
        |  FROM c)
        |SELECT 'copurchase' AS graph, n,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |  THEN CAST(floor(
        |    CAST(n * sxy - sx * sy AS DOUBLE)
        |      / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |         * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
        |    * 1000000.0) AS BIGINT) END AS corr_ppm
        |FROM a""".stripMargin),

    // round-17 oracle strengthening: n_triangles counts canonical
    // a<b<c edge triples — INDEPENDENT of the Spark side's
    // degree-orientation join mechanics (any orientation closes the
    // same triangles exactly once, so a broken orientation or wedge
    // join fails parity instead of being mirrored). n_wedges is
    // orientation-DEFINED output (the operator's spec), but derives
    // here from the out-degree combinatorics Σ C(d_out, 2) rather
    // than replaying the wedge self-join.
    "graph_triangles" ->
      (s"""WITH $copurchaseCtes,
        |deg AS (SELECT node, count(*) AS d FROM (
        |          SELECT u AS node FROM edges
        |          UNION ALL SELECT v FROM edges) GROUP BY 1),
        |ori AS (SELECT
        |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
        |         THEN e.u ELSE e.v END AS src,
        |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
        |         THEN e.v ELSE e.u END AS dst
        |  FROM edges e JOIN deg du ON du.node = e.u
        |               JOIN deg dv ON dv.node = e.v),
        |outd AS (SELECT src, count(*) AS d FROM ori GROUP BY 1),
        |tri AS (SELECT 1 AS one
        |        FROM edges e1 JOIN edges e2 ON e2.u = e1.v
        |          JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT (SELECT count(*) FROM deg) AS n_nodes,
        |       (SELECT count(*) FROM edges) AS n_edges,
        |       (SELECT CAST(coalesce(sum(d * (d - 1) // 2), 0)
        |                AS BIGINT) FROM outd) AS n_wedges,
        |       (SELECT count(*) FROM tri) AS n_triangles""".stripMargin),


    // unrolled frontier expansion over the shared co-purchase CTEs;
    // min(dist) per round mirrors the Spark relaxation fold exactly
    "graph_khop" ->
      (s"""WITH $copurchaseCtes,
        |und AS (SELECT u AS src, v AS dst FROM edges
        |        UNION ALL SELECT v, u FROM edges),
        |degn AS (SELECT id, count(*) AS d FROM (
        |           SELECT u AS id FROM edges
        |           UNION ALL SELECT v FROM edges) GROUP BY 1),
        |seeds AS (SELECT id FROM degn ORDER BY d DESC, id LIMIT 10),
        |d0 AS (SELECT id, 0 AS dist FROM seeds),
        |${(1 to 3).map { h =>
             s"""d$h AS (SELECT id, min(dist) AS dist FROM (
                |  SELECT id, dist FROM d${h - 1}
                |  UNION ALL
                |  SELECT und.dst AS id, $h AS dist
                |  FROM und JOIN d${h - 1} ON und.src = d${h - 1}.id)
                |  GROUP BY id)""".stripMargin
           }.mkString(",\n")}
        |SELECT id AS item_id, dist FROM d3""".stripMargin),


    // the same three synchronous voting rounds unrolled (argmax =
    // row_number over (n DESC, label ASC) — the deterministic
    // min-label tie rule the Spark max_by struct encodes)
    "graph_lpa" ->
      (s"""WITH $copurchaseCtes,
         |sym AS (SELECT u AS node, v AS nbr FROM edges
         |        UNION ALL SELECT v AS node, u AS nbr FROM edges),
         |l0 AS (SELECT DISTINCT node AS id, node AS label FROM sym),""" +
        (1 to 3).map { r =>
          s"""
         |c$r AS (SELECT s.node, l.label, count(*) AS n FROM sym s
         |        JOIN l${r - 1} l ON l.id = s.nbr GROUP BY 1, 2),
         |l$r AS (SELECT node AS id, label FROM c$r
         |        QUALIFY row_number() OVER (PARTITION BY node
         |          ORDER BY n DESC, label) = 1)"""
        }.mkString(",") + """
         |SELECT id AS item_id, label FROM l3""").stripMargin,


    // transitive closure over the shared co-purchase edge CTEs —
    // min reachable item per node, same label convention as
    // dedup_components
    "graph_communities" ->
      (s"""WITH RECURSIVE $copurchaseCtes,
        |nodes AS (SELECT DISTINCT u AS id FROM edges
        |          UNION SELECT v FROM edges),
        |e2 AS (SELECT u AS ea, v AS eb FROM edges
        |       UNION ALL SELECT v, u FROM edges),
        |reach(src, dst) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT r.src, e.eb FROM reach r JOIN e2 e ON r.dst = e.ea)
        |SELECT src AS item_id, min(dst) AS community_id
        |FROM reach GROUP BY src""".stripMargin),


    // wedge-generated candidate pairs (never all-pairs), hub centers
    // capped at degree 200, floor division exact on the nonnegative
    // operands — mirrors Graph.commonNeighborScores step for step
    "graph_common_neighbors" ->
      (s"""WITH $copurchaseCtes,
        |adj AS (SELECT u AS node, v AS nbr FROM edges
        |        UNION ALL SELECT v, u FROM edges),
        |deg AS (SELECT node, count(*) AS d FROM adj GROUP BY 1),
        |ctr AS (SELECT node FROM deg WHERE d BETWEEN 2 AND 200),
        |a2 AS (SELECT a.node, a.nbr FROM adj a JOIN ctr USING (node)),
        |w AS (SELECT a.nbr AS u, b.nbr AS v, count(*) AS common
        |      FROM a2 a JOIN a2 b ON a.node = b.node AND a.nbr < b.nbr
        |      GROUP BY 1, 2
        |      HAVING count(*) >= 2)
        |SELECT w.u, w.v, w.common,
        |  CAST(w.common * 1000000 // (du.d + dv.d - w.common) AS BIGINT)
        |    AS jaccard_micro
        |FROM w JOIN deg du ON du.node = w.u
        |       JOIN deg dv ON dv.node = w.v""".stripMargin),


    // threshold_i = max score whose strictly-below count is < n·i/q
    // (the same monotone-prefix rule the Spark fold applies); bin =
    // number of thresholds strictly below the row's score. The
    // threshold join is null-safe (IS NOT DISTINCT FROM) to encode the
    // operator's NULL-key-is-a-group contract — lang is non-null in
    // the fixtures, but the oracle must encode the contract.
    "feat_equidepth_bins" ->
      """WITH h AS (SELECT lang, n_chars AS s, count(*) AS c
        |           FROM documents GROUP BY 1, 2),
        |hh AS (SELECT lang, s, c,
        |         sum(c) OVER (PARTITION BY lang ORDER BY s
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
        |           AS below,
        |         sum(c) OVER (PARTITION BY lang) AS n
        |       FROM h),
        |th AS (SELECT lang, i,
        |         max(CASE WHEN below * 10 < n * i THEN s END) AS t
        |       FROM hh, unnest(range(1, 10)) AS u(i) GROUP BY 1, 2)
        |SELECT d.doc_id, d.lang, d.n_chars,
        |  CAST(count(CASE WHEN d.n_chars > th.t THEN 1 END) AS INT) AS bin
        |FROM documents d JOIN th ON d.lang IS NOT DISTINCT FROM th.lang
        |GROUP BY 1, 2, 3""".stripMargin,


    // PERCENTILE_DISC thresholds are exactly the histogram fold's
    // rule (largest v with 10⁴·below(v) < n·bp — same monotone-prefix
    // argument as the median fold); clamp guarded on NULL v because
    // Spark/DuckDB least/greatest NULL handling differs
    "feat_winsorize" ->
      """WITH e AS (SELECT event_id, event_type,
        |        CAST(floor(value * 100) AS BIGINT) AS v FROM events),
        |q AS (SELECT event_type,
        |        PERCENTILE_DISC(0.05) WITHIN GROUP (ORDER BY v) AS lo,
        |        PERCENTILE_DISC(0.95) WITHIN GROUP (ORDER BY v) AS hi
        |      FROM e GROUP BY 1)
        |SELECT e.event_id, e.event_type, e.v, q.lo, q.hi,
        |  CASE WHEN e.v IS NULL THEN NULL
        |       ELSE least(greatest(e.v, q.lo), q.hi) END AS v_wins
        |FROM e JOIN q
        |  ON e.event_type IS NOT DISTINCT FROM q.event_type"""
        .stripMargin,


    // same exact sums and truncating division; HUGEINT keeps the
    // micro-scaled products exact, // = Spark div on these operands
    "feat_target_encode" ->
      """WITH e AS (SELECT event_id, event_type,
        |        CAST(floor(value * 100) AS BIGINT) AS v FROM events),
        |c AS (SELECT event_type, CAST(sum(v) AS HUGEINT) AS s,
        |        count(v) AS n FROM e GROUP BY 1),
        |g AS (SELECT CAST(sum(v) AS HUGEINT) AS gs, count(v) AS gn FROM e)
        |SELECT e.event_id, e.event_type, e.v,
        |  CASE WHEN e.v IS NOT NULL AND c.n > 1 THEN
        |    CAST(((s - e.v) * 1000000) // (n - 1) AS BIGINT)
        |  END AS enc_loo_micro,
        |  CASE WHEN e.v IS NOT NULL THEN
        |    CAST(((s * gn + 10 * gs) * 1000000) // ((n + 10) * gn) AS BIGINT)
        |  END AS enc_smooth_micro
        |FROM e
        |JOIN c ON e.event_type IS NOT DISTINCT FROM c.event_type, g"""
        .stripMargin,


    // same shift-decay; DuckDB >> on BIGINT with the same explicit
    // 62 cap (JVM shifts wrap at 64, DuckDB's do not — the cap pins
    // one shared semantics)
    "ts_decay_score" ->
      """SELECT user_id,
        |  count(*) AS n_events,
        |  CAST(sum(1000000 >> least(
        |    date_diff('day', CAST(ts AS DATE), DATE '2024-01-15'),
        |    62)) AS BIGINT) AS decay_score
        |FROM events
        |WHERE CAST(ts AS DATE) <= DATE '2024-01-15'
        |GROUP BY 1""".stripMargin,


    // the same merged-histogram keyed-window CDF build; HUGEINT
    // cross-products keep the CDF compare exact, // = Spark div on
    // the nonnegative operands. Each side tests its OWN predicate
    // (< and >=) so a NULL ts lands in NEITHER CDF — the Spark
    // census's when(late)/when(!late) both fall to otherwise(0) on
    // NULL; an ELSE-1 'b' leg would count NULL-ts events as late
    "stats_drift_ks" ->
      """WITH e AS (SELECT event_type,
        |        CAST(floor(value * 100) AS BIGINT) AS v,
        |        CASE WHEN CAST(ts AS DATE) < DATE '2024-01-15'
        |             THEN 1 ELSE 0 END AS a,
        |        CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-15'
        |             THEN 1 ELSE 0 END AS b
        |      FROM events WHERE value IS NOT NULL),
        |h AS (SELECT event_type, v, sum(a) AS ca, sum(b) AS cb
        |      FROM e GROUP BY 1, 2),
        |c AS (SELECT event_type,
        |        sum(ca) OVER (PARTITION BY event_type ORDER BY v)
        |          AS cuma,
        |        sum(cb) OVER (PARTITION BY event_type ORDER BY v)
        |          AS cumb,
        |        sum(ca) OVER (PARTITION BY event_type) AS na,
        |        sum(cb) OVER (PARTITION BY event_type) AS nb
        |      FROM h)
        |SELECT event_type, CAST(max(na) AS BIGINT) AS n_a,
        |  CAST(max(nb) AS BIGINT) AS n_b,
        |  CASE WHEN max(na) > 0 AND max(nb) > 0 THEN
        |    CAST((max(abs(CAST(cuma AS HUGEINT) * nb
        |                  - CAST(cumb AS HUGEINT) * na)) * 1000000)
        |         // (CAST(max(na) AS HUGEINT) * max(nb)) AS BIGINT)
        |  END AS ks_ppm
        |FROM c GROUP BY 1""".stripMargin,


    // exact HUGEINT moment sums over (seconds since the user's first
    // event, centi-value); the finish is the same one-divide double
    // sequence the Spark side runs, so slope_micro is bit-identical;
    // // truncates toward zero in DuckDB 1.0 = Spark div
    "ts_trend" ->
      """WITH e AS (SELECT user_id,
        |        (epoch_us(ts)
        |         - min(epoch_us(ts)) OVER (PARTITION BY user_id))
        |          // 1000000 AS x,
        |        CAST(floor(value * 100) AS BIGINT) AS y FROM events
        |      WHERE ts IS NOT NULL AND value IS NOT NULL),
        |m AS (SELECT user_id, count(*) AS n,
        |        sum(CAST(x AS HUGEINT)) AS sx,
        |        sum(CAST(y AS HUGEINT)) AS sy,
        |        sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
        |        sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
        |      FROM e GROUP BY 1)
        |SELECT user_id, n,
        |  CASE WHEN n * sxx - sx * sx > 0 THEN
        |    CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
        |               / CAST(n * sxx - sx * sx AS DOUBLE)
        |               * 1000000) AS BIGINT) END AS slope_micro,
        |  CAST(sy // CAST(n AS HUGEINT) AS BIGINT) AS mean_centi
        |FROM m""".stripMargin,


    // NULLS FIRST pins DuckDB (default NULLS LAST on ASC) to the
    // operator's contract: NULL is the SMALLEST key in the tie order
    // (Spark's default ASC placement). l_partkey is non-null in the
    // fixtures, but the oracle must encode the contract, not the
    // fixture.
    "feat_standardize" ->
      (s"""WITH $evtCte,
        |b AS (SELECT event_type, event_id,
        |    CAST(floor(value * 1000000) AS HUGEINT) AS v
        |  FROM evts),
        |st AS (SELECT event_type, count(*) AS n, sum(v) AS s,
        |    sum(v * v) AS s2
        |  FROM b GROUP BY 1)
        |SELECT b.event_id, b.event_type, CAST(b.v AS BIGINT) AS v,
        |  CAST(CASE WHEN n * s2 - s * s <= 0 THEN NULL
        |    ELSE floor(CAST(n * b.v - s AS DOUBLE)
        |      / sqrt(CAST(n * s2 - s * s AS DOUBLE)) * 1000000.0)
        |  END AS BIGINT) AS z_ppm
        |FROM b JOIN st USING (event_type)""".stripMargin),

    "stats_completeness" ->
      """SELECT u.col_name, CAST(t.n AS BIGINT) AS n_rows,
        |  CAST(u.n_null AS BIGINT) AS n_null,
        |  CAST(u.n_distinct AS BIGINT) AS n_distinct
        |FROM (SELECT count(*) AS n,
        |    sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS k_n,
        |    count(DISTINCT c_custkey) AS k_d,
        |    sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS nm_n,
        |    count(DISTINCT c_name) AS nm_d,
        |    sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS na_n,
        |    count(DISTINCT c_nationkey) AS na_d,
        |    sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS ab_n,
        |    count(DISTINCT c_acctbal) AS ab_d,
        |    sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS ms_n,
        |    count(DISTINCT c_mktsegment) AS ms_d
        |  FROM customer) t,
        |  LATERAL (VALUES ('c_custkey', t.k_n, t.k_d),
        |    ('c_name', t.nm_n, t.nm_d),
        |    ('c_nationkey', t.na_n, t.na_d),
        |    ('c_acctbal', t.ab_n, t.ab_d),
        |    ('c_mktsegment', t.ms_n, t.ms_d))
        |    AS u(col_name, n_null, n_distinct)""".stripMargin,

    // every digit 1-9 emits a row (unobserved digits report n_obs 0
    // with dev_ppm = benford_ppm — the strongest fabrication signal
    // must not vanish from the report), mirroring the Spark side's
    // digit-frame left join
    "stats_benford" ->
      """WITH m AS (SELECT CAST(floor(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS m
        |  FROM events WHERE floor(CAST(value AS DOUBLE) * 1000000) > 0),
        |d AS (SELECT CAST(substr(CAST(m AS VARCHAR), 1, 1) AS INT)
        |    AS digit FROM m),
        |c AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY 1),
        |t AS (SELECT sum(n_obs) AS total FROM c),
        |e(digit, benford_ppm) AS (VALUES (1, 301029), (2, 176091),
        |  (3, 124938), (4, 96910), (5, 79181), (6, 66946),
        |  (7, 57991), (8, 51152), (9, 45757))
        |SELECT e.digit, coalesce(c.n_obs, 0) AS n_obs,
        |  CAST(coalesce(c.n_obs, 0) * 1000000 // t.total AS BIGINT) AS obs_ppm,
        |  CAST(e.benford_ppm AS BIGINT) AS benford_ppm,
        |  CAST(abs(coalesce(c.n_obs, 0) * 1000000 // t.total - e.benford_ppm)
        |    AS BIGINT) AS dev_ppm
        |FROM e LEFT JOIN c ON e.digit = c.digit CROSS JOIN t""".stripMargin,

    "stats_key_skew" ->
      """WITH counts AS (SELECT l_partkey AS key, count(*) AS n
        |                FROM lineitem GROUP BY 1),
        |tot AS (SELECT sum(n) AS tot FROM counts),
        |top AS (SELECT key, n FROM counts
        |        ORDER BY n DESC, key NULLS FIRST LIMIT 20)
        |SELECT key, n,
        |  CAST(row_number() OVER (ORDER BY n DESC, key NULLS FIRST)
        |    AS INT) AS rank,
        |  CAST(n * 1000000 // tot AS BIGINT) AS share_ppm,
        |  CAST(sum(n) OVER (ORDER BY n DESC, key NULLS FIRST
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |       * 1000000 // tot AS BIGINT) AS cum_ppm
        |FROM top, tot""".stripMargin,


    "layout_compaction" ->
      """WITH files AS (SELECT source AS part, doc_id // 16 AS file_id,
        |                 CAST(sum(n_chars) AS BIGINT) AS bytes
        |               FROM documents GROUP BY 1, 2)
        |SELECT part, file_id, bytes,
        |  CAST((sum(bytes) OVER (PARTITION BY part ORDER BY file_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        - bytes) // 32768 AS BIGINT) AS out_bucket
        |FROM files""".stripMargin,


    // slot = FLOOR(epoch / 3600s): DuckDB's `//` truncates toward zero
    // (verified on 1.0.0: -3 // 2 = -1), so the CASE turns it into the
    // floor the Spark side computes — pre-1970 events bucket to the
    // slot at-or-before them on both engines. Fixture epochs are
    // nonnegative, where the two divisions coincide.
    "ts_resample_locf" ->
      (s"""WITH $evtCte,
        |slotted AS (SELECT user_id,
        |    make_timestamp((epoch_us(ts) // 3600000000
        |        - CASE WHEN epoch_us(ts) % 3600000000 < 0
        |               THEN 1 ELSE 0 END) * 3600000000) AS slot,
        |    max(value) AS v
        |  FROM evts GROUP BY 1, 2),
        |span AS (SELECT user_id, min(slot) AS lo, max(slot) AS hi
        |         FROM slotted GROUP BY 1),
        |grid AS (SELECT user_id,
        |    unnest(generate_series(lo, hi, INTERVAL 3600 SECOND)) AS slot
        |  FROM span),
        |j AS (SELECT g.user_id, g.slot, s.v
        |      FROM grid g LEFT JOIN slotted s
        |        ON g.user_id = s.user_id AND g.slot = s.slot)
        |SELECT user_id, slot,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY slot ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS v_locf,
        |  v IS NOT NULL AS observed
        |FROM j""".stripMargin),


    // (acc + x) // 2 in DuckDB 1.0 TRUNCATES toward zero (verified:
    // -3 // 2 = -1), exactly like Spark's `div` in ewmaFixed and
    // Scala's `/` in the streaming twin — all three engines share
    // truncation semantics for any sign, so the bit-exact claim holds
    // on negative accumulators too (GraphTimeSeriesSpec pins the
    // Spark/Scala pair on a negative-value fixture).
    // the scaled-moments autocorrelation replayed in HUGEINT
    "ts_acf1" ->
      (s"""WITH $evtCte,
        |b AS (SELECT user_id, ts, event_id,
        |    CAST(floor(value * 1000000) AS HUGEINT) AS v
        |  FROM evts WHERE ts IS NOT NULL AND value IS NOT NULL),
        |w AS (SELECT user_id, v,
        |    lag(v) OVER win AS pv,
        |    first_value(v) OVER win AS x0,
        |    first_value(v) OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS xn
        |  FROM b
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |a AS (SELECT user_id, count(*) AS n, sum(v) AS s,
        |    sum(v * v) AS s2, sum(v * pv) AS sxy,
        |    max(x0) AS x0, max(xn) AS xn
        |  FROM w GROUP BY 1)
        |SELECT user_id, CAST(n AS BIGINT) AS n_events,
        |  CAST(CASE WHEN n * n * s2 - n * s * s = 0 THEN NULL
        |    ELSE floor(
        |      CAST(n * n * sxy - n * s * (2 * s - x0 - xn)
        |           + (n - 1) * s * s AS DOUBLE)
        |      / CAST(n * n * s2 - n * s * s AS DOUBLE)
        |      * 1000000.0) END AS BIGINT) AS r1_ppm
        |FROM a""".stripMargin),

    // the scaled CUSUM replayed: HUGEINT prefix/total sums, argmax
    // with the earliest-k tie-break
    "ts_changepoint" ->
      (s"""WITH $evtCte,
        |b AS (SELECT user_id, ts, event_id,
        |    CAST(floor(value * 1000000) AS HUGEINT) AS v
        |  FROM evts WHERE ts IS NOT NULL AND value IS NOT NULL),
        |w AS (SELECT user_id, ts, event_id,
        |    row_number() OVER win AS k,
        |    sum(v) OVER win AS prefix,
        |    count(*) OVER (PARTITION BY user_id) AS n,
        |    sum(v) OVER (PARTITION BY user_id) AS total
        |  FROM b
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, k, n,
        |    abs(prefix * n - total * k) AS sa
        |  FROM w WHERE k < n)
        |SELECT user_id, CAST(n AS BIGINT) AS n_events,
        |  CAST(k AS INT) AS cp_k,
        |  CAST(sa AS BIGINT) AS max_abs_scaled
        |FROM s QUALIFY row_number() OVER (PARTITION BY user_id
        |  ORDER BY sa DESC, k) = 1""".stripMargin),

    "ts_ewma" ->
      (s"""WITH $evtCte,
        |l AS (SELECT user_id,
        |        list(CAST(floor(value * 1000000) AS BIGINT)
        |             ORDER BY ts, event_id) AS vs
        |      FROM evts
        |      WHERE ts IS NOT NULL AND value IS NOT NULL
        |      GROUP BY 1)
        |SELECT user_id, CAST(len(vs) AS BIGINT) AS n_events,
        |  list_reduce(vs, (acc, x) -> (acc + x) // 2) AS ewma_micros
        |FROM l""".stripMargin),


    // bucket floor written with the same CASE-corrected `//` as
    // ts_resample_locf (fixture epochs nonnegative, where floor ==
    // truncation); open/close via the (ts, event_id) total-order
    // window, every value column in exact micro-unit BIGINTs
    "ts_ohlc" ->
      (s"""WITH $evtCte,
        |e AS (SELECT event_type, event_id, ts,
        |    make_timestamp((epoch_us(ts) // 3600000000
        |        - CASE WHEN epoch_us(ts) % 3600000000 < 0
        |               THEN 1 ELSE 0 END) * 3600000000) AS bucket,
        |    CAST(floor(value * 1000000) AS BIGINT) AS v
        |  FROM evts
        |  WHERE ts IS NOT NULL AND value IS NOT NULL),
        |w AS (SELECT event_type, bucket, v,
        |    first_value(v) OVER (PARTITION BY event_type, bucket
        |      ORDER BY ts, event_id) AS o,
        |    first_value(v) OVER (PARTITION BY event_type, bucket
        |      ORDER BY ts DESC, event_id DESC) AS c
        |  FROM e)
        |SELECT event_type, bucket, min(o) AS open_micros,
        |  max(v) AS high_micros, min(v) AS low_micros,
        |  min(c) AS close_micros,
        |  CAST(sum(v) AS BIGINT) AS volume_micros, count(*) AS n
        |FROM w GROUP BY 1, 2""".stripMargin),


    // one aggregate CTE mirrors the single-scan row suite; `//` on
    // non-negative ints = Spark div; the same 0.05/900000 literals
    "quality_constraints" ->
      """WITH n AS (SELECT count(*) AS n,
        |    sum(CASE WHEN l_quantity IS NOT NULL THEN 1 ELSE 0 END) AS ok1,
        |    sum(CASE WHEN l_quantity >= 1.0 AND l_quantity <= 50.0
        |        THEN 1 ELSE 0 END) AS ok2,
        |    sum(CASE WHEN l_discount >= 0.0 AND l_discount <= 0.05
        |        THEN 1 ELSE 0 END) AS ok3
        |  FROM lineitem),
        |u AS (SELECT CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0)
        |        AS BIGINT) AS dups
        |      FROM (SELECT count(*) AS c FROM lineitem
        |            GROUP BY l_orderkey, l_linenumber)),
        |r AS (SELECT count(*) AS orphans FROM
        |       (SELECT DISTINCT l_orderkey AS v FROM lineitem
        |        WHERE l_orderkey IS NOT NULL)
        |      WHERE v NOT IN (SELECT o_orderkey FROM orders
        |                      WHERE o_orderkey IS NOT NULL))
        |SELECT 'l_quantity_complete' AS check_name,
        |  CAST(coalesce(ok1 * 1000000 // n, 1000000) AS BIGINT) AS metric,
        |  CAST(1000000 AS BIGINT) AS threshold,
        |  coalesce(ok1 * 1000000 // n, 1000000) >= 1000000 AS pass FROM n
        |UNION ALL
        |SELECT 'l_quantity_in_1_50',
        |  CAST(coalesce(ok2 * 1000000 // n, 1000000) AS BIGINT),
        |  CAST(1000000 AS BIGINT),
        |  coalesce(ok2 * 1000000 // n, 1000000) >= 1000000 FROM n
        |UNION ALL
        |SELECT 'l_discount_low_90pct',
        |  CAST(coalesce(ok3 * 1000000 // n, 1000000) AS BIGINT),
        |  CAST(900000 AS BIGINT),
        |  coalesce(ok3 * 1000000 // n, 1000000) >= 900000 FROM n
        |UNION ALL
        |SELECT 'order_line_unique', dups, CAST(0 AS BIGINT),
        |  dups = 0 FROM u
        |UNION ALL
        |SELECT 'orderkey_in_orders', CAST(orphans AS BIGINT),
        |  CAST(0 AS BIGINT), orphans = 0 FROM r""".stripMargin,


    // PERCENTILE_DISC(0.5) is exactly the histogram-fold median rule
    // (largest v with 2·below(v) < n — verified on even/odd/two-row
    // groups); centi-units via floor(value*100), exact on both
    // engines since the double product is IEEE-identical
    "ts_anomaly" ->
      """WITH e AS (SELECT event_id, user_id,
        |        CAST(floor(value * 100) AS BIGINT) AS v FROM events),
        |m AS (SELECT user_id,
        |        PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY v) AS med
        |      FROM e GROUP BY 1),
        |d AS (SELECT e.event_id, e.user_id, e.v, m.med,
        |        abs(e.v - m.med) AS dev
        |      FROM e JOIN m USING (user_id)),
        |md AS (SELECT user_id,
        |         PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY dev) AS mad
        |       FROM d GROUP BY 1)
        |SELECT event_id, user_id, v, med, dev, mad
        |FROM d JOIN md USING (user_id)
        |WHERE dev > 3 * mad""".stripMargin,


    // inputs wrapped pmod-style (((x % m) + m) % m): DuckDB % keeps
    // bucketing is physical layout; the logical result is the plain
    // join
    "layout_bucket_join" ->
      s"""SELECT doc_id, lang, n_chars,
         |  CAST(len($tokensSql) AS BIGINT) AS n_tokens
         |FROM documents""".stripMargin,


    // the dividend's sign, Spark pmod does not — without this the two
    // sides disagree on negative ids
    "layout_zorder" ->
      (s"""WITH z AS (SELECT ${Layout.zorder16Sql(
             "(((user_id % 65536) + 65536) % 65536)",
             "(((CAST(floor(value) AS BIGINT) % 65536) + 65536) % 65536)")} AS zkey FROM events)
        |SELECT (zkey // 4096) AS zbucket, count(*) AS n,
        |  min(zkey) AS zmin, max(zkey) AS zmax
        |FROM z GROUP BY 1""".stripMargin),


    // same pmod wrap as layout_zorder; the Hilbert loop unrolls as
    // one generated subquery layer per bit — identical arithmetic to
    // the Spark kernel
    "layout_hilbert" -> {
      val inner = "(SELECT (((user_id % 256) + 256) % 256) AS x0, " +
        "(((CAST(floor(value) AS BIGINT) % 256) + 256) % 256) AS y0 " +
        "FROM events) ei"
      s"""WITH h AS (${Layout.hilbertSql(8, inner)})
         |SELECT (hkey // 1024) AS hbucket, count(*) AS n,
         |  min(hkey) AS hmin, max(hkey) AS hmax
         |FROM h GROUP BY 1""".stripMargin
    },


    "ew_tumbling" ->
      (s"""WITH $evtCte
        |SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS sum_value
        |FROM evts GROUP BY 1, 2""".stripMargin),


    // ISO Monday week truncation on both engines; calendar-day
    // difference // 7 mirrors Spark's DST-proof datediff form
    "ew_retention" ->
      (s"""WITH $evtCte,
        |act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w
        |        FROM evts
        |        WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |coh AS (SELECT user_id, min(w) AS cw FROM act GROUP BY 1)
        |SELECT cw AS cohort_week,
        |  date_diff('day', CAST(cw AS DATE), CAST(w AS DATE)) // 7
        |    AS week_k,
        |  count(DISTINCT user_id) AS n_users
        |FROM act JOIN coh USING (user_id)
        |GROUP BY 1, 2""".stripMargin),


    // greedy-latest chain columns mirror the Spark window fold;
    // ROWS ... 1 PRECEDING = the strictly-preceding frame, ties
    // resolved by event_id on both engines
    "ew_funnel" ->
      (s"""WITH $evtCte,
        |l1 AS (SELECT user_id, event_id, ts, event_type,
        |         max(CASE WHEN event_type = 'signup' THEN ts END) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS c0
        |       FROM evts
        |       WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |l2 AS (SELECT *,
        |         max(CASE WHEN event_type = 'click' AND c0 IS NOT NULL
        |                   AND ts <= c0 + INTERVAL '1 day' THEN ts END) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS c1
        |       FROM l1)
        |SELECT user_id AS key, event_id AS tie, ts, c1 AS prev_ts
        |FROM l2
        |WHERE event_type = 'purchase' AND c1 IS NOT NULL
        |  AND ts <= c1 + INTERVAL '1 day'""".stripMargin),


    "ew_sliding" ->
      (s"""WITH $evtCte
        |SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS wstart,
        |  count(*) AS n
        |FROM evts, unnest([0, 1, 2, 3]) AS u(k)
        |GROUP BY 1""".stripMargin),


    "ew_sessions" ->
      (s"""WITH $evtCte,
        |m AS (SELECT user_id, ts,
        |        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |               OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                    >= INTERVAL '30 minutes'
        |             THEN 1 ELSE 0 END AS brk
        |      FROM evts),
        |g AS (SELECT user_id, ts,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                       ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m)
        |SELECT min(ts) AS session_start,
        |  max(ts) + INTERVAL '30 minutes' AS session_end,
        |  user_id, count(*) AS n
        |FROM g GROUP BY user_id, sid""".stripMargin),


    "ew_range_join" ->
      (s"""WITH $evtCte
        |SELECT e.event_id, e.user_id, e.ts, s.ts AS win_start
        |FROM evts e
        |JOIN (SELECT user_id, ts FROM evts WHERE event_type = 'signup') s
        |  ON e.user_id = s.user_id
        |  AND e.ts >= s.ts AND e.ts < s.ts + INTERVAL '2 hours'""".stripMargin),


    // both range bounds inclusive, mirroring the Spark condition
    // right_ts BETWEEN left_ts + 0s AND left_ts + 1h
    "ew_interval_join" ->
      (s"""WITH $evtCte
        |SELECT v.event_id AS view_id, v.user_id AS user_id,
        |  v.ts AS view_ts, c.event_id AS click_id, c.ts AS click_ts
        |FROM (SELECT user_id, ts, event_id FROM evts
        |      WHERE event_type = 'view') v
        |JOIN (SELECT user_id, ts, event_id FROM evts
        |      WHERE event_type = 'click') c
        |  ON v.user_id = c.user_id
        |  AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL '1 hour'""".stripMargin),


    "ew_asof_native" ->
      (s"""WITH $evtCte,
        |l AS (SELECT user_id, ts, event_id AS click_id FROM evts
        |      WHERE event_type = 'click'),
        |r0 AS (SELECT user_id, ts, value FROM evts WHERE event_type = 'purchase'
        |       QUALIFY row_number() OVER (PARTITION BY user_id, ts
        |                                  ORDER BY event_id DESC) = 1)
        |SELECT l.user_id, l.ts, l.click_id, r0.ts AS asof_ts, r0.value AS asof_value
        |FROM l ASOF LEFT JOIN r0
        |  ON l.user_id = r0.user_id AND r0.ts <= l.ts""".stripMargin),


    "ew_asof_join" ->
      (s"""WITH $evtCte,
        |l AS (SELECT user_id, ts, event_id AS click_id FROM evts
        |      WHERE event_type = 'click'),
        |r0 AS (SELECT user_id, ts, value FROM evts WHERE event_type = 'purchase'
        |       QUALIFY row_number() OVER (PARTITION BY user_id, ts
        |                                  ORDER BY event_id DESC) = 1)
        |SELECT l.user_id, l.ts, l.click_id, r0.ts AS asof_ts, r0.value AS asof_value
        |FROM l ASOF LEFT JOIN r0
        |  ON l.user_id = r0.user_id AND r0.ts <= l.ts""".stripMargin),


    // the same asof join with matches older than a day nulled out —
    // epoch_us arithmetic keeps the bound exact on both engines
    "ew_asof_tolerance" ->
      (s"""WITH $evtCte,
        |l AS (SELECT user_id, ts, event_id AS click_id FROM evts
        |      WHERE event_type = 'click'),
        |r0 AS (SELECT user_id, ts, value FROM evts WHERE event_type = 'purchase'
        |       QUALIFY row_number() OVER (PARTITION BY user_id, ts
        |                                  ORDER BY event_id DESC) = 1)
        |SELECT l.user_id, l.ts, l.click_id,
        |  CASE WHEN r0.ts IS NOT NULL
        |         AND epoch_us(l.ts) - epoch_us(r0.ts) <= 86400000000
        |       THEN r0.ts END AS asof_ts,
        |  CASE WHEN r0.ts IS NOT NULL
        |         AND epoch_us(l.ts) - epoch_us(r0.ts) <= 86400000000
        |       THEN r0.value END AS asof_value
        |FROM l ASOF LEFT JOIN r0
        |  ON l.user_id = r0.user_id AND r0.ts <= l.ts""".stripMargin),
  )
}
