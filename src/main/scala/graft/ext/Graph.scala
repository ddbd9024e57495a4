package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-state materializer shared by the iterative graph loops
  * (pagerank, k-hop BFS, label propagation) — the same reliable-vs-
  * local checkpoint choice [[DedupOps.connectedComponents]] threads:
  * `localCheckpoint` pins round state in executor block storage
  * (fast, but blocks DIE with their executor — mid-iteration loss is
  * unrecoverable because the lineage was truncated), while a
  * checkpoint DIR writes each round to reliable storage so a
  * 1000-executor run survives preemption. Superseded rounds must be
  * `release`d: the context cleaner never deletes reliable checkpoint
  * files under default config, so a 20-round loop would otherwise
  * leave 20 round-state copies in the dir. FINAL round files are the
  * caller's to consume — never release the frame you return.
  *
  * The checkpoint dir is SPARK-CONTEXT-GLOBAL state: the FIRST live
  * loop's registration captures the caller's dir and the LAST
  * [[done]] restores it (registry-held, so same-dir concurrent loops
  * can't restore each other's snapshots mid-flight), and a loop
  * never permanently redirects an application's own `checkpoint()`
  * calls into a directory this library's cleanup later deletes. Two
  * CONCURRENT reliable-mode loops with DIFFERENT dirs would race on
  * the global (last constructor wins — one loop's rounds silently
  * land in the other's dir and its `release` cleanup deletes files
  * the other loop still needs), so the constructor FAILS LOUDLY on
  * that shape via a per-context registry: run concurrent loops with
  * one shared dir, or serialize them. Same-dir concurrency refcounts
  * and is fine.
  */
private[graft] final class RoundState(spark: org.apache.spark.sql.SparkSession,
                                      checkpointDir: Option[String]) {
  checkpointDir.foreach { d =>
    RoundState.register(spark, d)
    // a failed dir-set (bad path, FS down) must not leave a phantom
    // registration that blocks every later different-dir loop
    try spark.sparkContext.setCheckpointDir(d)
    catch { case e: Throwable =>
      // unwind must not MASK the original failure: if the restore
      // itself throws (same downed FS, say), the caller should still
      // see the bad library dir as the cause, not their own dir
      try RoundState.unregister(spark, d).foreach(_.foreach(
        spark.sparkContext.setCheckpointDir))
      catch { case e2: Throwable => e.addSuppressed(e2) }
      throw e }
  }

  /** Materialize one round's state, truncating lineage. */
  def apply(df: DataFrame): DataFrame =
    if (checkpointDir.isDefined) {
      // persist-then-checkpoint: an unpersisted eager checkpoint runs
      // the round's plan TWICE — once for the eager count job and
      // again in ReliableCheckpointRDD's write job (Spark only reuses
      // computed partitions when they are persisted). The transient
      // persist makes the write job a cache read; the returned frame
      // scans the checkpoint FILES, so downstream plan shapes (and
      // the exchange-reuse behavior the callers tuned) are unchanged.
      df.persist()
      try df.checkpoint(eager = true)
      finally { df.unpersist(); () }
    } else df.localCheckpoint(true)

  /** Drop a SUPERSEDED round: its blocks, and (reliable mode) its
    * checkpoint files — callers guarantee the successor round is
    * already materialized, so nothing re-reads what this deletes.
    */
  def release(df: DataFrame): Unit = {
    df.unpersist()
    if (checkpointDir.isDefined)
      org.apache.spark.sql.graft.CheckpointFiles.delete(df)
  }

  /** Restore the caller's checkpoint dir (call when the loop is done,
    * in a finally). The restore is REGISTRY-drained, not
    * per-instance: under same-dir concurrency every loop would
    * otherwise capture and restore its own snapshot of the global —
    * the first finisher would yank the dir back to the caller's
    * while later loops still checkpoint into it, and the last
    * finisher would "restore" the global to the library's own dir
    * (its snapshot was taken after the first loop had already set
    * it). Only the FIRST register saves the caller's dir; only the
    * LAST unregister restores it. No-op in local mode or when the
    * caller had no dir of their own (Spark offers no public unset).
    */
  def done(): Unit =
    checkpointDir.foreach { d =>
      RoundState.unregister(spark, d)
        .foreach(_.foreach(spark.sparkContext.setCheckpointDir))
    }
}

private[graft] object RoundState {
  // contextId -> (dir, refcount, the caller's dir captured by the
  // FIRST register) of the reliable-mode loops currently live per
  // Spark context — the loud-failure guard for the different-dir
  // concurrency race documented on the class, and the single point
  // of save/restore for the context-global checkpoint dir
  private val active = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Int, Option[String])]()

  private def key(s: org.apache.spark.sql.SparkSession): String =
    s.sparkContext.applicationId

  private def register(s: org.apache.spark.sql.SparkSession,
                       dir: String): Unit =
    active.compute(key(s), (_, cur) =>
      if (cur == null) (dir, 1, s.sparkContext.getCheckpointDir)
      else if (cur._1 == dir) (dir, cur._2 + 1, cur._3)
      else throw new IllegalStateException(
        s"concurrent reliable-checkpoint loops with DIFFERENT dirs " +
          s"('${cur._1}' is live, '$dir' requested): the checkpoint " +
          "dir is Spark-context-global, so the loops would write " +
          "each other's rounds into one dir and delete files the " +
          "other still needs — share one checkpointDir across " +
          "concurrent loops, or run them sequentially")): Unit

  /** Returns `Some(callerDir)` when this unregister drained the LAST
    * registration (the caller must restore), `None` while same-dir
    * loops remain live.
    */
  private def unregister(s: org.apache.spark.sql.SparkSession,
                         dir: String): Option[Option[String]] = {
    var restore: Option[Option[String]] = None
    active.compute(key(s), (_, cur) =>
      if (cur == null) null
      else if (cur._2 <= 1) { restore = Some(cur._3); null }
      else (cur._1, cur._2 - 1, cur._3)): Unit
    restore
  }
}

/** Distributed graph analytics over edge-list DataFrames — the two
  * algorithms a web-scale corpus pipeline actually runs: PageRank as a
  * document/host quality prior (the Common-Crawl-style link-graph
  * signal used to weight training data) and triangle counting as the
  * clustering/community density probe.
  *
  * Both are expressed as bounded sequences of equi-joins and
  * aggregations — every shuffle is on a graph key (never a cartesian),
  * map-side partial aggregation absorbs hot destination nodes, and all
  * arithmetic is integer fixed-point so results hash-match any engine
  * that runs the same plan (floating-point PageRank would differ in the
  * last ulp per fold order).
  */
object Graph {

  /** PageRank with integer micro-unit arithmetic, `iters` rounds.
    *
    * Ranks are BIGINT millionths: r0 = 1_000_000 per node;
    * r_{k+1}(n) = 150_000 + (17 · Σ_{(s→n)∈E} (r_k(s) div deg(s))) div 20
    * — i.e. damping 0.85 as the exact rational 17/20 and per-edge
    * contributions as integer division, so every engine computing the
    * same schedule produces bit-identical ranks (the fixed-point trick
    * the engine also uses for k-means and ADC, Clustering.scala /
    * Similarity.scala).
    *
    * Scale shape: the degree-annotated edge list is materialized ONCE
    * (via [[RoundState]]: `checkpointDir = Some(dir)` gives reliable
    * checkpoints that survive executor death mid-iteration — pass it
    * on a real cluster, exactly as [[DedupOps.connectedComponents]];
    * the default localCheckpoint is the single-JVM fast path) and
    * re-joined each round; one shuffle per iteration on `dst` with
    * map-side partial sums, so a hot page (in-degree millions) costs a
    * combiner tree, not a single reducer. Rank state stays a
    * (node, long) table — never collected to the driver.
    *
    * @param edges directed edges, columns `src`, `dst`
    * @param nodes every node id, column `node_id` (nodes with no
    *              in-edges keep the teleport mass 150_000; nodes with
    *              no out-edges leak mass — the standard simplification)
    * @param iters rounds (unrolled; callers keep this small — quality
    *              priors converge in single digits)
    */
  /** ONE definition of the small-budget fusion gate shared by
    * [[pageRankRounds]], [[labelPropagation]] and [[pageRank]]'s
    * release decision: ≤4 rounds run as one fused LAZY plan (no round
    * state exists to release — the plan still reads its inputs at
    * caller-execution time), unless an explicit checkpointDir forces
    * the eager reliable regime. A retuned threshold edited in one
    * copy but not the others would release a frame the fused plan
    * still reads — keep it here, only here.
    */
  private def fusedRegime(iters: Int,
                          checkpointDir: Option[String]): Boolean =
    iters <= 4 && checkpointDir.isEmpty

  def pageRank(edges: DataFrame, nodes: DataFrame, iters: Int,
               checkpointDir: Option[String] = None): DataFrame = {
    // validate BEFORE the prepared-edges materialization: an invalid
    // budget must not first pay (and in reliable mode, leak) an
    // edge-list-sized checkpoint job
    require(iters >= 1 && iters <= 20, "iters must be in [1, 20]")
    val rs = new RoundState(edges.sparkSession, checkpointDir)
    try {
      val prepared = rs(prepareEdges(edges))
      // In the eager regime the returned ranks are already
      // materialized, so the prepared edge table is superseded —
      // release it (in a finally: a mid-loop failure must not leak
      // it either), or every invocation leaks an edge-list-sized
      // checkpoint. The fused lazy plan still READS `prepared` when
      // the caller executes it, so there it must live on.
      try pageRankPrepared(prepared, nodes, iters, checkpointDir)
      finally if (!fusedRegime(iters, checkpointDir)) rs.release(prepared)
    } finally rs.done()
  }

  /** Degree-annotate an edge list — the build-once half of the
    * PageRank lifecycle (a link graph is constructed once and ranked
    * many times as damping/iteration choices are tuned). Materialize
    * the result (localCheckpoint, a reliable checkpoint dir, or the
    * [[Stages]] cache) before iterating over it, or every rank round
    * replans the full edge derivation.
    */
  def prepareEdges(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    edges.join(deg, "src")
  }

  /** The rank rounds over an already-materialized degree-annotated
    * edge table (`src`, `dst`, `deg` — see [[prepareEdges]]), with
    * EARLY EXIT on the exact rank fixpoint for budgets over 4 rounds
    * (smaller budgets run as one fused lazy plan — see
    * [[pageRankRounds]] for the measured trade).
    *
    * For the eager regime: each round's (node, rank) table is
    * localCheckpoint'd — constant
    * lineage depth instead of an iters-deep join tree — with an
    * order-independent xor checksum piggybacked on the
    * materialization job (`observe`, the same no-extra-job gate as
    * [[DedupOps.connectedComponents]]). A round whose checksum
    * matches the previous round's runs one exact anti-join probe;
    * an empty probe proves `next = prev` and stops the loop — the
    * remaining rounds would reproduce the same table verbatim, a
    * guarantee only INTEGER ranks give (a float PageRank never lands
    * exactly, which is half the reason the fixed-point arithmetic
    * exists). Differing checksums prove non-convergence, so the probe
    * never runs on a progressing round; a checksum collision or a
    * missed observe poll merely runs one redundant probe, never a
    * false stop.
    */
  def pageRankPrepared(e: DataFrame, nodes: DataFrame, iters: Int,
                       checkpointDir: Option[String] = None): DataFrame =
    pageRankRounds(e, nodes, iters, checkpointDir)._1

  /** [[pageRankPrepared]] plus the number of rank rounds actually
    * executed (≤ `iters`; tests pin the early exit with it).
    */
  private[graft] def pageRankRounds(e: DataFrame, nodes: DataFrame,
                                    iters: Int,
                                    checkpointDir: Option[String] = None)
      : (DataFrame, Int) = {
    require(iters >= 1 && iters <= 20, "iters must be in [1, 20]")
    val rs = new RoundState(e.sparkSession, checkpointDir)
    val n = nodes.select(col("node_id"))
    def round(r: DataFrame): DataFrame = {
      val contrib = e.join(r, e("src") === r("node_id"))
        .select(col("dst"), expr("rank_micros div deg").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      n.join(contrib, n("node_id") === contrib("dst"), "left")
        .select(col("node_id"),
          (lit(150000L) +
            expr("17 * coalesce(s, 0L) div 20")).as("rank_micros"))
    }
    val seed = n.withColumn("rank_micros", lit(1000000L))
    // Small budgets (the quality-prior regime the bench query runs)
    // execute as ONE fused lazy plan: per-round materialization +
    // checksum + probe machinery costs more than the rounds
    // themselves at this depth (measured 13x on the bench query), and
    // a ≤4-join lineage needs no checkpointing. Fixpoint detection
    // only pays when the budget is large enough to have slack to
    // save — so it engages, from round 1, for iters > 4. An explicit
    // checkpointDir forces the eager regime regardless of budget
    // ([[fusedRegime]], the one shared gate): reliable round state
    // only exists there, and a caller asking for it must get it.
    if (fusedRegime(iters, checkpointDir))
      return ((1 to iters).foldLeft(seed)((r, _) => round(r)), iters)
    def checksummed(df: DataFrame): (DataFrame, Option[Long]) = {
      val obs = org.apache.spark.sql.Observation()
      val out = rs(df.observe(obs,
        coalesce(bit_xor(xxhash64(col("node_id"), col("rank_micros"))),
          lit(0L)).as("x")))
      (out, org.apache.spark.sql.graft.ObservationAccess.await(obs, 2000)
        .map(_("x").asInstanceOf[Long]))
    }
    try {
      var (ranks, prevX) = checksummed(seed)
      var iter = 0
      var converged = false
      while (iter < iters && !converged) {
        val (next, x) = checksummed(round(ranks))
        // node set is constant, so set equality == elementwise
        // equality; an unknown checksum (missed poll) falls through to
        // the probe, which alone decides — it can cost a round, never
        // correctness
        val differ = (for (a <- x; b <- prevX) yield a != b)
          .getOrElse(false)
        converged = !differ &&
          next.join(ranks, Seq("node_id", "rank_micros"), "left_anti")
            .isEmpty
        // superseded round state: `next` is already materialized, so
        // nothing re-reads the previous checkpoint's blocks (or, in
        // reliable mode, its files)
        rs.release(ranks)
        ranks = next
        prevX = x
        iter += 1
      }
      (ranks, iter)
    } finally rs.done()
  }

  /** Exact triangle count via degree-ordered edge orientation — the
    * standard O(m^1.5) enumeration bound: each undirected edge is
    * directed from its lower-(degree, id) endpoint, so every node's
    * out-degree is O(√m) and the wedge join never explodes on hubs
    * (a star node of degree d contributes 0 wedges instead of d²).
    * Each triangle is counted exactly once, at its lowest-ordered
    * apex.
    *
    * Input `edges` must be canonical undirected: columns `u` < `v`,
    * one row per edge. Returns one row:
    * (n_nodes, n_edges, n_wedges, n_triangles).
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val und = edges.select(col("u"), col("v")).localCheckpoint(true)
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val oriented = und
      .join(deg.select(col("node").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("d").as("dv")), Seq("v"))
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("dst"))
      .localCheckpoint(true)
    val a = oriented.select(col("src"), col("dst").as("y"))
    val b = oriented.select(col("src"), col("dst").as("z"))
    // out-neighbor pairs of each apex; y < z canonicalizes the wedge
    val wedges = a.join(b, Seq("src")).filter(col("y") < col("z"))
    // closure probe against the canonical undirected edge set (the
    // wedge (y, z) already has y < z, matching the u < v invariant)
    // as a LEFT join + conditional count, so the O(m^1.5) wedge
    // enumeration — the dominant cost by design — runs ONCE for both
    // the wedge and triangle counts (a separate semi-join branch
    // would re-run the whole wedge join under the second aggregate)
    val probed = wedges.join(
      und.select(col("u").as("y"), col("v").as("z"),
        lit(1).as("__closed")),
      Seq("y", "z"), "left")
    val wedgeTri = probed.agg(count(lit(1)).as("n_wedges"),
      count(col("__closed")).as("n_triangles"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = und.agg(count(lit(1)).as("n_edges"))
    nNodes.crossJoin(nEdges).crossJoin(wedgeTri)
  }

  /** Bounded-hop BFS: minimum hop distance (≤ `hops`) from any seed,
    * by FRONTIER expansion — each round joins the edge list against
    * only the nodes first reached in the previous round, anti-joins
    * away everything already labelled, and the new nodes become the
    * next frontier. Unreached nodes are simply absent (no infinity
    * sentinel to carry). Frontier BFS computes exactly the
    * min-relaxation fixpoint: a node's first discovery round IS its
    * minimum hop distance.
    *
    * Scale shape: per hop, one equi-join against the (shrinking)
    * frontier + one distinct + one anti-join — never a re-expansion
    * of the full accumulated distance table (which would re-enumerate
    * every hub's adjacency each round only for min() to discard it).
    * Each round's new labels are checkpointed, so lineage grows
    * linearly in hops, not 2^hops (the trap of referencing the
    * accumulator twice per round — same discipline as
    * [[DedupOps.connectedComponents]]'s loop). The distance table is
    * nodes-sized and never collected. `edges` should be materialized
    * (a [[graft.ext.Stages]] frame or checkpoint) — it is re-joined
    * every round.
    *
    * @param edges directed edges (`src`, `dst`) — pass both
    *              directions for an undirected graph
    * @param seeds one `id` column, distance-0 nodes
    */
  def kHopDistances(edges: DataFrame, seeds: DataFrame, hops: Int,
                    checkpointDir: Option[String] = None): DataFrame = {
    require(hops >= 1 && hops <= 20, "hops must be in [1, 20]")
    // NO fused small-budget regime here, unlike labelPropagation /
    // pageRankRounds — measured WORSE (1.08 s vs 0.50 s on the bench
    // query): hop h's frontier is consumed by EVERY later hop's
    // anti-join target AND the final union, so an unmaterialized
    // frontier re-derives once per consumer and the recompute
    // outgrows the scheduling overhead the fusion saves. Frontier
    // state is genuinely multi-consumer; label/rank state is a chain.
    val rs = new RoundState(edges.sparkSession, checkpointDir)
    try {
      // distinct: a duplicated seed id would emit duplicate (id, 0)
      // rows while every LATER hop is distinct() — inflating only the
      // seeds in downstream per-dist counts; the tiny seed frame pays
      // one small exchange for the same set semantics as the hops
      var frontier = rs(seeds.select(col("id")).distinct()
        .select(col("id"), lit(0).as("dist")))
      val labelled = scala.collection.mutable.ArrayBuffer(frontier)
      for (h <- 1 to hops) {
        if (!frontier.isEmpty) {
          val reached = edges
            .join(frontier, edges("src") === frontier("id"))
            .select(col("dst").as("id")).distinct()
          val dist = labelled.reduce(_ unionAll _)
          frontier = rs(reached.join(dist, Seq("id"), "left_anti")
            .select(col("id"), lit(h).as("dist")))
          labelled += frontier
        }
      }
      // every hop's frontier is PART of the result (the union below),
      // so no round is ever superseded — nothing to release here; the
      // per-hop checkpoint files are the returned table's backing store
      labelled.reduce(_ unionAll _)
    } finally rs.done()
  }

  /** Synchronous label propagation (Raghavan et al., Phys. Rev. E'07)
    * over canonical undirected edges — community detection by local
    * majority, the cheap modularity-style alternative to
    * connected components when a graph is one giant component and
    * "connectivity" tells you nothing. Every node starts as its own
    * label; each round it adopts the most frequent label among its
    * neighbors, ties broken to the SMALLEST label — the
    * deterministic tie rule that replaces the paper's random pick, so
    * the result is bit-identical on any engine and any partitioning
    * (and the oracle can replay it). Fixed `iters` rounds; nodes are
    * the edge endpoints, so every node has a neighborhood to vote.
    *
    * Scale shape per round: one equi-join of the label table onto the
    * symmetric edges, one (node, label) count with map-side partials,
    * one max_by argmax per node — all keyed on node, no window, no
    * collect. Each round's labels are checkpointed so lineage stays
    * linear in rounds ([[kHopDistances]]' discipline).
    */
  def labelPropagation(edges: DataFrame, iters: Int,
                       checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1 && iters <= 20, "iters must be in [1, 20]")
    // one vote round: labels ← argmax over neighbors' labels
    def round(sym: DataFrame, labels: DataFrame): DataFrame = sym
      .join(labels.withColumnRenamed("id", "nbr"), Seq("nbr"))
      .groupBy("node", "label").agg(count(lit(1)).as("__n"))
      .groupBy("node")
      // argmax (count desc, label asc): min over the (-n, label)
      // struct. Negating the COUNT (a nonnegative long) is always
      // safe, and the label rides un-negated — so string-id graphs
      // (first-class in connectedComponents) keep the deterministic
      // smallest-label tie rule instead of a silent cast-to-double
      // NULL degrading it
      .agg(min_by(col("label"), struct(-col("__n"), col("label")))
        .as("label"))
      .select(col("node").as("id"), col("label"))
    val symPlan = edges.select(col("u").as("node"), col("v").as("nbr"))
      .unionAll(edges.select(col("v").as("node"), col("u").as("nbr")))
    // Small budgets fuse into ONE lazy plan (the pageRankRounds
    // regime): label lineage is a single chain (each round reads the
    // previous once), so a ≤4-round DAG needs no checkpointing, and
    // the per-round eager materializations were costing more
    // scheduled jobs than the votes themselves. A checkpointDir
    // forces the eager regime — reliable round state only exists
    // there.
    if (fusedRegime(iters, checkpointDir)) {
      val seed = symPlan.select(col("node").as("id")).distinct()
        .select(col("id"), col("id").as("label"))
      return (1 to iters).foldLeft(seed)((l, _) => round(symPlan, l))
    }
    val rs = new RoundState(edges.sparkSession, checkpointDir)
    try {
      val sym = rs(symPlan)
      var labels = rs(sym.select(col("node").as("id")).distinct()
        .select(col("id"), col("id").as("label")))
      for (_ <- 1 to iters) {
        val next = rs(round(sym, labels))
        // the superseded round's label table (and its reliable files)
        // can go — `next` is already materialized
        rs.release(labels)
        labels = next
      }
      // the symmetric edge copy is superseded once the FINAL labels
      // are materialized; the final label files are the caller's
      rs.release(sym)
      labels
    } finally rs.done()
  }

  /** Co-occurrence edges from an (item, group) incidence: items
    * sharing a group get an edge, kept when they co-occur in at least
    * `minSupport` groups. The support floor is the scale guard — on a
    * power-law corpus the support-1 tail is ~99% of all pairs (pure
    * noise for community structure), and dropping it bounds the edge
    * set the graph algorithms above iterate over. Groups larger than
    * `maxGroupSize` are dropped whole before the self-join: a single
    * hot group of size g costs g²/2 pairs, the exact blow-up the
    * df-cap on [[DedupOps]]'s inverted indexes guards against.
    *
    * Returns canonical undirected edges (`u` < `v`, `support`).
    */
  def coOccurrenceEdges(incidence: DataFrame, minSupport: Long,
                        maxGroupSize: Long = 1000L): DataFrame = {
    require(maxGroupSize >= 2 && maxGroupSize < Int.MaxValue,
      s"maxGroupSize ($maxGroupSize) must be in [2, Int.MaxValue)")
    // keyed spread (round 19): a single-row-group incidence scan runs
    // the whole bounded-collect partial aggregation on ONE task; the
    // group-keyed repartition shuffles only (group, item) longs and
    // doubles as the aggregation's exchange, so the postings agg runs
    // at full parallelism with no extra shuffle in the plan.
    DedupOps.spreadNarrow(incidence, Seq(col("group")))
      .groupBy("group")
      // The size guard lives INSIDE the aggregation buffer: a
      // pathologically hot group (one order holding millions of items
      // at 100× scale) stops accumulating at maxGroupSize+1 distinct
      // items — O(maxGroupSize) task memory — and the size filter
      // below then drops it exactly as a full-set check would
      // (BoundedCollectSet's scaladoc proves size ≤ cap iff the true
      // distinct count is ≤ cap, with kept groups always complete).
      // This replaced a count_distinct + semi-join pre-filter: the
      // distinct agg cost two extra differently-keyed exchanges and a
      // second incidence scan, where the bounded collect guards in
      // the ONE exchange the postings already pay. Set semantics
      // dedupe repeated incidence rows; sort_array makes i < j imply
      // item_i < item_j, so orderedPairs emits each pair once in
      // canonical u < v form. TWO shuffles total (group postings,
      // pair counts).
      .agg(sort_array(org.apache.spark.sql.graft.AggColumns
        .bounded_collect_set(col("item"), maxGroupSize.toInt + 1))
        .as("__items"))
      .filter(size(col("__items")).between(2, maxGroupSize))
      .select(DedupOps.orderedPairs(col("__items"), "u", "v").as("__p"))
      .select(col("__p.u"), col("__p.v"))
      .groupBy("u", "v").agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }

  /** Common-neighbor / Jaccard link prediction (Liben-Nowell &
    * Kleinberg, CIKM'03): score node pairs by shared neighborhood —
    * `common` = |N(u)∩N(v)| and `jaccard_micro` =
    * ⌊10⁶·common / (deg(u)+deg(v)−common)⌋, integer so the score is
    * bit-exact on any engine. The recommendation/entity-resolution
    * primitive over the co-purchase graph.
    *
    * Never all-pairs: candidate pairs are generated as WEDGES — each
    * node emits the ordered pairs of its own neighbor list — so only
    * pairs with ≥ 1 shared neighbor ever exist, and the count of
    * wedges at a center is its deg². `maxDeg` drops hub CENTERS
    * before pair-generation (the df-cap shape: a 10⁶-degree hub is
    * deg²/2 = 5·10¹¹ pairs from one node); dropped hubs still count
    * toward `deg` in the denominator, so scores THROUGH hubs are
    * conservatively undercounted — the standard trade, documented
    * not hidden. `minCommon ≥ 2` cuts the support-1 noise tail
    * exactly like [[coOccurrenceEdges]]'s support floor.
    *
    * Three shuffles: adjacency build (dedup), wedge pair counts,
    * degree joins. The wedge groupBy partial-aggregates map-side.
    *
    * @param edges canonical undirected edges (`u` < `v`)
    */
  def commonNeighborScores(edges: DataFrame, minCommon: Long = 2L,
                           maxDeg: Long = 200L): DataFrame = {
    require(minCommon >= 1, s"minCommon ($minCommon) must be >= 1")
    require(maxDeg >= 2 && maxDeg <= 10000,
      s"maxDeg ($maxDeg) must be in [2, 10000] — wedge cost is deg² " +
        "per center")
    val adj = edges.select(col("u").as("node"), col("v").as("nbr"))
      .unionAll(edges.select(col("v").as("node"), col("u").as("nbr")))
      .distinct()
    val deg = adj.groupBy("node").agg(count(lit(1)).as("__d"))
    // Wedge centers capped by degree; one bounded postings list per
    // center (the same bounded-buffer guard as coOccurrenceEdges —
    // a hub stops accumulating at maxDeg+1).
    val wedges = adj
      .groupBy("node")
      .agg(sort_array(org.apache.spark.sql.graft.AggColumns
        .bounded_collect_set(col("nbr"), maxDeg.toInt + 1))
        .as("__nbrs"))
      .filter(size(col("__nbrs")).between(2, maxDeg))
      .select(DedupOps.orderedPairs(col("__nbrs"), "u", "v").as("__p"))
      .select(col("__p.u"), col("__p.v"))
      .groupBy("u", "v").agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
    wedges
      .join(deg.withColumnRenamed("node", "u")
        .withColumnRenamed("__d", "__du"), "u")
      .join(deg.withColumnRenamed("node", "v")
        .withColumnRenamed("__d", "__dv"), "v")
      .select(col("u"), col("v"), col("common"),
        expr("common * 1000000L div (__du + __dv - common)")
          .as("jaccard_micro"))
  }
}
