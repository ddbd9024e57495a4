package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding column — the trainer
  * for [[Similarity.ivfTopK]]'s centroid set (production IVF learns
  * its lists with exactly this loop).
  *
  * Built for cross-engine and cross-topology REPRODUCIBILITY: the
  * centroid update sums each dimension in 1e-6 fixed point (exact
  * BIGINT arithmetic, order-independent across partitions) instead of
  * floating-point, so the result never depends on partitioning or
  * reduce order — a double sum would differ run to run and could not
  * be oracle-checked. Assignment is cosine argmax with ties toward
  * the smaller centroid id; init is the k corpus vectors with the
  * smallest ids (deterministic, no RNG).
  *
  * Scale shape per iteration: one corpus scan; ASSIGN is a broadcast
  * cross-join against the ≤k centroids (bounded by the k parameter,
  * not by data) whose argmax collapses map-side to one row per point;
  * UPDATE is a (cid, dim) partial aggregation whose shuffle carries
  * ≤ k·dims rows per mapper. Nothing is collected to the driver.
  */
object Clustering {

  private def quantize(x: Column): Column =
    floor(x.cast("double") * lit(1000000.0)).cast("long")

  /** Nearest-centroid assignment: (id, vec, cid).
    *
    * Shape: broadcast cross-join against the ≤k centroid rows, cosine
    * per pair in WholeStageCodegen (native VecDot kernel), then a
    * `max_by` argmax with ties toward the smaller centroid id. The
    * groupBy's partial aggregation collapses the k candidate rows of
    * each point MAP-SIDE (they are contiguous outputs of the loop
    * join), so the exchange carries exactly one (id, vec, cid) row per
    * corpus point — one corpus-sized shuffle per iteration, all
    * scoring codegen'd.
    *
    * Round 19: the shape above is HISTORY — assignment now runs
    * shuffle-free through the native argmax-over-centroids kernel
    * ([[org.apache.spark.sql.graft.VecArgmaxCos]]). An earlier HOF
    * attempt (`transform`/`array_max` over a broadcast centroid
    * array) was measured 4× slower because lambdas interpret the
    * cosine per element; the native kernel runs the same loop inside
    * WholeStageCodegen, so the n·k row expansion, the corpus-sized
    * aggregation exchange, AND the SortAggregate fallback (struct
    * orderings are not mutable aggregation buffers) all disappear —
    * an assignment pass no longer shuffles the corpus at all.
    * Numerics and the (cos, −cid) tie-break are bit-identical by the
    * kernel's contract (same left-to-right folds, same SQL double
    * ordering, null-metric candidates ignored).
    */
  /** The argmax tie-break negates the centroid id, so ids must be
    * integral — the [[Similarity.requireNumericCentroidIds]] contract
    * applied at this family's entry points: a string id would cast to
    * NULL (non-deterministic ties) or throw under ANSI.
    */
  private def requireIntegralId(df: DataFrame, colName: String = "__id",
                                what: String = "point"): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(colName).dataType
    require(dt == ByteType || dt == ShortType || dt == IntegerType ||
        dt == LongType,
      s"k-means $what ids must be an integral type (the assignment " +
        s"tie-break negates the centroid id), got $dt")
  }

  // zero-norm centroids are DROPPED before the cosine (the
  // Similarity discipline): cosine(x, 0-vec) is 0/0 = NaN, and NaN
  // sorts above every real value in the argmax ordering — ONE failed
  // embedding among the seeds would capture the whole corpus,
  // collapsing k-means to a single cluster and the within-cluster
  // self-joins downstream (semanticDedup) to C(n,2).
  // The size(__cb) > 0 guard keeps the degenerate-centroids contract
  // of the old join form: with ZERO valid centroids the broadcast
  // side is EMPTY and assignment yields no rows (not null-cid rows).
  private def centArray(cent: DataFrame): DataFrame =
    cent.filter(Similarity.norm(col("__cv")) > 0)
      .withColumn("__cn", Similarity.norm(col("__cv")))
      .agg(collect_list(struct(col("__cid"), col("__cv"), col("__cn")))
        .as("__cb"))
      .filter(size(col("__cb")) > 0)

  private def assignNearest(pts: DataFrame, cent: DataFrame): DataFrame =
    // norms HOISTED (the Similarity.exactTopK idiom): the point norm
    // once per row, each centroid norm once pre-broadcast; the kernel
    // folds dot/(pn·cn) per candidate inside one codegen'd loop
    pts.withColumn("__pn", Similarity.norm(col("__v")))
      .crossJoin(broadcast(centArray(cent)))
      .select(col("__id"), col("__v"),
        org.apache.spark.sql.graft.NearestColumns
          .vec_argmax_cos(col("__v"), col("__pn"), col("__cb"))
          .as("__cid"))

  // label-only variant (no point vector in the output row)
  private def assignNearestCid(pts: DataFrame, cent: DataFrame): DataFrame =
    pts.withColumn("__pn", Similarity.norm(col("__v")))
      .crossJoin(broadcast(centArray(cent)))
      .select(col("__id"),
        org.apache.spark.sql.graft.NearestColumns
          .vec_argmax_cos(col("__v"), col("__pn"), col("__cb"))
          .as("__cid"))

  /** Fixed-point elementwise mean of each cluster's members. */
  private def updateCentroids(assigned: DataFrame): DataFrame =
    assigned
      .select(col("__cid"), posexplode(col("__v")).as(Seq("__i", "__x")))
      .groupBy("__cid", "__i")
      .agg(sum(quantize(col("__x"))).as("__s"), count(lit(1)).as("__n"))
      .groupBy("__cid")
      .agg(transform(
        array_sort(collect_list(struct(col("__i"), col("__s"), col("__n")))),
        e => (e("__s").cast("double") / e("__n")) / lit(1000000.0))
        .as("__cv"))

  /** Cluster assignments (id, cid) after `iters` Lloyd iterations.
    * Clusters that lose all members simply stop existing (standard
    * Lloyd-with-drop semantics).
    *
    * PRECONDITION (the Sampling id contract): `id` must be unique per
    * row — the assignment argmax groups by it, so a duplicated id's
    * rows collapse to ONE (id, vec, cid) row and the duplicate's
    * vector silently leaves the centroid update. Dedup upstream.
    */
  def kmeansAssign(df: DataFrame, id: Column, vec: Column, k: Int,
                   iters: Int = 2): DataFrame = {
    require(iters >= 1, "kmeansAssign needs at least one iteration")
    // zero-norm POINTS drop like everywhere in Similarity: a failed
    // embedding has no angle to cluster by (its cosine is 0/0 — an
    // ANSI-mode divide error, a NaN otherwise), and as a seed it
    // would NaN-capture the corpus into one cluster. The seed cut is
    // FILTER-then-limit (the round-14 decision, pinned by the
    // zero-norm-survival spec): k REAL seeds, never a k reduced by
    // garbage rows — the emb_kmeans oracle mirrors this order. (The
    // IVF family's seedCentroids deliberately differs — limit first,
    // mirroring FAISS's take-the-first-vectors init — each family is
    // internally consistent with its own oracle.)
    val all = df.select(id.as("__id"), vec.as("__v"))
    requireIntegralId(all)
    // keyed spread (round 19): the in-row argmax kernel removed the
    // assignment's aggregation exchange, so a single-row-group scan
    // would run every Lloyd pass on one task; the narrow (id, vec)
    // spread restores parallelism and is the identity at scale.
    val pts = DedupOps.spreadNarrow(
      all.filter(Similarity.norm(col("__v")) > 0), Seq(col("__id")))
    val cent0 = pts.orderBy(col("__id")).limit(k)
      .select(col("__id").as("__cid"), col("__v").as("__cv"))
    var assigned = assignNearest(pts, cent0)
    for (_ <- 2 to iters)
      assigned = assignNearest(pts, updateCentroids(assigned))
    assigned.select(col("__id").as("id"), col("__cid").as("cid"))
  }

  /** The trained MODEL of [[kmeansAssign]]: the centroid set the
    * final assignment is computed against (for iters = i, that is
    * (update ∘ assign)^(i−1) of the seed). Materializing this ≤k-row
    * table once is the train-once/fan-out lifecycle — every consumer
    * (assignment, silhouette eval, semantic dedup) then pays ONE
    * broadcast corpus pass instead of replaying the whole Lloyd chain
    * per DataFrame reference. Output: (cid, cv).
    */
  def kmeansCentroids(df: DataFrame, id: Column, vec: Column, k: Int,
                      iters: Int = 2): DataFrame = {
    require(iters >= 1, "kmeansCentroids needs at least one iteration")
    // seed cut and point filter EXACTLY as in kmeansAssign (the two
    // entry points must train the same model from the same data):
    // filter-then-limit seeds over the same filtered corpus
    val all = df.select(id.as("__id"), vec.as("__v"))
    requireIntegralId(all)
    // keyed spread — same reasoning as [[kmeansAssign]]
    val pts = DedupOps.spreadNarrow(
      all.filter(Similarity.norm(col("__v")) > 0), Seq(col("__id")))
    var cent = pts.orderBy(col("__id")).limit(k)
      .select(col("__id").as("__cid"), col("__v").as("__cv"))
    for (_ <- 2 to iters)
      cent = updateCentroids(assignNearest(pts, cent))
    cent.select(col("__cid").as("cid"), col("__cv").as("cv"))
  }

  /** Nearest-centroid assignment against an ALREADY-TRAINED centroid
    * table (cid, cv) from [[kmeansCentroids]] — one broadcast corpus
    * pass; bit-identical to [[kmeansAssign]] with the same (k, iters)
    * because the final Lloyd step IS this assignment.
    */
  def kmeansAssignWith(df: DataFrame, id: Column, vec: Column,
                       cent: DataFrame): DataFrame =
    // the same zero-norm point drop as kmeansAssign — without it a
    // failed embedding scores NaN against every centroid and emits a
    // tie-dependent label row kmeansAssign would never produce
    {
      val all = df.select(id.as("__id"), vec.as("__v"))
      requireIntegralId(all)
      // the CENTROID table is caller-supplied too — a string cid hits
      // the same negated-tie-break failure the point guard documents
      // (NULL under non-ANSI → non-deterministic ties, throw under
      // ANSI), so both sides of the argmax are validated
      val c = cent.select(col("cid").as("__cid"), col("cv").as("__cv"))
      requireIntegralId(c, "__cid", "centroid")
      // keyed spread, capped (the mm-blob rule): the assignment is
      // map-only now and its output is a many-consumer memoized
      // checkpoint in the query layer
      assignNearestCid(DedupOps.spreadNarrow(
          all.filter(Similarity.norm(col("__v")) > 0), Seq(col("__id")),
          cap = math.max(2,
            df.sparkSession.sparkContext.defaultParallelism / 4)), c)
        .select(col("__id").as("id"), col("__cid").as("cid"))
    }

  /** SIMPLIFIED (centroid-based) silhouette — the linear-time cluster
    * quality metric (per point: a = cosine distance to its own
    * centroid, b = to the nearest OTHER centroid, s = (b−a)/max(a,b)),
    * the eval leg of the train (Lloyd) / use (IVF) / eval lifecycle.
    * The full silhouette's all-pairs pass is O(n²) and never runs at
    * corpus scale; against centroids it is one broadcast loop join.
    *
    * Returns one row per cluster: (cid, n_members, sum_s_micro) —
    * the s values floor-quantized to micro-units and SUMMED as longs
    * (never float-averaged: a double sum is partition-order-dependent
    * and could not hash-match an oracle; callers divide). Per point
    * the k cosines collect into ONE sorted struct array, so own and
    * best-other fall out of elements 0 and 1 with the argmax
    * tie-break toward the smaller centroid id — one corpus-sized
    * exchange, no self-join. Degenerate guards (single cluster, or a
    * point equidistant-at-zero) score 0 by convention.
    */
  def silhouetteSimplified(df: DataFrame, id: Column, vec: Column,
                           k: Int, iters: Int = 2): DataFrame = {
    require(iters >= 1, "silhouette needs at least one iteration")
    silhouetteWith(df, id, vec, kmeansCentroids(df, id, vec, k, iters))
  }

  /** [[silhouetteSimplified]] against an already-trained centroid
    * table (cid, cv) — the eval leg when the model is a materialized
    * stage: one broadcast corpus pass, no Lloyd replay.
    */
  def silhouetteWith(df: DataFrame, id: Column, vec: Column,
                     centIn: DataFrame): DataFrame = {
    // same zero-norm drops as kmeansAssign (points have no angle; a
    // degenerate centroid would be every point's NaN "own" cluster)
    val pts = df.select(id.as("__id"), vec.as("__v"))
      .filter(Similarity.norm(col("__v")) > 0)
    val cent = centIn.select(col("cid").as("__cid"), col("cv").as("__cv"))
      .filter(Similarity.norm(col("__cv")) > 0)
    // the ranked sort-struct negates __cid exactly like assignNearest
    // — a caller-supplied string cid must fail here, not mid-job
    requireIntegralId(cent, "__cid", "centroid")
    val ranked = pts.crossJoin(broadcast(
        cent.select(col("__cid"), col("__cv"))))
      .withColumn("__cos", Similarity.cosine(col("__v"), col("__cv")))
      .groupBy(col("__id"))
      .agg(sort_array(collect_list(struct(col("__cos"),
        (-col("__cid")).as("__nc"), col("__cid"))), asc = false)
        .as("__l"))
      .select(col("__l")(0)("__cid").as("cid"),
        col("__l")(0)("__cos").as("__own"),
        when(size(col("__l")) >= 2, col("__l")(1)("__cos"))
          .as("__oth"))
    val a = lit(1.0) - col("__own")
    val b = lit(1.0) - col("__oth")
    ranked
      .withColumn("__sm",
        floor(when(col("__oth").isNull ||
          greatest(a, b) <= 1e-12, lit(0.0))
          .otherwise((col("__own") - col("__oth")) / greatest(a, b))
          * 1000000.0).cast("long"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("__sm")).as("sum_s_micro"))
  }
}
