package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search: brute-force cosine top-k as the exact
  * baseline, and a random-hyperplane LSH bucketed variant as the
  * scale path (bucket join instead of cross join).
  *
  * All arithmetic is double-cast before folding so Spark and DuckDB
  * fold identical IEEE754 sequences (float32 upcast is exact).
  *
  * Zero-norm vectors (the failed-embedding artifact every corpus
  * carries a few of) have no direction: their cosine is 0/0 = NaN,
  * and both Spark and DuckDB sort NaN ABOVE every real value — an
  * unguarded zero vector would rank as the false top-1 neighbor of
  * every query and pass every near-dup threshold. Every cosine
  * operator here filters them out up front.
  */
object Similarity {

  /** Fail-fast width check: a vector whose length disagrees with the
    * operator's `dims` raises, instead of VecDot's null silently
    * collapsing every LSH bucket to 0 (which would turn the bucket
    * join into the full cross join it exists to avoid).
    */
  private def dimsGuard(vec: Column, dims: Int): Column =
    when(size(vec) === dims, vec).otherwise(raise_error(concat(
      lit(s"expected a $dims-dim vector, got length "),
      size(vec).cast("string"))))

  /** [[dimsGuard]] against a REFERENCE vector whose width is only
    * known per row (the IVF join paths, where the centroid table is
    * data): raises on the first (vector, centroid) pair whose widths
    * disagree, instead of a null cosine silently resolving the argmax
    * on the tie-break alone and mis-assigning the vector to the
    * smallest-id list.
    */
  private def sameDimsGuard(vec: Column, ref: Column): Column =
    when(size(vec) === size(ref), vec).otherwise(raise_error(concat(
      lit("vector length "), size(vec).cast("string"),
      lit(" does not match the centroid dimension "),
      size(ref).cast("string"))))

  /** The IVF assignment tie-break (`max_by` over struct(cos, −id))
    * negates the centroid id, which is only total-ordered for
    * numeric ids — a string id would ANSI-error or null out into
    * nondeterministic ties. INTEGRAL only (not merely numeric): the
    * literal fast path folds ids through `cast("long")`, where
    * fractional ids 1.2 and 1.7 would collide into one list,
    * duplicating probe rows and silently diverging from the
    * broadcast-join path's raw-id behavior.
    */
  private def requireNumericCentroidIds(centroids: DataFrame): Unit = {
    import org.apache.spark.sql.types._
    val dt = centroids.schema("id").dataType
    require(dt == ByteType || dt == ShortType || dt == IntegerType ||
        dt == LongType,
      s"centroid ids must be an integral type, got $dt: the " +
        "assignment tie-break negates the id and the literal fold " +
        "addresses lists by exact long id")
  }

  /** The family's shared top-k tail: top-k rows per `query_id` by
    * (`score` DESC, neighbor_id ASC), projected to
    * (query_id, neighbor_id, score). ONE definition so the tie-break
    * cannot fork between the seven scorers ([[exactRefine]]'s
    * rationale applied family-wide — a tie-break fix must not need
    * re-applying in six more places to keep oracle parity). Public
    * because a MATERIALIZED candidate stage composes through it: a
    * candidate table built once at k′ ≥ k serves every k ≤ k′
    * consumer with a
    * window over ≤ k′ rows per query (top-k of a top-k′ ranking
    * equals top-k of the full ranking under the same ordering), so
    * e.g. the plain IVF-PQ query and its refine twin share ONE
    * ADC pipeline run instead of re-deriving it each.
    */
  def topKPerQuery(scored: DataFrame, score: String,
                   k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col(score).desc, col("neighbor_id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select("query_id", "neighbor_id", score)
  }

  /** Dot product of two float vectors: native codegen'd kernel
    * (graft.functions.VecDot) — a tight primitive loop instead of a
    * per-element lambda; bit-identical to the higher-order
    * `aggregate(zip_with(...))` fold it replaces.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vec_dot(a, b)

  def norm(a: Column): Column =
    graft.functions.VectorFunctions.vec_norm(a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each row of `queries` against `corpus`
    * by brute-force cosine. The cross join is intentional — this is
    * the correctness baseline, and `queries` is expected to be a
    * SMALL probe set (the bench fixture passes ≤50 rows; the
    * `maxQueries` guard defaults to 10_000, beyond which the
    * |queries|·|corpus| pair count stops being a baseline and starts
    * being the workload). For corpus-vs-corpus or large probe sets
    * use [[lshTopK]] / [[ivfFlatTopK]] / [[ivfPqTopK]] — the bucketed
    * ladders beside this method that bound the candidate set.
    * `queries`/`corpus` need (id, vec) columns.
    *
    * Norms are hoisted into the per-row projections below the join, so
    * each pair pays ONE fold (the dot product) instead of three; the
    * arithmetic sequence per value is unchanged (dot/(na*nb)).
    *
    * The guard counts `queries` (one cheap job on what should be a
    * tiny frame) rather than trusting the caller's estimate: failing
    * loudly here beats a silent week-long cartesian on a cluster.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     k: Int, maxQueries: Int = 10000): DataFrame = {
    // limit(max+1) short-circuits the scan: the guard job reads just
    // past the cap, never the whole query frame
    val nq = queries.limit(maxQueries + 1).count()
    require(nq <= maxQueries,
      s"bruteForceTopK: >$maxQueries query rows — " +
        "this is the exact baseline for small probe sets; use " +
        "lshTopK/ivfFlatTopK/ivfPqTopK for large query sets, or raise " +
        "maxQueries explicitly if the cartesian is intended")
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"),
      norm(col("vec")).as("__qn")).filter(col("__qn") > 0)
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").as("cv"),
      norm(col("vec")).as("__cn")).filter(col("__cn") > 0)
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        dot(col("qv"), col("cv")) / (col("__qn") * col("__cn")))
    topKPerQuery(scored, "cos", k)
  }

  /** Deterministic ±1 hyperplane matrix: planes × dims, sign p,i
    * derived from md5("p:i"). Public knowledge (random-hyperplane
    * LSH, Charikar'02); md5 replaces an RNG so any engine can
    * reproduce the planes.
    */
  def hyperplanes(planes: Int, dims: Int): Array[Array[Int]] = {
    // 63, not 64: lshBucket packs sign bits as 1L << p, and p = 63
    // is the last distinct bit (p = 64 would wrap to 1L << 0,
    // silently aliasing plane 64 with plane 0 — merged buckets and
    // corrupted recall with no error)
    require(planes >= 1 && planes <= 63,
      s"planes ($planes) must be in [1, 63] (bucket bits of one long)")
    require(dims >= 1, s"dims ($dims) must be positive")
    val mdf = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(planes, dims) { (p, i) =>
      val h = mdf.digest(s"$p:$i".getBytes("UTF-8"))
      if ((h(0) & 1) == 1) 1 else -1
    }
  }

  /** Signed-random-projection dimensionality reduction (the
    * Johnson–Lindenstrauss map with a ±1 matrix, Achlioptas '01):
    * out_j = ⟨vec, s_j⟩ where s_j is row j of the deterministic
    * [[hyperplanes]] sign matrix — the cheap PCA/OPQ stand-in that
    * production ANN pipelines run before indexing when the native
    * dimension is too wide. Pure map over the rows (no shuffle, no
    * state): at 100 TB this is a narrow codegen'd pass that cuts
    * every downstream distance computation from `dims` to `outDims`
    * multiplies. ±1 weights keep every product exact in double, so
    * the projection is bit-reproducible by any engine folding left
    * to right.
    */
  def project(emb: DataFrame, id: Column, vec: Column, outDims: Int,
              dims: Int): DataFrame = {
    require(outDims >= 1 && dims >= outDims,
      "need dims >= outDims >= 1 — projecting UP is not a reduction")
    val signs = hyperplanes(outDims, dims)
    val v = dimsGuard(vec, dims)
    val outCols = signs.zipWithIndex.map { case (w, j) =>
      val wLit = array(w.toIndexedSeq.map(x => lit(x.toFloat)): _*)
      dot(v, wLit).as(s"p$j")
    }
    emb.select(id.as("id") +: outCols.toIndexedSeq: _*)
  }

  /** Int8 scalar quantization — the storage form production embedding
    * stores keep vectors in (4× smaller than float32, cheap SIMD
    * distance kernels): per-dimension global [min, max] over the
    * corpus, then code = floor((x − min)·255 / (max − min)), clamped
    * to [0, 255] (a constant dimension codes to 0). floor of a double
    * quotient, not round(): both engines round-half differently, but
    * floor of the identically-computed quotient is bit-exact. Output
    * is the code sequence as a space-joined string in dimension order
    * (hashable, engine-comparable) plus the per-vector code min/max.
    *
    * Shape at scale: one dims-row aggregate (map-side combine),
    * packed into a SINGLE broadcast row of dim-ordered lo[]/hi[]
    * arrays, then a genuinely map-only encode — codes are computed in
    * place with an indexed `transform` over the vector, so the corpus
    * is never exploded-and-regrouped (the first cut joined stats onto
    * a 64× posexplode and shuffled it back together on id — a full
    * corpus shuffle the docstring wrongly called map-only; PlanSpec
    * now pins the no-regroup shape).
    *
    * Precondition: `id` should be unique — the encode is one output
    * row per INPUT row (the old groupBy form silently merged
    * duplicate ids into one garbled row; this one faithfully emits
    * each row, so a caller with duplicate ids gets duplicates out).
    */
  def quantizeInt8(emb: DataFrame, id: Column, vec: Column,
                   dims: Int): DataFrame = {
    val exploded = emb
      .select(posexplode(dimsGuard(vec, dims)).as(Seq("__i", "__x")))
      .withColumn("__x", col("__x").cast("double"))
    val stats = exploded.groupBy("__i")
      .agg(min(col("__x")).as("__lo"), max(col("__x")).as("__hi"))
    val packed = stats
      .agg(array_sort(collect_list(struct(
        col("__i"), col("__lo"), col("__hi")))).as("__s"))
      .select(transform(col("__s"), e => e("__lo")).as("__lo"),
        transform(col("__s"), e => e("__hi")).as("__hi"))
    // identical IEEE sequence to the stats-join form: (x−lo)·255/(hi−lo)
    def codeAt(x: Column, lo: Column, hi: Column): Column =
      when(hi === lo, lit(0)).otherwise(least(lit(255), greatest(lit(0),
        floor((x - lo) * lit(255.0) / (hi - lo)).cast("int"))))
    emb.select(id.as("id"), dimsGuard(vec, dims).as("__v"))
      .crossJoin(broadcast(packed))
      .select(col("id"), col("__v"), transform(col("__v"),
        (x, i) => codeAt(x.cast("double"),
          element_at(col("__lo"), i + 1),
          element_at(col("__hi"), i + 1))).as("__cs"))
      // NULL-element rows poison to NULL outputs (the vector kernels'
      // discipline): greatest/least SKIP nulls, so an unguarded null
      // element would flow to a confident code 0 — fabricated data in
      // a quantized index. The oracle carries the same row predicate.
      .select(col("id"),
        when(exists(col("__v"), x => x.isNull), lit(null))
          .otherwise(array_join(
            transform(col("__cs"), c => c.cast("string")), " "))
          .as("codes"),
        when(exists(col("__v"), x => x.isNull), lit(null))
          .otherwise(array_min(col("__cs"))).as("code_min"),
        when(exists(col("__v"), x => x.isNull), lit(null))
          .otherwise(array_max(col("__cs"))).as("code_max"))
  }

  /** LSH bucket id: `planes` sign bits of hyperplane projections. */
  def lshBucket(vec: Column, planes: Array[Array[Int]]): Column = {
    require(planes.nonEmpty && planes.length <= 63,
      s"need 1..63 hyperplanes, got ${planes.length} " +
        "(bucket bits of one long — see hyperplanes)")
    val v = dimsGuard(vec, planes(0).length)
    val bits = planes.zipWithIndex.map { case (w, p) =>
      // ±1 is exact in float, so the float-vector kernel applies
      val wLit = array(w.toIndexedSeq.map(x => lit(x.toFloat)): _*)
      when(dot(v, wLit) > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: bucket both sides by hyperplane signature and
    * search only within the bucket — the 100 TB path: a shuffle on
    * the bucket id replaces the cross join. Recall is tunable via
    * `planes` (fewer planes = bigger buckets = higher recall).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              planes: Int = 4, dims: Int = 64): DataFrame = {
    val pl = hyperplanes(planes, dims)
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"),
      norm(col("vec")).as("__qn"), lshBucket(col("vec"), pl).as("__bucket"))
      .filter(col("__qn") > 0)
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").as("cv"),
      norm(col("vec")).as("__cn"), lshBucket(col("vec"), pl).as("__bucket"))
      .filter(col("__cn") > 0)
    val scored = q.join(c, Seq("__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        dot(col("qv"), col("cv")) / (col("__qn") * col("__cn")))
    topKPerQuery(scored, "cos", k)
  }

  /** Exact-score MIPS (maximum inner product) top-k with
    * augmented-space LSH blocking — the MIPS→cosine reduction
    * (Neyshabur & Srebro ICML'15; asymmetric LSH, Shrivastava & Li
    * NeurIPS'14): corpus vector c augments to [c ; √(M² − ‖c‖²)]
    * with M = max corpus norm, so every augmented corpus vector has
    * norm exactly M and cosine ORDER in the augmented space IS
    * inner-product order — hyperplane LSH then blocks MIPS
    * candidates exactly as it blocks cosine. Queries augment with 0
    * (their extra coordinate never fires a plane's last weight).
    *
    * The retrieval shape of recommendation/embedding-scoring
    * workloads, where magnitude matters and cosine is the wrong
    * metric. Candidates rank by the EXACT dot product — the
    * augmentation drives only the blocking, so emitted scores are
    * true inner products. M arrives as ONE broadcast row; the extra
    * coordinate's √(max(M²−n², 0)) is the same guarded IEEE sequence
    * on any engine. Scale shape = [[lshTopK]]'s: a bucket equi-join
    * replaces the cross join, recall tunes with `planes`.
    */
  def mipsTopK(queries: DataFrame, corpus: DataFrame, k: Int,
               planes: Int = 2, dims: Int = 64): DataFrame = {
    val pl = hyperplanes(planes, dims + 1)
    val mrow = corpus.agg(max(norm(col("vec"))).as("__m"))
    def bucketBits(v: Column, extra: Column): Column =
      pl.zipWithIndex.map { case (w, p) =>
        val wPrefix =
          array(w.take(dims).toIndexedSeq.map(x => lit(x.toFloat)): _*)
        when(dot(v, wPrefix) + lit(w(dims).toDouble) * extra > 0,
          lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
    val c = corpus
      .select(col("id").as("neighbor_id"),
        dimsGuard(col("vec"), dims).as("cv"),
        norm(col("vec")).as("__cn"))
      .crossJoin(broadcast(mrow))
      .select(col("neighbor_id"), col("cv"),
        bucketBits(col("cv"), sqrt(greatest(
          col("__m") * col("__m") - col("__cn") * col("__cn"),
          lit(0.0)))).as("__bucket"))
    val q = queries
      .select(col("id").as("query_id"), dimsGuard(col("vec"), dims).as("qv"))
      .withColumn("__bucket", bucketBits(col("qv"), lit(0.0)))
    val scored = q.join(c, Seq("__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("ip", dot(col("qv"), col("cv")))
    topKPerQuery(scored, "ip", k)
  }

  /** First `nlist` corpus vectors (by id) as deterministic IVF seed
    * centroids. Production IVF learns centroids with k-means; any
    * (id, vec) frame — e.g. k-means output — plugs into [[ivfTopK]]
    * unchanged, and seeds keep the whole operator closed-form for the
    * oracle. orderBy+limit is driver-bounded at nlist rows.
    */
  def seedCentroids(corpus: DataFrame, nlist: Int): DataFrame =
    corpus.orderBy(col("id")).limit(nlist)

  /** The ≤64-centroid table as driver-side literals — the shared
    * entry of the IVF family's literal-fold fast path: a production
    * IVF keeps its (parameter-bounded, data-independent-size)
    * centroid table in memory on every searcher, so assignment and
    * probing are per-row folds, not joins. None when the table
    * exceeds 64 rows (the literal fold would bloat generated code);
    * callers fall back to the broadcast-join path.
    *
    * CONTRACT: this runs a driver-bounded job (limit 65) at
    * DataFrame-CONSTRUCTION time — the IVF builders are eager in
    * their centroid argument. Pass a materialized/staged centroid
    * table (every in-repo caller does: seed tables, staged k-means
    * output); an expensive unmaterialized chain would be evaluated
    * here and then again per join branch on the fallback path.
    * Norms are NOT
    * computed driver-side — [[litCos]] runs `vec_norm` over the
    * literal and Catalyst constant-folds it, so the arithmetic is
    * bit-identical to the join form.
    */
  /** The literal centroid fold plus the (single) centroid dimension —
    * callers wrap their vector columns in `dimsGuard(_, dims)` so a
    * width-mismatched corpus/query vector RAISES instead of null-cos
    * structs resolving the argmax on the tie-break alone (silent
    * mis-assignment to the smallest-cid list).
    */
  private final case class LitCents(dims: Int,
                                    cents: Array[(Long, Column)])

  private def collectLitCents(
      centroids: DataFrame): Option[LitCents] = {
    val rows = centroids.select(col("id").cast("long").as("__cid"),
        col("vec").as("__cvec"))
      .filter(norm(col("vec")) > 0)
      .orderBy(col("__cid"))
      .limit(65).collect()
    if (rows.length > 64) return None
    val dims = rows.map(_.getSeq[Any](1).length).distinct
    require(dims.length <= 1,
      s"ragged centroid table: vector lengths ${dims.sorted.mkString(",")}")
    val elemIsFloat = centroids.schema("vec").dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) => true
      case _ => false
    }
    Some(LitCents(dims.headOption.getOrElse(0), rows.map { r =>
      val s = r.getSeq[Any](1)
      val cv =
        if (elemIsFloat)
          typedLit(s.map(_.asInstanceOf[Float]).toArray)
        else
          typedLit(s.map(_.asInstanceOf[Number].doubleValue()).toArray)
      (r.getLong(0), cv)
    }))
  }

  private def litCos(v: Column, cv: Column, vn: Column): Column =
    dot(v, cv) / (vn * norm(cv))

  /** ASSIGN against literal centroids: argmax via a greatest-fold
    * over (cos, -cid) structs — ties to the smaller cid, the same
    * order `max_by(cid, struct(cos, -cid))` resolves.
    */
  private def litArgmaxList(cents: Array[(Long, Column)], v: Column,
                            vn: Column): Column = {
    val packed = cents.map { case (cid, cv) =>
      struct(litCos(v, cv, vn).as("c"), lit(-cid).as("n")) }
    packed.reduce((a, b) => greatest(a, b))("n") * -1
  }

  /** PROBE against literal centroids: the top-nprobe (cos, -cid)
    * structs from an in-row sort of the ≤nlist candidates —
    * descending struct order is (cos DESC, cid ASC), the row_number
    * tie-break. Callers explode the array and read `(field "n") * -1`
    * as the list id (a generator cannot nest inside expressions).
    */
  private def litProbeArray(cents: Array[(Long, Column)], v: Column,
                            vn: Column, nprobe: Int): Column =
    slice(sort_array(
      array(cents.map { case (cid, cv) =>
        struct(litCos(v, cv, vn).as("c"), lit(-cid).as("n")) }: _*),
      asc = false), 1, nprobe)

  /** IVF-flat approximate top-k — the inverted-file scale path
    * (Sivic/Zisserman Video-Google '03, FAISS IVF-flat):
    *
    *   1. ASSIGN: every corpus vector to its nearest centroid's list —
    *      a cross join against the tiny broadcast centroid set folded
    *      into ONE hash aggregate (`max_by` over struct(cos, -cid):
    *      partial-agg friendly, no sort, ties to the smaller cid).
    *   2. PROBE: each query scores the same centroids and keeps its
    *      `nprobe` best lists (bounded window over nlist rows/query).
    *   3. SEARCH: an EQUI-join on list id — queries meet only the
    *      ~|corpus|·nprobe/nlist vectors in their probed lists, never
    *      the full corpus; exact cosine + bounded top-k window.
    *
    * Recall tunes with nprobe/nlist exactly as in FAISS. A hot list
    * (skewed centroid) is an AQE skew-join split, not an OOM: the
    * search is a shuffle join keyed on __list.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
              k: Int, nprobe: Int): DataFrame = {
    requireNumericCentroidIds(centroids)
    // The centroid table is bounded by the NLIST PARAMETER, never by
    // data (a production IVF holds it in memory on every searcher) —
    // so for the common small-nlist case it collects once and both
    // ASSIGN and PROBE become MAP-ONLY folds over literal vectors:
    // no corpus-wide max_by exchange, no per-query probe window.
    // Centroid norms stay engine-computed (vec_norm over the literal,
    // constant-folded by Catalyst), so every cosine is the SAME
    // arithmetic as the join form below — bit-identical results
    // (ExtSpec pins recall/exactness either way).
    val litCents = collectLitCents(centroids)
    // empty table (no non-degenerate centroid) falls through to the
    // join path, which yields the empty result — the same graceful
    // contract as ivfPqTopK, not a construction-time throw
    if (litCents.isDefined && litCents.get.cents.nonEmpty) {
      val LitCents(cdims, cents) = litCents.get
      val assigned = corpus
        .select(col("id").as("neighbor_id"),
          dimsGuard(col("vec"), cdims).as("cv"),
          norm(col("vec")).as("__cn"))
        .filter(col("__cn") > 0)
        .withColumn("__list", litArgmaxList(cents, col("cv"), col("__cn")))
      val probes = queries
        .select(col("id").as("query_id"),
          dimsGuard(col("vec"), cdims).as("qv"),
          norm(col("vec")).as("__qn"))
        .filter(col("__qn") > 0)
        .withColumn("__probe",
          explode(litProbeArray(cents, col("qv"), col("__qn"), nprobe)))
        .select(col("query_id"), col("qv"), col("__qn"),
          (col("__probe")("n") * -1).as("__list"))
      val scored = probes.join(assigned, "__list")
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("cos",
          dot(col("qv"), col("cv")) / (col("__qn") * col("__cn")))
      return topKPerQuery(scored, "cos", k)
    }
    // large-nlist path: broadcast centroid join (the literal fold
    // above would bloat generated code past JIT limits)
    val cent = centroids.select(col("id").as("__cid"),
      col("vec").as("__cvec"), norm(col("vec")).as("__ctn"))
      .filter(col("__ctn") > 0)
    val assigned = corpus
      .select(col("id").as("neighbor_id"), col("vec").as("cv"),
        norm(col("vec")).as("__cn"))
      .filter(col("__cn") > 0)
      .crossJoin(broadcast(cent))
      .withColumn("__ccos",
        dot(sameDimsGuard(col("cv"), col("__cvec")), col("__cvec")) /
          (col("__cn") * col("__ctn")))
      .groupBy(col("neighbor_id"))
      .agg(
        max_by(col("__cid"), struct(col("__ccos"), -col("__cid")))
          .as("__list"),
        first(col("cv")).as("cv"), first(col("__cn")).as("__cn"))
    val probes = queries
      .select(col("id").as("query_id"), col("vec").as("qv"),
        norm(col("vec")).as("__qn"))
      .filter(col("__qn") > 0)
      .crossJoin(broadcast(cent))
      .withColumn("__ccos",
        dot(sameDimsGuard(col("qv"), col("__cvec")), col("__cvec")) /
          (col("__qn") * col("__ctn")))
      .withColumn("__rn", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("__ccos").desc, col("__cid"))))
      .filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("__qn"),
        col("__cid").as("__list"))
    val scored = probes.join(assigned, "__list")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        dot(col("qv"), col("cv")) / (col("__qn") * col("__cn")))
    topKPerQuery(scored, "cos", k)
  }

  /** Embedding near-dup pairs with NO natural blocking key — the IVF
    * scale path for semantic dedup (the companion of
    * [[cosineNearDupPairs]], which needs a label/bucket column):
    *
    *   1. ASSIGN each vector to its `nassign` nearest centroid lists
    *      (broadcast centroid set; multi-assign is the recall guard —
    *      a near-dup pair straddling one centroid boundary still
    *      shares the other list).
    *   2. SELF-JOIN within list — sum of per-list C(n,2) candidate
    *      rows, never corpus², streamed through the shuffle where AQE
    *      can skew-split a hot list.
    *   3. VERIFY with exact cosine ≥ `threshold`, emitted once per
    *      pair — on the literal-centroid path each row carries its
    *      assigned-list array, so a both-lists-shared pair is kept
    *      only in its smallest common list (no distinct exchange); on
    *      the fallback path a trailing distinct dedups the twice-
    *      arriving pairs.
    *
    * The banded rows are repartitioned on the list id so both
    * self-join branches read ONE exchange (same rationale as
    * DedupOps.simhashBandPairs). Centroids come from [[seedCentroids]]
    * or a Clustering.kmeans run — any (id, vec) frame works.
    */
  def ivfNearDupPairs(df: DataFrame, id: Column, vec: Column,
                      centroids: DataFrame, threshold: Double,
                      nassign: Int = 2): DataFrame = {
    // Small-nlist fast path (round 17, the ivfTopK literal fold
    // applied to the pairs shape): with ≤64 literal centroids the
    // top-nassign assignment is an IN-ROW sort — no per-__id
    // row_number window (a corpus-wide exchange), and because each
    // row CARRIES its full assigned-list array through the band
    // shuffle, a pair sharing both lists is emitted exactly once
    // (only from the smallest common list) — no trailing
    // pair-distinct exchange either. 3 exchanges → 1. Requires
    // integral centroid ids (the literal fold negates them); any
    // other id type or a >64-row table falls through to the
    // window/broadcast path below, contract unchanged.
    val integralIds = {
      import org.apache.spark.sql.types._
      centroids.schema("id").dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
    }
    val litCents = if (integralIds) collectLitCents(centroids) else None
    if (litCents.isDefined && litCents.get.cents.nonEmpty) {
      val LitCents(cdims, cents) = litCents.get
      // the ≤nassign assigned list ids ride as SCALAR columns, not an
      // array: the emit-once test below runs once per CANDIDATE PAIR
      // row (within-list C(n,2) of them — the query's hottest loop),
      // where an array_intersect/array_min form would allocate
      // interpreted collections per row; the scalar when-chain stays
      // inside WholeStageCodegen. The column count clamps to the
      // CENTROID count: nassign > nlist cannot assign more lists than
      // exist, and an element_at past the probe array's end THROWS
      // under ANSI semantics rather than padding NULL (caught by the
      // nassign=8-of-6 property edge).
      val nLists = math.min(nassign, cents.length)
      val probe = litProbeArray(cents, col("__v"), col("__n"), nLists)
      val listCols = (0 until nLists).map(j =>
        (element_at(col("__probe"), j + 1)("n") * -1).as(s"__l$j"))
      val assigned = df
        .select(id.as("__id"), dimsGuard(vec, cdims).as("__v"),
          norm(vec).as("__n"))
        .filter(col("__n") > 0)
        .withColumn("__probe", probe)
        .select(col("__id") +: col("__v") +: col("__n") +: listCols :+
          explode(transform(col("__probe"), x => x("n") * -1))
            .as("__list"): _*)
        .repartition(col("__list"))
      def side(tag: String) = assigned.select(
        col("__list") +: col("__id").as(s"id_$tag") +:
          col("__v").as(s"v$tag") +: col("__n").as(s"__n$tag") +:
          (0 until nLists).map(j =>
            col(s"__l$j").as(s"__l${j}$tag")): _*)
      // smallest COMMON list of the pair: for each of a's lists, its
      // value if b also holds it (NULL otherwise); least() skips
      // NULLs, and a joined row always has ≥1 common list
      val commonMin = {
        val cands = (0 until nLists).map { i =>
          val inB = (0 until nLists).map(j =>
            col(s"__l${i}a") === col(s"__l${j}b"))
            .reduce(_ || _)
          when(inB, col(s"__l${i}a"))
        }
        if (cands.size == 1) cands.head else least(cands: _*)
      }
      return side("a").join(side("b"), Seq("__list"))
        .filter(col("id_a") < col("id_b") && col("__list") === commonMin)
        .withColumn("cos",
          dot(col("va"), col("vb")) / (col("__na") * col("__nb")))
        .filter(col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    }
    val cent = centroids.select(col("id").as("__cid"),
      col("vec").as("__cvec"), norm(col("vec")).as("__ctn"))
      .filter(col("__ctn") > 0)
    val assigned = df
      .select(id.as("__id"), vec.as("__v"), norm(vec).as("__n"))
      .filter(col("__n") > 0)
      .crossJoin(broadcast(cent))
      .withColumn("__ccos",
        dot(sameDimsGuard(col("__v"), col("__cvec")), col("__cvec")) /
          (col("__n") * col("__ctn")))
      .withColumn("__rn", row_number().over(Window.partitionBy("__id")
        .orderBy(col("__ccos").desc, col("__cid"))))
      .filter(col("__rn") <= nassign)
      .select(col("__id"), col("__v"), col("__n"), col("__cid").as("__list"))
      .repartition(col("__list"))
    val a = assigned.select(col("__list"), col("__id").as("id_a"),
      col("__v").as("va"), col("__n").as("__na"))
    val b = assigned.select(col("__list"), col("__id").as("id_b"),
      col("__v").as("vb"), col("__n").as("__nb"))
    a.join(b, Seq("__list"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        dot(col("va"), col("vb")) / (col("__na") * col("__nb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
      .distinct()
  }

  /** Squared L2 distance: native codegen'd kernel, elementwise
    * (xᵢ−yᵢ)² left-to-right fold — the PQ assignment metric.
    */
  def l2sq(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vec_l2sq(a, b)

  /** Product-quantization top-k by asymmetric distance computation
    * (Jégou/Douze/Schmid, TPAMI'11 — the FAISS `PQ` index): split
    * each vector into `m` subvectors, learn a `codebookK`-codeword
    * codebook per subspace (one Lloyd update from the
    * first-`codebookK`-ids init, fixed-point centroid means — the
    * [[Clustering]] reproducibility contract), encode the corpus as m
    * small codes, and score queries against CODES: per query, an m ×
    * codebookK table of subspace dot products, and each corpus
    * vector's approximate inner product is the sum of its m looked-up
    * entries. Table entries are 1e-6 fixed-point longs, so the m-term
    * sum is exact integer arithmetic — order-independent across
    * partitions and bit-reproducible in the DuckDB oracle.
    *
    * The scale story: the corpus is compressed to m·log₂(codebookK)
    * bits per vector (64 bits at the 16×16 default — 128× smaller
    * than 64 float32 dims), the codebook (m·codebookK rows) and the
    * per-query tables (|Q|·m·codebookK rows) broadcast, and the scan
    * is ONE equi-join over the codes — no vector arithmetic per
    * (query, vector) pair at search time. Compose with [[ivfTopK]]'s
    * list pruning for the full IVF-PQ shape. Codes are assigned by
    * squared-L2 (reconstruction error — what bounds the inner-product
    * approximation), ties to the smaller codeword id.
    *
    * Recall depends on cluster structure; on the near-isotropic
    * synthetic test corpus the 64-bit codes reach ~0.39 recall@5
    * against exact inner-product search (vs ~0.01 at random), and on
    * clustered corpora (the data PQ exists for) the codebook captures
    * most of the variance.
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
             m: Int = 16, dims: Int = 64, codebookK: Int = 16,
             codebook: Option[DataFrame] = None,
             codes: Option[DataFrame] = None): DataFrame = {
    val (codesDf, tables) = pqCodesAndTables(queries, corpus, m, dims,
      codebookK, codebook, codes)
    // one row per (query, neighbor) — the m-entry sum is a single
    // map-lookup fold over the packed code array, not an m-way row
    // expansion + re-shuffle
    topKPerQuery(
      codesDf.crossJoin(broadcast(tables))
        .filter(col("query_id") =!= col("__id"))
        .select(col("query_id"), col("__id").as("neighbor_id"),
          adcSum(col("__ck"), col("__tm")).as("adc_q")),
      "adc_q", k)
  }

  /** IVF-PQ: [[ivfTopK]]'s coarse list pruning composed with
    * [[pqTopK]]'s compressed-code scoring — the full FAISS
    * `IVFx,PQy` shape for corpus-scale ANN. The coarse quantizer
    * restricts each query to its `nprobe` nearest lists' members, and
    * only those (query, vector) pairs are ADC-scored — at 100 TB the
    * scan touches nprobe/nlist of the codes, each 64 bits instead of
    * the raw vector.
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame,
                centroids: DataFrame, k: Int, nprobe: Int,
                m: Int = 16, dims: Int = 64, codebookK: Int = 16,
                codebook: Option[DataFrame] = None,
                codes: Option[DataFrame] = None): DataFrame = {
    // coarse quantizer: same cosine assign/probe as ivfTopK (the
    // vectors themselves are NOT carried past this point — scoring
    // happens on codes). Small nlist takes the literal-centroid fold
    // (assignment and probe map-only, no corpus max_by exchange, no
    // probe window); large nlist keeps the broadcast join.
    requireNumericCentroidIds(centroids)
    val litCents = collectLitCents(centroids)
    val (assigned, probes) =
      if (litCents.isDefined && litCents.get.cents.nonEmpty) {
        val LitCents(cdims, cents) = litCents.get
        val a = corpus
          .select(col("id").as("neighbor_id"),
            dimsGuard(col("vec"), cdims).as("cv"),
            norm(col("vec")).as("__cn"))
          .filter(col("__cn") > 0)
          .select(col("neighbor_id"),
            litArgmaxList(cents, col("cv"), col("__cn")).as("__list"))
        val p = queries
          .select(col("id").as("query_id"),
            dimsGuard(col("vec"), cdims).as("qv"),
            norm(col("vec")).as("__qn"))
          .filter(col("__qn") > 0)
          .withColumn("__probe",
            explode(litProbeArray(cents, col("qv"), col("__qn"), nprobe)))
          .select(col("query_id"), (col("__probe")("n") * -1).as("__list"))
        (a, p)
      } else {
        val cent = centroids.select(col("id").as("__ccid"),
          col("vec").as("__cvec"), norm(col("vec")).as("__ctn"))
          .filter(col("__ctn") > 0)
        val a = corpus
          .select(col("id").as("neighbor_id"), col("vec").as("cv"),
            norm(col("vec")).as("__cn"))
          .filter(col("__cn") > 0)
          .crossJoin(broadcast(cent))
          .withColumn("__ccos",
            dot(sameDimsGuard(col("cv"), col("__cvec")), col("__cvec")) /
              (col("__cn") * col("__ctn")))
          .groupBy(col("neighbor_id"))
          .agg(max_by(col("__ccid"), struct(col("__ccos"), -col("__ccid")))
            .as("__list"))
        val p = queries
          .select(col("id").as("query_id"), col("vec").as("qv"),
            norm(col("vec")).as("__qn"))
          .filter(col("__qn") > 0)
          .crossJoin(broadcast(cent))
          .withColumn("__ccos",
            dot(sameDimsGuard(col("qv"), col("__cvec")), col("__cvec")) /
              (col("__qn") * col("__ctn")))
          .withColumn("__rn",
            row_number().over(Window.partitionBy("query_id")
              .orderBy(col("__ccos").desc, col("__ccid"))))
          .filter(col("__rn") <= nprobe)
          .select(col("query_id"), col("__ccid").as("__list"))
        (a, p)
      }
    // BROADCAST the probe list (round 19): it is |Q|·nprobe rows —
    // small whenever the query set is (and it must be: the per-query
    // ADC tables broadcast below). The planner's estimate for the
    // derived frame is corpus-sized, so without the hint this join
    // sort-merged the CORPUS-sized assignment through an exchange on
    // the list id — a hot-list skew hazard at scale on top of the
    // shuffle itself.
    val allowed = broadcast(probes).join(assigned, "__list")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
    val (codesDf, tables) = pqCodesAndTables(queries, corpus, m, dims,
      codebookK, codebook, codes)
    // one code-array row per candidate — the old shape expanded every
    // (query, neighbor) pair m× before a groupBy re-collapsed it; the
    // packed form joins each candidate ONCE and folds the m lookups
    // against the broadcast per-query table map
    topKPerQuery(
      allowed
        .join(codesDf.select(col("__id").as("neighbor_id"), col("__ck")),
          Seq("neighbor_id"))
        .join(broadcast(tables), Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          adcSum(col("__ck"), col("__tm")).as("adc_q")),
      "adc_q", k)
  }

  /** Shared PQ machinery: the per-subspace codebook (first-ids init +
    * one fixed-point Lloyd update), the corpus codes PACKED as one
    * "j:cid" key array per vector (`__id`, `__ck`), and the per-query
    * fixed-point ADC tables PACKED as one (j:cid)→tq map per query
    * (`query_id`, `__tm`, ≤ m·codebookK entries — broadcastable).
    * Packing at encode time means scoring joins carry ONE row per
    * (query, neighbor) candidate instead of m.
    */
  // one row per (vector, subspace): subspace index as DATA, so the
  // m codebooks train/encode/score in ONE plan, not m plan copies.
  // dimsGuard here covers the whole PQ family (train/encode/tables):
  // an unguarded short vector would slice into truncated subvectors,
  // l2sq them to NULL, drop subspaces from the code array, and
  // adcSum's coalesce(0) would then score the absence as 0 — a
  // deflated but valid-looking rank instead of the family's
  // documented fail-fast
  private def pqSubs(df: DataFrame, idName: String, m: Int,
                     d: Int): DataFrame =
    df.select(col("id").as(idName),
      posexplode(array((0 until m).map(j =>
        slice(dimsGuard(col("vec"), m * d), j * d + 1, d)): _*))
        .as(Seq("__j", "__sv")))

  // per-subspace codeword ARRAY for the in-row argmin (round 19): one
  // broadcastable row per subspace. collect_list order is partition-
  // dependent, which is fine — the kernel's comparison is a total
  // order, so the winner is order-independent.
  private def pqCentArray(cents: DataFrame): DataFrame =
    cents.groupBy("__j")
      .agg(collect_list(struct(col("__cid"), col("__cv"))).as("__cb"))

  // argmin_{codeword} l2sq, ties to the smaller cid; keeps __sv for
  // the centroid update. Round 19: IN-ROW via the native
  // [[org.apache.spark.sql.graft.VecArgminL2]] kernel over the
  // broadcast per-subspace codeword array — the old broadcast-join +
  // min_by form expanded every subvector k×, shuffled the expansion
  // (the aggregation's exchange), and SORTED it twice (a struct
  // ordering is not a mutable aggregation buffer → SortAggregate).
  // Bit-identical l2sq fold and (l2, cid) tie order by the kernel's
  // contract; the inner join on __j is preserved (a subspace with no
  // codewords still contributes no rows).
  private def pqAssign(pts: DataFrame, cents: DataFrame): DataFrame =
    pts.join(broadcast(pqCentArray(cents)), "__j")
      .select(col("__id"), col("__j"),
        org.apache.spark.sql.graft.NearestColumns
          .vec_argmin_l2(col("__sv"), col("__cb")).as("__cid"),
        col("__sv"))

  // the CODE-ONLY argmin (no subvector in the output row)
  private def pqAssignCid(pts: DataFrame, cents: DataFrame): DataFrame =
    pts.join(broadcast(pqCentArray(cents)), "__j")
      .select(col("__id"), col("__j"),
        org.apache.spark.sql.graft.NearestColumns
          .vec_argmin_l2(col("__sv"), col("__cb")).as("__cid"))

  // fixed-point per-dimension means (Clustering.updateCentroids with
  // the subspace in the key)
  private def pqUpdate(assigned: DataFrame): DataFrame =
    assigned
      .select(col("__j"), col("__cid"),
        posexplode(col("__sv")).as(Seq("__i", "__x")))
      .groupBy("__j", "__cid", "__i")
      .agg(sum(floor(col("__x").cast("double") * lit(1000000.0))
        .cast("long")).as("__s"), count(lit(1)).as("__n"))
      .groupBy("__j", "__cid")
      .agg(transform(
        array_sort(collect_list(struct(col("__i"), col("__s"),
          col("__n")))),
        e => (e("__s").cast("double") / e("__n")) / lit(1000000.0))
        .as("__cv"))

  /** Train the PQ codebook for `corpus` — the per-subspace codewords
    * (first-`codebookK`-ids init + one fixed-point Lloyd update) with
    * each codeword's dense within-subspace rank. Output columns:
    * (`__j` subspace, `__cid` codeword id, `__cv` codeword vector,
    * `__r` rank) — ≤ m·codebookK rows.
    *
    * Training depends on the CORPUS only, which is why it is public:
    * an index is trained once and queried many times (the FAISS
    * lifecycle), so callers running several PQ searches over one
    * corpus should train once (or memoize — see
    * ExtensionQueries.prebuildStages) and pass the result through
    * [[pqTopK]]/[[ivfPqTopK]]'s `codebook` parameter rather than let
    * every query replan the training aggregations. Within one plan
    * the codebook subtree is consumed by several broadcasts, so an
    * un-materialized codebook is recomputed per consumer — the
    * dominant cost of a PQ query at small scale, and pure waste at
    * any scale.
    *
    * `trainSample` > 1 trains on the deterministic id-modulus
    * subsample `id % trainSample == 0` (seeds included) — the FAISS
    * practice: k-means codebooks converge on a sample, and at corpus
    * scale training on everything is pure waste (FAISS caps training
    * points per centroid and subsamples the rest). The sample is a
    * pure function of the ids, so an oracle re-derives the identical
    * codebook. Codes/encode still cover the FULL corpus.
    */
  def pqTrain(corpus: DataFrame, m: Int = 16, dims: Int = 64,
              codebookK: Int = 16, trainSample: Int = 1): DataFrame = {
    require(dims % m == 0,
      s"dims ($dims) must split evenly into m ($m) subspaces")
    require(trainSample >= 1, "trainSample is a modulus, must be >= 1")
    val d = dims / m
    val train =
      if (trainSample == 1) corpus
      else corpus.filter(col("id") % trainSample === 0)
    // keyed spread (round 19): with the in-row argmin kernel the
    // assign pass no longer has an aggregation exchange to spread a
    // single-row-group scan, so the whole subvector pipeline would
    // serialize onto one task; the narrow (id, vec) spread restores
    // kernel parallelism and is the identity on real multi-split
    // inputs at scale.
    val base = pqSubs(DedupOps.spreadNarrow(train, Seq(col("id"))),
      "__id", m, d)
    val cent0 = pqSubs(train.orderBy(col("id")).limit(codebookK),
        "__cid", m, d)
      .select(col("__j"), col("__cid"), col("__sv").as("__cv"))
    val cent1 = pqUpdate(pqAssign(base, cent0))
    // cids are seed-vector ids (not 0..k−1) and a subspace can lose
    // empty codewords, so rank each codeword WITHIN its subspace —
    // (j, rank) is then a dense O(1)-indexable address. The window is
    // over the ≤ m·codebookK codebook, partitioned by subspace.
    cent1.withColumn("__r",
      row_number().over(Window.partitionBy("__j").orderBy("__cid")) - 1)
  }

  /** Encode the corpus against a trained codebook: ONE packed
    * (`__id`, `__ck`) row per vector, `__ck` the subspace-ordered
    * (j, rank) code array. Like [[pqTrain]], this depends on the
    * CORPUS (and codebook) only — the index-build half of the FAISS
    * lifecycle — so callers running several PQ searches over one
    * corpus should encode once and pass the result through the
    * `codes` parameter of [[pqTopK]]/[[ivfPqTopK]]/[[pqRefineTopK]]/
    * [[ivfPqRefineTopK]] (or memoize: ExtensionQueries' `pq_codes`
    * stage); an un-materialized codes subtree is otherwise re-built
    * by every query over the same index.
    */
  def pqEncode(corpus: DataFrame, m: Int = 16, dims: Int = 64,
               codebookK: Int = 16,
               codebook: Option[DataFrame] = None): DataFrame = {
    require(dims % m == 0,
      s"dims ($dims) must split evenly into m ($m) subspaces")
    val d = dims / m
    val centRanked = codebook.getOrElse(pqTrain(corpus, m, dims,
      codebookK))
    // NOTE (round 19): a literal-codebook in-row encode (the
    // collectLitCents idiom — least()-fold over m·codebookK literal
    // codewords per row) was A/B measured and REVERTED: the 256-
    // candidate struct tree blew planning/codegen cost past any
    // execution saving (1.0 s → 2.7-9.8 s at sf0.1). The join path
    // below with the fixed-width-buffer argmin stands.
    // pack the m codes into one (j, rank) array per vector, ordered
    // by subspace (assign against the codebook, then swap the raw
    // cid for its dense rank). Keyed spread as in [[pqTrain]] — the
    // id-keyed partitioning doubles as the pack groupBy's exchange;
    // capped (the mm-blob rule) because the packed codes are a
    // many-consumer memoized checkpoint.
    pqAssignCid(pqSubs(DedupOps.spreadNarrow(corpus, Seq(col("id")),
        cap = math.max(2,
          corpus.sparkSession.sparkContext.defaultParallelism / 4)),
        "__id", m, d),
        centRanked.select("__j", "__cid", "__cv"))
      .join(broadcast(centRanked.select("__j", "__cid", "__r")),
        Seq("__j", "__cid"))
      .groupBy("__id")
      .agg(transform(
        array_sort(collect_list(struct(col("__j"), col("__r")))),
        e => struct(e("__j").as("j"), e("__r").as("r"))).as("__ck"))
  }

  private def pqCodesAndTables(queries: DataFrame, corpus: DataFrame,
                               m: Int, dims: Int, codebookK: Int,
                               codebook: Option[DataFrame],
                               precodes: Option[DataFrame])
      : (DataFrame, DataFrame) = {
    require(dims % m == 0,
      s"dims ($dims) must split evenly into m ($m) subspaces")
    val d = dims / m
    val centRanked = codebook.getOrElse(pqTrain(corpus, m, dims,
      codebookK))
    val codes = precodes.getOrElse(
      pqEncode(corpus, m, dims, codebookK, Some(centRanked)))
    // per-query ADC table: one fixed-point dot per (subspace,
    // codeword), folded into a nested array indexed [j][rank] — a
    // ≤ m·codebookK-entry broadcastable structure whose lookups are
    // two O(1) array derefs (a Catalyst MAP's element_at is a LINEAR
    // key scan — measurably catastrophic 16× per candidate)
    val tables = pqSubs(queries, "query_id", m, d)
      .join(broadcast(centRanked), "__j")
      .select(col("query_id"), col("__j"), col("__r"),
        floor(dot(col("__sv"), col("__cv")) * lit(1000000.0))
          .cast("long").as("__tq"))
      .groupBy("query_id", "__j")
      .agg(transform(array_sort(collect_list(struct(col("__r"),
        col("__tq")))), e => e("__tq")).as("__tj"))
      .groupBy("query_id")
      .agg(transform(array_sort(collect_list(struct(col("__j"),
        col("__tj")))), e => e("__tj")).as("__tm"))
    (codes, tables)
  }

  /** Two-stage retrieval: PQ/ADC approximate candidate generation
    * re-scored EXACTLY — the FAISS `IndexRefineFlat` composition and
    * the shape production retrieval actually ships (a cheap
    * compressed-domain scan proposes `k·refine` candidates per query;
    * only those ≤ k·refine rows ever touch full vectors again).
    *
    * Scale: stage 1 is [[pqTopK]] (codes-only scan, broadcastable
    * tables); stage 2 joins the k·refine candidate ids back to the
    * corpus — an equi-join that shuffles candidates, never the
    * corpus² — and the final window ranks ≤ k·refine rows per query.
    * Zero-norm vectors are excluded from re-scoring (cosine is
    * undefined); raise `refine` if the corpus carries many.
    *
    * Cosine op order matches the exact-search operators (dot(q, c) /
    * (‖q‖·‖c‖), left-fold sums) so scores are bit-reproducible in the
    * oracle.
    *
    * METRIC CONTRACT: stage 1 ranks candidates by approximate INNER
    * PRODUCT (that is what ADC tables hold), stage 2 re-ranks by
    * cosine. On L2-NORMALIZED embeddings the two metrics induce the
    * same order and the composition is exactly FAISS's
    * `IndexRefineFlat` — normalizing upstream is the standard
    * practice for cosine ANN and the intended deployment here. On
    * unnormalized corpora with a wide norm spread, stage 1's
    * candidate set is biased toward large-norm vectors and a
    * high-cosine/small-norm neighbor can miss the k·refine cut no
    * matter the refine factor — normalize first, or use [[mipsTopK]]
    * when magnitude is MEANT to matter.
    */
  def pqRefineTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                   refine: Int = 4, m: Int = 16, dims: Int = 64,
                   codebookK: Int = 16,
                   codebook: Option[DataFrame] = None,
                   codes: Option[DataFrame] = None): DataFrame = {
    require(refine >= 1, "refine factor must be >= 1")
    val cand = pqTopK(queries, corpus, k * refine, m, dims, codebookK,
      codebook, codes).select("query_id", "neighbor_id")
    exactRefine(cand, queries, corpus, k)
  }

  /** The shared exact re-rank stage of the refine operators
    * (FAISS `IndexRefineFlat` as a standalone composable): join the
    * per-query candidate ids back to full vectors (an equi-join that
    * shuffles candidates, never the corpus²), score the documented
    * cosine sequence, keep top-k per query over ≤ the bounded
    * candidate set. One definition so the zero-norm policy and
    * (cos desc, neighbor_id) tie-break cannot fork between the
    * operators while their oracles stay unified. Public for the same
    * materialized-candidate-stage composition as [[topKPerQuery]]:
    * feed it ANY (query_id, neighbor_id) candidate table — an ADC
    * stage built once at k·refine, an LSH bucket join, a hybrid
    * union — and it finishes the exact re-rank.
    */
  def refineTopK(cand: DataFrame, queries: DataFrame,
                 corpus: DataFrame, k: Int): DataFrame =
    exactRefine(cand.select("query_id", "neighbor_id"),
      queries, corpus, k)

  private def exactRefine(cand: DataFrame, queries: DataFrame,
                          corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"),
      norm(col("vec")).as("__qn")).filter(col("__qn") > 0)
    val c = corpus.select(col("id").as("neighbor_id"),
      col("vec").as("cv"), norm(col("vec")).as("__cn"))
      .filter(col("__cn") > 0)
    topKPerQuery(
      cand.join(c, "neighbor_id").join(q, "query_id")
        .withColumn("cos",
          dot(col("qv"), col("cv")) / (col("__qn") * col("__cn"))),
      "cos", k)
  }

  /** The full production ladder in one call: IVF coarse pruning →
    * PQ/ADC compressed scoring → exact re-rank of the k·refine
    * survivors ([[ivfPqTopK]] composed with [[pqRefineTopK]]'s refine
    * stage — FAISS `IVFx,PQy` wrapped in `IndexRefineFlat`). At scale
    * each query touches nprobe/nlist of the codes, and full vectors
    * only for k·refine candidate rows.
    */
  def ivfPqRefineTopK(queries: DataFrame, corpus: DataFrame,
                      centroids: DataFrame, k: Int, nprobe: Int,
                      refine: Int = 4, m: Int = 16, dims: Int = 64,
                      codebookK: Int = 16,
                      codebook: Option[DataFrame] = None,
                      codes: Option[DataFrame] = None): DataFrame = {
    require(refine >= 1, "refine factor must be >= 1")
    val cand = ivfPqTopK(queries, corpus, centroids, k * refine, nprobe,
      m, dims, codebookK, codebook, codes).select("query_id", "neighbor_id")
    exactRefine(cand, queries, corpus, k)
  }

  /** ADC score of one candidate: fold the packed (j, rank) code array
    * against the query's nested [j][rank] table — O(1) per entry.
    * Every address is present by construction (codes and tables both
    * derive from cent1's (j, cid) set; ranks are contiguous within a
    * subspace). A caller who pairs codes with a MISMATCHED codebook
    * (rank past the table) fails LOUDLY: under ANSI semantics
    * element_at throws on an out-of-range index — the right outcome
    * for corrupted inputs, and the coalesce(0) does NOT absorb it
    * (it only absorbs NULL table cells, which the builders never
    * produce; kept for the degenerate empty-subspace row).
    */
  private def adcSum(codeSlots: Column, tbl: Column): Column =
    aggregate(codeSlots, lit(0L), (acc, s) =>
      acc + coalesce(element_at(element_at(tbl, s.getField("j") + 1),
        s.getField("r") + 1), lit(0L)))

  /** Embedding-cosine near-duplicate pairs within a blocking key
    * (e.g. a label or coarse LSH bucket): pairs (a<b) with cosine
    * above `threshold`. Norms hoisted per row (see bruteForceTopK).
    */
  def cosineNearDupPairs(df: DataFrame, id: Column, vec: Column,
                         block: Column, threshold: Double): DataFrame = {
    val a = df.select(block.as("__blk"), id.as("id_a"), vec.as("va"),
      norm(vec).as("__na")).filter(col("__na") > 0)
    val b = df.select(block.as("__blk"), id.as("id_b"), vec.as("vb"),
      norm(vec).as("__nb")).filter(col("__nb") > 0)
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        dot(col("va"), col("vb")) / (col("__na") * col("__nb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", arXiv:2303.09540):
    * k-means partitions the embedding space, then near-duplicates are
    * detected ONLY within each cluster — the clustering is the
    * blocking key, so the pair space is Σ C(|cluster|,2) instead of
    * C(n,2). Returns the KEPT rows (`id`, `cid`): a row is dropped
    * iff some same-cluster row with a SMALLER id is cosine-similar at
    * ≥ `threshold` (keep-min is deterministic and order-independent;
    * the paper keeps one representative per ε-ball, and which one is
    * a free policy choice). Note the rule is non-transitive by
    * design: in a chain a~b, b~c, a≁c, both b and c are dropped —
    * each has its own smaller similar neighbor — which matches the
    * paper's "remove all but one point of every ε-cluster" intent.
    *
    * Scale: k grows with the corpus so |cluster| ≈ n/k stays bounded
    * (the paper runs 50k clusters over 5 B LAION embeddings keeping
    * clusters at ~100k, each dedup'd independently); the within-
    * cluster self-join shuffles each side once on `cid`, and the
    * final anti join removes the dropped set. Nothing is quadratic in
    * n — only in the bounded cluster size.
    */
  def semanticDedup(df: DataFrame, id: Column, vec: Column, k: Int,
                    iters: Int = 2, threshold: Double = 0.25): DataFrame =
    semanticDedupWith(Clustering.kmeansAssign(df, id, vec, k, iters),
      df, id, vec, threshold)

  /** [[semanticDedup]] against ALREADY-COMPUTED cluster labels
    * (id, cid) — the shape when the k-means model is a materialized
    * stage: the labels table is consumed three times (both sides of
    * the within-cluster pair join + the survivor anti join), so
    * feeding it from a stage turns three Lloyd replays into three
    * cheap label scans.
    */
  def semanticDedupWith(labelsIn: DataFrame, df: DataFrame, id: Column,
                        vec: Column,
                        threshold: Double = 0.25): DataFrame = {
    val v = df.select(id.as("__id"), vec.as("__v"),
      norm(vec).as("__n"))
    val labels = labelsIn.select(col("id"), col("cid"))
    val withVec = labels.join(
      v.select(col("__id").as("id"), col("__v"), col("__n")), "id")
    val dropped = withVec.as("a")
      .join(withVec.as("b"),
        col("a.cid") === col("b.cid") && col("a.id") < col("b.id"))
      .filter(col("a.__n") > 0 && col("b.__n") > 0 &&
        dot(col("a.__v"), col("b.__v")) /
          (col("a.__n") * col("b.__n")) >= threshold)
      .select(col("b.id").as("id")).distinct()
    labels.join(dropped, Seq("id"), "left_anti").select("id", "cid")
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher SIGIR'09) — the
    * standard hybrid-retrieval combiner: each input ranked list
    * contributes 1/(k0 + rank) per document and the fused order is by
    * the summed score. This is how production RAG stacks merge a
    * lexical (BM25) list with a vector (ANN) list without score
    * calibration — RRF only reads RANKS, so the two retrievers'
    * incomparable score scales never touch.
    *
    * Scores are integer parts-per-million (`1000000 div (k0+rank)`,
    * exact on any engine) — a float 1/(k0+r) sum would be fold-order
    * sensitive in the last ulp and could never hash-match an oracle.
    *
    * `lists` maps a short name to a (doc_id, rnk) DataFrame (rnk
    * 1-based int). Output: (doc_id, <name>_rnk…, rrf_ppm, rnk) for
    * the fused top `k`, rnk by (rrf_ppm DESC, doc_id ASC); a document
    * absent from a list carries a NULL <name>_rnk and contributes 0.
    *
    * Scale shape: the inputs are ALREADY top-k' lists (bounded — each
    * retriever capped its own output with a TakeOrdered heap), so the
    * union + groupBy here moves ≤ Σk' rows total; the fused top-k is
    * `orderBy.limit(k)` (per-partition heaps) and the final rank is
    * derived by sorting the ≤k survivors inside ONE array — no
    * unpartitioned window, the global ban holds.
    */
  def rrfFuse(lists: Seq[(String, DataFrame)], k0: Int, k: Int): DataFrame = {
    require(lists.size >= 2 && lists.size <= 8,
      "fusion wants 2..8 ranked lists")
    require(k0 >= 1 && k >= 1, "k0 and k must be positive")
    // a NULL or non-positive rank is malformed retriever output (rnk
    // is 1-based by contract); silently treating it as "absent" would
    // mis-score the fusion — fail loudly, the mergeUpsert precedent
    // for malformed upstream rows. Cost: one branch over ≤ Σk rows.
    val tagged = lists.zipWithIndex.map { case ((nm, df), i) =>
      df.select(col("doc_id"), lit(i).as("__l"),
        when(col("rnk").isNull || col("rnk") < 1,
          raise_error(concat(lit(s"rrfFuse: list '$nm' carries a " +
            "null/non-positive rank for doc_id "), col("doc_id"))))
          .otherwise(col("rnk")).cast("int").as("rnk"))
    }.reduce(_ unionByName _)
    // a doc_id appearing TWICE in one list is malformed the same way
    // (it would sum two reciprocal contributions while <name>_rnk
    // reports only one — a silent boost the rank column can't
    // explain). The dup check FUSES into the per-doc aggregate
    // (round 17; was a separate per-(list, doc) pre-aggregate — a
    // whole extra exchange + sequential stage over ≤ Σk rows): the
    // one groupBy counts each list's contributions alongside the
    // score sum, and the projection raises on any count > 1 — the
    // raw sum computed in that branch is unreachable, so it needs no
    // pre-dedup to be correct in the branch that survives.
    val perList = lists.zipWithIndex.flatMap { case ((nm, _), i) =>
      Seq(count(when(col("__l") === i, lit(1))).as(s"__c_$i"),
        min(when(col("__l") === i, col("rnk"))).as(s"${nm}_rnk"))
    }
    val dupChecked = lists.zipWithIndex.foldLeft(
      col("__raw")) { case (acc, ((nm, _), i)) =>
      when(col(s"__c_$i") > 1, raise_error(concat(
        lit("rrfFuse: doc_id "), col("doc_id").cast("string"),
        lit(s" appears more than once in ranked list '$nm' — ranked " +
          "lists are sets; dedup the retriever output upstream"))))
        .otherwise(acc)
    }
    val fused = tagged.groupBy("doc_id")
      .agg(sum(expr(s"1000000 div ($k0 + rnk)")).as("__raw"),
        perList: _*)
      .select(col("doc_id") +:
        lists.map { case (nm, _) => col(s"${nm}_rnk") } :+
        dupChecked.as("rrf_ppm"): _*)
      .orderBy(col("rrf_ppm").desc, col("doc_id"))
      .limit(k)
    // rrf_ppm > 0 always, so negation is exact and order-reversing;
    // doc_id is unique (group key) — (−ppm, doc_id) ascending is the
    // exact TakeOrdered key (same re-rank shape as bm25TopK)
    val packed = struct(
      (-col("rrf_ppm")).as("ns") +: col("doc_id").as("doc_id") +:
        lists.map { case (nm, _) => col(s"${nm}_rnk").as(s"${nm}_rnk") }: _*)
    fused.agg(sort_array(collect_list(packed)).as("__a"))
      .select(posexplode(col("__a")).as(Seq("__pos", "__r")))
      .select(col("__r.doc_id").as("doc_id") +:
        lists.map { case (nm, _) => col(s"__r.${nm}_rnk").as(s"${nm}_rnk") } :+
        (-col("__r.ns")).as("rrf_ppm") :+
        (col("__pos") + 1).cast("int").as("rnk"): _*)
  }
}
