package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext._
import graft.ops.Dedup
import graft.sources.Tables

/** Training-data-pipeline operator surface (the "beyond the reference"
  * half of the engine, SURVEY §2.5 / §7.4): deduplication (exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity
  * search (brute-force + LSH-bucketed ANN), text analysis, event-time
  * windowing / as-of join, and multimodal binary-column decode.
  *
  * Every query runs over the driver test tables and is mirrored by a
  * DuckDB oracle; floating-point folds are written as identical
  * left-to-right IEEE754 sequences on both sides so hashes match bit
  * for bit (float→double upcast is exact; every product of two floats
  * is exact in double).
  */
object ExtensionQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def docs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")

  // hex-string byte encoders for synthesizing container headers in
  // pure codegen'd expressions (to_binary at the end, no UDF)
  private def hex2(c: Column): Column = lpad(hex(c), 2, "0")
  private def hexLe16(c: Column): Column =
    concat(hex2(pmod(c, lit(256))), hex2((c / 256).cast("int")))
  private def hexBe16(c: Column): Column = lpad(hex(c), 4, "0")
  private def hexBe32(c: Column): Column = lpad(hex(c), 8, "0")
  private def hexLe32(c: Column): Column = concat(
    hex2(pmod(c, lit(256))), hex2(pmod((c / 256).cast("int"), lit(256))),
    hex2(pmod((c / 65536).cast("int"), lit(256))),
    hex2((c / 16777216).cast("int")))

  private def emb(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

  // -- Shared pipeline stages -----------------------------------------
  // The component labels, PQ codebook/codes, and BPE merges each feed
  // several queries. A production pipeline materializes such a stage
  // once and fans out — mirrored through the public
  // [[graft.ext.Stages]] cache (one localCheckpoint'd build per
  // (session, dir, stage), fingerprint-swapped on fixture
  // regeneration; full contract in its scaladoc).
  private def memo(s: SparkSession, dir: String, stage: String,
                   fpFile: String = "documents.parquet")
                  (build: => DataFrame): DataFrame =
    Stages.stage(s, s"$dir|$stage",
      Tables.fingerprint(s"$dir/$fpFile"))(build)

  private def componentLabels(s: SparkSession, dir: String): DataFrame =
    memo(s, dir, "cc_labels") {
      val d = docs(s, dir)
      val pairs = DedupOps.lshCandidatePairs(d, col("doc_id"),
        TextAnalysis.shingles(col("text"), 2), numHashes = 12, bands = 4)
      DedupOps.connectedComponents(
        d.select(col("doc_id").as("id")), pairs)
    }

  /** Force-builds (and times) each shared memoized stage for `dir`, so
    * a benchmark can account the one-time stage cost explicitly
    * instead of charging it to whichever consumer query happens to run
    * first. Returns (stageName, seconds) per stage built.
    */
  /** PQ codebook over the embeddings corpus at the queries' default
    * geometry — trained ONCE per (session, dir) and shared by both PQ
    * queries (the FAISS train-once/query-many lifecycle; see
    * Similarity.pqTrain's scaladoc for why an un-materialized
    * codebook is recomputed per broadcast consumer).
    */
  // trainSample=4: the Lloyd update runs over a quarter of the
  // corpus (FAISS trains codebooks on a sample); the id-modulus
  // sample is deterministic so the DuckDB oracle re-derives the
  // identical codebook. Codes still cover the full corpus.
  private def pqCodebook(s: SparkSession, dir: String): DataFrame =
    memo(s, dir, "pq_codebook", fpFile = "embeddings.parquet") {
      Similarity.pqTrain(emb(s, dir), m = 16, dims = 64, codebookK = 16,
        trainSample = 4)
    }

  /** Packed PQ codes of the embeddings corpus at the same geometry —
    * the index-build half of the FAISS lifecycle (encode once, search
    * many), shared by all four PQ queries. Without the memo each
    * query re-runs the assign-join + pack aggregation over the whole
    * corpus — pure duplicated work at any scale.
    */
  private def pqCodes(s: SparkSession, dir: String): DataFrame =
    memo(s, dir, "pq_codes", fpFile = "embeddings.parquet") {
      Similarity.pqEncode(emb(s, dir), m = 16, dims = 64,
        codebookK = 16, codebook = Some(pqCodebook(s, dir)))
    }

  /** Degree-annotated trade-graph edges — the build-once half of the
    * PageRank lifecycle (a link graph is constructed once, then
    * ranked many times). Fingerprinted over BOTH source tables; the
    * single-file `memo` helper fits the other stages, so this one
    * calls [[Stages.stage]] directly.
    */
  private def prGraph(s: SparkSession, dir: String): DataFrame =
    Stages.stage(s, s"$dir|pr_graph",
      31L * Tables.fingerprint(s"$dir/orders.parquet") +
        Tables.fingerprint(s"$dir/lineitem.parquet")) {
      val ej = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sk"))
        .distinct()
      Graph.prepareEdges(ej
        .select((col("c") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
        .unionAll(ej.select((col("sk") * 2 + 1).as("src"),
          (col("c") * 2).as("dst"))))
    }

  // -- Write-once bucketed layout (layout_bucket_join) ----------------
  // Key → documents fingerprint at write time, so a regenerated
  // fixture re-writes. The two write jobs run inside compute's bin
  // lock — acceptable for this single-purpose map (unlike the shared
  // stageCache above, no other key can be starved behind it).
  private val bucketedWritten =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Catalog/table suffix unique per (session, dir): concurrent
    * sessions and parallel bench/verify runs on one machine must not
    * race on a shared table name or output directory.
    */
  private[graft] def bucketedSuffix(s: SparkSession, dir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"${s.sparkContext.applicationId}|$dir".getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString
  }

  /** Write both bucketed tables ONCE per (session, dir) — the
    * write-once/join-many contract of a bucketed layout. Re-invoking
    * the query joins the already-written tables.
    */
  private[graft] def bucketedLayout(s: SparkSession, dir: String): Unit = {
    val sfx = bucketedSuffix(s, dir)
    val key = s"${s.sparkContext.applicationId}|$dir|bucketed"
    val fp = Tables.fingerprint(s"$dir/documents.parquet")
    bucketedWritten.compute(key, (_, prev) => {
      if (prev == null || prev.longValue() != fp) {
        import graft.sources.BucketedTables
        val tmp = System.getProperty("java.io.tmpdir") +
          s"/graft_bucketed_$sfx"
        BucketedTables.writeBucketed(
          docs(s, dir).select(col("doc_id"), col("lang"), col("n_chars")),
          s"graft_docs_bkt_$sfx", s"$tmp/docs", "doc_id", buckets = 8)
        BucketedTables.writeBucketed(
          docs(s, dir).select(col("doc_id"),
            TextAnalysis.tokenCount(col("text")).cast("long")
              .as("n_tokens")),
          s"graft_stats_bkt_$sfx", s"$tmp/stats", "doc_id", buckets = 8)
      }
      java.lang.Long.valueOf(fp)
    })
  }

  /** The induced BPE merge table (k = 6, maxWords = 512) — one
    * train-once stage shared by the vocab query and the encoder, the
    * tokenizer-training lifecycle (train once, encode everything).
    */
  private def bpeMerges(s: SparkSession, dir: String): DataFrame =
    memo(s, dir, "bpe_merges") {
      Bpe.train(docs(s, dir), col("text"), k = 6, maxWords = 512)
    }

  def prebuildStages(s: SparkSession, dir: String): Seq[(String, Double)] = {
    def timed(name: String)(f: => Unit): (String, Double) = {
      val t0 = System.nanoTime()
      f
      name -> (System.nanoTime() - t0) / 1e9
    }
    Seq(
      timed("cc_labels") { componentLabels(s, dir).count() },
      timed("pq_codebook") { pqCodebook(s, dir).count() },
      timed("pq_codes") { pqCodes(s, dir).count() },
      timed("bpe_merges") { bpeMerges(s, dir).count() },
      timed("pr_graph") { prGraph(s, dir).count() },
      timed("copurchase_edges") { copurchaseEdges(s, dir).count() },
      timed("bucketed_layout") { bucketedLayout(s, dir) })
  }

  /** Bench-only: drop this (session, dir)'s memoized stages so
    * [[prebuildStages]] can time a REBUILD — one-shot stage costs
    * carry ±0.3 s of scheduling jitter that min-of-k strips for
    * ordinary queries but a memo would otherwise lock in. Unsupported
    * while queries over the old frame are in flight (same contract as
    * fixture regeneration above).
    */
  private[graft] def evictStages(s: SparkSession, dir: String): Unit = {
    Seq("cc_labels", "pq_codebook", "pq_codes", "bpe_merges", "pr_graph",
      "copurchase_edges")
      .foreach(stage => Stages.evict(s, s"$dir|$stage"))
    // next bucketedLayout call re-writes the tables (rebuild timing)
    bucketedWritten.remove(s"${s.sparkContext.applicationId}|$dir|bucketed")
  }

  /** Support-≥2 co-purchase edges (canonical u < v) — like
    * [[prGraph]], a graph artifact built once and consumed by several
    * analyses (triangle census, community extraction).
    */
  private def copurchaseEdges(s: SparkSession, dir: String): DataFrame =
    Stages.stage(s, s"$dir|copurchase_edges",
      Tables.fingerprint(s"$dir/lineitem.parquet")) {
      Graph.coOccurrenceEdges(
        t(s, dir, "lineitem").select(col("l_orderkey").as("group"),
          col("l_partkey").as("item")),
        minSupport = 2)
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- Deduplication ------------------------------------------------
    "dedup_exact" -> { (s, dir) =>
      DedupOps.exact(docs(s, dir),
        TextAnalysis.fingerprint(col("text")), col("doc_id"))
    },

    // deliberately NOT the memoized stage: this query IS the pair
    // operator, and its plan (exchange-reused band self-join) is the
    // audit surface — a checkpoint scan would hide it
    "dedup_minhash_lsh" -> { (s, dir) =>
      DedupOps.lshCandidatePairs(docs(s, dir), col("doc_id"),
        TextAnalysis.shingles(col("text"), 2), numHashes = 12, bands = 4)
    },

    // Pairs → clusters: connected components over the MinHash candidate
    // pairs give each doc its canonical cluster id (min id in the
    // component) — the keep-one-per-cluster stage of production dedup.
    "dedup_components" -> { (s, dir) =>
      componentLabels(s, dir)
        .select(col("id").as("doc_id"), col("component_id"))
    },

    // Clusters → survivors: keep the HIGHEST-QUALITY doc of each
    // near-dup component (ties to the smaller doc_id) — the actual
    // curation policy, vs dedup_components' min-id canonical label.
    // One extra broadcastable join + one max_by aggregation on top of
    // the shared component stage.
    "dedup_keep_best" -> { (s, dir) =>
      val scored = docs(s, dir).select(col("doc_id").as("id"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      componentLabels(s, dir).join(scored, "id")
        .groupBy("component_id")
        .agg(
          max_by(col("id"), struct(col("quality"), -col("id")))
            .as("best_id"),
          count(lit(1)).as("n_members"))
    },

    // 60-bit simhash: the full width simhashTokenHash carries (15 hex
    // chars of md5). 60 bits / 4 bands = 15-bit band keys = 32,768
    // buckets per band in the pairs query below — the blocking stays
    // sub-quadratic at corpus scale.
    "dedup_simhash" -> { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .select(col("doc_id"),
          DedupOps.simhashTokenHash(col("tok")).as("h"))
        .groupBy("doc_id")
        .agg(DedupOps.simhashAgg(col("h"), 60).as("simhash"))
    },

    "dedup_simhash_pairs" -> { (s, dir) =>
      val sims = docs(s, dir)
        .select(col("doc_id"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .select(col("doc_id"),
          DedupOps.simhashTokenHash(col("tok")).as("h"))
        .groupBy("doc_id")
        .agg(DedupOps.simhashAgg(col("h"), 60).as("simhash"))
      DedupOps.simhashBandPairs(sims, col("doc_id"), col("simhash"),
        bands = 4, bitsPerBand = 15, maxHamming = 3, bits = 60)
    },

    "dedup_ngram_jaccard" -> { (s, dir) =>
      DedupOps.jaccardPairs(docs(s, dir), Seq("lang", "source"),
        col("doc_id"), TextAnalysis.shingles(col("text"), 2),
        threshold = 0.1, maxDf = 64)
    },

    // Substring-level exact dedup: winnowing fingerprints guarantee
    // any shared span ≥ window + k − 1 = 23 chars produces a shared
    // fingerprint — the copied-passage family doc-level MinHash
    // misses. k/window/minShared/maxDf are mirrored in the oracle.
    "dedup_substring" -> { (s, dir) =>
      DedupOps.substringDupPairs(docs(s, dir), col("doc_id"),
        col("text"), k = 16, window = 8, minShared = 3, maxDf = 64)
    },

    // Benchmark decontamination: docs sharing >= 16 winnowing
    // fingerprints with the held-out fifth of the corpus (the stand-in
    // eval set) are contamination; the threshold sits above this
    // corpus's ambient shared-phrase floor (most docs share 1-8).
    "dedup_decontaminate" -> { (s, dir) =>
      val d = docs(s, dir)
      DedupOps.decontaminate(
        d.filter(col("doc_id") % 5 =!= 0),
        d.filter(col("doc_id") % 5 === 0),
        col("doc_id"), col("text"), k = 16, window = 8, minShared = 16)
    },

    // Edit-distance fuzzy matching on short strings — the family for
    // names/titles where token hashing is too coarse; blocked on
    // (brand, type) so candidates stay bounded.
    "dedup_editdist" -> { (s, dir) =>
      DedupOps.editDistancePairs(t(s, dir, "part"),
        Seq("p_brand", "p_type"), col("p_partkey"), col("p_name"),
        maxDist = 2)
    },

    "dedup_cosine" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      Similarity.cosineNearDupPairs(e, col("vec_id"), col("embedding"),
        col("label"), threshold = 0.25)
    },

    // Semantic dedup with NO label column — the 100 TB path when no
    // natural blocking key exists: IVF multi-assign (top-2 centroid
    // lists) blocks the candidate space, exact cosine verifies.
    "dedup_cosine_ivf" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.ivfNearDupPairs(e, col("id"), col("vec"),
        Similarity.seedCentroids(e, nlist = 8), threshold = 0.25,
        nassign = 2)
    },

    // SemDeDup (Abbas'23): k-means clusters ARE the blocking key;
    // near-dups detected only within a cluster, keep-min-id. Returns
    // the kept corpus — the pipeline stage shape (dedup_cosine_ivf
    // returns the PAIRS; this returns the surviving rows).
    "dedup_semantic" -> { (s, dir) =>
      Similarity.semanticDedup(emb(s, dir), col("id"), col("vec"),
        k = 8, iters = 2, threshold = 0.25)
    },

    // Incremental (production) dedup: a new batch first dedups within
    // itself, then anti-joins the historical fingerprint store — the
    // shape of every periodic crawl ingest. The store side carries
    // ONLY (fp) through the shuffle; at 100 TB history the anti join
    // is the bloom-prunable hash join Spark's AQE runtime filters
    // accelerate. Fingerprint = 40-char normalized prefix (boilerplate
    // key), coarse enough that collisions actually occur.
    "dedup_incremental" -> { (s, dir) =>
      val d = docs(s, dir).select(col("doc_id"),
        md5(substring(TextAnalysis.normalize(col("text")), 1, 40)).as("fp"))
      val hist = d.filter(col("doc_id") % 2 === 0)
      val batch = d.filter(col("doc_id") % 2 =!= 0)
      DedupOps.keepFirstPerKey(batch, col("fp"), col("doc_id"))
        .join(hist.select("fp").distinct(), Seq("fp"), "left_anti")
        .select("doc_id", "fp")
    },

    // Same result as dedup_incremental, via the Bloom-prefiltered
    // anti join — the at-scale shape (the filter prunes the batch to
    // the Bloom-positive sliver before any join; exactness is
    // guaranteed, so the oracle is the plain anti join).
    "dedup_incremental_bloom" -> { (s, dir) =>
      val d = docs(s, dir).select(col("doc_id"),
        md5(substring(TextAnalysis.normalize(col("text")), 1, 40)).as("fp"))
      val hist = d.filter(col("doc_id") % 2 === 0)
      val batch = d.filter(col("doc_id") % 2 =!= 0)
      DedupOps.bloomFilteredAnti(
        DedupOps.keepFirstPerKey(batch, col("fp"), col("doc_id")),
        hist.select("fp").distinct(), "fp")
        .select("doc_id", "fp")
    },

    // -- Similarity search -------------------------------------------
    "sim_bruteforce_topk" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.bruteForceTopK(e.filter(col("id") < 50), e, k = 5)
    },

    "sim_lsh_topk" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.lshTopK(e.filter(col("id") < 50), e, k = 5,
        planes = 4, dims = 64)
    },

    // MIPS retrieval (recommendation scoring: magnitude matters, so
    // cosine is the wrong metric) via the augmented-space reduction —
    // blocking in [c ; √(M²−‖c‖²)] space, exact inner-product ranks.
    "sim_mips_topk" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.mipsTopK(e.filter(col("id") < 50), e, k = 5,
        planes = 2, dims = 64)
    },

    "sim_ivf_topk" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.ivfTopK(e.filter(col("id") < 50), e,
        Similarity.seedCentroids(e, nlist = 8), k = 5, nprobe = 2)
    },

    // PQ-ADC: 16 subspaces x 16 codewords = 64-bit codes (128x
    // compression of 64-dim float32 vectors); table entries are 1e-6
    // fixed-point longs, so the m-term score sum is exact integer
    // arithmetic and the ranking is bit-reproducible in the oracle.
    "sim_pq_adc_topk" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.pqTopK(e.filter(col("id") < 50), e, k = 5,
        codebook = Some(pqCodebook(s, dir)),
        codes = Some(pqCodes(s, dir)))
    },

    // two-stage retrieval (FAISS IndexRefineFlat): ADC proposes
    // k·refine candidates from codes alone; only those rows touch
    // full vectors again for the exact cosine re-rank
    "sim_pq_refine_topk" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.pqRefineTopK(e.filter(col("id") < 50), e, k = 5,
        refine = 4, codebook = Some(pqCodebook(s, dir)),
        codes = Some(pqCodes(s, dir)))
    },

    // the full FAISS IVFx,PQy composition: coarse-list pruning, then
    // compressed-code ADC scoring of only the probed lists' members
    "sim_ivfpq_topk" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.ivfPqTopK(e.filter(col("id") < 50), e,
        Similarity.seedCentroids(e, nlist = 8), k = 5, nprobe = 2,
        codebook = Some(pqCodebook(s, dir)),
        codes = Some(pqCodes(s, dir)))
    },

    // the complete production index: IVF pruning + PQ scoring + exact
    // re-rank of the k·refine survivors
    "sim_ivfpq_refine_topk" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.ivfPqRefineTopK(e.filter(col("id") < 50), e,
        Similarity.seedCentroids(e, nlist = 8), k = 5, nprobe = 2,
        refine = 4, codebook = Some(pqCodebook(s, dir)),
        codes = Some(pqCodes(s, dir)))
    },

    // -- Text analysis -----------------------------------------------
    "text_stats" -> { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.bpeishCount(col("text")).as("n_bpeish"),
        TextAnalysis.punctRatio(col("text")).as("punct_ratio"),
        TextAnalysis.stopwordRatio(col("text")).as("stopword_ratio"),
        TextAnalysis.meanWordLen(col("text")).as("mean_word_len"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
    },

    "text_langid" -> { (s, dir) =>
      docs(s, dir).select(col("doc_id"), col("lang"),
        TextAnalysis.langId(col("text")).as("lang_pred"))
    },

    // URL canonicalization — the web-corpus dedup key. The fixture
    // has no URL column, so messy URLs (mixed-case scheme/host,
    // default and explicit ports, tracking params, unsorted params,
    // fragments, trailing slashes) are synthesized from doc_id (same
    // shim idea as text_redact_pii) and the SAME normalization
    // algorithm runs on both engines.
    "text_url_canonical" -> { (s, dir) =>
      val id = col("doc_id")
      val scheme = when(pmod(id, lit(2)) === 0, lit("HTTP"))
        .otherwise(lit("HTTPS"))
      val port = when(pmod(id, lit(4)) === 0, lit(":80"))
        .when(pmod(id, lit(5)) === 0, lit(":8080")).otherwise(lit(""))
      val hostStr = concat(lit("WWW.Site"),
        pmod(id, lit(7)).cast("string"), lit(".COM"), port)
      val path = concat(lit("/Dir"), pmod(id, lit(9)).cast("string"),
        lit("/Page"),
        when(pmod(id, lit(2)) === 0, lit("/")).otherwise(lit("")))
      val q = when(pmod(id, lit(3)) === 0,
          concat(lit("?utm_source=feed&b="),
            pmod(id, lit(5)).cast("string"), lit("&a=1")))
        .when(pmod(id, lit(3)) === 1, lit("?z=9&fbclid=track&y=2"))
        .otherwise(lit(""))
      val frag = when(pmod(id, lit(6)) === 0, lit("#section"))
        .otherwise(lit(""))
      val url = concat(scheme, lit("://"), hostStr, path, q, frag)
      docs(s, dir).select(id.as("doc_id"), url.as("url"),
        TextAnalysis.canonicalizeUrl(url).as("canonical_url"),
        TextAnalysis.urlHost(url).as("host"))
    },

    // Gopher rule-based quality gate: integer-exact heuristics, one
    // fail bit per rule (minWords=25 — the synthetic docs run 10–99
    // words, so the paper's 50 would gate half the corpus on length
    // alone and hide the other rules)
    "text_gopher_rules" -> { (s, dir) =>
      TextAnalysis.gopherRules(docs(s, dir), col("doc_id"), col("text"),
        minWords = 25)
    },

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

    // PII scrubbing over a deterministically PII-enriched corpus (the
    // synthetic documents carry no natural emails/phones/URLs, so the
    // fixture injects them from doc_id — same shim idea as LoincShim —
    // making the counts and replacements non-vacuous).
    "text_redact_pii" -> { (s, dir) =>
      val t = concat(col("text"),
        when(col("doc_id") % 3 === 0, concat(lit(" contact user"),
          col("doc_id").cast("string"), lit("@example.com")))
          .otherwise(""),
        when(col("doc_id") % 4 === 0, concat(lit(" call +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(""),
        when(col("doc_id") % 5 === 0, concat(lit(" see https://ex.com/d/"),
          col("doc_id").cast("string")))
          .otherwise(""))
      docs(s, dir).select(col("doc_id"), col("lang"),
        TextAnalysis.piiCount(t, TextAnalysis.EmailRe).as("n_emails"),
        TextAnalysis.piiCount(t, TextAnalysis.PhoneRe).as("n_phones"),
        TextAnalysis.piiCount(t, TextAnalysis.UrlRe).as("n_urls"),
        md5(TextAnalysis.redactPii(t)).as("redacted_md5"))
    },

    // Deterministic stratified downsampling: membership from a salted
    // id hash, so re-runs, repartitions, and external engines agree.
    // Source-mix resampling toward a target recipe: src0 is clamped
    // (under-represented vs its 0.2 share -> keep all), src2 and the
    // default thin toward their shares.
    "sample_domain_mix" -> { (s, dir) =>
      Sampling.domainMixSample(docs(s, dir), col("doc_id"), col("source"),
        targetShares = Seq("src0" -> 0.2, "src1" -> 0.1, "src2" -> 0.02),
        defaultShare = 0.01, salt = "graft-mix:")
        .select("doc_id", "source")
    },

    "sample_hash_stratified" -> { (s, dir) =>
      Sampling.stratifiedHashSample(docs(s, dir), col("doc_id"),
        col("lang"),
        rates = Map("en" -> 10, "de" -> 25, "fr" -> 40),
        defaultRate = 60, salt = "graft-sample:")
        .select("doc_id", "lang")
    },

    // Temperature flattening (α = 1/2, budget c = 0.1) over the
    // skewed lang column: surviving counts ∝ sqrt(n_lang), the
    // mT5-style head-flattening mix, fully bit-portable (no
    // normalizing float sum).
    "sample_temperature" -> { (s, dir) =>
      Sampling.temperatureSample(docs(s, dir), col("doc_id"),
        col("lang"), budget = 0.1, salt = "graft-temp:")
        .select("doc_id", "lang")
    },

    // The flagship curation pipeline, composed end to end in ONE
    // declarative plan: giant-doc length cap → language-ID
    // confirmation → quality gate → exact dedup (first doc per
    // normalized fingerprint) → salted-hash downsample → PII-scrubbed
    // output. Narrow ops fuse into one codegen stage; the only shuffle
    // is the dedup window — at 100 TB each stage drops rows BEFORE the
    // next pays for them, and the scrub runs on the small survivor
    // set. The 20k-char cap bounds every per-doc stage's work per row
    // (the skew guard; no-op on this corpus, mirrored in the oracle).
    "curate_corpus" -> { (s, dir) =>
      val capped = TextAnalysis.capDocLength(docs(s, dir), "text", 20000)
      val scored = capped.select(col("doc_id"), col("lang"),
        col("text"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        TextAnalysis.langId(col("text")).as("__pred"),
        TextAnalysis.fingerprint(col("text")).as("__fp"))
      val kept = scored
        .filter(col("__pred") === col("lang") && col("quality") >= 0.45)
      DedupOps.keepFirstPerKey(kept, col("__fp"), col("doc_id"))
        .filter(Sampling.hashBucket(col("doc_id"), "graft-sample:") < 50)
        .select(col("doc_id"), col("lang"), col("quality"),
          md5(TextAnalysis.redactPii(col("text"))).as("redacted_md5"))
    },

    // Quality-weighted deterministic sampling: a doc's retention
    // probability IS its quality score (hash bucket < quality·100) —
    // the curation policy "keep good text more often", reproducible
    // because the coin flip is a salted id hash, not an RNG.
    "sample_weighted_quality" -> { (s, dir) =>
      docs(s, dir)
        .withColumn("quality", TextAnalysis.qualityScore(col("text")))
        .filter(Sampling.hashBucket(col("doc_id"), "graft-wq:") <
          floor(col("quality") * 100).cast("long"))
        .select("doc_id", "lang", "quality")
    },

    // Fixed-size deterministic sample: exactly 20 docs per language,
    // chosen by smallest salted hash rank — reproducible everywhere.
    "sample_fixed_stratified" -> { (s, dir) =>
      Sampling.fixedSizeStratifiedSample(docs(s, dir), col("doc_id"),
        col("lang"), n = 20, salt = "graft-fix:")
        .select("doc_id", "lang")
    },

    // Count-min sketch as dataflow: cell table from one aggregation,
    // top-10 heavy hitters probed against it. cms_n ≥ exact_n always
    // (the sketch never under-counts); collisions make some rows over.
    "sketch_countmin" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val sk = CountMin.table(li, col("l_partkey"), depth = 3, width = 1024)
      val exact = li.groupBy(col("l_partkey").as("item"))
        .agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("item")).limit(10)
      CountMin.estimate(sk, exact, col("item"), depth = 3, width = 1024)
        .withColumn("never_under", col("cms_n") >= col("exact_n"))
    },

    // K-means over the embedding corpus (the IVF centroid trainer):
    // 2 Lloyd iterations, fixed-point centroid update, k=8. Output is
    // the exact per-cluster membership census.
    "emb_kmeans" -> { (s, dir) =>
      Clustering.kmeansAssign(emb(s, dir), col("id"), col("vec"),
        k = 8, iters = 2)
        .groupBy("cid")
        .agg(count(lit(1)).as("n_members"), sum("id").as("id_checksum"))
    },

    // Gopher-style repetition filter: duplicate bigram/trigram
    // fractions + top-bigram share, thresholds as literals.
    "text_repetition" -> { (s, dir) =>
      TextAnalysis.repetitionMetrics(docs(s, dir), col("doc_id"),
        col("text"))
    },

    // Context-length chunking: 32-token windows, 8-token overlap —
    // the map-only sequence-fitting stage before packing/training.
    "text_chunk" -> { (s, dir) =>
      TextAnalysis.chunkTokens(docs(s, dir), col("doc_id"), col("text"),
        window = 32, overlap = 8)
    },

    // CCNet/C4-style corpus-level exact span dedup: every 16-token
    // span keeps only its global first occurrence; docs report how
    // much of them survived (see TextAnalysis.spanDedup's scaladoc).
    "text_span_dedup" -> { (s, dir) =>
      TextAnalysis.spanDedup(docs(s, dir), col("doc_id"), col("text"),
        window = 16)
    },

    // quality-classifier curation stage: label with the Gopher rule
    // gate, fit one-pass integer-bit Naive Bayes, score every doc —
    // the rule-labeled-classifier shape of GPT-3/DCLM pipelines
    "text_nb_quality" -> { (s, dir) =>
      val d = docs(s, dir)
      val lab = TextAnalysis.gopherRules(d, col("doc_id"), col("text"),
        minWords = 25).select(col("doc_id"), col("keep"))
      TextAnalysis.nbQuality(d.join(lab, "doc_id"), col("doc_id"),
        col("text"), col("keep"))
    },

    // Chunks → training sequences: shard-parallel concat-and-cut
    // packing into 256-token sequences (8 shards, salted doc-id hash).
    "pack_sequences" -> { (s, dir) =>
      val chunks = TextAnalysis.chunkTokens(docs(s, dir), col("doc_id"),
        col("text"), window = 32, overlap = 8)
      TextAnalysis.packSequences(chunks, col("doc_id"), col("chunk_idx"),
        col("n_tokens"), capacity = 256, shards = 8, salt = "graft-pack:")
    },

    // Leakage-guarded train/val/test split: the SOURCE hash (not the
    // doc id) picks the split, so same-domain near-dups never straddle
    // train and eval. 10% val, 10% test per-mille thresholds.
    "split_assign" -> { (s, dir) =>
      Sampling.splitAssign(docs(s, dir), col("source"), "graft-split:",
        valPerMille = 100, testPerMille = 100)
        .select("doc_id", "source", "split")
    },

    // Corpus-as-LM unigram rarity (integer-bit surprisal): the
    // perplexity-proxy quality signal, reproducible with no floating
    // log anywhere.
    "text_surprisal" -> { (s, dir) =>
      TextAnalysis.unigramSurprisal(docs(s, dir), col("doc_id"),
        col("text"))
    },

    // DSIR importance weights vs the src0 target domain — integer-bit
    // log-ratio of target/raw unigram models, the domain-adaptation
    // selection signal.
    "text_dsir_weight" -> { (s, dir) =>
      TextAnalysis.dsirWeights(docs(s, dir), col("doc_id"),
        col("text"), col("source") === "src0")
    },

    // The DSIR use-case end-to-end: keep the top-third most
    // target-domain-like docs per language — BIGRAM-feature
    // importance weights (the paper's hashed-bigram models; unigram
    // weights quantize to a 95%-tie mode on this corpus, which would
    // make the cut trivially keep everything) fed through the
    // bounded-histogram tercile cut on the NEGATED score (head =
    // lowest, so negation selects the highest weights). The cut
    // never splits a tie group, so the guarantee is "at least a
    // third", generous in the keep direction.
    "curate_domain" -> { (s, dir) =>
      val d = docs(s, dir)
      val wts = TextAnalysis.dsirWeights(d, col("doc_id"),
          col("text"), col("source") === "src0", ngram = 2)
        .join(d.select(col("doc_id"), col("lang")), "doc_id")
        .withColumn("__negw", -col("mean_millibits"))
      TextAnalysis.scoreTerciles(wts, "lang", "__negw")
        .filter(col("bucket") === "head")
        .select(col("doc_id"), col("lang"), col("mean_millibits"))
    },

    // CCNet head/middle/tail terciles per language — the perplexity
    // partition computed on a bounded per-(lang, score) histogram,
    // never a per-doc ranking window.
    "text_ccnet_buckets" -> { (s, dir) =>
      TextAnalysis.ccnetBuckets(docs(s, dir), col("doc_id"),
        col("text"), col("lang"))
    },

    // End-to-end pretraining prep in ONE declarative plan — the
    // flagship composition of the curation surface: giant-doc cap →
    // language gate → Gopher repetition filter → leakage-guarded
    // train split → context-length chunking → sequence packing.
    // Catalyst fuses the doc-level stages into one pass; the only
    // exchanges are the repetition aggregation and the pack window.
    "curate_pretrain" -> { (s, dir) =>
      val capped = TextAnalysis.capDocLength(docs(s, dir), "text", 2000)
      // repetition keep over ALL capped docs, not the langid subset:
      // the final set is keep ∩ en either way, but this keeps the
      // expensive langid tokenization out of the two explode branches
      // (g2/g3 would otherwise each recompute it — measured 2x the
      // whole query)
      val keep = TextAnalysis
        .repetitionMetrics(capped, col("doc_id"), col("text"))
        .filter(col("keep")).select("doc_id")
      val en = capped.filter(TextAnalysis.langId(col("text")) === "en")
      val train = Sampling.splitAssign(en.join(keep, "doc_id"),
          col("source"), "graft-split:",
          valPerMille = 100, testPerMille = 100)
        .filter(col("split") === "train")
      val chunks = TextAnalysis.chunkTokens(train, col("doc_id"),
        col("text"), window = 32, overlap = 8)
      TextAnalysis.packSequences(chunks, col("doc_id"), col("chunk_idx"),
        col("n_tokens"), capacity = 256, shards = 8, salt = "graft-pack:")
    },

    // Tokenizer vocab induction: frequency-ranked contiguous ids,
    // top-24 tokens with count >= 2 — deterministic (n desc, token).
    "vocab_build" -> { (s, dir) =>
      TextAnalysis.buildVocab(docs(s, dir), col("text"),
        vocabSize = 24, minCount = 2)
    },

    // BPE merge induction (the tokenizer-training stage proper):
    // 6 merge rounds over the 512 most frequent words — each round
    // ONE pair-count aggregation + a broadcast one-row re-encode of
    // the delimited symbol strings (see graft.ext.Bpe for why replace
    // on the wrapped form IS greedy BPE on both engines). Served from
    // the train-once `bpe_merges` stage (the tokenizer lifecycle);
    // the training plan itself is pinned in PlanSpec.
    "vocab_bpe" -> { (s, dir) =>
      bpeMerges(s, dir)
    },

    // The encode half of the tokenizer: segment every document with
    // the induced merges (rank-order fold of 6 replaces over the
    // space-joined symbolized words — a merge never crosses a word
    // boundary).
    "text_bpe_encode" -> { (s, dir) =>
      Bpe.encode(docs(s, dir), col("doc_id"), col("text"),
        bpeMerges(s, dir))
        .select(col("id").as("doc_id"), col("bpe"), col("n_pieces"))
    },

    // Corpus encoding against that vocab: id 0 = UNK; the id
    // sequence is a position-ordered string so the check is bit-exact.
    "text_encode" -> { (s, dir) =>
      val vocab = TextAnalysis.buildVocab(docs(s, dir), col("text"),
        vocabSize = 24, minCount = 2)
      TextAnalysis.encodeTokens(docs(s, dir), col("doc_id"),
        col("text"), vocab)
    },

    // Conditional bigram surprisal: integer bits of
    // -log2 P(cur | prev) summed per doc — the n-gram LM upgrade of
    // text_surprisal, catching shuffled/garbled text unigrams miss.
    "text_surprisal_bigram" -> { (s, dir) =>
      TextAnalysis.bigramSurprisal(docs(s, dir), col("doc_id"),
        col("text"))
    },

    // Misra–Gries frequent-items sketch over the token-initial stream
    // (19 distinct, genuinely skewed): capacity 12 < distinct forces
    // evictions; the oracle checks the exact heavy-hitter set plus the
    // theorem-guaranteed booleans (present, error ≤ n/(k+1)).
    "sketch_freqitems" -> { (s, dir) =>
      val items = docs(s, dir)
        .select(explode(TextAnalysis.tokens(col("text"))).as("__t"))
        .filter(col("__t") =!= "")
        .select(substring(col("__t"), 1, 1).as("item"))
      FreqItems.heavyHittersVerified(items, col("item"), k = 12)
    },

    // Integer-bit TF-IDF: per-doc top-5 terms by tf·idf_bits — the
    // classic term-weighting signal with the idf in exact bits, so
    // the ranking is reproducible with no floating log anywhere.
    "text_tfidf" -> { (s, dir) =>
      TextAnalysis.tfIdfTopTerms(docs(s, dir), col("doc_id"),
        col("text"), k = 5)
    },

    // Per-source corpus datasheet: doc/token volume, vocabulary,
    // integer type-token ratio, exact-dup count — the data-card
    // report a curated corpus ships with.
    "corpus_report" -> { (s, dir) =>
      TextAnalysis.corpusReport(docs(s, dir), col("source"),
        col("doc_id"), col("text"))
    },

    // Signed-random-projection (Johnson–Lindenstrauss, ±1 matrix)
    // dimensionality reduction 64 → 8 before ANN indexing — map-only,
    // bit-reproducible (±1 products are exact in double).
    "emb_project" -> { (s, dir) =>
      Similarity.project(emb(s, dir), col("id"), col("vec"),
        outDims = 8, dims = 64)
    },

    // int8 scalar quantization — the 4×-smaller storage form vector
    // stores keep embeddings in; floor-based codes so both engines
    // agree bit for bit
    "emb_quantize_int8" -> { (s, dir) =>
      Similarity.quantizeInt8(emb(s, dir), col("id"), col("vec"),
        dims = 64)
    },

    // BM25 relevance ranking against fixed seed terms — the
    // retrieval-scoring stage of corpus curation. Integer-only output
    // (tf/dl/rank): libm ln is not bit-portable, so the score stays
    // inside the ORDER BY (see TextAnalysis.bm25TopK).
    "text_bm25_topk" -> { (s, dir) =>
      TextAnalysis.bm25TopK(docs(s, dir), col("doc_id"), col("text"),
        terms = Bm25Terms, k = 20)
    },

    // Corpus n-gram statistics: top-5 word bigrams per language.
    // lang is a LOW-cardinality key over a web-scale distinct-gram
    // set, so the rank is two-phase (the bm25TopK lesson): phase 1
    // ranks within (lang, gram-hash shard) — 32-way parallel per
    // language — phase 2 re-ranks only the ≤ 32·5 shard winners.
    // Top-k is distributive, so rows are identical to a single
    // per-lang window.
    "text_ngram_freq" -> { (s, dir) =>
      val grams = docs(s, dir).select(col("lang"),
        explode(TextAnalysis.shingles(col("text"), 2)).as("gram"))
        .groupBy("lang", "gram").agg(count(lit(1)).as("n"))
      Ranking.twoPhaseTopN(grams, Seq(col("lang")),
          Seq(col("n").desc, col("gram")), n = 5,
          shardOf = PortableHash.md5PrefixLong(
            concat(lit("ngram-shard:"), col("gram")), 7),
          rankCol = "rnk")
        .select(col("lang"), col("gram"), col("n"),
          col("rnk").cast("int").as("rnk"))
    },

    // Value-distribution histogram: fixed-width buckets over the
    // events value column (floor math, exact in both engines).
    "agg_histogram" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(floor(col("value") / 50.0).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
    },

    "text_fingerprint" -> { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        TextAnalysis.minShingleFingerprint(col("text"), 3).as("min_shingle_fp"))
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

    // -- Distribution profiling / layout planning --------------------
    // The skew probe you run before a 100 TB join: exact top-20
    // heavy-hitter keys with ppm shares. TakeOrderedAndProject cap,
    // cumulative window only over the capped 20 rows.
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
    "ts_ewma" -> { (s, dir) =>
      TimeSeries.ewmaFixed(
        t(s, dir, "events")
          .select(col("user_id").as("key"), col("ts"), col("value"),
            col("event_id")),
        tie = col("event_id"))
        .select(col("key").as("user_id"), col("n_events"),
          col("ewma_micros"))
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

    // SQL surface over the native kernels (registered imperatively;
    // sessions built with spark.sql.extensions get them for free).
    "sim_sql_cosine" -> { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      t(s, dir, "embeddings").createOrReplaceTempView("emb_sql")
      s.sql("""SELECT vec_id, vec_dot(embedding, embedding) AS dot_self,
              |       vec_norm(embedding) AS nrm
              |FROM emb_sql""".stripMargin)
    },

    // -- Multimodal binary columns -----------------------------------
    "mm_decode" -> { (s, dir) =>
      Multimodal.decodeFeatures(
        Multimodal.withBlob(docs(s, dir), "text")).toDF()
    },

    // real container parsing, verified end-to-end: synthesize valid
    // PNG / GIF89a / BMP payloads (width/height/frames a closed form
    // of doc_id, format round-robin) as the binary column, decode
    // them through the SAME decodeFeatures path as mm_decode, and let
    // the oracle recompute the facts in closed form — a broken parser
    // hash-mismatches. Header bytes are built with codegen'd hex
    // string expressions + one to_binary; no UDF. The GIF variant is
    // a COMPLETE stream — screen descriptor, n image-descriptor
    // blocks with LZW sub-blocks, trailer — so the frame-count block
    // walk is exercised, not just the fixed header offsets.
    "mm_decode_image" -> { (s, dir) =>
      val w = (pmod(col("doc_id"), lit(1024)) + 1).cast("int")
      val h = (pmod(col("doc_id"), lit(768)) + 1).cast("int")
      val nFrames = (pmod(col("doc_id"), lit(5)) + 1).cast("int")
      // PNG: 8-byte signature, IHDR length 13, "IHDR", BE32 dims
      val png = concat(lit("89504E470D0A1A0A0000000D49484452"),
        hexBe32(w), hexBe32(h), lit("0806000000"))
      // GIF89a: magic, LE16 screen dims, no global table, then one
      // image descriptor + 1-byte LZW sub-block per frame, trailer
      val gifFrame = concat(lit("2C00000000"), hexLe16(w), hexLe16(h),
        lit("0002010100"))
      val gif = concat(lit("474946383961"), hexLe16(w), hexLe16(h),
        lit("000000"),
        array_join(transform(sequence(lit(1), nFrames), _ => gifFrame), ""),
        lit("3B"))
      // BMP: "BM", size/reserved/offset, BITMAPINFOHEADER(40), LE32 dims
      val bmp = concat(lit("424D000000000000000036000000" + "28000000"),
        hexLe32(w), hexLe32(h), lit("0100180000000000"))
      // JPEG: SOI, JFIF APP0 (len 16), SOF0 (len 17: precision 8,
      // BE16 height THEN width, 3 components) — header-only payload,
      // the SOF walk stops before scan data
      val jpeg = concat(lit("FFD8" + "FFE000104A46494600010100000100010000"
          + "FFC0001108"),
        hexBe16(h), hexBe16(w), lit("03011100021101031101"))
      val blob = to_binary(
        when(pmod(col("doc_id"), lit(4)) === 0, png)
          .when(pmod(col("doc_id"), lit(4)) === 1, gif)
          .when(pmod(col("doc_id"), lit(4)) === 2, bmp)
          .otherwise(jpeg), lit("hex"))
      Multimodal.decodeFeatures(
          docs(s, dir).select(col("doc_id")).withColumn("blob", blob))
        .toDF()
        .select("doc_id", "format", "width", "height", "n_frames")
    },

    // real RIFF/WAVE header parsing, verified the same way: synthesize
    // valid WAV headers (channels / sample rate / sample count a
    // closed form of doc_id; the data payload itself stays absent —
    // only its declared size matters, the shape of a metadata scan
    // over huge audio files) and decode through decodeAudio
    "mm_decode_audio" -> { (s, dir) =>
      val ch = (pmod(col("doc_id"), lit(2)) + 1).cast("int")
      val rate = ((pmod(col("doc_id"), lit(3)) + 1) * 8000).cast("int")
      val nSamples = (pmod(col("doc_id"), lit(100)) + 1).cast("int")
      val blockAlign = ch * 2 // 16-bit PCM
      val dataSize = nSamples * blockAlign
      val wav = concat(
        lit("52494646"), hexLe32(dataSize + 36), lit("57415645"), // RIFF size WAVE
        lit("666D7420" + "10000000" + "0100"), // fmt(16), PCM
        hexLe16(ch), hexLe32(rate), hexLe32(rate * blockAlign),
        hexLe16(blockAlign), lit("1000"), // 16 bits/sample
        lit("64617461"), hexLe32(dataSize)) // data chunk header
      Multimodal.decodeAudio(
          docs(s, dir).select(col("doc_id"))
            .withColumn("blob", to_binary(wav, lit("hex"))))
        .toDF()
        .select("doc_id", "format", "channels", "sample_rate",
          "bits_per_sample", "n_samples", "duration_ms")
    },

    // real MP4/ISO-BMFF parsing, verified end-to-end like
    // mm_decode_image: synthesize a spec-shaped container (ftyp, moov
    // with a v0 mvhd and n empty trak boxes — sizes, timescale and
    // duration closed forms of doc_id), walk it with the SAME
    // VideoHeader box parser production payloads would hit, and let
    // the oracle recompute every fact in closed form
    "mm_decode_video" -> { (s, dir) =>
      val nTracks = (pmod(col("doc_id"), lit(3)) + 1).cast("int")
      val timescale = ((pmod(col("doc_id"), lit(3)) + 1) * 600).cast("int")
      val duration =
        (pmod(col("doc_id") * 7, lit(36000)) + 600).cast("int")
      // mvhd v0: 108-byte box — header, version/flags, ctime, mtime,
      // timescale, duration, then 80 spec-reserved/matrix bytes of 0
      val mvhd = concat(
        lit("0000006C" + "6D766864" + "00000000" + "00000000" +
          "00000000"),
        hexBe32(timescale), hexBe32(duration), lit("0" * 160))
      val moov = concat(
        hexBe32(lit(116) + lit(8) * nTracks), lit("6D6F6F76"), mvhd,
        array_join(transform(sequence(lit(1), nTracks),
          _ => lit("00000008" + "7472616B")), ""))
      val mp4 = concat(
        lit("00000010" + "66747970" + "69736F6D" + "00000000"), moov)
      Multimodal.decodeVideo(docs(s, dir).select(col("doc_id"))
          .withColumn("blob", to_binary(mp4, lit("hex"))))
        .toDF()
        .select("doc_id", "byte_len", "format", "n_tracks", "timescale",
          "duration_ticks", "duration_ms", "n_sampled_1hz")
    },

    // resize + frame-sample plumbing over the decoded features
    "mm_thumbnail" -> { (s, dir) =>
      val feats = Multimodal.decodeFeatures(
        Multimodal.withBlob(docs(s, dir), "text")).toDF()
      Multimodal.withThumbnailDims(feats, 128, 96)
        .select(col("doc_id"), col("width"), col("height"),
          col("thumb_w"), col("thumb_h"),
          size(Multimodal.frameSampleIndices(col("n_frames"), 5))
            .as("n_sampled"))
    })

  // ------------------------------------------------------------------ //
  // DuckDB oracles. Helpers keep the float math written identically
  // to the Spark side (left fold, double casts).

  /** Left-fold dot product of two float-list columns, double math. */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, len($a) + 1),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)""".stripMargin

  private def normSql(a: String): String =
    s"""sqrt(list_reduce(list_transform(range(1, len($a) + 1),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)), (x, y) -> x + y))""".stripMargin

  /** Seed terms for the BM25 curation query (high-df corpus words so
    * every SF has matches); shared by the Spark call and the oracle.
    */
  private val Bm25Terms = Seq("data", "join", "hash")

  private def bm25OracleSql(terms: Seq[String], k: Int): String = {
    val tfs = terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(toks, t -> t = '$t')) AS tf$i"
    }.mkString(", ")
    val dfs = terms.indices.map(i =>
      s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
    // identical decimal literals to the Spark expression (2.2, 1.2,
    // 0.25, 0.75) — both engines parse the same doubles
    val score = terms.indices.map(i =>
      s"ln((s.n - s.df$i + 0.5)/(s.df$i + 0.5) + 1.0) * " +
        s"(CAST(tf$i AS DOUBLE) * 2.2) / (CAST(tf$i AS DOUBLE) + " +
        s"1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / s.avgdl))")
      .mkString(" + ")
    s"""WITH d AS (SELECT doc_id, $tokensSql AS toks FROM documents),
       |tf AS (SELECT doc_id, len(toks) AS dl, $tfs FROM d),
       |s AS (SELECT count(*) AS n,
       |        CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl, $dfs FROM tf)
       |SELECT doc_id, dl, ${terms.indices.map(i => s"tf$i").mkString(", ")},
       |  CAST(row_number() OVER (ORDER BY ($score) DESC, doc_id) AS INT) AS rnk
       |FROM tf, s
       |QUALIFY rnk <= $k""".stripMargin
  }

  private def l2Sql(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, len($a) + 1),
       |      i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))), (x, y) -> x + y)""".stripMargin

  /** PQ-ADC oracle, one CTE block per subspace mirroring
    * Similarity.pqTopK's single subspace-as-data plan: codebook =
    * first-kk init + one fixed-point Lloyd update, codes by L2 argmin
    * (ties to smaller cid), per-query fixed-point dot tables, integer
    * ADC sums, top-k by (adc DESC, id ASC).
    */
  private def pqOracleSql(m: Int, dims: Int, kk: Int, k: Int,
                          ivf: Option[(Int, Int)] = None,
                          refine: Option[Int] = None,
                          trainSample: Int = 1): String = {
    val d = dims / m
    // mirror of pqTrain's trainSample: seeds and the Lloyd update run
    // over the deterministic id-modulus sample; codes cover everything
    val trainW =
      if (trainSample == 1) "" else s" WHERE vec_id % $trainSample = 0"
    // coarse quantizer CTEs (mirrors sim_ivf_topk's cosine
    // assign/probe) + the allowed (query, neighbor) pair set
    val ivfCtes = ivf.map { case (nlist, nprobe) =>
      s"""cent AS (SELECT vec_id AS ccid, embedding AS cvec
         |         FROM embeddings ORDER BY vec_id LIMIT $nlist),
         |assigned AS (
         |  SELECT c.vec_id AS neighbor_id, ct.ccid AS list
         |  FROM embeddings c CROSS JOIN cent ct
         |  QUALIFY row_number() OVER (PARTITION BY c.vec_id
         |    ORDER BY ${cosSql("c.embedding", "ct.cvec")} DESC, ct.ccid) = 1),
         |probes AS (
         |  SELECT q.vec_id AS query_id, ct.ccid AS list
         |  FROM embeddings q CROSS JOIN cent ct WHERE q.vec_id < 50
         |  QUALIFY row_number() OVER (PARTITION BY q.vec_id
         |    ORDER BY ${cosSql("q.embedding", "ct.cvec")} DESC, ct.ccid) <= $nprobe),
         |allowed AS (SELECT p.query_id, a.neighbor_id
         |            FROM probes p JOIN assigned a USING (list)),
         |""".stripMargin
    }.getOrElse("")
    val ctes = (0 until m).map { j =>
      val lo = j * d + 1
      val hi = (j + 1) * d
      s"""sub$j AS (SELECT vec_id, embedding[$lo:$hi] AS sv FROM embeddings),
         |cent0_$j AS (SELECT vec_id AS cid, sv AS cv FROM sub$j$trainW ORDER BY vec_id LIMIT $kk),
         |a1_$j AS (
         |  SELECT s.vec_id, s.sv, c.cid
         |  FROM (SELECT * FROM sub$j$trainW) s CROSS JOIN cent0_$j c
         |  QUALIFY row_number() OVER (PARTITION BY s.vec_id
         |    ORDER BY ${l2Sql("s.sv", "c.cv")} ASC, c.cid) = 1),
         |sums_$j AS (
         |  SELECT cid, i.i AS i,
         |    sum(CAST(floor(CAST(sv[i.i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS s,
         |    count(*) AS n
         |  FROM a1_$j, LATERAL (SELECT unnest(range(1, ${d + 1})) AS i) i
         |  GROUP BY 1, 2),
         |cent1_$j AS (
         |  SELECT cid, list((CAST(s AS DOUBLE) / n) / 1000000.0 ORDER BY i) AS cv
         |  FROM sums_$j GROUP BY cid),
         |codes_$j AS (
         |  SELECT s.vec_id, c.cid FROM sub$j s CROSS JOIN cent1_$j c
         |  QUALIFY row_number() OVER (PARTITION BY s.vec_id
         |    ORDER BY ${l2Sql("s.sv", "c.cv")} ASC, c.cid) = 1),
         |tbl_$j AS (
         |  SELECT q.vec_id AS query_id, c.cid,
         |    CAST(floor((${dotSql(s"q.embedding[$lo:$hi]", "c.cv")}) * 1000000.0) AS BIGINT) AS tq
         |  FROM embeddings q CROSS JOIN cent1_$j c WHERE q.vec_id < 50)""".stripMargin
    }
    val restrict = if (ivf.isDefined)
      " JOIN allowed al ON al.neighbor_id = cd.vec_id" +
        " AND al.query_id = t.query_id"
    else ""
    val parts = (0 until m).map(j =>
      s"SELECT t.query_id, cd.vec_id AS neighbor_id, t.tq " +
        s"FROM codes_$j cd JOIN tbl_$j t ON t.cid = cd.cid$restrict")
      .mkString(" UNION ALL ")
    // stage-1 candidate cap: k·refine when a refine stage follows,
    // plain k otherwise
    val capK = k * refine.getOrElse(1)
    val adcSel =
      s"""SELECT query_id, neighbor_id, CAST(sum(tq) AS BIGINT) AS adc_q
         |FROM parts WHERE query_id <> neighbor_id
         |GROUP BY 1, 2
         |QUALIFY row_number() OVER (PARTITION BY query_id
         |  ORDER BY adc_q DESC, neighbor_id) <= $capK""".stripMargin
    refine match {
      case None =>
        s"""WITH $ivfCtes${ctes.mkString(",\n")},
           |parts AS ($parts)
           |$adcSel""".stripMargin
      case Some(_) =>
        // exact cosine re-rank of the ADC candidates; same op order
        // as the Spark side (dot(q,c) / (norm(q)·norm(c))), zero-norm
        // vectors excluded on both sides
        s"""WITH $ivfCtes${ctes.mkString(",\n")},
           |parts AS ($parts),
           |adc AS ($adcSel)
           |SELECT a.query_id, a.neighbor_id,
           |  ${cosSql("q.embedding", "c.embedding")} AS cos
           |FROM adc a
           |JOIN embeddings c ON c.vec_id = a.neighbor_id
           |JOIN embeddings q ON q.vec_id = a.query_id
           |WHERE (${normSql("c.embedding")}) > 0
           |  AND (${normSql("q.embedding")}) > 0
           |QUALIFY row_number() OVER (PARTITION BY a.query_id
           |  ORDER BY cos DESC, a.neighbor_id) <= $k""".stripMargin
    }
  }

  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)}) / ((${normSql(a)}) * (${normSql(b)}))"

  /** DuckDB rendering of [[TextAnalysis.qlog8]] — log2 in integer
    * eighth-bits: 8·(binlen−1) + (top 4 bits) − 8, msb from binary
    * string length, shift direction by msb position. `x` must be a
    * positive integer expression (it is interpolated several times —
    * keep it simple, no side effects).
    */
  private def qlog8Sql(x: String): String = {
    val len = s"length(bin($x))"
    s"(8 * ($len - 1) + (CASE WHEN $len >= 4 " +
      s"THEN ($x) >> ($len - 4) ELSE ($x) << (4 - $len) END) - 8)"
  }

  /** DuckDB rendering of [[org.apache.spark.sql.graft.WinnowKernel]]'s
    * double 31-bit polynomial gram hash as the positional sum
    * Σ cp(pos+j)·B^(k−1−j) mod P (equal to the Spark side's rolling
    * update, term by term mod P): each term ≤ 2^21 · 2^31 and the
    * k-term sum ≤ 2^56, exact in BIGINT.
    */
  private def winnowHashSql(k: Int): String = {
    import org.apache.spark.sql.graft.WinnowKernel._
    def sum(pows: IndexedSeq[Long]) = (0 until k).map(j =>
      s"CAST(ascii(substr(text, CAST(i.i + $j AS INT), 1)) AS BIGINT) * ${pows(j)}")
      .mkString(" + ")
    s"((${sum(powers(B1, P1, k))}) % $P1) * $P2 + " +
      s"((${sum(powers(B2, P2, k))}) % $P2)"
  }

  /** Winnowing fingerprint CTEs shared by the substring-dedup and
    * decontamination oracles — k=16-char grams, 8-gram windows (ROWS
    * ... 7 FOLLOWING), identical constants to the Spark calls. The
    * oracle keeps the simple per-position window form; the Spark
    * side's chunked kernel produces the same fingerprint SET (overlap
    * chunking truncates windows only at true document end, exactly
    * like the window frame here).
    */
  private def winnowFpsCte: String =
    s"""grams AS (
       |  SELECT doc_id, i.i AS pos,
       |    ${winnowHashSql(16)} AS h
       |  FROM documents,
       |    LATERAL (SELECT unnest(generate_series(1, length(text) - 15)) AS i) i
       |  WHERE length(text) >= 16),
       |winmin AS (
       |  SELECT doc_id,
       |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
       |                 ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS fp
       |  FROM grams),
       |fps AS (SELECT DISTINCT doc_id, fp FROM winmin)""".stripMargin

  /** Events view with the ns→µs timestamp truncation Tables.load does. */
  private val evtCte =
    """evts AS (SELECT event_id, make_timestamp(epoch_us(ts)) AS ts,
      |               user_id, event_type, value, props FROM events)""".stripMargin

  /** Word bigram shingles of `text` (TextAnalysis.shingles k=2). */
  private val shingleCte =
    """sh AS (
      |  SELECT doc_id, lang, source,
      |    CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 2
      |      THEN list_transform(range(1, len(string_split_regex(trim(text), '\s+'))),
      |             i -> string_split_regex(trim(text), '\s+')[i] || '_' ||
      |                  string_split_regex(trim(text), '\s+')[i+1])
      |      ELSE [] END AS s
      |  FROM documents)""".stripMargin

  /** DuckDB rendering of the deterministic ±1 hyperplane matrix
    * (Similarity.hyperplanes) as literal lists, one per plane.
    */
  private def planeSql(planes: Int, dims: Int): Seq[String] =
    Similarity.hyperplanes(planes, dims).toSeq.map(row =>
      row.map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ", ", "]"))

  private def lshBucketSql(vec: String, planes: Int, dims: Int): String =
    planeSql(planes, dims).zipWithIndex.map { case (w, p) =>
      s"(CASE WHEN (${dotSql(vec, w)}) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private val tokensSql = """string_split_regex(trim(text), '\s+')"""

  /** Augmented-space MIPS bucket (mirrors Similarity.mipsTopK's
    * bucketBits): per plane, sign of ⟨v, w₁..d⟩ + w_{d+1}·extra where
    * extra = √(max(M²−n², 0)) for corpus rows and 0 for queries (the
    * +0 term is an IEEE no-op, so the query side omits it).
    */
  private def mipsBucketSql(vec: String, extra: Option[String],
                            planes: Int, dims: Int): String = {
    val pl = Similarity.hyperplanes(planes, dims + 1)
    pl.zipWithIndex.map { case (w, p) =>
      val prefix = w.take(dims)
        .map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
      val proj = extra match {
        case Some(e) =>
          val wl = if (w(dims) > 0) "1.0" else "-1.0"
          s"(${dotSql(vec, prefix)}) + $wl * $e"
        case None => s"(${dotSql(vec, prefix)})"
      }
      s"(CASE WHEN ($proj) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** The BPE induction as a CTE chain (graft.ext.Bpe replayed in SQL):
    * `w0` is the capped word table with delimited symbol strings;
    * round r computes pair counts `pc_r` from `w_(r-1)`, picks the
    * (n DESC, pattern-bytes ASC) top pair `t_r`, and re-encodes into
    * `w_r` with the same leftmost non-overlapping `replace` Spark
    * runs. Ends with `t1..tk` in scope.
    */
  private def bpeCtes(k: Int, maxWords: Int): String = {
    val w0 = raw"""w0 AS (
      |  SELECT wc, regexp_replace(w, '(.)', '|\1|', 'g') AS str FROM (
      |    SELECT t AS w, count(*) AS wc
      |    FROM (SELECT unnest($tokensSql) AS t FROM documents)
      |    WHERE t <> ''
      |    GROUP BY 1 ORDER BY wc DESC, w LIMIT $maxWords))""".stripMargin
    val rounds = (1 to k).map { r =>
      s"""pc$r AS (
        |  SELECT s[i] AS sl, s[i + 1] AS sr, CAST(sum(wc) AS BIGINT) AS n
        |  FROM (SELECT wc, s, unnest(generate_series(1, len(s) - 1)) AS i
        |        FROM (SELECT wc, string_split(trim(str, '|'), '||') AS s
        |              FROM w${r - 1}))
        |  GROUP BY 1, 2),
        |t$r AS (
        |  SELECT $r AS rank, sl, sr, sl || sr AS merged,
        |         '|' || sl || '||' || sr || '|' AS pat,
        |         '|' || sl || sr || '|' AS rep, n
        |  FROM pc$r ORDER BY n DESC, pat LIMIT 1),
        |w$r AS (
        |  SELECT wc, replace(str, (SELECT pat FROM t$r),
        |                     (SELECT rep FROM t$r)) AS str
        |  FROM w${r - 1})""".stripMargin
    }
    (w0 +: rounds).mkString(",\n")
  }

  private def stopContains(arr: String): String = {
    val stops = TextAnalysis.Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter($arr, t -> list_contains($stops, t)))"
  }

  /** TextAnalysis.qualityScore in SQL — expects `text` and `toks`
    * columns in scope. ONE definition spliced into every oracle that
    * scores quality, so the three-term formula cannot drift per query.
    */
  private lazy val qualitySql: String =
    s"CAST(${stopContains("toks")} AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.5 + " +
      "(1.0 - CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE) / " +
      "CAST(length(text) AS DOUBLE)) * 0.3 + " +
      "least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.2"

  private def langScoreSql(markers: Seq[String]): String = {
    val m = markers.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter(toks, t -> list_contains($m, t)))"
  }

  /** The MinHash-LSH candidate-pair pipeline as a reusable CTE chain
    * ending in `mh_pairs(id_a, id_b)` — spliced into both the pair
    * query and the connected-components closure so the two oracles
    * cannot drift.
    */
  private lazy val minhashPairCtes: String = {
    val coef = DedupOps.minhashCoefficients(12)
    val p = DedupOps.MinhashP
    val sigCols = coef.zipWithIndex.map { case ((a, b), i) =>
      s"min(($a * h + $b) % $p) AS m$i"
    }.mkString(",\n|    ")
    val bandSelects = (0 until 4).map { b =>
      val ms = (b * 3 until b * 3 + 3)
        .map(j => s"CAST(m$j AS VARCHAR)").mkString(", ")
      s"SELECT doc_id, $b AS b, md5(concat_ws(',', '$b', $ms)) AS bkey FROM sig"
    }.mkString("\n|  UNION ALL ")
    s"""$shingleCte,
      |hs AS (SELECT doc_id,
      |         CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) % $p AS h
      |       FROM (SELECT doc_id, unnest(s) AS s FROM sh)),
      |sig AS (SELECT doc_id,
      |    $sigCols
      |  FROM hs GROUP BY doc_id),
      |bands AS (
      |  $bandSelects),
      |mh_pairs AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
      |  FROM bands a JOIN bands b2 ON a.b = b2.b AND a.bkey = b2.bkey
      |  WHERE a.doc_id < b2.doc_id)""".stripMargin
  }

  /** Unrolled integer-fixed-point PageRank rounds (mirrors
    * Graph.pageRank's schedule exactly: same integer divisions, same
    * damping rational).
    */
  private def pageRankCtes(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""s$k AS (SELECT e.dst AS node_id, sum(r${k - 1}.r // e.deg) AS m
         |        FROM e JOIN r${k - 1} ON e.src = r${k - 1}.node_id
         |        GROUP BY 1),
         |r$k AS (SELECT n.node_id,
         |          CAST(150000 + (17 * COALESCE(s$k.m, 0)) // 20 AS BIGINT) AS r
         |        FROM nodes n LEFT JOIN s$k USING (node_id))""".stripMargin
    }.mkString(",\n")
    s"""ej AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sk
       |       FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT 2 * c AS src, 2 * sk + 1 AS dst FROM ej
       |          UNION ALL SELECT 2 * sk + 1, 2 * c FROM ej),
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
       |e AS (SELECT edges.src, edges.dst, deg.deg
       |      FROM edges JOIN deg USING (src)),
       |nodes AS (SELECT 2 * c_custkey AS node_id FROM customer
       |          UNION ALL SELECT 2 * s_suppkey + 1 FROM supplier),
       |r0 AS (SELECT node_id, CAST(1000000 AS BIGINT) AS r FROM nodes),
       |$rounds""".stripMargin
  }

  /** Shared co-purchase edge CTEs (mirrors the `copurchase_edges`
    * stage: distinct incidence, 1000-item group cap, support-≥2 pair
    * floor, canonical u < v).
    */
  private val copurchaseCtes =
    """oi AS (SELECT DISTINCT l_orderkey AS grp, l_partkey AS item
      |            FROM lineitem),
      |gok AS (SELECT grp FROM oi GROUP BY grp HAVING count(*) <= 1000),
      |oi2 AS (SELECT oi.grp, oi.item FROM oi JOIN gok USING (grp)),
      |pairs AS (SELECT a.item AS u, b.item AS v, count(*) AS sup
      |          FROM oi2 a JOIN oi2 b ON a.grp = b.grp AND a.item < b.item
      |          GROUP BY 1, 2),
      |edges AS (SELECT u, v FROM pairs WHERE sup >= 2)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "graph_pagerank" ->
      s"""WITH ${pageRankCtes(3)}
         |SELECT node_id, r AS rank_micros FROM r3""".stripMargin,

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
        |wed AS (SELECT a.src, a.dst AS y, b.dst AS z
        |        FROM ori a JOIN ori b ON a.src = b.src AND a.dst < b.dst),
        |tri AS (SELECT w.src FROM wed w
        |        JOIN edges e2 ON w.y = e2.u AND w.z = e2.v)
        |SELECT (SELECT count(*) FROM deg) AS n_nodes,
        |       (SELECT count(*) FROM edges) AS n_edges,
        |       (SELECT count(*) FROM wed) AS n_wedges,
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

    // NULLS FIRST pins DuckDB (default NULLS LAST on ASC) to the
    // operator's contract: NULL is the SMALLEST key in the tie order
    // (Spark's default ASC placement). l_partkey is non-null in the
    // fixtures, but the oracle must encode the contract, not the
    // fixture.
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
    "ts_ewma" ->
      (s"""WITH $evtCte,
        |l AS (SELECT user_id,
        |        list(CAST(floor(value * 1000000) AS BIGINT)
        |             ORDER BY ts, event_id) AS vs
        |      FROM evts GROUP BY 1)
        |SELECT user_id, CAST(len(vs) AS BIGINT) AS n_events,
        |  list_reduce(vs, (acc, x) -> (acc + x) // 2) AS ewma_micros
        |FROM l""".stripMargin),

    "dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS dup_key,
        |  min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    "dedup_minhash_lsh" ->
      s"""WITH $minhashPairCtes
        |SELECT id_a, id_b FROM mh_pairs""".stripMargin,

    // same closure as dedup_components, then quality-argmax per
    // component; (quality DESC, id ASC) mirrors Spark's
    // max_by(id, struct(quality, -id)) tie-break bit for bit
    "dedup_keep_best" ->
      (s"""WITH RECURSIVE $minhashPairCtes,
        |edges AS (SELECT id_a AS ea, id_b AS eb FROM mh_pairs
        |          UNION ALL SELECT id_b, id_a FROM mh_pairs),
        |reach(src, dst) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT r.src, e.eb FROM reach r JOIN edges e ON r.dst = e.ea),
        |comp AS (SELECT src AS id, min(dst) AS component_id
        |         FROM reach GROUP BY src),
        |q AS (SELECT doc_id AS id, $qualitySql AS quality
        |      FROM (SELECT doc_id, text, $tokensSql AS toks FROM documents)),
        |j AS (SELECT c.component_id, c.id, q.quality
        |      FROM comp c JOIN q USING (id))
        |SELECT component_id, id AS best_id,
        |  count(*) OVER (PARTITION BY component_id) AS n_members
        |FROM j
        |QUALIFY row_number() OVER (PARTITION BY component_id
        |  ORDER BY quality DESC, id) = 1""".stripMargin),

    // transitive closure over the SAME MinHash pair CTEs, min reachable
    // id per doc = component id; docs outside every pair stay singleton
    // components via the closure's seed row (doc_id, doc_id)
    "dedup_components" ->
      s"""WITH RECURSIVE $minhashPairCtes,
        |edges AS (SELECT id_a AS ea, id_b AS eb FROM mh_pairs
        |          UNION ALL SELECT id_b, id_a FROM mh_pairs),
        |reach(src, dst) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT r.src, e.eb FROM reach r JOIN edges e ON r.dst = e.ea)
        |SELECT src AS doc_id, min(dst) AS component_id
        |FROM reach GROUP BY src""".stripMargin,

    "dedup_simhash" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
        |             FROM documents),
        |h AS (SELECT doc_id, CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) AS h FROM tok),
        |bits AS (SELECT doc_id, j,
        |           CASE WHEN sum(((h >> j) % 2) * 2 - 1) > 0
        |                THEN (CAST(1 AS BIGINT) << j) ELSE 0 END AS bit
        |         FROM h, unnest(range(0, 60)) AS u(j) GROUP BY doc_id, j)
        |SELECT doc_id, CAST(sum(bit) AS BIGINT) AS simhash FROM bits GROUP BY doc_id""".stripMargin,

    "dedup_simhash_pairs" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
        |             FROM documents),
        |h AS (SELECT doc_id, CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) AS h FROM tok),
        |bits AS (SELECT doc_id, j,
        |           CASE WHEN sum(((h >> j) % 2) * 2 - 1) > 0
        |                THEN (CAST(1 AS BIGINT) << j) ELSE 0 END AS bit
        |         FROM h, unnest(range(0, 60)) AS u(j) GROUP BY doc_id, j),
        |sh AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS simhash FROM bits GROUP BY doc_id),
        |banded AS (SELECT doc_id, simhash, b, (simhash >> (b * 15)) & 32767 AS bkey
        |           FROM sh, unnest(range(0, 4)) AS u(b))
        |SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
        |       CAST(bit_count(xor(a.simhash, b2.simhash)) AS INT) AS hamming
        |FROM banded a JOIN banded b2 ON a.b = b2.b AND a.bkey = b2.bkey
        |WHERE a.doc_id < b2.doc_id
        |  AND bit_count(xor(a.simhash, b2.simhash)) <= 3""".stripMargin,

    "dedup_ngram_jaccard" ->
      (s"""WITH $shingleCte,
        |e0 AS (SELECT lang, source, doc_id,
        |         CAST('0x' || substr(md5(unnest(list_distinct(s))), 1, 15) AS BIGINT) AS sh
        |       FROM sh),
        |keep AS (SELECT lang, source, sh FROM e0
        |         GROUP BY 1, 2, 3 HAVING count(*) <= 64),
        |e AS (SELECT e0.* FROM e0 JOIN keep USING (lang, source, sh)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM e GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |          FROM e a JOIN e b ON a.lang = b.lang AND a.source = b.source
        |            AND a.sh = b.sh AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jac
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.1""".stripMargin),

    // same winnowing CTEs as dedup_substring; benchmark = doc_id%5==0,
    // threshold 16 mirrored from the Spark call
    "dedup_decontaminate" ->
      s"""WITH $winnowFpsCte,
        |bench AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 5 = 0),
        |hits AS (SELECT f.doc_id, count(*) AS n FROM fps f
        |         JOIN bench b ON f.fp = b.fp
        |         WHERE f.doc_id % 5 <> 0 GROUP BY 1)
        |SELECT d.doc_id, coalesce(h.n, 0) AS n_shared,
        |  coalesce(h.n, 0) < 16 AS keep
        |FROM (SELECT DISTINCT doc_id FROM fps WHERE doc_id % 5 <> 0) d
        |LEFT JOIN hits h ON h.doc_id = d.doc_id""".stripMargin,

    // k=16-char grams, 8-gram windows (ROWS ... 7 FOLLOWING), shared
    // fingerprints >= 3, posting-list cap 64 — identical constants to
    // the Spark call in `queries`
    "dedup_substring" ->
      s"""WITH $winnowFpsCte,
        |keep AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 64)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
        |FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |JOIN keep ON keep.fp = a.fp
        |GROUP BY 1, 2 HAVING count(*) >= 3""".stripMargin,

    "dedup_cosine" ->
      (s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  ${cosSql("a.embedding", "b.embedding")} AS cos
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.25""".stripMargin),

    // assignment tie-break (cos DESC, cid ASC) mirrors Spark's window
    // row_number; a pair sharing both assigned lists arrives twice,
    // hence DISTINCT on both sides
    "dedup_cosine_ivf" ->
      (s"""WITH cent AS (SELECT vec_id AS cid, embedding AS cvec
        |             FROM embeddings ORDER BY vec_id LIMIT 8),
        |assigned AS (
        |  SELECT e.vec_id AS id, e.embedding AS v, ct.cid AS list
        |  FROM embeddings e CROSS JOIN cent ct
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY ${cosSql("e.embedding", "ct.cvec")} DESC, ct.cid) <= 2)
        |SELECT DISTINCT a.id AS id_a, b.id AS id_b,
        |  ${cosSql("a.v", "b.v")} AS cos
        |FROM assigned a JOIN assigned b USING (list)
        |WHERE a.id < b.id AND ${cosSql("a.v", "b.v")} >= 0.25""".stripMargin),

    // two-iteration kmeans fragment identical to emb_kmeans's oracle;
    // the final assignment carries the embedding so the within-cluster
    // similarity join and the keep-min anti join mirror semanticDedup
    "dedup_semantic" ->
      (s"""WITH cent0 AS (SELECT vec_id AS cid, embedding AS cv
        |              FROM embeddings ORDER BY vec_id LIMIT 8),
        |a1 AS (
        |  SELECT e.vec_id, e.embedding AS ev, c.cid
        |  FROM embeddings e CROSS JOIN cent0 c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.cid) = 1),
        |dims AS (
        |  SELECT cid, generate_subscripts(ev, 1) AS i,
        |    unnest(list_transform(ev,
        |      v -> CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT))) AS qv
        |  FROM a1),
        |sums AS (SELECT cid, i, sum(qv) AS s, count(*) AS n FROM dims GROUP BY 1, 2),
        |cent1 AS (
        |  SELECT cid, list((CAST(s AS DOUBLE) / n) / 1000000.0 ORDER BY i) AS cv
        |  FROM sums GROUP BY cid),
        |a2 AS (
        |  SELECT e.vec_id, e.embedding AS ev, c.cid
        |  FROM embeddings e CROSS JOIN cent1 c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.cid) = 1),
        |dropped AS (
        |  SELECT DISTINCT b.vec_id AS vid
        |  FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id
        |  WHERE (${normSql("a.ev")}) > 0 AND (${normSql("b.ev")}) > 0
        |    AND (${dotSql("a.ev", "b.ev")}) /
        |        ((${normSql("a.ev")}) * (${normSql("b.ev")})) >= 0.25)
        |SELECT vec_id AS id, cid FROM a2
        |WHERE vec_id NOT IN (SELECT vid FROM dropped)""".stripMargin),

    "sim_bruteforce_topk" ->
      (s"""SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  ${cosSql("q.embedding", "c.embedding")} AS cos
        |FROM embeddings q CROSS JOIN embeddings c
        |WHERE q.vec_id < 50 AND q.vec_id <> c.vec_id
        |QUALIFY row_number() OVER (PARTITION BY q.vec_id
        |  ORDER BY ${cosSql("q.embedding", "c.embedding")} DESC, c.vec_id) <= 5""".stripMargin),

    "sim_lsh_topk" ->
      (s"""WITH q AS (SELECT vec_id, embedding,
        |             ${lshBucketSql("embedding", 4, 64)} AS bucket
        |           FROM embeddings WHERE vec_id < 50),
        |c AS (SELECT vec_id, embedding,
        |        ${lshBucketSql("embedding", 4, 64)} AS bucket
        |      FROM embeddings)
        |SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  ${cosSql("q.embedding", "c.embedding")} AS cos
        |FROM q JOIN c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        |QUALIFY row_number() OVER (PARTITION BY q.vec_id
        |  ORDER BY ${cosSql("q.embedding", "c.embedding")} DESC, c.vec_id) <= 5""".stripMargin),

    "sim_mips_topk" ->
      (s"""WITH mm AS (SELECT max(${normSql("embedding")}) AS m
        |            FROM embeddings),
        |cn AS (SELECT vec_id, embedding,
        |         ${normSql("embedding")} AS n FROM embeddings),
        |c AS (SELECT vec_id, embedding,
        |        ${mipsBucketSql("embedding",
               Some("sqrt(greatest(mm.m * mm.m - n * n, 0))"), 2, 64)}
        |          AS bucket
        |      FROM cn, mm),
        |q AS (SELECT vec_id, embedding,
        |        ${mipsBucketSql("embedding", None, 2, 64)} AS bucket
        |      FROM embeddings WHERE vec_id < 50)
        |SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  ${dotSql("q.embedding", "c.embedding")} AS ip
        |FROM q JOIN c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        |QUALIFY row_number() OVER (PARTITION BY q.vec_id
        |  ORDER BY ${dotSql("q.embedding", "c.embedding")} DESC, c.vec_id) <= 5""".stripMargin),

    // assignment tie-break (cos DESC, cid ASC) mirrors Spark's
    // max_by(cid, struct(cos, -cid)); floats are bit-identical on
    // both sides so the argmax resolves identically
    "sim_ivf_topk" ->
      (s"""WITH cent AS (SELECT vec_id AS cid, embedding AS cvec
        |             FROM embeddings ORDER BY vec_id LIMIT 8),
        |assigned AS (
        |  SELECT c.vec_id AS neighbor_id, c.embedding AS cv, ct.cid AS list
        |  FROM embeddings c CROSS JOIN cent ct
        |  QUALIFY row_number() OVER (PARTITION BY c.vec_id
        |    ORDER BY ${cosSql("c.embedding", "ct.cvec")} DESC, ct.cid) = 1),
        |probes AS (
        |  SELECT q.vec_id AS query_id, q.embedding AS qv, ct.cid AS list
        |  FROM embeddings q CROSS JOIN cent ct
        |  WHERE q.vec_id < 50
        |  QUALIFY row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY ${cosSql("q.embedding", "ct.cvec")} DESC, ct.cid) <= 2)
        |SELECT query_id, neighbor_id, ${cosSql("p.qv", "a.cv")} AS cos
        |FROM probes p JOIN assigned a USING (list)
        |WHERE query_id <> neighbor_id
        |QUALIFY row_number() OVER (PARTITION BY query_id
        |  ORDER BY ${cosSql("p.qv", "a.cv")} DESC, neighbor_id) <= 5""".stripMargin),

    "sim_pq_adc_topk" ->
      pqOracleSql(m = 16, dims = 64, kk = 16, k = 5, trainSample = 4),

    "sim_pq_refine_topk" ->
      pqOracleSql(m = 16, dims = 64, kk = 16, k = 5, refine = Some(4),
        trainSample = 4),

    "sim_ivfpq_topk" ->
      pqOracleSql(m = 16, dims = 64, kk = 16, k = 5, ivf = Some((8, 2)),
        trainSample = 4),

    "sim_ivfpq_refine_topk" ->
      pqOracleSql(m = 16, dims = 64, kk = 16, k = 5, ivf = Some((8, 2)),
        refine = Some(4), trainSample = 4),

    "text_bm25_topk" -> bm25OracleSql(Bm25Terms, k = 20),

    // thresholds 0.2/0.18/0.2 are the same decimal literals the Spark
    // call carries; every ratio is exact-int / exact-int (correctly
    // rounded division, bit-identical)
    "text_repetition" ->
      s"""WITH d AS (SELECT doc_id, $tokensSql AS toks FROM documents),
         |b AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
         |        THEN list_transform(range(1, len(toks)),
         |               i -> toks[i] || '_' || toks[i+1]) ELSE [] END) AS g
         |      FROM d),
         |t AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 3
         |        THEN list_transform(range(1, len(toks) - 1),
         |               i -> toks[i] || '_' || toks[i+1] || '_' || toks[i+2]) ELSE [] END) AS g
         |      FROM d),
         |b2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n2,
         |         count(*) AS d2, CAST(max(c) AS BIGINT) AS top2
         |       FROM (SELECT doc_id, g, count(*) AS c FROM b GROUP BY 1, 2)
         |       GROUP BY 1),
         |t3 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n3, count(*) AS d3
         |       FROM (SELECT doc_id, g, count(*) AS c FROM t GROUP BY 1, 2)
         |       GROUP BY 1)
         |SELECT d.doc_id, n2, d2, n3, d3,
         |  coalesce(CAST(n2 - d2 AS DOUBLE) / CAST(n2 AS DOUBLE), 0.0) AS dup2_frac,
         |  coalesce(CAST(n3 - d3 AS DOUBLE) / CAST(n3 AS DOUBLE), 0.0) AS dup3_frac,
         |  coalesce(CAST(top2 AS DOUBLE) / CAST(n2 AS DOUBLE), 0.0) AS top2_share,
         |  (coalesce(CAST(n2 - d2 AS DOUBLE) / CAST(n2 AS DOUBLE), 0.0) <= 0.2
         |   AND coalesce(CAST(n3 - d3 AS DOUBLE) / CAST(n3 AS DOUBLE), 0.0) <= 0.18
         |   AND (coalesce(n2, 0) < 20
         |        OR coalesce(CAST(top2 AS DOUBLE) / CAST(n2 AS DOUBLE), 0.0) <= 0.2)) AS keep
         |FROM d LEFT JOIN b2 USING (doc_id) LEFT JOIN t3 USING (doc_id)""".stripMargin,

    // same chunk arithmetic as text_chunk; shard = 7-hex salted hash
    // % 8, cumulative token count per shard in (doc_id, chunk_idx)
    // order, sequences cut every 256 tokens. `//` (floor) and Spark's
    // `div` (truncate) agree because the cumsum is non-negative.
    "pack_sequences" ->
      s"""WITH d AS (SELECT doc_id, $tokensSql AS toks FROM documents),
         |c AS (SELECT doc_id, CAST(i.i AS INT) AS chunk_idx,
         |        least(CAST(32 AS BIGINT), len(toks) - i.i*24) AS n_tokens
         |      FROM d, LATERAL (SELECT unnest(range(0,
         |        CAST(floor(CAST(greatest(len(toks) - 8 - 1, 0) AS DOUBLE) / 24.0) AS BIGINT) + 1)) AS i) i
         |      WHERE len(toks) >= 1),
         |s AS (SELECT *, CAST('0x' || substr(md5('graft-pack:' || CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) % 8 AS shard
         |      FROM c),
         |cum AS (SELECT *, sum(n_tokens) OVER (PARTITION BY shard
         |          ORDER BY doc_id, chunk_idx
         |          ROWS UNBOUNDED PRECEDING) - n_tokens AS cumb
         |        FROM s)
         |SELECT doc_id, chunk_idx, n_tokens, shard,
         |  CAST(cumb // 256 AS BIGINT) AS seq_id,
         |  CAST(cumb % 256 AS BIGINT) AS seq_offset
         |FROM cum""".stripMargin,

    "split_assign" ->
      """SELECT doc_id, source,
        |  CASE WHEN CAST('0x' || substr(md5('graft-split:' || source), 1, 7) AS BIGINT) % 1000 < 100 THEN 'test'
        |       WHEN CAST('0x' || substr(md5('graft-split:' || source), 1, 7) AS BIGINT) % 1000 < 200 THEN 'val'
        |       ELSE 'train' END AS split
        |FROM documents""".stripMargin,

    // floor(log2(x)) = length(bin(x)) - 1 exactly on both engines;
    // sums cast to BIGINT (DuckDB sums to HUGEINT)
    "text_surprisal" ->
      s"""WITH d AS (SELECT doc_id, $tokensSql AS toks FROM documents),
         |tok AS (SELECT doc_id, t FROM
         |          (SELECT doc_id, unnest(toks) AS t FROM d) WHERE t <> ''),
         |cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY 1),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM cnt),
         |sc AS (SELECT doc_id, count(*) AS n_tokens,
         |         CAST(sum((length(bin(nn)) - 1) - (length(bin(c)) - 1))
         |              AS BIGINT) AS surprisal_bits
         |       FROM tok JOIN cnt USING (t) CROSS JOIN tot GROUP BY 1)
         |SELECT d0.doc_id, coalesce(n_tokens, 0) AS n_tokens,
         |  coalesce(surprisal_bits, 0) AS surprisal_bits,
         |  coalesce((surprisal_bits * 1000) // n_tokens, 0) AS mean_millibits
         |FROM (SELECT doc_id FROM documents) d0 LEFT JOIN sc USING (doc_id)""".stripMargin,

    // one token table feeds both count models; add-one smoothing and
    // the shared-denominator normalizer keep every term a BIGINT
    "text_dsir_weight" ->
      s"""WITH d AS (SELECT doc_id, source = 'src0' AS tgt,
         |             $tokensSql AS toks FROM documents),
         |tok AS (SELECT doc_id, tgt, t FROM
         |          (SELECT doc_id, tgt, unnest(toks) AS t FROM d)
         |        WHERE t <> ''),
         |cnt AS (SELECT t, count(*) AS cr,
         |          CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct
         |        FROM tok GROUP BY 1),
         |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr,
         |          CAST(sum(ct) AS BIGINT) AS nt,
         |          CAST(count(*) AS BIGINT) AS v FROM cnt),
         |sc AS (SELECT doc_id, count(*) AS n_tokens,
         |         CAST(sum((length(bin(ct + 1)) - 1)
         |             - (length(bin(cr + 1)) - 1)
         |             + ((length(bin(nr + v)) - 1)
         |               - (length(bin(nt + v)) - 1))) AS BIGINT)
         |           AS dsir_bits
         |       FROM tok JOIN cnt USING (t) CROSS JOIN tot GROUP BY 1)
         |SELECT d0.doc_id, coalesce(n_tokens, 0) AS n_tokens,
         |  coalesce(dsir_bits, 0) AS dsir_bits,
         |  coalesce((dsir_bits * 1000) // n_tokens, 0) AS mean_millibits
         |FROM (SELECT doc_id FROM documents) d0 LEFT JOIN sc USING (doc_id)""".stripMargin,

    // DSIR CTEs with BIGRAM features (the '_'-joined shingle form,
    // identical to curate_pretrain's bigram SQL), then the tercile
    // cut over the negated weight, filtered to the kept third
    "curate_domain" ->
      s"""WITH d AS (SELECT doc_id, source = 'src0' AS tgt,
         |             $tokensSql AS toks FROM documents),
         |tok AS (SELECT doc_id, tgt, unnest(CASE WHEN len(toks) >= 2
         |          THEN list_transform(range(1, len(toks)),
         |                 i -> toks[i] || '_' || toks[i+1]) ELSE [] END) AS t
         |        FROM d),
         |cnt AS (SELECT t, count(*) AS cr,
         |          CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct
         |        FROM tok GROUP BY 1),
         |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr,
         |          CAST(sum(ct) AS BIGINT) AS nt,
         |          CAST(count(*) AS BIGINT) AS v FROM cnt),
         |sc AS (SELECT doc_id, count(*) AS n_tokens,
         |         CAST(sum((length(bin(ct + 1)) - 1)
         |             - (length(bin(cr + 1)) - 1)
         |             + ((length(bin(nr + v)) - 1)
         |               - (length(bin(nt + v)) - 1))) AS BIGINT)
         |           AS dsir_bits
         |       FROM tok JOIN cnt USING (t) CROSS JOIN tot GROUP BY 1),
         |scored AS (SELECT d0.doc_id, d0.lang,
         |    coalesce((dsir_bits * 1000) // n_tokens, 0) AS mean_millibits,
         |    -coalesce((dsir_bits * 1000) // n_tokens, 0) AS negw
         |  FROM documents d0 LEFT JOIN sc USING (doc_id)),
         |hist AS (SELECT lang, negw, count(*) AS c
         |         FROM scored GROUP BY 1, 2),
         |cum AS (SELECT lang, negw,
         |    coalesce(CAST(sum(c) OVER (PARTITION BY lang ORDER BY negw
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS BIGINT), 0) AS lt
         |  FROM hist),
         |ln AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
         |       FROM scored GROUP BY 1),
         |b AS (SELECT cum.lang, cum.negw,
         |    CASE WHEN lt * 3 < n THEN 'head'
         |         WHEN lt * 3 < 2 * n THEN 'middle'
         |         ELSE 'tail' END AS bucket
         |  FROM cum JOIN ln USING (lang))
         |SELECT scored.doc_id, scored.lang, scored.mean_millibits
         |FROM scored JOIN b USING (lang, negw) WHERE bucket = 'head'""".stripMargin,

    // surprisal CTEs verbatim, then the tercile cut as a cumulative
    // sum over the (lang, mean_millibits) histogram — strictly-below
    // count, PERCENTILE_DISC-style tie handling, all integers
    "text_ccnet_buckets" ->
      s"""WITH d AS (SELECT doc_id, $tokensSql AS toks FROM documents),
         |tok AS (SELECT doc_id, t FROM
         |          (SELECT doc_id, unnest(toks) AS t FROM d) WHERE t <> ''),
         |cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY 1),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM cnt),
         |sc AS (SELECT doc_id, count(*) AS n_tokens,
         |         CAST(sum((length(bin(nn)) - 1) - (length(bin(c)) - 1))
         |              AS BIGINT) AS surprisal_bits
         |       FROM tok JOIN cnt USING (t) CROSS JOIN tot GROUP BY 1),
         |scored AS (SELECT d0.doc_id, d0.lang,
         |    coalesce((surprisal_bits * 1000) // n_tokens, 0) AS mean_millibits
         |  FROM documents d0 LEFT JOIN sc USING (doc_id)),
         |hist AS (SELECT lang, mean_millibits, count(*) AS c
         |         FROM scored GROUP BY 1, 2),
         |cum AS (SELECT lang, mean_millibits,
         |    coalesce(CAST(sum(c) OVER (PARTITION BY lang
         |        ORDER BY mean_millibits
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS BIGINT), 0) AS lt
         |  FROM hist),
         |ln AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
         |       FROM scored GROUP BY 1),
         |b AS (SELECT cum.lang, cum.mean_millibits,
         |    CASE WHEN lt * 3 < n THEN 'head'
         |         WHEN lt * 3 < 2 * n THEN 'middle'
         |         ELSE 'tail' END AS bucket
         |  FROM cum JOIN ln USING (lang))
         |SELECT scored.doc_id, scored.lang, scored.mean_millibits, b.bucket
         |FROM scored JOIN b USING (lang, mean_millibits)""".stripMargin,

    // the full curation chain as one SQL: cap -> langid -> repetition
    // keep -> train-split hash -> chunk arithmetic -> pack window,
    // every fragment identical to its standalone query's oracle
    "curate_pretrain" -> {
      val en = langScoreSql(Seq("the", "and", "of", "is"))
      val de = langScoreSql(Seq("der", "die", "und", "ist"))
      val fr = langScoreSql(Seq("le", "la", "et", "est"))
      val es = langScoreSql(Seq("el", "los", "y", "es"))
      s"""WITH capped AS (SELECT doc_id, source, substr(text, 1, 2000) AS text
         |                FROM documents),
         |d AS (SELECT doc_id, source, text, $tokensSql AS toks FROM capped),
         |eng AS (SELECT doc_id, source, toks FROM d
         |        WHERE CASE WHEN $en >= $de AND $en >= $fr AND $en >= $es THEN 'en'
         |                   WHEN $de >= $fr AND $de >= $es THEN 'de'
         |                   WHEN $fr >= $es THEN 'fr' ELSE 'es' END = 'en'),
         |b AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
         |        THEN list_transform(range(1, len(toks)),
         |               i -> toks[i] || '_' || toks[i+1]) ELSE [] END) AS g
         |      FROM eng),
         |t AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 3
         |        THEN list_transform(range(1, len(toks) - 1),
         |               i -> toks[i] || '_' || toks[i+1] || '_' || toks[i+2]) ELSE [] END) AS g
         |      FROM eng),
         |b2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n2,
         |         count(*) AS d2, CAST(max(c) AS BIGINT) AS top2
         |       FROM (SELECT doc_id, g, count(*) AS c FROM b GROUP BY 1, 2)
         |       GROUP BY 1),
         |t3 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n3, count(*) AS d3
         |       FROM (SELECT doc_id, g, count(*) AS c FROM t GROUP BY 1, 2)
         |       GROUP BY 1),
         |rep AS (SELECT eng.doc_id FROM eng
         |        LEFT JOIN b2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
         |        WHERE coalesce(CAST(n2 - d2 AS DOUBLE) / CAST(n2 AS DOUBLE), 0.0) <= 0.2
         |          AND coalesce(CAST(n3 - d3 AS DOUBLE) / CAST(n3 AS DOUBLE), 0.0) <= 0.18
         |          AND (coalesce(n2, 0) < 20
         |               OR coalesce(CAST(top2 AS DOUBLE) / CAST(n2 AS DOUBLE), 0.0) <= 0.2)),
         |tr AS (SELECT eng.doc_id, eng.toks FROM eng JOIN rep USING (doc_id)
         |       WHERE CAST('0x' || substr(md5('graft-split:' || source), 1, 7) AS BIGINT) % 1000 >= 200),
         |c AS (SELECT doc_id, CAST(i.i AS INT) AS chunk_idx,
         |        least(CAST(32 AS BIGINT), len(toks) - i.i*24) AS n_tokens
         |      FROM tr, LATERAL (SELECT unnest(range(0,
         |        CAST(floor(CAST(greatest(len(toks) - 8 - 1, 0) AS DOUBLE) / 24.0) AS BIGINT) + 1)) AS i) i
         |      WHERE len(toks) >= 1),
         |s AS (SELECT *, CAST('0x' || substr(md5('graft-pack:' || CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) % 8 AS shard
         |      FROM c),
         |cum AS (SELECT *, sum(n_tokens) OVER (PARTITION BY shard
         |          ORDER BY doc_id, chunk_idx
         |          ROWS UNBOUNDED PRECEDING) - n_tokens AS cumb
         |        FROM s)
         |SELECT doc_id, chunk_idx, n_tokens, shard,
         |  CAST(cumb // 256 AS BIGINT) AS seq_id,
         |  CAST(cumb % 256 AS BIGINT) AS seq_offset
         |FROM cum""".stripMargin
    },

    // rank (n DESC, token ASC) is total -> identical id assignment
    "vocab_build" ->
      s"""WITH tok AS (SELECT t AS token FROM
         |  (SELECT unnest($tokensSql) AS t FROM documents) WHERE t <> ''),
         |c AS (SELECT token, count(*) AS n FROM tok GROUP BY 1
         |      HAVING count(*) >= 2)
         |SELECT token, n,
         |  CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT)
         |    AS token_id
         |FROM c QUALIFY token_id <= 24""".stripMargin,

    // same vocab CTE; ids ordered by token position (list ... ORDER
    // BY pos), OOV -> 0; sums cast to BIGINT (DuckDB sums to HUGEINT)
    "vocab_bpe" ->
      (s"WITH ${bpeCtes(k = 6, maxWords = 512)}\n" +
        (1 to 6).map(r =>
          s"""SELECT rank, sl AS "left", sr AS "right", merged, n FROM t$r""")
          .mkString("\nUNION ALL ")),

    "text_bpe_encode" ->
      (s"WITH ${bpeCtes(k = 6, maxWords = 512)},\n" +
        raw"""sym AS (
          |  SELECT doc_id, array_to_string(
          |    list_transform($tokensSql,
          |      w -> CASE WHEN w = '' THEN w
          |           ELSE regexp_replace(w, '(.)', '|\1|', 'g') END),
          |    ' ') AS s
          |  FROM documents),
          |enc AS (SELECT doc_id,""".stripMargin + "\n" +
        // unrolled rank-order fold: replace(...replace(s, t1)... , t6)
        (1 to 6).foldLeft("s") { (acc, r) =>
          s"replace($acc, (SELECT pat FROM t$r), (SELECT rep FROM t$r))"
        } + " AS bpe FROM sym)\n" +
        """SELECT doc_id, bpe,
          |  CAST((length(bpe) - length(replace(bpe, '|', ''))) / 2
          |       AS BIGINT) AS n_pieces
          |FROM enc""".stripMargin),

    "text_encode" ->
      s"""WITH d AS (SELECT doc_id,
         |             list_filter($tokensSql, t -> t <> '') AS toks
         |           FROM documents),
         |tok AS (SELECT doc_id, i.i AS pos, toks[CAST(i.i AS INT)] AS token
         |        FROM d, LATERAL (SELECT unnest(range(1, len(toks) + 1))
         |                         AS i) i),
         |allc AS (SELECT token, count(*) AS n FROM tok GROUP BY 1
         |         HAVING count(*) >= 2),
         |v AS (SELECT token,
         |        CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT)
         |          AS token_id
         |      FROM allc QUALIFY token_id <= 24),
         |enc AS (SELECT doc_id, count(*) AS n_tokens,
         |          CAST(sum(CASE WHEN v.token_id IS NULL THEN 1 ELSE 0 END)
         |               AS BIGINT) AS n_oov,
         |          array_to_string(list(CAST(coalesce(v.token_id, 0)
         |            AS VARCHAR) ORDER BY pos), ' ') AS ids
         |        FROM tok LEFT JOIN v USING (token) GROUP BY 1)
         |SELECT d0.doc_id, coalesce(n_tokens, 0) AS n_tokens,
         |  coalesce(n_oov, 0) AS n_oov, coalesce(ids, '') AS ids
         |FROM (SELECT doc_id FROM documents) d0 LEFT JOIN enc USING (doc_id)""".stripMargin,

    // parallel unnest zips the two slices; c1 counts bigram STARTS so
    // bits = floor(log2 c1) - floor(log2 c2) >= 0 is a true
    // conditional; `div`/`//` agree on the non-negative cumsum
    "text_surprisal_bigram" ->
      s"""WITH d AS (SELECT doc_id,
         |             list_filter($tokensSql, t -> t <> '') AS toks
         |           FROM documents),
         |pairs AS (SELECT doc_id,
         |            unnest(toks[1:len(toks)-1]) AS prev,
         |            unnest(toks[2:len(toks)]) AS cur
         |          FROM d WHERE len(toks) >= 2),
         |c2 AS (SELECT prev, cur, count(*) AS c2 FROM pairs GROUP BY 1, 2),
         |c1 AS (SELECT prev, count(*) AS c1 FROM pairs GROUP BY 1),
         |sc AS (SELECT doc_id, count(*) AS n_bigrams,
         |         CAST(sum((length(bin(c1)) - 1) - (length(bin(c2)) - 1))
         |              AS BIGINT) AS surprisal_bits
         |       FROM pairs JOIN c2 USING (prev, cur) JOIN c1 USING (prev)
         |       GROUP BY 1)
         |SELECT d0.doc_id, coalesce(n_bigrams, 0) AS n_bigrams,
         |  coalesce(surprisal_bits, 0) AS surprisal_bits,
         |  coalesce((surprisal_bits * 1000) // n_bigrams, 0) AS mean_millibits
         |FROM (SELECT doc_id FROM documents) d0 LEFT JOIN sc USING (doc_id)""".stripMargin,

    // the sketch side cannot appear in SQL (content is merge-order
    // dependent); the oracle pins the exact heavy set — every item
    // with count·13 > n — and the booleans the MG theorems force true
    "sketch_freqitems" ->
      s"""WITH tok AS (SELECT substr(t, 1, 1) AS item FROM
         |  (SELECT doc_id, unnest($tokensSql) AS t FROM documents)
         |  WHERE t <> ''),
         |ex AS (SELECT item, count(*) AS exact_n FROM tok GROUP BY 1),
         |n AS (SELECT CAST(sum(exact_n) AS BIGINT) AS nn FROM ex)
         |SELECT item, exact_n, true AS in_sketch, true AS within_bound
         |FROM ex, n WHERE exact_n * 13 > nn""".stripMargin,

    // idf_bits = floor(log2 N) - floor(log2 df) via length(bin(x))-1,
    // exact on both engines; rank order (score_bits DESC, term ASC)
    // is total, so the top-5 cut is deterministic
    "text_tfidf" ->
      s"""WITH d AS (SELECT doc_id, $tokensSql AS toks FROM documents),
         |tok AS (SELECT doc_id, t AS term FROM
         |          (SELECT doc_id, unnest(toks) AS t FROM d) WHERE t <> ''),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS nn FROM documents)
         |SELECT doc_id, term, tf, df,
         |  tf * ((length(bin(nn)) - 1) - (length(bin(df)) - 1)) AS score_bits,
         |  CAST(row_number() OVER (PARTITION BY doc_id
         |    ORDER BY tf * ((length(bin(nn)) - 1) - (length(bin(df)) - 1)) DESC,
         |             term) AS INT) AS rnk
         |FROM tf JOIN df USING (term) CROSS JOIN n
         |QUALIFY rnk <= 5""".stripMargin,

    // fingerprint = md5 of the whitespace-normal form (same as
    // dedup_exact's dup_key); TTR is integer millis, exact division
    "corpus_report" ->
      s"""WITH d AS (SELECT source, text,
         |             list_filter($tokensSql, t -> t <> '') AS toks
         |           FROM documents),
         |doc AS (SELECT source, count(*) AS n_docs,
         |          CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
         |          count(*) - count(DISTINCT md5(regexp_replace(
         |            lower(trim(text)), '\\s+', ' ', 'g'))) AS n_dup_docs
         |        FROM d GROUP BY 1),
         |voc AS (SELECT source, count(DISTINCT t) AS vocab
         |        FROM (SELECT source, unnest(toks) AS t FROM d) GROUP BY 1)
         |SELECT source, n_docs, n_tokens, n_dup_docs,
         |  coalesce(vocab, 0) AS vocab,
         |  coalesce((vocab * 1000) // n_tokens, 0) AS ttr_millis
         |FROM doc LEFT JOIN voc USING (source)""".stripMargin,

    "emb_project" -> {
      val cols = planeSql(8, 64).zipWithIndex.map { case (w, j) =>
        s"${dotSql("embedding", w)} AS p$j"
      }.mkString(",\n  ")
      s"SELECT vec_id AS id,\n  $cols\nFROM embeddings"
    },

    // identical floor-quotient arithmetic: per-dim global min/max,
    // code = floor((x-lo)*255/(hi-lo)) clamped — both engines compute
    // the same doubles, and floor (unlike round) ties identically
    "emb_quantize_int8" ->
      """WITH x AS (SELECT vec_id AS id, i.i AS i,
        |    CAST(embedding[i.i] AS DOUBLE) AS x
        |  FROM embeddings, LATERAL (SELECT unnest(range(1, 65)) AS i) i),
        |st AS (SELECT i, min(x) AS lo, max(x) AS hi FROM x GROUP BY 1),
        |c AS (SELECT id, x.i,
        |  CASE WHEN hi = lo THEN 0
        |       ELSE least(255, greatest(0,
        |         CAST(floor((x - lo) * 255.0 / (hi - lo)) AS INT))) END AS c
        |  FROM x JOIN st USING (i))
        |SELECT id,
        |  string_agg(CAST(c AS VARCHAR), ' ' ORDER BY i) AS codes,
        |  CAST(min(c) AS INT) AS code_min,
        |  CAST(max(c) AS INT) AS code_max
        |FROM c GROUP BY id""".stripMargin,

    // window=32, overlap=8, stride=24 — constants mirrored from the
    // Spark call; chunk count = floor((n - overlap - 1)/stride) + 1
    "text_chunk" ->
      s"""WITH d AS (SELECT doc_id, $tokensSql AS toks FROM documents),
         |c AS (SELECT doc_id, toks, len(toks) AS n, i.i AS i
         |      FROM d, LATERAL (SELECT unnest(range(0,
         |        CAST(floor(CAST(greatest(len(toks) - 8 - 1, 0) AS DOUBLE) / 24.0) AS BIGINT) + 1)) AS i) i
         |      WHERE len(toks) >= 1)
         |SELECT doc_id, CAST(i AS INT) AS chunk_idx,
         |  array_to_string(toks[CAST(i*24+1 AS INT) : CAST(i*24+32 AS INT)], ' ') AS chunk_text,
         |  least(CAST(32 AS BIGINT), n - i*24) AS n_tokens
         |FROM c""".stripMargin,

    // disjoint 16-token spans (stride = window); ownership tie-break
    // (doc_id, chunk_idx) mirrors Spark's min(struct(..)); the span is
    // hashed to the same 15-hex md5 prefix long before grouping
    "text_span_dedup" ->
      s"""WITH d AS (SELECT doc_id, $tokensSql AS toks FROM documents),
         |ch AS (SELECT doc_id, CAST(i.i AS INT) AS chunk_idx,
         |    array_to_string(toks[CAST(i.i*16+1 AS INT) : CAST(i.i*16+16 AS INT)], ' ') AS chunk_text
         |  FROM d, LATERAL (SELECT unnest(range(0,
         |    CAST(floor(CAST(greatest(len(toks) - 1, 0) AS DOUBLE) / 16.0) AS BIGINT) + 1)) AS i) i
         |  WHERE len(toks) >= 1),
         |h AS (SELECT doc_id, chunk_idx, chunk_text,
         |    CAST('0x' || substr(md5(chunk_text), 1, 15) AS BIGINT) AS hh FROM ch),
         |own AS (SELECT hh, doc_id AS od, chunk_idx AS oi FROM h
         |  QUALIFY row_number() OVER (PARTITION BY hh
         |    ORDER BY doc_id, chunk_idx) = 1),
         |k AS (SELECT h.doc_id, h.chunk_idx, h.chunk_text,
         |    (h.doc_id = o.od AND h.chunk_idx = o.oi) AS keep
         |  FROM h JOIN own o USING (hh))
         |SELECT doc_id, count(*) AS n_chunks,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  string_agg(CASE WHEN keep THEN chunk_text END, ' '
         |    ORDER BY chunk_idx) AS text_kept
         |FROM k GROUP BY doc_id""".stripMargin,

    "text_stats" ->
      (s"""WITH d AS (SELECT doc_id, text, $tokensSql AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS INT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS INT) AS n_bpeish,
        |  CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE) /
        |    CAST(length(text) AS DOUBLE) AS punct_ratio,
        |  CAST(${stopContains("toks")} AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
        |  CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) /
        |    CAST(len(toks) AS DOUBLE) AS mean_word_len,
        |  $qualitySql AS quality
        |FROM d""".stripMargin),

    "text_langid" -> {
      val en = langScoreSql(Seq("the", "and", "of", "is"))
      val de = langScoreSql(Seq("der", "die", "und", "ist"))
      val fr = langScoreSql(Seq("le", "la", "et", "est"))
      val es = langScoreSql(Seq("el", "los", "y", "es"))
      s"""WITH d AS (SELECT doc_id, lang, $tokensSql AS toks FROM documents)
        |SELECT doc_id, lang,
        |  CASE WHEN $en >= $de AND $en >= $fr AND $en >= $es THEN 'en'
        |       WHEN $de >= $fr AND $de >= $es THEN 'de'
        |       WHEN $fr >= $es THEN 'fr'
        |       ELSE 'es' END AS lang_pred
        |FROM d""".stripMargin
    },

    // the same synthesis and the same canonicalization algorithm,
    // step for step, in DuckDB (regexp_extract groups, list filter/
    // sort, strpos-based query split)
    "text_url_canonical" ->
      """WITH u AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'HTTPS' END) ||
        |  '://WWW.Site' || CAST(doc_id % 7 AS VARCHAR) || '.COM' ||
        |  (CASE WHEN doc_id % 4 = 0 THEN ':80'
        |        WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END) ||
        |  '/Dir' || CAST(doc_id % 9 AS VARCHAR) || '/Page' ||
        |  (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) ||
        |  (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&b=' ||
        |          CAST(doc_id % 5 AS VARCHAR) || '&a=1'
        |        WHEN doc_id % 3 = 1 THEN '?z=9&fbclid=track&y=2'
        |        ELSE '' END) ||
        |  (CASE WHEN doc_id % 6 = 0 THEN '#section' ELSE '' END)
        |  AS url FROM documents),
        |parts AS (SELECT doc_id, url,
        |  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
        |    AS scheme,
        |  lower(regexp_extract(url,
        |    '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport,
        |  regexp_extract(url,
        |    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1) AS rest
        |FROM u),
        |norm AS (SELECT doc_id, url, scheme,
        |  CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
        |       WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
        |       ELSE hostport END AS host,
        |  CASE WHEN strpos(rest, '?') > 0
        |       THEN substr(rest, 1, strpos(rest, '?') - 1)
        |       ELSE rest END AS path0,
        |  CASE WHEN strpos(rest, '?') > 0
        |       THEN substr(rest, strpos(rest, '?') + 1) ELSE '' END AS q0
        |FROM parts),
        |qn AS (SELECT doc_id, url, scheme, host, path0,
        |  array_to_string(list_sort(list_filter(string_split(q0, '&'),
        |    p -> NOT regexp_matches(p,
        |      '^(utm_[A-Za-z0-9]+|fbclid|gclid)=') AND p <> '')), '&')
        |    AS qnorm
        |FROM norm)
        |SELECT doc_id, url,
        |  scheme || '://' || host ||
        |  (CASE WHEN regexp_replace(path0, '/+$', '') = '' THEN '/'
        |        ELSE regexp_replace(path0, '/+$', '') END) ||
        |  (CASE WHEN qnorm <> '' THEN '?' || qnorm ELSE '' END)
        |    AS canonical_url,
        |  host
        |FROM qn""".stripMargin,

    // integer-exact Gopher gate: every rule is multiply-compare on
    // BIGINTs, so fail_mask/keep hash identically; stop list matches
    // TextAnalysis.Stopwords, alpha check is the same one-class regex
    "text_gopher_rules" -> {
      val stops = graft.ext.TextAnalysis.Stopwords
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH d AS (SELECT doc_id, text, $tokensSql AS toks FROM documents),
        |f AS (SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_words,
        |  CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT)
        |    AS sum_word_len,
        |  CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))
        |    AS BIGINT) AS n_alpha_words,
        |  CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) +
        |    CAST((length(text) - length(replace(text, '...', ''))) // 3
        |      AS BIGINT) AS n_symbols,
        |  CAST(len(list_filter(toks, t -> list_contains($stops, lower(t))))
        |    AS BIGINT) AS n_stop
        |FROM d)
        |SELECT doc_id, n_words, sum_word_len, n_alpha_words, n_symbols,
        |  n_stop,
        |  CAST((CASE WHEN n_words < 25 OR n_words > 100000 THEN 1 ELSE 0 END)
        |    + (CASE WHEN sum_word_len < 3 * n_words
        |            OR sum_word_len > 10 * n_words THEN 2 ELSE 0 END)
        |    + (CASE WHEN 10 * n_symbols >= n_words THEN 4 ELSE 0 END)
        |    + (CASE WHEN 5 * n_alpha_words <= 4 * n_words THEN 8 ELSE 0 END)
        |    + (CASE WHEN n_stop < 2 THEN 16 ELSE 0 END) AS INT) AS fail_mask,
        |  ((CASE WHEN n_words < 25 OR n_words > 100000 THEN 1 ELSE 0 END)
        |    + (CASE WHEN sum_word_len < 3 * n_words
        |            OR sum_word_len > 10 * n_words THEN 2 ELSE 0 END)
        |    + (CASE WHEN 10 * n_symbols >= n_words THEN 4 ELSE 0 END)
        |    + (CASE WHEN 5 * n_alpha_words <= 4 * n_words THEN 8 ELSE 0 END)
        |    + (CASE WHEN n_stop < 2 THEN 16 ELSE 0 END)) = 0 AS keep
        |FROM f""".stripMargin
    },

    // Gopher keep flag re-derived as the training label; logs in
    // integer eighth-bits (TextAnalysis.qlog8: msb via binary length
    // + top-4-bit interpolation, pure integer ops on both engines)
    "text_nb_quality" -> {
      val stops = graft.ext.TextAnalysis.Stopwords
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH d AS (SELECT doc_id, text, $tokensSql AS toks FROM documents),
        |f AS (SELECT doc_id, toks,
        |  CAST(len(toks) AS BIGINT) AS n_words,
        |  CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT)
        |    AS sum_word_len,
        |  CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))
        |    AS BIGINT) AS n_alpha_words,
        |  CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) +
        |    CAST((length(text) - length(replace(text, '...', ''))) // 3
        |      AS BIGINT) AS n_symbols,
        |  CAST(len(list_filter(toks, t -> list_contains($stops, lower(t))))
        |    AS BIGINT) AS n_stop
        |FROM d),
        |lab AS (SELECT doc_id, toks,
        |  ((CASE WHEN n_words < 25 OR n_words > 100000 THEN 1 ELSE 0 END)
        |   + (CASE WHEN sum_word_len < 3 * n_words
        |           OR sum_word_len > 10 * n_words THEN 2 ELSE 0 END)
        |   + (CASE WHEN 10 * n_symbols >= n_words THEN 4 ELSE 0 END)
        |   + (CASE WHEN 5 * n_alpha_words <= 4 * n_words THEN 8 ELSE 0 END)
        |   + (CASE WHEN n_stop < 2 THEN 16 ELSE 0 END)) = 0 AS y
        |FROM f),
        |tok AS (SELECT doc_id, y, t
        |  FROM (SELECT doc_id, y, unnest(toks) AS t FROM lab)
        |  WHERE t <> ''),
        |cnt AS (SELECT t,
        |  CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS cp,
        |  CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS cf
        |  FROM tok GROUP BY t),
        |tot AS (SELECT CAST(sum(cp) AS BIGINT) AS tp,
        |  CAST(sum(cf) AS BIGINT) AS tf, count(*) AS v FROM cnt),
        |pri AS (SELECT
        |  CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS np,
        |  CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS nf
        |  FROM lab),
        |sc AS (SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(${qlog8Sql("cp + 1")} - ${qlog8Sql("cf + 1")}
        |    + (${qlog8Sql("tf + v")} - ${qlog8Sql("tp + v")}))
        |    AS BIGINT) AS s
        |  FROM tok JOIN cnt USING (t) CROSS JOIN tot GROUP BY doc_id)
        |SELECT l.doc_id, l.y AS label_pass,
        |  coalesce(sc.n_tokens, 0) AS n_tokens,
        |  CAST(coalesce(sc.s, 0)
        |    + (${qlog8Sql("np + 1")} - ${qlog8Sql("nf + 1")})
        |    AS BIGINT) AS nb_q8,
        |  (coalesce(sc.s, 0)
        |    + (${qlog8Sql("np + 1")} - ${qlog8Sql("nf + 1")})) > 0
        |    AS pred_pass
        |FROM lab l LEFT JOIN sc USING (doc_id) CROSS JOIN pri""".stripMargin
    },

    "text_ngram_freq" ->
      (s"""WITH $shingleCte,
        |grams AS (SELECT lang, unnest(s) AS gram FROM sh),
        |counts AS (SELECT lang, gram, count(*) AS n FROM grams GROUP BY 1, 2)
        |SELECT lang, gram, n,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, gram) AS INT) AS rnk
        |FROM counts
        |QUALIFY row_number() OVER (PARTITION BY lang ORDER BY n DESC, gram) <= 5""".stripMargin),

    // plain (non-interpolated) string: regex backslashes stay literal
    "text_redact_pii" ->
      """WITH enr AS (
        |  SELECT doc_id, lang,
        |    text ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
        |    CASE WHEN doc_id % 4 = 0 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN ' see https://ex.com/d/' || CAST(doc_id AS VARCHAR) ELSE '' END AS t
        |  FROM documents)
        |SELECT doc_id, lang,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '\+1-555-[0-9]{4}')) AS INT) AS n_phones,
        |  CAST(len(regexp_extract_all(t, 'https?://[A-Za-z0-9./_-]+')) AS INT) AS n_urls,
        |  md5(regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
        |    'https?://[A-Za-z0-9./_-]+', '<URL>', 'g')) AS redacted_md5
        |FROM enr""".stripMargin,

    // shares/default/salt mirror the Spark call; rate arithmetic is
    // (CASE share) * total / n left-to-right, clamped, floored at 1e-6
    // divide -> sqrt -> multiply on exact integers: every step
    // correctly rounded, identical on both engines; 15 hex chars =
    // the 60-bit hash the Spark side thins with (bias ~4e-13)
    "sample_temperature" ->
      """WITH c AS (SELECT lang AS st, count(*) AS n FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN c ON c.st = d.lang CROSS JOIN tot
        |WHERE CAST('0x' || substr(md5('graft-temp:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000
        |  < CAST(floor(least(1.0,
        |      0.1 * sqrt(CAST(total AS DOUBLE) / CAST(n AS DOUBLE))) * 1000000.0) AS BIGINT)""".stripMargin,

    "sample_domain_mix" ->
      """WITH c AS (SELECT source AS st, count(*) AS n FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN c ON c.st = d.source CROSS JOIN tot
        |WHERE CAST('0x' || substr(md5('graft-mix:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000
        |  < CAST(floor(least(1.0,
        |      CASE d.source WHEN 'src0' THEN 0.2 WHEN 'src1' THEN 0.1
        |                    WHEN 'src2' THEN 0.02 ELSE 0.01 END
        |      * CAST(total AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT)""".stripMargin,

    "sample_hash_stratified" ->
      """SELECT doc_id, lang
        |FROM documents
        |WHERE CAST('0x' || substr(md5('graft-sample:' || CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) % 100
        |  < CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 25 WHEN 'fr' THEN 40 ELSE 60 END""".stripMargin,

    "dedup_incremental" ->
      s"""WITH d AS (SELECT doc_id,
        |  md5(substr(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), 1, 40)) AS fp
        |  FROM documents),
        |hist AS (SELECT DISTINCT fp FROM d WHERE doc_id % 2 = 0),
        |batch AS (SELECT doc_id, fp FROM d WHERE doc_id % 2 = 1
        |          QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1)
        |SELECT doc_id, fp FROM batch
        |WHERE NOT EXISTS (SELECT 1 FROM hist WHERE hist.fp = batch.fp)""".stripMargin,

    // the Bloom prefilter is exact (verify join removes false
    // positives, false negatives impossible), so the oracle IS the
    // plain anti join — same contract as join_salted's plain-join
    // oracle
    "dedup_incremental_bloom" ->
      s"""WITH d AS (SELECT doc_id,
        |  md5(substr(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), 1, 40)) AS fp
        |  FROM documents),
        |hist AS (SELECT DISTINCT fp FROM d WHERE doc_id % 2 = 0),
        |batch AS (SELECT doc_id, fp FROM d WHERE doc_id % 2 = 1
        |          QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1)
        |SELECT doc_id, fp FROM batch
        |WHERE NOT EXISTS (SELECT 1 FROM hist WHERE hist.fp = batch.fp)""".stripMargin,

    "curate_corpus" -> {
      val en = langScoreSql(Seq("the", "and", "of", "is"))
      val de = langScoreSql(Seq("der", "die", "und", "ist"))
      val fr = langScoreSql(Seq("le", "la", "et", "est"))
      val es = langScoreSql(Seq("el", "los", "y", "es"))
      s"""WITH capped AS (SELECT doc_id, lang, substr(text, 1, 20000) AS text
        |           FROM documents),
        |d AS (SELECT doc_id, lang, text, $tokensSql AS toks FROM capped),
        |scored AS (
        |  SELECT doc_id, lang, text,
        |    $qualitySql AS quality,
        |    CASE WHEN $en >= $de AND $en >= $fr AND $en >= $es THEN 'en'
        |         WHEN $de >= $fr AND $de >= $es THEN 'de'
        |         WHEN $fr >= $es THEN 'fr' ELSE 'es' END AS pred,
        |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
        |  FROM d),
        |kept AS (SELECT * FROM scored WHERE pred = lang AND quality >= 0.45),
        |ded AS (SELECT * FROM kept
        |        QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1)
        |SELECT doc_id, lang, quality,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\\+1-555-[0-9]{4}', '<PHONE>', 'g'),
        |    'https?://[A-Za-z0-9./_-]+', '<URL>', 'g')) AS redacted_md5
        |FROM ded
        |WHERE CAST('0x' || substr(md5('graft-sample:' || CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) % 100 < 50""".stripMargin
    },

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

    "sample_weighted_quality" ->
      (s"""WITH d AS (SELECT doc_id, lang, text, $tokensSql AS toks FROM documents),
        |q AS (SELECT doc_id, lang, $qualitySql AS quality
        |FROM d)
        |SELECT doc_id, lang, quality FROM q
        |WHERE CAST('0x' || substr(md5('graft-wq:' || CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) % 100
        |  < CAST(floor(quality * 100) AS BIGINT)""".stripMargin),

    "sample_fixed_stratified" ->
      """SELECT doc_id, lang FROM documents
        |QUALIFY row_number() OVER (PARTITION BY lang
        |  ORDER BY CAST('0x' || substr(md5('graft-fix:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT),
        |           doc_id) <= 20""".stripMargin,

    // Carter–Wegman bucket ((a·x + b) mod 2^31−1) mod width, written
    // identically to CountMin.bucket — integer-only, no digest. The
    // per-row (a, b) literals below are CountMin.rowConsts(3)
    // (splitmix64 of the row index), interpolated so both engines hash
    // with the same genuinely independent rows.
    "sketch_countmin" -> {
      val consts = graft.ext.CountMin.rowConsts(3)
        .zipWithIndex
        .map { case ((a, b), j) => s"($j, $a, $b)" }
        .mkString(", ")
      s"""WITH consts(seed, a, b) AS (VALUES $consts),
        |cells AS (
        |  SELECT c.seed,
        |    ((c.a * (l_partkey % 2147483647) + c.b) % 2147483647) % 1024 AS bkt,
        |    count(*) AS n
        |  FROM lineitem CROSS JOIN consts c
        |  GROUP BY 1, 2),
        |exact AS (
        |  SELECT l_partkey AS item, count(*) AS exact_n
        |  FROM lineitem GROUP BY 1
        |  QUALIFY row_number() OVER (ORDER BY count(*) DESC, l_partkey) <= 10),
        |est AS (
        |  SELECT e.item, e.exact_n, min(cl.n) AS cms_n
        |  FROM exact e CROSS JOIN consts c
        |  JOIN cells cl ON cl.seed = c.seed
        |    AND cl.bkt = ((c.a * (e.item % 2147483647) + c.b) % 2147483647) % 1024
        |  GROUP BY 1, 2)
        |SELECT item, exact_n, cms_n, cms_n >= exact_n AS never_under FROM est""".stripMargin
    },

    // 2 unrolled Lloyd iterations; the fixed-point centroid update
    // (exact BIGINT sums) is what makes the float-free parts exact and
    // the cosine folds bit-identical to the Spark side
    "emb_kmeans" ->
      (s"""WITH cent0 AS (SELECT vec_id AS cid, embedding AS cv
        |              FROM embeddings ORDER BY vec_id LIMIT 8),
        |a1 AS (
        |  SELECT e.vec_id, e.embedding AS ev, c.cid
        |  FROM embeddings e CROSS JOIN cent0 c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.cid) = 1),
        |dims AS (
        |  SELECT cid, generate_subscripts(ev, 1) AS i,
        |    unnest(list_transform(ev,
        |      v -> CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT))) AS qv
        |  FROM a1),
        |sums AS (SELECT cid, i, sum(qv) AS s, count(*) AS n FROM dims GROUP BY 1, 2),
        |cent1 AS (
        |  SELECT cid, list((CAST(s AS DOUBLE) / n) / 1000000.0 ORDER BY i) AS cv
        |  FROM sums GROUP BY cid),
        |a2 AS (
        |  SELECT e.vec_id, c.cid
        |  FROM embeddings e CROSS JOIN cent1 c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.cid) = 1)
        |SELECT cid, count(*) AS n_members, CAST(sum(vec_id) AS BIGINT) AS id_checksum
        |FROM a2 GROUP BY cid""".stripMargin),

    "agg_histogram" ->
      """SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1""".stripMargin,

    "text_fingerprint" ->
      """WITH d AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks
        |           FROM documents)
        |SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  list_min(list_transform(
        |    CASE WHEN len(toks) >= 3
        |      THEN list_transform(range(1, len(toks) - 1),
        |             i -> toks[i] || '_' || toks[i+1] || '_' || toks[i+2])
        |      ELSE [] END,
        |    s -> md5(s))) AS min_shingle_fp
        |FROM d""".stripMargin,

    "ew_tumbling" ->
      (s"""WITH $evtCte
        |SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM evts GROUP BY 1, 2""".stripMargin),

    // ISO Monday week truncation on both engines; calendar-day
    // difference // 7 mirrors Spark's DST-proof datediff form
    "ew_retention" ->
      (s"""WITH $evtCte,
        |act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w
        |        FROM evts),
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
        |       FROM evts),
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

    "dedup_editdist" ->
      """SELECT a.p_brand, a.p_type, a.p_partkey AS id_a,
        |  b.p_partkey AS id_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_type = b.p_type
        |     AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 2""".stripMargin,

    "sim_sql_cosine" ->
      (s"""SELECT vec_id,
        |  ${dotSql("embedding", "embedding")} AS dot_self,
        |  ${normSql("embedding")} AS nrm
        |FROM embeddings""".stripMargin),

    "mm_thumbnail" ->
      """WITH f AS (SELECT doc_id,
        |  CAST(CAST('0x' || substr(md5(text), 1, 7) AS BIGINT) % 1024 AS INT) AS width,
        |  CAST(CAST('0x' || substr(md5(text), 8, 7) AS BIGINT) % 768 AS INT) AS height,
        |  CAST(octet_length(encode(text)) % 30 + 1 AS INT) AS n_frames
        |FROM documents),
        |s AS (SELECT *, CAST(least(
        |        floor(128000000 / greatest(width, 1)),
        |        floor(96000000 / greatest(height, 1)),
        |        1000000) AS BIGINT) AS scale
        |      FROM f)
        |SELECT doc_id, width, height,
        |  CAST(greatest(floor(width * scale / 1000000), 1) AS INT) AS thumb_w,
        |  CAST(greatest(floor(height * scale / 1000000), 1) AS INT) AS thumb_h,
        |  CAST(len(range(0, n_frames, 5)) AS INT) AS n_sampled
        |FROM s""".stripMargin,

    "mm_decode" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  md5(text) AS fp,
        |  'raw' AS format,
        |  CAST(CAST('0x' || substr(md5(text), 1, 7) AS BIGINT) % 1024 AS INT) AS width,
        |  CAST(CAST('0x' || substr(md5(text), 8, 7) AS BIGINT) % 768 AS INT) AS height,
        |  CAST(octet_length(encode(text)) % 30 + 1 AS INT) AS n_frames
        |FROM documents""".stripMargin,

    // closed-form dims: if the Spark side's header synthesis or the
    // byte-level parser is wrong in either direction, these diverge
    "mm_decode_image" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'png'
        |       WHEN 1 THEN 'gif' WHEN 2 THEN 'bmp' ELSE 'jpeg' END AS format,
        |  CAST(doc_id % 1024 + 1 AS INT) AS width,
        |  CAST(doc_id % 768 + 1 AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 4 = 1 THEN doc_id % 5 + 1 ELSE 1 END
        |       AS INT) AS n_frames
        |FROM documents""".stripMargin,

    "mm_decode_audio" ->
      """SELECT doc_id, 'wav' AS format,
        |  CAST(doc_id % 2 + 1 AS INT) AS channels,
        |  CAST((doc_id % 3 + 1) * 8000 AS INT) AS sample_rate,
        |  CAST(16 AS INT) AS bits_per_sample,
        |  CAST(doc_id % 100 + 1 AS BIGINT) AS n_samples,
        |  CAST((doc_id % 100 + 1) * 1000 // ((doc_id % 3 + 1) * 8000)
        |       AS BIGINT) AS duration_ms
        |FROM documents""".stripMargin,

    // closed-form recomputation of the synthesized MP4's facts:
    // byte_len = ftyp(16) + moov header(8) + mvhd(108) + 8 per trak
    "mm_decode_video" ->
      """SELECT doc_id,
        |  CAST(132 + 8 * (doc_id % 3 + 1) AS BIGINT) AS byte_len,
        |  'mp4' AS format,
        |  CAST(doc_id % 3 + 1 AS INT) AS n_tracks,
        |  CAST((doc_id % 3 + 1) * 600 AS BIGINT) AS timescale,
        |  CAST((doc_id * 7) % 36000 + 600 AS BIGINT) AS duration_ticks,
        |  CAST(((doc_id * 7) % 36000 + 600) * 1000
        |       // ((doc_id % 3 + 1) * 600) AS BIGINT) AS duration_ms,
        |  CAST((((doc_id * 7) % 36000 + 600) * 1000
        |       // ((doc_id % 3 + 1) * 600)) // 1000 + 1
        |       AS BIGINT) AS n_sampled_1hz
        |FROM documents""".stripMargin)
}
