package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext._
import graft.ops.Dedup
import graft.sources.Tables
import graft.queries.ExtensionSupport._

/** Deduplication query surface: exact, MinHash-LSH, SimHash,
  * n-gram Jaccard, substring winnowing, embedding-cosine, semantic,
  * and incremental dedup, each mirrored by a DuckDB oracle.
  *
  * Split from the one-file registry by family (round 9); entries and
  * oracle SQL are byte-identical to the pre-split registry.
  */
private[queries] object DedupQueries {

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
        TextAnalysis.shingleHashes(col("text"), 2, hexLen = 8),
        numHashes = 12, bands = 4)
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
          DedupOps.simhashDoc(col("text"), 60).as("simhash"))
    },


    "dedup_simhash_pairs" -> { (s, dir) =>
      val sims = docs(s, dir)
        .select(col("doc_id"),
          DedupOps.simhashDoc(col("text"), 60).as("simhash"))
      DedupOps.simhashBandPairs(sims, col("doc_id"), col("simhash"),
        bands = 4, bitsPerBand = 15, maxHamming = 3, bits = 60)
    },


    // Both shingle-set measures finish from the SHARED shingle_pairs
    // stage (one inverted-index build, two consumers) — the
    // build-once/fan-out lifecycle; the index plan itself stays
    // auditable via the stage build and DedupOpsSpec.
    "dedup_ngram_jaccard" -> { (s, dir) =>
      DedupOps.jaccardFromIntersections(shinglePairs(s, dir),
        threshold = 0.1)
    },


    // Asymmetric containment |A∩B|/|A| over the same inverted index —
    // the quote/subset detector: a short doc fully embedded in a long
    // one scores ~1 from its own side while its Jaccard stays tiny.
    // Decontamination and boilerplate-license removal filter on THIS,
    // not Jaccard.
    "dedup_containment" -> { (s, dir) =>
      DedupOps.containmentFromIntersections(shinglePairs(s, dir),
        threshold = 0.5)
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
    // (brand, type), with the default maxBlock governor dropping any
    // degenerate block whole (never engages on the fixtures — max
    // block is ~20 parts — but the oracle carries the predicate so
    // the two engines agree on exactly the input where it would).
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
      Similarity.semanticDedupWith(kmeans8Labels(s, dir), emb(s, dir),
        col("id"), col("vec"), threshold = 0.25)
    },


    // Incremental (production) dedup: a new batch first dedups within
    // itself, then anti-joins the historical fingerprint store — the
    // shape of every periodic crawl ingest. The store side carries
    // ONLY (fp) through the shuffle; at 100 TB history the anti join
    // is the bloom-prunable hash join Spark's AQE runtime filters
    // accelerate. Fingerprint = 40-char normalized prefix (boilerplate
    // key), coarse enough that collisions actually occur.
    "dedup_incremental" -> { (s, dir) =>
      // fingerprints come from the materialized incr_fp STORE (the
      // production shape: the history store is a saved table, and a
      // batch's fingerprints are computed once at ingest, not
      // re-derived from raw text by every consumer)
      val d = incrFp(s, dir)
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
      // same materialized fingerprint store as dedup_incremental,
      // plus the cached epoch filter (incrBloomWords): the production
      // lifecycle builds the Bloom mask once per history epoch and
      // hands it to every batch. keepFirstPerKey runs AFTER the
      // filtered anti — the two commute (both act per fp-group:
      // the anti drops whole groups, the window reduces within one),
      // and this order pays the window shuffle once instead of once
      // per probe branch. Result is identical either way, which is
      // why the oracle is unchanged.
      val d = incrFp(s, dir)
      val hist = d.filter(col("doc_id") % 2 === 0)
      val batch = d.filter(col("doc_id") % 2 =!= 0)
      DedupOps.keepFirstPerKey(
        DedupOps.bloomFilteredAnti(batch, hist.select("fp").distinct(),
          "fp", prebuilt = Some(incrBloomWords(s, dir))),
        col("fp"), col("doc_id"))
        .select("doc_id", "fp")
    },
  )

  val oracleSql: Map[String, String] = Map(

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


    // signature recomputed from raw text, then BRUTE-FORCE all-pairs
    // hamming — not the band join (round-17 oracle strengthening):
    // maxHamming (3) ≤ bands−1 (3), so pigeonhole makes the banded
    // result EQUAL the blocking-free set; the oracle verifies that
    // guarantee instead of replaying the blocking
    "dedup_simhash_pairs" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
        |             FROM documents),
        |h AS (SELECT doc_id, CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) AS h FROM tok),
        |bits AS (SELECT doc_id, j,
        |           CASE WHEN sum(((h >> j) % 2) * 2 - 1) > 0
        |                THEN (CAST(1 AS BIGINT) << j) ELSE 0 END AS bit
        |         FROM h, unnest(range(0, 60)) AS u(j) GROUP BY doc_id, j),
        |sh AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS simhash FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b2.doc_id AS id_b,
        |       CAST(bit_count(xor(a.simhash, b2.simhash)) AS INT) AS hamming
        |FROM sh a JOIN sh b2 ON a.doc_id < b2.doc_id
        |WHERE bit_count(xor(a.simhash, b2.simhash)) <= 3""".stripMargin,


    // shingle sets kept as EXACT strings (r18 audit): the Spark side
    // intersects 60-bit md5-prefix hashes for shuffle width, but the
    // output exposes no hash, so the oracle owes hashing-free ground
    // truth — a collision inflating an intersection (or pushing a
    // shingle over the df cap) now FAILS parity instead of mirroring
    "dedup_ngram_jaccard" ->
      (s"""WITH $shingleCte,
        |e0 AS (SELECT lang, source, doc_id,
        |         unnest(list_distinct(s)) AS sh
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


    // same index CTEs as dedup_ngram_jaccard (exact shingle strings,
    // r18 audit); only the finishing ratio differs (per-side division
    // instead of union division)
    "dedup_containment" ->
      (s"""WITH $shingleCte,
        |e0 AS (SELECT lang, source, doc_id,
        |         unnest(list_distinct(s)) AS sh
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
        |  CAST(i AS DOUBLE) / CAST(sa.n AS DOUBLE) AS cont_a_in_b,
        |  CAST(i AS DOUBLE) / CAST(sb.n AS DOUBLE) AS cont_b_in_a
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE greatest(CAST(i AS DOUBLE) / CAST(sa.n AS DOUBLE),
        |               CAST(i AS DOUBLE) / CAST(sb.n AS DOUBLE)) >= 0.5""".stripMargin),


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
        |              FROM embeddings
        |              WHERE (${normSql("embedding")}) > 0
        |              ORDER BY vec_id LIMIT 8),
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


    "dedup_editdist" ->
      """WITH sized AS (
        |  SELECT p_brand, p_type, p_partkey, p_name,
        |    count(*) OVER (PARTITION BY p_brand, p_type) AS bsz
        |  FROM part)
        |SELECT a.p_brand, a.p_type, a.p_partkey AS id_a,
        |  b.p_partkey AS id_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        |FROM sized a JOIN sized b
        |  ON a.p_brand = b.p_brand AND a.p_type = b.p_type
        |     AND a.p_partkey < b.p_partkey
        |WHERE a.bsz <= 256 AND levenshtein(a.p_name, b.p_name) <= 2""".stripMargin,
  )
}
