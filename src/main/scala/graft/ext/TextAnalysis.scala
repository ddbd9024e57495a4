package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization,
  * quality scoring, language-ID heuristics, fingerprinting. All pure
  * Catalyst expressions (codegen'd, no UDFs) so they run inside
  * WholeStageCodegen over 100 TB of documents and push no extra
  * shuffles into the plan.
  */
object TextAnalysis {

  /** Whitespace-collapsed, lowercased, trimmed normal form. */
  def normalize(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Unicode NFC canonical composition (UAX #15) via the native
    * codegen expression — run BEFORE any hash-keyed operation:
    * decomposed "e"+U+0301 and composed U+00E9 are byte-different,
    * so unnormalized multi-source text silently defeats exact dedup,
    * MinHash shingles, and URL keys. Map-only; already-NFC rows take
    * a scan-only fast path (no allocation).
    */
  def nfcNormalize(c: Column): Column =
    org.apache.spark.sql.graft.UnicodeColumns.nfc_normalize(c)

  /** Whitespace tokens. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword pieces: letter runs, single digits, or single
    * non-alphanumeric marks — a deterministic stand-in for a real BPE
    * vocab (the regex is the public GPT-2 pre-tokenizer shape).
    */
  def bpeishCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Ratio of punctuation (non-alphanumeric, non-space) characters.
    * Empty text scores 0.0 — an unguarded 0/0 would throw under
    * Spark 4's default ANSI mode the moment a scraped corpus
    * delivers its first empty document.
    */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0)).otherwise(
      length(regexp_replace(c, "[A-Za-z0-9 ]", "")).cast("double") /
        length(c).cast("double"))

  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Fraction of tokens that are common-word stopwords — high values
    * indicate natural prose, near-zero indicates tables/code/noise.
    */
  def stopwordRatio(c: Column): Column = {
    val stops = array(Stopwords.map(lit): _*)
    size(filter(tokens(c), t => array_contains(stops, t))).cast("double") /
      size(tokens(c)).cast("double")
  }

  def meanWordLen(c: Column): Column =
    aggregate(transform(tokens(c), t => length(t)), lit(0),
      (acc, x) => acc + x).cast("double") / size(tokens(c)).cast("double")

  /** Giant-document guard — the skew cap every production curation
    * pipeline runs before its per-document stages: replaces `textCol`
    * with its first `maxChars` characters and adds a `doc_truncated`
    * flag. Downstream per-doc work (tokenize/regex/shingle/winnow) is
    * then O(maxChars) per row, so one book-length outlier cannot turn
    * a map stage into a single-task straggler; the flag keeps the cut
    * auditable (count it, or route flagged docs to a long-doc path).
    * Truncation is by character, mirrored in SQL as
    * `substr(text, 1, maxChars)`.
    */
  def capDocLength(df: DataFrame, textCol: String,
                   maxChars: Int): DataFrame = {
    require(maxChars >= 1, "maxChars must be positive")
    df.withColumn("doc_truncated", length(col(textCol)) > maxChars)
      .withColumn(textCol, substring(col(textCol), 1, maxChars))
  }

  /** Composite quality score in [0,1]: prose-likeness (stopwords),
    * low punctuation noise, and enough-but-bounded length.
    */
  def qualityScore(c: Column): Column =
    org.apache.spark.sql.graft.TextStatsColumns.quality_score(c)

  /** The declarative composition [[qualityScore]] fuses — kept as the
    * executable spec of the native kernel (ExtSpec pins bit parity).
    */
  def qualityScoreColumns(c: Column): Column =
    stopwordRatio(c) * lit(0.5) +
      (lit(1.0) - punctRatio(c)) * lit(0.3) +
      least(tokenCount(c).cast("double") / lit(100.0), lit(1.0)) * lit(0.2)

  /** Language marker words (tiny n-gram/stopword heuristic). Order of
    * the tie-break chain is part of the contract: en > de > fr > es.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "die", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "est"),
    "es" -> Seq("el", "los", "y", "es"))

  def langScore(c: Column, markers: Seq[String]): Column = {
    val m = array(markers.map(lit): _*)
    size(filter(tokens(c), t => array_contains(m, t)))
  }

  /** Predicted language = argmax marker count with the fixed
    * tie-break order above. NULL text predicts "es": the when-cascade
    * spec falls through every NULL comparison to its otherwise()
    * branch (and the DuckDB oracle's CASE does the same), so the
    * null-propagating native kernel takes a coalesce to match.
    */
  def langId(c: Column): Column =
    coalesce(org.apache.spark.sql.graft.TextStatsColumns.lang_id(c),
      lit("es"))

  /** The declarative composition [[langId]] fuses (four interpreted
    * marker scans) — kept as the executable spec of the native kernel
    * (ExtSpec pins parity, including the tie chain).
    */
  def langIdColumns(c: Column): Column = {
    val scores = LangMarkers.map { case (l, m) => l -> langScore(c, m) }.toMap
    when(scores("en") >= scores("de") && scores("en") >= scores("fr") &&
      scores("en") >= scores("es"), "en")
      .when(scores("de") >= scores("fr") && scores("de") >= scores("es"), "de")
      .when(scores("fr") >= scores("es"), "fr")
      .otherwise("es")
  }

  /** Document fingerprint: md5 of the normal form. */
  def fingerprint(c: Column): Column = md5(normalize(c))

  /** Word k-grams (shingles) joined by '_'; empty below k tokens.
    *
    * Built by zipping k shifted slices of the token array rather than
    * indexing `element_at(tokens, i+j)` inside a `transform` lambda:
    * lambda bodies are re-evaluated per element, so the indexing form
    * re-splits the whole text once per shingle position (O(len·n)
    * per row). Slices take the token array as a direct argument, which
    * Catalyst evaluates once per row — O(len + n).
    */
  def shingles(c: Column, k: Int = 3): Column = {
    val toks = tokens(c)
    val cnt = greatest(size(toks) - (k - 1), lit(0))
    val parts = (0 until k).map(j => slice(toks, lit(j + 1), cnt))
    parts.reduce((a, b) => zip_with(a, b, (x, y) => concat(x, lit("_"), y)))
  }

  /** Distinct md5-prefix hashes of the k-token shingles, as one
    * fused codegen'd pass (see
    * [[org.apache.spark.sql.graft.ShingleHashes]]) — the array the
    * dedup front-ends consume anyway, without ever materializing the
    * shingle strings. `hexLen = 15` matches [[graft.ext.DedupOps]]'s
    * Jaccard keys; pass 8 for the MinHash pipeline's
    * [[graft.ext.DedupOps.shingleHash]] domain.
    */
  def shingleHashes(c: Column, k: Int = 3, hexLen: Int = 15): Column =
    org.apache.spark.sql.graft.HashColumns.shingle_hashes(c, k, hexLen)

  /** Min-shingle fingerprint: lexicographic min of md5'd shingles —
    * a single-hash MinHash, cheap near-dup prefilter.
    */
  def minShingleFingerprint(c: Column, k: Int = 3): Column =
    array_min(transform(shingles(c, k), s => md5(s)))

  // -- PII scrubbing ---------------------------------------------------
  // Patterns stay in the portable regex subset (character classes +
  // bounded quantifiers, no lookaround) that Java and RE2-family
  // engines interpret identically, so redaction is reproducible by an
  // external auditor (and by the DuckDB oracle).

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+1-555-[0-9]{4}"
  val UrlRe = "https?://[A-Za-z0-9./_-]+"

  /** Count occurrences of one PII pattern. */
  def piiCount(c: Column, pattern: String): Column =
    regexp_count(c, lit(pattern))

  /** Replace emails, phones, and URLs with typed placeholder tokens.
    * Fixed application order (email → phone → URL) so every engine
    * produces byte-identical scrubbed text. Pure codegen'd
    * expressions: the scrub runs inside WholeStageCodegen with no
    * shuffle, the ideal 100 TB shape.
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      UrlRe, "<URL>")

  /** Repetition metrics per document (the Gopher/MassiveText-style
    * repetitious-text filter, Rae et al. '21): fraction of duplicate
    * word bigrams and trigrams, and the share of the single most
    * frequent bigram. Boilerplate, keyword stuffing and looping
    * generations all light these up. One explode + one count
    * aggregation per doc (map-side combine); every metric is a ratio
    * of exact integers (division is correctly rounded — bit-identical
    * in the oracle), and the keep flag applies the published-style
    * literal thresholds.
    */
  def repetitionMetrics(docs: DataFrame, id: Column, text: Column,
                        maxDup2: Double = 0.2, maxDup3: Double = 0.18,
                        maxTopShare: Double = 0.2): DataFrame = {
    // MAP-ONLY since round 13: the k-gram census is a per-document
    // fold, so it runs as one codegen'd scalar per row
    // (ngram_repetition_stats) instead of the old explode →
    // groupBy(doc, gram) → groupBy(doc) → join-back-to-spine shape,
    // which paid two corpus-sized exchanges for per-row arithmetic.
    // Docs below k tokens surface n/d as NULL (the old left-join
    // contract) and zero fractions with keep=true.
    val stats = docs.select(id.as("doc_id"),
      org.apache.spark.sql.graft.TextStatsColumns
        .ngram_repetition_stats(text, 2).as("__s2"),
      org.apache.spark.sql.graft.TextStatsColumns
        .ngram_repetition_stats(text, 3).as("__s3"))
      .select(col("doc_id"),
        when(col("__s2.n") > 0, col("__s2.n")).as("n2"),
        when(col("__s2.n") > 0, col("__s2.d")).as("d2"),
        when(col("__s3.n") > 0, col("__s3.n")).as("n3"),
        when(col("__s3.n") > 0, col("__s3.d")).as("d3"),
        when(col("__s2.n") > 0, col("__s2.top")).as("__top2"))
    val dup2 = (col("n2") - col("d2")).cast("double") /
      col("n2").cast("double")
    val dup3 = (col("n3") - col("d3")).cast("double") /
      col("n3").cast("double")
    val topShare = col("__top2").cast("double") / col("n2").cast("double")
    stats
      .select(col("doc_id"), col("n2"), col("d2"), col("n3"), col("d3"),
        coalesce(dup2, lit(0.0)).as("dup2_frac"),
        coalesce(dup3, lit(0.0)).as("dup3_frac"),
        coalesce(topShare, lit(0.0)).as("top2_share"),
        (coalesce(dup2, lit(0.0)) <= maxDup2 &&
          coalesce(dup3, lit(0.0)) <= maxDup3 &&
          // top-share binds only past a length floor: a 2-token doc's
          // single bigram has share 1.0 without being repetitious
          // (the published rules carry the same length prerequisites)
          (coalesce(col("n2"), lit(0L)) < 20 ||
            coalesce(topShare, lit(0.0)) <= maxTopShare)).as("keep"))
  }

  /** The [[repetitionMetrics]] keep flag as a single scalar Column —
    * for pipelines that only gate on it (curate_pretrain), so the
    * repetition filter fuses into the surrounding codegen stage with
    * no join against a metrics table. Identical decision rule
    * (ExtSpec pins the parity against the metrics table's flag).
    * NULL text KEEPS (coalesce, the [[langId]] discipline): the
    * metrics table's gate passes NULL text (every dup-fraction
    * comparison coalesces to the passing side), so the
    * null-propagating native kernel alone would silently DROP
    * NULL-text docs when used in a Filter (NULL reads as false).
    */
  def repetitionKeep(text: Column, maxDup2: Double = 0.2,
                     maxDup3: Double = 0.18,
                     maxTopShare: Double = 0.2): Column =
    coalesce(org.apache.spark.sql.graft.TextStatsColumns
      .repetition_keep(text, maxDup2, maxDup3, maxTopShare), lit(true))

  /** Overlapping token-window chunking — the context-length-fitting
    * stage of a training-data pipeline: each document becomes
    * ceil-strided windows of `window` tokens advancing by
    * `window − overlap`, so every token lands in at least one chunk
    * and consecutive chunks share `overlap` tokens of context. Pure
    * explode-of-positions: the tokenization materializes once per
    * document below the Generate (no per-chunk re-split), chunk count
    * is integer arithmetic (floor of an exact small-integer division
    * — identical in the oracle), and the output is strings + ints, so
    * the check is bit-exact. One narrow stage, no shuffle: the 100 TB
    * shape is a map-only pass.
    */
  def chunkTokens(docs: DataFrame, id: Column, text: Column,
                  window: Int = 32, overlap: Int = 8): DataFrame = {
    require(overlap >= 0 && window > overlap,
      s"need window ($window) > overlap ($overlap) >= 0 or the stride " +
        "is not positive")
    val stride = window - overlap
    docs.select(id.as("doc_id"), tokens(text).as("__toks"))
      .select(col("doc_id"), col("__toks"),
        size(col("__toks")).cast("long").as("__n"))
      // the empty pseudo-token guard (tokenEntropy's discipline): an
      // empty/whitespace-only doc tokenizes to [""], which must not
      // chunk as a one-token doc — it would consume a slot of a
      // training sequence and own the "" span in spanDedup. NULL text
      // sizes to NULL and is dropped by the same predicate.
      .filter(col("__n") >= 1 &&
        !(col("__n") === 1 && element_at(col("__toks"), 1) === ""))
      .select(col("doc_id"), col("__toks"), col("__n"),
        explode(sequence(lit(0L),
          floor(greatest(col("__n") - overlap - 1, lit(0L))
            .cast("double") / stride).cast("long"))).as("__i"))
      .select(col("doc_id"),
        col("__i").cast("int").as("chunk_idx"),
        array_join(slice(col("__toks"),
          (col("__i") * stride + 1).cast("int"), lit(window)), " ")
          .as("chunk_text"),
        least(lit(window.toLong), col("__n") - col("__i") * stride)
          .as("n_tokens"))
  }

  /** BM25 document ranking against a fixed term list (Robertson/
    * Spärck Jones; the Okapi k1/b saturation form) — the relevance-
    * scoring stage of retrieval-based corpus curation (keep documents
    * that score high against seed queries). k1 = 1.2, b = 0.75, the
    * standard defaults, folded term-by-term in declaration order.
    *
    * OUTPUT IS INTEGER-ONLY (per-term tf, doc length, rank): the idf
    * needs `ln`, and libm `log` is not correctly rounded — JVM and
    * DuckDB disagree in the last bit on ~0.1% of inputs (measured),
    * so a floating score column could never hash-match an oracle. The
    * score exists only inside the ORDER BY; a rank flip would need
    * two distinct documents scored within one ulp of each other.
    *
    * Shape at scale: tf is computed IN-ROW per term as
    * `size(toks) - size(array_remove(toks, term))` (round 19: the
    * explode → filter-to-terms → partial-agg → left-join-back form
    * planned 4 corpus scans, 2 tokenize+explode subtrees and 2
    * aggregation exchanges; per-term counting over the token array is
    * a codegen-friendly projection, so the whole tf table is a single
    * narrow pass with NO exchange and NO join — a NULL-text doc's tf
    * goes NULL instead of filled-0, indistinguishable downstream
    * because its score was already NULL-filtered and every stat
    * aggregation maps NULL and 0 to the same contribution); the
    * corpus stats (n, avgdl, per-term df) are ONE aggregated row
    * cross-joined (broadcast) back; the global top-k is
    * `orderBy(score desc).limit(k)` — TakeOrderedAndProject, i.e. a
    * bounded per-partition heap in every task and a k-row merge, so
    * NO task ever holds more than k rows no matter the corpus size.
    * The rank column is then re-derived on the ≤k survivors by
    * sorting them inside ONE array (score negated so ascending struct
    * order = score desc, doc_id asc — the exact TakeOrdered key) and
    * posexploding; no unpartitioned window anywhere in the plan.
    */
  def bm25TopK(docs: DataFrame, id: Column, text: Column,
               terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty && terms.size <= 16,
      "terms drive one tf column each — keep the list small")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      (size(col("__toks")) - size(array_remove(col("__toks"), t)))
        .cast("long").as(s"tf$i")
    }
    val tf = docs.select(id.as("doc_id"), tokens(text).as("__toks"))
      // long: the oracle's len() is BIGINT and the schema gate is exact
      .select(col("doc_id") +:
        size(col("__toks")).cast("long").as("dl") +: tfCols: _*)
    val statAggs =
      count(lit(1)).as("__n") +:
        (sum(col("dl")).cast("double") / count(lit(1))).as("__avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i"))
    val stats = tf.agg(statAggs.head, statAggs.tail: _*)
    // constants as the same decimal literals the oracle SQL carries —
    // "k1 + 1" computed in double rounds differently than the parsed
    // literal "2.2", and the hash gate is bit-exact
    // degenerate-corpus guard: an all-empty corpus has avgdl = 0, and
    // dl/avgdl = 0/0 = NaN would rank differently between the old
    // window form (NaN first under desc) and the ascending −score
    // sort below (NaN last) — pin the length norm to 0 so every score
    // is a real number and the two forms can never disagree. Fixture
    // corpora never hit this; the oracle needs no mirror because the
    // branch is unreachable on any corpus with one non-empty doc.
    val dlNorm = when(col("__avgdl") > 0,
      col("dl").cast("double") / col("__avgdl")).otherwise(lit(0.0))
    val score = terms.indices.map { i =>
      log((col("__n") - col(s"__df$i") + lit(0.5)) /
        (col(s"__df$i") + lit(0.5)) + lit(1.0)) *
        (col(s"tf$i").cast("double") * lit(2.2)) /
        (col(s"tf$i").cast("double") +
          lit(1.2) * (lit(0.25) + lit(0.75) * dlNorm))
    }.reduce(_ + _)
    // distributed top-k: per-partition k-row heaps + one k-row merge.
    // NULL scores (a NULL-text doc's dl is NULL and na.fill covers
    // only the tf columns) are EXCLUDED before ranking: desc-orderBy
    // puts them last but the packed (−score, …) re-rank below sorts a
    // NULL struct field FIRST — an un-filtered no-text doc would take
    // rnk = 1 whenever the limit admitted it
    val top = tf.crossJoin(broadcast(stats))
      .withColumn("__score", score)
      .filter(col("__score").isNotNull)
      .orderBy(col("__score").desc, col("doc_id"))
      .limit(k)
    // scores are ≥ 0 (idf = ln(x+1) with x > 0, tf ≥ 0), so negation
    // is exact and order-reversing; doc_id is unique (group key), so
    // (−score, doc_id) ascending is a total order matching the
    // TakeOrdered key — dl/tf fields trail and never decide order
    val packed = struct(
      (-col("__score")).as("ns") +: col("doc_id").as("doc_id") +:
        col("dl").as("dl") +:
        terms.indices.map(i => col(s"tf$i").as(s"tf$i")): _*)
    top.agg(sort_array(collect_list(packed)).as("__a"))
      .select(posexplode(col("__a")).as(Seq("__pos", "__r")))
      .select(col("__r.doc_id").as("doc_id") +: col("__r.dl").as("dl") +:
        terms.indices.map(i => col(s"__r.tf$i").as(s"tf$i")) :+
        (col("__pos") + 1).cast("int").as("rnk"): _*)
  }

  /** Concat-and-cut sequence packing — the shard-parallel form of the
    * packer every LLM training pipeline runs after chunking: within
    * each shard (salted doc-id hash, the unit real pipelines pack
    * independently), chunks concatenate in (doc_id, chunk_idx) order
    * into a token stream cut every `capacity` tokens; a chunk belongs
    * to the sequence where its FIRST token lands (the streaming packer
    * with spillover). One window cumsum per shard — per-task state is
    * one shard's chunk list, so sizing `shards` to the cluster keeps
    * tasks bounded at any corpus size (a single global ordering would
    * serialize the corpus through one task).
    *
    * Output: (doc_id, chunk_idx, n_tokens, shard, seq_id, seq_offset)
    * where seq_id counts sequences within the shard and seq_offset is
    * the chunk's first-token position inside its sequence's stream.
    */
  def packSequences(chunks: DataFrame, docId: Column, chunkIdx: Column,
                    nTokens: Column, capacity: Int, shards: Int,
                    salt: String): DataFrame = {
    require(capacity >= 1 && shards >= 1,
      "capacity and shards must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("doc_id", "chunk_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .select(docId.as("doc_id"), chunkIdx.as("chunk_idx"),
        nTokens.cast("long").as("n_tokens"))
      .withColumn("shard", PortableHash.md5PrefixLong(
        concat(lit(salt), col("doc_id").cast("string")), 7) % shards)
      .withColumn("__cum", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
        col("shard"),
        expr(s"__cum div $capacity").as("seq_id"),
        pmod(col("__cum"), lit(capacity.toLong)).as("seq_offset"))
  }

  /** Integer-bit BIGRAM surprisal — the conditional upgrade of
    * [[unigramSurprisal]], one step closer to the n-gram LM that
    * CCNet-style curation really scores with:
    *
    *   bits(doc) = Σ over consecutive token pairs (p, c) of
    *               ⌊log2 count₁(p)⌋ − ⌊log2 count₂(p, c)⌋
    *
    * where count₂ is the corpus bigram count and count₁ the count of
    * bigrams STARTING with p (so the ratio is a true conditional
    * probability and the bit difference is never negative). Predictable
    * continuations score ~0 bits; rare transitions — gibberish, OCR
    * damage, shuffled text that unigram stats cannot see — score high.
    *
    * Shape at scale: the bigram count table aggregates once with
    * map-side combine, and the start-token counts ROLL UP from it
    * (Σ over cur of count₂ = count₁ — vocab²-sized input instead of
    * a second corpus pass), so the count subtree is built once and
    * exchange-reused between the rollup and the scoring join (pinned
    * in PlanSpec). Every doc keeps a row; docs with < 2 tokens score
    * 0 over 0 bigrams.
    */
  def bigramSurprisal(docs: DataFrame, id: Column,
                      text: Column): DataFrame = {
    val t = filter(tokens(text), x => x =!= "")
    val n1 = greatest(size(t) - 1, lit(0))
    val pairArr = zip_with(slice(t, lit(1), n1), slice(t, lit(2), n1),
      (a, b) => struct(a.as("prev"), b.as("cur")))
    val pairs = docs
      .select(id.as("doc_id"), explode(pairArr).as("__p"))
      .select(col("doc_id"), col("__p.prev").as("prev"),
        col("__p.cur").as("cur"))
      // prev/cur are never null by construction; stating it keeps the
      // join-key null filters Catalyst infers IDENTICAL on every copy
      // of the count subtree, which is what lets the exchanges
      // canonicalize equal and reuse
      .filter(col("prev").isNotNull && col("cur").isNotNull)
    val c2 = pairs.groupBy("prev", "cur").agg(count(lit(1)).as("__c2"))
    val c1 = c2.groupBy("prev").agg(sum("__c2").as("__c1"))
    val scored = pairs.join(c2, Seq("prev", "cur")).join(c1, Seq("prev"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(floorLog2(col("__c1")) - floorLog2(col("__c2")))
          .as("surprisal_bits"))
    docs.select(id.as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("surprisal_bits"), lit(0L)).as("surprisal_bits"),
        coalesce(expr("(surprisal_bits * 1000) div n_bigrams"), lit(0L))
          .as("mean_millibits"))
  }

  /** Per-source corpus datasheet — the "data card" report every
    * curated corpus ships with (Gebru et al. '18): document count,
    * token volume, vocabulary size, integer type-token ratio
    * (1000·vocab div tokens), and exact-duplicate document count
    * (docs minus distinct normalized fingerprints). Two aggregations
    * joined on the source key: a doc-level rollup (count / sum /
    * approx-free distinct fingerprints) and a token-level distinct
    * count; both partial-agg friendly, output is one row per source —
    * at 100 TB this is two shuffles on a low-cardinality key and a
    * kilobyte of output.
    */
  def corpusReport(docs: DataFrame, source: Column, id: Column,
                   text: Column): DataFrame = {
    val base = docs.select(source.as("source"), id.as("doc_id"),
      text.as("__text"))
    val docLevel = base
      .select(col("source"), col("doc_id"),
        size(filter(tokens(col("__text")), t => t =!= "")).cast("long")
          .as("__nt"),
        fingerprint(col("__text")).as("__fp"))
      .groupBy("source")
      // dup count over NON-NULL fingerprints only: count(*) minus
      // countDistinct would count every NULL-text doc as a duplicate
      // (countDistinct ignores NULLs), overstating contamination on
      // the shipped data card
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum("__nt"), lit(0L)).as("n_tokens"),
        (count(col("__fp")) - countDistinct(col("__fp")))
          .as("n_dup_docs"))
    val vocab = base
      .select(col("source"), explode(tokens(col("__text"))).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy("source").agg(countDistinct(col("__t")).as("vocab"))
    docLevel.join(vocab, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_dup_docs"), coalesce(col("vocab"), lit(0L)).as("vocab"),
        coalesce(expr("(vocab * 1000) div n_tokens"), lit(0L))
          .as("ttr_millis"))
  }

  /** floor(log2(x)) for positive integers, computed EXACTLY on any
    * engine as length(bin(x)) − 1 — no floating log, no rounding
    * question at powers of two.
    */
  def floorLog2(c: Column): Column = length(bin(c)) - 1

  /** Integer-bit TF-IDF top terms per document — the classic
    * term-weighting signal (Spärck Jones '72) with the idf in exact
    * integer bits so the output is engine-reproducible (no floating
    * log, same construction as [[unigramSurprisal]]):
    *
    *   score_bits(d, t) = tf(d,t) · (⌊log2 N⌋ − ⌊log2 df(t)⌋)
    *
    * where N is the corpus document count. Per-doc top-k by
    * (score_bits desc, term asc) — a total order, so ranks are
    * deterministic. Shape at scale: the per-doc TF table comes from
    * ONE map-side kernel pass per row (`token_tf`), so no
    * corpus-occurrence rows ever exist and no occurrence exchange
    * ever runs; what shuffles is only the distinct (doc, term, tf)
    * table — once partially aggregated into df, once into the term
    * join (the body explains why the two references cannot share an
    * exchange). N is one broadcast row; the final window shuffles
    * k-bounded input per doc. Docs with zero tokens emit no rows (a
    * top-k over nothing is empty, matching the oracle).
    */
  def tfIdfTopTerms(docs: DataFrame, id: Column, text: Column,
                    k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    // the per-doc TF table folds map-side (token_tf: one kernel pass
    // per row), so NO corpus-occurrence rows ever exist and no
    // occurrence exchange ever runs — the round-12 shape shuffled
    // every token occurrence through an explicit term repartition.
    // The tf subtree is referenced by both the df aggregate and the
    // join probe; each reference re-runs the cheap map-side kernel
    // (nested-column pruning specializes the two copies, so exchange
    // sharing is structurally impossible here), and what shuffles is
    // only the distinct (doc, term, tf) table: once partially
    // aggregated into df, once into the term join.
    // (round 19: a keyed pre-explode spread of (doc_id, text) was A/B
    // measured FLAT here — 0.51 → 0.52 at sf0.1 — the kernel pass is
    // not this query's bottleneck; reverted, unlike text_ngram_freq
    // where the same spread paid.)
    val tf = docs
      .select(id.as("doc_id"),
        explode(org.apache.spark.sql.graft.TextStatsColumns
          .token_tf(text)).as("__p"))
      .select(col("doc_id"), col("__p.term").as("term"),
        col("__p.tf").as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_bits").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score_bits",
        col("tf") * (floorLog2(col("__n")) - floorLog2(col("df"))))
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
      .select("doc_id", "term", "tf", "df", "score_bits", "rnk")
  }

  /** URL canonicalization — the dedup key every web-corpus pipeline
    * computes before URL-level dedup (Common-Crawl style): lowercase
    * scheme and host, strip the scheme's default port (http:80 /
    * https:443), drop the fragment, remove tracking parameters
    * (utm_*, fbclid, gclid), sort surviving query parameters, and
    * normalize the path's trailing slash (root stays "/"). Pure
    * string/array expressions — map-only, codegen'd, and written so
    * the identical algorithm runs in the oracle's SQL (each step is a
    * regexp/split/filter/sort with engine-identical semantics; the
    * trailing-slash regexp anchors to one match so first-match and
    * global replace agree).
    */
  def canonicalizeUrl(u: Column): Column = {
    val scheme = lower(regexp_extract(u,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    // ONE host normalization ([[urlHost]]) — two copies would let
    // the canonical dedup key drift from the domain-stats key
    val host = urlHost(u)
    // path + query, fragment dropped
    val rest = regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val qPos = instr(rest, "?")
    val path0 = when(qPos > 0, substring_index(rest, "?", 1))
      .otherwise(rest)
    val query0 = when(qPos > 0, rest.substr(qPos + 1, length(rest)))
      .otherwise(lit(""))
    val params = filter(split(query0, "&"), p =>
      !(p.rlike("^(utm_[A-Za-z0-9]+|fbclid|gclid)=") || p === ""))
    val queryNorm = array_join(array_sort(params), "&")
    val p1 = regexp_replace(path0, "/+$", "")
    val pathNorm = when(p1 === "", lit("/")).otherwise(p1)
    // identity fallback for anything that does not parse as
    // scheme://… : regexp_extract returns "" (not NULL) on no match,
    // so without the guard every scheme-less or malformed input
    // collapsed to the single key ":///" — and URL-keyed exact dedup
    // then kept ONE arbitrary survivor of all malformed records.
    // Canonicalize what parses; pass the rest through unchanged
    // (NULL in, NULL out). The oracle carries the same CASE.
    when(scheme === "", u).otherwise(
      concat(scheme, lit("://"), host, pathNorm,
        when(queryNorm =!= "", concat(lit("?"), queryNorm))
          .otherwise(lit(""))))
  }

  /** The lowercased host (default port stripped) of a URL — the
    * domain key for per-site statistics and domain-mix sampling.
    */
  def urlHost(u: Column): Column = {
    val scheme = lower(regexp_extract(u,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
  }

  /** Gopher rule-based quality gate (Rae et al. 2021, appendix A1.1 —
    * the published heuristic filter every pretraining pipeline runs
    * before model-based scoring). Token-level rules, each phrased as
    * EXACT integer arithmetic so the gate is bit-reproducible on any
    * engine (a mean-word-length bound `3 ≤ sum/n ≤ 10` is evaluated
    * as `3n ≤ sum ∧ sum ≤ 10n` — no division, no floats):
    *
    *   bit 0 — word count outside [minWords, maxWords]
    *   bit 1 — mean word length outside [3, 10]
    *   bit 2 — symbol-to-word ratio ('#' chars + '...' runs) ≥ 0.1
    *   bit 3 — fraction of words with an alphabetic char ≤ 0.8
    *   bit 4 — fewer than 2 stopword tokens ([[Stopwords]], Gopher's
    *           "required word" rule with this engine's shared list)
    *
    * The paper's LINE-based rules (bullet-start / ellipsis-end
    * fractions) are deliberately omitted: the corpus fixtures carry no
    * line structure, and cross-engine line-splitting edge cases (empty
    * trailing lines) would put un-exercised parity risk in the oracle.
    *
    * Output: per-doc feature ints, `fail_mask` (OR of failed rule
    * bits), and `keep` = fail_mask == 0. Map-only — one projection,
    * no shuffle, safe at any corpus size.
    */
  def gopherRules(docs: DataFrame, id: Column, text: Column,
                  minWords: Long = 50, maxWords: Long = 100000)
      : DataFrame = {
    // every metric coalesces to its empty-document value: on NULL
    // text each rule condition would otherwise evaluate NULL, every
    // when(f, bit).otherwise(0) would contribute 0, and a doc with no
    // text AT ALL would pass the 50-word-minimum gate with
    // fail_mask = 0 — a silent keep where zeroed metrics fail rule 0
    // loudly (the oracle carries the same coalesce)
    val toks = tokens(text)
    val nWords = coalesce(size(toks).cast("long"), lit(0L))
    val sumLen = coalesce(
      aggregate(transform(toks, t => length(t).cast("long")),
        lit(0L), (a, x) => a + x), lit(0L))
    val nAlpha = coalesce(
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long"), lit(0L))
    val nHash = coalesce(
      (length(text) - length(regexp_replace(text, "#", "")))
        .cast("long"), lit(0L))
    val nEllipsis = coalesce(((length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / 3).cast("long"),
      lit(0L))
    val nStop = coalesce(size(filter(toks,
      t => lower(t).isin(Stopwords: _*))).cast("long"), lit(0L))
    val fails = Seq(
      nWords < minWords || nWords > maxWords,
      sumLen < lit(3L) * nWords || sumLen > lit(10L) * nWords,
      lit(10L) * (nHash + nEllipsis) >= nWords,
      lit(5L) * nAlpha <= lit(4L) * nWords,
      nStop < 2L)
    val mask = fails.zipWithIndex
      .map { case (f, i) => when(f, lit(1L << i)).otherwise(lit(0L)) }
      .reduce(_ + _)
    docs.select(id.as("doc_id"), nWords.as("n_words"),
        sumLen.as("sum_word_len"), nAlpha.as("n_alpha_words"),
        (nHash + nEllipsis).as("n_symbols"), nStop.as("n_stop"),
        mask.cast("int").as("fail_mask"))
      .withColumn("keep", col("fail_mask") === 0)
  }

  /** Corpus vocabulary induction — the id-assignment stage of
    * tokenizer training: frequency-ranked contiguous ids for every
    * token above `minCount`, capped at `vocabSize` entries. Rank
    * order (count desc, token asc) is total, so id assignment is
    * deterministic on any engine. One aggregation with map-side
    * combine; the cap is `orderBy(n desc, token).limit(vocabSize)` —
    * for small caps that is TakeOrderedAndProject (a vocabSize-bounded
    * heap per partition + one bounded merge), and past the top-k
    * fallback threshold it degrades to a range-partitioned distributed
    * sort, so NO task ever ranks the full distinct-token set (a 100 TB
    * web corpus has billions of distinct junk tokens before the cap
    * prunes). Ids are then re-derived on the ≤vocabSize survivors by
    * sorting them inside one array (count negated so ascending struct
    * order = n desc, token asc) and posexploding — contiguous 1..cap,
    * no unpartitioned window anywhere. Id 0 is reserved for OOV/UNK
    * by [[encodeTokens]].
    */
  def buildVocab(docs: DataFrame, text: Column, vocabSize: Int,
                 minCount: Long): DataFrame = {
    require(vocabSize >= 1 && minCount >= 1,
      "vocabSize and minCount must be positive")
    val top = docs.select(explode(tokens(text)).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("token"))
      .limit(vocabSize)
    // n ≥ minCount ≥ 1, so long negation is exact and order-reversing
    top.agg(sort_array(collect_list(
        struct((-col("n")).as("nn"), col("token").as("token")))).as("__a"))
      .select(posexplode(col("__a")).as(Seq("__pos", "__r")))
      .select(col("__r.token").as("token"), (-col("__r.nn")).as("n"),
        (col("__pos") + 1).cast("long").as("token_id"))
  }

  /** Encode documents as token-id sequences against a
    * [[buildVocab]]-shaped (token, token_id) frame — the final
    * text→ints step before packing/training. Out-of-vocabulary
    * tokens encode as id 0 (UNK) and are counted per doc. The id
    * sequence is emitted as a space-joined STRING (order fixed by
    * position via sort_array over (pos, id) structs — collect_list
    * alone has no order contract), so the output stays hashable and
    * engine-comparable. Shape at scale: posexplode → broadcast join
    * on token → one per-doc aggregation; every doc keeps a row.
    */
  def encodeTokens(docs: DataFrame, id: Column, text: Column,
                   vocab: DataFrame): DataFrame = {
    val toks = docs.select(id.as("doc_id"),
      posexplode(filter(tokens(text), t => t =!= ""))
        .as(Seq("__pos", "token")))
    val joined = toks
      .join(broadcast(vocab.select(col("token"), col("token_id"))),
        Seq("token"), "left")
      .select(col("doc_id"), col("__pos"),
        coalesce(col("token_id"), lit(0L)).as("__tid"))
    val enc = joined.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__tid") === 0L, 1L).otherwise(0L)).as("n_oov"),
        array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__tid")))),
          s => s.getField("__tid").cast("string")), " ").as("ids"))
    docs.select(id.as("doc_id")).join(enc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("ids"), lit("")).as("ids"))
  }

  /** Integer unigram-rarity score — the perplexity-proxy quality
    * signal of CCNet-style curation, with the corpus itself as the
    * language model and bit-granular integer surprisal so the output
    * is reproducible anywhere (no floating-point log):
    *
    *   surprisal_bits(doc) = Σ_t (⌊log2 N⌋ − ⌊log2 count(t)⌋)
    *
    * over the doc's tokens, where N is the corpus token count — rare
    * tokens contribute many bits, stopwords almost none; gibberish and
    * OCR noise score far above prose. Two aggregations (vocabulary
    * counts, per-doc sum) and one join on token, all partial-agg
    * friendly; every doc keeps a row (zero-token docs score 0).
    *
    * Output: (doc_id, n_tokens, surprisal_bits, mean_millibits) with
    * mean_millibits = 1000·surprisal_bits div n_tokens (integer).
    */
  def unigramSurprisal(docs: DataFrame, id: Column,
                       text: Column): DataFrame = {
    val toks = docs.select(id.as("doc_id"), explode(tokens(text)).as("__t"))
      // a whitespace-only doc tokenizes to one empty string — not a
      // token, and it must not enter the vocabulary counts
      .filter(col("__t") =!= "")
      // ONE explicit exchange on the token feeds the vocabulary count,
      // the corpus total, and the scoring join (exchange reuse) — the
      // naive form scans and tokenizes the corpus once per consumer
      // (4 scans; asserted down to 2 in PlanSpec)
      .repartition(col("__t"))
    val counts = toks.groupBy("__t").agg(count(lit(1)).as("__c"))
    val total = counts.agg(sum("__c").as("__nn"))
    // SHUFFLE_HASH (round 19): both sides are already partitioned by
    // __t (the explicit exchange above), so a partitioned hash join
    // adds NO exchange — but left to itself AQE broadcast the
    // corpus-sized token stream as the build side (estimate-small at
    // bench SF, catastrophic at scale) and the broadcast's separate
    // exchange re-ran the whole scan+tokenize+explode subtree.
    val scored = toks.join(counts.hint("shuffle_hash"), "__t")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(floorLog2(col("__nn")) - floorLog2(col("__c")))
          .as("surprisal_bits"))
    docs.select(id.as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("surprisal_bits"), lit(0L)).as("surprisal_bits"),
        coalesce(expr("(surprisal_bits * 1000) div n_tokens"), lit(0L))
          .as("mean_millibits"))
  }

  /** DSIR importance weights (Xie et al., NeurIPS 2023 — Data
    * Selection via Importance Resampling): score every raw document by
    * log p_target(x)/p_raw(x) under bag-of-unigram language models,
    * where the target distribution comes from a caller-marked subset
    * (the domain you want more of) and raw is the whole corpus. High
    * weight = looks like the target domain; downstream, resample
    * ∝ weight (compose with [[Sampling]]) or threshold via
    * [[ccnetBuckets]]-style terciles.
    *
    * Bit-exact integer arithmetic (the engine's reproducibility
    * contract — no floating log):
    *
    *   dsir_bits(doc) = Σ_t [⌊log2(c_tgt(t)+1)⌋ − ⌊log2(c_raw(t)+1)⌋]
    *                  + n_tokens·(⌊log2(N_raw+V)⌋ − ⌊log2(N_tgt+V)⌋)
    *
    * with c_* the add-one-smoothed feature counts, N_* the model
    * feature totals, V the raw feature-vocabulary size (shared
    * smoothing denominator). Features are word `ngram`-grams —
    * unigrams by default; the paper's models use hashed bigrams
    * (`ngram = 2`), which also spread the integer weights far better
    * on near-uniform corpora (unigram weights quantize to few
    * values). SCALE SHAPE: one feature explode feeding both count
    * models through a single explicit exchange (the
    * [[unigramSurprisal]] pattern), scalar totals broadcast, per-doc
    * sum, left-join spine so every doc keeps a row. No windows, no
    * driver state.
    *
    * Output: (doc_id, n_tokens, dsir_bits, mean_millibits) with
    * mean_millibits = 1000·dsir_bits div n_tokens (length-normalized
    * comparison score; 0 for docs with no features — empty docs, or
    * docs shorter than `ngram` words).
    */
  def dsirWeights(docs: DataFrame, id: Column, text: Column,
                  isTarget: Column, ngram: Int = 1): DataFrame = {
    require(ngram >= 1, "ngram order must be positive")
    val feats = if (ngram == 1) tokens(text) else shingles(text, ngram)
    // (round 19: a keyed pre-explode spread was A/B measured WORSE
    // here — stage 1.11 → 1.21 at sf0.1 — the token exchange and the
    // scoring joins dominate, not the explode; reverted.)
    val toks = docs
      .select(id.as("doc_id"), isTarget.cast("boolean").as("__tgt"),
        explode(feats).as("__t"))
      .filter(col("__t") =!= "")
      // ONE exchange on the token shared by the raw counts, the
      // target counts, and the scoring join
      .repartition(col("__t"))
    // both models from one aggregation: raw count + target count per
    // token (conditional sum), so the models cannot drift apart
    val cnt = toks.groupBy("__t").agg(
      count(lit(1)).as("__cr"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("__ct"))
    val totals = cnt.agg(
      sum("__cr").as("__nr"), sum("__ct").as("__nt"),
      count(lit(1)).as("__v"))
    val scored = toks.join(cnt.hint("shuffle_hash"), "__t")
      .crossJoin(broadcast(totals))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(floorLog2(col("__ct") + 1L) - floorLog2(col("__cr") + 1L)
          + (floorLog2(col("__nr") + col("__v"))
            - floorLog2(col("__nt") + col("__v")))).as("dsir_bits"))
    // (the scored join above carries the SHUFFLE_HASH hint for the
    // same reason as [[unigramSurprisal]]: keep the corpus-sized
    // token stream off the broadcast path and on the shared exchange)
    docs.select(id.as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("dsir_bits"), lit(0L)).as("dsir_bits"),
        coalesce(expr("(dsir_bits * 1000) div n_tokens"), lit(0L))
          .as("mean_millibits"))
  }

  /** CCNet-style corpus partitioning (Wenzek et al., LREC 2020 §4.4):
    * per language, split the corpus into `head` / `middle` / `tail`
    * terciles by language-model perplexity — head is the most fluent
    * third, tail the noisiest, and downstream pipelines train on head
    * (+middle) or use the buckets as curriculum stages. The LM score
    * here is [[unigramSurprisal]]'s integer `mean_millibits` (the
    * engine's reproducible perplexity proxy).
    *
    * SCALE SHAPE — the tercile cut is NOT a per-doc ranking window
    * (that would order billions of rows per language through one
    * task). `mean_millibits` lives in a bounded integer domain
    * (≤ 64 bits/token ⇒ ≤ 64 000 distinct values), so the cut is
    * computed on a per-(lang, score) HISTOGRAM: one aggregation over
    * the corpus, then a cumulative window over ≤ 64 k rows per
    * language — bounded regardless of corpus size — and the resulting
    * (lang, score) → bucket map broadcasts back onto the docs
    * map-side. Ties share a score row, so they land in one bucket
    * deterministically on any engine (PERCENTILE_DISC semantics:
    * a bucket boundary never splits equal scores).
    *
    * Output: (doc_id, lang, mean_millibits, bucket).
    */
  def ccnetBuckets(docs: DataFrame, id: Column, text: Column,
                   lang: Column): DataFrame = {
    val scored = unigramSurprisal(docs, id, text)
      .join(docs.select(id.as("doc_id"), lang.as("lang")), "doc_id")
    scoreTerciles(scored, "lang", "mean_millibits")
      .select("doc_id", "lang", "mean_millibits", "bucket")
  }

  /** The reusable exact-tercile cut: label every row of `scored`
    * `head`/`middle`/`tail` by its integer `score` within its `key`
    * group — PERCENTILE_DISC semantics (a boundary never splits equal
    * scores), head = lowest scores.
    *
    * BOTH thresholds come from ONE aggregation per key: sort the
    * (score, count) histogram — bounded by the score's integer domain
    * (millibit scores: ≤ 64 k entries per key at ANY corpus size) —
    * and fold it with a running count. head_max = largest score whose
    * strictly-below count is < n/3 (ditto mid_max at 2n/3). A window
    * + totals join would consume the histogram twice and re-plan the
    * whole upstream pipeline per broadcast consumer (the measured
    * subtree-recompute trap); this consumes it once, and the tiny
    * per-key threshold row broadcasts back onto `scored` map-side.
    *
    * Contract: `score` must be a bounded-domain integer column (the
    * histogram is per distinct value); `scored` is consumed twice
    * (threshold aggregation + probe) — inherent to an exact global
    * percentile split. Tie groups never split, and the group
    * straddling a boundary lands WHOLE in the lower bucket — so
    * `head` always holds at least ⌈n/3⌉ rows (the cut is generous
    * downward; a heavily-tied distribution can push the whole mode
    * into head).
    */
  def scoreTerciles(scored: DataFrame, key: String,
                    score: String): DataFrame =
    // ONE histogram-fold quantile implementation: equidepthBins is
    // the documented any-q generalization of this operator, and the
    // two copies had already diverged on NULL handling (equidepthBins
    // filters NULL scores out of the fold and keeps NULL-key groups
    // first-class through its null-safe join; the old inline copy
    // dropped NULL-key rows and let a NULL struct shift every
    // threshold). Identical thresholds by construction: bin i's cut
    // is the largest score whose strictly-below count · 3 < n · i —
    // the same fold rule, q = 3.
    {
      // NULL scores land in `tail`, NOT head — and not DROPPED:
      // equidepthBins bins a NULL score as 0 (`score > t` is NULL,
      // the filter keeps nothing) and drops every row of a key whose
      // scores are ALL NULL (no quantile row to join). Both violate
      // this operator's contract: a quality cut that silently KEEPS
      // an unscored doc in its best bucket inverts its purpose, and
      // one that silently LOSES rows breaks one-bucket-per-input-doc
      // consumers. Splitting up front restores the historical
      // when-chain's otherwise("tail") semantics exactly: the binned
      // branch sees only real scores (so no key can lose its
      // quantile row), the NULL branch is an explicit tail.
      val nullScored = scored.filter(col(score).isNull)
        .withColumn("bucket", lit("tail"))
      Profiling.equidepthBins(
          scored.filter(col(score).isNotNull), key, score, 3)
        .withColumn("bucket", element_at(
          array(lit("head"), lit("middle"), lit("tail")),
          col("bin") + 1))
        .drop("bin")
        .unionByName(nullScored)
    }

  /** log2 in EIGHTHS of a bit, as a pure integer function of a
    * positive integer: 8·⌊log2 x⌋ + (top 4 bits of x) − 8. The top-4-
    * bit term linearly interpolates the fractional bit, so the result
    * tracks 8·log2 x from BELOW within 1.7 eighth-bits (~0.21 bit;
    * worst case sits just under 12·2^k — truncation to 4 bits plus
    * interpolation slack; log2(1+f) ≥ f makes it never overshoot),
    * and, unlike a
    * libm log, it is bit-identical on every engine: msb
    * position from binary length, shifts, one subtract.
    * [[floorLog2]]'s whole-bit granularity flattens likelihood ratios
    * under ~2× to zero; eighth-bits resolve them.
    */
  def qlog8(c: Column): Column = {
    val b = floorLog2(c)
    val m = when(b >= 3, call_function("shiftright", c, b - lit(3)))
      .otherwise(call_function("shiftleft", c, lit(3) - b))
    (lit(8) * b.cast("long") + m.cast("long") - lit(8L))
  }

  /** One-pass multinomial Naive Bayes quality classifier — the
    * cheap-classifier curation stage (the fastText-classifier shape
    * of GPT-3/LLaMA/DCLM data pipelines: label a corpus slice with a
    * rule or reference set, fit a linear text classifier, score
    * everything). Trains on `label` (pass/fail) over unigram token
    * features with add-one smoothing and scores every document with
    * the class log-odds — in integer EIGHTH-BITS ([[qlog8]]; no libm
    * log, bit-reproducible on any engine; whole bits were measured
    * too coarse: per-token odds under 2× all floor to zero and the
    * classifier degenerates to the prior).
    *
    *   nb_q8(d) = qlog8(N⁺+1) − qlog8(N⁻+1)                    (prior)
    *     + Σ_{t∈d} [qlog8(c⁺(t)+1) − qlog8(c⁻(t)+1)
    *                + (qlog8(T⁻+V) − qlog8(T⁺+V))]
    *
    * with c± per-class token counts, T± class token totals, V the
    * vocabulary size, N± class doc counts. `pred_pass` = nb_q8 > 0.
    *
    * Scale: ONE token exchange (repartition on token) feeds both the
    * count model and the scoring join — the [[dsirWeights]] shape;
    * totals and priors attach as broadcast one-row aggregates. NB is
    * the right first classifier at 100 TB because training IS one
    * aggregation pass — no gradient loop touches the corpus.
    */
  def nbQuality(docs: DataFrame, id: Column, text: Column,
                label: Column): DataFrame = {
    val base = docs.select(id.as("doc_id"),
      label.cast("boolean").as("__y"), text.as("__text"))
    val toks = base
      .select(col("doc_id"), col("__y"),
        explode(tokens(col("__text"))).as("__t"))
      .filter(col("__t") =!= "")
      .repartition(col("__t"))
    // TRAIN on labeled docs only: when(__y, …).otherwise(…) routes a
    // NULL label into the otherwise branch, so unlabeled docs would
    // silently train the FAIL class (and shift every doc's score).
    // They are still SCORED below — emitted with label_pass = NULL
    // and the model's prediction, the standard semi-supervised shape.
    val cnt = toks.filter(col("__y").isNotNull).groupBy("__t").agg(
      sum(when(col("__y"), 1L).otherwise(0L)).as("__cp"),
      sum(when(col("__y"), 0L).otherwise(1L)).as("__cf"))
    val totals = cnt.agg(sum("__cp").as("__tp"), sum("__cf").as("__tf"),
      count(lit(1)).as("__v"))
    // coalesce: with ZERO labeled docs the sums aggregate over no
    // rows to NULL — the degenerate model must still score (prior 0),
    // not null out every nb_q8
    val priors = base.filter(col("__y").isNotNull).agg(
      coalesce(sum(when(col("__y"), 1L).otherwise(0L)), lit(0L))
        .as("__np"),
      coalesce(sum(when(col("__y"), 0L).otherwise(1L)), lit(0L))
        .as("__nf"))
    // SHUFFLE_HASH: the [[unigramSurprisal]] reasoning — both sides
    // share the __t exchange; never broadcast the token stream.
    val scored = toks.join(cnt.hint("shuffle_hash"), "__t")
      .crossJoin(broadcast(totals))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(qlog8(col("__cp") + 1L) - qlog8(col("__cf") + 1L)
          + (qlog8(col("__tf") + col("__v"))
            - qlog8(col("__tp") + col("__v")))).as("__s"))
    base.select(col("doc_id"), col("__y"))
      .join(scored, Seq("doc_id"), "left")
      .crossJoin(broadcast(priors))
      .select(col("doc_id"), col("__y").as("label_pass"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        (coalesce(col("__s"), lit(0L))
          + (qlog8(col("__np") + 1L) - qlog8(col("__nf") + 1L)))
          .cast("long").as("nb_q8"))
      .withColumn("pred_pass", col("nb_q8") > 0)
  }

  /** Corpus-level exact span dedup — the CCNet/C4 paragraph-hash
    * shape (Wenzek et al. '19 dedupe paragraphs by hash across
    * shards; C4 drops repeated three-sentence spans): split every
    * document into disjoint `window`-token spans, keep each distinct
    * span's GLOBAL first occurrence (min (doc_id, chunk_idx)), drop
    * every other copy, and reassemble the surviving text per
    * document. The fixture corpus has no newlines, so the span is the
    * segmentation unit; with real paragraphs the same operator
    * applies with a paragraph splitter in place of [[chunkTokens]].
    *
    * Returns (doc_id, n_chunks, n_kept, text_kept) — `text_kept` is
    * NULL when every span of the doc was a repeat (the doc dies).
    *
    * Scale: spans are hashed to 60-bit longs BEFORE the ownership
    * shuffle (8-byte keys, same trade as jaccardPairs' shingle
    * prehash); ownership is a partial-agg-friendly groupBy-min, the
    * winner joins back on the hash, and the reassembly groups by doc
    * — two content shuffles and one doc-sized one, nothing quadratic.
    * At 100 TB this is exactly the shard-merge exact dedupe CCNet
    * runs ahead of its LM scoring.
    */
  def spanDedup(docs: DataFrame, id: Column, text: Column,
                window: Int = 16): DataFrame = {
    val ch = chunkTokens(docs, id, text, window, overlap = 0)
      .withColumn("__h", PortableHash.md5PrefixLong(col("chunk_text"), 15))
    val owner = ch.groupBy("__h")
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("__o"))
      .select(col("__h"), col("__o.doc_id").as("__od"),
        col("__o.chunk_idx").as("__oi"))
    ch.join(owner, "__h")
      .withColumn("__keep",
        col("doc_id") === col("__od") && col("chunk_idx") === col("__oi"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("__keep"),
            struct(col("chunk_idx"), col("chunk_text"))))),
          e => e("chunk_text")), " ").as("__t"))
      .withColumn("text_kept",
        when(col("n_kept") === 0, lit(null).cast("string"))
          .otherwise(col("__t")))
      .select("doc_id", "n_chunks", "n_kept", "text_kept")
  }

  /** Per-document token-distribution Shannon entropy in integer
    * eighth-bits — the low-entropy detector (keyword-stuffing spam,
    * template boilerplate, generated gibberish all score far below
    * natural prose, which sits near log2 of its vocabulary size).
    * Complements [[repetitionMetrics]]: n-gram fractions see exact
    * repeats, entropy sees skewed-but-not-identical distributions.
    *
    *   H_q8 = qlog8(N) − (Σ_t c_t·qlog8(c_t)) div N
    *
    * the plug-in estimator −Σ p·log2 p rearranged to stay in
    * integers ([[qlog8]] — no libm log, bit-exact on any engine);
    * qlog8(1) = 0 so hapax tokens contribute nothing to the sum, and
    * an all-distinct doc scores exactly qlog8(N).
    *
    * Scale shape: one explode, the (doc, token) count exchange, one
    * per-doc partial agg — the same token-exchange plan as
    * [[tfIdfTopTerms]]. Per-doc state is its distinct-token census,
    * never the token list.
    */
  def tokenEntropy(docs: DataFrame, id: Column, text: Column): DataFrame = {
    // the sibling discipline (unigramSurprisal, dsirWeights, …):
    // the empty pseudo-token is filtered — a whitespace-only doc must
    // not score as a one-token doc — and the doc spine left-joins
    // back so NULL/empty-text docs report (0, 0, NULL entropy)
    // instead of silently vanishing from the table
    val spine = docs.select(id.as("doc_id"))
    val cnt = docs
      .select(id.as("doc_id"), explode(tokens(text)).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val agg = cnt.groupBy("doc_id")
      .agg(sum("c").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") * qlog8(col("c"))).as("__s"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        (qlog8(col("n_tokens")) - expr("__s div n_tokens"))
          .as("entropy_q8"))
    spine.join(agg, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_tokens", "n_distinct"))
  }

  /** CCNet-style line-level boilerplate removal (Wenzek et al., LREC
    * 2020 §3.1): a line occurring in ≥ `maxDf` DISTINCT documents is
    * boilerplate (headers, cookie banners, nav menus) and is removed
    * from EVERY document, preserving the order of surviving lines.
    * Unlike [[spanDedup]] (which keeps one owner copy per duplicate
    * span) this drops ALL copies — the corpus-hygiene semantics:
    * boilerplate carries no training signal even once.
    *
    * `delim` picks the granularity — "\n" in production; any
    * delimiter runs the identical plan.
    *
    * Shape at 100 TB: one explode; the document-frequency count is a
    * map-side-dedupable distinct on (line, doc) then a partial-agg
    * count on line; one hash join back on the line key; one
    * positional-reassembly groupBy per doc. The line string is the
    * shuffle key — a production run would prehash to 64 bits
    * (carrying the string only to the df stage), which thins the
    * exchanges and changes nothing modulo hash collisions. Per-doc
    * memory is the doc's own line list, the same bound as reading it.
    */
  def lineDedup(docs: DataFrame, id: Column, text: Column,
                delim: String = "\n", maxDf: Long = 2): DataFrame = {
    require(maxDf >= 2, s"maxDf ($maxDf) must be >= 2 (1 drops everything)")
    val sep = java.util.regex.Pattern.quote(delim)
    val base = docs.select(id.as("doc_id"), text.as("__text"))
    val lines = base.select(col("doc_id"),
      posexplode(split(col("__text"), sep)).as(Seq("__pos", "__line")))
    val df = lines.select("__line", "doc_id").distinct()
      .groupBy("__line").agg(count(lit(1)).as("__df"))
    val kept = lines.join(df, "__line").filter(col("__df") < maxDf)
    val agg = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(
            struct(col("__pos"), col("__line")))),
          e => e("__line")), delim).as("__clean"))
    // n_total coalesces like its siblings: size(split(NULL)) is NULL,
    // and a NULL-text doc reporting clean_text = "" / n_kept = 0 but
    // n_total = NULL breaks the every-column-coalesced contract (a
    // kept-fraction consumer would get NULL for exactly the rows the
    // spine join protects)
    base.select(col("doc_id"),
        coalesce(size(split(col("__text"), sep)).cast("long"), lit(0L))
          .as("n_total"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__clean"), lit("")).as("clean_text"),
        col("n_total"), coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }
}
