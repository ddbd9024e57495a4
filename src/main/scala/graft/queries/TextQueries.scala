package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext._
import graft.queries.ExtensionSupport._

/** Text-analysis and tokenization query surface: quality
  * scoring, language ID, fingerprinting, BPE, surprisal, TF-IDF and
  * friends, each mirrored by a DuckDB oracle.
  *
  * Split from the one-file registry by family (round 9); entries and
  * oracle SQL are byte-identical to the pre-split registry.
  */
private[queries] object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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


    // Unicode NFC canonicalization (native codegen expression). The
    // fixture corpus is ASCII (already NFC), so the query SYNTHESIZES
    // decomposed text deterministically — every 'a' gains a combining
    // grave (U+0300) — and normalization must recompose each pair to
    // one codepoint; the md5-prefix checksum pins the exact bytes.
    "text_normalize_nfc" -> { (s, dir) =>
      val synth = regexp_replace(col("text"), "a", "a\u0300")
      docs(s, dir).select(col("doc_id"), synth.as("__s"))
        .select(col("doc_id"),
          length(col("__s")).cast("long").as("len_raw"),
          length(TextAnalysis.nfcNormalize(col("__s"))).cast("long")
            .as("len_nfc"),
          PortableHash.md5PrefixLong(
            TextAnalysis.nfcNormalize(col("__s")), 14)
            .as("text_checksum"))
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


    // CCNet-style line-level boilerplate removal: drop every line
    // occurring in ≥ maxDf distinct docs, preserve the rest in
    // order. Fixture docs are single-line, so the registered query
    // runs at token granularity (delim = " ") — identical plan, and
    // the 390-doc threshold genuinely drops about half the fixture
    // vocabulary while keeping the rest.
    "text_line_dedup" -> { (s, dir) =>
      TextAnalysis.lineDedup(docs(s, dir), col("doc_id"), col("text"),
        delim = " ", maxDf = 390)
    },


    // per-doc token-distribution Shannon entropy in integer
    // eighth-bits (qlog8, no libm log) — the low-entropy spam /
    // template detector that complements text_repetition's exact
    // n-gram fractions
    "text_entropy" -> { (s, dir) =>
      TextAnalysis.tokenEntropy(docs(s, dir), col("doc_id"),
        col("text"))
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


    // CCNet head/middle/tail terciles per language — the perplexity
    // partition computed on a bounded per-(lang, score) histogram,
    // never a per-doc ranking window.
    "text_ccnet_buckets" -> { (s, dir) =>
      TextAnalysis.ccnetBuckets(docs(s, dir), col("doc_id"),
        col("text"), col("lang"))
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


    // The lossless-tokenizer proof, corpus-wide: decode(encode(t))
    // must equal whitespace-normalized t for EVERY document. The
    // Spark side runs the full encode→decode chain and reports the
    // equality plus the decoded length; the oracle never runs BPE at
    // all — any drift in symbolize/merge/decode breaks the hash.
    // HTML boilerplate strip through the from-scratch tokenizer: the
    // corpus wraps into real markup (title/style head, a comment
    // containing tags, escaped body text, a script whose string
    // literal QUOTES a close tag, an attribute holding '>'), and the
    // extractor must recover exactly title + collapsed body + tail —
    // the oracle rebuilds that expectation from the raw text
    "text_html_extract" -> { (s, dir) =>
      val esc = expr("replace(replace(replace(text, '&', '&amp;'), " +
        "'<', '&lt;'), '>', '&gt;')")
      val html = concat(
        lit("<html><head><title>t</title><style>p{color:red}</style>" +
          "</head><body><!-- note: <p>commented</p> -->" +
          "<p class=\"x\" title=\"a > b\">"),
        esc,
        lit("</p><script>if (a < b && c > d) { s = \"</p>\"; }" +
          "</script><p>tail "),
        col("doc_id"),
        lit("</p></body></html>"))
      docs(s, dir).select(col("doc_id"),
          HtmlText.extract(html).as("__x"))
        .select(col("doc_id"), md5(col("__x")).as("extract_md5"),
          length(col("__x")).cast("long").as("n_chars"))
    },

    // crawl-frontier link extraction: anchor hrefs (quoted, unquoted,
    // entity-encoded query strings — the &amp; trap) pulled from the
    // same from-scratch tag scan, one row per link in document order
    "text_extract_links" -> { (s, dir) =>
      val html = concat(
        lit("<html><body><a href=\"http://h"),
        pmod(col("doc_id"), lit(7)),
        lit(".example.com/p/"), col("doc_id"),
        lit("?a=1&amp;b=2\">l1</a><p>text</p>" +
          "<a class=\"x\" href='/rel/"),
        col("doc_id"),
        lit("'>l2</a><a name=\"no-href\">skip</a></body></html>"))
      docs(s, dir).select(col("doc_id"),
          posexplode(HtmlText.extractLinks(html))
            .as(Seq("link_no", "href")))
    },

    "text_decode_roundtrip" -> { (s, dir) =>
      val d = docs(s, dir)
      val enc = Bpe.encode(d, col("doc_id"), col("text"),
        bpeMerges(s, dir))
      d.select(col("doc_id"),
          regexp_replace(trim(col("text")), "\\s+", " ").as("__norm"))
        .join(enc, col("doc_id") === col("id"))
        .select(col("doc_id"),
          (Bpe.decode(col("bpe")) === col("__norm")).cast("int")
            .as("roundtrip_ok"),
          length(Bpe.decode(col("bpe"))).cast("long").as("decoded_len"))
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


    // Integer-bit TF-IDF: per-doc top-5 terms by tf·idf_bits — the
    // classic term-weighting signal with the idf in exact bits, so
    // the ranking is reproducible with no floating log anywhere.
    "text_tfidf" -> { (s, dir) =>
      TextAnalysis.tfIdfTopTerms(docs(s, dir), col("doc_id"),
        col("text"), k = 5)
    },


    // BM25 relevance ranking against fixed seed terms — the
    // retrieval-scoring stage of corpus curation. Integer-only output
    // (tf/dl/rank): libm ln is not bit-portable, so the score stays
    // inside the ORDER BY (see TextAnalysis.bm25TopK).
    "text_bm25_topk" -> { (s, dir) =>
      bm25Top20(s, dir)
    },


    // Corpus n-gram statistics: top-5 word bigrams per language.
    // lang is a LOW-cardinality key over a web-scale distinct-gram
    // set, so the rank is two-phase (the bm25TopK lesson): phase 1
    // ranks within (lang, gram-hash shard) — 32-way parallel per
    // language — phase 2 re-ranks only the ≤ 32·5 shard winners.
    // Top-k is distributive, so rows are identical to a single
    // per-lang window.
    "text_ngram_freq" -> { (s, dir) =>
      val grams = graft.ext.DedupOps.spreadNarrow(
          docs(s, dir).select(col("lang"), col("text")),
          Seq(col("lang"), col("text")))
        .select(col("lang"),
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


    "text_fingerprint" -> { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        TextAnalysis.minShingleFingerprint(col("text"), 3).as("min_shingle_fp"))
    },
  )

  val oracleSql: Map[String, String] = Map(

    // both links rebuilt closed-form; &amp; decodes to & in the query
    // string, the anchor without href contributes nothing
    "text_extract_links" ->
      """SELECT doc_id, CAST(u.i AS INT) AS link_no,
        |  CASE WHEN u.i = 0
        |    THEN 'http://h' || CAST(doc_id % 7 AS VARCHAR)
        |      || '.example.com/p/' || CAST(doc_id AS VARCHAR)
        |      || '?a=1&b=2'
        |    ELSE '/rel/' || CAST(doc_id AS VARCHAR) END AS href
        |FROM documents,
        |  LATERAL (SELECT unnest(range(0, 2)) AS i) u""".stripMargin,

    // the expected extraction rebuilt from the raw text: line "t"
    // (title), the whitespace-collapsed body if non-blank, then
    // "tail <id>" — the entity escape/decode round-trip cancels
    "text_html_extract" ->
      """WITH x AS (SELECT doc_id,
        |    trim(regexp_replace(text, '[ \t\n\r\x0B\f]+', ' ', 'g'))
        |      AS body
        |  FROM documents),
        |e AS (SELECT doc_id,
        |    't' || chr(10)
        |      || CASE WHEN body = '' THEN ''
        |              ELSE body || chr(10) END
        |      || 'tail ' || CAST(doc_id AS VARCHAR) AS expected
        |  FROM x)
        |SELECT doc_id, md5(expected) AS extract_md5,
        |  CAST(length(expected) AS BIGINT) AS n_chars
        |FROM e""".stripMargin,

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
          |           ELSE regexp_replace(w, '(?s)(.)', '|\1|', 'g') END),
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


    // the oracle side of the inverse proof is BPE-free by design:
    // the expected decode of ANY merge table is the whitespace-
    // normalized input, so the oracle just normalizes (trim +
    // collapse \s+ to one space — 'g' because DuckDB replaces first
    // match only by default where Spark replaces all)
    "text_decode_roundtrip" ->
      raw"""SELECT doc_id, CAST(1 AS INT) AS roundtrip_ok,
        |  CAST(length(regexp_replace(trim(text), '\s+', ' ', 'g'))
        |       AS BIGINT) AS decoded_len
        |FROM documents""".stripMargin,


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


    // window=32, overlap=8, stride=24 — constants mirrored from the
    // Spark call; chunk count = floor((n - overlap - 1)/stride) + 1
    "text_chunk" ->
      s"""WITH d AS (SELECT doc_id, $tokensSql AS toks FROM documents),
         |c AS (SELECT doc_id, toks, len(toks) AS n, i.i AS i
         |      FROM d, LATERAL (SELECT unnest(range(0,
         |        CAST(floor(CAST(greatest(len(toks) - 8 - 1, 0) AS DOUBLE) / 24.0) AS BIGINT) + 1)) AS i) i
         |      WHERE len(toks) >= 1
         |        AND NOT (len(toks) = 1 AND toks[1] = ''))
         |SELECT doc_id, CAST(i AS INT) AS chunk_idx,
         |  array_to_string(toks[CAST(i*24+1 AS INT) : CAST(i*24+32 AS INT)], ' ') AS chunk_text,
         |  least(CAST(32 AS BIGINT), n - i*24) AS n_tokens
         |FROM c""".stripMargin,


    // disjoint 16-token spans (stride = window); ownership tie-break
    // (doc_id, chunk_idx) mirrors Spark's min(struct(..)). The oracle
    // groups on the EXACT span string — hashing-free ground truth
    // (r18 audit): the Spark side's 60-bit md5-prefix ownership must
    // now EQUAL exact-string ownership, so a prefix-width or cast bug
    // (or a real collision falsely merging two spans) fails parity
    // instead of being mirrored
    "text_span_dedup" ->
      s"""WITH d AS (SELECT doc_id, $tokensSql AS toks FROM documents),
         |ch AS (SELECT doc_id, CAST(i.i AS INT) AS chunk_idx,
         |    array_to_string(toks[CAST(i.i*16+1 AS INT) : CAST(i.i*16+16 AS INT)], ' ') AS chunk_text
         |  FROM d, LATERAL (SELECT unnest(range(0,
         |    CAST(floor(CAST(greatest(len(toks) - 1, 0) AS DOUBLE) / 16.0) AS BIGINT) + 1)) AS i) i
         |  WHERE len(toks) >= 1
         |        AND NOT (len(toks) = 1 AND toks[1] = '')),
         |own AS (SELECT chunk_text, doc_id AS od, chunk_idx AS oi FROM ch
         |  QUALIFY row_number() OVER (PARTITION BY chunk_text
         |    ORDER BY doc_id, chunk_idx) = 1),
         |k AS (SELECT ch.doc_id, ch.chunk_idx, ch.chunk_text,
         |    (ch.doc_id = o.od AND ch.chunk_idx = o.oi) AS keep
         |  FROM ch JOIN own o USING (chunk_text))
         |SELECT doc_id, count(*) AS n_chunks,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  string_agg(CASE WHEN keep THEN chunk_text END, ' '
         |    ORDER BY chunk_idx) AS text_kept
         |FROM k GROUP BY doc_id""".stripMargin,


    // H_q8 = qlog8(N) − (Σ c·qlog8(c)) // N; `//` on nonnegative
    // bigints = Spark div, qlog8Sql is the shared integer-log mirror
    // empty pseudo-tokens filtered, doc spine left-joined back —
    // whitespace-only docs report (0, 0, NULL), never a fake
    // one-token score, and no doc vanishes (the Spark side's
    // sibling-discipline contract)
    "text_entropy" ->
      (s"""WITH tk AS (SELECT doc_id, unnest($tokensSql) AS tok
        |        FROM documents),
        |c AS (SELECT doc_id, tok, count(*) AS c FROM tk
        |      WHERE tok <> '' GROUP BY 1, 2),
        |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |        count(*) AS n_distinct,
        |        CAST(sum(c * ${qlog8Sql("c")}) AS BIGINT) AS s
        |      FROM c GROUP BY 1)
        |SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
        |  coalesce(CAST(a.n_distinct AS BIGINT), 0) AS n_distinct,
        |  CAST(${qlog8Sql("a.n_tokens")} - a.s // a.n_tokens AS BIGINT)
        |    AS entropy_q8
        |FROM documents d LEFT JOIN a USING (doc_id)""".stripMargin),


    // document frequency on exact line strings, zipped parallel
    // unnests carry the 1-based position, string_agg ORDER BY pos
    // mirrors the Spark positional reassembly
    "text_line_dedup" ->
      """WITH l AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS line,
        |    unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
        |  FROM documents),
        |df AS (SELECT line, count(DISTINCT doc_id) AS d
        |       FROM l GROUP BY 1),
        |k AS (SELECT l.doc_id, l.pos, l.line
        |      FROM l JOIN df USING (line) WHERE df.d < 390),
        |a AS (SELECT doc_id, count(*) AS n_kept,
        |        string_agg(line, ' ' ORDER BY pos) AS clean_text
        |      FROM k GROUP BY 1)
        |SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,
        |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_total,
        |  coalesce(a.n_kept, 0) AS n_kept
        |FROM documents d LEFT JOIN a USING (doc_id)""".stripMargin,


    "text_stats" ->
      (s"""WITH d AS (SELECT doc_id, text, $tokensSql AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS INT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS INT) AS n_bpeish,
        |  $punctRatioSql AS punct_ratio,
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
    // DuckDB's nfc_normalize implements the same UAX #15 tables as
    // java.text.Normalizer; chr(768) = U+0300; both length()s count
    // codepoints; md5 runs over the composed UTF-8 bytes
    "text_normalize_nfc" ->
      """WITH s AS (SELECT doc_id,
        |             replace(text, 'a', 'a' || chr(768)) AS s
        |           FROM documents)
        |SELECT doc_id,
        |  CAST(length(s) AS BIGINT) AS len_raw,
        |  CAST(length(nfc_normalize(s)) AS BIGINT) AS len_nfc,
        |  CAST('0x' || substr(md5(nfc_normalize(s)), 1, 14) AS BIGINT)
        |    AS text_checksum
        |FROM s""".stripMargin,


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
        |  CASE WHEN scheme = '' THEN url ELSE
        |    scheme || '://' || host ||
        |    (CASE WHEN regexp_replace(path0, '/+$', '') = '' THEN '/'
        |          ELSE regexp_replace(path0, '/+$', '') END) ||
        |    (CASE WHEN qnorm <> '' THEN '?' || qnorm ELSE '' END)
        |  END AS canonical_url,
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
        |  coalesce(CAST(len(toks) AS BIGINT), 0) AS n_words,
        |  coalesce(CAST(list_sum(list_transform(toks, t -> length(t)))
        |    AS BIGINT), 0) AS sum_word_len,
        |  coalesce(CAST(len(list_filter(toks,
        |    t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT), 0)
        |    AS n_alpha_words,
        |  coalesce(CAST(length(text) - length(replace(text, '#', ''))
        |      AS BIGINT), 0) +
        |    coalesce(CAST((length(text) -
        |      length(replace(text, '...', ''))) // 3 AS BIGINT), 0)
        |    AS n_symbols,
        |  coalesce(CAST(len(list_filter(toks,
        |    t -> list_contains($stops, lower(t)))) AS BIGINT), 0)
        |    AS n_stop
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
  )
}
