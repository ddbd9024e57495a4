// In the org.apache.spark.sql package tree: custom Expressions need
// sql-private API surface (ExpressionUtils for Column construction)
// that has no public equivalent in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Kernel behind [[NgramRepetitionStats]]: the per-document k-gram
  * census (total windows, distinct k-grams, modal k-gram count) in
  * ONE pass over the UTF-8 bytes — the map-only form of
  * `explode(shingles) → groupBy(doc, gram) → groupBy(doc)`, which
  * pays two corpus-sized shuffles for what is a per-row fold.
  * Tokenization replicates `split(trim(c), "\\s+")` exactly (same
  * contract as [[GraftHashUtil.shingleHashes]]: ASCII \s set, leading/
  * trailing empty tokens, [""] for the empty string), and
  * distinctness is on the EXACT '_'-joined shingle string — the same
  * string the declarative form groups on, so counts are identical,
  * not hash-approximate.
  */
object GraftTextStats {
  /** (n, d, top) of the k-token shingles of `s`: n = window count,
    * d = distinct shingle strings, top = highest per-shingle count.
    * All zero when the text has fewer than k tokens.
    */
  def ngramStats(s: UTF8String, k: Int): InternalRow = {
    val b = s.trim().getBytes
    val (starts, ends) = GraftHashUtil.tokenRanges(b)
    ngramStatsRanges(b, starts, ends, k)
  }

  /** [[ngramStats]] over PRE-tokenized ranges — so a caller needing
    * several k values (repetitionKeep: k = 2 and 3) tokenizes once.
    */
  private def ngramStatsRanges(b: Array[Byte], starts: Array[Int],
                               ends: Array[Int], k: Int): InternalRow = {
    val nTok = starts.length
    val n = math.max(nTok - (k - 1), 0)
    if (n == 0)
      return InternalRow(0L, 0L, 0L)
    val counts = new java.util.HashMap[String, Long](n * 2)
    val sb = new java.lang.StringBuilder
    var w = 0
    var top = 0L
    while (w < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append('_')
        // ISO-8859-1, NOT UTF-8: the key exists only for EQUALITY,
        // and Latin-1 maps bytes to chars bijectively, so distinct
        // byte sequences stay distinct — UTF-8 decoding collapses
        // every invalid sequence to U+FFFD, merging byte-different
        // malformed shingles the declarative groupBy (which compares
        // raw UTF8String bytes) keeps apart. On valid text the two
        // decodings induce the same equivalence classes; Latin-1 is
        // also cheaper (no validation).
        sb.append(new String(b, starts(w + j), ends(w + j) - starts(w + j),
          java.nio.charset.StandardCharsets.ISO_8859_1))
        j += 1
      }
      val key = sb.toString
      val c = counts.merge(key, 1L, (a, x) => a + x)
      if (c > top) top = c
      w += 1
    }
    InternalRow(n.toLong, counts.size().toLong, top)
  }

  /** Per-document SimHash (Charikar STOC'02 / Manku WWW'07) as a
    * per-row fold: tokenize (same `split(trim, "\\s+")` contract as
    * [[ngramStats]]), hash each token to its 60-bit md5 prefix
    * (bit-identical to [[md5PrefixLong]](token, hexLen)), vote ±1 per
    * bit position over ALL token occurrences, set bit j iff its vote
    * sum is > 0. Identical to the declarative
    * `explode(tokens) → md5_prefix_long → groupBy(doc) → simhashAgg`
    * composition — which pays a corpus-sized explode + exchange for
    * what is per-document arithmetic.
    */
  def simhash(s: UTF8String, bits: Int, hexLen: Int): Long = {
    val b = s.trim().getBytes
    val (starts, ends) = GraftHashUtil.tokenRanges(b)
    val votes = new Array[Long](bits)
    var w = 0
    while (w < starts.length) {
      val m = GraftHashUtil.digest()
      m.update(b, starts(w), ends(w) - starts(w))
      val h = GraftHashUtil.hexPrefix(m.digest(), hexLen)
      var j = 0
      while (j < bits) {
        votes(j) += ((h >>> j) & 1L) * 2 - 1
        j += 1
      }
      w += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  /** Marker-word counts for the four-language n-gram heuristic —
    * the kernel behind [[LangIdNative]]. Token membership tests run
    * on the byte ranges; the marker lists are the same literals
    * `graft.ext.TextAnalysis.LangMarkers` carries (pinned equal in
    * ExtSpec), and the tie chain en > de > fr > es replicates the
    * Column form's when-cascade exactly.
    */
  def langId(s: UTF8String): UTF8String = {
    val b = s.trim().getBytes
    val (starts, ends) = GraftHashUtil.tokenRanges(b)
    var en = 0L; var de = 0L; var fr = 0L; var es = 0L
    var w = 0
    while (w < starts.length) {
      // empty tokens match no marker — the ranges' empties are inert
      if (ends(w) > starts(w)) {
        val tok = new String(b, starts(w), ends(w) - starts(w),
          java.nio.charset.StandardCharsets.UTF_8)
        tok match {
          case "the" | "and" | "of" | "is" => en += 1
          case "der" | "die" | "und" | "ist" => de += 1
          case "le" | "la" | "et" | "est" => fr += 1
          case "el" | "los" | "y" | "es" => es += 1
          case _ => ()
        }
      }
      w += 1
    }
    val out =
      if (en >= de && en >= fr && en >= es) "en"
      else if (de >= fr && de >= es) "de"
      else if (fr >= es) "fr"
      else "es"
    UTF8String.fromString(out)
  }

  /** Composite quality score — the kernel behind
    * [[QualityScoreNative]]: stopword ratio · 0.5 + (1 − punct
    * ratio) · 0.3 + min(tokens/100, 1) · 0.2, with EXACTLY the
    * Column form's arithmetic (same IEEE operations in the same
    * order, token counts per the split(trim, "\\s+") contract
    * including leading/trailing empty tokens, punct ratio over the
    * UNtrimmed text's codepoints outside [A-Za-z0-9 ]).
    */
  def qualityScore(s: UTF8String): Double = {
    val bAll = s.getBytes
    // punct ratio: codepoint count and non-[A-Za-z0-9 ] count over
    // the ORIGINAL string (regexp_replace strips matches; length is
    // in codepoints — multi-byte UTF-8 sequences count once)
    var nChars = 0L
    var keep = 0L
    var i = 0
    while (i < bAll.length) {
      val x = bAll(i) & 0xff
      if ((x & 0xc0) != 0x80) { // not a continuation byte
        nChars += 1
        if ((x >= 'A' && x <= 'Z') || (x >= 'a' && x <= 'z') ||
          (x >= '0' && x <= '9') || x == ' ') keep += 1
      }
      i += 1
    }
    val punctRatio =
      if (nChars == 0L) 0.0 else (nChars - keep).toDouble / nChars.toDouble
    // token pass on the trimmed bytes (split(trim, "\s+") contract)
    val b = s.trim().getBytes
    val (starts, ends) = GraftHashUtil.tokenRanges(b)
    val nTok = starts.length.toLong
    var stop = 0L
    var w = 0
    while (w < starts.length) {
      if (ends(w) > starts(w)) { // empty tokens are never stopwords
        val tok = new String(b, starts(w), ends(w) - starts(w),
          java.nio.charset.StandardCharsets.UTF_8)
        tok match {
          case "the" | "a" | "an" | "and" | "or" | "of" | "to" |
               "in" | "is" | "it" => stop += 1
          case _ => ()
        }
      }
      w += 1
    }
    val stopRatio = stop.toDouble / nTok.toDouble
    stopRatio * 0.5 + (1.0 - punctRatio) * 0.3 +
      math.min(nTok.toDouble / 100.0, 1.0) * 0.2
  }

  /** Per-document term-frequency table as ONE pass: distinct
    * non-empty tokens (same `split(trim, "\\s+")` contract, empty
    * tokens skipped) with occurrence counts, in first-occurrence
    * order. The map-only form of
    * `explode(tokens) → filter('' ≠) → groupBy(doc, term) → count`,
    * which pays a corpus-occurrence exchange for per-row counting.
    */
  def tokenTf(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val b = s.trim().getBytes
    val (starts, ends) = GraftHashUtil.tokenRanges(b)
    // keys in ISO-8859-1 (byte-bijective — see ngramStatsRanges: a
    // UTF-8 decode collapses distinct malformed tokens to one U+FFFD
    // key) and the EMITTED term rebuilt from the key's raw bytes,
    // never a UTF-8 re-encode that would rewrite invalid sequences
    val counts = new java.util.LinkedHashMap[String, Long](64)
    var w = 0
    while (w < starts.length) {
      if (ends(w) > starts(w)) { // the declarative form filters '' ≠
        val tok = new String(b, starts(w), ends(w) - starts(w),
          java.nio.charset.StandardCharsets.ISO_8859_1)
        counts.merge(tok, 1L, (a, x) => a + x)
      }
      w += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var n = 0
    while (it.hasNext) {
      val e = it.next()
      out(n) = InternalRow(UTF8String.fromBytes(
        e.getKey.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)),
        e.getValue)
      n += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** The Gopher repetition keep decision as one boolean: dup-bigram
    * fraction ≤ maxDup2, dup-trigram fraction ≤ maxDup3, and (past
    * the 20-bigram length floor) modal-bigram share ≤ maxTopShare.
    * Arithmetic replicates the Column form exactly (long-to-double
    * division; zero fractions below k tokens).
    */
  def repetitionKeep(s: UTF8String, maxDup2: Double, maxDup3: Double,
                     maxTopShare: Double): Boolean = {
    // ONE tokenization for both censuses — the hot path of the
    // curate_* gates runs this per corpus row
    val b = s.trim().getBytes
    val (starts, ends) = GraftHashUtil.tokenRanges(b)
    val s2 = ngramStatsRanges(b, starts, ends, 2)
    val s3 = ngramStatsRanges(b, starts, ends, 3)
    val n2 = s2.getLong(0); val d2 = s2.getLong(1); val top2 = s2.getLong(2)
    val n3 = s3.getLong(0); val d3 = s3.getLong(1)
    val dup2 = if (n2 > 0) (n2 - d2).toDouble / n2.toDouble else 0.0
    val dup3 = if (n3 > 0) (n3 - d3).toDouble / n3.toDouble else 0.0
    val topShare = if (n2 > 0) top2.toDouble / n2.toDouble else 0.0
    dup2 <= maxDup2 && dup3 <= maxDup3 &&
      (n2 < 20 || topShare <= maxTopShare)
  }
}

/** `ngram_repetition_stats(text, k)` → struct(n, d, top): the fused
  * native form of the Gopher repetition census (see
  * [[graft.ext.TextAnalysis.repetitionMetrics]]) — per-document
  * k-gram total / distinct / modal counts as a single codegen'd
  * scalar, so the repetition filter is a MAP-ONLY stage: no explode,
  * no (doc, gram) exchange, no per-doc re-aggregation, no join back
  * to the doc spine. Values are bit-identical to the declarative
  * `explode(shingles(text, k)) → groupBy → agg` composition (counts
  * of exact shingle strings; ExtSpec pins the parity), so the DuckDB
  * oracle rendering is unchanged.
  */
case class NgramRepetitionStats(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1 && k <= 16, "k must be in [1, 16]")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("d", LongType, nullable = false),
    StructField("top", LongType, nullable = false)))
  override def prettyName: String = "ngram_repetition_stats"

  override def nullSafeEval(s: Any): Any =
    GraftTextStats.ngramStats(s.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.GraftTextStats.ngramStats($c, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): NgramRepetitionStats = copy(child = newChild)
}

/** `repetition_keep(text)` — the whole Gopher gate as ONE boolean
  * scalar (both k-gram censuses in one kernel call), for pipelines
  * that filter on it without consuming the metrics. A plain Column
  * composition of struct fields would be re-expanded per reference by
  * predicate pushdown through projections; a single expression keeps
  * the filter one kernel call per row inside WholeStageCodegen.
  */
case class RepetitionKeep(child: Expression, maxDup2: Double,
                          maxDup3: Double, maxTopShare: Double)
    extends UnaryExpression with ExpectsInputTypes {
  // doGenCode interpolates these as Java double literals: a
  // non-finite value renders as `Infinity`/`NaN`, which Janino
  // rejects — every stage containing the predicate would fail to
  // compile. Thresholds are fractions anyway; refuse at construction.
  require(java.lang.Double.isFinite(maxDup2) &&
      java.lang.Double.isFinite(maxDup3) &&
      java.lang.Double.isFinite(maxTopShare),
    "repetition thresholds must be finite (they are codegen literals)")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "repetition_keep"

  override def nullSafeEval(s: Any): Any =
    GraftTextStats.repetitionKeep(s.asInstanceOf[UTF8String],
      maxDup2, maxDup3, maxTopShare)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.GraftTextStats.repetitionKeep(" +
        s"$c, $maxDup2, $maxDup3, $maxTopShare)")

  override protected def withNewChildInternal(
      newChild: Expression): RepetitionKeep = copy(child = newChild)
}

/** `simhash(text, bits, hexLen)` — the fused map-only document
  * SimHash (see [[GraftTextStats.simhash]]); stays inside
  * WholeStageCodegen, no explode, no exchange.
  */
case class SimHashDoc(child: Expression, bits: Int, hexLen: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(bits >= 1 && bits <= 60, "bits must be in [1, 60]")
  require(hexLen >= 1 && hexLen <= 15, "1..15 hex chars fit a long")
  // the token hash carries only 4·hexLen meaningful bits: past that,
  // every signature's high bits are constant 0 and a banded
  // self-join over them degenerates to ~N²/2 candidates with no
  // error (the hazard simhashAgg documents) — refuse at construction
  require(bits <= 4 * hexLen,
    s"simhash: $bits signature bits exceed the $hexLen-hex-char " +
      s"token hash's ${4 * hexLen} meaningful bits — raise hexLen")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def nullSafeEval(s: Any): Any =
    GraftTextStats.simhash(s.asInstanceOf[UTF8String], bits, hexLen)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.GraftTextStats.simhash($c, $bits, $hexLen)")

  override protected def withNewChildInternal(
      newChild: Expression): SimHashDoc = copy(child = newChild)
}

/** `token_tf(text)` → array<struct<term, tf>> — the fused map-only
  * per-document term-frequency table (see [[GraftTextStats.tokenTf]]).
  */
case class TokenTf(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "token_tf"

  override def nullSafeEval(s: Any): Any =
    GraftTextStats.tokenTf(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.GraftTextStats.tokenTf($c)")

  override protected def withNewChildInternal(
      newChild: Expression): TokenTf = copy(child = newChild)
}

/** `lang_id(text)` — the fused map-only four-language marker
  * heuristic (see [[GraftTextStats.langId]]): one tokenization pass
  * replaces four interpreted `filter`/`array_contains` lambda scans.
  */
case class LangIdNative(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override def nullSafeEval(s: Any): Any =
    GraftTextStats.langId(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.GraftTextStats.langId($c)")

  override protected def withNewChildInternal(
      newChild: Expression): LangIdNative = copy(child = newChild)
}

/** `quality_score(text)` — the fused map-only composite quality
  * score (see [[GraftTextStats.qualityScore]]); bit-identical to the
  * stopwordRatio/punctRatio/tokenCount Column composition (ExtSpec
  * pins the parity).
  */
case class QualityScoreNative(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quality_score"

  override def nullSafeEval(s: Any): Any =
    GraftTextStats.qualityScore(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.GraftTextStats.qualityScore($c)")

  override protected def withNewChildInternal(
      newChild: Expression): QualityScoreNative = copy(child = newChild)
}

object TextStatsColumns {
  def token_tf(c: Column): Column =
    ExpressionUtils.column(TokenTf(ExpressionUtils.expression(c)))

  def lang_id(c: Column): Column =
    ExpressionUtils.column(LangIdNative(ExpressionUtils.expression(c)))

  def quality_score(c: Column): Column =
    ExpressionUtils.column(
      QualityScoreNative(ExpressionUtils.expression(c)))

  def ngram_repetition_stats(c: Column, k: Int): Column =
    ExpressionUtils.column(
      NgramRepetitionStats(ExpressionUtils.expression(c), k))

  def simhash(c: Column, bits: Int, hexLen: Int): Column =
    ExpressionUtils.column(
      SimHashDoc(ExpressionUtils.expression(c), bits, hexLen))

  def repetition_keep(c: Column, maxDup2: Double, maxDup3: Double,
                      maxTopShare: Double): Column =
    ExpressionUtils.column(RepetitionKeep(ExpressionUtils.expression(c),
      maxDup2, maxDup3, maxTopShare))
}
