// In the org.apache.spark.sql package tree: custom Expressions need
// sql-private API surface (ExpressionUtils for Column construction)
// that has no public equivalent in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Digest-to-long helper for [[Md5PrefixLong]]. Called from generated
  * code, so it lives in a plain object with a static forwarder. One
  * MessageDigest per thread — `MessageDigest.getInstance` per row is
  * measurable at corpus scale.
  */
object GraftHashUtil {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The thread's reusable MD5 instance (reset before use). Shared
    * with GraftTextStats so the per-thread digest lives ONCE.
    */
  private[graft] def digest(): java.security.MessageDigest = {
    val m = md.get(); m.reset(); m
  }

  /** Fold the first `hexLen` hex chars of a finished digest into an
    * unsigned long — hex char i is the high (even i) or low (odd i)
    * nibble of digest byte i/2, big-endian. ONE definition of the
    * prefix fold for every hashing kernel.
    */
  private[graft] def hexPrefix(d: Array[Byte], hexLen: Int): Long = {
    var v = 0L
    var i = 0
    while (i < hexLen) {
      val b = d(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }

  /** ASCII `\s` membership — the Java regex set [ \t\n\x0B\f\r],
    * every member single-byte in UTF-8 so a byte scan cannot split a
    * multi-byte char. ONE definition of the tokenizer charset.
    */
  private[graft] def isWs(x: Byte): Boolean = x == ' ' || x == '\t' ||
    x == '\n' || x == 0x0b || x == '\f' || x == '\r'

  /** Token byte ranges over (already trimmed) UTF-8 bytes,
    * replicating `split(trim(c), "\\s+")` at limit = -1 EXACTLY:
    * [""] for the empty string, a leading empty token when the bytes
    * begin with `\s` (UTF8String.trim strips only 0x20, so tabs and
    * newlines survive), a trailing empty token when they end with
    * one. ONE definition carrying the tokenizer contract for every
    * kernel in this package — an edge-case fix here cannot silently
    * miss a kernel.
    */
  private[graft] def tokenRanges(b: Array[Byte]): (Array[Int], Array[Int]) = {
    val starts = new java.util.ArrayList[Integer]
    val ends = new java.util.ArrayList[Integer]
    if (b.length == 0) { starts.add(0); ends.add(0) }
    else {
      if (isWs(b(0))) { starts.add(0); ends.add(0) }
      var i = 0
      while (i < b.length) {
        while (i < b.length && isWs(b(i))) i += 1
        if (i < b.length) {
          starts.add(i)
          while (i < b.length && !isWs(b(i))) i += 1
          ends.add(i)
        }
      }
      if (isWs(b(b.length - 1))) { starts.add(b.length); ends.add(b.length) }
    }
    val n = starts.size()
    val sa = new Array[Int](n)
    val ea = new Array[Int](n)
    var j = 0
    while (j < n) { sa(j) = starts.get(j); ea(j) = ends.get(j); j += 1 }
    (sa, ea)
  }

  /** The first `hexLen` hex chars of md5(s), as an unsigned long —
    * bit-identical to `conv(substring(md5(s), 1, hexLen), 16, 10)`.
    */
  def md5PrefixLong(s: UTF8String, hexLen: Int): Long =
    hexPrefix(digest().digest(s.getBytes), hexLen)

  /** Kernel behind [[ShingleHashes]]: distinct `md5PrefixLong` hashes
    * of the k-token '_'-joined shingles, one byte pass. Tokenization
    * replicates `split(trim(c), "\\s+")` exactly — Java's `\s` is the
    * ASCII set [ \t\n\x0B\f\r] (each single-byte in UTF-8, so the
    * byte scan cannot split a multi-byte char), a string starting
    * with a separator yields a leading EMPTY token, one ENDING with a
    * separator yields a trailing empty token (Spark's split runs at
    * limit = -1, which KEEPS trailing empties — unlike Java's
    * String.split default), and an empty trimmed string yields [""].
    * Digests run straight off the token byte ranges (no shingle
    * string is ever built), so a hash is bit-identical to
    * `md5PrefixLong(tok_i ++ "_" ++ ... ++ tok_{i+k-1}, hexLen)`.
    */
  def shingleHashes(s: UTF8String, k: Int,
                    hexLen: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val b = s.trim().getBytes
    val (starts, ends) = tokenRanges(b)
    val n = starts.length
    val seen = new java.util.HashSet[java.lang.Long]
    val out = new java.util.ArrayList[java.lang.Long]
    val sep = Array('_'.toByte)
    var w = 0
    while (w + k <= n) {
      val m = digest()
      var j = 0
      while (j < k) {
        m.update(b, starts(w + j), ends(w + j) - starts(w + j))
        if (j < k - 1) m.update(sep, 0, 1)
        j += 1
      }
      val v = hexPrefix(m.digest(), hexLen)
      if (seen.add(v)) out.add(v)
      w += 1
    }
    val arr = new Array[Long](out.size())
    var z = 0
    while (z < arr.length) { arr(z) = out.get(z); z += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  /** Kernel behind [[BloomWordProbe]]: ALL k Carter–Wegman probe bits
    * of the fingerprint set in the folded word mask? `consts` carries
    * (a, a² mod p, a³ mod p, b) per hash row — supplied by the caller
    * from the SAME family the filter was built with
    * (graft.ext.CountMin.rowConsts), which is what makes the
    * no-false-negative contract hold. Arithmetic mirrors
    * CountMin.bucket verbatim: base-2^31 digits of the (non-negative,
    * < 2^60) md5-prefix item, each product reduced mod p = 2^31−1
    * before summing; bit reads use unsigned shifts, matching the
    * declarative form's sign-safe `& 1`.
    */
  def bloomProbe(s: UTF8String, words: Array[Long], consts: Array[Long],
                 k: Int, mBits: Int): Boolean = {
    val P = 2147483647L
    val it = md5PrefixLong(s, 15)
    val d0 = it & 0x7fffffffL
    val d1 = (it >>> 31) & 0x7fffffffL
    val d2 = it >>> 62
    var j = 0
    while (j < k) {
      val pos = ((consts(4 * j) * d0 % P + consts(4 * j + 1) * d1 % P +
        consts(4 * j + 2) * d2 % P + consts(4 * j + 3)) % P) % mBits
      if (((words((pos >>> 6).toInt) >>> (pos & 63).toInt) & 1L) == 0L)
        return false
      j += 1
    }
    true
  }
}

/** `shingle_hashes(text, k, hexLen)` — the fused native form of the
  * dedup front-end `array_distinct → explode → md5_prefix_long` over
  * `TextAnalysis.shingles(text, k)`: ONE pass over the UTF-8 bytes
  * tokenizes (replicating `split(trim(c), "\\s+")` exactly, leading
  * empty token and all), digests each k-token window joined with '_'
  * directly from the token byte ranges, and emits the DISTINCT
  * hashes in first-occurrence order. No intermediate token array, no
  * shingle strings, no string-set distinct — the declarative
  * composition allocates three strings per shingle on the hottest
  * path of every corpus dedup. Hash values are bit-identical to
  * `md5_prefix_long(shingle)` (ExtSpec pins the parity), so the
  * DuckDB oracle rendering is unchanged.
  *
  * Distinctness is on the HASH, not the string: two shingles
  * colliding in `4·hexLen` bits collapse here where array_distinct
  * kept both — indistinguishable downstream, where consumers group
  * or min by the hash anyway.
  */
case class ShingleHashes(child: Expression, k: Int, hexLen: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1 && k <= 16, "k must be in [1, 16]")
  require(hexLen >= 1 && hexLen <= 15, "1..15 hex chars fit a long")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(s: Any): Any =
    GraftHashUtil.shingleHashes(s.asInstanceOf[UTF8String], k, hexLen)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.GraftHashUtil.shingleHashes($c, $k, $hexLen)")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashes = copy(child = newChild)
}

/** Native form of the engine's portable-hash idiom (see
  * graft.ext.PortableHash): a long from the first `hexLen` hex chars
  * of md5. The built-in composition `conv(substring(md5(c), 1, n),
  * 16, 10)` materializes a 32-char hex string, a substring of it, and
  * a radix-parsed copy per row — three string allocations on the
  * hottest path of every dedup signature and sampling bucket. This
  * expression goes digest → long directly and stays inside
  * WholeStageCodegen. Value parity with the built-in form is asserted
  * bit-for-bit in ExtSpec ("native md5PrefixLong matches the
  * conv/substring builtin form"), and the DuckDB oracle rendering
  * (`CAST('0x' || substr(md5(x), 1, n) AS BIGINT)`) is unchanged.
  */
case class Md5PrefixLong(child: Expression, hexLen: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(hexLen >= 1 && hexLen <= 15, "1..15 hex chars fit a long")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix_long"

  override def nullSafeEval(s: Any): Any =
    GraftHashUtil.md5PrefixLong(s.asInstanceOf[UTF8String], hexLen)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.GraftHashUtil.md5PrefixLong($c, $hexLen)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5PrefixLong = copy(child = newChild)
}

/** The ENTIRE Bloom membership probe as one expression node: hash the
  * string fingerprint (md5-prefix long), compute the k Carter–Wegman
  * bucket positions, and test the bits against the folded word mask —
  * TRUE only if all k are set. The equivalent declarative composition
  * is ~500 expression nodes referencing a 4096-long array literal
  * three times; measured, the Catalyst optimizer + AQE re-optimization
  * spent ~0.07 s PER PLANNING PASS walking it (and the big predicate
  * re-plans once per adaptive stage), dominating the whole
  * bloom-filtered anti join at bench scale. One opaque node restores
  * flat planning cost; the generated code is a tight loop over k.
  *
  * NULL-intolerant like the hash it wraps: a NULL fingerprint probes
  * NULL (callers coalesce to the semantics they need — the anti-join
  * path coalesces to false, "provably absent").
  */
case class BloomWordProbe(child: Expression, words: Array[Long],
                          consts: Array[Long], k: Int, mBits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1 && consts.length == 4 * k,
    s"consts must carry (a, a2, a3, b) per hash row: " +
      s"${consts.length} != 4*$k")
  require(mBits > 0,
    "mBits must be positive — an empty filter would turn the " +
      "construction-time guard into a per-row modulo-by-zero")
  require(words.length.toLong * 64 == mBits,
    s"words (${words.length}) must pack exactly mBits ($mBits) bits")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_word_probe"

  override def nullSafeEval(s: Any): Any =
    GraftHashUtil.bloomProbe(s.asInstanceOf[UTF8String], words, consts,
      k, mBits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("bloomWords", words, "long[]")
    val cs = ctx.addReferenceObj("bloomConsts", consts, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.GraftHashUtil.bloomProbe" +
        s"($c, $w, $cs, $k, $mBits)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomWordProbe = copy(child = newChild)

  // content-based equality for the array parameters: the case-class
  // default compares arrays by REFERENCE, so two probes built from
  // separately-collected (but equal) word masks never compare equal —
  // defeating semanticEquals-driven common-subexpression elimination
  // and exchange reuse, and re-running the per-row MD5 once per
  // occurrence
  override def equals(other: Any): Boolean = other match {
    case o: BloomWordProbe =>
      child == o.child && k == o.k && mBits == o.mBits &&
        java.util.Arrays.equals(words, o.words) &&
        java.util.Arrays.equals(consts, o.consts)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(k), Int.box(mBits),
      Int.box(java.util.Arrays.hashCode(words)),
      Int.box(java.util.Arrays.hashCode(consts)))
}

object HashColumns {
  def md5_prefix_long(c: Column, hexLen: Int): Column =
    ExpressionUtils.column(Md5PrefixLong(ExpressionUtils.expression(c), hexLen))

  def shingle_hashes(c: Column, k: Int, hexLen: Int): Column =
    ExpressionUtils.column(
      ShingleHashes(ExpressionUtils.expression(c), k, hexLen))

  def bloom_word_probe(c: Column, words: Array[Long],
                       consts: Array[Long], k: Int, mBits: Int): Column =
    ExpressionUtils.column(BloomWordProbe(
      ExpressionUtils.expression(c), words, consts, k, mBits))
}

/** Reliable-checkpoint files of SUPERSEDED iterative rounds are never
  * cleaned under default config
  * (`spark.cleaner.referenceTracking.cleanCheckpoints` is false), so a
  * 40-round contraction would leave ~80 edge-set copies in the
  * checkpoint bucket. This bridge reaches the `LogicalRDD` behind a
  * `Dataset.checkpoint` result and deletes its files once the round's
  * output has been checkpointed past — best effort: a delete failure
  * only leaves garbage, never breaks the computation.
  */
object CheckpointFiles {
  def delete(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach { rdd =>
      rdd.getCheckpointFile.foreach { path =>
        try {
          val p = new org.apache.hadoop.fs.Path(path)
          p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
            .delete(p, true)
          ()
        } catch { case scala.util.control.NonFatal(_) => () }
      }
    }
}

/** `Observation.getOrEmpty` is private[sql]; this bridge exposes the
  * non-blocking read to the iterative operators (graft.ext.DedupOps)
  * that poll a checkpoint job's observed metrics with a fallback,
  * rather than risking an indefinite block on `Observation.get`.
  */
object ObservationAccess {
  def getOrEmpty(o: org.apache.spark.sql.Observation): Map[String, Any] =
    o.getOrEmpty

  /** Poll for the observed metrics row after an action has returned:
    * the listener bus delivers it asynchronously, typically within
    * milliseconds. None after `timeoutMs` — callers fall back to an
    * explicit recompute instead of blocking forever.
    */
  def await(o: org.apache.spark.sql.Observation,
            timeoutMs: Long): Option[Map[String, Any]] = {
    var waited = 0L
    var got = o.getOrEmpty
    while (got.isEmpty && waited < timeoutMs) {
      Thread.sleep(5); waited += 5
      got = o.getOrEmpty
    }
    if (got.isEmpty) None else Some(got)
  }
}
