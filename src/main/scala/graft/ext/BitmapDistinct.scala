package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Roaring-STYLE compressed integer sets for EXACT-distinct
  * incremental rollup — the one aggregate the algebraic partials
  * family (`Relational.rollupPartials`: n/sum/min/max) cannot
  * maintain: distinct counts don't add, but their SETS union, so the
  * mergeable artifact is a compressed bitmap per group (the
  * warehouse-native pattern — ClickHouse `groupBitmap`, Doris
  * BITMAP columns). From scratch on the published container IDEA
  * (Chambi, Lemire et al., "Better bitmap performance with Roaring
  * bitmaps", 2016) — NOT the library or its interchange format:
  *
  *   - values partition by their high 16 bits into containers;
  *   - a container holds its low 16 bits as a SORTED short array
  *     while ≤ 4096 entries (2 B/value) and as a 1024-long bitmap
  *     above (fixed 8 KiB — beyond 4096 the bitmap is smaller);
  *   - serialized: `[n][per container: key, form, count, payload]`,
  *     containers in key order, big-endian.
  *
  * Union walks both container lists once; cardinality sums stored
  * counts without touching payloads. Values must be unsigned 32-bit
  * (0 ≤ v < 2³²) — ids beyond that should hash or re-key first.
  *
  * The dataflow mirrors `rollupPartials`/`mergeRollups`: a partial
  * BUILDS one bitmap per group from that slice's rows (cost bounded
  * by the slice's per-group distinct count, the floor for any exact
  * distinct), a refresh UNIONS partials-sized artifacts — never
  * rescanning history — and the count is exact, bit-identical to a
  * full `count(DISTINCT)` rescan by set-union associativity.
  */
object BitmapDistinct {

  private val ArrayMax = 4096

  /** Serialize a group's values (any order, duplicates fine). */
  def build(values: Iterable[Long]): Array[Byte] = {
    val byKey = new java.util.TreeMap[Int, java.util.TreeSet[Integer]]()
    values.foreach { v =>
      require(v >= 0 && v <= 0xffffffffL,
        s"bitmap distinct: value $v outside unsigned 32-bit range")
      byKey.computeIfAbsent((v >>> 16).toInt,
        _ => new java.util.TreeSet[Integer]())
        .add((v & 0xffff).toInt): Unit
    }
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.writeInt(byKey.size())
    byKey.forEach { (key, lows) =>
      d.writeInt(key)
      if (lows.size() <= ArrayMax) {
        d.writeByte(0); d.writeInt(lows.size())
        lows.forEach(lo => d.writeShort(lo): Unit)
      } else {
        d.writeByte(1); d.writeInt(lows.size())
        val words = new Array[Long](1024)
        lows.forEach(lo => words(lo >>> 6) |= 1L << (lo & 63))
        words.foreach(d.writeLong)
      }
    }
    out.toByteArray
  }

  private final case class Cont(key: Int, count: Int, form: Int,
                                arr: Array[Int], words: Array[Long])

  /** An array container's 64Ki-bit word image — the shared
    * converter both [[union]] and [[intersectCardinality]] merge
    * through (ONE copy, so a bit-packing fix cannot make the two
    * operations disagree on the same serialized container).
    */
  private def words(c: Cont): Array[Long] =
    if (c.form == 1) c.words
    else {
      val w = new Array[Long](1024)
      c.arr.foreach(lo => w(lo >>> 6) |= 1L << (lo & 63))
      w
    }

  private def readContainers(b: Array[Byte]): Array[Cont] = {
    val d = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(b))
    val n = d.readInt()
    Array.fill(n) {
      val key = d.readInt()
      val form = d.readByte().toInt
      val count = d.readInt()
      form match {
        case 0 => Cont(key, count, 0,
          Array.fill(count)(d.readUnsignedShort()), null)
        case 1 => Cont(key, count, 1, null, Array.fill(1024)(d.readLong()))
        case other => throw new IllegalArgumentException(
          s"bitmap distinct: unknown container form $other")
      }
    }
  }

  /** Exact distinct count — container counts are stored, so this
    * never touches payloads.
    */
  def cardinality(b: Array[Byte]): Long = {
    if (b.isEmpty) return 0L
    val d = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(b))
    val n = d.readInt()
    var total = 0L
    var i = 0
    while (i < n) {
      d.readInt() // key
      val form = d.readByte()
      val count = d.readInt()
      total += count
      d.skipBytes(if (form == 0) 2 * count else 8192): Unit
      i += 1
    }
    total
  }

  /** Set union of two serialized bitmaps — one merge walk over the
    * key-ordered container lists, each merged container re-compressed
    * to its cheaper form.
    */
  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val ca = readContainers(a)
    val cb = readContainers(b)
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Long])]
    var i = 0
    var j = 0
    while (i < ca.length || j < cb.length) {
      if (j >= cb.length || (i < ca.length && ca(i).key < cb(j).key)) {
        merged += ((ca(i).key, words(ca(i)))); i += 1
      } else if (i >= ca.length || cb(j).key < ca(i).key) {
        merged += ((cb(j).key, words(cb(j)))); j += 1
      } else {
        val wa = words(ca(i)); val wb = words(cb(j))
        val w = new Array[Long](1024)
        var k = 0
        while (k < 1024) { w(k) = wa(k) | wb(k); k += 1 }
        merged += ((ca(i).key, w)); i += 1; j += 1
      }
    }
    d.writeInt(merged.size)
    for ((key, w) <- merged) {
      var count = 0
      var k = 0
      while (k < 1024) { count += java.lang.Long.bitCount(w(k)); k += 1 }
      d.writeInt(key)
      if (count <= ArrayMax) {
        d.writeByte(0); d.writeInt(count)
        k = 0
        while (k < 1024) {
          var word = w(k)
          while (word != 0) {
            d.writeShort((k << 6) | java.lang.Long.numberOfTrailingZeros(word))
            word &= word - 1
          }
          k += 1
        }
      } else {
        d.writeByte(1); d.writeInt(count)
        w.foreach(d.writeLong)
      }
    }
    out.toByteArray
  }

  /** Exact intersection cardinality of two serialized bitmaps — the
    * audience-overlap measure ("users who did BOTH"), the exact twin
    * of `agg_hll_intersect`'s sketch estimate: one merge walk over
    * the key-ordered container lists, AND-ing only the containers
    * both sides hold.
    */
  def intersectCardinality(a: Array[Byte], b: Array[Byte]): Long = {
    if (a.isEmpty || b.isEmpty) return 0L
    val ca = readContainers(a)
    val cb = readContainers(b)
    var i = 0
    var j = 0
    var total = 0L
    while (i < ca.length && j < cb.length) {
      if (ca(i).key < cb(j).key) i += 1
      else if (cb(j).key < ca(i).key) j += 1
      else {
        val wa = words(ca(i)); val wb = words(cb(j))
        var k = 0
        while (k < 1024) {
          total += java.lang.Long.bitCount(wa(k) & wb(k))
          k += 1
        }
        i += 1; j += 1
      }
    }
    total
  }

  private[graft] val intersectUdf =
    udf((a: Array[Byte], b: Array[Byte]) => intersectCardinality(a, b))

  /** Binary-union Aggregator over serialized bitmaps — the refresh
    * merge. Inputs per group are PARTIALS (a handful per key), so the
    * per-row deserialize-union is a container walk over
    * artifact-sized data, not row-sized.
    */
  final class UnionAgg extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = Array.emptyByteArray
    override def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] =
      union(b, a)
    override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] =
      union(x, y)
    override def finish(b: Array[Byte]): Array[Byte] = b
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** One bitmap partial per group over this slice of rows:
    * (keyCols..., bitmap, n_distinct). The build cost is the slice's
    * per-group distinct census — the floor for ANY exact distinct —
    * and the artifact is what a refresh stores and merges.
    */
  def distinctPartials(df: DataFrame, keyCols: Seq[String],
                       value: Column): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val spark = df.sparkSession
    import spark.implicits._
    val grouped = df
      .select(keyCols.map(col) :+ value.cast("long").as("__v"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(collect_set(col("__v")).as("__vs"))
    val toBitmap = udf((vs: Seq[Long]) => build(vs))
    grouped.select(keyCols.map(col) :+
      toBitmap(col("__vs")).as("bitmap"): _*)
      .withColumn("n_distinct", cardinalityUdf(col("bitmap")))
  }

  /** Union partials of the same grain: one hash aggregation over
    * artifact-sized inputs, exact by set-union associativity.
    */
  def mergeDistinctPartials(partials: Seq[DataFrame],
                            keyCols: Seq[String]): DataFrame = {
    require(partials.nonEmpty, "need at least one partial")
    val unionUdaf = udaf(new UnionAgg, Encoders.BINARY)
    val merged = partials.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*)
      .agg(unionUdaf(col("bitmap")).as("bitmap"))
    merged.withColumn("n_distinct", cardinalityUdf(col("bitmap")))
  }

  private val cardinalityUdf =
    udf((b: Array[Byte]) => cardinality(b))
}
