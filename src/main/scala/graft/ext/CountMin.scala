package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch realized as plain dataflow (Cormode & Muthukrishnan
  * 2005): `depth` hash rows × `width` buckets, cell counts from one
  * grouped aggregation, point estimates as the min over rows. No
  * binary sketch blob and no UDAF — the cell table IS the sketch, it
  * partial-aggregates map-side, merges by summing cells (union of
  * streams = same groupBy), and an external engine can recompute every
  * cell. The table is at most `depth·width` rows regardless of input
  * size; estimates never under-count, and over-count by ~2N/width with
  * probability 2^-depth.
  *
  * Hash rows use a Carter–Wegman-style polynomial family over the
  * Mersenne prime p = 2^31−1, evaluated on the item's BASE-2^31
  * DIGITS: `((a·d0 + a²·d1 + a³·d2 + b) mod p) mod width` with each
  * product reduced mod p before summing. Digits, not `x mod p`: a
  * plain `a·(x mod p)+b` family collides x and x+p in EVERY row —
  * a deterministic full-row collision for 64-bit id domains that
  * defeats the 2^-depth bound outright. Two distinct longs differ in
  * some digit, so a row collides only where its `a` is a root of the
  * ≤3-degree difference polynomial: ≤ 3/p per row, independent
  * across rows. Pure integer arithmetic that stays in
  * WholeStageCodegen (no md5, no string building: hashing 10^12 rows
  * is multiply-add, not a digest) and is reproducible verbatim in
  * any SQL engine. Operands stay under 2^62, so ANSI overflow
  * checking never trips.
  *
  * Per-row (a, b) are splitmix64 draws of the row index, materialized
  * as driver-side literals (`rowConsts`) — NOT an affine function of
  * the row index, which would make every hash row a scalar multiple of
  * the same `g(x)` (rows correlated: any two items congruent mod p
  * collide in every row, defeating the 2^-depth error bound).
  */
object CountMin {

  val P = 2147483647L // 2^31 − 1

  /** splitmix64 finalizer (Steele et al. 2014, public domain) — the
    * standard seed-scrambler; JVM long arithmetic wraps, which is the
    * intended mod-2^64 semantics (driver-side only, never in-plan).
    */
  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Independent per-row (a, b): a ∈ [1, p−1], b ∈ [0, p−1]. */
  def rowConsts(depth: Int): Seq[(Long, Long)] =
    (0 until depth).map { j =>
      (java.lang.Math.floorMod(splitmix64(2L * j), P - 1) + 1,
        java.lang.Math.floorMod(splitmix64(2L * j + 1), P))
    }

  /** Bucket of non-negative integer `item` in hash row `seed`
    * (element_at is 1-indexed; the literal const arrays stay in
    * codegen like any other literal).
    */
  def bucket(seed: Column, item: Column, depth: Int, width: Int): Column = {
    // a width of 0 would turn the final `% width` into NULL buckets
    // under non-ANSI — the table groups them and estimate's equi-join
    // silently drops them (NULL != NULL), zeroing every estimate with
    // no error anywhere; depth 0 explodes an empty seed array and the
    // probe rows simply vanish. Both are loud caller bugs, not
    // degenerate sketches. depth ≤ 64: each row is a driver-side
    // literal pair — a runaway depth is a plan-size bomb, and 2^-64
    // already exceeds any error budget.
    require(depth >= 1 && depth <= 64,
      s"count-min depth ($depth) must be in [1, 64]")
    require(width >= 1, s"count-min width ($width) must be >= 1")
    val cs = rowConsts(depth)
    def pick(f: ((Long, Long)) => Long): Column =
      element_at(array(cs.map(c => lit(f(c))): _*), seed.cast("int") + 1)
    val a = pick(_._1)
    val a2 = pick(c => c._1 * c._1 % P)           // a² mod p, driver-side
    val a3 = pick(c => c._1 * c._1 % P * c._1 % P) // a³ mod p
    val b = pick(_._2)
    val x = item.cast("long")
    // base-2^31 digits of the non-negative item (>> and & are the
    // portable div/mod for non-negative operands on both engines)
    val d0 = x.bitwiseAND(lit(0x7fffffffL))
    val d1 = shiftright(x, 31).bitwiseAND(lit(0x7fffffffL))
    val d2 = shiftright(x, 62)
    // each product ≤ (2^31)(2^31) = 2^62; reduced mod p before the
    // ≤ 2^33 sum — nothing approaches the long boundary
    ((a * d0 % P + a2 * d1 % P + a3 * d2 % P + b) % P) % width
  }

  /** The sketch: one (seed, bucket, n) row per non-empty cell. */
  def table(df: DataFrame, item: Column, depth: Int, width: Int): DataFrame =
    df.select(item.as("__it"))
      .select(col("__it"),
        explode(array((0 until depth).map(lit): _*)).as("__seed"))
      .groupBy(col("__seed"),
        bucket(col("__seed"), col("__it"), depth, width).as("__b"))
      .agg(count(lit(1)).as("n"))

  /** Point estimates for `items` (any frame with an `item` column):
    * min cell count across the sketch's hash rows. The sketch side is
    * at most depth·width rows, so the join broadcasts. An empty cell
    * counts as 0 (left join + zero-fill), so an item the stream never
    * carried estimates 0 instead of vanishing or reading a colliding
    * row's count.
    */
  def estimate(sketch: DataFrame, items: DataFrame, item: Column,
               depth: Int, width: Int): DataFrame = {
    val taken = Set("__seed", "__b", "__n", "cms_n")
    require(!items.columns.exists(taken),
      s"items frame must not carry ${taken.mkString("/")} columns")
    val probes = items.select(col("*"),
      explode(array((0 until depth).map(lit): _*)).as("__seed"))
      .withColumn("__b", bucket(col("__seed"), item, depth, width))
    probes
      .join(broadcast(sketch.withColumnRenamed("n", "__n")),
        Seq("__seed", "__b"), "left")
      .groupBy(items.columns.map(col): _*)
      .agg(min(coalesce(col("__n"), lit(0L))).as("cms_n"))
  }
}
