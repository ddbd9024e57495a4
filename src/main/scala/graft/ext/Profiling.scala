package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-distribution diagnostics — the profile you run BEFORE a 100 TB
  * join or groupBy to find the keys that will melt a reducer. */
object Profiling {

  /** Top-`k` heaviest keys of `key` with exact counts and integer
    * parts-per-million shares (ppm avoids a float fold whose last ulp
    * depends on fold order).
    *
    * Scale shape: one hash aggregation over the input (map-side
    * partial — a hot key combines before the shuffle, so profiling
    * skew never suffers the skew it measures), then
    * TakeOrderedAndProject for the top k — per-partition heaps, only
    * k rows per partition reach the driver-side merge. Rank and
    * cumulative share are computed by a broadcast triangular
    * self-join over the ALREADY-CAPPED k rows (k² ≤ 400 comparisons,
    * all map-side) — deliberately not an unpartitioned window, the
    * one plan shape this engine bans globally (PlanSpec's sweep)
    * because on unbounded input it funnels everything into one task.
    *
    * Returns (key, n, rank, share_ppm, cum_ppm), rank 1-based by
    * (n DESC, key).
    */
  def keySkewProfile(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val counts = df.select(key.as("key")).groupBy("key")
      .agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum("n").as("__tot"))
    val top = counts.orderBy(col("n").desc, col("key")).limit(k)
    val peers = top.select(col("key").as("__k2"), col("n").as("__n2"))
    // each row pairs with every peer at-or-before it in (n DESC, key)
    // order — including itself, so no row is lost to the inner join
    top.join(broadcast(peers),
        col("__n2") > col("n") ||
          (col("__n2") === col("n") && col("__k2") <= col("key")))
      .groupBy("key", "n")
      .agg(count(lit(1)).cast("int").as("rank"),
        sum("__n2").as("__cum"))
      .crossJoin(broadcast(tot))
      .select(col("key"), col("n"), col("rank"),
        expr("n * 1000000 div __tot").as("share_ppm"),
        expr("__cum * 1000000 div __tot").as("cum_ppm"))
  }
}
