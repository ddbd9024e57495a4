package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed ranking shapes. */
object Ranking {

  /** Per-key top-n where the key is LOW-cardinality over unbounded
    * per-key input — the project-standard fix for the measured
    * global-window funnel (a `Window.partitionBy(key)` with a handful
    * of key values orders billions of rows through one task per key).
    *
    * Phase 1 ranks within (keys, shard) — `shards`-way parallel per
    * key — phase 2 re-ranks only the ≤ shards·n shard winners. Top-n
    * is distributive over any partition of the input, so the result
    * is row-identical to the single-window form.
    *
    * Caller contract: `order` must be a TOTAL order within a key
    * (append a unique tie-break column), and `shardOf` must be a
    * deterministic hash INDEPENDENT of the order columns (a shard
    * hash correlated with the rank order would concentrate winners
    * in few shards — still correct, but the parallelism collapses).
    * The rank lands in `rankCol` (1-based within keys); `__tp_*`
    * helper columns are dropped.
    */
  def twoPhaseTopN(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                   n: Int, shardOf: Column, rankCol: String = "__rn",
                   shards: Int = 32): DataFrame = {
    require(n >= 1, "n must be positive")
    require(shards >= 1, "shards must be positive")
    // the reserved-column guard every salted-hash sibling enforces:
    // withColumn would silently OVERWRITE a caller's column of the
    // same name and the final drop would remove it — data loss, not
    // an error
    require(!df.columns.exists(Set("__tp_shard", "__tp_rn1", rankCol)),
      s"input must not carry __tp_shard/__tp_rn1/$rankCol columns " +
        "(reserved by twoPhaseTopN)")
    val w1 = Window.partitionBy(keys :+ col("__tp_shard"): _*)
      .orderBy(order: _*)
    val w2 = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__tp_shard", pmod(shardOf, lit(shards)))
      .withColumn("__tp_rn1", row_number().over(w1))
      .filter(col("__tp_rn1") <= n)
      .withColumn(rankCol, row_number().over(w2))
      .filter(col(rankCol) <= n)
      .drop("__tp_shard", "__tp_rn1")
  }
}
