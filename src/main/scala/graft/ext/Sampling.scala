package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Random sampling (`df.sample`) is non-reproducible across runs,
  * partitionings, and engines — useless for auditable corpus curation.
  * Hash sampling decides membership from a salted hash of the row's
  * stable id, so the same (salt, id) is in or out everywhere: re-runs,
  * re-partitions, incremental appends, and an independent engine all
  * agree. This is the standard web-corpus downsampling shape (keep
  * id-hash mod 100 < rate), a pure narrow projection+filter with no
  * shuffle — embarrassingly parallel at 100 TB.
  */
object Sampling {

  /** Salted hash bucket of `id` in [0, 100). md5 (not xxhash) so an
    * external auditor — or the DuckDB oracle — can recompute
    * membership without Spark.
    */
  def hashBucket(id: Column, salt: String): Column =
    PortableHash.md5PrefixLong(concat(lit(salt), id.cast("string")), 7) % 100

  /** Full-width salted hash rank of `id` (60 bits of md5) — the sort
    * key for fixed-SIZE sampling: the n smallest ranks per stratum are
    * a uniform deterministic sample of exactly n rows.
    */
  def hashRank(id: Column, salt: String): Column =
    PortableHash.md5PrefixLong(concat(lit(salt), id.cast("string")), 15)

  /** Exactly `n` rows per stratum (fewer if the stratum is smaller):
    * the n smallest hash ranks, ties broken by id. The window form
    * shuffles each stratum to one partition — for heavily skewed
    * strata sizes swap in the bounded TopKAggregator, which carries
    * ≤ n rows per (stratum, mapper) through the shuffle.
    */
  def fixedSizeStratifiedSample(df: DataFrame, id: Column, stratum: Column,
                                n: Int, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(stratum)
      .orderBy(hashRank(id, salt), id)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Keep rows whose hash bucket falls under their stratum's
    * percentage rate; strata not in `rates` use `defaultRate`.
    */
  def stratifiedHashSample(df: DataFrame, id: Column, stratum: Column,
                           rates: Map[String, Int], defaultRate: Int,
                           salt: String): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate): Column) {
      case (acc, (s, r)) => when(stratum === s, lit(r)).otherwise(acc)
    }
    df.filter(hashBucket(id, salt) < rate)
  }
}
