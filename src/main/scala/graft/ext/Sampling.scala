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
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 7),
      16, 10).cast("long") % 100

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
