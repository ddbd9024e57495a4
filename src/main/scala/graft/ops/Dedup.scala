package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-based deduplication operators.
  *
  * R2 (Angelo_ETL_Task.py:163-170): `pd.Series(values, index=keys)
  * .to_dict()` — on duplicate keys the LAST row in file order wins.
  * R4 (:179): `merged_df.LOINC_NUM.unique()` — one spine row per key.
  *
  * Scale notes: `lastWins` (groupBy + max_by) gets map-side partial
  * aggregation, so at 100 TB each shuffle partition only receives one
  * candidate row per (key, mapper) — strictly better than the window
  * variant, which shuffles every row then sorts. `lastWinsWindow` is
  * kept because it preserves non-aggregated columns untouched and is
  * the natural shape when many columns ride along.
  */
object Dedup {

  /** Last-wins per key via `max_by` — aggregation form, partial-agg
    * friendly. `valueCols` are collapsed to the row with the greatest
    * `ord` (use `struct(ts, tieBreak)` for a total order).
    */
  def lastWins(df: DataFrame, keys: Seq[String], ord: Column,
               valueCols: Seq[String]): DataFrame = {
    val picked = max_by(struct(valueCols.map(col): _*), ord).as("__picked")
    df.groupBy(keys.map(col): _*)
      .agg(picked)
      .select(keys.map(col) ++ valueCols.map(c => col(s"__picked.$c").as(c)): _*)
  }

  /** Last-wins per key via window row_number — keeps every column. */
  def lastWinsWindow(df: DataFrame, keys: Seq[String], ord: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord.desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** R4 distinct spine. */
  def distinctKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.select(keys.map(col): _*).distinct()
}
