package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** R5 null-guards and F14 truncation (SURVEY §2.2, §2.3). */
object Guards {

  /** R5 — conjunctive NOT NULL / non-empty filter
    * (Angelo_ETL_Task.py:245-258): drop any row where one of `cols` is
    * null or the empty string. Pure Catalyst Filter; pushes past
    * projections when legal.
    *
    * Type-aware: the empty-string test applies to STRING columns only
    * — comparing a numeric column to '' would cast it (dropping every
    * row, or erroring under ANSI), so non-string columns get the null
    * check alone. This matches the reference, whose `!= ''` only ever
    * sees pandas object columns.
    */
  def nonNullNonEmpty(df: DataFrame, cols: Seq[String]): DataFrame = {
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    df.filter(cols.map { c =>
      if (types(c).typeName == "string")
        col(c).isNotNull && col(c) =!= ""
      else col(c).isNotNull
    }.reduce(_ && _))
  }

  /** F14 — varchar-cap truncation (Angelo_ETL_Task.py:123-127):
    * `value[:n]` — TRUNCATE semantics, not varchar reject semantics.
    * `substring` is a no-op on shorter strings and on nulls.
    */
  def truncate(c: Column, maxLen: Int): Column = substring(c, 1, maxLen)

  /** Apply a map of column -> cap to a DataFrame
    * (Angelo_ETL_Task.py:261-272: 12 columns, caps 10–2000).
    */
  def truncateAll(df: DataFrame, caps: Map[String, Int]): DataFrame =
    caps.foldLeft(df) { case (d, (c, n)) =>
      d.withColumn(c, truncate(col(c), n))
    }
}
