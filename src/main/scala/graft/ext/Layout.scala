package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Storage-layout keys for 100 TB parquet: writing data ordered by a
  * Morton (Z-order) interleave of two filter columns clusters rows so
  * that BOTH columns' min/max footer stats stay tight — a range
  * predicate on either column then prunes most row groups (the
  * data-skipping trick Delta/Iceberg expose as `OPTIMIZE ZORDER BY`).
  * Usage at write time: `df.repartitionByRange(n, zkey).sortWithinPartitions
  * (zkey).write.parquet(...)`.
  */
object Layout {

  /** Morton interleave of two 16-bit non-negative fields into a
    * 32-bit key: x occupies even bits, y odd bits. A closed-form
    * 32-term integer expression — pure WholeStageCodegen arithmetic
    * (no higher-order function, which would run interpreted), spelled
    * identically in any SQL engine.
    */
  def zorder16(x: Column, y: Column): Column =
    (0 until 16).map { j =>
      (shiftright(x.cast("long"), j) % 2) * lit(1L << (2 * j)) +
        (shiftright(y.cast("long"), j) % 2) * lit(1L << (2 * j + 1))
    }.reduce(_ + _)

  /** The matching SQL text (DuckDB/ANSI) for oracle mirroring. */
  def zorder16Sql(x: String, y: String): String =
    (0 until 16).map { j =>
      s"((($x >> $j) % 2) * ${1L << (2 * j)} + (($y >> $j) % 2) * ${1L << (2 * j + 1)})"
    }.mkString("(", " + ", ")")
}
