package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    *
    * Out-of-range coordinates FAIL LOUDLY (the [[hilbert]] /
    * HilbertIndex contract): a negative input's arithmetic `% 2`
    * yields −1 terms and a >16-bit input silently drops its high
    * bits — either way the key no longer clusters what the caller
    * thinks it does, and a wrong LAYOUT key corrupts every scan's
    * pruning downstream with no error anywhere. Clamp or rescale
    * upstream (the layout queries pmod into range).
    */
  def zorder16(x: Column, y: Column): Column = {
    val (xl, yl) = (x.cast("long"), y.cast("long"))
    val key = (0 until 16).map { j =>
      (shiftright(xl, j) % 2) * lit(1L << (2 * j)) +
        (shiftright(yl, j) % 2) * lit(1L << (2 * j + 1))
    }.reduce(_ + _)
    when(xl < 0 || xl > 65535 || yl < 0 || yl > 65535,
      raise_error(concat(lit("zorder16: coordinate ("),
        xl.cast("string"), lit(", "), yl.cast("string"),
        lit(") outside [0, 65536) — clamp or rescale upstream"))))
      .otherwise(key)
  }

  /** The matching SQL text (DuckDB/ANSI) for oracle mirroring.
    *
    * The mirror assumes PRE-WRAPPED IN-RANGE inputs ([0, 65536)):
    * unlike [[zorder16]] it has no fail-loud guard, so an
    * out-of-range coordinate silently emits a bit-truncated key on
    * the oracle side only. Every current caller pmods both
    * coordinates into range before either side runs
    * (`layout_zorder` in GraphTimeQueries); a new caller must do
    * the same or the Spark side will raise while the oracle
    * doesn't.
    */
  def zorder16Sql(x: String, y: String): String =
    (0 until 16).map { j =>
      s"((($x >> $j) % 2) * ${1L << (2 * j)} + (($y >> $j) % 2) * ${1L << (2 * j + 1)})"
    }.mkString("(", " + ", ")")

  /** Hilbert index of two `bits`-bit columns — the locality-better
    * layout key (consecutive indices are always grid-adjacent, no
    * Z-curve diagonal jumps). Native codegen expression
    * (org.apache.spark.sql.graft.HilbertIndex): the per-bit rotation
    * state would make a Column-arithmetic closed form exponential in
    * tree size, so the loop runs as one generated-code kernel.
    */
  def hilbert(x: Column, y: Column, bits: Int): Column =
    org.apache.spark.sql.graft.HilbertColumns.hilbert_index(
      x.cast("long"), y.cast("long"), bits)

  /** The matching DuckDB SQL: the same quadrant-rotation loop
    * unrolled as one nested-subquery layer per bit (carrying x_i,
    * y_i, d_i), so both engines execute identical integer
    * arithmetic. `from` must expose columns aliased `x0` and `y0`.
    */
  def hilbertSql(bits: Int, from: String): String = {
    val n = 1L << bits
    val layers = (bits - 1 to 0 by -1).zipWithIndex.map {
      case (bitPos, layer) =>
        val s = 1L << bitPos
        val (xi, yi, di) = (s"x$layer", s"y$layer", s"d$layer")
        val (xo, yo, do_) = (s"x${layer + 1}", s"y${layer + 1}",
          s"d${layer + 1}")
        val rx = s"(CASE WHEN ($xi & $s) > 0 THEN 1 ELSE 0 END)"
        val ry = s"(CASE WHEN ($yi & $s) > 0 THEN 1 ELSE 0 END)"
        s"""SELECT $di + $s * $s * xor(3 * $rx, $ry) AS $do_,
           |  CASE WHEN $ry = 0 AND $rx = 1 THEN ${n - 1} - $yi
           |       WHEN $ry = 0 THEN $yi ELSE $xi END AS $xo,
           |  CASE WHEN $ry = 0 AND $rx = 1 THEN ${n - 1} - $xi
           |       WHEN $ry = 0 THEN $xi ELSE $yi END AS $yo""".stripMargin
    }
    val base = s"(SELECT x0, y0, CAST(0 AS BIGINT) AS d0 FROM $from)"
    val nested = layers.zipWithIndex.foldLeft(base) {
      case (inner, (sel, i)) => s"($sel FROM $inner t$i)"
    }
    s"SELECT d$bits AS hkey FROM $nested tf"
  }

  /** Small-file compaction plan: assign each input file to an output
    * bucket of ~`targetBytes` by cumulative size within its partition
    * key — the OPTIMIZE/compact planner every lakehouse table needs
    * once streaming writers have littered it with kilobyte parquet
    * files (each costing a task + a footer read per query).
    *
    * The assignment is the deterministic prefix-sum rule
    * `bucket = (cumsum_exclusive div targetBytes)`: files stay in
    * `fileId` order (preserving any within-partition sort the data
    * carries), every bucket except the last holds at least
    * `targetBytes` once closed, and the rule is a pure window
    * expression — the planner runs over the file MANIFEST (millions
    * of rows at 100 TB, not the data), one shuffle on the partition
    * key.
    *
    * @param files columns `part` (partition key), `file_id`, `bytes`
    */
  def compactionPlan(files: DataFrame, targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, "targetBytes must be positive")
    val w = Window.partitionBy("part").orderBy("file_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files.select(col("part"), col("file_id"), col("bytes"),
      (sum(col("bytes")).over(w) - col("bytes")).as("__cum0"))
      .select(col("part"), col("file_id"), col("bytes"),
        expr(s"__cum0 div ${targetBytes}L").as("out_bucket"))
  }
}
