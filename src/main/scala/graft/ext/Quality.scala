package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ/dbt-tests
  * shape): describe the table's contract as a list of checks, get one
  * (check_name, metric, threshold, pass) report row per check — the
  * validation gate a pipeline runs BEFORE committing a 100 TB stage,
  * and the reason bad shards stop at the boundary instead of
  * poisoning downstream joins.
  *
  * Plan shape at scale:
  *   - ALL row-level checks (completeness, range) compile into ONE
  *     aggregation pass over the table — conditional sums with
  *     map-side partials, the single-scan suite evaluation Deequ
  *     exists to provide. Metrics are integer parts-per-million
  *     (`x * 1000000 div n`), exact on any engine.
  *   - each uniqueness check is one partial-agg `groupBy(key).count`
  *     (a hot key combines before the shuffle) folded to the count of
  *     rows living in duplicated groups;
  *   - each referential check DISTINCTs both sides before the
  *     left-anti join, so the shuffle carries key cardinalities, not
  *     table volumes.
  *
  * An empty table passes row-level checks vacuously (metric pinned to
  * the full 1000000 ppm — Deequ's completeness-of-empty = 1.0
  * convention).
  */
object Quality {

  sealed trait Check { def name: String }

  /** `col` must be non-null in at least `minPpm` parts-per-million of
    * rows. */
  final case class Complete(name: String, col: String,
                            minPpm: Long = 1000000L) extends Check

  /** `col` must fall in [lo, hi] (nulls count as violations) in at
    * least `minPpm` ppm of rows. */
  final case class InRange(name: String, col: String, lo: Double,
                           hi: Double, minPpm: Long = 1000000L)
      extends Check

  /** No two rows may share a value of `cols`; the metric is the
    * number of rows living in duplicated key groups (0 = pass). */
  final case class Unique(name: String, cols: Seq[String]) extends Check

  /** Every non-null `col` value must appear in `refCol` of `ref`
    * (foreign-key containment); the metric is the count of DISTINCT
    * orphan values (0 = pass). */
  final case class SubsetOf(name: String, col: String, ref: DataFrame,
                            refCol: String) extends Check

  /** Evaluate the suite; returns one row per check, in suite order:
    * (check_name string, metric long, threshold long, pass boolean).
    * Row-level metrics are ppm-of-rows-satisfying with threshold
    * `minPpm` (pass = metric ≥ threshold); set-level metrics are
    * violation counts with threshold 0 (pass = metric = 0).
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty && checks.size <= 64,
      "a suite is 1..64 checks (each row check adds one agg column)")
    require(checks.map(_.name).distinct.size == checks.size,
      "check names must be unique (they key the report)")
    // names are interpolated into internal column identifiers — a
    // constrained charset keeps a caller-supplied name from ever
    // reading as expression syntax
    require(checks.forall(_.name.matches("[A-Za-z0-9_.-]+")),
      "check names must match [A-Za-z0-9_.-]+")
    val ord: Map[String, Int] =
      checks.map(_.name).zipWithIndex.toMap
    val rowChecks = checks.collect {
      case c: Complete => (c.name, col(c.col).isNotNull, c.minPpm)
      case c: InRange =>
        (c.name, col(c.col) >= c.lo && col(c.col) <= c.hi, c.minPpm)
    }
    val rowReport: Option[DataFrame] =
      if (rowChecks.isEmpty) None
      else {
        val aggs = count(lit(1)).as("__n") +: rowChecks.map {
          case (nm, pred, _) =>
            sum(when(pred, 1L).otherwise(0L)).as(s"__ok_$nm")
        }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val entries = rowChecks.map { case (nm, _, minPpm) =>
          val ppm = coalesce(
            expr(s"`__ok_$nm` * 1000000 div __n"), lit(1000000L))
          struct(lit(nm).as("check_name"), ppm.as("metric"),
            lit(minPpm).as("threshold"), (ppm >= minPpm).as("pass"),
            lit(ord(nm)).as("__ord"))
        }
        Some(one.select(explode(array(entries: _*)).as("__r"))
          .select(col("__r.*")))
      }
    val setReports: Seq[DataFrame] = checks.collect {
      case c: Unique =>
        val dups = df.groupBy(c.cols.map(col): _*)
          .agg(count(lit(1)).as("__n"))
          .agg(coalesce(sum(when(col("__n") > 1, col("__n"))), lit(0L))
            .as("metric"))
        dups.select(lit(c.name).as("check_name"), col("metric"),
          lit(0L).as("threshold"), (col("metric") === 0L).as("pass"),
          lit(ord(c.name)).as("__ord"))
      case c: SubsetOf =>
        val orphans = df.select(col(c.col).as("__v"))
          .filter(col("__v").isNotNull).distinct()
          .join(c.ref.select(col(c.refCol).as("__v")).distinct(),
            Seq("__v"), "left_anti")
          .agg(count(lit(1)).as("metric"))
        orphans.select(lit(c.name).as("check_name"), col("metric"),
          lit(0L).as("threshold"), (col("metric") === 0L).as("pass"),
          lit(ord(c.name)).as("__ord"))
    }
    // SUITE order, as documented — without the sort key, row-level
    // rows all land before set-level ones and a consumer zipping the
    // report positionally against its check list gates on the wrong
    // numbers (the union is grouped by check KIND, not suite order)
    (rowReport.toSeq ++ setReports).reduce(_ unionByName _)
      .orderBy(col("__ord")).drop("__ord")
  }
}
