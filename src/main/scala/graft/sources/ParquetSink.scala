package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Layout-aware parquet writer — the table sink for 100 TB outputs
  * (the reference writes CSV and JDBC; a corpus-scale pipeline lands
  * partitioned, clustered parquet that downstream scans can prune).
  *
  * Three pruning levers, composed in one write:
  *   - `partitionBy` on low-cardinality columns → directory-level
  *     partition pruning (`key=value` paths);
  *   - `repartitionByRange` + `sortWithinPartitions` on a cluster key
  *     (e.g. [[graft.ext.Layout.zorder16]] of two filter columns) →
  *     tight per-row-group min/max footer stats, so range predicates
  *     on the clustered columns skip most row groups;
  *   - `maxRecordsPerFile` → bounded file sizes regardless of skew in
  *     the range partitioning (one oversized range cannot produce one
  *     giant file).
  *
  * The writer only arranges data and delegates the IO to Spark's
  * parquet sink — every executor writes its own partitions in
  * parallel, nothing is collected.
  */
object ParquetSink {

  /** Write `df` partitioned by `partitionCols`, clustered by
    * `clusterKey` within each output task, at most `maxRecordsPerFile`
    * rows per file. Returns the row count actually written, observed
    * on the write pass itself (`observe`) — a separate pre-write
    * count() would recompute the whole upstream DAG and, with a
    * non-deterministic upstream, could disagree with what the write
    * then materialized. Falls back to an explicit count only if the
    * listener never delivers (then the old caveat applies).
    */
  def write(df: DataFrame, path: String, partitionCols: Seq[String],
            clusterKey: Column, buckets: Int,
            maxRecordsPerFile: Long = 5000000L,
            mode: SaveMode = SaveMode.Overwrite): Long = {
    require(buckets > 0, s"buckets ($buckets) must be positive")
    val obs = org.apache.spark.sql.Observation()
    // observe ABOVE the range exchange: repartitionByRange runs a
    // boundary-sampling pass over its child, and a metrics node below
    // it would count every row twice (sample pass + write pass)
    val arranged = df
      .repartitionByRange(buckets,
        partitionCols.map(col) :+ clusterKey: _*)
      .sortWithinPartitions(partitionCols.map(col) :+ clusterKey: _*)
      .observe(obs, count(lit(1)).as("n"))
    arranged.write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
    org.apache.spark.sql.graft.ObservationAccess.await(obs, 10000)
      .map(_("n").asInstanceOf[Long])
      .getOrElse(df.count())
  }
}
