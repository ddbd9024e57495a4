package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table writer — the co-location lever for repeated large
  * joins at 100 TB: two tables hash-bucketed into the same bucket
  * count on the join key are joined with NO exchange on either side
  * (Spark matches `HashPartitioning(bucketCol, n)` against the join's
  * required distribution), and `sortBy` inside each bucket lets the
  * sort-merge join skip its sorts when each bucket holds one file.
  * A fact table joined by key every day amortizes ONE bucketed write
  * against every future join — the 100 TB answer to "this join
  * shuffles 100 TB every run".
  *
  * Uses the session catalog (`saveAsTable` — bucketing metadata lives
  * in the table definition; a plain parquet path cannot carry it)
  * with an explicit external `path`, so the data lands where the
  * caller says and the warehouse directory stays untouched.
  */
object BucketedTables {

  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCol: String, buckets: Int,
                    sorted: Boolean = true): Unit = {
    require(buckets > 0, s"buckets ($buckets) must be positive")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val w = df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, bucketCol)
    (if (sorted) w.sortBy(bucketCol) else w).saveAsTable(table)
  }
}
