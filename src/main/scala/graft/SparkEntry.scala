package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one named entry per implemented operator (SURVEY §2
  * ids + extension operators) to a `(spark, sfDir) => DataFrame`;
  * `oracleSql` mirrors each in DuckDB SQL where expressible.
  */
object SparkEntry {

  /** Flagship: the reference's whole transform() as one Spark plan. */
  def entry(spark: SparkSession): DataFrame =
    queries("i2b2_pipeline")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ RelationalQueries.queries ++
      ExtensionQueries.queries

  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ RelationalQueries.oracleSql ++
      ExtensionQueries.oracleSql
}
