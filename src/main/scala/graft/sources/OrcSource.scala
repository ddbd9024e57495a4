package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC ingestion — the other first-class columnar interchange format
  * (Hive/Trino-centric lakehouses publish ORC where Spark-centric
  * ones publish parquet). Spark's built-in reader gives the same
  * scan-level machinery parquet gets — column pruning, predicate
  * pushdown into stripe/row-group indexes, vectorized decode — so at
  * 100 TB an ORC corpus costs what a parquet one does; the round-trip
  * query (`src_orc_roundtrip`) proves content survives the writer +
  * reader pair against the parquet ground truth via the same census
  * the JSONL round-trip uses.
  *
  * Unlike JSONL there is no inference pass to suppress (the schema
  * lives in the file footer), so the loud-failure contract here is
  * SCHEMA DRIFT: [[read]] compares the footer schema against the
  * DECLARED one field by field and fails with the difference — an
  * ORC corpus whose producer changed a column type must fail the
  * load, not null-fill or silently cast ([[graft.sources.WarcSource]]
  * discipline).
  */
object OrcSource {

  /** Stage `df` as ORC under `root/name__fp<hex>` at most once per
    * `fingerprint` — the same publish protocol as
    * [[JsonlSource.stage]] (stale-sibling cleanup, tmp write, atomic
    * rename, _SUCCESS sentinel).
    */
  def stage(df: DataFrame, root: String, name: String,
            fingerprint: Long): String =
    Staging.publishOnce(root, name, fingerprint, "OrcSource") { tmp =>
      df.write.mode("overwrite").orc(tmp.toString)
    }

  /** Read ORC at `path`, failing LOUDLY if the footer schema drifts
    * from the declared one (names or types, in order — nullability
    * is storage metadata and not compared).
    */
  def read(spark: SparkSession, path: String,
           schema: StructType): DataFrame = {
    val df = spark.read.orc(path)
    val got = df.schema.fields.map(f => (f.name, f.dataType))
    val want = schema.fields.map(f => (f.name, f.dataType))
    if (!got.sameElements(want))
      throw new IllegalArgumentException(
        s"OrcSource: schema drift at $path — footer " +
          s"${got.map(t => s"${t._1}:${t._2.simpleString}").mkString(", ")} " +
          s"vs declared " +
          s"${want.map(t => s"${t._1}:${t._2.simpleString}").mkString(", ")}")
    df
  }
}
