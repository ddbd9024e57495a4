package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-Lines ingestion — the interchange format LLM training corpora
  * actually ship in (one JSON object per line: The Pile, RedPajama,
  * Dolma all distribute this way).
  *
  * The load contract is EXPLICIT-SCHEMA, FAILFAST:
  *   - `spark.read.json` without a schema runs a full inference scan
  *     before the real read — at 100 TB that is a second pass over
  *     the corpus producing a schema you then can't trust (a field
  *     null in the sampled files types as string). Production
  *     ingestion declares the schema; this reader requires it.
  *   - FAILFAST surfaces a corrupt line as a load error instead of
  *     PERMISSIVE's silent null row — a malformed shard should stop
  *     the pipeline, not thin it.
  *
  * JSONL is line-splittable, so the read parallelizes like any text
  * source (`maxPartitionBytes` sizing, no whole-file decode barrier —
  * the property that makes the format the 100 TB interchange default
  * despite its verbosity).
  */
object JsonlSource {

  /** Stage `df` as JSONL under `root/name__fp<hex>` at most once per
    * `fingerprint` (same contract as the stage disk tier: a changed
    * input hashes to a new directory, stale siblings are deleted
    * before the write publishes via _SUCCESS). Returns the staged
    * path. Dev/test harness plumbing — production corpora already
    * ARRIVE as JSONL; this exists so the round-trip query can
    * exercise the reader against a corpus whose ground truth is
    * known.
    */
  def stage(df: DataFrame, root: String, name: String,
            fingerprint: Long): String = {
    val safe = name.map(c =>
      if (c.isLetterOrDigit || c == '.' || c == '-') c else '_')
    val dirName = s"${safe}__fp${java.lang.Long.toHexString(fingerprint)}"
    val dir = new java.io.File(root, dirName)
    val done = new java.io.File(dir, "_SUCCESS")
    if (!done.isFile) {
      def deleteTree(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
        f.delete(): Unit
      }
      Option(new java.io.File(root).listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.getName.startsWith(s"${safe}__fp") &&
          f.getName != dirName)
        .foreach(deleteTree)
      // tmp write + atomic rename (the stage disk tier's publish
      // protocol): a concurrent or crashed process never observes a
      // half-written corpus under the published name
      val tmp = new java.io.File(root, s".$dirName.tmp")
      deleteTree(tmp)
      df.write.mode("overwrite").json(tmp.toString)
      if (!tmp.renameTo(dir)) {
        // lost a publish race (or stale dir): keep whichever full
        // write landed, drop ours
        deleteTree(tmp)
        if (!done.isFile)
          throw new java.io.IOException(
            s"JsonlSource: could not publish $dir")
      }
    }
    dir.toString
  }

  /** Read JSONL at `path` with the declared `schema` — no inference
    * pass, corrupt lines fail the load (see object doc).
    */
  def read(spark: SparkSession, path: String,
           schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)
}
