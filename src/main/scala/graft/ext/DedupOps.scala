package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, exact and
  * fuzzy. Everything is expressed as group-bys and bucket joins —
  * the shapes that scale: no pairwise O(n²) work ever happens outside
  * a blocking bucket, and every aggregation is partial-agg friendly.
  *
  * The hash family is md5-based (standard across engines) so every
  * stage is oracle-checkable; swap `md5` for `xxhash64` for ~4×
  * faster hashing at cluster scale (same shapes, weaker oracle).
  */
object DedupOps {

  /** Exact dedup: canonical row id + duplicate count per distinct
    * value of `key`. groupBy, not dropDuplicates: deterministic
    * canonical pick (min id) and a free dup-count, at the same single
    * shuffle.
    */
  def exact(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(key.as("dup_key"))
      .agg(min(id).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: `n` independent permutations approximated by
    * seeded md5; element i = min over shingles of md5(i:shingle).
    * Null/empty shingle arrays yield an empty signature.
    */
  def minhash(shingles: Column, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => array_min(transform(shingles,
        s => md5(concat(i.cast("string"), lit(":"), s)))))

  /** LSH band keys: split an n-element signature into `bands` bands of
    * n/bands rows, hash each band. Two docs sharing ANY band key are
    * candidate pairs — the classic shingle→minhash→band→bucket-join
    * pipeline.
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat(b.cast("string"), lit("|"),
        concat_ws(",", slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))))))

  /** Band keys computed straight from the shingle array: band b hashes
    * only its own `rowsPerBand` signature elements, so each of the n
    * minhash elements is computed exactly once per row. (Materializing
    * the full signature first and slicing it inside the banding lambda
    * would re-evaluate the whole signature per band — lambda bodies
    * are re-evaluated per element and Catalyst inlines single-use
    * projections into them.)
    */
  private def bandKeysFromShingles(shingles: Column, bands: Int,
                                   rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat(b.cast("string"), lit("|"),
        concat_ws(",", transform(
          sequence(b * rowsPerBand, b * rowsPerBand + (rowsPerBand - 1)),
          i => array_min(transform(shingles,
            s => md5(concat(i.cast("string"), lit(":"), s)))))))))

  /** Candidate near-dup pairs via MinHash LSH: explode band keys,
    * self-join on (band index, key), emit distinct (a < b) pairs.
    * The join is a bucket join on the band hash — at 100 TB each
    * bucket is tiny, so the shuffle is the only cost; no cross join.
    */
  def lshCandidatePairs(df: DataFrame, id: Column, shingles: Column,
                        numHashes: Int = 12, bands: Int = 4): DataFrame = {
    val rows = numHashes / bands
    val banded = df
      .select(id.as("__id"),
        posexplode(bandKeysFromShingles(shingles, bands, rows))
          .as(Seq("__band", "__key")))
    val a = banded.select(col("__band"), col("__key"), col("__id").as("id_a"))
    val b = banded.select(col("__band"), col("__key"), col("__id").as("id_b"))
    a.join(b, Seq("__band", "__key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** n-gram Jaccard similarity of two shingle arrays (set semantics). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** SimHash bit-j contribution of one 60-bit token hash: +1/-1. */
  def simhashTokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** SimHash over exploded tokens: callers explode tokens, group by
    * doc, and agg `simhashAgg(bits)` — the explode/conditional-sum
    * shape keeps partial aggregation (map-side combine) at scale.
    * Returns the aggregate expression producing the `bits`-bit
    * simhash as a long.
    */
  def simhashAgg(tokenHash: Column, bits: Int = 32): Column = {
    val bitCols = (0 until bits).map { j =>
      when(sum(((shiftright(tokenHash, j) % 2) * 2 - 1)) > 0,
        lit(1L << j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Hamming distance between two simhash longs (near-dup test). */
  def hammingDistance(a: Column, b: Column, bits: Int = 32): Column =
    (0 until bits).map { j =>
      ((shiftright(a, j) % 2) =!= (shiftright(b, j) % 2)).cast("int")
    }.reduce(_ + _)
}
