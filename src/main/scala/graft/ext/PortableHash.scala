package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE engine-portable hash idiom: a long from the first `hexLen` hex
  * chars of md5. Every operator that must be recomputable by an
  * external engine (dedup signatures, sampling buckets, hash ranks)
  * goes through this one definition, and every DuckDB oracle mirrors
  * it as `CAST('0x' || substr(md5(x), 1, hexLen) AS BIGINT)` — one
  * place to keep both sides in sync. 15 hex chars = 60 bits, the
  * widest prefix that stays positive in a signed long.
  *
  * Backed by the native codegen'd expression
  * (org.apache.spark.sql.graft.Md5PrefixLong): digest → long with no
  * hex-string/substring/radix-parse allocations per row. Bit parity
  * with the built-in `conv(substring(md5(c), 1, n), 16, 10)` form is
  * asserted in ExtSpec ("native md5PrefixLong matches the conv/substring
  * builtin form"), and the oracle rendering is unchanged.
  */
object PortableHash {

  def md5PrefixLong(c: Column, hexLen: Int): Column =
    org.apache.spark.sql.graft.HashColumns.md5_prefix_long(c, hexLen)

  /** The built-in-composition form the native kernel replaces — kept
    * as the parity reference for tests.
    */
  def md5PrefixLongBuiltin(c: Column, hexLen: Int): Column = {
    require(hexLen >= 1 && hexLen <= 15, "1..15 hex chars fit a long")
    conv(substring(md5(c), 1, hexLen), 16, 10).cast("long")
  }
}
