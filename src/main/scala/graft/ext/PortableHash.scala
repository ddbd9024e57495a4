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
  */
object PortableHash {

  def md5PrefixLong(c: Column, hexLen: Int): Column = {
    require(hexLen >= 1 && hexLen <= 15, "1..15 hex chars fit a long")
    conv(substring(md5(c), 1, hexLen), 16, 10).cast("long")
  }
}
