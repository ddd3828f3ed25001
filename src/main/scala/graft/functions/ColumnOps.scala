package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column arithmetic that is easy to get wrong with the operator API.
  *
  * Spark's `Column./` is ALWAYS double division (Catalyst `Divide`); dividing
  * two BIGINTs and truncating the result flips boundaries once values
  * approach 2^53 — a silent off-by-one on bucket ids, tile numbers, or any
  * other quotient-derived index. The round-2 review found that trap
  * independently in RangeJoin and GlobalRank; every integral quotient goes
  * through here instead.
  */
object ColumnOps {

  /** Integral division (SQL `div`, truncates toward zero). Long-exact. */
  def idiv(a: Column, b: Column): Column = call_function("div", a, b)

  /** True floor division for a possibly-negative long `a` and positive
    * literal divisor: subtracting the positive pmod makes the numerator an
    * exact multiple, so `div` equals floor even below zero.
    */
  def floorDiv(a: Column, b: Long): Column = {
    val w = lit(b)
    idiv(a - pmod(a, w), w)
  }

  /** Low 64 bits of a hex substring as BIGINT — the md5-derived integer
    * idiom (deterministic, engine-portable: DuckDB's
    * `CAST(('0x' || substr(h, pos, len)) AS BIGINT)` matches it). `len` must
    * be ≤ 15 hex chars so the value stays below 2^60 (sign-safe headroom
    * for downstream modular arithmetic).
    */
  def hexLong(hex: Column, pos: Int, len: Int): Column = {
    require(len <= 15, s"hexLong: $len hex chars can overflow a signed long")
    conv(substring(hex, pos, len), 16, 10).cast("long")
  }
}
