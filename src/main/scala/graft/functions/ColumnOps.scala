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

  /** ppm share: ⌊10⁶·num ÷ den⌋ as BIGINT, with the product computed in
    * DECIMAL(38,0) so the 10⁶ blow-up can never wrap a long. Found by the
    * sf1 scale rehearsal: q179's class revenue is ~2.2e13 CENTS at sf1,
    * and `lit(1000000L) * cents` overflows int64 while passing every
    * smaller SF — the whole `1000000 * x div y` reporting idiom is only
    * long-safe below ~9.2e12, i.e. one rehearsal decade. `num`/`den`
    * themselves must still fit a long, which counts and cent/micro sums
    * do at any plausible corpus.  The DuckDB oracles need no twin:
    * `SUM(BIGINT)` is already HUGEINT there (see Protocol.wrapOracleTypes).
    */
  def ppm(num: Column, den: Column): Column = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    idiv(lit(1000000L).cast(d38) * num.cast(d38), den.cast(d38)).cast("long")
  }

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
