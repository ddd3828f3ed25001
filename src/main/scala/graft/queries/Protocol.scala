package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType, StructType}

/** Determinism protocol shared by every declared query (SURVEY §2.3):
  *
  *   (a) floating inputs are cast to DECIMAL(18,6) at the leaf, so all
  *       arithmetic/aggregation is exact and order-insensitive in both Spark
  *       and the DuckDB oracle;
  *   (b) every result carries a total-order ORDER BY over its output columns
  *       (or a unique key subset);
  *   (c) final numeric outputs are wrapped CAST(ROUND(x, 6) AS DECIMAL(18,6)),
  *       then the TERMINAL representation is DOUBLE on both sides (see
  *       finalizeDoubles / wrapOracleDoubles below) — the driver's
  *       canonicalizer renders DECIMAL cells differently on its two sides
  *       (str(Decimal) vs shortest-form float repr), so e.g. `499978.590000`
  *       vs `499978.59` hash-mismatch despite identical values; identical
  *       float64 bits render identically under any canonicalizer;
  *   (d) timestamps are rendered as strings 'yyyy-MM-dd HH:mm:ss[.SSSSSS]' in
  *       UTC, so physical timestamp encodings can never diverge;
  *   (e) counts / ranks are cast to LongType to match DuckDB's BIGINT.
  *
  * Rationale: DuckDB's ROUND on DOUBLE is half-away-from-zero while Spark's
  * is HALF_UP — identical for the non-negative values in play — and decimal
  * division in DuckDB degrades to DOUBLE, so every division is immediately
  * rounded to 6 dp where a double carries ~15 significant digits of slack.
  */
object Protocol {
  val D: DecimalType = DecimalType(18, 6)

  /** OUTPUT decimal: wide integer headroom (32 digits). Leaf arithmetic
    * stays at D = (18,6) — widening the LEAF would change Spark's decimal
    * precision-propagation (e.g. (38,6)×(38,6) truncates scale where
    * (18,6)×(18,6) stays exact) — but the final `round(x, 6)` result
    * carries no further arithmetic, so the wide cast is lossless wherever
    * (18,6) was and additionally survives data-scale growth: the sf10
    * rehearsal's q117 fixpoint sum hit 1.12e12, which overflows (18,6)'s
    * 12 integer digits (a loud ANSI failure at 100× the gate SF). Gate
    * exactness is unaffected: finalizeDoubles' 2^53 terminal-range guard
    * still rejects any hash-gated value a double can't represent to 6 dp.
    */
  val DOut: DecimalType = DecimalType(38, 6)

  /** Leaf cast: exact decimal arithmetic from here on. */
  def dec(c: Column): Column = c.cast(D)

  /** Final numeric output wrap. */
  def out6(c: Column): Column = round(c, 6).cast(DOut)

  /** count()/rank() → BIGINT, matching the DuckDB oracle's output type. */
  def big(c: Column): Column = c.cast("long")

  /** Timestamp (second precision) → canonical string. */
  def tsec(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Timestamp (microsecond precision) → canonical string. */
  def tmicro(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Date-like timestamp → canonical 'yyyy-MM-dd'. */
  def tdate(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Terminal representation pass, applied centrally by QueryModule.queries:
    * every top-level DECIMAL/FLOAT output column → DOUBLE. All arithmetic up
    * to here stays decimal-exact (order-insensitive); only the final encoding
    * changes. round(x, 6) guarantees ≤6 dp; 6-dp decimals map to DISTINCT
    * float64s only below 2^53·10⁻⁶ ≈ 9.0e9, so above that magnitude two
    * values differing in the last decimal digit could collapse to one double
    * and a real last-digit divergence would slip the gate. Accepted
    * tradeoff: the driver's canonicalizer REQUIRES the double terminal (it
    * renders DECIMAL cells asymmetrically — see (c) above), the gate's SF
    * aggregates sit near that boundary only for the largest sums, and any
    * such divergence would be a decimal-arithmetic bug both engines would
    * have to make in lockstep to go unnoticed.
    */
  /** 2^53·10⁻⁶ — the largest magnitude below which every distinct 6-dp
    * decimal maps to a DISTINCT float64 (see finalizeDoubles doc). The
    * terminal-range guard below enforces it at runtime.
    */
  val ExactDoubleBound: Double = 9.007199254740992e9

  /** Session switch for the terminal-range guard below. ON wherever a hash
    * oracle gates results (Verify, specs, default sessions). A PERF-ONLY
    * rehearsal at a scale factor with no oracle (ScaleUp sf1/sf10, where
    * aggregate sums legitimately cross the bound) sets it "off" — the
    * guard protects gate exactness, not throughput measurement.
    */
  val GuardConfKey = "spark.graft.terminalGuard"

  def finalizeDoubles(df: DataFrame): DataFrame = {
    val guardOn =
      df.sparkSession.conf.get(GuardConfKey, "on") != "off"
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: DecimalType if guardOn =>
          // TERMINAL-RANGE GUARD: above ExactDoubleBound two 6-dp decimals
          // differing in the last digit can collapse to ONE double, so a
          // real divergence could hash-MATCH the oracle — both sides cast
          // identically and the gate cannot see it. Fail loudly instead of
          // silently capping exactness at 2^53.
          val c = col(f.name)
          when(abs(c) >= lit(ExactDoubleBound), raise_error(concat(
            lit(s"Protocol.finalizeDoubles: terminal decimal '${f.name}' = "),
            c.cast("string"),
            lit(s" exceeds the 2^53*1e-6 exactness bound ($ExactDoubleBound); " +
              "rescale the query output (e.g. report in millions) so the " +
              "double terminal stays exact"))))
            .otherwise(c.cast("double")).as(f.name)
        case _: DecimalType | FloatType => col(f.name).cast("double").as(f.name)
        case _                          => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** DuckDB twin of finalizeDoubles, generalized to the full terminal type
    * protocol: given the FINALIZED Spark schema, wrap the oracle SQL so
    *
    *   - every column Spark emits as DOUBLE is ::DOUBLE in the oracle too
    *     (the DECIMAL-rendering asymmetry, see (c) above), and
    *   - every column Spark emits as BIGINT/INT is ::BIGINT in the oracle.
    *     DuckDB types SUM(BIGINT) — and any arithmetic inheriting it, e.g.
    *     `1000000 * n // total` — as HUGEINT (INT128), which the driver's
    *     renderer treats differently from int64 even when the values are
    *     equal (the verified round-6 discriminator: all 35 hash-FAILs and
    *     none of the 195 passes had an uncast HUGEINT output column). All
    *     protocol values are ppm/micro-scale and fit BIGINT; an actual
    *     overflow would raise in DuckDB rather than pass silently.
    *
    * A pure projection over the inner query — DuckDB's insertion-order
    * preservation (default) keeps the inner ORDER BY intact.
    */
  def wrapOracleTypes(sql: String, finalSchema: StructType): String = {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    def castOf(f: org.apache.spark.sql.types.StructField): Option[String] =
      f.dataType match {
        case DoubleType              => Some("DOUBLE")
        case LongType | IntegerType  => Some("BIGINT")
        case _                       => None
      }
    if (!finalSchema.fields.exists(castOf(_).isDefined)) sql
    else {
      val sel = finalSchema.fields.map { f =>
        val n = "\"" + f.name + "\""
        castOf(f).map(t => s"CAST($n AS $t) AS $n").getOrElse(n)
      }.mkString(", ")
      s"SELECT $sel FROM (\n$sql\n) __graft_final"
    }
  }
}
