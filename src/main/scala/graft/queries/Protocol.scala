package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism protocol shared by every declared query (SURVEY §2.3):
  *
  *   (a) floating inputs are cast to DECIMAL(18,6) at the leaf, so all
  *       arithmetic/aggregation is exact and order-insensitive in both Spark
  *       and the DuckDB oracle;
  *   (b) every result carries a total-order ORDER BY over its output columns
  *       (or a unique key subset);
  *   (c) final numeric outputs are wrapped CAST(ROUND(x, 6) AS DECIMAL(18,6));
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

  /** Leaf cast: exact decimal arithmetic from here on. */
  def dec(c: Column): Column = c.cast(D)

  /** Final numeric output wrap. */
  def out6(c: Column): Column = round(c, 6).cast(D)

  /** count()/rank() → BIGINT, matching the DuckDB oracle's output type. */
  def big(c: Column): Column = c.cast("long")

  /** Timestamp (second precision) → canonical string. */
  def tsec(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Timestamp (microsecond precision) → canonical string. */
  def tmicro(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Date-like timestamp → canonical 'yyyy-MM-dd'. */
  def tdate(c: Column): Column = date_format(c, "yyyy-MM-dd")
}
