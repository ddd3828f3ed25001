package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY §7.4 "skewed keys → salting or AQE
  * skew-join").
  *
  * AQE's skew-join split handles sort-merge skew automatically; salting is
  * the manual lever for the cases AQE can't touch (skewed AGGREGATION keys,
  * broadcast-ineligible skewed joins, streaming state). Shape:
  *
  *  - fact side: add `_salt = pmod(hash(entire row id cols), n)` — spreads
  *    one hot key over n reducers;
  *  - dim side: explode to all n salt values (n× dim amplification — cheap,
  *    dims are small);
  *  - join on (key, _salt).
  */
object SaltedJoin {

  /** Deterministic salt from the full fact row PLUS the input partition id:
    * task retries that recompute part of the map stage re-derive the SAME
    * salt (a positional scheme like monotonically_increasing_id re-salts
    * recomputed rows, double-counting or losing them downstream; the
    * partition id alone is stable for deterministic sources — file scans —
    * because a retry re-reads the same split). The row columns spread a hot
    * key's rows across lanes; the partition id keeps the spread alive even
    * in the degenerate case where the frame carries ONLY the key columns
    * (then a pure row hash is constant per key and every hot-key row would
    * land in one lane — no skew protection at all).
    */
  private def saltCol(df: DataFrame, salts: Int) =
    pmod(xxhash64(df.columns.map(col).toSeq :+ spark_partition_id().cast("long"): _*),
      lit(salts.toLong)).cast("int")

  /** Salted equi-join of a skewed fact to a small-ish dim on `key`. */
  def join(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    val saltedFact = fact.withColumn("_salt", saltCol(fact, salts))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Two-phase skew-proof aggregation: count per key via a salted partial.
    * groupBy((key, salt)) combines map-side; the second groupBy(key) merges
    * n small partials — no reducer ever sees one giant key group.
    */
  def skewProofCount(df: DataFrame, key: String, salts: Int): DataFrame = {
    df.withColumn("_salt", saltCol(df, salts))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("n"))
  }
}
