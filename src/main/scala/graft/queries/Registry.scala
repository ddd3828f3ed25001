package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a Spark DataFrame builder plus (when SQL-expressible)
  * the equivalent ANSI SQL the driver runs in DuckDB as the correctness
  * oracle. `oracle == None` → driver records a weaker rows-only check.
  */
final case class Declared(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def declared: Seq[Declared]

  /** Builders with the terminal-representation pass applied: decimal/float
    * outputs become DOUBLE (Protocol.finalizeDoubles) so the driver's
    * canonicalizer renders both gate sides identically.
    */
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    declared.map { d =>
      d.name -> { (s: SparkSession, dir: String) =>
        Protocol.finalizeDoubles(d.build(s, dir))
      }
    }.toMap

  final def oracleSql: Map[String, String] =
    declared.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
