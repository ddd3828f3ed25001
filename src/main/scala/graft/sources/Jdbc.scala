package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC table source/sink (SURVEY §2.2 matrix "JDBC scan"; the reference's
  * entire load path lands in a MySQL table — lambda_function.py:21-32, DDL in
  * start_all_pipeline.py:463-464). Spark's builtin JDBC relation provider
  * does the heavy lifting; this wrapper fixes the two decisions that matter
  * at scale and documents why:
  *
  *  - READS must be partitioned or the whole table arrives through ONE task:
  *    `read` requires (partitionColumn, lowerBound, upperBound,
  *    numPartitions) so every call generates numPartitions range-predicate
  *    queries that the database executes in parallel. An unpartitioned
  *    convenience read is deliberately not offered.
  *  - WRITES batch inserts (`batchsize`) and each task opens its own
  *    connection — numPartitions of the incoming DataFrame bounds the
  *    write parallelism, so `coalesce` upstream to what the database can
  *    absorb (the reference's RDS instance would want single digits).
  *
  * Exercised end-to-end against embedded Derby (the one JDBC engine shipped
  * with Spark's jars) in JdbcSpec; against MySQL the only change is the URL
  * and driver class.
  */
object Jdbc {

  def props(driver: String, extra: (String, String)*): Properties = {
    val p = new Properties()
    p.setProperty("driver", driver)
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Parallel range-partitioned scan: numPartitions concurrent queries, each
    * `WHERE partitionColumn BETWEEN ...` — the database sees bounded slices,
    * Spark sees numPartitions input splits.
    */
  def read(spark: SparkSession, url: String, table: String, connProps: Properties,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, connProps)

  /** Batched append/overwrite; write parallelism = df partition count.
    * The caller's Properties is copied, not mutated (a shared instance
    * would otherwise carry this call's batchsize into later uses).
    */
  def write(df: DataFrame, url: String, table: String, connProps: Properties,
      mode: SaveMode = SaveMode.Append, batchSize: Int = 1000): Unit = {
    val p = new Properties()
    p.putAll(connProps)
    p.setProperty("batchsize", batchSize.toString)
    df.write.mode(mode).jdbc(url, table, p)
  }

  // ---- MySQL endpoint surface ---------------------------------------------
  // The reference's store is Aurora MySQL 5.7 (start_all_pipeline.py:509-510;
  // loader at lambda_function.py:26). Spark ships a MySQL dialect
  // (JdbcDialects resolves it from the URL prefix), so against a real
  // endpoint the ONLY changes vs the Derby-tested path are the URL and
  // driver below — read/write/pushdown behavior is dialect-resolved.
  // JdbcSpec pins that resolution plus the dialect's identifier quoting and
  // tinyint mapping, so a live endpoint is config-only.

  /** MySQL Connector/J driver class (not shipped in this container — supply
    * the jar on the executor classpath at deploy time).
    */
  val MysqlDriver = "com.mysql.cj.jdbc.Driver"

  def mysqlUrl(host: String, port: Int = 3306, database: String = "binance"): String =
    s"jdbc:mysql://$host:$port/$database"

  /** The reference's landing-table DDL verbatim (start_all_pipeline.py:463-
    * 464) — execute over a plain JDBC Statement before the first write, as
    * the reference's control plane does. Read-side type mapping into Spark:
    * bigint→LongType, char(7)→StringType, float(7,2)/(7,5)→FloatType (via
    * Types.REAL), datetime→TimestampType (all Spark common JDBC mappings),
    * tinyint→ByteType (MySQL dialect) — the model's `maker` boolean is the
    * 0/1 conversion at the edge (model.Tables.btcusdtTsvSchema).
    */
  def btcusdtCreateMysqlDdl(table: String = "binance.BTCUSDT"): String =
    s"create table $table ( bid bigint null, parameter char(7) null, " +
      "price float(7,2) null, quantity float(7,5) null, " +
      "time datetime null, maker tinyint null )"
}
