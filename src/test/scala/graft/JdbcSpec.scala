package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Jdbc

/** JDBC round trip through embedded Derby (the one JDBC engine on Spark's
  * classpath — /opt/spark/jars/derby-10.16): write a DataFrame to a table,
  * read it back range-partitioned, compare. Mirrors the reference's
  * MySQL landing table (lambda_function.py:21-32) modulo the URL.
  */
class JdbcSpec extends AnyFunSuite {
  import TestSpark._

  private val dbDir = tmpDir("graft-derby")
  private val url = s"jdbc:derby:$dbDir/graftdb;create=true"
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  test("jdbc write + partitioned read round-trips rows and schema") {
    import spark.implicits._
    // derby.log otherwise lands in the project root
    System.setProperty("derby.system.home", dbDir)

    val src = (1 to 100).map(i => (i.toLong, s"sym$i", i * 1.5)).toDF("id", "symbol", "price")
    Jdbc.write(src, url, "ticks", Jdbc.props(driver), SaveMode.Overwrite, batchSize = 32)

    val back = Jdbc.read(spark, url, "ticks", Jdbc.props(driver),
      partitionColumn = "id", lowerBound = 1L, upperBound = 100L, numPartitions = 4)
    assert(back.rdd.getNumPartitions == 4) // genuinely parallel scan
    assert(back.count() == 100)

    // values survive the trip (Derby maps String -> CLOB; compare as string)
    val got = back.select($"id", $"symbol".cast("string"), $"price")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(got.head == (1L, "sym1", 1.5) && got.last == (100L, "sym100", 150.0))

    // pushed filter reaches the database: a bounded read returns the slice
    val slice = back.filter($"id" <= 10).count()
    assert(slice == 10)
  }

  test("jdbc append mode accumulates batches exactly once each") {
    import spark.implicits._
    // self-seeding (own table) so this test does not depend on the previous
    // test having run or on suite execution order
    val seed = Seq((1L, "a", 1.0)).toDF("id", "symbol", "price")
    Jdbc.write(seed, url, "ticks_append", Jdbc.props(driver), SaveMode.Overwrite)
    val batch = Seq((2L, "late", 9.99)).toDF("id", "symbol", "price")
    Jdbc.write(batch, url, "ticks_append", Jdbc.props(driver), SaveMode.Append)
    val n = Jdbc.read(spark, url, "ticks_append", Jdbc.props(driver), "id", 1L, 2L, 2)
      .count()
    assert(n == 2)
  }
}
