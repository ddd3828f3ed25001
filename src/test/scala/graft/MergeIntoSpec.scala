package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MergeInto

class MergeIntoSpec extends AnyFunSuite {
  import TestSpark._

  test("merge exercises update, insert, and carry branches") {
    import spark.implicits._
    val target = Seq((1L, 10L, "base"), (2L, 20L, "base")).toDF("k", "v", "st")
    val source = Seq((2L, 5L), (3L, 7L)).toDF("k", "v")
    val out = MergeInto.merge(target, source, Seq("k"),
      setOnMatch = Map("v" -> (col("t_v") + col("s_v")), "st" -> lit("updated")),
      insertOnUnmatched = Map("v" -> col("s_v"), "st" -> lit("inserted")))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toList
    assert(out == List((1L, 10L, "base"), (2L, 25L, "updated"), (3L, 7L, "inserted")))
  }

  test("duplicate source keys raise the SQL cardinality violation") {
    import spark.implicits._
    val target = Seq((1L, 10L)).toDF("k", "v")
    val source = Seq((1L, 1L), (1L, 2L)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      MergeInto.merge(target, source, Seq("k"),
        setOnMatch = Map("v" -> col("s_v")),
        insertOnUnmatched = Map("v" -> col("s_v")))
    }
    assert(e.getMessage.contains("cardinality"))
  }

  test("NULL keys never match: they carry (target) and insert (source)") {
    import spark.implicits._
    val target = Seq((Some(1L), 10L), (None, 99L)).toDF("k", "v")
    val source = Seq((Some(1L), 5L), (None, 42L), (None, 43L)).toDF("k", "v")
    // duplicate NULL source keys are NOT a cardinality violation (they match
    // no target row), and each inserts its own row
    val out = MergeInto.merge(target, source, Seq("k"),
      setOnMatch = Map("v" -> col("s_v")),
      insertOnUnmatched = Map("v" -> col("s_v")))
      .orderBy(col("k").asc_nulls_last, col("v")).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1))).toList
    assert(out == List((1L, 5L), (-1L, 42L), (-1L, 43L), (-1L, 99L)))
  }

  test("WHEN MATCHED AND cond THEN DELETE drops the row; unmatched deletes are no-ops") {
    import spark.implicits._
    val target = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val source = Seq((1L, 0L, "D"), (2L, 25L, "U"), (9L, 0L, "D")).toDF("k", "v", "op")
    val out = MergeInto.merge(target, source, Seq("k"),
      setOnMatch = Map("v" -> col("s_v")),
      insertOnUnmatched = Map("v" -> col("s_v")),
      deleteOnMatch = Some(col("s_op") === "D"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toList
    // k=1 deleted, k=2 updated, k=3 carried, k=9's delete never inserts
    assert(out == List((2L, 25L), (3L, 30L)))
  }

  test("unlisted insert columns default to NULL like unlisted MERGE columns") {
    import spark.implicits._
    val target = Seq((1L, 10L, "x")).toDF("k", "v", "tag")
    val source = Seq((2L, 7L)).toDF("k", "v")
    val row = MergeInto.merge(target, source, Seq("k"),
      setOnMatch = Map("v" -> col("s_v")),
      insertOnUnmatched = Map("v" -> col("s_v")))
      .filter(col("k") === 2L).collect().head
    assert(row.getLong(1) == 7L && row.isNullAt(2))
  }
}
