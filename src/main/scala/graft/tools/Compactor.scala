package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Small-file compaction — the unglamorous operation that keeps a 100 TB
  * lake scannable. Streaming sinks and fine-grained partitioned writes leave
  * thousands of KB-sized parquet files; every downstream scan then pays one
  * task + one open per file and the NameNode/listing pays the metadata.
  * Compaction rewrites a directory into ~`targetBytes`-sized files:
  *
  *  - file count is derived from the CURRENT total size, not guessed;
  *  - `repartition(n)` (round-robin) balances output sizes regardless of
  *    input skew — `coalesce(n)` would be shuffle-free but inherits upstream
  *    imbalance and can produce one giant file;
  *  - `maxRecordsPerFile` is deliberately NOT used as the primary knob: it
  *    caps records per file but cannot merge small inputs.
  *
  * Write-audit-publish: the rewrite lands in `dir + ".compact"` and is only
  * moved over the original after the row count verifies, so a failed
  * compaction never damages the source.
  */
object Compactor {

  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(conf)
    val totalBytes = fs.getContentSummary(path).getLength
    val nFiles = math.max(1, (totalBytes.toDouble / targetBytes).ceil.toInt)

    val df: DataFrame = spark.read.parquet(dir)
    val expected = df.count()
    val tmp = s"$dir.compact"
    df.repartition(nFiles).write.mode(SaveMode.Overwrite).parquet(tmp)

    val got = spark.read.parquet(tmp).count()
    require(got == expected,
      s"compaction row mismatch: $expected before, $got after — source untouched")
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    // publish via PARK-then-swap, not delete-then-rename: the original is
    // renamed aside first (atomic), the compacted dir renamed in (atomic),
    // and only then is the parked original deleted. A crash between the two
    // renames leaves the data recoverable at `dir + ".pre-compact"`; the
    // old delete-first sequence had a window where the data existed ONLY
    // under the temp name — invisible to readers of `dir` and gone entirely
    // if the temp dir was ever cleaned.
    val parked = new org.apache.hadoop.fs.Path(s"$dir.pre-compact")
    if (fs.exists(parked)) fs.delete(parked, true) // stale park from a crash
    require(fs.rename(path, parked), s"compaction park failed: $path -> $parked")
    if (!fs.rename(tmpPath, path)) {
      fs.rename(parked, path) // roll back: restore the original
      throw new IllegalStateException(s"compaction publish failed: $tmpPath -> $path")
    }
    fs.delete(parked, true)
    expected
  }
}
