package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.Tables

/** The reference's load path (R10-R12) on Structured Streaming:
  *
  *  - R10 event-driven trigger → checkpointed streaming file source over the
  *    staging prefix with a `*.tsv` glob (`start_all_pipeline.py:445-451`);
  *  - R11 bulk load → `foreachBatch` append into a Parquet table
  *    (`lambda_function.py:26`'s LOAD DATA, set-oriented);
  *  - R12 archive-after-load → `cleanSource=archive`, which moves consumed
  *    files to `sourceArchiveDir` — the copy+delete pair of
  *    `lambda_function.py:38-48` done by the framework after commit. Note
  *    Spark's cleaner runs at the START of the next micro-batch, so a file
  *    is archived one batch after it is loaded (observed empirically); the
  *    guarantee is the same post-commit one the reference has, with a lag.
  *
  * Exactly-once upgrade (the reference double-loads on S3 event redelivery):
  * each batch writes to a `_batch=<id>` subdirectory of the table and drops a
  * commit marker; a replayed batchId sees its marker and skips. Readers see
  * the table as plain partitioned Parquet.
  */
object Loader {

  def start(spark: SparkSession, stagingDir: String, tableDir: String,
      archiveDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {

    val src = spark.readStream
      .schema(Tables.btcusdtTsvSchema)
      .option("sep", "\t")
      .option("header", "false")
      .option("pathGlobFilter", "*.tsv")
      .option("cleanSource", "archive")
      .option("sourceArchiveDir", archiveDir)
      .csv(stagingDir)
      .withColumn("maker", col("maker") === 1) // TSV 0/1 -> table boolean

    src.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        writeBatchIdempotent(df, tableDir, batchId, s"$checkpointDir/graft_commits")
      }
      .start()
  }

  /** Idempotent-by-batchId append: retrying a failed/replayed micro-batch
    * overwrites its own partition only, so rows are never duplicated. This
    * is the `foreachBatch` pattern from SURVEY §2.1 (exactly-once fix).
    *
    * Commit markers live under `markersDir`, which `start` ties to the
    * CHECKPOINT — not the table — so resetting the checkpoint (a routine
    * reprocess) also resets the markers: replayed batchIds then re-run and
    * dynamically overwrite their own `_batch=` partitions instead of being
    * silently skipped against a stale marker.
    *
    * `df` MUST derive from the SOURCE (as it does inside foreachBatch) —
    * never from the target table: the dynamic overwrite deletes the very
    * files a target-derived scan would be reading.
    */
  def writeBatchIdempotent(
      df: org.apache.spark.sql.DataFrame, tableDir: String, batchId: Long,
      markersDir: String = null): Unit = {
    val spark = df.sparkSession
    val mdir = if (markersDir == null) tableDir else markersDir
    val marker = new Path(mdir, s"_committed_$batchId")
    // markers may live on a different filesystem than the table (checkpoint
    // on HDFS, table on S3) — resolve the FS from the marker path itself
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      df.withColumn("_batch", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch")
        .parquet(tableDir)
      fs.create(marker, true).close()
    }
  }

  /** Read the loaded table back (hides the `_batch` bookkeeping column). */
  def readTable(spark: SparkSession, tableDir: String): org.apache.spark.sql.DataFrame =
    spark.read.parquet(tableDir).drop("_batch")

  /** Corrupt-tolerant read of the staging TSV contract (quote-free,
    * header-free — `main.py:61-67`): PERMISSIVE mode nulls the typed
    * columns of a malformed line and preserves the raw line in
    * `_corrupt_record`, so bad input quarantines instead of killing the
    * load (the reference's LOAD DATA would abort the whole file). Split on
    * `_corrupt_record IS NULL`: clean rows continue to the table, rejects
    * go to a quarantine sink with their original bytes intact.
    */
  def readTsvTolerant(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(
      Tables.btcusdtTsvSchema.fields :+
        org.apache.spark.sql.types.StructField(
          "_corrupt_record", org.apache.spark.sql.types.StringType))
    spark.read
      .schema(schema)
      .option("sep", "\t")
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("pathGlobFilter", "*.tsv")
      .csv(dir)
  }
}
