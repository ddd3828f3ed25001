package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 micro-batch streaming source generating deterministic trade
  * ticks — the live-mode replacement for the reference's WebSocket consumer
  * (`main.py:30-35`, SURVEY §2.1 R1: "live mode would be a DataSource V2
  * MicroBatchStream").
  *
  * Usage:
  * {{{
  * spark.readStream.format("graft.sources.TickGenProvider")
  *   .option("ticksPerBatch", "10000")   // ticks emitted per micro-batch
  *   .option("startMs", "1710000000000") // event-time origin (epoch ms)
  *   .option("msPerTick", "10")          // event-time spacing
  *   .load()
  * }}}
  *
  * Offsets are plain tick indices and generation is a pure function of the
  * index, so any replayed range yields byte-identical rows — exactly-once
  * with any idempotent sink. Restart semantics (probed): a restarted query
  * resumes from the committed offset with NO duplicates and NO errors;
  * generation progresses per trigger within a session (the `latestOffset`
  * counter is per-instance), so a fresh AvailableNow run against an
  * already-drained checkpoint is a clean no-op rather than a new batch. A
  * real exchange feed plugs in by replacing `TickGen.at` with a
  * network-fed buffer and keeping the offset/partition plumbing.
  */
class TickGenProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    graft.streaming.Ingest.tickSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TickGenTable(new CaseInsensitiveStringMap(properties))
}

/** The single source of truth for the deterministic tick formula — used by
  * the DSv2 source (row form), the rate-source stand-in
  * (`Ingest.syntheticTicks`, Column form) and `tools.IngestBench`, so the
  * three generators can never diverge.
  */
object TickGen {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Deterministic tick #i (pure function — replay-safe). Locale.ROOT: the
    * ingest chain casts these strings back to numbers, and a comma-decimal
    * locale would silently null every price.
    */
  def at(i: Long, startMs: Long, msPerTick: Long): (Long, String, String, String, Long, Boolean) = (
    i,
    "BTCUSDT",
    String.format(java.util.Locale.ROOT, "%.8f",
      Double.box(26000.0 + (i * 37 % 2000) / 100.0)),
    String.format(java.util.Locale.ROOT, "%.8f",
      Double.box((i * 13 % 100000) / 100000000.0)),
    startMs + i * msPerTick,
    i % 2 == 0)

  /** Column forms of the same formula (format_string is Locale.US — dot
    * decimal — matching Locale.ROOT above).
    */
  def priceCol(i: Column): Column =
    format_string("%.8f", lit(26000.0) + pmod(i * 37, lit(2000)) / 100.0)
  def qtyCol(i: Column): Column =
    format_string("%.8f", pmod(i * 13, lit(100000)) / 100000000.0)
  def makerCol(i: Column): Column = pmod(i, lit(2)) === 0
}

private[sources] class TickGenTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val ticksPerBatch = options.getLong("ticksPerBatch", 10000L)
  private val startMs = options.getLong("startMs", 1710000000000L)
  private val msPerTick = options.getLong("msPerTick", 10L)
  private val slices = options.getInt("numPartitions", 4)

  override def name(): String = "tickgen"
  override def schema(): StructType = graft.streaming.Ingest.tickSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema()
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new TickGenStream(ticksPerBatch, startMs, msPerTick, slices)
      }
    }
}

private[sources] case class TickOffset(index: Long) extends Offset {
  override def json(): String = index.toString
}

private[sources] case class TickRange(from: Long, until: Long) extends InputPartition

private[sources] class TickGenStream(
    ticksPerBatch: Long, startMs: Long, msPerTick: Long, slices: Int)
    extends MicroBatchStream {

  @volatile private var latest = 0L

  override def initialOffset(): Offset = TickOffset(0L)
  override def latestOffset(): Offset = { latest += ticksPerBatch; TickOffset(latest) }
  override def deserializeOffset(json: String): Offset = {
    val o = TickOffset(json.toLong)
    // recovery: never move latest backwards past a committed point
    latest = math.max(latest, o.index)
    o
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TickOffset].index
    val e = end.asInstanceOf[TickOffset].index
    val step = math.max(1L, (e - s + slices - 1) / slices)
    (s until e by step).map(b => TickRange(b, math.min(b + step, e)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TickReaderFactory(startMs, msPerTick)
}

private[sources] class TickReaderFactory(startMs: Long, msPerTick: Long)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[TickRange]
    new PartitionReader[InternalRow] {
      private var i = r.from - 1
      override def next(): Boolean = { i += 1; i < r.until }
      override def get(): InternalRow = {
        val (id, sym, p, q, t, m) = TickGen.at(i, startMs, msPerTick)
        InternalRow(id, UTF8String.fromString(sym), UTF8String.fromString(p),
          UTF8String.fromString(q), t, m)
      }
      override def close(): Unit = ()
    }
  }
}
