package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 connector (SURVEY §2.1 connector seam, the API a
  * production Gmail/MercadoPago/JDBC source would implement): a
  * deterministic synthetic ledger of `rows` rows split into `slices`
  * parallel range partitions. Demonstrates the three scan optimizations a
  * scalable source must support:
  *
  *  - **Filter pushdown** ([[SupportsPushDownFilters]]): id range
  *    predicates narrow the generated range; fully-absorbed filters are
  *    reported pushed, everything else stays a residual for Spark.
  *  - **Partition pruning**: slices that fall outside the pushed range are
  *    never planned — `planInputPartitions` returns only overlapping,
  *    clipped ranges (observable as fewer RDD partitions).
  *  - **Column pruning** ([[SupportsPushDownRequiredColumns]]): the reader
  *    materializes only requested fields.
  *
  * Row math is integer-exact so any engine reproduces it:
  * bucket = id % 10; amount = ((id * 2654435761) % 100000) / 100.0.
  */
class LedgerSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-ledger"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LedgerSource.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new LedgerTable(properties.asScala.toMap)
}

object LedgerSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("amount", DoubleType, nullable = false)))

  def bucketOf(id: Long): Int = (id % 10).toInt
  def amountOf(id: Long): Double = ((id * 2654435761L) % 100000L) / 100.0
}

private[sources] class LedgerTable(props: Map[String, String])
    extends Table with SupportsRead {
  private val rows = props.getOrElse("rows", "1000").toLong
  private val slices = props.getOrElse("slices", "4").toInt
  private val rowsPerBatch = props.getOrElse("rowsPerBatch", "100").toLong
  override def name(): String = s"graft_ledger($rows)"
  override def schema(): StructType = LedgerSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LedgerScanBuilder(rows, slices, rowsPerBatch)
}

private[sources] class LedgerScanBuilder(rows: Long, slices: Int, rowsPerBatch: Long = 100)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private var lo = 0L          // generated range [lo, hi)
  private var hi = rows
  private var pushed = Array.empty[Filter]
  private var required = LedgerSource.fullSchema
  private var aggKinds: Option[Seq[String]] = None

  /** COUNT(*) / MIN(id) / MAX(id) with no grouping are answered from the
    * pushed range by arithmetic — zero rows generated, the connector
    * analogue of answering from parquet footer stats. Composes with
    * filter pushdown: the range is already narrowed when the aggregate
    * lands. Anything else is declined and Spark aggregates normally. */
  private def translate(agg: Aggregation): Option[Seq[String]] =
    if (agg.groupByExpressions.nonEmpty) None
    else {
      val kinds = agg.aggregateExpressions.toSeq.map {
        case _: CountStar => Some("count")
        case m: Min if m.column.describe() == "id" => Some("min_id")
        case m: Max if m.column.describe() == "id" => Some("max_id")
        case _ => None
      }
      if (kinds.nonEmpty && kinds.forall(_.isDefined)) Some(kinds.flatten) else None
    }
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translate(agg).isDefined
  override def pushAggregation(agg: Aggregation): Boolean =
    translate(agg) match {
      case some @ Some(_) => aggKinds = some; true
      case None => false
    }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (absorbed, residual) = filters.partition {
      case GreaterThan("id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThanOrEqual("id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThanOrEqual("id", _: java.lang.Long | _: java.lang.Integer) => true
      case EqualTo("id", _: java.lang.Long | _: java.lang.Integer) => true
      case _ => false
    }
    absorbed.foreach {
      case GreaterThan("id", v: Number) => lo = math.max(lo, v.longValue() + 1)
      case GreaterThanOrEqual("id", v: Number) => lo = math.max(lo, v.longValue())
      case LessThan("id", v: Number) => hi = math.min(hi, v.longValue())
      case LessThanOrEqual("id", v: Number) => hi = math.min(hi, v.longValue() + 1)
      case EqualTo("id", v: Number) =>
        lo = math.max(lo, v.longValue()); hi = math.min(hi, v.longValue() + 1)
      case _ => ()
    }
    pushed = absorbed
    residual // Spark re-evaluates only what the source did not absorb
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = aggKinds match {
    case Some(kinds) => LedgerAggScan(lo, hi, kinds)
    case None => LedgerScan(lo, hi, rows, slices, required, rowsPerBatch)
  }
}

/** Completely-pushed aggregate: one partition, one row, no data generated.
  * min/max are NULL over an empty range, matching SQL semantics. */
private[sources] case class LedgerAggScan(lo: Long, hi: Long, kinds: Seq[String])
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(kinds.map {
    case "count" => StructField("count", LongType, nullable = false)
    case k => StructField(k, LongType, nullable = true)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-ledger AGG[${kinds.mkString(",")}] range=[$lo,$hi)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(LedgerPartition(0, 0))
  override def createReaderFactory(): PartitionReaderFactory = {
    val (l, h, ks) = (lo, hi, kinds)
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = { val r = !emitted; emitted = true; r }
          override def get(): InternalRow = new GenericInternalRow(
            ks.map[Any] {
              case "count" => math.max(0L, h - l)
              case "min_id" => if (l < h) l else null
              case "max_id" => if (l < h) h - 1 else null
            }.toArray)
          override def close(): Unit = ()
        }
    }
  }
}

private[sources] case class LedgerScan(lo: Long, hi: Long, rows: Long, slices: Int,
                                       required: StructType,
                                       rowsPerBatch: Long = 100) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-ledger range=[$lo,$hi) of $rows, slices=$slices, cols=${required.fieldNames.mkString(",")}"

  /** Fixed-width slices of [0, rows); only those overlapping the pushed
    * [lo, hi) range are planned, clipped to it — pushdown prunes work
    * before any task launches. */
  override def planInputPartitions(): Array[InputPartition] = {
    val width = math.max(1L, (rows + slices - 1) / slices)
    (0L until rows by width).flatMap { start =>
      val s = math.max(start, lo)
      val e = math.min(start + width, hi)
      if (s < e) Some(LedgerPartition(s, e): InputPartition) else None
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    LedgerReaderFactory(required.fieldNames.toIndexedSeq)

  /** Micro-batch form of the same scan: offsets are positions in the id
    * range, each batch admits `rowsPerBatch` ids — the Kafka-offset shape
    * over the synthetic ledger. Supports Trigger.AvailableNow (drain to
    * the range end in bounded batches, then stop). */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new LedgerMicroBatchStream(lo, math.max(lo, hi), rowsPerBatch,
      required.fieldNames.toIndexedSeq)
}

private[sources] case class LedgerOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

private[sources] class LedgerMicroBatchStream(lo: Long, hi: Long, step: Long,
                                              cols: Seq[String])
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  private var target = hi // AvailableNow drains to the range end

  override def initialOffset(): Offset = LedgerOffset(lo)
  override def deserializeOffset(json: String): Offset = LedgerOffset(json.toLong)
  override def prepareForTriggerAvailableNow(): Unit = { target = hi }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(step)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("admission-controlled source")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[LedgerOffset].pos
    LedgerOffset(math.min(target, from + step))
  }
  override def reportLatestOffset(): Offset = LedgerOffset(target)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[LedgerOffset].pos, end.asInstanceOf[LedgerOffset].pos)
    if (s < e) Array(LedgerPartition(s, e)) else Array.empty
  }
  override def createReaderFactory(): PartitionReaderFactory = LedgerReaderFactory(cols)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class LedgerPartition(start: Long, end: Long) extends InputPartition

private[sources] case class LedgerReaderFactory(cols: Seq[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LedgerPartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      // NB: expected type Any per branch — without it Scala harmonizes the
      // Long/Int/Double branches to Double (weak lub) and corrupts the row
      override def get(): InternalRow = new GenericInternalRow(
        cols.map[Any] {
          case "id" => id
          case "bucket" => LedgerSource.bucketOf(id)
          case "amount" => LedgerSource.amountOf(id)
        }.toArray)
      override def close(): Unit = ()
    }
  }

  /** Vectorized path: rows are generated straight into column vectors in
    * 4k batches, so the scan feeds whole-stage codegen through
    * ColumnarToRow exactly like the parquet reader does — no per-row
    * boxing. The row-based createReader above remains the
    * streaming/fallback path. */
  override def supportColumnarReads(partition: InputPartition): Boolean = true

  override def createColumnarReader(
      partition: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}
    val p = partition.asInstanceOf[LedgerPartition]
    val batchSize = 4096
    new PartitionReader[ColumnarBatch] {
      private var pos = p.start
      private var current: ColumnarBatch = null
      override def next(): Boolean = {
        if (current != null) { current.close(); current = null }
        if (pos >= p.end) return false
        val n = math.min(batchSize.toLong, p.end - pos).toInt
        val vectors = cols.map { c =>
          val dt = c match {
            case "id" => LongType
            case "bucket" => IntegerType
            case "amount" => DoubleType
          }
          val v = new OnHeapColumnVector(n, dt)
          var i = 0
          while (i < n) {
            val rowId = pos + i
            c match {
              case "id" => v.putLong(i, rowId)
              case "bucket" => v.putInt(i, LedgerSource.bucketOf(rowId))
              case "amount" => v.putDouble(i, LedgerSource.amountOf(rowId))
            }
            i += 1
          }
          v: ColumnVector
        }.toArray
        current = new ColumnarBatch(vectors, n)
        pos += n
        true
      }
      override def get(): ColumnarBatch = current
      override def close(): Unit = if (current != null) current.close()
    }
  }
}
