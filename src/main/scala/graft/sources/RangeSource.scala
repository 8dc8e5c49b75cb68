package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Minimal-but-real DataSource V2 connector (`sources/` completeness
  * beyond the file formats + JDBC): a deterministic synthetic range
  * table — every engine needs one for soak tests, reproducible
  * fixtures, and connector-API demonstrations. Usage:
  *
  * {{{
  * spark.read.format("graft.sources.RangeSource")
  *   .option("start", 0).option("end", 1000).option("slices", 8)
  *   .load()
  * }}}
  *
  * Schema: id BIGINT, val DOUBLE (= id·0.5), tag STRING (= "t" + id%10)
  * — all pure functions of id, so results are reproducible across any
  * partitioning.
  *
  * Scale/Spark-native design points, each exercised by RangeSourceSpec:
  *  - `planInputPartitions` splits the range into `slices` independent
  *    partitions — the connector (not the engine) declares parallelism,
  *    exactly how a real source exposes its shard/split structure.
  *  - `SupportsPushDownRequiredColumns`: Catalyst pushes the projection
  *    INTO the connector; a `select(id)` never materializes val/tag
  *    (the reader consults the pruned schema per row). This is the V2
  *    half of the PushedFilters/ReadSchema contract PlanHygieneSpec
  *    asserts on the parquet side.
  *  - Readers are per-partition iterators creating InternalRows
  *    directly — no driver materialization, no Row→InternalRow
  *    conversion on the hot path.
  */
class RangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeSource.fullSchema

  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new RangeTable(
      properties.getOrDefault("start", "0").toLong,
      properties.getOrDefault("end", "1000").toLong,
      properties.getOrDefault("slices", "4").toInt)
}

object RangeSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false)))
}

private[sources] class RangeTable(start: Long, end: Long, slices: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_range($start,$end)"
  override def schema(): StructType = RangeSource.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeScanBuilder(start, end, slices)
}

private[sources] class RangeScanBuilder(start: Long, end: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = RangeSource.fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new RangeScan(start, end, slices, required)
}

private[sources] class RangeScan(start: Long, end: Long, slices: Int,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, slices)
    val total = math.max(0L, end - start)
    (0 until n).map { i =>
      val lo = start + total * i / n
      val hi = start + total * (i + 1) / n
      RangeInputPartition(lo, hi): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(required)
}

private[sources] case class RangeInputPartition(lo: Long, hi: Long)
    extends InputPartition

private[sources] class RangeReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RangeInputPartition]
    // resolved once per partition, not per row
    val fields = required.fieldNames
    new PartitionReader[InternalRow] {
      private var cur = p.lo - 1
      override def next(): Boolean = { cur += 1; cur < p.hi }
      override def get(): InternalRow = {
        val values = fields.map {
          case "id" => java.lang.Long.valueOf(cur)
          case "val" => java.lang.Double.valueOf(cur * 0.5)
          case "tag" => UTF8String.fromString("t" + (cur % 10))
          case other => throw new IllegalArgumentException(
            s"graft_range: unknown column $other")
        }
        new GenericInternalRow(values.asInstanceOf[Array[Any]])
      }
      override def close(): Unit = ()
    }
  }
}
