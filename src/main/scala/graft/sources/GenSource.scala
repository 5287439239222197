package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** Custom DataSource V2 connector: a deterministic row generator —
  * the "custom connector" capability of the engine, exercising the
  * full DSv2 surface a real external-system connector needs:
  * TableProvider → Table → ScanBuilder → Batch → InputPartition →
  * PartitionReader, plus column pruning
  * (SupportsPushDownRequiredColumns).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.GenSource")
  *     .option("rows", 100000).option("partitions", 8)
  *     .option("buckets", 16).load()
  * }}}
  *
  * Schema: (id BIGINT, bucket INT, val DOUBLE). Rows split evenly
  * into `partitions` independent InputPartitions, so a cluster reads
  * the table fully parallel with no driver materialization — the
  * shape any custom source must have at 100 TB. `val` derives from a
  * splitmix64 step of the id: deterministic everywhere, no RNG state.
  */
class GenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenSource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GenTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt,
      properties.getOrDefault("buckets", "16").toInt)
}

object GenSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("val", DoubleType, nullable = false)))

  /** splitmix64 finalizer — cheap, deterministic, well-mixed. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

private class GenTable(rows: Long, partitions: Int, buckets: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_gen($rows)"
  override def schema(): StructType = GenSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows, partitions, buckets)
}

private class GenScanBuilder(rows: Long, partitions: Int, buckets: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = GenSource.fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve generator column order regardless of projection order
    required = StructType(GenSource.fullSchema.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new GenScan(rows, partitions, buckets, required)
}

private class GenScan(rows: Long, partitions: Int, buckets: Int,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val per = (rows + partitions - 1) / partitions
    (0 until partitions).map { p =>
      GenPartition(p * per, math.min((p + 1) * per, rows))
        .asInstanceOf[InputPartition]
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(buckets, required.fieldNames)
}

private case class GenPartition(start: Long, end: Long) extends InputPartition

private class GenReaderFactory(buckets: Int, fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GenPartition]
    new PartitionReader[InternalRow] {
      private var cur = gp.start - 1
      override def next(): Boolean = { cur += 1; cur < gp.end }
      override def get(): InternalRow = {
        val vals = fields.map {
          case "id" => cur: java.lang.Long
          case "bucket" => (((GenSource.mix(cur) % buckets) + buckets)
            % buckets).toInt: java.lang.Integer
          case "val" =>
            (GenSource.mix(cur * 31 + 7) >>> 11) * 1.1102230246251565e-16:
              java.lang.Double // 2^-53: uniform in [0,1)
        }
        InternalRow.fromSeq(vals.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
