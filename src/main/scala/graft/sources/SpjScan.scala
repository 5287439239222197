package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch

/** STORAGE-PARTITIONED JOIN support for `bucket(n, col)` TxTables —
  * the scan-side contract that lets two same-bucketed tables join
  * with ZERO Exchange (Spark's SPJ, SPARK-37375):
  *
  *   - the write path laid out ONE bucket per file
  *     ([[TxTable.writeFilesBucketed]]) and recorded singleton bucket
  *     value sets in the manifest;
  *   - this wrapper re-groups the delegate parquet scan's planned
  *     file partitions BY BUCKET — one [[HasPartitionKey]] input
  *     partition per bucket value — and reports
  *     `KeyGroupedPartitioning(bucket(n, col), #groups)`;
  *   - Spark resolves the `bucket` transform through the table
  *     catalog's FunctionCatalog ([[TxPartitionFunctions.Bucket]])
  *     and, when both join sides report compatible partitioning
  *     (same canonicalName + numBuckets, `KeyGroupedShuffleSpec`),
  *     plans the join with no shuffle on either side — the layout
  *     pays the Exchange once at write time, every subsequent join
  *     rides it free (the 100 TB daily fact-fact join shape).
  *
  * Requires `spark.sql.sources.v2.bucketing.enabled=true` (Spark's
  * own gate); without it the report is ignored and the join plans
  * with ordinary shuffles — never wrong, just unoptimized. Reading
  * is untouched: the delegate's reader factory serves each bucket
  * group's files (vectorized parquet as usual). */
private[sources] object SpjScan {

  /** fileName → bucket value for the snapshot, when EVERY listed file
    * carries a singleton `bucket(n,col)` value set — None otherwise
    * (mixed-bucket files, e.g. from a V2 dynamic overwrite, disable
    * SPJ but never correctness). */
  def bucketByName(snap: TxTable.Snapshot,
      t: TxTable.PartBucket): Option[Map[String, Int]] = {
    val entries = snap.files.map { f =>
      snap.fileValues.get(f).flatMap(_.get(t.name)) match {
        case Some(vs) if vs.size == 1 => vs.head.toIntOption
          .map(b => f.split('/').last -> b)
        case _ => None
      }
    }
    if (entries.exists(_.isEmpty)) None
    else Some(entries.flatten.toMap)
  }
}

private[sources] class SpjScanBuilder(delegate: ScanBuilder,
    t: TxTable.PartBucket, bucketOfName: Map[String, Int])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownCatalystFilters {

  override def pruneColumns(requiredSchema: StructType): Unit =
    delegate match {
      case p: SupportsPushDownRequiredColumns => p.pruneColumns(requiredSchema)
      case _ => ()
    }

  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    delegate match {
      case p: SupportsPushDownCatalystFilters => p.pushFilters(filters)
      case _ => filters
    }

  override def pushedFilters
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    delegate match {
      case p: SupportsPushDownCatalystFilters => p.pushedFilters
      case _ => Array.empty
    }

  override def build(): Scan =
    new SpjScanImpl(delegate.build(), t, bucketOfName)
}

private class SpjScanImpl(delegate: Scan, t: TxTable.PartBucket,
    bucketOfName: Map[String, Int])
    extends Scan with SupportsReportPartitioning with SupportsReportStatistics {

  private lazy val spjBatch = new SpjBatch(delegate.toBatch, bucketOfName)

  override def readSchema(): StructType = delegate.readSchema()
  override def description(): String = s"Spj(${delegate.description()})"
  override def toBatch: Batch = spjBatch

  override def outputPartitioning(): Partitioning =
    // a fully-pruned scan (every file excluded by predicates) has no
    // key groups to report — claim nothing rather than a 0-partition
    // KeyGroupedPartitioning the join planner never expects
    if (spjBatch.planned.isEmpty)
      new org.apache.spark.sql.connector.read.partitioning
        .UnknownPartitioning(0)
    else new KeyGroupedPartitioning(
      Array(Expressions.bucket(t.n, t.col)),
      spjBatch.planned.length)

  override def estimateStatistics(): Statistics = delegate match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes() = java.util.OptionalLong.empty()
      override def numRows() = java.util.OptionalLong.empty()
    }
  }
}

/** One bucket's files as one keyed partition. */
private case class BucketFilePartition(delegate: FilePartition,
    bucket: Int) extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
  override def preferredLocations(): Array[String] =
    delegate.preferredLocations()
}

private class SpjBatch(delegate: Batch,
    bucketOfName: Map[String, Int]) extends Batch {

  /** The delegate's (pruned) files re-grouped one partition per
    * bucket, ordered by bucket value. Planned once. */
  lazy val planned: Array[InputPartition] = {
    val files = delegate.planInputPartitions().flatMap {
      case fp: FilePartition => fp.files
      case other => throw new IllegalStateException(
        s"spj scan expected FilePartitions, got ${other.getClass}")
    }
    files.groupBy(f => bucketOfName(f.urlEncodedPath.split('/').last))
      .toSeq.sortBy(_._1).zipWithIndex.map { case ((b, fs), i) =>
        BucketFilePartition(FilePartition(i, fs), b): InputPartition
      }.toArray
  }

  override def planInputPartitions(): Array[InputPartition] = planned

  override def createReaderFactory(): PartitionReaderFactory =
    new SpjReaderFactory(delegate.createReaderFactory())
}

/** Unwraps the keyed partition before delegating — the parquet
  * factory sees plain FilePartitions. */
private class SpjReaderFactory(inner: PartitionReaderFactory)
    extends PartitionReaderFactory {
  private def unwrap(p: InputPartition): InputPartition = p match {
    case BucketFilePartition(fp, _) => fp
    case other => other
  }
  override def supportColumnarReads(p: InputPartition): Boolean =
    inner.supportColumnarReads(unwrap(p))
  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = inner.createReader(unwrap(p))
  override def createColumnarReader(p: InputPartition)
      : PartitionReader[ColumnarBatch] =
    inner.createColumnarReader(unwrap(p))
}
