package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSeq, BindReferences, BoundReference, Expression}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** The SQL read path for a snapshot carrying MERGE-ON-READ deletion
  * predicates ([[TxTable.DelEntry]]) — the scan-side half of deletion
  * vectors, Delta's DV filter reduced to its invariant: files with no
  * predicate flow through Spark's vectorized parquet batches
  * UNTOUCHED; each DV'd file becomes its own input partition read
  * row-based through a codegen'd visibility predicate. The plan never
  * knows — `readSchema()` is the pruned schema the relation asked
  * for; when a deletion predicate references a column the query
  * pruned away, the wrapper WIDENS the delegate's read schema just
  * enough to evaluate the predicate and projects the extras back out
  * (clean columnar batches project by column-vector reference, zero
  * copy).
  *
  * Semantics are pinned to the API verbs': the visibility expression
  * is built by ANALYZING the same `applyDels` filter chain every
  * other reader uses (on an empty frame of the widened schema), so
  * type coercion agrees Column-for-Column, then bound positionally —
  * physical/logical renames never matter because rows are positional
  * at this depth. */
private[sources] object DvScan {

  /** Wrap `base` (the plain or column-mapped parquet ScanBuilder)
    * when the snapshot carries deletion predicates. `fullSchema` is
    * the table's LOGICAL schema (widening source); `delsByName` keys
    * file NAMES (last path segment — the language the reader sees). */
  def builder(spark: SparkSession, base: ScanBuilder,
      fullSchema: StructType,
      delsByName: Map[String, Seq[TxTable.DelEntry]]): ScanBuilder =
    new DvScanBuilder(spark, base, fullSchema, delsByName)

  /** Wrap an already-built Scan whose read schema is the FULL table
    * schema (the row-level-operation scan: UPDATE/MERGE must see
    * every column, so no widening is ever needed) — DV'd files filter
    * to their visible rows before the rewrite sees them. */
  def wrapScan(spark: SparkSession, scan: Scan, schema: StructType,
      delsByName: Map[String, Seq[TxTable.DelEntry]]): Scan =
    new DvScanImpl(spark, scan, schema, schema, delsByName)

  /** The bound VISIBILITY expression (true = row survives) for one
    * file's deletion entries, over `schema`-positional rows. Built by
    * analyzing the shared `applyDels` chain so coercion semantics are
    * identical to the API read path. */
  private[sources] def visibilityExpr(spark: SparkSession,
      schema: StructType,
      entries: Seq[TxTable.DelEntry]): Expression = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    val filtered = entries.foldLeft(empty)((df, d) =>
      df.filter(not(coalesce(d.predicate, lit(false)))))
    val analyzed = filtered.queryExecution.analyzed
    val conds = analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition
    }
    require(conds.nonEmpty, "deletion entries produced no filter")
    val output: Seq[Attribute] = analyzed.output
    require(output.map(_.name) == schema.fieldNames.toSeq,
      s"analyzed output ${output.map(_.name)} drifted from ${schema.fieldNames.toSeq}")
    // the condition is ANALYZED, not optimized — a merge's IN-set
    // DelEntry arrives as In(col, <up to 100k literals>), whose
    // codegen overflows the method limit and falls back to an O(keys)
    // per-row linear scan. Apply OptimizeIn's conversion by hand
    // (literal set → InSet hash lookup), the same plan the API read
    // path gets from the full optimizer.
    val optimized = conds.reduce(And).transformUp {
      case org.apache.spark.sql.catalyst.expressions.In(v, list)
        if list.size > 10 && list.forall(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions
            .Literal]) =>
        org.apache.spark.sql.catalyst.expressions.InSet(v,
          list.map(_.asInstanceOf[org.apache.spark.sql.catalyst
            .expressions.Literal].value).toSet)
    }
    BindReferences.bindReference(optimized, AttributeSeq(output))
  }
}

private class DvScanBuilder(spark: SparkSession, delegate: ScanBuilder,
    fullSchema: StructType,
    delsByName: Map[String, Seq[TxTable.DelEntry]])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownCatalystFilters {

  /** Column names any deletion predicate references. */
  private val delCols: Seq[String] =
    delsByName.values.flatten.toSeq
      .flatMap(d => d.ranges.map(_._1) ++ d.eqs.map(_._1) ++
        d.ins.map(_._1)).distinct

  private var pruned: StructType = fullSchema
  private var widened: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit = {
    pruned = requiredSchema
    val missing = delCols.filterNot(requiredSchema.fieldNames.contains)
      .flatMap(c => fullSchema.find(_.name == c))
    widened = StructType(requiredSchema.fields ++ missing)
    delegate match {
      case p: SupportsPushDownRequiredColumns => p.pruneColumns(widened)
      case _ => ()
    }
  }

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
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
    new DvScanImpl(spark, delegate.build(), pruned, widened, delsByName)
}

private class DvScanImpl(spark: SparkSession, delegate: Scan,
    pruned: StructType, widened: StructType,
    delsByName: Map[String, Seq[TxTable.DelEntry]])
    extends Scan with SupportsReportStatistics {
  override def readSchema(): StructType = pruned
  override def description(): String = s"Dv(${delegate.description()})"
  override def toBatch: Batch =
    DvBatch(spark, delegate.toBatch, pruned, widened, delsByName)
  override def estimateStatistics(): Statistics = delegate match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes() = java.util.OptionalLong.empty()
      override def numRows() = java.util.OptionalLong.empty()
    }
  }
}

/** One DV'd file as its own partition, carrying its bound visibility
  * expression — the reader for it filters row-based. */
private case class DvFilePartition(delegate: FilePartition,
    visible: Expression) extends InputPartition

private[sources] object DvBatch {
  def apply(spark: SparkSession, delegate: Batch, pruned: StructType,
      widened: StructType,
      delsByName: Map[String, Seq[TxTable.DelEntry]]): Batch =
    new DvBatch(spark, delegate, pruned, widened, delsByName)
}

private class DvBatch(spark: SparkSession, delegate: Batch,
    pruned: StructType, widened: StructType,
    delsByName: Map[String, Seq[TxTable.DelEntry]]) extends Batch {

  /** Ordinals of the pruned columns inside the widened row — identity
    * when no widening happened (del columns were already selected). */
  private val projOrdinals: Array[Int] =
    pruned.fieldNames.map(n => widened.fieldIndex(n))
  private val needProject = projOrdinals.length != widened.length

  private def nameOf(f: org.apache.spark.sql.execution.datasources
      .PartitionedFile): String =
    f.urlEncodedPath.split('/').last

  override def planInputPartitions(): Array[InputPartition] = {
    // visibility expressions per distinct PATH-ERASED del-signature,
    // built once on the driver (analyzed against the widened schema) —
    // keyed on the predicate bodies, so a DML's N candidate files
    // share one analysis instead of paying it N times
    val exprCache = scala.collection.mutable
      .Map.empty[Seq[(Seq[(String, Double, Double)],
        Seq[(String, String)], Seq[(String, Seq[String])])], Expression]
    def exprFor(entries: Seq[TxTable.DelEntry]): Expression =
      exprCache.getOrElseUpdate(TxTable.delSignature(entries),
        DvScan.visibilityExpr(spark, widened, entries))
    delegate.planInputPartitions().flatMap {
      case fp: FilePartition =>
        val (dv, clean) = fp.files.partition(f =>
          delsByName.contains(nameOf(f)))
        val cleanPart: Seq[InputPartition] =
          if (clean.isEmpty) Nil else Seq(FilePartition(0, clean))
        cleanPart ++ dv.map(f => DvFilePartition(
          FilePartition(0, Array(f)), exprFor(delsByName(nameOf(f)))))
      case other => throw new IllegalStateException(
        s"dv scan expected FilePartitions, got ${other.getClass} — " +
          "cannot guarantee deleted-row filtering; refusing")
    }.zipWithIndex.map {
      // renumber: FilePartition.index rides into the RDD partition id
      case (fp: FilePartition, i) => FilePartition(i, fp.files)
      case (dp: DvFilePartition, i) =>
        dp.copy(delegate = FilePartition(i, dp.delegate.files))
      case (p, _) => p
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DvReaderFactory(delegate.createReaderFactory(),
      if (needProject) projOrdinals else null,
      widened)
}

/** Reader factory for a DV'd snapshot. Spark requires a scan's
  * partitions to be UNIFORMLY columnar or row-based ("Cannot mix
  * row-based and columnar input partitions"), and DV'd files must
  * filter row-by-row — so the whole scan reads row-based while any
  * deletion predicate stands. That is the read-side cost merge-on-read
  * trades for its O(1) writes, and exactly why compaction folds
  * predicates away (vectorized reads return with the next compact).
  * Clean partitions only project (when the read schema was widened);
  * DV'd partitions filter through their codegen'd visibility
  * predicate then project. */
private class DvReaderFactory(inner: PartitionReaderFactory,
    projOrdinals: Array[Int], widened: StructType)
    extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = p match {
    case DvFilePartition(fp, visible) =>
      new DvRowReader(inner.createReader(fp), visible, projOrdinals, widened)
    case other =>
      val r = inner.createReader(other)
      if (projOrdinals == null) r
      else new ProjectingRowReader(r, projOrdinals, widened)
  }
}

/** Row reader over one DV'd file: visibility-filter then project. */
private class DvRowReader(inner: PartitionReader[InternalRow],
    visible: Expression, projOrdinals: Array[Int], widened: StructType)
    extends PartitionReader[InternalRow] {
  private val pred =
    org.apache.spark.sql.catalyst.expressions.Predicate.create(visible)
  pred.initialize(0)
  private val proj: org.apache.spark.sql.catalyst.expressions.UnsafeProjection =
    if (projOrdinals == null) null
    else org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
      projOrdinals.toIndexedSeq.map(i => BoundReference(i,
        widened(i).dataType, widened(i).nullable)))
  private var cur: InternalRow = _

  override def next(): Boolean = {
    while (inner.next()) {
      val r = inner.get()
      if (pred.eval(r)) {
        cur = if (proj == null) r else proj(r)
        return true
      }
    }
    false
  }
  override def get(): InternalRow = cur
  override def close(): Unit = inner.close()
}

/** Row reader that only projects (clean partition under a widened
  * read schema, row-based mode). */
private class ProjectingRowReader(inner: PartitionReader[InternalRow],
    projOrdinals: Array[Int], widened: StructType)
    extends PartitionReader[InternalRow] {
  private val proj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
      projOrdinals.toIndexedSeq.map(i => BoundReference(i,
        widened(i).dataType, widened(i).nullable)))
  override def next(): Boolean = inner.next()
  override def get(): InternalRow = proj(inner.get())
  override def close(): Unit = inner.close()
}
