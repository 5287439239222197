package graft.sources

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** The SQL read path for a COLUMN-MAPPED [[TxTable]]: the plan speaks
  * LOGICAL names, the parquet files store PHYSICAL names, and this
  * wrapper is the translation seam around Spark's own
  * `ParquetScanBuilder` (Delta's column-mapping scan reduced to its
  * invariant). Everything data-shaped is untouched — the vectorized
  * parquet batches flow through positionally (`InternalRow`/columnar
  * batches carry no names), so the delegate's `Batch` is served
  * as-is; only SCHEMAS and FILTER ATTRIBUTES translate:
  *
  *   - `pruneColumns` receives the required LOGICAL schema and hands
  *     the delegate its PHYSICAL rendering — column pruning reaches
  *     the parquet footer under the stored names;
  *   - `pushFilters` rewrites `AttributeReference` names
  *     logical→physical before delegating, so parquet row-group
  *     pushdown and the manifest prune both see file-true names,
  *     then returns the ORIGINAL logical expressions as residuals
  *     (the file source treats every data filter as best-effort and
  *     re-evaluates above the scan — where names are logical again);
  *   - `readSchema()` renders the delegate's physical read schema
  *     back to logical names so the scan's output attributes line up
  *     with the relation.
  *
  * Not forwarded (pushdowns simply skipped, never wrong): aggregate
  * pushdown, variant extraction, runtime (DPP) filtering. Unmapped
  * tables never pass through here. */
private[sources] class MappedScanBuilder(
    delegate: ParquetScanBuilder,
    logicalToPhys: Map[String, String],
    physToLogical: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownCatalystFilters {

  private def physName(n: String): String = logicalToPhys.getOrElse(n, n)

  private def physicalize(e: Expression): Expression = e.transform {
    case a: AttributeReference if logicalToPhys.contains(a.name) =>
      a.withName(logicalToPhys(a.name))
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    delegate.pruneColumns(StructType(
      requiredSchema.fields.map(f => f.copy(name = physName(f.name)))))

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    // delegate for its pushdown side effects; our index has no
    // partition columns, so the delegate returns every data filter
    // as residual — return the logical ORIGINALS instead (they
    // evaluate above the scan, where output attrs are logical)
    delegate.pushFilters(filters.map(physicalize))
    filters
  }

  override def pushedFilters
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    delegate.pushedFilters

  override def build(): Scan = new MappedScan(delegate.build(), physToLogical)
}

private[sources] class MappedScan(
    delegate: Scan, physToLogical: Map[String, String])
    extends Scan with SupportsReportStatistics {
  override def readSchema(): StructType =
    StructType(delegate.readSchema().fields.map(f =>
      physToLogical.get(f.name).fold(f)(l => f.copy(name = l))))
  override def toBatch: Batch = delegate.toBatch
  override def description(): String = s"Mapped(${delegate.description()})"
  override def estimateStatistics(): Statistics = delegate match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes() = java.util.OptionalLong.empty()
      override def numRows() = java.util.OptionalLong.empty()
    }
  }
}
