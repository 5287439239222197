package graft.sources

import java.nio.ByteBuffer
import java.nio.channels.{Channels, SeekableByteChannel}
import java.util

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit => ATimeUnit}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** Arrow IPC file format as a DataSource V2 connector — native
  * columnar interchange for the zero-egress image (the Avro/Kafka
  * connector jars are absent, but arrow-vector ships with Spark for
  * its Python interop, so the IPC *file* format is implementable
  * against public Arrow APIs alone).
  *
  * Usage:
  * {{{
  *   df.write.format("graft.sources.ArrowSource")
  *     .mode("append" | "overwrite").save(dir)
  *   spark.read.format("graft.sources.ArrowSource").load(dir)
  * }}}
  *
  * Layout: one `part-*.arrow` random-access IPC file per task, record
  * batches of [[ArrowSource.BatchRows]] rows. Reads plan ONE
  * InputPartition per file, so a cluster scans fully parallel with no
  * driver materialization; within a partition the reader walks record
  * batches and materializes ONLY the projected columns (column
  * pruning at the vector→row boundary; the IPC format itself is read
  * batch-at-a-time). Supported Spark types: BIGINT, INT, DOUBLE,
  * BOOLEAN, STRING, TIMESTAMP (micros, UTC) — nullable throughout.
  * Writes go through the standard DSv2 commit protocol: data lands in
  * a task-unique dotfile invisible to the `part-*` listing, and the
  * driver-side job commit renames every staged file into place after
  * all tasks succeed (speculative/failed duplicates are aborted and
  * deleted, never published).
  */
class ArrowSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = ArrowSource.pathOf(options)
    val fs = dir.getFileSystem(HadoopConfSnapshot.driverConf)
    val first = ArrowSource.listDataFiles(fs, dir).headOption.getOrElse(
      throw new IllegalArgumentException(s"no .arrow files under $dir"))
    val alloc = new RootAllocator()
    try {
      val in = fs.open(first)
      try {
        val r = new ArrowFileReader(
          new HadoopSeekableChannel(in, fs.getFileStatus(first).getLen), alloc)
        try ArrowSource.fromArrowSchema(r.getVectorSchemaRoot.getSchema)
        finally r.close()
      } finally in.close()
    } finally alloc.close()
  }

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ArrowIpcTable(properties.get("path"), schema)
}

object ArrowSource {
  /** Rows per Arrow record batch — bounds writer memory per task. */
  val BatchRows = 4096

  private[sources] def pathOf(options: CaseInsensitiveStringMap): Path =
    new Path(Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("path option required")))

  private[sources] def listDataFiles(fs: FileSystem, dir: Path): Seq[Path] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("part-") &&
        p.getName.endsWith(".arrow"))
      .sortBy(_.getName)

  private[sources] def toArrowField(f: StructField): Field = {
    val t = f.dataType match {
      case LongType => new ArrowType.Int(64, true)
      case IntegerType => new ArrowType.Int(32, true)
      case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case BooleanType => ArrowType.Bool.INSTANCE
      case StringType => ArrowType.Utf8.INSTANCE
      case TimestampType => new ArrowType.Timestamp(ATimeUnit.MICROSECOND, "UTC")
      case other => throw new IllegalArgumentException(
        s"ArrowSource does not support ${other.sql} (column ${f.name})")
    }
    new Field(f.name, new FieldType(f.nullable, t, null), null)
  }

  private[sources] def toArrowSchema(s: StructType): ASchema =
    new ASchema(s.fields.map(toArrowField).toSeq.asJava)

  private[sources] def fromArrowSchema(s: ASchema): StructType =
    StructType(s.getFields.asScala.map { f =>
      val dt = f.getType match {
        case i: ArrowType.Int if i.getBitWidth == 64 => LongType
        case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
        case _: ArrowType.FloatingPoint => DoubleType
        case _: ArrowType.Bool => BooleanType
        case _: ArrowType.Utf8 => StringType
        case _: ArrowType.Timestamp => TimestampType
        case other => throw new IllegalArgumentException(
          s"unsupported arrow type $other (column ${f.getName})")
      }
      StructField(f.getName, dt, f.isNullable)
    }.toSeq)
}

/** Seekable adapter over Hadoop's positioned input stream — what
  * ArrowFileReader needs to jump to the footer and batch offsets. */
private class HadoopSeekableChannel(in: FSDataInputStream, len: Long)
    extends SeekableByteChannel {
  private var open = true
  override def read(dst: ByteBuffer): Int = {
    val buf = new Array[Byte](dst.remaining())
    val n = in.read(buf, 0, buf.length)
    if (n > 0) dst.put(buf, 0, n)
    n
  }
  override def write(src: ByteBuffer): Int =
    throw new UnsupportedOperationException("read-only channel")
  override def position(): Long = in.getPos
  override def position(newPosition: Long): SeekableByteChannel = {
    in.seek(newPosition); this
  }
  override def size(): Long = len
  override def truncate(size: Long): SeekableByteChannel =
    throw new UnsupportedOperationException("read-only channel")
  override def isOpen: Boolean = open
  override def close(): Unit = { open = false; in.close() }
}

/** Snapshot of the driver's resolved Hadoop configuration,
  * rebuildable on executors — DSv2 reader/writer factories are
  * serialized, and a bare `new Configuration()` there would drop
  * every `spark.hadoop.*` setting (S3A credentials, defaultFS
  * overrides, custom FS impls). Captured on the driver at factory
  * creation. */
private case class HadoopConfSnapshot(entries: Array[(String, String)]) {
  def toConf: Configuration = {
    val c = new Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }
}

private object HadoopConfSnapshot {
  /** Driver-side capture (SparkSession.active exists there). */
  def capture(): HadoopConfSnapshot = HadoopConfSnapshot(
    driverConf.iterator().asScala.map(e => e.getKey -> e.getValue).toArray)

  def driverConf: Configuration =
    org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
}

private class ArrowIpcTable(path: String, schema0: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"arrow_ipc($path)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ArrowScanBuilder(path, schema0)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ArrowWriteBuilder(path, info.schema())
}

private class ArrowScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = StructType(full.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new ArrowScan(path, full, required)
}

private class ArrowScan(path: String, full: StructType, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(HadoopConfSnapshot.driverConf)
    ArrowSource.listDataFiles(fs, dir)
      .map(p => ArrowFilePartition(p.toString).asInstanceOf[InputPartition])
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ArrowReaderFactory(required, HadoopConfSnapshot.capture())
}

private case class ArrowFilePartition(file: String) extends InputPartition

private class ArrowReaderFactory(required: StructType,
    hconf: HadoopConfSnapshot) extends PartitionReaderFactory {
  private val projected = required.fields.map(_.name)
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val file = new Path(p.asInstanceOf[ArrowFilePartition].file)
    new PartitionReader[InternalRow] {
      private val alloc = new RootAllocator()
      private val fs = file.getFileSystem(hconf.toConf)
      private val in = fs.open(file)
      private val reader = new ArrowFileReader(
        new HadoopSeekableChannel(in, fs.getFileStatus(file).getLen), alloc)
      private val root = reader.getVectorSchemaRoot
      // validate THIS file's schema on open: inferSchema only looked
      // at the first file, so a directory holding appends with a
      // drifted schema must fail with a named mismatch here, not an
      // NPE deep in getVector (closing what we opened on the way out)
      try {
        val fileSchema = ArrowSource.fromArrowSchema(root.getSchema)
        required.fields.foreach { f =>
          fileSchema.fields.find(_.name == f.name) match {
            case None => throw new IllegalArgumentException(
              s"arrow file $file lacks column '${f.name}' " +
                s"(file schema: ${fileSchema.simpleString})")
            case Some(g) if g.dataType != f.dataType =>
              throw new IllegalArgumentException(
                s"arrow file $file column '${f.name}' is " +
                  s"${g.dataType.simpleString}, expected " +
                  f.dataType.simpleString)
            case _ =>
          }
        }
      } catch {
        case t: Throwable =>
          try reader.close() finally alloc.close()
          throw t
      }
      // only the projected vectors are materialized into rows — the
      // others are never touched (pruning at the vector→row boundary)
      private var vectors: Array[FieldVector] = Array.empty
      private var rowsInBatch = 0
      private var i = -1

      private def loadNext(): Boolean = {
        if (!reader.loadNextBatch()) return false
        vectors = projected.map(root.getVector)
        rowsInBatch = root.getRowCount
        i = -1
        true
      }

      override def next(): Boolean = {
        i += 1
        if (i < rowsInBatch) true
        else if (loadNext()) next()
        else false
      }

      override def get(): InternalRow =
        InternalRow.fromSeq(vectors.toIndexedSeq.map {
          case v if v.isNull(i) => null
          case v: BigIntVector => v.get(i)
          case v: IntVector => v.get(i)
          case v: Float8Vector => v.get(i)
          case v: BitVector => v.get(i) == 1
          case v: VarCharVector => UTF8String.fromBytes(v.get(i))
          case v: TimeStampMicroTZVector => v.get(i)
          case v => throw new IllegalStateException(
            s"unsupported vector ${v.getClass.getSimpleName}")
        })

      override def close(): Unit = {
        reader.close() // closes the wrapped channel/stream
        alloc.close()
      }
    }
  }
}

private class ArrowWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new ArrowBatchWrite(path, schema, doTruncate)
  }
}

private class ArrowBatchWrite(path: String, schema: StructType,
    truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new ArrowWriterFactory(path, schema, HadoopConfSnapshot.capture())

  /** Publish: every commit message names one staged dotfile; renaming
    * them `.part-x` → `part-x` after ALL tasks succeeded is the
    * all-or-nothing step (readers list only `part-*`). An overwrite
    * deletes the PREVIOUS files here too — not at job start — so a
    * failed or aborted job leaves the old data fully readable; the
    * residual non-atomic window is this commit body itself, the
    * filesystem-rename limit TxTable's manifest protocol exists to
    * close for tables that need true snapshot isolation. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(HadoopConfSnapshot.driverConf)
    if (truncate)
      ArrowSource.listDataFiles(fs, dir).foreach(fs.delete(_, false))
    messages.foreach { case ArrowCommit(staged) =>
      val p = new Path(staged)
      require(fs.rename(p, new Path(dir, p.getName.stripPrefix("."))),
        s"publish rename failed: $staged")
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(HadoopConfSnapshot.driverConf)
    messages.collect { case ArrowCommit(staged) =>
      fs.delete(new Path(staged), false)
    }
  }
}

private case class ArrowCommit(staged: String) extends WriterCommitMessage

private class ArrowWriterFactory(path: String, schema: StructType,
    hconf: HadoopConfSnapshot) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new ArrowDataWriter(path, schema, partitionId, taskId, hconf)
}

private class ArrowDataWriter(path: String, schema: StructType,
    partitionId: Int, taskId: Long,
    hconf: HadoopConfSnapshot) extends DataWriter[InternalRow] {
  // task-unique dotfile: invisible to the part-* listing until the
  // driver-side job commit renames it into place
  private val staged =
    new Path(path, f".part-$partitionId%05d-$taskId.arrow")
  private val alloc = new RootAllocator()
  private val root =
    VectorSchemaRoot.create(ArrowSource.toArrowSchema(schema), alloc)
  private val fs = staged.getFileSystem(hconf.toConf)
  fs.mkdirs(new Path(path))
  private val out = fs.create(staged, true)
  private val writer =
    new ArrowFileWriter(root, null, Channels.newChannel(out))
  writer.start()
  private var n = 0

  override def write(row: InternalRow): Unit = {
    schema.fields.zipWithIndex.foreach { case (f, j) =>
      val v = root.getVector(j)
      if (row.isNullAt(j)) v.asInstanceOf[FieldVector] match {
        case fv: BaseFixedWidthVector => fv.setNull(n)
        case fv: BaseVariableWidthVector => fv.setNull(n)
        case fv => throw new IllegalStateException(fv.getClass.getName)
      } else f.dataType match {
        case LongType => v.asInstanceOf[BigIntVector].setSafe(n, row.getLong(j))
        case IntegerType => v.asInstanceOf[IntVector].setSafe(n, row.getInt(j))
        case DoubleType =>
          v.asInstanceOf[Float8Vector].setSafe(n, row.getDouble(j))
        case BooleanType =>
          v.asInstanceOf[BitVector].setSafe(n, if (row.getBoolean(j)) 1 else 0)
        case StringType =>
          v.asInstanceOf[VarCharVector].setSafe(n, row.getUTF8String(j).getBytes)
        case TimestampType =>
          v.asInstanceOf[TimeStampMicroTZVector].setSafe(n, row.getLong(j))
        case other => throw new IllegalStateException(other.sql)
      }
    }
    n += 1
    if (n >= ArrowSource.BatchRows) flush()
  }

  private def flush(): Unit = if (n > 0) {
    root.setRowCount(n)
    writer.writeBatch()
    root.allocateNew()
    n = 0
  }

  override def commit(): WriterCommitMessage = {
    flush()
    writer.end()
    writer.close()
    out.close()
    ArrowCommit(staged.toString)
  }

  override def abort(): Unit = {
    try { writer.close(); out.close() } catch { case _: Throwable => () }
    fs.delete(staged, false)
  }

  override def close(): Unit = {
    root.close()
    alloc.close()
  }
}
