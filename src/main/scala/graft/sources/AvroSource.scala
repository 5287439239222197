package graft.sources

import java.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

import graft.multimodal.AvroCodec
import graft.multimodal.AvroCodec.AvroField

/** Avro Object Container Files as a DataSource V2 connector, on top
  * of the from-scratch byte-level [[graft.multimodal.AvroCodec]] —
  * the spark-avro jar is absent from this zero-egress image, so the
  * format rides the same DSv2 scaffolding as the Arrow IPC source.
  *
  * Usage:
  * {{{
  *   df.write.format("graft.sources.AvroSource")
  *     .option("codec", "deflate")          // optional; default null
  *     .mode("append" | "overwrite").save(dir)
  *   spark.read.format("graft.sources.AvroSource").load(dir)
  * }}}
  *
  * Layout: one `part-*.avro` container per task (deflate-optional
  * blocks of 4096 records). Reads plan ONE InputPartition per file —
  * fully parallel across files with no driver materialization; Avro
  * is row-oriented, so column pruning happens at the decode boundary
  * (unprojected string/bytes fields are length-skipped, never
  * copied). Each file's embedded writer schema is validated against
  * the query schema on open, so appends with a drifted schema fail
  * with a named mismatch. Supported Spark types: BIGINT, INT, DOUBLE,
  * FLOAT, BOOLEAN, STRING, BINARY, TIMESTAMP (micros via the spec's
  * `timestamp-micros` logical type), and ARRAY of
  * float/double/long/int (the embedding-column type, via the spec's
  * blocked array encoding) — nullable throughout as the
  * `["null", T]` union. Writes go through the standard DSv2 commit:
  * task-unique dotfiles, renamed into the `part-*` namespace only
  * after every task succeeded.
  */
class AvroSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = AvroSource.pathOf(options)
    val fs = dir.getFileSystem(HadoopConfSnapshot.driverConf)
    val first = AvroSource.listDataFiles(fs, dir).headOption.getOrElse(
      throw new IllegalArgumentException(s"no .avro files under $dir"))
    AvroSource.toStructType(
      AvroCodec.readHeader(AvroSource.readAll(fs, first)).fields)
  }

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AvroTable(properties.get("path"), schema)
}

object AvroSource {
  private[sources] def pathOf(options: CaseInsensitiveStringMap): Path =
    new Path(Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("path option is required")))

  private[sources] def listDataFiles(fs: FileSystem, dir: Path): Seq[Path] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("part-") &&
        p.getName.endsWith(".avro"))
      .sortBy(_.getName)

  private[sources] def readAll(fs: FileSystem, p: Path): Array[Byte] = {
    val len = fs.getFileStatus(p).getLen
    require(len <= Int.MaxValue, s"avro file over 2 GiB: $p")
    val buf = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    buf
  }

  private[sources] def toAvroField(f: StructField): AvroField = f.dataType match {
    case LongType => AvroField(f.name, "long", f.nullable)
    case IntegerType => AvroField(f.name, "int", f.nullable)
    case DoubleType => AvroField(f.name, "double", f.nullable)
    case FloatType => AvroField(f.name, "float", f.nullable)
    case BooleanType => AvroField(f.name, "boolean", f.nullable)
    case StringType => AvroField(f.name, "string", f.nullable)
    case BinaryType => AvroField(f.name, "bytes", f.nullable)
    case TimestampType =>
      AvroField(f.name, "long", f.nullable, Some("timestamp-micros"))
    case ArrayType(et, _) =>
      val item = et match {
        case FloatType => "float"
        case DoubleType => "double"
        case LongType => "long"
        case IntegerType => "int"
        case other => throw new IllegalArgumentException(
          s"unsupported avro array element: ${other.sql} (column ${f.name})")
      }
      AvroField(f.name, "array", f.nullable, items = Some(item))
    case other => throw new IllegalArgumentException(
      s"unsupported type for avro: ${other.sql} (column ${f.name})")
  }

  private[sources] def toStructType(fields: Seq[AvroField]): StructType =
    StructType(fields.map { f =>
      val dt = (f.tpe, f.logical, f.items) match {
        case ("array", _, Some(it)) =>
          val et = it match {
            case "float" => FloatType
            case "double" => DoubleType
            case "long" => LongType
            case "int" => IntegerType
            case other => throw new IllegalArgumentException(
              s"unsupported avro array element: $other")
          }
          ArrayType(et, containsNull = false)
        case ("long", Some("timestamp-micros"), _) => TimestampType
        case ("long", _, _) => LongType
        case ("int", _, _) => IntegerType
        case ("double", _, _) => DoubleType
        case ("float", _, _) => FloatType
        case ("boolean", _, _) => BooleanType
        case ("string", _, _) => StringType
        case ("bytes", _, _) => BinaryType
        case (other, _, _) => throw new IllegalArgumentException(
          s"unsupported avro type: $other")
      }
      StructField(f.name, dt, f.nullable)
    })
}

private class AvroTable(path: String, schema0: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"avro($path)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(path, schema0)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AvroWriteBuilder(path, info.schema(),
      Option(info.options.get("codec")).getOrElse("null"))
}

private class AvroScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = StructType(full.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new AvroScan(path, required)
}

private class AvroScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(HadoopConfSnapshot.driverConf)
    AvroSource.listDataFiles(fs, dir)
      .map(p => AvroFilePartition(p.toString).asInstanceOf[InputPartition])
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required, HadoopConfSnapshot.capture())
}

private case class AvroFilePartition(file: String) extends InputPartition

private class AvroReaderFactory(required: StructType,
    hconf: HadoopConfSnapshot) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val file = new Path(p.asInstanceOf[AvroFilePartition].file)
    new PartitionReader[InternalRow] {
      private val fs = file.getFileSystem(hconf.toConf)
      private val bytes = AvroSource.readAll(fs, file)
      private val header = AvroCodec.readHeader(bytes)
      // validate THIS file's embedded schema against the query schema
      // (same per-file contract as the Arrow source: drifted appends
      // fail with a named mismatch, never an opaque decode error)
      private val fileSchema = AvroSource.toStructType(header.fields)
      private val indices = required.fields.map { f =>
        fileSchema.fields.indexWhere(_.name == f.name) match {
          case -1 => throw new IllegalArgumentException(
            s"avro file $file lacks column '${f.name}' " +
              s"(file schema: ${fileSchema.simpleString})")
          case i if fileSchema.fields(i).dataType != f.dataType =>
            throw new IllegalArgumentException(
              s"avro file $file column '${f.name}' is " +
                s"${fileSchema.fields(i).dataType.simpleString}, expected " +
                f.dataType.simpleString)
          case i => i
        }
      }
      private val rows = AvroCodec.readRows(bytes, indices.toSeq)
      private var cur: Array[Any] = _

      override def next(): Boolean = {
        if (!rows.hasNext) return false
        cur = rows.next(); true
      }

      override def get(): InternalRow =
        InternalRow.fromSeq(required.fields.toIndexedSeq.zipWithIndex.map {
          case (f, j) => (cur(j), f.dataType) match {
            case (null, _) => null
            case (v, StringType) => UTF8String.fromString(v.asInstanceOf[String])
            case (v, ArrayType(_, _)) =>
              new org.apache.spark.sql.catalyst.util.GenericArrayData(
                v.asInstanceOf[Seq[Any]].toArray)
            case (v, _) => v // long/int/double/float/boolean/bytes/ts-micros
          }
        })

      override def close(): Unit = ()
    }
  }
}

private class AvroWriteBuilder(path: String, schema: StructType,
    codec: String) extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new AvroBatchWrite(path, schema, codec, doTruncate)
  }
}

private class AvroBatchWrite(path: String, schema: StructType,
    codec: String, truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new AvroWriterFactory(path, schema, codec, HadoopConfSnapshot.capture())

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(HadoopConfSnapshot.driverConf)
    if (truncate)
      AvroSource.listDataFiles(fs, dir).foreach(fs.delete(_, false))
    messages.foreach { case AvroCommit(staged) =>
      val p = new Path(staged)
      require(fs.rename(p, new Path(dir, p.getName.stripPrefix("."))),
        s"publish rename failed: $staged")
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(HadoopConfSnapshot.driverConf)
    messages.collect { case AvroCommit(staged) =>
      fs.delete(new Path(staged), false)
    }
  }
}

private case class AvroCommit(staged: String) extends WriterCommitMessage

private class AvroWriterFactory(path: String, schema: StructType,
    codec: String, hconf: HadoopConfSnapshot) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new AvroDataWriter(path, schema, codec, partitionId, taskId, hconf)
}

private class AvroDataWriter(path: String, schema: StructType,
    codec: String, partitionId: Int, taskId: Long,
    hconf: HadoopConfSnapshot) extends DataWriter[InternalRow] {
  private val staged =
    new Path(path, f".part-$partitionId%05d-$taskId.avro")
  private val fields = schema.fields.map(AvroSource.toAvroField)
  private val fs = staged.getFileSystem(hconf.toConf)
  fs.mkdirs(new Path(path))
  private val out = fs.create(staged, true)
  private val writer = new AvroCodec.Writer(out, fields.toSeq, codec)

  override def write(row: InternalRow): Unit = {
    val vals = new Array[Any](schema.fields.length)
    var j = 0
    while (j < vals.length) {
      vals(j) =
        if (row.isNullAt(j)) null
        else schema.fields(j).dataType match {
          case LongType | TimestampType => row.getLong(j)
          case IntegerType => row.getInt(j)
          case DoubleType => row.getDouble(j)
          case FloatType => row.getFloat(j)
          case BooleanType => row.getBoolean(j)
          case StringType => row.getUTF8String(j).toString
          case BinaryType => row.getBinary(j)
          case ArrayType(et, _) =>
            val a = row.getArray(j)
            et match {
              case FloatType => a.toFloatArray()
              case DoubleType => a.toDoubleArray()
              case LongType => a.toLongArray()
              case IntegerType => a.toIntArray()
              case other => throw new IllegalStateException(other.sql)
            }
          case other => throw new IllegalStateException(other.sql)
        }
      j += 1
    }
    writer.write(vals)
  }

  override def commit(): WriterCommitMessage = {
    writer.finish()
    out.close()
    AvroCommit(staged.toString)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: Throwable => () }
    fs.delete(staged, false)
  }

  override def close(): Unit = ()
}
