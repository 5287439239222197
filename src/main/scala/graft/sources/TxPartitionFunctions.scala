package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, StructType, TimestampNTZType, TimestampType}

/** The `days` / `months` partition-transform FUNCTIONS Spark's V2
  * write machinery resolves through the table catalog
  * (`V2ExpressionUtils.toCatalyst` needs a `FunctionCatalog` to turn
  * a transform in a required distribution into a catalyst clustering
  * expression — Iceberg ships the same pair). Only the WRITE
  * CLUSTERING flows through these (rows of one day hash to one task);
  * the partition VALUES the manifest records come from
  * [[TxTable.PartTransform]]'s own canonical-string derivation over
  * the written files, so a session-timezone disagreement here can
  * only loosen file tightness, never correctness. */
private[sources] object TxPartitionFunctions {

  private def daysOf(micros: Long): Int =
    Math.floorDiv(micros, 86400000000L).toInt

  private abstract class Bound(fname: String, dt: DataType)
      extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(dt)
    override def resultType(): DataType = IntegerType
    override def name(): String = fname
    override def canonicalName(): String = s"txtable.$fname"
  }

  val Days: UnboundFunction = new UnboundFunction {
    override def name(): String = "days"
    override def description(): String =
      "partition transform: days since epoch of a date/timestamp"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"days() takes one argument, got ${inputType.catalogString}")
      inputType.fields(0).dataType match {
        case dt @ (TimestampType | TimestampNTZType) =>
          new Bound("days", dt) {
            override def produceResult(input: InternalRow): Integer =
              daysOf(input.getLong(0))
          }
        case DateType => new Bound("days", DateType) {
          override def produceResult(input: InternalRow): Integer =
            input.getInt(0)
        }
        case other => throw new UnsupportedOperationException(
          s"days() needs a date/timestamp column, got $other")
      }
    }
  }

  val Months: UnboundFunction = new UnboundFunction {
    override def name(): String = "months"
    override def description(): String =
      "partition transform: months since epoch of a date/timestamp"
    private def monthsOfDay(epochDay: Long): Int = {
      val d = java.time.LocalDate.ofEpochDay(epochDay)
      (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
    }
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"months() takes one argument, got ${inputType.catalogString}")
      inputType.fields(0).dataType match {
        case dt @ (TimestampType | TimestampNTZType) =>
          new Bound("months", dt) {
            override def produceResult(input: InternalRow): Integer =
              monthsOfDay(daysOf(input.getLong(0)).toLong)
          }
        case DateType => new Bound("months", DateType) {
          override def produceResult(input: InternalRow): Integer =
            monthsOfDay(input.getInt(0).toLong)
        }
        case other => throw new UnsupportedOperationException(
          s"months() needs a date/timestamp column, got $other")
      }
    }
  }

  val Hours: UnboundFunction = new UnboundFunction {
    override def name(): String = "hours"
    override def description(): String =
      "partition transform: hours since epoch of a timestamp"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"hours() takes one argument, got ${inputType.catalogString}")
      inputType.fields(0).dataType match {
        case dt @ (TimestampType | TimestampNTZType) =>
          new Bound("hours", dt) {
            override def produceResult(input: InternalRow): Integer =
              Math.floorDiv(input.getLong(0), 3600000000L).toInt
          }
        case other => throw new UnsupportedOperationException(
          s"hours() needs a timestamp column, got $other")
      }
    }
  }

  val Years: UnboundFunction = new UnboundFunction {
    override def name(): String = "years"
    override def description(): String =
      "partition transform: years since epoch of a date/timestamp"
    private def yearOfDay(epochDay: Long): Int =
      java.time.LocalDate.ofEpochDay(epochDay).getYear - 1970
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"years() takes one argument, got ${inputType.catalogString}")
      inputType.fields(0).dataType match {
        case dt @ (TimestampType | TimestampNTZType) =>
          new Bound("years", dt) {
            override def produceResult(input: InternalRow): Integer =
              yearOfDay(daysOf(input.getLong(0)).toLong)
          }
        case DateType => new Bound("years", DateType) {
          override def produceResult(input: InternalRow): Integer =
            yearOfDay(input.getInt(0).toLong)
        }
        case other => throw new UnsupportedOperationException(
          s"years() needs a date/timestamp column, got $other")
      }
    }
  }

  /** `truncate(w, col)` — the string-prefix transform (see
    * [[TxTable.PartTruncate]]): first `w` characters, the same
    * derivation the manifest value sets record. */
  val Truncate: UnboundFunction = new UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "partition transform: first w characters of a string column"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"truncate() takes (w, col), got ${inputType.catalogString}")
      val types = inputType.fields.map(_.dataType)
      // accept either argument order ((w, col) or (col, w)) — the SQL
      // parser preserves what the user wrote
      val (wIdx, sIdx) = types match {
        case Array(IntegerType,
          org.apache.spark.sql.types.StringType) => (0, 1)
        case Array(org.apache.spark.sql.types.StringType,
          IntegerType) => (1, 0)
        case _ => throw new UnsupportedOperationException(
          s"truncate() needs (int width, string col), got " +
            inputType.catalogString)
      }
      new ScalarFunction[org.apache.spark.unsafe.types.UTF8String] {
        override def inputTypes(): Array[DataType] = types
        override def resultType(): DataType =
          org.apache.spark.sql.types.StringType
        override def name(): String = "truncate"
        override def canonicalName(): String = "txtable.truncate(string)"
        override def produceResult(input: InternalRow)
            : org.apache.spark.unsafe.types.UTF8String = {
          val s = input.getUTF8String(sIdx)
          if (s == null) null
          else s.substring(0, math.min(input.getInt(wIdx), s.numChars()))
        }
      }
    }
  }

  /** `bucket(n, col)` — Iceberg's bucket transform shape over Spark's
    * own Murmur3 (`functions.hash`, seed 42): `pmod(hash(col), n)`.
    * The SAME derivation as [[TxTable.PartBucket.expr]], so the
    * manifest's recorded bucket values, the write clustering, and the
    * catalyst `TransformExpression` Spark builds for STORAGE-
    * PARTITIONED JOINS all agree. Two bucketed TxTables joined on the
    * bucket column compare these functions by `canonicalName` +
    * numBuckets (`KeyGroupedShuffleSpec`) — equal → ZERO Exchange. */
  val Bucket: UnboundFunction = new UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "partition transform: pmod(murmur3_hash(col), n)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket() takes (n, col), got ${inputType.catalogString}")
      val dt = inputType.fields(1).dataType
      new ScalarFunction[Integer] {
        override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
        override def resultType(): DataType = IntegerType
        override def name(): String = "bucket"
        override def canonicalName(): String =
          s"txtable.bucket(${dt.catalogString})"
        override def produceResult(input: InternalRow): Integer = {
          val n = input.getInt(0)
          val v = input.get(1, dt)
          val h = org.apache.spark.sql.catalyst.expressions
            .Murmur3HashFunction.hash(v, dt, 42L).toInt
          ((h % n) + n) % n
        }
      }
    }
  }

  def lookup(name: String): Option[UnboundFunction] = name match {
    case "days" => Some(Days)
    case "months" => Some(Months)
    case "hours" => Some(Hours)
    case "years" => Some(Years)
    case "bucket" => Some(Bucket)
    case "truncate" => Some(Truncate)
    case _ => None
  }
}
