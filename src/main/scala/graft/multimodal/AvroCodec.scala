package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{Deflater, Inflater}

/** Avro Object Container File codec, written from the published Avro
  * 1.11 specification (container layout, binary encoding, deflate
  * codec) — the connector jar is absent from this image, so the
  * format is implemented at the byte level like the PPM and WAV
  * codecs, against the spec alone.
  *
  * Supported value model: a FLAT record whose fields are
  * null / boolean / int / long / float / double / string / bytes,
  * each optionally nullable as the union `["null", T]` (branch index
  * 0 = null, 1 = value — the layout every mainstream Avro writer
  * emits for nullable columns). Codecs: `null` and `deflate` (raw
  * RFC-1951, per the spec).
  *
  * Container layout (spec §Object Container Files):
  *   magic "Obj\x01" · metadata map{avro.schema, avro.codec} ·
  *   16-byte sync · blocks of [count, byteLen, payload, sync].
  * Binary encoding (spec §Binary Encoding): zig-zag varint
  * ints/longs, little-endian IEEE float/double, length-prefixed
  * UTF-8 strings and bytes, one-byte booleans, empty nulls, unions
  * as branch-index-then-value.
  *
  * Malformed input REJECTS with [[AvroCodec.AvroFormatException]] —
  * never an obscure failure, OOM-scale allocation, or a hang — the
  * same fuzz contract the other binary codecs carry.
  */
object AvroCodec {

  final class AvroFormatException(msg: String)
    extends RuntimeException(msg)

  private def bad(msg: String): Nothing = throw new AvroFormatException(msg)

  /** One record field: Avro primitive name + nullability + optional
    * logical-type annotation (e.g. `timestamp-micros` on long — the
    * spec's way to round-trip timestamps through the long encoding).
    * `items` = Some(elementPrimitive) makes the field an ARRAY of
    * that primitive (spec §Arrays: blocked encoding, zero-count
    * terminator) — the embedding-column type. */
  case class AvroField(name: String, tpe: String, nullable: Boolean,
      logical: Option[String] = None, items: Option[String] = None)

  val Primitives: Set[String] =
    Set("boolean", "int", "long", "float", "double", "string", "bytes")

  private val Magic = Array[Byte]('O', 'b', 'j', 1)

  // ---------------------------------------------------------------
  // binary primitives
  // ---------------------------------------------------------------

  private[multimodal] def writeLong(out: ByteArrayOutputStream,
      v: Long): Unit = {
    var z = (v << 1) ^ (v >> 63) // zig-zag
    while ((z & ~0x7fL) != 0) {
      out.write(((z & 0x7f) | 0x80).toInt)
      z >>>= 7
    }
    out.write(z.toInt)
  }

  private def writeBytes(out: ByteArrayOutputStream, b: Array[Byte]): Unit = {
    writeLong(out, b.length.toLong); out.write(b)
  }

  private def writeString(out: ByteArrayOutputStream, s: String): Unit =
    writeBytes(out, s.getBytes(UTF_8))

  /** Bounded cursor over a byte array; every read checks remaining. */
  private[multimodal] final class In(buf: Array[Byte], var pos: Int,
      val end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    def remaining: Int = end - pos
    def u8(): Int = {
      if (pos >= end) bad("truncated: varint runs past the end")
      val b = buf(pos) & 0xff; pos += 1; b
    }
    def readLong(): Long = {
      var shift = 0; var acc = 0L; var b = 0
      do {
        if (shift > 63) bad("varint longer than 10 bytes")
        b = u8()
        acc |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      (acc >>> 1) ^ -(acc & 1) // un-zig-zag
    }
    def readN(n: Long): Array[Byte] = {
      if (n < 0 || n > remaining)
        bad(s"length $n exceeds remaining $remaining bytes")
      val a = java.util.Arrays.copyOfRange(buf, pos, pos + n.toInt)
      pos += n.toInt
      a
    }
    def skipN(n: Long): Unit = {
      if (n < 0 || n > remaining)
        bad(s"length $n exceeds remaining $remaining bytes")
      pos += n.toInt
    }
  }

  // ---------------------------------------------------------------
  // schema JSON
  // ---------------------------------------------------------------

  /** The canonical writer-schema JSON for a flat record. */
  def schemaJson(fields: Seq[AvroField], name: String = "row"): String =
    fields.map { f =>
      val base = (f.items, f.logical) match {
        case (Some(it), _) => s"""{"type":"array","items":"$it"}"""
        case (None, Some(l)) => s"""{"type":"${f.tpe}","logicalType":"$l"}"""
        case (None, None) => s""""${f.tpe}""""
      }
      val t = if (f.nullable) s"""["null",$base]""" else base
      s"""{"name":"${f.name}","type":$t}"""
    }.mkString(
      s"""{"type":"record","name":"$name","fields":[""", ",", "]}")

  /** Parse a record schema back out of standard Avro JSON. Accepts
    * any field order and whitespace (a real JSON walk, not a regex),
    * `["null", T]` / `[T, "null"]` unions, and ignores attributes it
    * doesn't model (doc, logicalType, aliases). Anything outside the
    * flat-record model rejects. */
  def parseSchema(json: String): Seq[AvroField] = {
    // a malformed schema is a malformed container: surface it under
    // this codec's own reject contract, not the parser's
    val root = (try graft.Json.parse(json) catch {
      case e: graft.Json.JsonException => bad(s"bad schema JSON: ${e.getMessage}")
    }) match {
      case o: Map[_, _] => o.asInstanceOf[Map[String, Any]]
      case _ => bad("schema is not a JSON object")
    }
    if (!root.get("type").contains("record")) bad("schema is not a record")
    val fields = root.get("fields") match {
      case Some(l: List[_]) => l
      case _ => bad("record schema lacks a fields array")
    }
    // one type node → (primitive, logical, items): accepts the
    // bare-string, the {"type":..,"logicalType":..} annotated, and
    // the {"type":"array","items":primitive} forms
    def one(t: Any, where: String)
        : (String, Option[String], Option[String]) = t match {
      case s: String if Primitives(s) => (s, None, None)
      case o: Map[_, _] =>
        val m = o.asInstanceOf[Map[String, Any]]
        (m.get("type"), m.get("items")) match {
          case (Some("array"), Some(it: String)) if Primitives(it) =>
            ("array", None, Some(it))
          case (Some(s: String), _) if Primitives(s) =>
            (s, m.get("logicalType").collect { case l: String => l }, None)
          case other => bad(s"unsupported type object in $where: $other")
        }
      case other => bad(s"unsupported type in $where: $other")
    }
    fields.map {
      case f: Map[_, _] =>
        val m = f.asInstanceOf[Map[String, Any]]
        val name = m.get("name") match {
          case Some(s: String) => s
          case _ => bad("field lacks a name")
        }
        m.get("type") match {
          case Some(l: List[_]) =>
            if (l.size != 2 || !l.contains("null"))
              bad(s"unsupported union for '$name': ${l.mkString(",")}")
            val (t, logical, items) = one(l.filter(_ != "null").head, s"'$name'")
            AvroField(name, t, true, logical, items)
          case Some(t) =>
            val (p, logical, items) = one(t, s"'$name'")
            AvroField(name, p, false, logical, items)
          case None => bad(s"field '$name' lacks a type")
        }
      case other => bad(s"field entry is not an object: $other")
    }
  }

  // ---------------------------------------------------------------
  // container write
  // ---------------------------------------------------------------

  /** Streaming container writer: rows are `Array[Any]` positionally
    * matching `fields` (Boolean/Int/Long/Float/Double/String/
    * Array[Byte]/null). Blocks flush every `blockRows`. Deterministic
    * sync marker derived from the schema — byte-identical output for
    * identical input, same policy as the other codecs. */
  final class Writer(out: java.io.OutputStream, fields: Seq[AvroField],
      codec: String = "null", blockRows: Int = 4096) {
    require(codec == "null" || codec == "deflate", s"codec: $codec")
    private val schema = schemaJson(fields)
    private val sync = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(("graft-avro:" + schema + ":" + codec).getBytes(UTF_8))
    }
    locally { // header
      val h = new ByteArrayOutputStream()
      h.write(Magic)
      writeLong(h, 2L) // metadata map: 2 entries
      writeString(h, "avro.schema"); writeBytes(h, schema.getBytes(UTF_8))
      writeString(h, "avro.codec"); writeBytes(h, codec.getBytes(UTF_8))
      writeLong(h, 0L) // map terminator
      h.write(sync)
      out.write(h.toByteArray)
    }
    private var block = new ByteArrayOutputStream()
    private var n = 0

    def write(row: Array[Any]): Unit = {
      require(row.length == fields.length,
        s"row arity ${row.length} != schema arity ${fields.length}")
      var i = 0
      while (i < fields.length) {
        val f = fields(i)
        val v = row(i)
        if (f.nullable) writeLong(block, if (v == null) 0L else 1L)
        else if (v == null) throw new IllegalArgumentException(
          s"null in non-nullable field '${f.name}'")
        if (v != null) f.items match {
          case Some(it) =>
            // array: one positive-count block of items, 0 terminator
            val elems = v match {
              case a: Array[_] => a.toSeq
              case s: scala.collection.Seq[_] => s.toSeq
              case other => throw new IllegalArgumentException(
                s"array field '${f.name}' got ${other.getClass.getName}")
            }
            if (elems.nonEmpty) {
              writeLong(block, elems.size.toLong)
              elems.foreach(e => writePrimitive(block, it, e, f.name))
            }
            writeLong(block, 0L)
          case None => writePrimitive(block, f.tpe, v, f.name)
        }
        i += 1
      }
      n += 1
      if (n >= blockRows) flush()
    }

    private def flush(): Unit = if (n > 0) {
      val payload =
        if (codec == "deflate") deflate(block.toByteArray)
        else block.toByteArray
      val b = new ByteArrayOutputStream()
      writeLong(b, n.toLong)
      writeLong(b, payload.length.toLong)
      out.write(b.toByteArray)
      out.write(payload)
      out.write(sync)
      block = new ByteArrayOutputStream()
      n = 0
    }

    def finish(): Unit = flush()
  }

  private def writePrimitive(block: ByteArrayOutputStream, tpe: String,
      v: Any, field: String): Unit = tpe match {
    case "boolean" => block.write(if (v.asInstanceOf[Boolean]) 1 else 0)
    case "int" => writeLong(block, v.asInstanceOf[Int].toLong)
    case "long" => writeLong(block, v.asInstanceOf[Long])
    case "float" =>
      le32(block, java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
    case "double" =>
      le64(block, java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
    case "string" => writeString(block, v.asInstanceOf[String])
    case "bytes" => writeBytes(block, v.asInstanceOf[Array[Byte]])
    case other => throw new IllegalArgumentException(
      s"field '$field': unsupported primitive $other")
  }

  private def le32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }
  private def le64(out: ByteArrayOutputStream, v: Long): Unit = {
    le32(out, v.toInt); le32(out, (v >>> 32).toInt)
  }

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, /* nowrap = */ true)
    d.setInput(b); d.finish()
    val out = new ByteArrayOutputStream(math.max(64, b.length / 2))
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Inflate with an explicit output ceiling: a malicious block
    * cannot claim a petabyte and make the reader allocate it. */
  private def inflate(b: Array[Byte], maxOut: Int): Array[Byte] = {
    val inf = new Inflater(/* nowrap = */ true)
    inf.setInput(b)
    val out = new ByteArrayOutputStream(math.min(maxOut, b.length * 4 + 64))
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) bad("truncated deflate stream")
        out.write(buf, 0, n)
        if (out.size() > maxOut) bad(s"deflate output exceeds $maxOut bytes")
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        bad(s"corrupt deflate stream: ${e.getMessage}")
    } finally inf.end()
    out.toByteArray
  }

  private def readPrimitive(block: In, tpe: String, field: String): Any =
    tpe match {
      case "boolean" => block.u8() != 0
      case "int" =>
        val v = block.readLong()
        if (v < Int.MinValue || v > Int.MaxValue)
          bad(s"int field '$field' out of range: $v")
        v.toInt
      case "long" => block.readLong()
      case "float" =>
        val b = block.readN(4)
        java.lang.Float.intBitsToFloat(
          (b(0) & 0xff) | ((b(1) & 0xff) << 8) |
            ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 24))
      case "double" =>
        val b = block.readN(8)
        var bits = 0L; var k = 7
        while (k >= 0) { bits = (bits << 8) | (b(k) & 0xffL); k -= 1 }
        java.lang.Double.longBitsToDouble(bits)
      case "string" => new String(block.readN(block.readLong()), UTF_8)
      case "bytes" => block.readN(block.readLong())
      case other => bad(s"field '$field': unsupported primitive $other")
    }

  private def skipPrimitive(block: In, tpe: String): Unit = tpe match {
    case "boolean" => block.u8()
    case "int" | "long" => block.readLong()
    case "float" => block.skipN(4)
    case "double" => block.skipN(8)
    case "string" | "bytes" => block.skipN(block.readLong())
    case other => bad(s"unsupported primitive $other")
  }

  // ---------------------------------------------------------------
  // container read
  // ---------------------------------------------------------------

  case class Header(fields: Seq[AvroField], codec: String,
      sync: Array[Byte], bodyOffset: Int)

  /** Maximum decompressed block size accepted — far above any block
    * this writer emits, far below an allocation attack. */
  val MaxBlockBytes: Int = 256 << 20

  def readHeader(bytes: Array[Byte]): Header = {
    val in = new In(bytes)
    if (in.remaining < 4 || !java.util.Arrays.equals(in.readN(4), Magic))
      bad("not an Avro container: bad magic")
    var schema: Option[String] = None
    var codec = "null"
    var count = in.readLong()
    while (count != 0) {
      if (count < 0) { // spec: negative count is followed by a byte size
        in.readLong(); count = -count
      }
      var i = 0L
      while (i < count) {
        val key = new String(in.readN(in.readLong()), UTF_8)
        val value = in.readN(in.readLong())
        key match {
          case "avro.schema" => schema = Some(new String(value, UTF_8))
          case "avro.codec" => codec = new String(value, UTF_8)
          case _ => // ignore unknown metadata, per spec
        }
        i += 1
      }
      count = in.readLong()
    }
    if (codec != "null" && codec != "deflate")
      bad(s"unsupported codec '$codec'")
    val fields = parseSchema(schema.getOrElse(bad("missing avro.schema")))
    if (in.remaining < 16) bad("truncated: no sync marker after header")
    Header(fields, codec, in.readN(16), in.pos)
  }

  /** Decode every record, materializing only the fields whose index
    * is in `wanted` (others are parsed and skipped — Avro is
    * row-oriented, so the bytes must be walked either way, but
    * string/bytes skipping avoids the copy). Output arrays are in
    * `wanted`'s order. */
  def readRows(bytes: Array[Byte], wanted: Seq[Int]): Iterator[Array[Any]] = {
    val h = readHeader(bytes)
    val want = wanted.toArray
    val top = new In(bytes, h.bodyOffset, bytes.length)
    new Iterator[Array[Any]] {
      private var block: In = _
      private var left = 0L

      private def nextBlock(): Boolean = {
        if (top.remaining == 0) return false
        val count = top.readLong()
        val size = top.readLong()
        if (count <= 0) bad(s"non-positive block count $count")
        val payload = top.readN(size)
        val raw =
          if (h.codec == "deflate") inflate(payload, MaxBlockBytes)
          else payload
        if (top.remaining < 16 ||
          !java.util.Arrays.equals(top.readN(16), h.sync))
          bad("sync marker mismatch after block")
        block = new In(raw)
        left = count
        true
      }

      override def hasNext: Boolean =
        left > 0 || nextBlock()

      override def next(): Array[Any] = {
        if (!hasNext) throw new NoSuchElementException
        val out = new Array[Any](want.length)
        var i = 0
        while (i < h.fields.length) {
          val f = h.fields(i)
          val slot = {
            var s = -1; var j = 0
            while (j < want.length) { if (want(j) == i) s = j; j += 1 }
            s
          }
          val present = !f.nullable || {
            block.readLong() match {
              case 0L => false
              case 1L => true
              case b => bad(s"union branch $b out of range")
            }
          }
          if (present) f.items match {
            case Some(it) =>
              // array: positive- or negative-count item blocks until a
              // zero count. A negative count is followed by the byte
              // size (spec) — used for skipping, or just consumed.
              val buf =
                if (slot >= 0) scala.collection.mutable.ArrayBuffer[Any]()
                else null
              var count = block.readLong()
              while (count != 0) {
                val (n, byteSize) =
                  if (count < 0) (-count, block.readLong()) else (count, -1L)
                if (slot < 0 && byteSize >= 0) block.skipN(byteSize)
                else {
                  var k = 0L
                  while (k < n) {
                    val v = readPrimitive(block, it, f.name)
                    if (slot >= 0) buf += v
                    k += 1
                  }
                }
                count = block.readLong()
              }
              if (slot >= 0) out(slot) = buf.toSeq
            case None =>
              if (slot >= 0) out(slot) = readPrimitive(block, f.tpe, f.name)
              else skipPrimitive(block, f.tpe)
          }
          i += 1
        }
        left -= 1
        out
      }
    }
  }
}
