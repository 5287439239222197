package graft.multimodal

/** Binary RIFF/AVI encode/decode — the video sibling of [[WavCodec]]:
  * a real AVI container (RIFF `AVI ` form, `hdrl` header list with
  * `avih`/`strh`/`strf`, `movi` list of uncompressed `00db` DIB
  * frames, BI_RGB 24-bit). The decode path walks actual chunk
  * structure — magic, list nesting, per-chunk sizes, word alignment —
  * and cross-validates the `avih` dimensions against every frame
  * chunk's byte count; nothing is derived from the payload length.
  * A file from [[render]] opens in any AVI-capable player that
  * handles raw RGB DIB frames.
  *
  * Layout constants (all fixed by the writer, load-bearing for the
  * closed-form frame offsets the oracle replays):
  *   0   "RIFF" size "AVI "                      (12 bytes)
  *   12  LIST(192) "hdrl"                        (12-byte list header)
  *   24    "avih"(56)  µs/frame, totalFrames, width, height, ...
  *   88    LIST(116) "strl"
  *   100     "strh"(56)  'vids'/'DIB ', dwLength = nFrames
  *   164     "strf"(40)  BITMAPINFOHEADER 24-bit BI_RGB
  *   212 LIST(...) "movi"
  *   224   "00db"(w·h·3) frame 0  → data at 232
  *         "00db"(w·h·3) frame f  → data at 232 + f·(w·h·3 + 8)
  */
object AviCodec {

  /** Deterministic frame geometry for an id — every parsed statistic
    * is closed-form in the id so a SQL oracle replays it:
    * `w = 4·(id%8 + 2)` (8..36, multiple of 4 ⇒ DIB rows need no
    * padding), `h = id%8 + 3`, `n = id%6 + 2` frames, and byte j of
    * frame f is `(id + 31·f + j) mod 256`. */
  def dims(id: Long): (Int, Int, Int) =
    ((math.floorMod(id, 8) + 2).toInt * 4,
      (math.floorMod(id, 8) + 3).toInt,
      (math.floorMod(id, 6) + 2).toInt)

  def render(id: Long): Array[Byte] = {
    val (w, h, n) = dims(id)
    val fsz = w * h * 3
    val moviBody = 4 + n * (8 + fsz)
    val riffBody = 4 + (8 + 192) + (8 + moviBody)
    val out = new Array[Byte](8 + riffBody)
    var p = 0
    def ascii(s: String): Unit = { s.foreach { c => out(p) = c.toByte; p += 1 } }
    def u32(v: Int): Unit = {
      out(p) = (v & 0xff).toByte; out(p + 1) = ((v >>> 8) & 0xff).toByte
      out(p + 2) = ((v >>> 16) & 0xff).toByte
      out(p + 3) = ((v >>> 24) & 0xff).toByte
      p += 4
    }
    def u16(v: Int): Unit = {
      out(p) = (v & 0xff).toByte; out(p + 1) = ((v >>> 8) & 0xff).toByte
      p += 2
    }
    ascii("RIFF"); u32(riffBody); ascii("AVI ")
    // hdrl list: avih + one video strl
    ascii("LIST"); u32(192); ascii("hdrl")
    ascii("avih"); u32(56)
    // dwFlags = 0: no idx1 chunk is written, so AVIF_HASINDEX (0x10)
    // must stay off — strict players trust the flag for seeking.
    u32(100000); u32(fsz * 10); u32(0); u32(0) // µs/frame, rate, pad, flags
    u32(n); u32(0); u32(1); u32(fsz) // totalFrames, initial, streams, bufSize
    u32(w); u32(h); u32(0); u32(0); u32(0); u32(0)
    ascii("LIST"); u32(116); ascii("strl") // body: "strl"+strh(64)+strf(48)
    ascii("strh"); u32(56)
    ascii("vids"); ascii("DIB ")
    u32(0); u16(0); u16(0); u32(0) // flags, priority, language, initial
    u32(1); u32(10) // scale, rate = 10 fps
    u32(0); u32(n); u32(fsz); u32(-1); u32(0) // start, length, bufSize, quality, sampleSize
    u16(0); u16(0); u16(w); u16(h) // rcFrame
    ascii("strf"); u32(40)
    u32(40); u32(w); u32(h); u16(1); u16(24) // biSize, w, h, planes, bpp
    u32(0); u32(fsz); u32(0); u32(0); u32(0); u32(0) // BI_RGB, sizeImage, ...
    // movi list: n uncompressed DIB frames
    ascii("LIST"); u32(moviBody); ascii("movi")
    var f = 0
    while (f < n) {
      ascii("00db"); u32(fsz)
      var j = 0
      while (j < fsz) {
        out(p) = math.floorMod(id + 31L * f + j, 256).toByte
        p += 1
        j += 1
      }
      f += 1
    }
    require(p == out.length, s"renderer layout drift: $p != ${out.length}")
    out
  }

  /** Parse AVI bytes → (width, height, nFrames, frameSums,
    * frameOffsets), or None when the payload is null / truncated /
    * not-RIFF-AVI / missing headers / frame-size-vs-header mismatch /
    * frame-count mismatch. `frameSums(f)` is the unsigned byte sum of
    * frame f's pixel data; `frameOffsets(f)` is the absolute byte
    * offset of that data in the payload — real positions from the
    * chunk walk, usable to slice the payload. */
  def parse(bytes: Array[Byte])
      : Option[(Int, Int, Int, Array[Long], Array[Long])] = {
    if (bytes == null || bytes.length < 24) return None
    def ascii(off: Int, s: String): Boolean =
      off + s.length <= bytes.length &&
        s.indices.forall(i => bytes(off + i) == s.charAt(i).toByte)
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    if (!ascii(0, "RIFF") || !ascii(8, "AVI ")) return None

    var width, height, totalFrames = -1
    var sums = List.empty[Long]
    var offsets = List.empty[Long]
    var sizes = List.empty[Long]

    // walk one chunk sequence [i, end); returns false on corruption
    def walk(i0: Int, end: Int, inMovi: Boolean): Boolean = {
      var i = i0
      while (i + 8 <= end) {
        val size = u32(i + 4)
        val body = i + 8
        if (size < 0 || size > end - body) return false // truncated
        if (ascii(i, "LIST")) {
          if (size < 4) return false
          val isMovi = ascii(body, "movi")
          if (!walk(body + 4, body + size.toInt, inMovi || isMovi))
            return false
        } else if (ascii(i, "avih")) {
          if (size < 40) return false
          totalFrames = u32(body + 16).toInt
          width = u32(body + 32).toInt
          height = u32(body + 36).toInt
        } else if (inMovi &&
          (ascii(i, "00db") || ascii(i, "00dc"))) {
          var s = 0L
          var j = body
          val stop = body + size.toInt
          while (j < stop) { s += bytes(j) & 0xff; j += 1 }
          sums ::= s
          offsets ::= body.toLong
          sizes ::= size
        } // unknown chunks (JUNK, idx1, strh, strf, ...) skip
        i = body + size.toInt + (size.toInt & 1) // word alignment
      }
      true
    }
    if (!walk(12, bytes.length, inMovi = false)) return None
    if (width <= 0 || height <= 0 || totalFrames <= 0) return None
    val frameSums = sums.reverse.toArray
    val frameOffsets = offsets.reverse.toArray
    // cross-validate: header claims vs what the movi walk found —
    // every frame chunk's DECLARED size must be exactly one w·h·3
    // uncompressed 24-bit raster, and the count must match avih
    if (frameSums.length != totalFrames) return None
    val fsz = width.toLong * height * 3
    if (!sizes.forall(_ == fsz)) return None
    Some((width, height, totalFrames, frameSums, frameOffsets))
  }

  /** 56-bit spatio-temporal video fingerprint — the video sibling of
    * [[PpmCodec.dhash56]] (spatial gradient bits) and
    * [[WavCodec.afp56]] (temporal energy bits): each of the first
    * min(n, 8) frames contributes 7 bits comparing ADJACENT eighths
    * of its own pixel data (window x = bytes j with ⌊j·8/fsz⌋ = x;
    * bit f·7+x set iff window x+1's byte sum exceeds window x's). A
    * re-encode that preserves content preserves the coarse intra-
    * frame energy shape, so near-identical clips collide — the
    * property a perceptual hash IS. Parses the real container
    * (offsets from the chunk walk, never arithmetic); unparseable →
    * None, the quarantine contract. */
  def vhash56(bytes: Array[Byte]): Option[Long] =
    parse(bytes).map { case (w, h, n, _, offs) =>
      val fsz = w * h * 3
      val nf = math.min(n, 8)
      var hash = 0L
      var f = 0
      while (f < nf) {
        val base = offs(f).toInt
        val win = new Array[Long](8)
        var j = 0
        while (j < fsz) {
          win(((j.toLong * 8) / fsz).toInt) += bytes(base + j) & 0xff
          j += 1
        }
        var x = 0
        while (x < 7) {
          if (win(x + 1) > win(x)) hash |= 1L << (f * 7 + x)
          x += 1
        }
        f += 1
      }
      hash
    }
}
