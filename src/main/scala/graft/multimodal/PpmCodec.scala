package graft.multimodal

/** Binary P6 PPM encode/decode — the trivial-but-real raster format
  * (netpbm): ASCII `P6`, whitespace-separated width/height/maxval
  * with `#` comment support, then `width*height*3` packed RGB bytes.
  * Small on purpose: the point is that the decode path in
  * [[Multimodal.decodePpm]] parses actual file bytes, not arithmetic
  * on their length.
  */
object PpmCodec {

  /** Deterministic P6 bytes for an id: dimensions and pixels are
    * closed-form in the id (see [[Multimodal.withPpmPayload]]). */
  def render(id: Long): Array[Byte] = {
    val w = (math.floorMod(id, 64) + 8).toInt
    val h = (math.floorMod(id, 48) + 6).toInt
    val s = math.floorMod(id, 256).toInt
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var j = 0
    val n = w * h * 3
    while (j < n) {
      out(header.length + j) = ((s + j) % 256).toByte
      j += 1
    }
    out
  }

  /** Parse P6 bytes → (width, height, sumR, sumG, sumB), or None when
    * the payload is null/truncated/not-P6/maxval>255. One pass over
    * the pixel bytes; no allocation beyond the tuple. */
  def parse(bytes: Array[Byte]): Option[(Int, Int, Long, Long, Long)] =
    parseHeader(bytes).map { case (w, h, off) =>
      val n = w * h * 3
      var (sr, sg, sb) = (0L, 0L, 0L)
      var j = off
      val end = off + n
      while (j < end) {
        sr += bytes(j) & 0xff
        sg += bytes(j + 1) & 0xff
        sb += bytes(j + 2) & 0xff
        j += 3
      }
      (w, h, sr, sg, sb)
    }

  /** 56-bit difference hash (dHash) over the decoded raster: sample
    * an 8×8 grayscale grid by nearest neighbor (`sx = x·w / 8`,
    * `sy = y·h / 8`, integer division — exactly replayable in SQL),
    * where "gray" is the raw r+g+b channel sum (0..765 — the
    * monotone map that matters for the > comparisons, no lossy /3),
    * then bit (x, y) = gray(x+1, y) > gray(x, y) for x in 0..6,
    * packed at position y·7+x. 7 comparisons × 8 rows = 56 bits —
    * deliberately inside non-negative BIGINT territory (the
    * dedup_simhash 60-bit precedent) so SQL arithmetic replays it
    * without signed-overflow edge cases. */
  def dhash56(bytes: Array[Byte]): Option[Long] =
    parseHeader(bytes).map { case (w, h, off) =>
      val g = new Array[Int](64)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val k = (y * h / 8) * w + (x * w / 8)
          val p = off + 3 * k
          g(y * 8 + x) = (bytes(p) & 0xff) + (bytes(p + 1) & 0xff) +
            (bytes(p + 2) & 0xff)
          x += 1
        }
        y += 1
      }
      var hash = 0L
      y = 0
      while (y < 8) {
        var x = 0
        while (x < 7) {
          if (g(y * 8 + x + 1) > g(y * 8 + x))
            hash |= 1L << (y * 7 + x)
          x += 1
        }
        y += 1
      }
      hash
    }

  /** Header parse shared by [[parse]] and [[dhash56]]:
    * (width, height, raster offset), or None on malformed input. */
  private def parseHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (bytes == null || bytes.length < 2 ||
      bytes(0) != 'P' || bytes(1) != '6') return None
    var i = 2

    def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'

    // skip whitespace and '#'-to-end-of-line comments (legal in netpbm
    // headers even though our own renderer never emits them)
    def skipWs(): Unit = {
      var going = true
      while (going && i < bytes.length) {
        if (isWs(bytes(i))) i += 1
        else if (bytes(i) == '#') {
          while (i < bytes.length && bytes(i) != '\n') i += 1
        } else going = false
      }
    }

    // accumulate in Long and clamp: "65536 65536" must reject as
    // malformed, not wrap w*h*3 through Int to a bogus small raster
    def readInt(): Long = {
      skipWs()
      var v = 0L
      var any = false
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1; any = true
        if (v > Int.MaxValue) return Int.MaxValue.toLong + 1 // overflow
      }
      if (any) v else -1L
    }

    val w = readInt(); val h = readInt(); val maxval = readInt()
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
    // exactly ONE whitespace byte separates maxval from the raster
    if (i >= bytes.length || !isWs(bytes(i))) return None
    i += 1
    val nL = w * h * 3L
    if (nL > bytes.length - i) return None // covers overflow: n > len
    Some((w.toInt, h.toInt, i))
  }
}
