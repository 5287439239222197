package graft.multimodal

/** Binary RIFF/WAVE PCM16 encode/decode — the audio sibling of
  * [[PpmCodec]]: a canonical 44-byte PCM header followed by
  * interleaved little-endian 16-bit samples. The decode path in
  * [[Multimodal.decodeWav]] walks real chunk structure (RIFF magic,
  * `fmt ` fields, `data` payload, unknown chunks skipped) — not
  * arithmetic on the byte length.
  */
object WavCodec {

  /** Deterministic stereo PCM16 bytes for an id: frames-per-channel
    * `n = id % 384 + 64` at 8 kHz, sample k of channel c is
    * `((id·7 + 13k + 5c) mod 4096) − 2048` — every parsed statistic
    * is closed-form in the id, so a SQL oracle replays it while the
    * Spark side genuinely parses bytes (a file from here plays in
    * any WAV-capable player). */
  def render(id: Long): Array[Byte] = {
    val n = (math.floorMod(id, 384) + 64).toInt
    val nch = 2
    val rate = 8000
    val dataLen = n * nch * 2
    val out = new Array[Byte](44 + dataLen)
    def putAscii(off: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, out, off, b.length)
    }
    def putU32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >>> 8) & 0xff).toByte
      out(off + 2) = ((v >>> 16) & 0xff).toByte
      out(off + 3) = ((v >>> 24) & 0xff).toByte
    }
    def putU16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >>> 8) & 0xff).toByte
    }
    putAscii(0, "RIFF"); putU32(4, 36 + dataLen); putAscii(8, "WAVE")
    putAscii(12, "fmt "); putU32(16, 16)
    putU16(20, 1) // PCM
    putU16(22, nch); putU32(24, rate)
    putU32(28, rate * nch * 2) // byte rate
    putU16(32, nch * 2) // block align
    putU16(34, 16) // bits per sample
    putAscii(36, "data"); putU32(40, dataLen)
    var k = 0
    var off = 44
    while (k < n) {
      var c = 0
      while (c < nch) {
        val s = (math.floorMod(id * 7 + 13L * k + 5L * c, 4096) - 2048).toInt
        out(off) = (s & 0xff).toByte
        out(off + 1) = ((s >> 8) & 0xff).toByte
        off += 2
        c += 1
      }
      k += 1
    }
    out
  }

  /** Parse WAV bytes → (channels, sampleRate, framesPerChannel,
    * sumCh0, sumCh1, peakAbs), or None when the payload is
    * null/truncated/not-RIFF-WAVE/not-PCM16/over-2-channel. Chunk
    * walk skips unknown chunks (word-aligned, as the spec requires);
    * one pass over the sample bytes. `sumCh1` is 0 for mono. */
  def parse(bytes: Array[Byte]): Option[(Int, Int, Long, Long, Long, Long)] = {
    if (bytes == null || bytes.length < 44) return None
    def ascii(off: Int, s: String): Boolean =
      s.indices.forall(i => bytes(off + i) == s.charAt(i).toByte)
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def u16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    if (!ascii(0, "RIFF") || !ascii(8, "WAVE")) return None

    var i = 12
    var fmt: Option[(Int, Int)] = None // (channels, rate) once valid
    while (i + 8 <= bytes.length) {
      val size = u32(i + 4)
      if (size < 0 || size > bytes.length - i - 8) return None // truncated
      val body = i + 8
      if (ascii(i, "fmt ")) {
        if (size < 16) return None
        val audioFormat = u16(body)
        val nch = u16(body + 2)
        val rate = u32(body + 4).toInt
        val bits = u16(body + 14)
        if (audioFormat != 1 || bits != 16 || nch < 1 || nch > 2) return None
        fmt = Some((nch, rate))
      } else if (ascii(i, "data")) {
        val (nch, rate) = fmt.getOrElse(return None) // fmt must precede data
        val blockAlign = nch * 2
        if (size % blockAlign != 0) return None
        val frames = size / blockAlign
        var (s0, s1, peak) = (0L, 0L, 0L)
        var off = body
        val end = body + size.toInt
        while (off < end) {
          var c = 0
          while (c < nch) {
            val v = ((bytes(off) & 0xff) | (bytes(off + 1) << 8)).toShort.toLong
            if (c == 0) s0 += v else s1 += v
            val a = math.abs(v)
            if (a > peak) peak = a
            off += 2
            c += 1
          }
        }
        return Some((nch, rate, frames, s0, s1, peak))
      }
      i = body + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    None
  }

  /** 56-bit audio fingerprint from the PARSED samples — the
    * energy-delta shape of production audio fingerprints (Haitsma–
    * Kalker reduced to its invariant: a compact bit string of
    * adjacent-band/adjacent-window energy comparisons), computed on
    * the time axis so the SQL oracle replays it closed-form without
    * an FFT: the LEFT channel's frames split into 57 equal windows
    * (frame k of n → window k·57/n, integer division), per-window
    * energy is Σ sample², and bit w = energy(w+1) > energy(w),
    * packed at position w. 56 bits keeps SQL replay inside
    * non-negative BIGINT (the dhash56/simhash precedent). Returns
    * None for unparseable payloads OR fewer than 57 frames (a window
    * would be empty). Energy fits a Long: 2048²·frames ≪ 2⁶³. */
  def afp56(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null || bytes.length < 44) return None
    def ascii(off: Int, s: String): Boolean =
      s.indices.forall(i => bytes(off + i) == s.charAt(i).toByte)
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def u16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    if (!ascii(0, "RIFF") || !ascii(8, "WAVE")) return None
    var i = 12
    var nch = 0
    while (i + 8 <= bytes.length) {
      val size = u32(i + 4)
      if (size < 0 || size > bytes.length - i - 8) return None
      val body = i + 8
      if (ascii(i, "fmt ")) {
        if (size < 16) return None
        if (u16(body) != 1 || u16(body + 14) != 16) return None
        nch = u16(body + 2)
        if (nch < 1 || nch > 2) return None
      } else if (ascii(i, "data")) {
        if (nch == 0) return None
        val blockAlign = nch * 2
        if (size % blockAlign != 0) return None
        val n = (size / blockAlign).toInt
        if (n < 57) return None
        val energy = new Array[Long](57)
        var k = 0
        while (k < n) {
          val off = body + k * blockAlign // left channel sample
          val v = ((bytes(off) & 0xff) | (bytes(off + 1) << 8)).toShort.toLong
          energy((k * 57 / n).toInt) += v * v
          k += 1
        }
        var fp = 0L
        var w = 0
        while (w < 56) {
          if (energy(w + 1) > energy(w)) fp |= 1L << w
          w += 1
        }
        return Some(fp)
      }
      i = body + size.toInt + (size.toInt & 1)
    }
    None
  }
}
