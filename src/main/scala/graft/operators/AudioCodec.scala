package graft.operators

/** Real (pure-JVM) WAV/PCM audio decode for the multimodal tier — the audio
  * counterpart of `ImageCodec`'s encode → sniff → decode shape. No native
  * codec is required: RIFF/WAVE with integer PCM is a ~44-byte header plus
  * little-endian samples, parseable with plain byte arithmetic.
  *
  * Two tiers, as with images:
  *  - `parseHeader`: chunk-walk to (sampleRate, channels, bits, nFrames)
  *    WITHOUT touching sample data — the cheap metadata pass;
  *  - `decodeSamples` (+ `rms`, `rmsProfile`): full PCM decode and signal
  *    features — the expensive pass you run after filtering.
  * Both are pure functions of the payload bytes: safe inside `mapPartitions`
  * with no shared state. Compressed audio (mp3/aac/…) and video stay behind
  * `Multimodal.FakeDecoder` — no pure-JVM decoder exists for them, and a
  * fake that pretends otherwise would be worse than the documented stub.
  */
object AudioCodec {

  /** Metadata of an integer-PCM WAVE payload. */
  final case class WavMeta(sampleRate: Int, channels: Int, bitsPerSample: Int,
                           nFrames: Long)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk the RIFF chunk list to the "fmt " and "data" chunks. Returns None
    * unless the payload is integer PCM (audioFormat 1) with a complete data
    * chunk — the contract a downstream `decodeSamples` can honor. */
  def parseHeader(b: Array[Byte]): Option[WavMeta] = {
    if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, sampleRate, bits)
    var dataBytes = -1L
    while (i + 8 <= b.length && (fmt.isEmpty || dataBytes < 0)) {
      val id = tag(b, i)
      val size = le32(b, i + 4).toLong & 0xffffffffL
      // a chunk size beyond the payload is malformed (and a still-needed
      // chunk can't follow it): without this guard a crafted size (e.g.
      // 0xFFFFFFF8 → toInt -8) stalls the walk or indexes out of bounds —
      // Multimodal feeds ARBITRARY payloads through here and the contract is
      // None, never a hang or an escaped exception
      if (size > b.length - i - 8) return None
      if (id == "fmt " && size >= 16) {
        val audioFormat = le16(b, i + 8)
        if (audioFormat != 1) return None // only integer PCM
        fmt = Some((le16(b, i + 10), le32(b, i + 12), le16(b, i + 22)))
      } else if (id == "data") {
        dataBytes = size
      }
      i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    fmt.collect {
      case (ch, sr, bits) if dataBytes >= 0 && ch > 0 && sr > 0 && (bits == 8 || bits == 16) =>
        WavMeta(sr, ch, bits, dataBytes / (ch.toLong * (bits / 8)))
    }
  }

  /** Full PCM decode: every sample (channel-interleaved) as a signed Int.
    * 16-bit samples are little-endian signed; 8-bit WAV samples are unsigned
    * with a 128 bias per the format. */
  def decodeSamples(b: Array[Byte]): Option[Array[Int]] =
    parseHeader(b).flatMap { m =>
      var i = 12
      while (i + 8 <= b.length) {
        val size = le32(b, i + 4).toLong & 0xffffffffL
        if (size > b.length - i - 8) return None // malformed chunk size
        if (tag(b, i) == "data") {
          val n = (m.nFrames * m.channels).toInt
          val out = new Array[Int](n)
          var s = 0
          val base = i + 8
          while (s < n) {
            out(s) =
              if (m.bitsPerSample == 16) le16(b, base + 2 * s).toShort.toInt
              else (b(base + s) & 0xff) - 128
            s += 1
          }
          return Some(out)
        }
        i += 8 + size.toInt + (size.toInt & 1)
      }
      None
    }

  /** Root-mean-square amplitude: sqrt(Σ s² / n). The sum is exact integer
    * arithmetic (16-bit samples square below 2^30), so the result is a pure
    * function of the samples — replayable by an ANSI-SQL oracle. */
  def rms(samples: Array[Int]): Double = {
    if (samples.isEmpty) return 0.0
    var sumsq = 0L
    var i = 0
    while (i < samples.length) { sumsq += samples(i).toLong * samples(i); i += 1 }
    math.sqrt(sumsq.toDouble / samples.length)
  }

  /** `dim`-window RMS profile normalized to [0, 1] by the 16-bit full scale —
    * the fixed-size float-feature contract `Multimodal.extractFeatures`
    * expects from a decoder. */
  def rmsProfile(samples: Array[Int], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (samples.isEmpty || dim == 0) return out
    var w = 0
    while (w < dim) {
      val lo = (samples.length.toLong * w / dim).toInt
      val hi = (samples.length.toLong * (w + 1) / dim).toInt
      if (hi > lo) {
        var sumsq = 0L
        var i = lo
        while (i < hi) { sumsq += samples(i).toLong * samples(i); i += 1 }
        out(w) = (math.sqrt(sumsq.toDouble / (hi - lo)) / 32768.0).toFloat
      }
      w += 1
    }
    out
  }

  /** Deterministic synthetic mono 16-bit PCM WAV: sample i is the pure
    * integer function ((seed·31 + i·7) mod 201) − 100 — small enough for a
    * SQL oracle to replay exactly (q71), while the bytes still travel the
    * same RIFF encode → sniff → decode path a real ingest would. */
  def synthWav(seed: Long, sampleRate: Int, nFrames: Int): Array[Byte] = {
    require(seed >= 0 && sampleRate > 0 && nFrames >= 0)
    val dataBytes = nFrames * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataBytes).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits
    b.put("data".getBytes).putInt(dataBytes)
    var i = 0
    while (i < nFrames) {
      b.putShort((((seed * 31 + i.toLong * 7) % 201) - 100).toShort)
      i += 1
    }
    b.array()
  }
}
