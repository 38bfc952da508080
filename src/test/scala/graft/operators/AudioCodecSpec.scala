package graft.operators

import graft.SparkSpec

class AudioCodecSpec extends SparkSpec {

  test("synth -> parse -> decode round-trip with exact metadata and samples") {
    val wav = AudioCodec.synthWav(seed = 42, sampleRate = 16000, nFrames = 500)
    assert(AudioCodec.parseHeader(wav).contains(AudioCodec.WavMeta(16000, 1, 16, 500)))
    val s = AudioCodec.decodeSamples(wav).get
    assert(s.length == 500)
    assert(s.toSeq == (0 until 500).map(i => ((42L * 31 + i * 7) % 201 - 100).toInt))
  }

  test("constant 16-bit signal has RMS exactly its amplitude") {
    val wav = AudioCodec.synthWav(seed = 0, sampleRate = 8000, nFrames = 64)
    (0 until 64).foreach { i =>
      wav(44 + 2 * i) = (3000 & 0xff).toByte
      wav(44 + 2 * i + 1) = ((3000 >> 8) & 0xff).toByte
    }
    val s = AudioCodec.decodeSamples(wav).get
    assert(s.forall(_ == 3000))
    assert(AudioCodec.rms(s) == 3000.0)
    // windowed profile of a constant signal: every window at amp/32768
    val prof = AudioCodec.rmsProfile(s, 8)
    assert(prof.forall(p => math.abs(p - 3000.0 / 32768.0) < 1e-6))
  }

  test("8-bit PCM decodes with the unsigned 128 bias") {
    val n = 16
    val b = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + n).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(8000).putShort(1).putShort(8)
    b.put("data".getBytes).putInt(n)
    (0 until n).foreach(i => b.put((128 + i - 8).toByte))
    val wav = b.array()
    assert(AudioCodec.parseHeader(wav).contains(AudioCodec.WavMeta(8000, 1, 8, n.toLong)))
    assert(AudioCodec.decodeSamples(wav).get.toSeq == (0 until n).map(_ - 8))
  }

  test("non-RIFF, truncated, and non-PCM payloads are rejected") {
    assert(AudioCodec.parseHeader("definitely not audio bytes....".getBytes).isEmpty)
    val wav = AudioCodec.synthWav(1, 8000, 100)
    assert(AudioCodec.parseHeader(wav.take(60)).isEmpty) // truncated data chunk
    val nonPcm = wav.clone()
    nonPcm(20) = 3 // audioFormat = IEEE float
    assert(AudioCodec.parseHeader(nonPcm).isEmpty)
  }

  test("malformed chunk sizes terminate with None instead of hanging or throwing") {
    // RIFF/WAVE with a junk chunk whose size field is 0xFFFFFFF8: toInt = -8
    // once made the chunk walk advance by zero (infinite loop in an executor
    // task); large positive sizes indexed out of bounds
    val b = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(56).put("WAVE".getBytes)
    b.put("junk".getBytes).putInt(0xFFFFFFF8)
    assert(AudioCodec.parseHeader(b.array()).isEmpty)
    val b2 = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b2.put("RIFF".getBytes).putInt(56).put("WAVE".getBytes)
    b2.put("junk".getBytes).putInt(0x7FFFFFF0)
    assert(AudioCodec.parseHeader(b2.array()).isEmpty)
  }

  test("Multimodal routes WAV payloads through the real audio decode") {
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val enc: Encoder[Multimodal.MediaRecord] =
      Encoders.product[Multimodal.MediaRecord]
    val wav = AudioCodec.synthWav(seed = 7, sampleRate = 12000, nFrames = 300)
    val media = spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, "audio/wav", wav, 0, 0)))(enc)
    val feat = Multimodal.extractFeatures(media, dim = 8).collect().head
    val expect = AudioCodec.rmsProfile(AudioCodec.decodeSamples(wav).get, 8)
    assert(feat.feature.toSeq == expect.toSeq,
      "audio payload must take the AudioCodec path, not FakeDecoder")
  }
}
