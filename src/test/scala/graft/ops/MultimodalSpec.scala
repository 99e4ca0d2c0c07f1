package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val jpegMagic = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 1, 2, 3)
  private val pngMagic = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 9, 9)

  test("media metadata: byte length, sha256, magic-byte format sniffing") {
    val df = Seq((1L, jpegMagic), (2L, pngMagic), (3L, "plain".getBytes("UTF-8")))
      .toDF("id", "media")
    val out = Multimodal.withMediaMeta(df, "media")
      .select($"id", $"media_meta.byte_len", $"media_meta.format", $"media_meta.sha256")
      .as[(Long, Long, String, String)].collect().sortBy(_._1)
    assert(out(0)._2 == 7 && out(0)._3 == "jpeg")
    assert(out(1)._3 == "png")
    assert(out(2)._3 == "unknown")
    assert(out.forall(_._4.matches("[0-9a-f]{64}")))
  }

  test("stub fallback: undecodable bytes get deterministic dims via the " +
      "mapPartitions batch path, decoded=false, NULL pixel sum") {
    // truncated magic prefixes: format sniffers match but no ImageIO
    // reader can decode them — the fakeDecode fallback path
    val df = Seq((1L, jpegMagic), (2L, pngMagic)).toDF("id", "media")
    val out1 = Multimodal.decodeDimensions(df, "id", "media")
      .as[(Long, Int, Int, Int, Option[Long], Boolean)]
      .collect().sortBy(_._1).toSeq
    val out2 = Multimodal.decodeDimensions(df.repartition(4), "id", "media")
      .as[(Long, Int, Int, Int, Option[Long], Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(out1 == out2) // partitioning-independent
    assert(out1.forall { case (_, w, h, c, ps, dec) =>
      w >= 256 && h >= 256 && c == 3 && ps.isEmpty && !dec })
  }

  test("real ImageIO decode: checked-in PNG and JPEG fixtures report true " +
      "dims and channels; PNG pixel sum is exact (lossless round-trip)") {
    def fixture(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/$name")
      assert(in != null, s"missing test resource $name")
      try in.readAllBytes() finally in.close()
    }
    // 5x3 gradient written by the JDK encoder: rgb(x*40, y*80, 123)
    val expectedSum = (for (y <- 0 until 3; x <- 0 until 5)
      yield x * 40 + y * 80 + 123).sum.toLong
    val df = Seq(
      (1L, fixture("fixture_5x3.png")),
      (2L, fixture("fixture_5x3.jpg")),
      (3L, "not an image".getBytes("UTF-8")))
      .toDF("id", "media")
    val out = Multimodal.decodeDimensions(df, "id", "media")
      .as[(Long, Int, Int, Int, Option[Long], Boolean)]
      .collect().sortBy(_._1).toSeq
    val png = out(0); val jpg = out(1); val txt = out(2)
    assert(png._2 == 5 && png._3 == 3 && png._4 == 3 && png._6)
    assert(png._5.contains(expectedSum))
    // JPEG: dims exact, pixels lossy — sum present but not pinned
    assert(jpg._2 == 5 && jpg._3 == 3 && jpg._4 == 3 && jpg._6 && jpg._5.nonEmpty)
    assert(!txt._6 && txt._5.isEmpty)
  }

  test("solidPng round-trip: encode then decode is exact — dims, 3 " +
      "channels, pixel_sum = w*h*(r+g+b)") {
    val df = Seq(
      (10L, Multimodal.solidPng(7, 4, (200 << 16) | (100 << 8) | 50)),
      (11L, Multimodal.solidPng(1, 1, 0xFFFFFF)))
      .toDF("id", "media")
    val out = Multimodal.decodeDimensions(df, "id", "media")
      .as[(Long, Int, Int, Int, Option[Long], Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(out(0) == ((10L, 7, 4, 3, Some(7L * 4 * 350), true)))
    assert(out(1) == ((11L, 1, 1, 3, Some(765L), true)))
  }

  test("pcm16Wav round-trip: encode then audioDecode is exact — rate, " +
      "channels, frames, Σ|sample| — mono and stereo, both via the " +
      "batched decodeAudio path") {
    // hand-built signals with known sums: mono ramp, stereo constants
    val mono = Array[Short](0, 100, -200, 300, -400) // Σ|s| = 1000
    val stereo = Array[Short](10, -10, 20, -20, 30, -30) // 3 frames, Σ=120
    val df = Seq(
      (1L, Multimodal.pcm16Wav(8000, 1, mono)),
      (2L, Multimodal.pcm16Wav(16000, 2, stereo))).toDF("id", "media")
    val out = Multimodal.decodeAudio(df, "id", "media")
      .as[(Long, Int, Int, Long, Option[Long], Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 8000, 1, 5L, Some(1000L), true),
      (2L, 16000, 2, 3L, Some(120L), true)), s"got $out")
    // extreme samples survive the little-endian round trip
    val edge = Array[Short](Short.MinValue, Short.MaxValue)
    val e = Multimodal.audioDecode(Multimodal.pcm16Wav(44100, 1, edge)).get
    assert(e == ((44100, 1, 2L, 32768L + 32767L)), s"got $e")
  }

  test("audio stub fallback: non-WAV bytes get deterministic pseudo-stats, " +
      "decoded=false, NULL amplitude sum; layout-invariant") {
    val df = Seq((1L, "not audio at all".getBytes("UTF-8")),
      (2L, jpegMagic)).toDF("id", "media")
    val a = Multimodal.decodeAudio(df, "id", "media")
      .as[(Long, Int, Int, Long, Option[Long], Boolean)].collect().sortBy(_._1).toSeq
    val b = Multimodal.decodeAudio(df.repartition(3), "id", "media")
      .as[(Long, Int, Int, Long, Option[Long], Boolean)].collect().sortBy(_._1).toSeq
    assert(a == b)
    assert(a.forall { case (_, sr, ch, nf, amp, dec) =>
      sr >= 8000 && (ch == 1 || ch == 2) && nf >= 100 && amp.isEmpty && !dec })
  }

  test("frame sampling: every stride-th fixed-size frame with indices") {
    val payload = Array.tabulate[Byte](10240)(i => (i % 251).toByte)
    val df = Seq((7L, payload)).toDF("id", "media")
    val frames = Multimodal.sampleFrames(df, "id", "media", frameBytes = 1024, stride = 3)
      .as[(Long, Int, Array[Byte])].collect().sortBy(_._2)
    assert(frames.map(_._2).toSeq == Seq(0, 3, 6, 9))
    assert(frames.forall(_._3.length == 1024))
  }
}
