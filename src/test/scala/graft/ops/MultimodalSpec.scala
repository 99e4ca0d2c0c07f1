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

  test("stubbed decode: deterministic dims via mapPartitions batch path") {
    val df = Seq((1L, jpegMagic), (2L, pngMagic)).toDF("id", "media")
    val out1 = Multimodal.decodeDimensions(df, "id", "media")
      .as[(Long, Int, Int, Int)].collect().sortBy(_._1).toSeq
    val out2 = Multimodal.decodeDimensions(df.repartition(4), "id", "media")
      .as[(Long, Int, Int, Int)].collect().sortBy(_._1).toSeq
    assert(out1 == out2) // partitioning-independent
    assert(out1.forall { case (_, w, h, c) => w >= 256 && h >= 256 && c == 3 })
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
