package graft

import org.apache.spark.sql.functions._
import graft.llm.Multimodal

/** The real JDK-codec media paths: PNG/WAV encode→decode round trips,
  * bounded resize, and null/corrupt-byte safety. */
class MultimodalCodecSpec extends SparkSpecBase {
  import spark.implicits._

  test("PNG encode→decode recovers format and dimensions") {
    val df = Seq((1L, 13, 7), (2L, 40, 25), (3L, 1, 1))
      .toDF("id", "w", "h")
    val out = df
      .withColumn("png", Multimodal.encodePng($"w", $"h"))
      .withColumn("img", Multimodal.decodeImage($"png"))
      .select($"id", $"img.format", $"img.width", $"img.height")
      .as[(Long, String, Int, Int)].collect().sortBy(_._1)
    out shouldBe Array((1L, "png", 13, 7), (2L, "png", 40, 25),
      (3L, "png", 1, 1))
  }

  test("WAV encode→decode recovers PCM parameters and duration") {
    val df = Seq((1L, 8000, 4000), (2L, 16000, 1600)).toDF(
      "id", "rate", "frames")
    val out = df
      .withColumn("wav", Multimodal.encodeWav($"rate", $"frames"))
      .withColumn("aud", Multimodal.decodeWav($"wav"))
      .select($"id", $"aud.sample_rate", $"aud.channels", $"aud.bits",
        $"aud.frames", $"aud.duration_s")
      .as[(Long, Int, Int, Int, Long, Double)].collect().sortBy(_._1)
    out(0) shouldBe ((1L, 8000, 1, 16, 4000L, 0.5))
    out(1) shouldBe ((2L, 16000, 1, 16, 1600L, 0.1))
  }

  test("resizeImage bounds the longest side, preserves ratio, never upscales") {
    val df = Seq((1L, 100, 50), (2L, 30, 60), (3L, 8, 4))
      .toDF("id", "w", "h")
    val out = df
      .withColumn("png", Multimodal.encodePng($"w", $"h"))
      .withColumn("small", Multimodal.resizeImage($"png", 20))
      .withColumn("img", Multimodal.decodeImage($"small"))
      .select($"id", $"img.width", $"img.height")
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    out(0) shouldBe ((1L, 20, 10)) // 100x50 -> 20x10
    out(1) shouldBe ((2L, 10, 20)) // 30x60 -> 10x20
    out(2) shouldBe ((3L, 8, 4))   // already inside the box: untouched
  }

  test("decoders return null for null or corrupt bytes") {
    val df = Seq(
      (1L, Some("not an image or wav".getBytes("UTF-8"))),
      (2L, None: Option[Array[Byte]])).toDF("id", "bytes")
    val out = df.select($"id",
      Multimodal.decodeImage($"bytes").as("img"),
      Multimodal.decodeWav($"bytes").as("aud"))
    out.filter($"img".isNotNull || $"aud".isNotNull).count() shouldBe 0
  }
}
