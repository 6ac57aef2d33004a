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

  test("MP4 encode→parse recovers brand, duration and track layout") {
    val df = Seq((1L, 1000, 2500L, 1), (2L, 600, 1234L, 2))
      .toDF("id", "ts", "dur", "nt")
    val out = df.select($"id", Multimodal.parseMp4Meta(
        Multimodal.encodeMp4($"ts", $"dur", $"nt")).as("m"))
      .select($"id", $"m.brand", $"m.timescale", $"m.duration_ticks",
        $"m.duration_s", $"m.n_tracks",
        concat_ws(",", $"m.handlers").as("h"),
        concat_ws(",", $"m.codecs").as("c"))
      .orderBy("id").collect()
    out(0).getString(1) shouldBe "isom"
    out(0).getInt(2) shouldBe 1000
    out(0).getLong(3) shouldBe 2500L
    out(0).getDouble(4) shouldBe 2.5 +- 1e-12
    out(0).getInt(5) shouldBe 1
    out(0).getString(6) shouldBe "vide"
    out(0).getString(7) shouldBe "avc1"
    out(1).getDouble(4) shouldBe (1234.0 / 600.0) +- 1e-12
    out(1).getInt(5) shouldBe 2
    out(1).getString(6) shouldBe "vide,soun"
    out(1).getString(7) shouldBe "avc1,mp4a"
  }

  test("MP4 parser: null/corrupt/truncated bytes yield null, " +
      "64-bit box sizes are honored") {
    import Multimodal._
    val good = Seq((1L, 1000, 1000L, 1)).toDF("id", "ts", "dur", "nt")
      .select(encodeMp4($"ts", $"dur", $"nt").as("b"))
      .as[Array[Byte]].head()
    // rewrite the ftyp box to a 64-bit largesize layout:
    // size=1, type, largesize(8) then original payload
    val ftypLen = java.nio.ByteBuffer.wrap(good, 0, 4).getInt
    val bb = java.nio.ByteBuffer.allocate(good.length + 8)
    bb.putInt(1).put(good, 4, 4).putLong(ftypLen + 8L)
      .put(good, 8, good.length - 8)
    val with64 = bb.array()
    val df = Seq(
      (1L, Some(good)),
      (2L, Some(with64)),
      (3L, Some("garbage".getBytes("UTF-8"))),
      (4L, Some(good.take(10))), // truncated mid-box
      (5L, None: Option[Array[Byte]])).toDF("id", "bytes")
    val out = df.select($"id",
        Multimodal.parseMp4Meta($"bytes").as("m"))
      .orderBy("id").collect()
    out(0).isNullAt(1) shouldBe false
    out(1).isNullAt(1) shouldBe false
    out(1).getStruct(1).getString(0) shouldBe "isom" // brand survives
    out(2).isNullAt(1) shouldBe true
    out(3).isNullAt(1) shouldBe true
    out(4).isNullAt(1) shouldBe true
  }

  test("imageAHash: pixel-content pure (PNG == BMP of same pixels), " +
      "dims-duplicates hash-equal, inverted pattern differs") {
    def img(w: Int, h: Int, invert: Boolean): java.awt.image.BufferedImage = {
      val im = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 31 + y * 17) & 0xffffff
        im.setRGB(x, y, if (invert) v ^ 0xffffff else v)
      }
      im
    }
    def enc(im: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, fmt, b); b.toByteArray
    }
    val rows = Seq(
      (1L, enc(img(40, 30, false), "png")),
      (2L, enc(img(40, 30, false), "bmp")), // same pixels, other codec
      (3L, enc(img(40, 30, true), "png")),  // inverted
      (4L, enc(img(40, 30, false), "png"))  // exact dup of 1
    ).toDF("id", "bytes")
    val h = rows.select($"id",
        graft.llm.Multimodal.imageAHash($"bytes").as("ah"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    h(1L) shouldBe h(2L) // codec-invariant
    h(1L) shouldBe h(4L) // content-duplicate
    // inversion flips the luma ordering -> hash is (close to) the
    // complement; definitely far in hamming
    java.lang.Long.bitCount(h(1L) ^ h(3L)) should be > 40
  }

  test("encodePngBlocks + imageAHash equals the closed-form integer " +
      "bit test the q508 oracle replays") {
    // block-constant images: every aHash block is one color, so the
    // hash must equal 64·luma_blk > Σ luma with two's-complement
    // assembly — the full encode→decode→hash path against an
    // independent arithmetic implementation
    def expected(id: Long): Long = {
      val luma = (0 until 64).map { blk =>
        299L * ((id * 13 + blk * 7) % 256) +
          587L * ((id * 29 + blk * 11) % 256) +
          114L * ((id * 5 + blk * 3) % 256)
      }
      val tot = luma.sum
      (0 until 64).foldLeft(0L) { (h, j) =>
        if (luma(j) * 64 > tot) h | (1L << (63 - j)) else h
      }
    }
    val ids = Seq(0L, 1L, 2L, 7L, 63L, 199L)
    val got = ids.toDF("id")
      .withColumn("side",
        (lit(32) + pmod($"id", lit(3)) * 8).cast("int"))
      .withColumn("png",
        Multimodal.encodePngBlocks($"id", $"side"))
      .select($"id", Multimodal.imageAHash($"png").as("ah"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id => got(id) shouldBe expected(id) }
  }

  test("fingerprintAgainst + imageNearDupAgainst: exact dups flagged " +
      "known, every pair within maxHamming recovered (pigeonhole), " +
      "nothing past maxHamming emitted") {
    val corpus = Seq((1L, 0x1234567890abcdefL), (2L, 0x0f0f0f0f0f0f0f0fL))
      .toDF("id", "ah")
    //  10 = exact dup of 1; 11 = 3-bit flip of 1 (must be found);
    //  12 = 2-bit flip of 2; 13 = far from both (8 flips spread one
    //  per band — every band differs, correctly NOT emitted at
    //  hamming 7 by the banding even though pigeonhole only promises
    //  recall UP TO 7)
    val spread8 = (0 until 8).map(b => 1L << (b * 8 + 3))
      .reduce(_ | _)
    val newB = Seq(
      (10L, 0x1234567890abcdefL),
      (11L, 0x1234567890abcdefL ^ 0x7L),
      (12L, 0x0f0f0f0f0f0f0f0fL ^ 0x0300L),
      (13L, 0x1234567890abcdefL ^ spread8)
    ).toDF("id", "ah")
    val known = graft.llm.Dedup.fingerprintAgainst(newB, corpus,
      "id", "ah").collect().map(r => r.getLong(0) -> r.getBoolean(2))
      .toMap
    known shouldBe Map(10L -> true, 11L -> false, 12L -> false,
      13L -> false)
    val pairs = Multimodal.imageNearDupAgainst(newB, corpus,
        "id", "ah")
      .select("new_id", "corpus_id", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    pairs.toSeq shouldBe Seq((10L, 1L, 0), (11L, 1L, 3),
      (12L, 2L, 2))
  }

  test("audioEnergyHash: pure function of PCM content, null under 64 frames, dup recovery via banding") {
    import org.apache.spark.sql.functions.lit
    val wavs = Seq(1L -> 320, 2L -> 320, 3L -> 512, 4L -> 40)
      .toDF("id", "frames")
      .select($"id", $"frames",
        Multimodal.encodeWav(lit(8000), $"frames").as("wav"))
      .withColumn("ah", Multimodal.audioEnergyHash($"wav"))
    val h = wavs.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    h(1L) shouldBe defined
    h(1L) shouldBe h(2L) // same frame count -> identical PCM -> same hash
    h(4L) shouldBe None  // < 64 frames
    // banding over audio hashes recovers the planted duplicate pair
    val pairs = Multimodal.imageNearDupPairs(
      wavs.filter($"ah".isNotNull).select($"id", $"ah"), "id", "ah",
      maxHamming = 0)
      .select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs should contain((1L, 2L))
  }

  test("imageNearDupPairs: pigeonhole banding finds all pairs within maxHamming and no false keeps") {
    val base = 0x0123456789abcdefL
    val near3 = base ^ ((1L << 3) | (1L << 21) | (1L << 60)) // 3 flips
    val near7 = base ^ 0x7fL                                 // 7 flips in one band
    val far = base ^ 0x00ff00ff00ff00ffL                     // 32 flips
    val df = Seq((1L, base), (2L, near3), (3L, near7), (4L, far))
      .toDF("id", "ah")
    val pairs = graft.llm.Multimodal
      .imageNearDupPairs(df, "id", "ah", maxHamming = 7)
      .select("l_id", "r_id", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    pairs.keySet should contain((1L, 2L))
    pairs.keySet should contain((1L, 3L))
    pairs((1L, 2L)) shouldBe 3
    pairs((1L, 3L)) shouldBe 7
    // no pair involving the far hash survives the hamming filter
    pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L) shouldBe false
  }
}
