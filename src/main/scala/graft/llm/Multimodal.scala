package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata structs.
  *
  * The IMAGE and WAV paths are REAL codecs — the JDK ships them
  * (javax.imageio: PNG/JPEG/BMP/GIF; javax.sound.sampled: WAV/PCM),
  * so decode, resize and header inspection below run genuine byte
  * parsing with zero external dependencies. VIDEO stays a
  * deterministic stub (no container-format codec in the JDK) with
  * the real plumbing contract — schema, null-safety, partitioning —
  * so only the stub body changes on a cluster with ffmpeg.
  *
  * Scale shape: codecs run as per-row UDFs inside the scan stage —
  * map-side only, no shuffle; pair with `partitionForPayload` so a
  * partition of payloads fits executor memory.
  */
object Multimodal {

  /** Decoded image header: codec name + dimensions. */
  case class ImageMeta(format: String, width: Int, height: Int)

  /** Decoded WAV header: PCM parameters + duration. */
  case class WavMeta(sample_rate: Int, channels: Int, bits: Int,
      frames: Long, duration_s: Double)

  /** Canonical media schema: raw bytes + source metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("source_url", StringType, nullable = true))),
      nullable = true)))

  /** Build a media table from any table with an id + payload-ish
    * column (here we derive deterministic fake bytes from text —
    * STUB standing in for real downloaded media). */
  def syntheticMedia(df: DataFrame, idCol: String,
      seedCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      (when(pmod(col(idCol), lit(3)) === 0, "image")
        .when(pmod(col(idCol), lit(3)) === 1, "audio")
        .otherwise("video")).as("kind"),
      // STUB: deterministic fake payload (sha2 of the seed as bytes)
      to_binary(sha2(col(seedCol).cast("string"), 256), lit("hex"))
        .as("bytes"),
      struct(lit("application/octet-stream").as("mime"),
        concat(lit("synthetic://"), col(idCol)).as("source_url"))
        .as("meta"))

  /** REAL image header decode via javax.imageio: identifies the
    * codec and reads dimensions from the header WITHOUT decoding
    * pixels (ImageReader.getWidth/getHeight are metadata reads).
    * Returns null for null/unparseable bytes. */
  def decodeImage(bytes: Column): Column = {
    val f = udf((b: Array[Byte]) => {
      if (b == null) None
      else {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(b))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try {
              r.setInput(iis)
              Some(ImageMeta(r.getFormatName.toLowerCase,
                r.getWidth(0), r.getHeight(0)))
            } finally r.dispose()
          }
        } catch { case _: Exception => None } finally iis.close()
      }
    })
    f(bytes)
  }

  /** REAL image resize: decode, scale into a `maxSide` bounding box
    * preserving aspect ratio (never upscale), re-encode as PNG.
    * Null in / undecodable in → null out. Per-row map work — no
    * shuffle; runs headless (BufferedImage needs no display). */
  def resizeImage(bytes: Column, maxSide: Int): Column = {
    val f = udf((b: Array[Byte]) => {
      if (b == null) None
      else try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(b))
        if (img == null) None
        else {
          val w = img.getWidth; val h = img.getHeight
          val scale = math.min(maxSide.toDouble / math.max(w, h), 1.0)
          val nw = math.max(1, math.round(w * scale).toInt)
          val nh = math.max(1, math.round(h * scale).toInt)
          val out = new java.awt.image.BufferedImage(nw, nh,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try g.drawImage(img, 0, 0, nw, nh, null) finally g.dispose()
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", baos)
          Some(baos.toByteArray)
        }
      } catch { case _: Exception => None }
    })
    f(bytes)
  }

  /** REAL WAV header decode via javax.sound.sampled: PCM format
    * parameters and exact duration. Null/unparseable → null. */
  def decodeWav(bytes: Column): Column = {
    val f = udf((b: Array[Byte]) => {
      if (b == null) None
      else try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(b))
        try {
          val fmt = ais.getFormat
          val frames = ais.getFrameLength
          Some(WavMeta(fmt.getSampleRate.toInt, fmt.getChannels,
            fmt.getSampleSizeInBits, frames,
            frames.toDouble / fmt.getSampleRate))
        } finally ais.close()
      } catch { case _: Exception => None }
    })
    f(bytes)
  }

  /** Deterministic PNG payload generator (REAL encoder): a w×h RGB
    * image whose pixels are a fixed function of position — used to
    * materialize genuine media bytes from tabular test data. */
  def encodePng(width: Column, height: Column): Column = {
    val f = udf((w: Int, h: Int) => {
      val img = new java.awt.image.BufferedImage(math.max(1, w),
        math.max(1, h), java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          img.setRGB(x, y, ((x * 31 + y * 17) & 0xffffff))
          x += 1
        }
        y += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    })
    f(width, height)
  }

  /** Deterministic WAV payload generator (REAL encoder): mono 16-bit
    * PCM of `frames` samples of a position-derived waveform. */
  def encodeWav(sampleRate: Column, frames: Column): Column = {
    val f = udf((rate: Int, n0: Int) => {
      val n = math.max(0, n0)
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1,
        true, false)
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val v = ((i * 2731) % 65536 - 32768).toShort
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    })
    f(sampleRate, frames)
  }

  /** Image metadata stub kept for the synthetic (non-decodable)
    * payload path: width/height/format derived deterministically from
    * the byte content. Use `decodeImage` for real image bytes. */
  def decodeImageStub(bytes: Column): Column = {
    val h = xxhash64(bytes)
    when(bytes.isNotNull, struct(
      (pmod(h, lit(1920L)) + 1).cast("int").as("width"),
      (pmod(h, lit(1080L)) + 1).cast("int").as("height"),
      when(pmod(h, lit(2)) === 0, "png").otherwise("jpeg").as("format")))
  }

  /** Resize plan: target box preserving aspect ratio (pure metadata
    * math — real at any scale; the pixel work happens in the codec
    * stub's place). */
  def resizePlan(meta: Column, maxSide: Int): Column = {
    val w = meta.getField("width").cast("double")
    val h = meta.getField("height").cast("double")
    val scale = least(lit(maxSide) / greatest(w, h), lit(1.0))
    struct(round(w * scale).cast("int").as("width"),
      round(h * scale).cast("int").as("height"))
  }

  /** Frame-sampling plan for video: every `stride`-th frame index up
    * to `maxFrames`. STUB: frame count derived from byte hash. */
  def frameSamplePlan(bytes: Column, stride: Int,
      maxFrames: Int): Column = {
    val nFrames = (pmod(xxhash64(bytes), lit(3000L)) + 1).cast("int")
    slice(sequence(lit(0), nFrames - 1, lit(stride)), 1, maxFrames)
  }

  /** Feature extraction: fixed-size float vector per media row.
    * STUB: hash-derived pseudo-embedding (replaced by a model UDF on
    * a GPU cluster); shape/partitioning contract is real. */
  def featureVectorStub(bytes: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      (pmod(xxhash64(bytes, i), lit(2000L)).cast("double") / 1000.0 - 1.0)
        .cast("float"))

  /** Repartition guidance for large binary columns: target ~128 MB
    * per partition given an average payload size. Pass `rowCount`
    * when known (e.g. from catalog stats or an earlier action) —
    * otherwise this runs one counting scan of the table. */
  def partitionForPayload(df: DataFrame, avgBytesPerRow: Long,
      targetPartitionBytes: Long = 128L << 20,
      rowCount: Option[Long] = None): DataFrame = {
    val rowsPerPartition =
      math.max(1L, targetPartitionBytes / math.max(1L, avgBytesPerRow))
    val rows = rowCount.getOrElse(df.count())
    val n = math.max(1, (rows / rowsPerPartition).toInt + 1)
    df.repartition(n)
  }
}
