package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata structs. The Spark side — schema,
  * partition sizing, batch shape, metadata propagation — is real and
  * tested; the actual codec calls are STUBBED with deterministic
  * fakes (this container has no image/audio libraries), clearly
  * marked below. On a real cluster the stub body is replaced by the
  * codec; nothing else changes.
  */
object Multimodal {

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

  /** "Decode" image metadata. STUB: width/height/format are derived
    * deterministically from the byte content instead of a real codec
    * (e.g. javax.imageio / ffmpeg on a real cluster). The plumbing —
    * null-safe binary input, struct output, codegen-able expression —
    * is the real contract. */
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
