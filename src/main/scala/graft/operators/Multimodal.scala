package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media travel as opaque `binary` columns with a
  * typed metadata struct; decode / feature-extraction run per-partition so a
  * real decoder (JNI image lib, ffmpeg pipe, …) would be initialized once per
  * partition, not per row.
  *
  * The byte-level "decoders" here are STUBS — deterministic fakes standing in
  * for image/audio codecs that are not present in this container. The Spark
  * plumbing (schema, partitioning, batch shape, per-partition lifecycle) is
  * the real, tested deliverable; swap `StubCodec` for a real codec at the
  * marked points.
  */
object Multimodal {

  /** Typed metadata carried alongside the raw bytes. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType),       // image | audio | video
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Wrap a text column as a fake media payload: (content binary, meta).
    * Stands in for reading real blobs (e.g. `spark.read.format("binaryFile")`). */
  def attachBinary(df: DataFrame, textCol: String, kind: String): DataFrame =
    df.withColumn("content", encode(col(textCol), "UTF-8"))
      .withColumn("meta", struct(
        lit(kind).as("kind"),
        lit("application/octet-stream").as("mime"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms")))

  /** STUB codec: deterministic fakes for decode/resize/frame-sample. A real
    * implementation would wrap an image/audio library here — same signatures,
    * same per-partition initialization point. */
  object StubCodec {
    /** "Decode" → (width, height) derived from content bytes. */
    def decodeDims(bytes: Array[Byte]): (Int, Int) = {
      val h = bytes.foldLeft(17L)((a, b) => (a * 31 + (b & 0xff)) % 1000003L)
      (((h % 1920) + 1).toInt, ((h / 1920 % 1080) + 1).toInt)
    }
    /** "Resize": keep every stride-th byte — placeholder for pixel resample. */
    def resize(bytes: Array[Byte], stride: Int): Array[Byte] =
      bytes.grouped(stride).map(_.head).toArray
    /** "Frame-sample" a video payload into n fixed-size windows. */
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      if (bytes.isEmpty) return Seq.empty
      val frame = math.max(1, bytes.length / n)
      (0 until math.min(n, bytes.length)).map { i =>
        bytes.slice(i * frame, math.min(bytes.length, i * frame + frame))
      }
    }
    /** Fixed-dim float features from bytes (stands in for a vision tower):
      * integer byte sums per lane, normalized by one float32 division at the
      * end — exact lane sums make the output engine-portable (a DuckDB
      * oracle reproduces it bit-for-bit; float32 division is correctly
      * rounded IEEE in both engines). */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val sums = new Array[Long](dim)
      var i = 0
      while (i < bytes.length) {
        sums(i % dim) += (bytes(i) & 0xff)
        i += 1
      }
      sums.map(s => s.toFloat / 255.0f)
    }
  }

  /** Decode metadata for every row — runs in `mapPartitions` so the codec is
    * set up once per partition (the shape a real decoder needs). Appends
    * decoded_width / decoded_height. */
  def decodeMeta(df: DataFrame, contentCol: String): DataFrame = {
    val schema = df.schema
      .add("decoded_width", IntegerType).add("decoded_height", IntegerType)
    val idx = df.schema.fieldIndex(contentCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      // real codec init would happen HERE, once per partition
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val (w, h) = StubCodec.decodeDims(if (bytes == null) Array.empty else bytes)
        Row.fromSeq(r.toSeq :+ w :+ h)
      }
    }(enc)
  }

  /** "Video" frame sampling per partition: content bytes → n fixed windows,
    * emitted as an array<binary> column (the real implementation would call
    * an ffmpeg-style demuxer HERE, once per partition). */
  def sampleFrames(df: DataFrame, contentCol: String, n: Int): DataFrame = {
    val schema = df.schema.add("frames", ArrayType(BinaryType))
    val idx = df.schema.fieldIndex(contentCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val fs = StubCodec.sampleFrames(if (bytes == null) Array.empty else bytes, n)
        Row.fromSeq(r.toSeq :+ fs)
      }
    }(enc)
  }

  /** Per-partition feature extraction → fixed-dim `array<float>` column. */
  def extractFeatures(df: DataFrame, contentCol: String, dim: Int): DataFrame = {
    val schema = df.schema.add("features", ArrayType(FloatType))
    val idx = df.schema.fieldIndex(contentCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val f = StubCodec.features(if (bytes == null) Array.empty else bytes, dim)
        Row.fromSeq(r.toSeq :+ f.toSeq)
      }
    }(enc)
  }
}
