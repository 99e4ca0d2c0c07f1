package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star EXT): image/audio/video as opaque
  * `BinaryType` columns with typed metadata structs.
  *
  * The Spark-side mechanics are real — schema, partition-sized batch
  * processing, metadata extraction, frame sampling contract. The actual
  * media decode is STUBBED (this container ships no image/audio codecs):
  * [[fakeDecode]] derives deterministic "dimensions" from the bytes, and is
  * the single seam where a real decoder (javacv / a Python worker via
  * mapInArrow on a PySpark driver) would plug in.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType),
    StructField("sha256", StringType),
    StructField("format", StringType)))

  /** Attach a metadata struct to a binary media column — pure expressions,
    * runs at scan speed. Format sniffing from magic bytes. */
  def withMediaMeta(df: DataFrame, binCol: String, outCol: String = "media_meta"): DataFrame = {
    val b = col(binCol)
    val magic = hex(expr(s"substring($binCol, 1, 4)"))
    val format = when(magic.startsWith("FFD8"), "jpeg")
      .when(magic.startsWith("89504E47"), "png")
      .when(magic.startsWith("52494646"), "riff")
      .otherwise("unknown")
    df.withColumn(outCol, struct(
      length(b).cast("long").as("byte_len"),
      lower(sha2(b, 256)).as("sha256"),
      format.as("format")))
  }

  /** STUB decode: deterministic pseudo-dimensions from content bytes.
    * Replace the body with a real codec call; the signature — bytes in,
    * (width, height, channels) out — is the production contract. */
  def fakeDecode(bytes: Array[Byte]): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(bytes)
    (256 + math.abs(h % 1024), 256 + math.abs((h / 1024) % 1024), 3)
  }

  /** Partition-batched "decode": the iterator-in/iterator-out shape of
    * mapPartitions is exactly how a real vectorized decoder (or an Arrow
    * batch handed to a Python/native worker) consumes media at scale —
    * per-partition setup cost amortized across rows, no per-row codec
    * initialization. */
  def decodeDimensions(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here
        it.map { case (id, bytes) =>
          val (w, h, c) = fakeDecode(bytes)
          (id, w, h, c)
        }
      }
      .toDF(idCol, "width", "height", "channels")
  }

  /** Frame-sampling contract for video-ish payloads: split a byte payload
    * into `frameBytes`-sized pseudo-frames and keep every `stride`-th —
    * the real implementation swaps the splitter for a container demuxer.
    * Emits (id, frame_index, frame_bytes). */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int = 1024, stride: Int = 10): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        bytes.grouped(frameBytes).zipWithIndex.collect {
          case (frame, i) if i % stride == 0 => (id, i, frame)
        }
      }
      .toDF(idCol, "frame_index", "frame_bytes")
  }
}
