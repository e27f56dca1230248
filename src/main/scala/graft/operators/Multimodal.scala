package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded in batched distributed passes.
  *
  * The decode step itself is a STUB (`StubDecoder`): real image/audio codecs
  * aren't available in this environment. Everything Spark-side — schema,
  * batch shape, partition-preserving mapPartitions, metadata struct — is
  * real and tested; swapping in a JNI/FFmpeg/ImageIO decoder is a one-class
  * change.
  */
object Multimodal {

  /** Metadata produced per media blob. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Pluggable decoder; implementations must be deterministic per blob. */
  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte]): (String, Int, Int) // (mime, width, height)
  }

  /** Deterministic stand-in for a real codec: derives fake dimensions from
    * blob length + first bytes. Replace with a real decoder in production. */
  object StubDecoder extends MediaDecoder {
    override def decode(bytes: Array[Byte]): (String, Int, Int) = {
      val n = bytes.length
      val first = if (n > 0) bytes(0) & 0xff else 0
      val mime = if (first % 2 == 0) "image/png" else "image/jpeg"
      (mime, 16 + (n % 640), 16 + ((n / 7) % 480))
    }
  }

  /** Adds a `media_meta` struct by decoding `binCol` in partition-local
    * batches. Iterator-to-iterator (no partition materialization) → constant
    * memory per task regardless of table size; ordering and partitioning of
    * the input are preserved (no shuffle). */
  def decodeMeta(df: DataFrame, binCol: String,
                 decoder: MediaDecoder = StubDecoder): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("media_meta", mediaMetaType, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val meta = if (bytes == null) null else {
          val (mime, w, h) = decoder.decode(bytes)
          Row(mime, w, h, bytes.length.toLong)
        }
        Row.fromSeq(row.toSeq :+ meta)
      }
    }(encoder)
  }

  /** Frame-sampling stub for video-like blobs: emits `n` deterministic
    * byte-slices per blob as child rows (id, frame_no, frame_bytes) —
    * the partitioning/explode shape of real frame extraction. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String, n: Int): DataFrame =
    df.select(col(idCol), col(binCol).as("blob"))
      .withColumn("frame_no", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_bytes",
        expr(s"substring(blob, frame_no * greatest(1, length(blob) div $n) + 1, greatest(1, length(blob) div $n))"))
      .drop("blob")
}
