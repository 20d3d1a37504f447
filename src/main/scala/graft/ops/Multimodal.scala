package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The decode step is STUBBED — the real codec libraries are not in this
  * container — behind [[MediaDecoder]]. The Spark-side contract (schema,
  * batch shape, partitioning, null behavior) is real and tested:
  * swapping in a JNI/FFI decoder changes nothing in the plan.
  */
object Multimodal {

  /** Typed metadata emitted by a decoder. */
  final case class MediaMeta(
      byteLen: Long, format: String, width: Int, height: Int,
      durationMs: Long, ok: Boolean)

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("byteLen", LongType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("durationMs", LongType, nullable = false),
    StructField("ok", BooleanType, nullable = false)))

  /** Decoder boundary. Implementations must be Serializable and cheap
    * to construct per-executor (heavy state goes in a lazy field). */
  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte]): MediaMeta
  }

  /** STUB decoder: deterministic fake decode — real header sniffing for
    * format, fabricated-but-deterministic dimensions from a content
    * hash. Replace with a real codec (???-marked) for production. */
  final class StubDecoder extends MediaDecoder {
    def decode(bytes: Array[Byte]): MediaMeta = {
      if (bytes == null || bytes.isEmpty) return MediaMeta(0, null, 0, 0, 0, ok = false)
      val fmt =
        if (bytes.length >= 8 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "png"
        else if (bytes.length >= 3 && bytes(0) == 0xff.toByte && bytes(1) == 0xd8.toByte) "jpeg"
        else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F') "wav"
        else "bin"
      // deterministic fake dimensions — a real impl parses the header:
      var h = 1469598103934665603L // FNV-1a 64
      var i = 0
      while (i < math.min(bytes.length, 64)) { h ^= bytes(i); h *= 1099511628211L; i += 1 }
      val w = 64 + math.floorMod(h, 1024).toInt
      val ht = 64 + math.floorMod(h >> 16, 1024).toInt
      MediaMeta(bytes.length.toLong, fmt, w, ht, math.floorMod(h >> 32, 60000L), ok = true)
    }
  }

  /** Attach decoded metadata to a binary column via `mapPartitions` —
    * one decoder instance per partition, rows streamed (never
    * materialize a partition of media bytes in memory). */
  def withMediaMeta(df: DataFrame, binCol: String = "content",
      decoder: MediaDecoder = new StubDecoder): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("media", mediaMetaSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val m = decoder.decode(r.getAs[Array[Byte]](binIdx))
        Row.fromSeq(r.toSeq :+ Row(m.byteLen, m.format, m.width, m.height, m.durationMs, m.ok))
      }
    }(enc)
  }

  /** Frame-sampling plan for video-shaped rows: explode a deterministic
    * frame index sequence (every `everyMs`) — decode of each frame stays
    * behind the same stub boundary. */
  def sampleFrames(df: DataFrame, durationCol: String, everyMs: Long): DataFrame =
    df.withColumn("frame_ms",
      explode(sequence(lit(0L), greatest(col(durationCol) - 1, lit(0L)), lit(everyMs))))
}
