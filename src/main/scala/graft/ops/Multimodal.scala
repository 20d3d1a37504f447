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

  /** REAL header parser for the common container formats — pure JVM, no
    * codec libraries: PNG IHDR (big-endian dims), JPEG SOF segment walk,
    * GIF logical-screen descriptor (little-endian dims), WAV RIFF chunk
    * walk (fmt + data → duration). Pixel/sample DECODE stays behind
    * [[StubDecoder]] (codecs aren't in this container); metadata
    * extraction is not codec work, so it is done for real here.
    * Unknown/truncated inputs return ok = false rather than throwing —
    * at corpus scale malformed media is data, not an error. */
  final class HeaderDecoder extends MediaDecoder {
    private def beU32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    private def leU32(b: Array[Byte], i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    private def beU16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    private def leU16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

    def decode(bytes: Array[Byte]): MediaMeta = {
      if (bytes == null || bytes.isEmpty) return MediaMeta(0, null, 0, 0, 0, ok = false)
      val n = bytes.length.toLong
      try {
        if (bytes.length >= 24 && bytes(0) == 0x89.toByte && bytes(1) == 'P' &&
            bytes(2) == 'N' && bytes(3) == 'G') {
          // signature(8) + IHDR length(4) + "IHDR"(4) → width@16, height@20
          MediaMeta(n, "png", beU32(bytes, 16).toInt, beU32(bytes, 20).toInt, 0, ok = true)
        } else if (bytes.length >= 4 && bytes(0) == 0xff.toByte && bytes(1) == 0xd8.toByte) {
          // JPEG: walk FF-marker segments to the first SOFn (C0-CF minus
          // C4/C8/CC); height@+5, width@+7 inside the segment
          var i = 2
          while (i + 9 <= bytes.length) {
            if (bytes(i) != 0xff.toByte) return MediaMeta(n, "jpeg", 0, 0, 0, ok = false)
            val marker = bytes(i + 1) & 0xff
            if (marker >= 0xc0 && marker <= 0xcf &&
                marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
              return MediaMeta(n, "jpeg", beU16(bytes, i + 7), beU16(bytes, i + 5), 0, ok = true)
            }
            i += 2 + beU16(bytes, i + 2) // skip marker(2) + segment length
          }
          MediaMeta(n, "jpeg", 0, 0, 0, ok = false)
        } else if (bytes.length >= 10 && bytes(0) == 'G' && bytes(1) == 'I' &&
            bytes(2) == 'F' && bytes(3) == '8') {
          MediaMeta(n, "gif", leU16(bytes, 6), leU16(bytes, 8), 0, ok = true)
        } else if (bytes.length >= 44 && bytes(0) == 'R' && bytes(1) == 'I' &&
            bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' &&
            bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') {
          // RIFF chunk walk: find fmt (byteRate@+8) and data (size)
          var i = 12; var byteRate = 0L; var dataLen = -1L
          while (i + 8 <= bytes.length && (byteRate == 0L || dataLen < 0L)) {
            val id = new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
            val sz = leU32(bytes, i + 4)
            if (id == "fmt " && i + 16 + 4 <= bytes.length) byteRate = leU32(bytes, i + 16)
            if (id == "data") dataLen = sz
            i += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
          }
          if (byteRate > 0 && dataLen >= 0)
            MediaMeta(n, "wav", 0, 0, dataLen * 1000L / byteRate, ok = true)
          else MediaMeta(n, "wav", 0, 0, 0, ok = false)
        } else MediaMeta(n, "bin", 0, 0, 0, ok = false)
      } catch {
        case _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException =>
          MediaMeta(n, null, 0, 0, 0, ok = false)
      }
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
