package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed per-partition in batches.
  *
  * The Spark-side shape is real — schema, typed Dataset encoders, partition
  * iteration, deterministic output — and ONE real format decodes for real:
  * [[decodeBmp]] is a pure-JVM BITMAPINFOHEADER BMP header parser (this
  * environment ships no image/audio codecs, so compressed formats stay
  * stubbed). Payloads that aren't parseable BMPs fall back to
  * [[stubDecode]], which derives fake "decoded" dimensions from the byte
  * length alone. Swapping in a full codec (JNI or an `mapInPandas`-style
  * Python worker on a real cluster) changes only the decode function
  * bodies, nothing in the plan.
  *
  * At 100 TB: binary payloads dominate row size, so (a) never shuffle the
  * payload — extract features first, carry only metadata downstream; (b) read
  * with a small `files.maxPartitionBytes` so a partition of blobs fits in
  * executor memory.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Long, height: Long)

  /** Real single-format decode: BMP with a BITMAPINFOHEADER-or-later DIB
    * header. Little-endian fields at the documented offsets — magic "BM" at
    * 0, file size (u32) at 2, DIB header size (u32) at 14 (≥ 40 admits
    * BITMAPV4/V5, whose width/height live at the same offsets), width
    * (i32) at 18, height (i32) at 22. A negative height is the spec's
    * top-down row order — its magnitude is the pixel height. Strictness
    * over leniency: the stored file size must equal the actual payload
    * length, so arbitrary text bytes that happen to start with "BM" can
    * never parse as an accidental image (their bytes 2–5 would have to
    * encode their own exact length). Returns None for anything that isn't
    * a parseable BMP — callers fall back to [[stubDecode]].
    */
  def decodeBmp(p: Array[Byte]): Option[(Long, Long)] = {
    def u8(i: Int): Int = p(i) & 0xff
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (p.length >= 54 && p(0) == 'B'.toByte && p(1) == 'M'.toByte &&
        le32(2) == p.length && le32(14) >= 40) {
      val w = le32(18)
      val h = le32(22)
      if (w > 0 && h != 0) Some((w.toLong, math.abs(h.toLong))) else None
    } else None
  }

  /** A minimal valid BMP container (54-byte BITMAPINFOHEADER, 24-bpp,
    * uncompressed) around raw bytes, assembled from pure Spark expressions
    * (hex strings → `unhex`): the way gates plant REAL parseable media
    * inside a corpus that has no binary columns. The `data` bytes stand in
    * for the pixel array; [[decodeBmp]] only reads the header, exactly
    * like a metadata-extraction pass over real images would.
    */
  def bmpWrap(width: org.apache.spark.sql.Column, height: org.apache.spark.sql.Column,
      data: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.Column
    def hex2(v: Column): Column = lpad(hex(v.bitwiseAND(lit(255L))), 2, "0")
    def le32(v: Column): Column =
      concat(hex2(v), hex2(shiftright(v, 8)), hex2(shiftright(v, 16)), hex2(shiftright(v, 24)))
    def le16(v: Column): Column = concat(hex2(v), hex2(shiftright(v, 8)))
    val dataLen = length(data).cast("long")
    concat(unhex(concat(
      lit("424D"),                 // "BM"
      le32(dataLen + lit(54L)),    // file size = header + data
      lit("00000000"),             // reserved
      le32(lit(54L)),              // pixel-array offset
      le32(lit(40L)),              // DIB header size (BITMAPINFOHEADER)
      le32(width.cast("long")), le32(height.cast("long")),
      le16(lit(1L)), le16(lit(24L)), // planes, bits-per-pixel
      le32(lit(0L)),               // BI_RGB (uncompressed)
      le32(dataLen),               // image size
      le32(lit(0L)), le32(lit(0L)), // x/y pixels-per-metre
      le32(lit(0L)), le32(lit(0L)) // palette / important colors
    )), data)
  }

  /** ??? in spirit: a deterministic fake decode so tests and the oracle can
    * pin the plumbing for formats with no in-sandbox codec. width/height
    * are pure functions of the payload length.
    */
  def stubDecode(payload: Array[Byte]): (Long, Long) = {
    val n = payload.length.toLong
    (n % 64, n / 64)
  }

  /** Attach a binary payload column (UTF-8 bytes of `textCol` — the corpus has
    * no real media, the bytes stand in for an image blob).
    */
  def withPayload(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.select(col(idCol), encode(col(textCol), "UTF-8").as("payload"))

  /** Per-partition batched decode → typed feature rows. mapPartitions, not a
    * per-row UDF: a real decoder amortizes codec init per batch exactly here.
    * BMP payloads parse for real ([[decodeBmp]]); everything else takes the
    * documented [[stubDecode]] fallback.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val (w, h) = decodeBmp(r.payload).getOrElse(stubDecode(r.payload))
        MediaFeatures(r.doc_id, r.payload.length.toLong, w, h)
      }
    }
  }

  /** "Resize" each payload to a fixed target byte budget (`targetW·targetH`) —
    * stub for decode→scale→re-encode. Deterministic: truncate or zero-pad.
    * Same per-partition batch shape a real resampler needs; output rows carry
    * the new payload plus before/after sizes so downstream can audit.
    */
  final case class ResizedMedia(doc_id: Long, payload: Array[Byte], orig_bytes: Long, new_bytes: Long)
  def resize(spark: SparkSession, media: DataFrame, targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    require(targetW >= 1 && targetH >= 1,
      s"target dimensions must be >= 1, got ${targetW}x$targetH")
    require(targetW.toLong * targetH <= Int.MaxValue,
      s"target byte size ${targetW.toLong * targetH} overflows a JVM array")
    val target = targetW * targetH
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val out = java.util.Arrays.copyOf(r.payload, target) // truncates or zero-pads
        ResizedMedia(r.doc_id, out, r.payload.length.toLong, target.toLong)
      }
    }
  }

  /** Frame sampling: treat the payload as a sequence of fixed-size frames and
    * emit every `everyN`-th frame as its own row — the generator-shaped media
    * op (one blob → many frames). A real video pipeline swaps the splitter
    * for a demuxer; the flatMap shape, frame indexing, and downstream schema
    * stay identical. Frames never re-join the blob: only (doc_id, frame_idx,
    * frame bytes) flow on, keeping shuffle payloads frame-sized.
    */
  final case class Frame(doc_id: Long, frame_idx: Long, frame: Array[Byte])
  def sampleFrames(
      spark: SparkSession,
      media: DataFrame,
      frameBytes: Int,
      everyN: Int): Dataset[Frame] = {
    require(frameBytes >= 1, s"frameBytes must be >= 1, got $frameBytes")
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      val total = r.payload.length / frameBytes
      (0L until total.toLong).iterator
        .filter(_ % everyN == 0)
        .map { i =>
          val from = (i * frameBytes).toInt
          Frame(r.doc_id, i, java.util.Arrays.copyOfRange(r.payload, from, from + frameBytes))
        }
    }
  }
}
