package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed per-partition in batches.
  *
  * The Spark-side shape is real — schema, typed Dataset encoders, partition
  * iteration, deterministic output — and TWO real formats decode for real:
  * [[decodeBmp]] (pure-JVM BITMAPINFOHEADER header parse) and [[decodePpm]]
  * (NetPBM P6 header + strict raster-length check). This environment ships
  * no image/audio codecs, so compressed formats stay stubbed: payloads that
  * parse as neither fall back to [[stubDecode]], which derives fake
  * "decoded" dimensions from the byte length alone, and the emitted `codec`
  * column makes the fallback observable. Swapping in a full codec (JNI or
  * an `mapInPandas`-style Python worker on a real cluster) changes only the
  * decode function bodies, nothing in the plan.
  *
  * At 100 TB: binary payloads dominate row size, so (a) never shuffle the
  * payload — extract features first, carry only metadata downstream; (b) read
  * with a small `files.maxPartitionBytes` so a partition of blobs fits in
  * executor memory.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, width: Long, height: Long, codec: String)

  /** Real single-format decode: BMP with a BITMAPINFOHEADER-or-later DIB
    * header. Little-endian fields at the documented offsets — magic "BM" at
    * 0, file size (u32) at 2, DIB header size (u32) at 14 (≥ 40 admits
    * BITMAPV4/V5, whose width/height live at the same offsets), width
    * (i32) at 18, height (i32) at 22, color planes (u16, must be 1 per
    * spec) at 26. A negative height is the spec's top-down row order — its
    * magnitude is the pixel height. Strictness over leniency: the stored
    * file size must equal the actual payload length OR be 0 (many real
    * writers leave the field zero, which the spec tolerates), so arbitrary
    * text bytes that happen to start with "BM" can never parse as an
    * accidental image — they'd have to encode their own exact length, or
    * carry four NUL bytes plus a valid planes field. Returns None for
    * anything that isn't a parseable BMP — callers fall back to
    * [[stubDecode]].
    */
  def decodeBmp(p: Array[Byte]): Option[(Long, Long)] = {
    def u8(i: Int): Int = p(i) & 0xff
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (p.length >= 54 && p(0) == 'B'.toByte && p(1) == 'M'.toByte &&
        (le32(2) == p.length || le32(2) == 0) && le32(14) >= 40 &&
        (u8(26) | (u8(27) << 8)) == 1) {
      val w = le32(18)
      val h = le32(22)
      if (w > 0 && h != 0) Some((w.toLong, math.abs(h.toLong))) else None
    } else None
  }

  /** Second real format: binary PPM (NetPBM `P6`) — magic, then
    * whitespace-separated ASCII width/height/maxval (with `#`-to-newline
    * comments allowed between tokens per the spec), one whitespace byte,
    * then the raw `width·height·3`-byte RGB raster. Same strictness
    * discipline as [[decodeBmp]]: the raster length must equal
    * `width·height·3` EXACTLY, so text that merely starts with "P6" can
    * never alias as an image (its tail would have to be precisely the
    * declared pixel count). maxval is capped at 255 (1 byte/sample — the
    * 2-byte ≥256 variant would double the raster and is rejected rather
    * than misparsed).
    */
  def decodePpm(p: Array[Byte]): Option[(Long, Long)] = {
    if (p.length < 12 || p(0) != 'P'.toByte || p(1) != '6'.toByte) return None
    var i = 2
    def isWs(b: Byte): Boolean =
      b == ' '.toByte || b == '\n'.toByte || b == '\r'.toByte || b == '\t'.toByte
    def nextInt(): Long = {
      while (i < p.length && (isWs(p(i)) || p(i) == '#'.toByte)) {
        if (p(i) == '#'.toByte) { while (i < p.length && p(i) != '\n'.toByte) i += 1 }
        else i += 1
      }
      val start = i
      var v = 0L
      while (i < p.length && p(i) >= '0'.toByte && p(i) <= '9'.toByte && v <= Int.MaxValue.toLong) {
        v = v * 10 + (p(i) - '0'.toByte); i += 1
      }
      if (i == start || v > Int.MaxValue.toLong) -1L else v
    }
    val w = nextInt(); val h = nextInt(); val maxv = nextInt()
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return None
    if (i >= p.length || !isWs(p(i))) return None // exactly one ws, then raster
    i += 1
    if ((p.length - i).toLong == w * h * 3L) Some((w, h)) else None
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

  /** Third real format, first AUDIO one: PCM WAV (RIFF). Little-endian
    * fields at the canonical 44-byte-header offsets — "RIFF" + riff size
    * (must equal payload length − 8), "WAVE", a 16-byte PCM "fmt " chunk
    * (format tag 1, 8- or 16-bit samples, block align must equal
    * channels·bits/8), then a "data" chunk whose stored size must equal
    * the remaining bytes exactly AND divide evenly into frames. Same
    * strictness discipline as [[decodeBmp]]/[[decodePpm]]: three
    * length-consistency equations over arbitrary text bytes means "RIFF"
    * prefixes can't alias as audio. An image-shaped (width, height) makes
    * no sense for audio, so the feature mapping is (frames, sample rate) —
    * duration in seconds is their ratio, the two numbers a corpus pipeline
    * filters on.
    */
  def decodeWav(p: Array[Byte]): Option[(Long, Long)] = {
    def u8(i: Int): Int = p(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)).toLong & 0xffffffffL
    def tag(i: Int, s: String): Boolean = s.indices.forall(j => p(i + j) == s(j).toByte)
    if (p.length < 44 || !tag(0, "RIFF") || le32(4) != p.length - 8L ||
        !tag(8, "WAVE") || !tag(12, "fmt ") || le32(16) != 16L) return None
    val (fmt, channels, rate) = (le16(20), le16(22), le32(24))
    val (blockAlign, bits) = (le16(32), le16(34))
    if (fmt != 1 || channels < 1 || rate < 1L || (bits != 8 && bits != 16) ||
        blockAlign != channels * bits / 8 || !tag(36, "data")) return None
    val dataSize = le32(40)
    if (dataSize != p.length - 44L || dataSize % blockAlign != 0L) return None
    Some((dataSize / blockAlign, rate))
  }

  /** A minimal valid PCM-WAV container around raw bytes, assembled from
    * pure Spark expressions — the planting twin of [[bmpWrap]] for the
    * audio format. 16-bit samples; the data bytes are truncated/zero-padded
    * to exactly `frames·channels·2` so [[decodeWav]]'s strict size
    * equations hold.
    */
  def wavWrap(
      frames: org.apache.spark.sql.Column,
      channels: org.apache.spark.sql.Column,
      sampleRate: org.apache.spark.sql.Column,
      data: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.Column
    def hex2(v: Column): Column = lpad(hex(v.bitwiseAND(lit(255L))), 2, "0")
    def le32(v: Column): Column =
      concat(hex2(v), hex2(shiftright(v, 8)), hex2(shiftright(v, 16)), hex2(shiftright(v, 24)))
    def le16(v: Column): Column = concat(hex2(v), hex2(shiftright(v, 8)))
    val ch = channels.cast("long")
    val sr = sampleRate.cast("long")
    val blockAlign = ch * lit(2L)
    val dataLen = frames.cast("long") * blockAlign
    concat(unhex(concat(
      lit("52494646"),              // "RIFF"
      le32(dataLen + lit(36L)),     // riff size = total - 8
      lit("57415645666D7420"),      // "WAVE" + "fmt "
      le32(lit(16L)),               // fmt chunk size (PCM)
      le16(lit(1L)), le16(ch),      // format tag, channels
      le32(sr), le32(sr * blockAlign), // sample rate, byte rate
      le16(blockAlign), le16(lit(16L)), // block align, bits/sample
      lit("64617461"),              // "data"
      le32(dataLen)
    )), call_function("rpad", data, dataLen.cast("int"), lit(Array[Byte](0))))
  }

  /** A minimal valid binary-PPM container around raw bytes, assembled from
    * pure Spark expressions — the planting twin of [[bmpWrap]] for the
    * second real format. The data bytes are right-truncated or zero-padded
    * to exactly `width·height·3` so [[decodePpm]]'s strict raster check
    * holds (a real P6 raster is always exactly that long).
    */
  def ppmWrap(width: org.apache.spark.sql.Column, height: org.apache.spark.sql.Column,
      data: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val w = width.cast("long")
    val h = height.cast("long")
    val rasterLen = (w * h * lit(3L)).cast("int")
    val header = encode(
      concat(lit("P6\n"), w.cast("string"), lit(" "), h.cast("string"), lit("\n255\n")),
      "UTF-8")
    // rpad on BINARY both truncates and zero-pads to the exact raster size.
    concat(header, call_function("rpad", data, rasterLen, lit(Array[Byte](0))))
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
    * BMP and binary-PPM payloads parse for real ([[decodeBmp]],
    * [[decodePpm]]); everything else takes the documented [[stubDecode]]
    * fallback. The `codec` column records which path fired — over a real
    * corpus it is the observability signal for how much of the data fell
    * through to the stub instead of silently fabricating dimensions.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val real = decodeBmp(r.payload).map(("bmp", _))
          .orElse(decodePpm(r.payload).map(("ppm", _)))
          .orElse(decodeWav(r.payload).map(("wav", _)))
        val (codec, (w, h)) = real.getOrElse(("stub", stubDecode(r.payload)))
        MediaFeatures(r.doc_id, r.payload.length.toLong, w, h, codec)
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
