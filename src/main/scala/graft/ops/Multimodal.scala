package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed per-partition in batches.
  *
  * The Spark-side shape is real — schema, typed Dataset encoders, partition
  * iteration, deterministic output — but the decoder is a STUB: this
  * environment has no image/audio codecs, so [[stubDecode]] derives fake
  * "decoded" dimensions from the byte length alone. Swapping in a real codec
  * (JNI or an `mapInPandas`-style Python worker on a real cluster) changes
  * only the body of the decode function, nothing in the plan.
  *
  * At 100 TB: binary payloads dominate row size, so (a) never shuffle the
  * payload — extract features first, carry only metadata downstream; (b) read
  * with a small `files.maxPartitionBytes` so a partition of blobs fits in
  * executor memory.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Long, height: Long)

  /** ??? in spirit: a deterministic fake decode so tests and the oracle can
    * pin the plumbing. width/height are pure functions of the payload length.
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

  /** Per-partition batched "decode" → typed feature rows. mapPartitions, not a
    * per-row UDF: a real decoder amortizes codec init per batch exactly here.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val (w, h) = stubDecode(r.payload)
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
