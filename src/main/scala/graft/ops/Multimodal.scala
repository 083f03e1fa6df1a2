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
}
