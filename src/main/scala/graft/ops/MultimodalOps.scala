package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star extension): media as opaque
  * `binary` columns with typed metadata, and a partition-preserving
  * feature-extraction stage.
  *
  * The decode step is a STUB — image/audio codecs are not available in this
  * environment, so [[fakeDecode]] derives deterministic pseudo-features from
  * the raw bytes. Everything around it is the real engine contract:
  * binary packing, metadata schema, `mapPartitions` batch shape (one codec
  * instance per partition, streamed record iteration — the same shape a
  * JNI/FFmpeg decoder needs), and the output feature schema.
  *
  * Scale notes: payloads never shuffle — pack/decode/extract are narrow maps
  * over the scan; only extracted features (small fixed-width rows) flow into
  * downstream joins/aggs. Partition sizing for 100 TB of media is governed by
  * `spark.sql.files.maxPartitionBytes` at the scan, not by the operator.
  */
object MultimodalOps {

  /** A packed media record: opaque payload + typed metadata. */
  case class MediaRecord(media_id: Long, kind: String, n_bytes: Long, payload: Array[Byte])

  /** Extracted per-media features (deterministic stub of decode+featurize). */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      width: Int,
      height: Int)

  /** Pack a text column as a binary payload with metadata — stands in for
    * reading image/audio bytes; the schema/contract is what matters.
    */
  def packBinary(df: DataFrame, idCol: String, textCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      lit(kind).as("kind"),
      octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** STUB decode: deterministic pseudo-features from raw bytes (a rolling
    * checksum and fake dimensions). A real deployment swaps ONLY this
    * function for a codec call; the `mapPartitions` harness stays.
    */
  private[graft] def fakeDecode(payload: Array[Byte]): (Long, Int, Int) = {
    var h = 1125899906842597L // large prime; plain polynomial rolling hash
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    val w = 16 + (math.abs(h) % 1024).toInt
    (h, w, 16 + (math.abs(h >> 10) % 1024).toInt)
  }

  /** Partition-preserving feature extraction over packed media: one decoder
    * context per partition, records streamed (never materialized per
    * partition) — the Spark-side shape of a real media pipeline.
    */
  def extractFeatures(spark: SparkSession, packed: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    packed.as[MediaRecord].mapPartitions { it =>
      // real codec: initialize per-partition decoder context here
      it.map { r =>
        val (checksum, w, h) = fakeDecode(r.payload)
        MediaFeatures(r.media_id, r.kind, r.n_bytes, checksum, w, h)
      }
    }
  }
}
