package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with batched per-partition decode/feature stages.
  *
  * The actual media decode is STUBBED (deterministic fake derived from the
  * bytes — no image/audio libraries exist in this environment); everything
  * Spark-side is real: schema, binary column handling, batch iteration
  * shape, and the partition-preserving (shuffle-free) decode stage.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, channels: Int, format: String)
  final case class DecodedMedia(doc_id: Long, n_bytes: Long, meta: MediaMeta,
                                feature: Array[Float])

  /** STUB decode: a real deployment would decode image/audio bytes here
    * (e.g. JPEG header parse + resize + patch embedding). The fake is a
    * pure function of the payload bytes so tests are deterministic.
    */
  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    val b0 = if (bytes.length > 0) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    MediaMeta(
      width = 16 + (b0 % 64) * 16,
      height = 16 + (b1 % 64) * 16,
      channels = 3,
      format = "stub")
  }

  /** STUB feature extraction: 8-dim byte-histogram-ish vector. */
  def featureStub(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
    val acc = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) { acc((bytes(i) & 0xff) % dim) += 1; i += 1 }
    val n = math.max(1, bytes.length)
    acc.map(c => c.toFloat / n.toFloat)
  }

  /** Decode stage over (doc_id: long, payload: binary): batched
    * mapPartitions, no shuffle, bounded memory per batch.
    */
  def decode(media: DataFrame): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(256).flatMap(_.map { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        DecodedMedia(id, b.length.toLong, decodeStub(b), featureStub(b))
      }))
  }
}
