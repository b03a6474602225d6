package graft.multimodal

import org.apache.spark.sql.Dataset

/** Partition-wise multimodal processing (SURVEY.md §2 #30, scale path).
  *
  * Media decode/feature-extract cannot be a per-row SQL expression — real
  * decoders want batched calls (vectorized image libs, GPU feature
  * extractors). The Spark-native shape is `mapPartitions` over a typed
  * Dataset with explicit micro-batching: each executor core streams its
  * partition through the decoder in fixed-size batches, so memory stays
  * bounded no matter the partition size — the property that matters at
  * 100 TB of media.
  *
  * The decoder itself is STUBBED (this container has no image/audio libs):
  * `stubDecode` derives deterministic dimensions from the payload bytes.
  * Swapping in a real decoder touches only that function — the schema,
  * batching, and partitioning stay as tested.
  */
object BinaryPipeline {

  case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)

  case class DecodedMeta(doc_id: Long, media_type: String, byte_len: Long,
      width: Int, height: Int, n_frames: Int, ok: Boolean)

  val DefaultBatchSize = 64

  /** Deterministic fake decode — stands in for e.g. JPEG header parsing.
    * Reads only cheap byte stats so it is honest about per-batch cost. */
  private[multimodal] def stubDecode(batch: Seq[MediaRow]): Seq[DecodedMeta] =
    batch.map { m =>
      if (m.payload.isEmpty) DecodedMeta(m.doc_id, m.media_type, 0L, 0, 0, 0, ok = false)
      else {
        val len = m.payload.length
        val checksum = m.payload.foldLeft(0L)((acc, b) => acc * 31 + (b & 0xff))
        DecodedMeta(m.doc_id, m.media_type, len.toLong,
          width = 32 + (checksum % 512).toInt.abs,
          height = 32 + ((checksum >> 9) % 512).toInt.abs,
          n_frames = if (m.media_type == "video") 1 + (len % 30) else 1,
          ok = true)
      }
    }

  /** Batched partition-wise decode. */
  def decodeMeta(rows: Dataset[MediaRow], batchSize: Int = DefaultBatchSize): Dataset[DecodedMeta] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => stubDecode(batch))
    }
  }
}
