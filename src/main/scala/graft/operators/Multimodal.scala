package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed in partition-sized batches.
  *
  * The actual codec step is STUBBED (this container ships no image/audio
  * libraries): [[decodeFeatures]] derives a deterministic fake feature
  * vector from the payload bytes. Everything around the stub — the
  * schema, the Dataset encoders, the mapPartitions batch shape, the
  * partition-parallel execution, frame-sampling arithmetic — is the real
  * production plumbing: swapping the fake for e.g. a JNI JPEG decoder
  * changes only the function body marked STUB below.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, mime: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, n_bytes: Int, n_frames: Int, features: Array[Float])

  val FrameBytes = 256
  val FeatureDim = 16

  /** Wrap a text corpus as binary media rows (the fixtures carry no real
    * media; production sources would read binary parquet columns). */
  def packText(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
      col(idCol).as("doc_id"),
      lit("text/plain").as("mime"),
      col(textCol).cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** Per-partition batch decode → fixed-dim feature vector.
    *
    * STUB: a real implementation decodes the payload (JPEG/PNG/WAV...)
    * and runs feature extraction; here features[j] deterministically
    * folds the payload bytes so tests can assert shape, determinism, and
    * partition-parallelism. The mapPartitions boundary is where a real
    * codec would amortize per-batch initialization (decoder contexts,
    * model weights) — exactly the batch shape a Pandas-UDF/Arrow path
    * gives PySpark. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init would go here (decoder context, model handle)
      it.map { r =>
        val n = r.payload.length
        val feats = new Array[Float](FeatureDim)
        var i = 0
        while (i < n) {
          feats(i % FeatureDim) += (r.payload(i) & 0xFF) / 255.0f
          i += 1
        }
        MediaFeatures(r.doc_id, n, (n + FrameBytes - 1) / FrameBytes, feats)
      }
    }
  }

  /** Frame sampling: keep every `stride`-th frame index of a payload —
    * pure arithmetic on the frame layout (no decode needed). */
  def sampleFrameOffsets(media: Dataset[MediaRecord], stride: Int): DataFrame = {
    val m = media.toDF()
    m.filter(length(col("payload")) > 0) // empty payload has no frames
      .select(col("doc_id"),
        explode(sequence(lit(0),
          floor((length(col("payload")) - 1) / FrameBytes).cast("int"))).as("frame_idx"))
      .filter(col("frame_idx") % stride === 0)
      .withColumn("byte_offset", col("frame_idx") * FrameBytes)
  }
}
