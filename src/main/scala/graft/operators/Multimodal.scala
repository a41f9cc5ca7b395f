package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed in partition-sized batches.
  *
  * The image path is a REAL decode: image-mime payloads go through
  * `javax.imageio` (PNG/JPEG/GIF/BMP ship with the JDK — no external
  * dependency) into a 4×4 mean-luma grid feature. Non-image mimes (and
  * undecodable payloads) fall back to a deterministic byte-fold feature,
  * standing in for the audio/video codecs this container doesn't ship.
  * The schema, Dataset encoders, mapPartitions batch shape, and
  * frame-sampling arithmetic are production plumbing either way:
  * swapping in a heavier extractor changes only [[imageFeatures]] /
  * [[byteFoldFeatures]].
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

  /** Deterministic byte-fold feature — the fallback for mimes whose
    * codecs this container doesn't ship (audio/video) and for corrupt
    * payloads; keeps the pipeline total (no row is dropped on decode
    * failure — production would also route these to a quarantine sink). */
  def byteFoldFeatures(payload: Array[Byte]): Array[Float] = {
    val feats = new Array[Float](FeatureDim)
    var i = 0
    while (i < payload.length) {
      feats(i % FeatureDim) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    feats
  }

  /** REAL image decode via the JDK's ImageIO: 4×4 grid of mean luma
    * ((r+g+b)/3/255 averaged per cell), a classic cheap visual
    * fingerprint. Returns None when the payload is not decodable. */
  def imageFeatures(payload: Array[Byte]): Option[Array[Float]] = {
    // NonFatal, not just IOException: ImageIO codecs throw
    // RuntimeExceptions (AIOOBE, IllegalArgumentException, CMMException)
    // on signature-valid-but-corrupt payloads, and a dirty corpus must
    // fall back, not kill the job
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }
    img.map { im =>
      val (wpx, hpx) = (im.getWidth, im.getHeight)
      val grid = 4 // FeatureDim = grid²
      val sums = new Array[Double](FeatureDim)
      val counts = new Array[Long](FeatureDim)
      var y = 0
      while (y < hpx) {
        val gy = math.min(y * grid / hpx, grid - 1)
        var x = 0
        while (x < wpx) {
          val gx = math.min(x * grid / wpx, grid - 1)
          val rgb = im.getRGB(x, y)
          val luma = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3.0 / 255.0
          val cell = gy * grid + gx
          sums(cell) += luma
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      Array.tabulate(FeatureDim)(c => if (counts(c) == 0) 0.0f else (sums(c) / counts(c)).toFloat)
    }
  }

  /** Per-partition batch decode → fixed-dim feature vector. Image-mime
    * payloads are really decoded (ImageIO); other mimes byte-fold. The
    * mapPartitions boundary is where a heavier codec would amortize
    * per-batch initialization (decoder contexts, model weights) — the
    * batch shape a Pandas-UDF/Arrow path gives PySpark. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init would go here (decoder context, model handle)
      it.map { r =>
        val n = r.payload.length
        val feats =
          if (r.mime.startsWith("image/")) imageFeatures(r.payload).getOrElse(byteFoldFeatures(r.payload))
          else byteFoldFeatures(r.payload)
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
