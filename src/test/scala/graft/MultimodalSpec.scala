package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("packText produces binary payloads with byte-accurate length") {
    val docs = Seq((1L, "hello"), (2L, "a" * 300)).toDF("doc_id", "text")
    val media = Multimodal.packText(docs).collect().sortBy(_.doc_id)
    assert(media(0).payload.length == 5 && media(1).payload.length == 300)
    assert(media.forall(_.mime == "text/plain"))
  }

  test("decodeFeatures: fixed dim, frame math, deterministic across runs") {
    val docs = Tables.documents(spark, TestSpark.Sf).limit(20)
    val feats1 = Multimodal.decodeFeatures(Multimodal.packText(docs))
      .collect().sortBy(_.doc_id)
    val feats2 = Multimodal.decodeFeatures(Multimodal.packText(docs))
      .collect().sortBy(_.doc_id)
    assert(feats1.forall(_.features.length == Multimodal.FeatureDim))
    assert(feats1.forall(f => f.n_frames == (f.n_bytes + 255) / 256))
    assert(feats1.map(_.features.toSeq).toSeq == feats2.map(_.features.toSeq).toSeq)
  }

  test("frame sampling keeps every stride-th frame with byte offsets") {
    val docs = Seq((1L, "x" * 1000)).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrameOffsets(Multimodal.packText(docs), stride = 2)
      .select("frame_idx", "byte_offset").as[(Int, Int)].collect().sortBy(_._1)
    assert(frames.toSeq == Seq((0, 0), (2, 512)))
  }
}
