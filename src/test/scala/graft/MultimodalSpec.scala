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

  test("image payloads are really decoded: grid luma reflects pixel content") {
    import java.awt.image.BufferedImage
    def png(fill: (Int, Int) => Int, w: Int = 8, h: Int = 8): Array[Byte] = {
      val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, fill(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    val white = png((_, _) => 0xFFFFFF)
    val black = png((_, _) => 0x000000)
    // left half white, right half black → left grid cells ~1, right ~0
    val split = png((x, _) => if (x < 4) 0xFFFFFF else 0x000000)
    val media = Seq(
      Multimodal.MediaRecord(1L, "image/png", white),
      Multimodal.MediaRecord(2L, "image/png", black),
      Multimodal.MediaRecord(3L, "image/png", split),
      Multimodal.MediaRecord(4L, "image/png", Array[Byte](1, 2, 3)) // corrupt → fallback
    ).toDS()
    val f = Multimodal.decodeFeatures(media).collect().sortBy(_.doc_id)
    assert(f(0).features.forall(v => math.abs(v - 1.0f) < 1e-3), "white != 1.0")
    assert(f(1).features.forall(v => v < 1e-3), "black != 0.0")
    val grid = f(2).features.grouped(4).toSeq // rows of the 4x4 grid
    assert(grid.forall(row => row(0) > 0.99f && row(1) > 0.99f &&
      row(2) < 0.01f && row(3) < 0.01f), s"split grid wrong: ${f(2).features.toSeq}")
    assert(f(3).features.toSeq == Multimodal.byteFoldFeatures(Array[Byte](1, 2, 3)).toSeq)
  }

  test("q_multimodal_decode: healthy fixture fills the gate; sabotage zeroes it") {
    import org.apache.spark.sql.functions._
    import graft.queries.MultimodalQueries
    val rows = MultimodalQueries.qMultimodalDecode(spark, TestSpark.Sf).collect()
    assert(rows.length == MultimodalQueries.NumImages * Multimodal.FeatureDim,
      s"expected full gated grid, got ${rows.length}")
    // both codecs must be on the gate: the fixture alternates PNG/JPEG by
    // doc_id parity, and every image of each parity filled all 16 cells
    assert(rows.map(_.getLong(0)).distinct.count(_ % 2 == 0) == MultimodalQueries.NumImages / 2)
    assert(rows.map(_.getLong(0)).distinct.count(_ % 2 == 1) == MultimodalQueries.NumImages / 2)
    // the gate's per-codec tolerance, reproduced for the sabotage frames
    val tol = when(pmod(col("doc_id"), lit(2)) === 0, lit(1e-6))
      .otherwise(lit(MultimodalQueries.JpegTol))
    // sabotage 1: corrupt payloads (decode falls back to byte-fold) must
    // fail the in-plan expected-luma gate, not sneak through — per mime
    val corrupt = (0L until 4L).map(id =>
      Multimodal.MediaRecord(id, MultimodalQueries.mimeFor(id), Array[Byte](9, 9, 9))).toDS()
    val corruptRows = Multimodal.decodeFeatures(corrupt).toDF()
      .select(col("doc_id"), posexplode(col("features")))
      .select(col("doc_id"), col("pos").cast("long").as("cell"), col("col").cast("double").as("luma"))
      .filter(abs(col("luma") - (col("doc_id") * 17 + col("cell") * 13) % 256 / lit(255.0)) < tol)
    assert(corruptRows.count() == 0)
    // sabotage 2: right images, wrong cell mapping (transposed grid) —
    // off-diagonal cells must fail the gate for BOTH codecs (the JPEG
    // tolerance must not absorb a 13/255 wrong-cell gap)
    val transposed = (0L until 4L).map { id =>
      Multimodal.MediaRecord(id, MultimodalQueries.mimeFor(id), MultimodalQueries.imageBytes(id))
    }.toDS()
    val wrongExpected = Multimodal.decodeFeatures(transposed).toDF()
      .select(col("doc_id"), posexplode(col("features")))
      .select(col("doc_id"), col("pos").cast("long").as("cell"), col("col").cast("double").as("luma"))
      // transpose: cell (r,c) → (c,r) = (cell%4)*4 + cell/4
      .filter(abs(col("luma") -
        (col("doc_id") * 17 + ((col("cell") % 4) * 4 + floor(col("cell") / 4)) * 13) % 256 / lit(255.0)) < tol)
    // diagonal cells (r==c) still match; all 12 off-diagonal cells per
    // image must not
    assert(wrongExpected.count() == 4 * 4, s"transposed gate leaked: ${wrongExpected.count()}")
  }

  test("jpegBytes really is JPEG and decodes within JpegTol (but not losslessly)") {
    import graft.queries.MultimodalQueries
    val oddIds = (1L until MultimodalQueries.NumImages.toLong by 2)
    val errsById = oddIds.map { id =>
      val bytes = MultimodalQueries.jpegBytes(id)
      // JFIF magic: FF D8
      assert((bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8, s"doc $id not a JPEG payload")
      val feats = Multimodal.imageFeatures(bytes).get
      feats.zipWithIndex.map { case (luma, cell) =>
        math.abs(luma - MultimodalQueries.cellValue(id, cell) / 255.0)
      }
    }
    val worst = errsById.flatten.max
    assert(worst < MultimodalQueries.JpegTol, s"JPEG decode outside tolerance: $worst")
    // and the codec really is lossy somewhere in the fixture — if every
    // cell of every image were exact, the PNG-vs-JPEG tolerance split
    // would be testing nothing (individual images may round-trip exactly
    // at quality 1.0; the fixture as a whole must not)
    assert(worst > 1e-6, "all JPEG images decoded bit-exact; lossy-tolerance path untested")
  }

  test("frame sampling keeps every stride-th frame with byte offsets") {
    val docs = Seq((1L, "x" * 1000)).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrameOffsets(Multimodal.packText(docs), stride = 2)
      .select("frame_idx", "byte_offset").as[(Int, Int)].collect().sortBy(_._1)
    assert(frames.toSeq == Seq((0, 0), (2, 512)))
  }

  test("q_image_phash: PNG hashes are the closed form; banded dedup equals brute force") {
    import graft.queries.MultimodalQueries
    val hashes = MultimodalQueries.qImagePhash(spark, TestSpark.Sf)
      .as[(Long, Long)].collect().toMap
    assert(hashes.size == MultimodalQueries.NumImages / 2)
    def expect(d: Long): Long =
      (0 until 16).map(c => if ((d * 17 + c * 13) % 256 > 127) 1L << c else 0L).sum
    hashes.foreach { case (d, h) => assert(h == expect(d), s"doc $d") }
    // banded pair set equals the brute-force all-pairs set (pigeonhole)
    val banded = MultimodalQueries.qImagePhashDedup(spark, TestSpark.Sf)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    val brute = (for {
      a <- hashes.keys; b <- hashes.keys if a < b
      if java.lang.Long.bitCount(hashes(a) ^ hashes(b)) <= 2
    } yield (a, b)).toSet
    assert(banded == brute && brute.nonEmpty)
  }
}
