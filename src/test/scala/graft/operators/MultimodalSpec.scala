package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class MultimodalSpec extends AnyFunSuite with SparkFixture {

  test("decode pipeline preserves row count and emits sane features") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length === spark.read.parquet(s"$sfDir/documents.parquet").count())
    feats.foreach { f =>
      assert(f.media_len > 0)
      assert(f.mean_byte >= 32.0 && f.mean_byte <= 122.0) // ascii payload
      assert(f.width === f.media_len % 640)
    }
  }

  test("imageio decoder: real PNGs decode through the partition-wise pipeline") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    // synthesize real PNGs: a 5x3 image of constant gray 100 and a
    // 7x2 of constant gray 30, plus one corrupt payload
    def png(w: Int, h: Int, gray: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val rgb = (gray << 16) | (gray << 8) | gray
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val ds = Seq(
      Multimodal.MediaRow(1L, "image", png(5, 3, 100)),
      Multimodal.MediaRow(2L, "image", png(7, 2, 30)),
      Multimodal.MediaRow(3L, "image", Array[Byte](1, 2, 3))).toDS()
      .repartition(2) // exercise >1 partition through mapPartitions
    val out = Multimodal.decodeFeaturesImageIo(ds).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out.keySet === Set(1L, 2L), "corrupt payload is dropped, not fatal")
    assert(out(1L).width === 5 && out(1L).height === 3)
    assert(out(1L).mean_byte === 100.0)
    assert(out(2L).width === 7 && out(2L).height === 2)
    assert(out(2L).mean_byte === 30.0)
    assert(out(1L).media_len > 0)
  }

  test("frame sampling blocks the payload and keeps every k-th frame") {
    import spark.implicits._
    val payload = Array.tabulate[Byte](10)(_.toByte)
    val ds = Seq(Multimodal.MediaRow(1L, "video", payload)).toDS()
    val frames = Multimodal.sampleFrames(ds, frameBytes = 4, everyK = 2)
      .collect().map(r => (r.getAs[Int]("frame_idx"), r.getAs[Array[Byte]]("frame")))
      .sortBy(_._1)
    // blocks: [0..3],[4..7],[8..9]; keep idx 0 and 2
    assert(frames.map(_._1).sameElements(Array(0, 2)))
    assert(frames(0)._2.sameElements(Array[Byte](0, 1, 2, 3)))
    assert(frames(1)._2.sameElements(Array[Byte](8, 9)))
  }

  test("resize emits fixed-size grids via nearest-neighbor index math") {
    import spark.implicits._
    // 16 bytes -> inferred 4x4 grid; resize to 2x2 picks (0,0),(0,2),(2,0),(2,2)
    val grid = Array.tabulate[Byte](16)(_.toByte)
    val ds = Seq(
      Multimodal.MediaRow(1L, "image", grid),
      Multimodal.MediaRow(2L, "image", Array.fill[Byte](100)(7)),
      Multimodal.MediaRow(3L, "image", Array.empty[Byte])).toDS()
    val out = Multimodal.resize(ds, 2, 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("pixels")).toMap
    assert(out.values.forall(_.length === 4)) // every output is 2x2
    assert(out(1L).sameElements(Array[Byte](0, 2, 8, 10)))
    assert(out(2L).forall(_ === 7.toByte)) // constant image stays constant
    assert(out(3L).forall(_ === 0.toByte)) // empty payload -> zero pixels
  }

  test("media type split is deterministic by doc_id parity") {
    val rows = Multimodal.q31MultimodalFeatures(spark, sfDir).collect()
    rows.foreach { r =>
      val expected = if (r.getAs[Long]("doc_id") % 2 == 0) "image" else "audio"
      assert(r.getAs[String]("media_type") === expected)
    }
  }
}
