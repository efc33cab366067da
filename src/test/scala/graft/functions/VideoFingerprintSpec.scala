package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayOutputStream, ByteArrayOutputStream => BOS}

import graft.SparkSpec
import javax.imageio.ImageIO

class VideoFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private val FrameBytes = 4096

  private def pngFrame(seed: Int, brighten: Int = 0): Array[Byte] = {
    val (w, h) = (64, 48)
    val im = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = im.getRaster
    for (y <- 0 until h; x <- 0 until w) {
      // headroom: max 180 + 40 + brighten(10) = 230 < 255, so a brightness
      // shift never clips — clipping would break the DC-only invariance
      // wraparound phase moves with the seed, so no two seeds render the
      // same image (the block term alone repeats mod 7)
      val grad = (x * 2 + y + 13 * seed) % 180
      val block =
        if (((x / 8) * (3 + seed) + (y / 8) * (7 + 2 * seed)) % 7 == 0) 40 else 0
      raster.setSample(x, y, 0, math.min(255, grad + block + brighten))
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(im, "png", bos)
    val png = bos.toByteArray
    assert(png.length <= FrameBytes, s"frame ${png.length} exceeds the slot")
    png ++ Array.fill(FrameBytes - png.length)(0.toByte) // pad the fixed slot
  }

  /** Minimal real BMFF: ftyp + one mdat holding the concatenated frames. */
  private def bmff(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new BOS()
    def box(tpe: String, payload: Array[Byte]): Unit = {
      val size = payload.length + 8
      out.write(Array[Byte]((size >>> 24).toByte, (size >>> 16).toByte,
        (size >>> 8).toByte, size.toByte))
      out.write(tpe.getBytes("US-ASCII"))
      out.write(payload)
    }
    box("ftyp", "isom0000".getBytes("US-ASCII"))
    box("mdat", frames.flatten.toArray)
    out.toByteArray
  }

  test("per-frame phashes survive re-encode-style brightening; edits localize") {
    val base = (1 to 8).map(pngFrame(_))
    val edited = (1 to 8).map { s =>
      if (s == 4) pngFrame(99) else pngFrame(s, brighten = 10) // one frame replaced
    }
    val df = Seq(
      (1L, bmff(base)),
      (2L, bmff(edited)),
      (3L, bmff((11 to 18).map(pngFrame(_)))) // unrelated footage
    ).toDF("media_id", "payload")
    val fp = Multimodal.videoFingerprints(df, FrameBytes)
    val byId = fp.select($"media_id", $"phash").as[(Long, Option[Long])]
      .collect().groupBy(_._1).view.mapValues(_.flatMap(_._2).toSet).toMap
    assert(byId(1L).size >= 7, "distinct frame hashes for distinct frames")
    // brightened frames hash identically (DC-only shift): every edited
    // hash except the replaced frame's appears in the base SET (two base
    // frames may collide into one set element, so compare set-wise)
    assert(byId(1L).intersect(byId(2L)).size >= byId(2L).size - 1)
    assert(byId(2L).size >= 6)
    val pairs = Multimodal.videoNearDupPairs(df, FrameBytes, minShared = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("non-image mdat content yields null phashes and no pairs") {
    val junk = Seq.fill(4)(Array.fill[Byte](FrameBytes)(7))
    val df = Seq((1L, bmff(junk)), (2L, bmff(junk))).toDF("media_id", "payload")
    val fp = Multimodal.videoFingerprints(df, FrameBytes)
    assert(fp.filter($"phash".isNotNull).count() == 0)
    assert(Multimodal.videoNearDupPairs(df, FrameBytes).count() == 0,
      "identical junk must not pair — undecodable frames carry no identity")
  }
}
