package graft.functions

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.SparkSpec
import javax.imageio.ImageIO

class PhashSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic 64×48 grayscale test image: smooth gradient + a
    * seed-dependent blocky pattern (pHash needs low-frequency structure;
    * pure noise hashes are meaningless).
    */
  private def img(seed: Int, scale: Int = 1, brighten: Int = 0): Array[Byte] = {
    val (w, h) = (64 * scale, 48 * scale)
    val im = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = im.getRaster
    for (y <- 0 until h; x <- 0 until w) {
      val sx = x / scale; val sy = y / scale
      val grad = (sx * 2 + sy) % 200
      val block = if (((sx / 8) * 31 + (sy / 8) * 17 + seed * 7) % 5 == 0) 55 else 0
      val v = math.min(255, grad + block + brighten)
      raster.setSample(x, y, 0, v)
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  private def ph(bytes: Array[Byte]): Long = Multimodal.phash64(bytes).get
  private def dist(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("brightness shift moves only the DC coefficient: hash unchanged") {
    assert(dist(ph(img(1)), ph(img(1, brighten = 12))) == 0)
  }

  test("2x upscale hashes within a few bits (scale robustness)") {
    val d = dist(ph(img(1)), ph(img(1, scale = 2)))
    assert(d <= 6, s"upscaled twin drifted $d bits")
  }

  test("unrelated patterns are far apart; undecodable payloads hash to None") {
    val d = dist(ph(img(1)), ph(img(2)))
    assert(d >= 12, s"different patterns must differ widely, got $d bits")
    assert(Multimodal.phash64("not an image".getBytes).isEmpty)
    assert(Multimodal.phash64(Array.empty[Byte]).isEmpty)
  }

  test("imageNearDupPairs surfaces the perceptual twin, only the twin") {
    val df = Seq(
      (1L, img(1)),
      (2L, img(1, scale = 2, brighten = 8)), // perceptual twin of 1
      (3L, img(2)),                          // different pattern
      (4L, "garbage".getBytes)               // undecodable
    ).toDF("media_id", "payload")
    val pairs = Multimodal.imageNearDupPairs(df, maxDist = 6)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }
}
