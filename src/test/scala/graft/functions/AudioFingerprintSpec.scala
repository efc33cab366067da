package graft.functions

import graft.SparkSpec

class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private val Rate = 8000
  private val N = 16384 // 2 s

  /** Deterministic sine mixture with a slow envelope — structured enough
    * that band-energy derivatives carry signal, not numeric noise.
    */
  private def pcm(seed: Int, gain: Double = 1.0, drop: Int = 0): Array[Int] = {
    val f1 = 350.0 + 37.0 * seed
    val f2 = 700.0 + 61.0 * seed
    val f3 = 1400.0 + 23.0 * seed
    Array.tabulate(N - drop) { i0 =>
      val i = i0 + drop
      val t = i.toDouble / Rate
      val env = 0.6 + 0.4 * math.sin(2 * math.Pi * 1.5 * t + seed)
      val v = env * (math.sin(2 * math.Pi * f1 * t) +
        0.7 * math.sin(2 * math.Pi * f2 * t) +
        0.5 * math.sin(2 * math.Pi * f3 * t))
      (gain * 8000.0 * v).toInt
    }
  }

  private def codes(s: Array[Int]): Array[Int] =
    Multimodal.audioFrameCodes(s, Rate)

  private def shareFrac(a: Array[Int], b: Array[Int]): Double = {
    val (sa, sb) = (a.toSet, b.toSet)
    sa.intersect(sb).size.toDouble / math.min(sa.size, sb.size)
  }

  test("uniform amplitude scaling preserves every frame code") {
    assert(codes(pcm(1)).toSeq == codes(pcm(1, gain = 0.5)).toSeq)
    assert(codes(pcm(1)).nonEmpty)
  }

  test("hop-aligned time shift reindexes codes without changing them") {
    val full = codes(pcm(1))
    val shifted = codes(pcm(1, drop = 1024))
    // dropping exactly one hop drops exactly one leading code
    assert(shifted.toSeq == full.toSeq.drop(1))
  }

  test("different material shares few codes; twins share most") {
    val a = codes(pcm(1))
    val twin = codes(pcm(1, gain = 0.7, drop = 1024))
    val other = codes(pcm(5))
    assert(shareFrac(a, twin) >= 0.8, s"twin share ${shareFrac(a, twin)}")
    assert(shareFrac(a, other) < 0.5, s"unrelated share ${shareFrac(a, other)}")
  }

  test("audioNearDupPairs retrieves the scaled+shifted twin, only the twin") {
    val df = Seq(
      (1L, Multimodal.encodePcmWav(pcm(1), Rate)),
      (2L, Multimodal.encodePcmWav(pcm(1, gain = 0.7, drop = 1024), Rate)),
      (3L, Multimodal.encodePcmWav(pcm(5), Rate)),
      (4L, "not audio".getBytes)
    ).toDF("media_id", "payload")
    val pairs = Multimodal.audioNearDupPairs(df, minShared = 0.6)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("too-short or undecodable payloads fingerprint to null/empty") {
    assert(Multimodal.audioFrameCodes(Array.fill(1000)(5), Rate).isEmpty)
    val df = Seq((9L, "junk".getBytes)).toDF("media_id", "payload")
    val row = Multimodal.audioFingerprints(df).head()
    assert(row.getInt(1) == 0 && row.isNullAt(2))
  }
}
