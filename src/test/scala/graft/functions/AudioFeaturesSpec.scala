package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WAV audio contracts: the synthesized fixture is a REAL RIFF/WAVE file
  * javax.sound.sampled parses (format fields, lossless sample round-trip),
  * the decoded statistics match direct arithmetic over the fixture's
  * samples, and corrupt/non-audio payloads degrade to null stats rather
  * than a throw.
  */
class AudioFeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("encodeWav produces a real WAV that javax.sound decodes losslessly") {
    val id = 42L
    val n = (id % 97).toInt + 16 // 58
    val bytes = Multimodal.encodeWav(id)
    assert(bytes.length == 44 + 2 * n)
    // decode through the REAL codec path, not our own parser
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian)
    val Some((sr, ch, samples)) = Multimodal.decodeWavStats(bytes)
    assert(sr == 8000 && ch == 1 && samples.length == n)
    // lossless: every decoded sample equals the arithmetic definition
    for (i <- 0 until n)
      assert(samples(i) == (((id * 31 + i.toLong * 7919) % 65536) - 32768).toInt)
  }

  test("audioFeatures stats match direct arithmetic over the samples") {
    val ids = Seq(0L, 1L, 42L, 96L, 97L, 12345L)
    val media = Multimodal.synthesizeAudio(ids.toDF("doc_id"), "doc_id")
    val got = Multimodal.audioFeatures(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (id <- ids) {
      val n = (id % 97).toInt + 16
      val samples = Array.tabulate(n)(i =>
        (((id * 31 + i.toLong * 7919) % 65536) - 32768).toInt)
      val r = got(id)
      assert(r.getInt(2) == 8000 && r.getInt(3) == 1, "sample_rate/channels")
      assert(r.getLong(4) == n.toLong, "n_samples")
      assert(r.getLong(5) == n * 1000L / 8000, "duration_ms")
      val rms = math.sqrt(samples.map(s => s.toLong * s).sum.toDouble / n)
      assert(math.abs(r.getDouble(6) - rms) < 1e-12, "rms")
      assert(r.getInt(7) == samples.map(math.abs).max, "peak")
      val zc = (1 until n).count(i => (samples(i - 1) >= 0) != (samples(i) >= 0))
      assert(r.getLong(8) == zc.toLong, "zero_crossings")
    }
  }

  test("corrupt / non-audio / empty payloads yield null stats, never a throw") {
    val media = Seq(
      (1L, Array[Byte](1, 2, 3)),                       // garbage
      (2L, Array.empty[Byte]),                          // empty
      (3L, Multimodal.encodeWav(3L).take(20)),          // truncated header
      (4L, "RIFFxxxxWAVEfmt ".getBytes("US-ASCII"))     // bogus RIFF
    ).toDF("media_id", "payload")
    val rows = Multimodal.audioFeatures(media).collect()
    assert(rows.length == 4)
    assert(rows.forall(r => r.isNullAt(2) && r.isNullAt(6)),
      "undecodable payloads must yield null stats")
  }

  test("a WAV declaring sample rate 0 yields null stats instead of dividing by zero") {
    // javax.sound does not validate the fmt-chunk rate field; an unguarded
    // duration division would crash the stage on one crafted clip
    val wav = Multimodal.encodeWav(7L)
    val zeroRate = wav.clone()
    for (i <- 24 until 28) zeroRate(i) = 0 // fmt sample-rate field (LE32)
    val rows = Multimodal.audioFeatures(
      Seq((1L, zeroRate)).toDF("media_id", "payload")).collect()
    assert(rows.length == 1 && rows.head.isNullAt(2) && rows.head.isNullAt(5),
      "rate-0 WAV must take the null-stats path")
  }

  test("the meta duration matches the decoded duration") {
    val ids = (0L until 200L).toDF("doc_id")
    val media = Multimodal.synthesizeAudio(ids, "doc_id")
    val mismatch = Multimodal.audioFeatures(media)
      .join(media.select(col("media_id"), col("meta.duration_ms").as("meta_ms")), "media_id")
      .filter(col("duration_ms") =!= col("meta_ms")).count()
    assert(mismatch == 0)
  }
}
