package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ISO-BMFF box-walk contracts: the synthesized fixture parses to its
  * arithmetic layout, real framing variants (largesize, size-0-to-EOF,
  * nesting) parse per spec, and crawl garbage degrades to a terminal _err
  * box instead of a throw. Frame sampling consumes real mdat content only.
  */
class BmffDemuxSpec extends SparkSpec {
  import spark.implicits._

  private def be32(n: Long): Array[Byte] =
    Array[Byte]((n >>> 24).toByte, (n >>> 16).toByte, (n >>> 8).toByte, n.toByte)
  private def box(t: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ t.getBytes("US-ASCII") ++ payload

  test("synthesized fixture parses to the exact arithmetic layout") {
    val id = 25L // f7=4, f11=3, f97=(25*13)%97=34
    val got = Multimodal.parseBoxes(Multimodal.encodeBmff(id))
    assert(got == Seq(
      ("ftyp", 0L, 20L, 0), ("free", 20L, 12L, 0), ("moov", 32L, 23L, 0),
      ("mvhd", 40L, 15L, 1), ("mdat", 55L, 43L, 0)))
  }

  test("largesize (size==1 + u64) and size==0 (to EOF) framing parse per spec") {
    val payload = Array.tabulate(10)(_.toByte)
    val large = be32(1L) ++ "mdat".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0) ++ be32(16L + payload.length) ++ payload
    val toEof = be32(0L) ++ "skip".getBytes("US-ASCII") ++ payload
    assert(Multimodal.parseBoxes(large) == Seq(("mdat", 0L, 26L, 0)))
    assert(Multimodal.parseBoxes(toEof) == Seq(("skip", 0L, 18L, 0)))
  }

  test("garbage, truncation and absurd sizes yield a terminal _err, never a throw") {
    assert(Multimodal.parseBoxes(Array[Byte](1, 2, 3)) == Seq(("_err", 0L, 3L, 0)))
    val truncated = be32(100L) ++ "mdat".getBytes("US-ASCII") ++ Array[Byte](1, 2)
    assert(Multimodal.parseBoxes(truncated) == Seq(("_err", 0L, 10L, 0)))
    val negative = be32(3L) ++ "mdat".getBytes("US-ASCII")
    assert(Multimodal.parseBoxes(negative) == Seq(("_err", 0L, 8L, 0)))
    assert(Multimodal.parseBoxes(Array.empty[Byte]).isEmpty)
    // nonprintable 4cc bytes are masked, not propagated raw
    val weird = be32(8L) ++ Array[Byte](1, 'a', 2, 'b')
    assert(Multimodal.parseBoxes(weird) == Seq(("?a?b", 0L, 8L, 0)))
  }

  test("nested containers walk depth-first with levels") {
    val inner = box("mvhd", Array[Byte](1, 2, 3, 4))
    val bytes = box("moov", box("trak", inner)) ++ box("mdat", Array[Byte](9))
    assert(Multimodal.parseBoxes(bytes) == Seq(
      ("moov", 0L, 28L, 0), ("trak", 8L, 20L, 1), ("mvhd", 16L, 12L, 2),
      ("mdat", 28L, 9L, 0)))
  }

  test("sampleFramesDemuxed chunks only mdat content, continuously across mdats") {
    val bytes = box("ftyp", Array.tabulate(8)(_.toByte)) ++
      box("mdat", Array.tabulate(5)(i => (i + 1).toByte)) ++
      box("free", Array[Byte](99)) ++
      box("mdat", Array.tabulate(3)(i => (i + 6).toByte))
    val df = Seq((7L, bytes)).toDF("media_id", "payload")
    val frames = Multimodal.sampleFramesDemuxed(df, frameBytes = 2, everyN = 1)
      .orderBy($"frame_no").collect()
    // mdat contents 1..5 and 6..8 chunk as [1,2][3,4][5][6,7][8]
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3, 4))
    assert(frames.map(r => r.getAs[Array[Byte]]("frame").toSeq).toSeq == Seq(
      Seq[Byte](1, 2), Seq[Byte](3, 4), Seq[Byte](5), Seq[Byte](6, 7), Seq[Byte](8)))
    // container framing bytes (ftyp/free content) never leak into frames
    assert(!frames.flatMap(_.getAs[Array[Byte]]("frame")).contains(99.toByte))
  }

  test("sampleFramesDemuxed skips the 16-byte largesize header (no leak into frame 0)") {
    val payload = Array.tabulate(4)(i => (i + 1).toByte)
    val large = be32(1L) ++ "mdat".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0) ++ be32(16L + payload.length) ++ payload
    val df = Seq((3L, large)).toDF("media_id", "payload")
    val frames = Multimodal.sampleFramesDemuxed(df, frameBytes = 2, everyN = 1)
      .orderBy($"frame_no").collect()
    // the 8 largesize bytes are header, not content: frames are exactly [1,2][3,4]
    assert(frames.map(r => r.getAs[Array[Byte]]("frame").toSeq).toSeq == Seq(
      Seq[Byte](1, 2), Seq[Byte](3, 4)))
  }

  test("fuzz: random bytes never throw; emitted boxes tile the input in order") {
    val rnd = new scala.util.Random(1234) // seeded: deterministic fuzz corpus
    for (_ <- 0 until 200) {
      val n = rnd.nextInt(64)
      val bytes = Array.fill(n)(rnd.nextInt(256).toByte)
      val boxes = Multimodal.parseBoxes(bytes) // must not throw
      // top-level boxes are in offset order, within bounds, non-overlapping
      val top = boxes.filter(_._4 == 0)
      top.foldLeft(0L) { case (pos, (_, off, size, _)) =>
        assert(off >= pos && off + size <= n || size == 0,
          s"box at $off size $size escapes [$pos, $n)")
        off + size
      }
      // an _err box, when present at top level, is terminal
      val errIdx = top.indexWhere(_._1 == "_err")
      if (errIdx >= 0) assert(errIdx == top.length - 1, "_err must be terminal")
    }
  }

  test("demuxBoxes DataFrame stage matches the direct walk row-for-row") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val media = Multimodal.synthesizeBmff(docs, "doc_id")
    val viaDf = Multimodal.demuxBoxes(media)
      .orderBy($"media_id", $"box_no")
      .as[(Long, Int, String, Long, Long, Int)].collect().toSeq
    val direct = media.select($"media_id", $"payload")
      .as[(Long, Array[Byte])].collect().toSeq.sortBy(_._1)
      .flatMap { case (id, p) =>
        Multimodal.parseBoxes(p).zipWithIndex.map { case ((t, o, s, l), i) =>
          (id, i, t, o, s, l)
        }
      }
    assert(viaDf == direct)
  }
}
