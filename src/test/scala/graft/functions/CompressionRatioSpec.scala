package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Compression-ratio signal contracts: the ordering the gate relies on
  * (repetitive ≪ prose ≪ high-entropy), determinism, edge cases, and
  * separation on the real corpus.
  */
class CompressionRatioSpec extends SparkSpec {
  import spark.implicits._

  private def ratio(ss: String*): Seq[Double] =
    ss.toDF("s").select(TextFunctions.compressionRatio($"s")).as[Double].collect().toSeq

  test("repetitive text compresses far below prose; gibberish barely compresses") {
    val rnd = new scala.util.Random(42) // seeded: deterministic fixture
    val Seq(rep, prose, noise) = ratio(
      "buy now click here " * 200,
      "The quick brown fox jumps over the lazy dog near the quiet river bank " +
        "while morning light settles across the valley and the farmer counts " +
        "sheep. Further down the road an old mill turns slowly, grinding grain " +
        "for the village bakery whose ovens warm the square before dawn. " +
        "Children gather by the fountain trading stories about storms, maps, " +
        "and the strange lights that dance over the marsh in late autumn.",
      // seeded printable noise — no repeated structure to exploit
      Array.fill(2000)((32 + rnd.nextInt(95)).toChar).mkString)
    assert(rep < 0.1, s"repetition should compress hard (got $rep)")
    assert(prose > rep * 3 && prose < 0.9, s"prose in the middle (got $prose)")
    assert(noise > prose, s"high-entropy text compresses worst (got $noise vs $prose)")
  }

  test("deterministic across evaluations; empty -> 1.0; null -> null") {
    assert(ratio("abc abc abc") == ratio("abc abc abc"))
    assert(ratio("") == Seq(1.0))
    val r = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "s")
      .select(TextFunctions.compressionRatio($"s")).collect()
    assert(r(0).isNullAt(0))
  }

  test("documents over 64 KiB stream through the fixed scratch buffer correctly") {
    val big = "some moderately compressible sentence with variation " * 4000 // ~200 KiB
    val viaExpr = ratio(big).head
    val direct = {
      val raw = big.getBytes("UTF-8")
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length + 1024)
      var n = 0
      while (!d.finished()) n += d.deflate(buf)
      d.end()
      math.rint(n.toDouble / raw.length * 1e6) / 1e6
    }
    assert(viaExpr == direct, "chunked deflate must equal one-shot deflate length")
  }

  test("separates the corpus: real docs sit between the degenerate extremes") {
    val stats = spark.read.parquet(s"$sf/documents.parquet").limit(200)
      .select(TextFunctions.compressionRatio($"text").as("r"))
      .agg(min($"r"), max($"r")).as[(Double, Double)].collect().head
    assert(stats._1 > 0.05 && stats._2 < 1.5, s"corpus ratios out of range: $stats")
  }
}
