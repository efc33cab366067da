package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TokenChunksSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, size: Int, overlap: Int): Seq[String] =
    Seq(text).toDF("text")
      .select(TextFunctions.tokenChunks($"text", size, overlap).as("c"))
      .as[Seq[String]].head()

  test("windows slide by size - overlap; last chunk may be short") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val c = chunksOf(text, 4, 1)
    assert(c == Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
  }

  test("short document yields exactly one chunk; empty yields none") {
    assert(chunksOf("a b c", 32, 8) == Seq("a b c"))
    assert(chunksOf("", 32, 8).isEmpty)
    assert(chunksOf("   ", 32, 8).isEmpty)
  }

  test("no fully-redundant tail: chunk emitted only if previous missed the end") {
    // 5 tokens, size 4, step 3: chunk0 = t1..t4 (misses t5), chunk1 = t4 t5
    assert(chunksOf("t1 t2 t3 t4 t5", 4, 1) == Seq("t1 t2 t3 t4", "t4 t5"))
    // 4 tokens, size 4: one chunk, no tail
    assert(chunksOf("t1 t2 t3 t4", 4, 1) == Seq("t1 t2 t3 t4"))
  }

  test("every token is covered and overlap-stripped chunks reconstruct the doc") {
    val text = (1 to 97).map(i => s"w$i").mkString(" ")
    val c = chunksOf(text, 32, 8)
    // strip the 8-token overlap from every chunk after the first → original
    val rebuilt = (c.head +: c.tail.map(_.split(" ").drop(8).mkString(" ")))
      .mkString(" ")
    assert(rebuilt == text)
  }
}
