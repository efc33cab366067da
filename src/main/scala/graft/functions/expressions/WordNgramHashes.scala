package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 64-bit hashes of the word n-grams of normalized text, fused into
  * one pass: normalize → tokenize on the single separator the normalizer
  * emits → hash each word → combine n consecutive word hashes
  * (order-sensitive mix) → distinct. The n-gram strings never exist.
  *
  * Sibling of [[ShingleHashesExpr]] for the token-level dedup family
  * (n-gram Jaccard, SimHash): downstream treats the output as an opaque
  * element set, so hash equality stands in for string equality up to 64-bit
  * collisions.
  *
  * Codegen: direct static call to [[WordNgramHashesExpr.compute]] — stays
  * inside whole-stage codegen like [[ShingleHashesExpr]].
  */
case class WordNgramHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "ngram size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.string("word_ngram_hashes", child)

  override protected def nullSafeEval(input: Any): Any =
    WordNgramHashesExpr.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.WordNgramHashesExpr.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_ngram_hashes"
}

object WordNgramHashesExpr {

  /** Single-pass tokenize + n-gram + hash + distinct; static for codegen. */
  def compute(input: UTF8String, n: Int): ArrayData = {
    val s = input.toString
    // tokenize directly: alnum runs are words (same classes as normalized())
    val wordHashes = new java.util.ArrayList[java.lang.Long]()
    var h = 0xCBF29CE484222325L
    var inWord = false
    var i = 0
    while (i <= s.length) {
      val alnum = i < s.length && {
        val c = Character.toLowerCase(s.charAt(i))
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      }
      if (alnum) {
        val c = Character.toLowerCase(s.charAt(i))
        h ^= c.toLong
        h *= 0x100000001B3L
        inWord = true
      } else if (inWord) {
        wordHashes.add(finish(h))
        h = 0xCBF29CE484222325L
        inWord = false
      }
      i += 1
    }
    val w = wordHashes.size()
    val out = new java.util.HashSet[java.lang.Long]()
    if (w == 0) {
      out.add(finish(0xCBF29CE484222325L)) // empty text → hash of empty gram
    } else if (w < n) {
      out.add(combine(wordHashes, 0, w))
    } else {
      var start = 0
      while (start + n <= w) {
        out.add(combine(wordHashes, start, start + n))
        start += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(arr)
  }

  /** Order-sensitive combination of word hashes [from, until). */
  private def combine(ws: java.util.ArrayList[java.lang.Long], from: Int, until: Int): Long = {
    var acc = 0x9E3779B97F4A7C15L
    var i = from
    while (i < until) {
      acc = java.lang.Long.rotateLeft(acc, 17) ^ ws.get(i).longValue()
      acc *= 0x100000001B3L
      i += 1
    }
    finish(acc)
  }

  private def finish(h: Long): Long = {
    var z = h + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
