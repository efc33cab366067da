package graft.functions.expressions

import graft.functions.BpeVocab
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level BPE as native Catalyst expressions. The vocabulary rides into
  * generated code as a codegen reference object (`ctx.addReferenceObj`), so
  * encode/count/decode all stay inside whole-stage codegen — no UDF, no
  * serialization per row, same pattern as `NearestCentroidsExpr`'s codebook.
  */
case class BpeEncodeExpr(child: Expression, vocab: BpeVocab) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects string, got ${other.simpleString(2)}")
  }

  override protected def nullSafeEval(input: Any): Any =
    BpeCompute.encodeToArrayData(input.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.addReferenceObj("bpeVocab", vocab, classOf[BpeVocab].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.BpeCompute.encodeToArrayData($c, $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode"
}

/** Token count without materializing the id array per row. */
case class BpeCountExpr(child: Expression, vocab: BpeVocab) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_count expects string, got ${other.simpleString(2)}")
  }

  override protected def nullSafeEval(input: Any): Any =
    BpeCompute.count(input.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.addReferenceObj("bpeVocab", vocab, classOf[BpeVocab].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.BpeCompute.count($c, $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_count"
}

/** Inverse of [[BpeEncodeExpr]]: ids back to the UTF-8 string. Ids outside
  * the vocabulary are skipped (never throws — decode is used inside chunk
  * reconstruction where robustness beats strictness).
  */
case class BpeDecodeExpr(child: Expression, vocab: BpeVocab) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_decode expects array<int>, got ${other.simpleString(2)}")
  }

  override protected def nullSafeEval(input: Any): Any =
    BpeCompute.decode(input.asInstanceOf[ArrayData], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.addReferenceObj("bpeVocab", vocab, classOf[BpeVocab].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.BpeCompute.decode($c, $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_decode"
}

/** Static kernels shared by interpreted eval and generated code. */
object BpeCompute {

  /** Encode one pre-token (no cache consultation) — the greedy merge loop:
    * repeatedly merge the lowest-rank adjacent pair until none applies.
    */
  private def encodeWordUncached(word: String, vocab: BpeVocab): Array[Int] = {
    var toks: Array[String] = {
      val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val out = new Array[String](bytes.length)
      var i = 0
      while (i < bytes.length) {
        out(i) = String.valueOf(BpeVocab.byteChar(bytes(i) & 0xFF)); i += 1
      }
      out
    }
    val ranks = vocab.ranks
    var done = toks.length < 2 || ranks.isEmpty
    while (!done) {
      // find the lowest-rank adjacent pair
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < toks.length - 1) {
        val r = ranks.get(toks(i) + " " + toks(i + 1))
        if (r != null && r.intValue() < bestRank) { bestRank = r.intValue(); bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        val a = toks(bestIdx)
        val b = toks(bestIdx + 1)
        val joined = a + b
        // merge every occurrence of (a, b) left-to-right in one pass
        val out = new Array[String](toks.length)
        var n = 0
        var j = 0
        while (j < toks.length) {
          if (j < toks.length - 1 && toks(j) == a && toks(j + 1) == b) {
            out(n) = joined; n += 1; j += 2
          } else { out(n) = toks(j); n += 1; j += 1 }
        }
        toks = java.util.Arrays.copyOf(out, n)
        done = toks.length < 2
      }
    }
    val ids = new Array[Int](toks.length)
    val tokenIds = vocab.tokenIds
    var i = 0
    while (i < toks.length) {
      val id = tokenIds.get(toks(i))
      // unknown tokens are impossible by construction (every merge product
      // is in tokenIds, every byte is in tokenIds); guard anyway
      ids(i) = if (id == null) -1 else id.intValue()
      i += 1
    }
    ids
  }

  private def encodeWord(word: String, vocab: BpeVocab): Array[Int] = {
    val cache = vocab.encodeCache
    val hit = cache.get(word)
    if (hit != null) hit
    else {
      val ids = encodeWordUncached(word, vocab)
      if (cache.size() > 65536) cache.clear()
      cache.put(word, ids)
      ids
    }
  }

  def encodeIds(text: UTF8String, vocab: BpeVocab): Array[Int] = {
    val words = BpeVocab.preTokenize(text.toString)
    var total = 0
    val parts = words.map { w => val ids = encodeWord(w, vocab); total += ids.length; ids }
    val out = new Array[Int](total)
    var n = 0
    parts.foreach { ids =>
      System.arraycopy(ids, 0, out, n, ids.length); n += ids.length
    }
    out
  }

  def encodeToArrayData(text: UTF8String, vocab: BpeVocab): ArrayData = {
    val ids = encodeIds(text, vocab)
    val out = new Array[Any](ids.length)
    var i = 0
    while (i < ids.length) { out(i) = ids(i); i += 1 }
    new GenericArrayData(out)
  }

  def count(text: UTF8String, vocab: BpeVocab): Int = {
    val words = BpeVocab.preTokenize(text.toString)
    var total = 0
    words.foreach(w => total += encodeWord(w, vocab).length)
    total
  }

  def decode(ids: ArrayData, vocab: BpeVocab): UTF8String = {
    val idTokens = vocab.idTokens
    val sb = new java.lang.StringBuilder()
    val n = ids.numElements()
    var i = 0
    while (i < n) {
      // a null element reads as 0 through ArrayData.getInt — without the
      // guard it would silently decode as byte 0's token; skip it like any
      // other invalid id (the documented lenient-decode contract)
      if (!ids.isNullAt(i)) {
        val id = ids.getInt(i)
        if (id >= 0 && id < idTokens.length) sb.append(idTokens(id))
      }
      i += 1
    }
    val chars = sb.toString
    val bytes = new Array[Byte](chars.length)
    var m = 0
    var j = 0
    while (j < chars.length) {
      val b = BpeVocab.charByte(chars.charAt(j))
      if (b >= 0) { bytes(m) = b.toByte; m += 1 }
      j += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(bytes, m))
  }
}
