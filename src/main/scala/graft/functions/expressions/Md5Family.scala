package graft.functions.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass kernels for the md5Hash60 hash family — the
  * SQL-expressible family (`CAST('0x' || substr(md5(s),1,15) AS UBIGINT)`
  * in DuckDB) that lets `dedup_simhash` / `dedup_winnow` oracles replay
  * their full funnels bit-for-bit.
  *
  * The composed higher-order-function forms
  * ([[graft.functions.TextFunctions.wordBigramHashes60Composed]] /
  * `winnowedFingerprints60Composed`) compute the same values but walk every
  * gram through interpreted lambda dispatch plus a Column-level md5 per
  * element — measured 4–10× slower at sf0.1 (23 s winnow). These
  * expressions keep the bytes-identical semantics (parity-pinned in
  * `Md5HashFamilySpec`) in one JIT-friendly pass per row, inside
  * whole-stage codegen via static `compute` calls, with the MessageDigest
  * instance reused per thread instead of re-created per gram.
  */
object Md5Family {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of md5(UTF-8 bytes) as a non-negative long:
    * bytes 0..6 big-endian (56 bits) then the high nibble of byte 7 —
    * exactly the value DuckDB's hex-prefix cast parses.
    */
  def hash60(s: String): Long = {
    val md = digest.get()
    md.reset()
    val b = md.digest(s.getBytes(StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (b(i) & 0xFFL); i += 1 }
    (v << 4) | ((b(7) & 0xFFL) >>> 4)
  }

  /** Java-regex `\s` (the classes Spark's `split(text, "\\s+")` uses). */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** md5Hash60 of each word n-gram ("w1 w2 ... wn", space-joined), words =
    * `\s+` split with empties dropped. Texts with fewer than n words →
    * empty array.
    */
  def ngramHashes(input: UTF8String, ngram: Int): ArrayData = {
    val s = input.toString
    val words = new java.util.ArrayList[String]()
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(s.charAt(i))) i += 1
      if (i > start) words.add(s.substring(start, i))
    }
    val m = words.size
    if (m < ngram) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - ngram + 1)
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j <= m - ngram) {
      sb.setLength(0)
      var q = 0
      while (q < ngram) {
        if (q > 0) sb.append(' ')
        sb.append(words.get(j + q))
        q += 1
      }
      out(j) = hash60(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct sliding-w-window minima of the md5Hash60 char-k-gram hashes
    * of lower(text) — the winnowing selection the `dedup_winnow` oracle
    * replays with `min OVER (ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING)` +
    * DISTINCT. Code-point-based grams (what both engines' substr counts);
    * texts with fewer than w full grams → empty array.
    */
  def winnowHashes(input: UTF8String, k: Int, w: Int): ArrayData = {
    val s = input.toLowerCase.toString
    val cps = s.codePoints().toArray
    val n = cps.length
    val ng = n - k + 1
    if (ng < w) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](ng)
    var i = 0
    while (i < ng) {
      hs(i) = hash60(new String(cps, i, k))
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var p = 0
    while (p + w <= ng) {
      var min = hs(p)
      var q = p + 1
      while (q < p + w) { if (hs(q) < min) min = hs(q); q += 1 }
      out.add(min)
      p += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(arr)
  }
}

/** `array<long>` of md5Hash60 word-n-gram hashes — see [[Md5Family]]. */
case class Md5WordNgramHashesExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    Md5Family.ngramHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.Md5Family.ngramHashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "md5_word_ngram_hashes"
}

/** `array<long>` of distinct winnowed md5Hash60 fingerprints — see
  * [[Md5Family]].
  */
case class Md5WinnowExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {

  require(k >= 1 && w >= 1, "need k >= 1 and w >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    Md5Family.winnowHashes(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.Md5Family.winnowHashes($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "md5_winnow_fingerprints"
}
