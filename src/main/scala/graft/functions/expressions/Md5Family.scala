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
  * whole-stage codegen via static `compute` calls. The hot loops operate
  * directly on the UTF-8 bytes and allocate NOTHING per gram: words /
  * grams are byte ranges fed to `MessageDigest.update(buf, off, len)`,
  * and the digest lands in a reused thread-local 16-byte sink — an md5
  * per gram is the irreducible cost, so everything around it is free.
  *
  * Oracle-parity domain: whitespace is pinned to RE2 `\s` = `[ \t\n\f\r]`
  * (what DuckDB's `regexp_split_to_array(text, '\s+')` matches; Java's
  * `\s` additionally matches \x0B — deliberately excluded on this side so
  * the engines split identically). Lowercasing is `UTF8String.toLowerCase`
  * vs DuckDB `lower()` — identical on ASCII (pinned by fixtures); exotic
  * non-ASCII case mappings (e.g. locale-style dotted-I) are outside the
  * pinned domain. The NON-lowercasing funnel (`dedup_simhash`) is
  * engine-vs-engine pinned beyond ASCII: `Md5HashFamilySpec`'s "non-ASCII
  * corpus" test hash-matches fingerprints and near-dup pairs against
  * DuckDB's answer on an umlaut/Greek/CJK/emoji/NBSP/VT fixture.
  */
object Md5Family {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  // reusable 16-byte digest sink — MessageDigest.digest(buf, 0, 16) writes
  // here and auto-resets, so the hot loops allocate nothing per gram
  private val scratch16 = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  /** First 15 hex digits of an md5 digest as a non-negative long: bytes
    * 0..6 big-endian (56 bits) then the high nibble of byte 7 — exactly
    * the value DuckDB's hex-prefix cast parses.
    */
  private def hash60FromDigest(b: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (b(i) & 0xFFL); i += 1 }
    (v << 4) | ((b(7) & 0xFFL) >>> 4)
  }

  /** md5Hash60 of a string's UTF-8 bytes — the scalar form. */
  def hash60(s: String): Long = {
    val md = digest.get()
    md.reset()
    hash60FromDigest(md.digest(s.getBytes(StandardCharsets.UTF_8)))
  }

  /** RE2 `\s` — see the class scaladoc. All members are single-byte in
    * UTF-8 and continuation bytes have the high bit set, so byte-level
    * scanning splits exactly like code-point scanning.
    */
  private def isWsByte(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0C || b == 0x0D

  /** UTF-8 sequence length from its lead byte. */
  private def cpLen(b: Byte): Int = {
    val u = b & 0xFF
    if (u < 0x80) 1 else if (u < 0xE0) 2 else if (u < 0xF0) 3 else 4
  }

  /** md5Hash60 of each word n-gram ("w1 w2 ... wn", space-joined), words =
    * whitespace split with empties dropped. Texts with fewer than n words
    * → empty array. Each gram is fed to the digest as (word-range, ' ',
    * word-range, ...) over the row's single UTF-8 byte array — no String
    * or byte[] is built per gram.
    */
  def ngramHashes(input: UTF8String, ngram: Int): ArrayData = {
    val bytes = input.getBytes
    val n = bytes.length
    var m = 0
    var i = 0
    while (i < n) {
      while (i < n && isWsByte(bytes(i))) i += 1
      if (i < n) { m += 1; while (i < n && !isWsByte(bytes(i))) i += 1 }
    }
    if (m < ngram) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](m)
    val ends = new Array[Int](m)
    var wi = 0
    i = 0
    while (i < n) {
      while (i < n && isWsByte(bytes(i))) i += 1
      if (i < n) {
        starts(wi) = i
        while (i < n && !isWsByte(bytes(i))) i += 1
        ends(wi) = i
        wi += 1
      }
    }
    val md = digest.get()
    md.reset()
    val dig = scratch16.get()
    val out = new Array[Any](m - ngram + 1)
    var j = 0
    while (j <= m - ngram) {
      var q = 0
      while (q < ngram) {
        if (q > 0) md.update(0x20.toByte)
        md.update(bytes, starts(j + q), ends(j + q) - starts(j + q))
        q += 1
      }
      md.digest(dig, 0, 16)
      out(j) = hash60FromDigest(dig)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct sliding-w-window minima of the md5Hash60 char-k-gram hashes
    * of lower(text) — the winnowing selection the `dedup_winnow` oracle
    * replays with `min OVER (ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING)` +
    * DISTINCT. Code-point-based grams (what both engines' substr counts),
    * hashed over sliding byte ranges of the row's single UTF-8 encoding —
    * UTF-8 is context-free per code point, so a byte range equals the gram
    * string's own encoding. Texts with fewer than w full grams → empty
    * array.
    */
  def winnowHashes(input: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = input.toLowerCase.getBytes
    val bl = bytes.length
    var n = 0
    var i = 0
    while (i < bl) { n += 1; i += cpLen(bytes(i)) }
    val ng = n - k + 1
    if (ng < w) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](n + 1)
    var c = 0
    i = 0
    while (i < bl) { offs(c) = i; c += 1; i += cpLen(bytes(i)) }
    offs(n) = bl
    val md = digest.get()
    md.reset()
    val dig = scratch16.get()
    val hs = new Array[Long](ng)
    i = 0
    while (i < ng) {
      md.update(bytes, offs(i), offs(i + k) - offs(i))
      md.digest(dig, 0, 16)
      hs(i) = hash60FromDigest(dig)
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

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.string("md5_word_ngram_hashes", child)

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

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.string("md5_winnow_fingerprints", child)

  override protected def nullSafeEval(input: Any): Any =
    Md5Family.winnowHashes(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.Md5Family.winnowHashes($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "md5_winnow_fingerprints"
}
