package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** k-family MinHash signature of a pre-hashed shingle set, fused into one
  * narrow expression: `sig[i] = min over shingle hashes h of
  * xxhash64(i, h)` for i in 0 until k.
  *
  * A MinHash signature is a pure per-row function of the document's shingle
  * hashes, so it needs no explode and no shuffle. This replaces the previous
  * corpus-scale formulation (`explode` to one row per shingle, then a
  * `groupBy(id)` with k separate `min(xxhash64(i, h))` aggregates), which
  * shuffled |corpus shingles| rows and compiled a k-column-wide generated
  * aggregate — both pure overhead given the per-row closed form. Measured at
  * sf0.1 the aggregate route was the single largest stage of the LSH funnel;
  * this expression removes that stage entirely (signatures become a
  * map-side projection that pipelines into the band explode).
  *
  * Hash family i is Catalyst-compatible by construction:
  * `XXH64.hashLong(h, XXH64.hashInt(i, 42L))` is bit-for-bit what the SQL
  * `xxhash64(lit(i), h)` computes (seed 42, inputs folded left to right), so
  * signatures — and therefore LSH candidate sets — are identical to the
  * aggregate formulation's.
  *
  * Ref semantics: near-dup detection supporting dedup, SURVEY §7.5; the
  * reference framework has no LSH of its own — this is the training-data
  * pipeline extension.
  */
case class MinHashSignatureExpr(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, "signature length must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature expects array<bigint>, got ${other.simpleString(2)}")
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignatureExpr.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.MinHashSignatureExpr.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinHashSignatureExpr {

  // family seeds are a function of (i, 42) only; cache per signature length
  // so the per-row loop never re-derives them (thread-safe: idempotent put)
  @volatile private var seedCache: Array[Long] = new Array[Long](0)

  private def seeds(k: Int): Array[Long] = {
    val cached = seedCache
    if (cached.length >= k) cached
    else {
      val out = new Array[Long](k)
      var i = 0
      while (i < k) { out(i) = XXH64.hashInt(i, 42L); i += 1 }
      seedCache = out
      out
    }
  }

  /** Static so generated code calls it directly (whole-stage codegen keeps
    * the loop in one JIT-friendly method). Empty input yields the identity
    * signature (all Long.MaxValue) — matches `min` over zero rows never
    * occurring in the aggregate form, where empty shingle arrays simply
    * produced no exploded rows; callers shingle non-empty text.
    */
  def compute(input: ArrayData, k: Int): ArrayData = {
    val s = seeds(k)
    val n = input.numElements()
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = input.getLong(j)
      var i = 0
      while (i < k) {
        val v = XXH64.hashLong(h, s(i))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    val out = new Array[Any](k)
    var i = 0
    while (i < k) { out(i) = sig(i); i += 1 }
    new GenericArrayData(out)
  }
}
