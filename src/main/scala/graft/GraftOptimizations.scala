package graft

import graft.functions.expressions._
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule collapsing redundant applications of the engine's
  * idempotent kernels — the composed-pipeline case where text already
  * normalized upstream flows through a preparation stage that normalizes
  * again (e.g. `CorpusPipeline.prepare` over a corpus a previous ingest
  * already prepared). Each collapsed node saves a full per-row pass
  * (an NFC walk, a byte copy, an image decode+re-encode) on every row of
  * the corpus — at 100 TB that is a whole wasted scan's worth of CPU.
  *
  * Collapses (all strictly semantics-preserving):
  *   - `nfc(nfc(x))` → `nfc(x)` — Unicode normalization is idempotent by
  *     definition (UAX #15).
  *   - `normalized_text(normalized_text(x))` → inner — the output alphabet
  *     ([a-z0-9], single spaces, trimmed) is a fixed point of the kernel.
  *   - `strided_resize(strided_resize(x, n), m)` with `m ≥ n` → inner —
  *     the inner pass already capped the payload at `n ≤ m` bytes, the
  *     outer pass is the identity.
  *   - `resize_image(resize_image(x, n), m)` with `m ≥ n` → inner — same
  *     bound argument on the longest image side; non-images pass through
  *     both unchanged.
  *
  * Deliberately NOT collapsed: `fix_mojibake` (bounded at 3 repair rounds,
  * so a ≥4-times-encoded pathology repairs further under re-application —
  * collapsing would change results), and any `strided_resize`/
  * `resize_image` pair where the outer bound is tighter (it does real
  * work).
  *
  * Registered by [[GraftExtensions]] via `injectOptimizerRule`; for an
  * existing session use
  * `spark.experimental.extraOptimizations ++= Seq(GraftOptimizations)`.
  */
object GraftOptimizations extends Rule[LogicalPlan] {

  private val collapse: PartialFunction[Expression, Expression] = {
    case NfcNormalizeExpr(inner: NfcNormalizeExpr) => inner
    case NormalizedTextExpr(inner: NormalizedTextExpr) => inner
    case StridedResizeExpr(inner: StridedResizeExpr, m) if m >= inner.targetBytes => inner
    case ResizeImageExpr(inner: ResizeImageExpr, m) if m >= inner.maxDim => inner
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // local fixpoint: transformAllExpressions rewrites a matched node once
    // per pass, so an n-deep chain needs up to n−1 passes; each pass
    // strictly removes a node, so this terminates. Running to the fixpoint
    // here keeps the rule correct even in a run-once batch.
    var cur = plan
    var done = false
    while (!done) {
      val next = cur.transformAllExpressions(collapse)
      done = next.fastEquals(cur)
      cur = next
    }
    cur
  }
}
