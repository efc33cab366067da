package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.InSet
import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}

/** Probe-set membership filters for the pruned side reads.
  *
  * `col.isin(probes: _*)` builds an `In` with one `Literal` node PER
  * VALUE: at the gate's probe sizes (a 1000-doc batch touches ~16k band
  * buckets; the cap is 65,536) constructing, analyzing (per-literal type
  * coercion), optimizing, and translating that tree is a measurable
  * DRIVER cost paid per batch — exactly the single-threaded plan work
  * guide §7.3 warns about, and it grows linearly with the probe count.
  * [[InSet]] carries the values as ONE Set object: same membership
  * semantics, same parquet pushdown (DataSourceStrategy translates InSet
  * to `sources.In`, which becomes parquet's native set predicate above
  * the 10-value threshold), same partition-pruning behavior — with an
  * O(1) expression tree.
  *
  * Small sets keep the literal `isin`: the plans stay readable
  * (PushedFilters prints the values) and nothing measurable is saved
  * below a few hundred literals.
  */
private[graft] object SetFilters {

  /** above this many probe values the filter is built as one [[InSet]] */
  private val InSetThreshold = 256

  def probeFilter(c: Column, probes: Seq[Any]): Column =
    if (probes.size <= InSetThreshold) c.isin(probes: _*)
    else ExpressionUtils.column(InSet(
      ExpressionUtils.expression(c),
      probes.iterator.map(CatalystTypeConverters.convertToCatalyst).toSet))
}
