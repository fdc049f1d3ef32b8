package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: make truncated-timestamp range predicates pushable.
  *
  * The engine stores event time as epoch-ns longs and compares at µs
  * precision via floor-truncation: `(ts - pmod(ts, 1000)) >= lo`. Catalyst
  * cannot push that arithmetic into a parquet/JDBC scan, so the scan reads
  * everything. When the bound is a multiple of the truncation step the
  * predicate has an exactly equivalent raw form —
  *   trunc(ts) >= lo  ⟺  ts >= lo            (lo % step == 0)
  *   trunc(ts) <= hi  ⟺  ts <= hi + step - 1 (hi % step == 0)
  * — and `pmod`'s non-negative floor semantics make this hold for negative
  * ts too. This rule conjoins the raw-domain predicate (keeping the
  * original), which the datasource strategy then pushes to the scan:
  * row-group pruning instead of a full read.
  */
object PushableTruncRange extends Rule[LogicalPlan] {

  /** Matches `expr - pmod(expr, step)` and yields (expr, step). */
  private object Trunc {
    def unapply(e: Expression): Option[(Expression, Long)] = e match {
      case Subtract(base, Pmod(base2, Literal(step: Long, LongType), _), _)
          if base.semanticEquals(base2) && step > 0 =>
        Some((base, step))
      case _ => None
    }
  }

  private def rewrite(conjunct: Expression): Option[Expression] = conjunct match {
    case GreaterThanOrEqual(Trunc(ts, step), lit @ Literal(lo: Long, LongType))
        if lo % step == 0 =>
      Some(GreaterThanOrEqual(ts, lit))
    case LessThanOrEqual(Trunc(ts, step), Literal(hi: Long, LongType))
        if hi % step == 0 =>
      Some(LessThanOrEqual(ts, Literal(hi + step - 1, LongType)))
    case GreaterThan(Trunc(ts, step), Literal(lo: Long, LongType)) if lo % step == 0 =>
      // trunc(ts) > lo ⟺ trunc(ts) >= lo + step ⟺ ts >= lo + step
      Some(GreaterThanOrEqual(ts, Literal(lo + step, LongType)))
    case LessThan(Trunc(ts, step), Literal(hi: Long, LongType)) if hi % step == 0 =>
      Some(LessThanOrEqual(ts, Literal(hi - 1, LongType)))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val extras = conjuncts.flatMap(rewrite)
        .filterNot(e => conjuncts.exists(_.semanticEquals(e)))
      if (extras.isEmpty) f
      else Filter((conjuncts ++ extras).reduce(And), child)
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
    case other => Seq(other)
  }

  /** Install into an existing session (experimental hook — extensions only
    * apply at session build time). Idempotent. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(PushableTruncRange))
      spark.experimental.extraOptimizations = cur :+ PushableTruncRange
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => PushableTruncRange)
}
