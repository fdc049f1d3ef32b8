package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Optimizer rule: make ns-domain range predicates pushable.
  *
  * The engine compares event time as epoch-ns longs at µs precision. The
  * ns-long view of the native column takes one of two shapes, neither of
  * which Catalyst can push into a parquet/JDBC scan by itself:
  *
  *  1. raw ns-long fixtures, floor-truncated: `(ts - pmod(ts, 1000)) >= lo`.
  *     When the bound is a multiple of the truncation step the predicate has
  *     an exactly equivalent raw form —
  *       trunc(ts) >= lo  ⟺  ts >= lo            (lo % step == 0)
  *       trunc(ts) <= hi  ⟺  ts <= hi + step - 1 (hi % step == 0)
  *     — and `pmod`'s non-negative floor semantics make this hold for
  *     negative ts too.
  *  2. µs-timestamp fixtures, scaled: `unix_micros(cast(ts)) * 1000 >= lo`.
  *     The exact µs form compares the native column to a timestamp literal:
  *       us(ts)*1000 >= lo ⟺ ts >= ceil(lo/1000) µs  (any lo)
  *       us(ts)*1000 <= hi ⟺ ts <= floor(hi/1000) µs
  *
  * This rule conjoins the raw-domain predicate (keeping the original), which
  * the datasource strategy then pushes to the scan: row-group pruning
  * instead of a full read.
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

  /** A timezone string under which NTZ→TZ casting is the micros identity. */
  private def utcZone(tz: String): Boolean = {
    val rules = java.time.ZoneId.of(tz).getRules
    rules.isFixedOffset && rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds == 0
  }

  /** Matches `unix_micros(ts) * 1000` (the ns-domain view of a native
    * timestamp column — Tables.tsToNs) and yields the underlying timestamp
    * expression. A Cast from TIMESTAMP_NTZ is stripped only when its session
    * zone is UTC (the engine pins it; under any other zone the cast shifts
    * the micros and the raw-column rewrite would be wrong). */
  private object NsOfMicros {
    private val Thousand = Literal(1000L, LongType)
    def unapply(e: Expression): Option[Expression] = e match {
      case Multiply(UnixMicros(inner), Thousand, _) => strip(inner)
      case Multiply(Thousand, UnixMicros(inner), _) => strip(inner)
      case _ => None
    }
    private def strip(e: Expression): Option[Expression] = e match {
      case Cast(inner, TimestampType, tz, _)
          if inner.dataType == TimestampNTZType && tz.forall(utcZone) =>
        Some(inner)
      case other if other.dataType == TimestampType => Some(other)
      case _ => None
    }
  }

  private def ceilDiv(a: Long, b: Long): Long = -Math.floorDiv(-a, b)

  /** Timestamp literal in the native column's type (both store µs longs). */
  private def usLit(us: Long, ts: Expression): Literal = Literal(us, ts.dataType)

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
    case GreaterThanOrEqual(NsOfMicros(ts), Literal(lo: Long, LongType)) =>
      Some(GreaterThanOrEqual(ts, usLit(ceilDiv(lo, 1000L), ts)))
    case LessThanOrEqual(NsOfMicros(ts), Literal(hi: Long, LongType)) =>
      Some(LessThanOrEqual(ts, usLit(Math.floorDiv(hi, 1000L), ts)))
    case GreaterThan(NsOfMicros(ts), Literal(lo: Long, LongType)) =>
      // us*1000 > lo ⟺ us > lo/1000 ⟺ us >= floor(lo/1000) + 1
      Some(GreaterThanOrEqual(ts, usLit(Math.floorDiv(lo, 1000L) + 1L, ts)))
    case LessThan(NsOfMicros(ts), Literal(hi: Long, LongType)) =>
      Some(LessThanOrEqual(ts, usLit(ceilDiv(hi, 1000L) - 1L, ts)))
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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => PushableTruncRange)
    ext.injectOptimizerRule(_ => FuzzyJoinRewrite)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // INSERT INTO a graftlake table → the OCC merge; must run in the
    // RESOLUTION batch, before DataSourceAnalysis turns the partitioned
    // insert into a raw file write (see GraftLakeInsert.scala)
    ext.injectResolutionRule(_ => graft.sources.GraftLakeInsertRule)
  }
}
