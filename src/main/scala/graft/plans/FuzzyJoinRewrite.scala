package graft.plans

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

/** Optimizer rule: a declarative fuzzy join
  *
  *   left.join(right, levenshtein(l.key, r.key) <= d)      (d ∈ {0, 1, 2})
  *
  * plans as a nested-loop cartesian — |L|·|R| levenshtein calls, the shape
  * that melts at any real scale. But the predicate has a lossless bucketed
  * form (FastSS deletion neighborhoods, the same math as
  * `Dedup.editDistancePairs`): ed(a,b) ≤ d guarantees the depth-d deletion
  * neighborhoods intersect, so joining on an EQUALITY of exploded
  * neighborhood-variant hashes reaches every qualifying pair, and the
  * original levenshtein conjunct (kept in place) discards the
  * overgenerated rest. This rule performs that rewrite INSIDE Catalyst,
  * so the user writes the declarative form and still gets the
  * shuffled-hash-join plan:
  *
  *   Project(L.output ++ R.output)
  *     Join hash(__h_l = __h_r), lev ≤ d, __h_l = first shared variant
  *       Generate(explode(sorted variant hashes))  Project(L ++ hashes)
  *       Generate(explode(sorted variant hashes))  Project(R ++ hashes)
  *
  * Row multiplicity is preserved WITHOUT a distinct: both variant arrays
  * ride their rows sorted, and the `__h = min(array_intersect(hs_l,
  * hs_r))` conjunct keeps exactly one bucket collision per row pair (the
  * smallest shared hash — ArrayMin is NULL on an empty intersection, so
  * reordered conjunct evaluation filters instead of throwing under
  * ANSI). Duplicate input rows keep their
  * multiplicity; NULL keys produce NULL variant arrays, which explode to
  * nothing — same as the levenshtein conjunct's NULL → false.
  *
  * Fires only on Inner/Cross joins whose condition has a
  * `levenshtein(l, r) <= lit` conjunct with one side from each input and
  * NO existing equi-join conjunct (if the join is already hash-keyed the
  * cartesian problem does not exist — and this also terminates the rule,
  * since the rewritten join is equi-keyed). d = 0 still buckets through
  * depth-1 neighborhoods (a superset; the kept conjunct tightens it). */
object FuzzyJoinRewrite extends Rule[LogicalPlan] {

  private val MaxDist = 2

  /** Sorted, distinct md5 hashes of the depth-d deletion neighborhood.
    * Built from RAW resolved Catalyst nodes — the Column API's
    * higher-order functions carry unresolved lambda variables, and an
    * optimizer rule runs after analysis, so injecting them would flip the
    * plan back to unresolved (PLAN_VALIDATION_FAILED_RULE_IN_BATCH). */
  private def variantHashes(strExpr: Expression, d: Int): Expression = {
    import org.apache.spark.sql.types.{BinaryType, IntegerType}
    def transformArr(arr: Expression, elemType: org.apache.spark.sql.types.DataType,
        f: Expression => Expression): Expression = {
      val v = NamedLambdaVariable("v", elemType, nullable = true)
      ArrayTransform(arr, LambdaFunction(f(v), Seq(v)))
    }
    val one = Literal(1)
    // {s} ∪ one-char deletions; empty string → just {s} (sequence(1,0)
    // would walk backward)
    def del1(s: Expression): Expression = {
      // Sequence is TimeZoneAwareExpression: it stays UNRESOLVED until the
      // zone is pinned (normally the analyzer's ResolveTimeZone does this;
      // an optimizer rule must do it itself)
      val deletions = transformArr(
        Sequence(one, Length(s), None,
          Some(conf.sessionLocalTimeZone)), IntegerType,
        i => Concat(Seq(
          Substring(s, one, Subtract(i, one)),
          Substring(s, Add(i, one), Subtract(Length(s), i)))))
      CaseWhen(
        Seq((EqualTo(Length(s), Literal(0)), CreateArray(Seq(s)))),
        Some(Concat(Seq(CreateArray(Seq(s)), deletions))))
    }
    val nb =
      if (d <= 1) del1(strExpr)
      else Flatten(transformArr(del1(strExpr), StringType, v => del1(v)))
    SortArray(ArrayDistinct(
      transformArr(nb, StringType, v => Md5(Cast(v, BinaryType)))),
      Literal(true))
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Orients (a, b) as (from-left, from-right) if each references exactly
    * one side. */
  private def fromSides(a: Expression, b: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression)] = {
    def onlyFrom(e: Expression, p: LogicalPlan): Boolean =
      e.references.nonEmpty && e.references.subsetOf(p.outputSet)
    if (onlyFrom(a, left) && onlyFrom(b, right)) Some((a, b))
    else if (onlyFrom(b, left) && onlyFrom(a, right)) Some((b, a))
    else None
  }

  private def intLit(e: Expression): Option[Int] = e match {
    case Literal(v: Int, _) => Some(v)
    case Literal(v: Long, _) if v.isValidInt => Some(v.toInt)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner | Cross, Some(cond), hint) =>
      val conjuncts = splitConjuncts(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) => fromSides(a, b, left, right).isDefined
        case EqualNullSafe(a, b) => fromSides(a, b, left, right).isDefined
        case _ => false
      }
      val fuzzy = conjuncts.collectFirst {
        case LessThanOrEqual(lev @ Levenshtein(a, b, None), dLit)
            if intLit(dLit).exists(d => d >= 0 && d <= MaxDist) &&
              a.dataType == StringType && b.dataType == StringType &&
              lev.deterministic &&
              fromSides(a, b, left, right).isDefined =>
          val (ls, rs) = fromSides(a, b, left, right).get
          (ls, rs, intLit(dLit).get)
        case LessThan(lev @ Levenshtein(a, b, None), dLit)
            if intLit(dLit).exists(d => d >= 1 && d <= MaxDist + 1) &&
              a.dataType == StringType && b.dataType == StringType &&
              lev.deterministic &&
              fromSides(a, b, left, right).isDefined =>
          val (ls, rs) = fromSides(a, b, left, right).get
          (ls, rs, intLit(dLit).get - 1)
      }
      if (hasEqui || fuzzy.isEmpty) j
      else {
        val (ls, rs, d) = fuzzy.get
        val depth = math.max(d, 1)
        def explodeSide(child: LogicalPlan, strExpr: Expression,
            tag: String): (LogicalPlan, Attribute, Attribute) = {
          val hsAlias = Alias(variantHashes(strExpr, depth), s"__graft_hs_$tag")()
          val proj = Project(child.output :+ hsAlias, child)
          val hAttr = AttributeReference(s"__graft_h_$tag", StringType)()
          val gen = Generate(Explode(hsAlias.toAttribute), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(hAttr), proj)
          (gen, hAttr, hsAlias.toAttribute)
        }
        val (genL, hL, hsL) = explodeSide(left, ls, "l")
        val (genR, hR, hsR) = explodeSide(right, rs, "r")
        // the smallest shared hash: ArrayMin over the intersection (both
        // arrays are distinct). An empty intersection yields NULL → the
        // equality filters the pair instead of throwing, so reordered
        // conjunct evaluation stays safe under ANSI
        val minShared = ArrayMin(ArrayIntersect(hsL, hsR))
        val newCond = (EqualTo(hL, hR) +: conjuncts :+ EqualTo(hL, minShared))
          .reduce(And)
        Project(left.output ++ right.output,
          Join(genL, genR, Inner, Some(newCond), hint))
      }
  }

  /** Install into an existing session (extensions apply at build time).
    * Idempotent. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(FuzzyJoinRewrite))
      spark.experimental.extraOptimizations = cur :+ FuzzyJoinRewrite
  }
}
