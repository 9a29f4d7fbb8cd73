package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Optimizer rule: plan band (range) joins as bucketed equi-joins.
  *
  * A user writing the natural form of a range join —
  * `a.join(b, abs(a.ts - b.ts) <= w)` — gets a BroadcastNestedLoopJoin
  * from vanilla Spark: with no equi-conjunct there is nothing to hash on,
  * so every left row is compared against every right row. At 100 TB that
  * plan never finishes. The semantics are perfectly expressible with
  * built-ins (that IS the expression); only the physical strategy is
  * catastrophic — exactly the situation for an injected optimizer rule
  * rather than a custom operator.
  *
  * The rewrite is the same time-bucket trick `join_range` applies by hand
  * (operators/Relational.scala): bucket both sides by the band width,
  * explode the LEFT side into its three adjacent buckets, and join on
  * bucket equality with the original predicate kept as the residual.
  * Every qualifying pair satisfies ⌊x/w⌋ − ⌊y/w⌋ ∈ {−1, 0, 1}, so it
  * matches in EXACTLY one bucket: no duplicates, no lost rows, and the
  * join becomes a hash/sort-merge join on a fine-grained key. (Truncating
  * division makes bucket 0 span (−w, w) — twice as wide — which keeps
  * the adjacency invariant; width below w would break it.)
  *
  * The rule fires only when the join has NO equi-conjunct of its own (the
  * BroadcastNestedLoopJoin case). A band join that already carries an
  * equality — `a.user === b.user && abs(…) <= w` — hashes on the user key
  * today; rewriting it would also help its hot keys, but that is a cost
  * call the engine leaves to the explicit `join_range` formulation. The
  * rewritten join contains a bucket equality, so the guard also makes the
  * rule idempotent.
  *
  * Two injection routes (both covered in RangeJoinRewriteSpec):
  * `spark.experimental.extraOptimizations` at runtime, or
  * `spark.sql.extensions=graft.GraftExtensions` at session build.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def isIntegral(t: DataType): Boolean =
    t == IntegerType || t == LongType

  private def litLong(v: Any, t: DataType): Long = v match {
    case i: Int  => i.toLong
    case l: Long => l
    case _       => 0L
  }

  /** abs(x − y) <= w (or w >= abs(x − y)) with an integral positive
    * literal w → (x, y, w). */
  private object BandCond {
    def unapply(e: Expression): Option[(Expression, Expression, Long)] = e match {
      case LessThanOrEqual(a: Abs, Literal(w, t)) if isIntegral(t) =>
        diff(a.child).map { case (x, y) => (x, y, litLong(w, t)) }
      case GreaterThanOrEqual(Literal(w, t), a: Abs) if isIntegral(t) =>
        diff(a.child).map { case (x, y) => (x, y, litLong(w, t)) }
      case _ => None
    }
    private def diff(e: Expression): Option[(Expression, Expression)] = e match {
      case s: Subtract => Some((s.left, s.right))
      case _           => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEquiKey = conjuncts.exists {
        case EqualTo(a, b) =>
          (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
          (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
        case _ => false
      }
      val band = conjuncts.collectFirst {
        case BandCond(x, y, w)
            if w > 0 && isIntegral(x.dataType) && isIntegral(y.dataType) &&
              x.references.subsetOf(left.outputSet) &&
              y.references.subsetOf(right.outputSet) =>
          (x, y, w)
        case BandCond(x, y, w)
            if w > 0 && isIntegral(x.dataType) && isIntegral(y.dataType) &&
              x.references.subsetOf(right.outputSet) &&
              y.references.subsetOf(left.outputSet) =>
          (y, x, w)
      }
      if (hasEquiKey || band.isEmpty) j
      else {
        val (lExpr, rExpr, w) = band.get
        val wLit = Literal(w)
        val off = AttributeReference("__graft_off", LongType, nullable = false)()
        val exploded = Generate(
          Explode(CreateArray(Seq(Literal(-1L), Literal(0L), Literal(1L)))),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(off), child = left)
        val lBucket = Alias(
          Add(IntegralDivide(Cast(lExpr, LongType), wLit), off), "__graft_lb")()
        val rBucket = Alias(
          IntegralDivide(Cast(rExpr, LongType), wLit), "__graft_rb")()
        val lProj = Project(left.output :+ lBucket, exploded)
        val rProj = Project(right.output :+ rBucket, right)
        val newCond = And(EqualTo(lBucket.toAttribute, rBucket.toAttribute), cond)
        Project(j.output, Join(lProj, rProj, Inner, Some(newCond), j.hint))
      }
  }
}
