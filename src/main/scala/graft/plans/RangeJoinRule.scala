package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: keyless interval joins rewritten to bin-equi form.
  *
  * A join whose only cross-side predicates are `p >= lo AND p <= hi`
  * (no equality between the sides anywhere) leaves Spark nothing to
  * hash on, so the planner emits a broadcast nested loop — every
  * point row compared against every interval row, O(|P|·|I|), the
  * scale killer [[graft.Util.binnedIntervalJoin]] exists to avoid.
  * This rule applies the same rewrite AUTOMATICALLY at the logical
  * level, so plain `a.join(b, $"p" >= $"lo" && $"p" <= $"hi")` (or
  * its SQL form) gets the scalable plan without the caller knowing
  * the helper exists:
  *
  *   - the point side gains a `__graft_bin = floor(p / w)` column;
  *   - the interval side explodes into one row per covered bin
  *     (`sequence(floor(lo/w), floor(hi/w))` — ~(hi−lo)/w + 1 rows);
  *   - the join becomes an EQUI join on the bin conjoined with the
  *     ORIGINAL predicates (exactness never depends on `w`), and a
  *     final Project restores the original output, so the rewrite is
  *     invisible to everything downstream.
  *
  * Fires only on INNER joins whose every cross-side conjunct is one
  * of the two range bounds, with integral-typed operands (dates:
  * `datediff` first). Self-inhibiting: the rewritten join contains a
  * cross-side equality, which the guard rejects.
  *
  * OPT-IN: the rule is inert until `spark.graft.rangeJoin.binWidth`
  * is set (>0) — the caller must choose a width near the typical
  * interval length, because a width far below it makes each interval
  * explode into length/width bin rows (a one-day interval in
  * epoch-millis at width 16 would be ~5.4M rows — the rewrite would
  * turn a slow-but-correct nested loop into a blowup). Width tunes
  * balance and explode volume, never results. A malformed value is
  * treated as unset. Install via
  * `spark.sql.extensions=graft.functions.GraftExtensions` (then set
  * the conf) or `GraftFunctions.installRangeJoin(spark, binWidth)`,
  * which does both.
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val WidthKey = "spark.graft.rangeJoin.binWidth"

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** All (point, bound, pointIsMin) readings of a range comparison
    * whose operands sit on OPPOSITE sides. A single `a >= b` yields
    * BOTH readings — (a, b, min) and (b, a, max) — because which
    * operand is "the point" is only decided later by grouping: the
    * expression bounded from both below and above wins. This is what
    * lets `lo <= p && hi >= p` (point on the right) fire the same as
    * `p >= lo && p <= hi`. Safe regardless of which group wins: the
    * rewrite keeps every original conjunct and only adds a bin
    * equality, so any point/bound assignment is semantics-preserving. */
  private def crossBound(e: Expression, left: LogicalPlan,
      right: LogicalPlan): Seq[(Expression, Expression, Boolean)] = {
    def sides(a: Expression, b: Expression): Boolean =
      a.references.nonEmpty && b.references.nonEmpty &&
        ((a.references.subsetOf(left.outputSet) &&
          b.references.subsetOf(right.outputSet)) ||
          (a.references.subsetOf(right.outputSet) &&
            b.references.subsetOf(left.outputSet)))
    e match {
      case GreaterThanOrEqual(a, b) if sides(a, b) =>
        Seq((a, b, true), (b, a, false))
      case LessThanOrEqual(a, b) if sides(a, b) =>
        Seq((a, b, false), (b, a, true))
      case _ => Nil
    }
  }

  private def bin(e: Expression, w: Long): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w.toDouble))), LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // unset or malformed → inert (never fail someone's session over a
    // tuning knob)
    val w = conf.getConfString(WidthKey, "")
      .toLongOption.filter(_ > 0).getOrElse(return plan)
    plan transform {
      case j @ Join(left, right, Inner, Some(cond), hint) if j.resolved =>
        val conjuncts = splitConjunctivePredicates(cond)
        val cross = conjuncts.filter(c =>
          c.references.intersect(left.outputSet).nonEmpty &&
            c.references.intersect(right.outputSet).nonEmpty)
        val bounds = cross.map(crossBound(_, left, right))
        // every cross-side conjunct must be a range bound (any
        // equality or other shape → Spark can already hash → leave it)
        if (cross.isEmpty || bounds.exists(_.isEmpty)) j
        else {
          val bs = bounds.flatten
          // exactly one point expression, bounded from below and above
          val byPoint = bs.groupBy(_._1.canonicalized)
          val candidate = byPoint.values.find(g =>
            g.exists(_._3) && g.exists(!_._3) && g.forall(t =>
              integral(t._1) && integral(t._2)))
          candidate match {
            case None => j
            case Some(g) =>
              val p = g.head._1
              val lo = g.find(_._3).get._2
              val hi = g.find(!_._3).get._2
              // all bounds must sit on ONE side, p on the other
              val pOnLeft = p.references.subsetOf(left.outputSet)
              val boundsOk = Seq(lo, hi).forall(b =>
                if (pOnLeft) b.references.subsetOf(right.outputSet)
                else b.references.subsetOf(left.outputSet))
              if (!boundsOk) j
              else {
                val (points, intervals) =
                  if (pOnLeft) (left, right) else (right, left)
                val pBin = Alias(bin(p, w), "__graft_bin_p")()
                val pointsPlan = Project(points.output :+ pBin, points)
                // Sequence is TimeZoneAwareExpression: without an
                // explicit zone it reports unresolved even for longs
                val gen = Explode(new Sequence(bin(lo, w), bin(hi, w),
                  None, Some(conf.sessionLocalTimeZone)))
                val genOut = AttributeReference("__graft_bin_i",
                  LongType, nullable = gen.elementSchema.head.nullable)()
                val intervalsPlan = Generate(gen,
                  unrequiredChildIndex = Nil, outer = false,
                  qualifier = None, generatorOutput = Seq(genOut),
                  child = intervals)
                val newCond = (EqualTo(pBin.toAttribute, genOut) +:
                  conjuncts).reduce(And)
                val (nl, nr) =
                  if (pOnLeft) (pointsPlan, intervalsPlan)
                  else (intervalsPlan, pointsPlan)
                Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
              }
          }
        }
    }
  }
}
