package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: rewrite a KEY-LESS point-in-interval join
  * `L ⋈ R ON R.lo <= L.p AND L.p <= R.hi` (which Spark can only plan as a
  * cartesian / broadcast-nested-loop — quadratic when both sides are
  * fact-sized) into the classic BINNED equi-join:
  *
  *   L' = L + bin(p);  R' = R × explode(sequence(bin(lo), bin(hi)))
  *   L' ⋈ R' ON L'.bin = R'.bin AND lo <= p AND p <= hi
  *
  * The equi-conjunct lets the planner pick a hash-partitioned
  * SortMergeJoin: work becomes O(rows ⋅ intervals-per-bin) instead of
  * O(|L|⋅|R|), shuffles key on the bin, and skew is bounded by the bin
  * width. Interval replication to every bin it overlaps is the same
  * technique distributed interval-join engines use.
  *
  * Scoped deliberately: fires only on an Inner join whose ENTIRE
  * condition is exactly that conjunction over LongType columns (our
  * epoch-µs convention) with p from the left and lo/hi from the right —
  * and never re-fires on its own output (the rewritten condition gains
  * an equality conjunct, so the pattern no longer matches).
  *
  * Installed per-session via `spark.experimental.extraOptimizations`
  * (the runtime-injectable hook; `SparkSessionExtensions
  * .injectOptimizerRule` is the builder-time equivalent).
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] {

  /** Bin width: 6 h in epoch-µs. A production rule would derive this
    * from interval-length statistics; a constant keeps the demo honest.
    */
  val binWidthUs: Long = 6L * 3600 * 1000000

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(left, right, Inner, Some(And(
          GreaterThanOrEqual(p1, lo), LessThanOrEqual(p2, hi))), hint)
        if p1.semanticEquals(p2) &&
          p1.dataType == LongType && lo.dataType == LongType &&
          hi.dataType == LongType &&
          p1.references.subsetOf(left.outputSet) &&
          lo.references.subsetOf(right.outputSet) &&
          hi.references.subsetOf(right.outputSet) =>
      val w = Literal(binWidthUs, LongType)
      // left: bin(p) — integral division (doubles lose µs above 2^53)
      val lBin = Alias(IntegralDivide(p1, w), "__l_bin")()
      val lProj = Project(left.output :+ lBin, left)
      // right: one row per overlapped bin
      // Sequence is TimeZoneAwareExpression: a None zone leaves it
      // UNRESOLVED and the optimizer's plan-integrity check rejects the
      // rewrite — set the session zone even though LongType ignores it
      // guard degenerate intervals (ADVICE r3): an ascending Sequence with
      // start > stop THROWS at runtime, whereas the unrewritten join just
      // emits zero rows for a lo > hi (or null-bounded) interval — keep
      // that behavior by generating an empty bin array instead
      val bins = If(LessThanOrEqual(lo, hi),
        Sequence(IntegralDivide(lo, w), IntegralDivide(hi, w),
          Some(Literal(1L, LongType)), Some(conf.sessionLocalTimeZone)),
        Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
      val rBin = AttributeReference("__r_bin", LongType, nullable = false)()
      val rGen = Generate(Explode(bins), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(rBin),
        child = right)
      val cond = And(EqualTo(lBin.toAttribute, rBin),
        And(GreaterThanOrEqual(p1, lo), LessThanOrEqual(p2, hi)))
      Project(j.output, Join(lProj, rGen, Inner, Some(cond), hint))
  }
}
