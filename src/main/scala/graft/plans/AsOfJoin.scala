package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Whole-operator Catalyst extension (SURVEY §4 "As-of join" v2 path;
  * guide pattern (c)): custom LogicalPlan + Strategy + physical operator.
  *
  * Semantics: for every left row, attach the right row with the greatest
  * `rightTs <= leftTs` within the same `user` key (or nulls) — DuckDB's
  * `ASOF LEFT JOIN`. The physical operator requires both children hash-
  * clustered by user and sorted by (user, ts), then streams a single
  * merge pass per partition: O(|L|+|R|), state = ONE buffered right row.
  *
  * 100 TB: this is the shape Spark's own sort-merge join uses — one hash
  * exchange + local sort per side, no candidate explosion for
  * high-frequency keys (contrast: the range-join rewrite buffers every
  * prior right row per left row).
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftUser: Attribute, leftTs: Attribute,
    rightUser: Attribute, rightTs: Attribute)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lu, lt, ru, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lu, lt, ru, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftUser: Expression, leftTs: Expression,
    rightUser: Expression, rightTs: Expression)
  extends BinaryExecNode {

  // the merge loop compares primitive longs; reject other key/ts types at
  // planning time instead of silently unboxing garbage at runtime
  require(Seq(leftUser, leftTs, rightUser, rightTs)
      .forall(_.dataType == org.apache.spark.sql.types.LongType),
    s"AsOfJoinExec supports LongType key/ts columns, got: " +
      Seq(leftUser, leftTs, rightUser, rightTs).map(_.dataType).mkString(", "))

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftUser)), ClusteredDistribution(Seq(rightUser)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftUser, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightUser, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftUser, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lUser = BindReferences.bindReference(leftUser, left.output)
    val lTs = BindReferences.bindReference(leftTs, left.output)
    val rUser = BindReferences.bindReference(rightUser, right.output)
    val rTs = BindReferences.bindReference(rightTs, right.output)
    val rightWidth = right.output.length
    val outAttrs = output
    val leftOut = left.output
    val rightOut = right.output

    left.execute().zipPartitions(right.execute()) { (le, ri) =>
      // bind against nullable right attrs: the null-extension row flows
      // through this projection, so the input schema must admit nulls even
      // when the right child's columns are declared non-nullable
      val project = UnsafeProjection.create(
        outAttrs, leftOut ++ rightOut.map(_.withNullability(true)))
      val nulls = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      var rHead: InternalRow = if (ri.hasNext) ri.next() else null
      var carry: InternalRow = null
      var carryUser: Long = Long.MinValue
      def nextRight(): InternalRow = if (ri.hasNext) ri.next() else null
      le.map { e =>
        val eUserB = lUser.eval(e)
        val eTsB = lTs.eval(e)
        if (eUserB == null || eTsB == null) {
          // SQL join semantics: a null key matches nothing
          project(joined(e, nulls))
        } else {
          val eUser = eUserB.asInstanceOf[Long]
          val eTs = eTsB.asInstanceOf[Long]
          // advance the right side up to (user, ts); keep only the latest.
          // Null right keys/timestamps sort first (NULLS FIRST ordering) and
          // can never match — skip past them.
          var advancing = true
          while (advancing && rHead != null) {
            val ruB = rUser.eval(rHead)
            val rtB = if (ruB == null) null else rTs.eval(rHead)
            if (ruB == null || (rtB == null && ruB.asInstanceOf[Long] <= eUser)) {
              rHead = nextRight()
            } else {
              val ru = ruB.asInstanceOf[Long]
              if (ru < eUser ||
                  (ru == eUser && rtB.asInstanceOf[Long] <= eTs)) {
                if (ru == eUser) { carry = rHead.copy(); carryUser = ru }
                rHead = nextRight()
              } else advancing = false
            }
          }
          val matched = carry != null && carryUser == eUser
          project(joined(e, if (matched) carry else nulls))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public entry: `AsOf.join(left, right, "user_id", "ts", ...)`. */
object AsOf {
  def join(spark: SparkSession, left: DataFrame, right: DataFrame,
      leftUser: String, leftTs: String,
      rightUser: String, rightTs: String): DataFrame = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${p.output.map(_.name)}"))
    GraftBridge.ofRows(spark, AsOfJoinNode(lp, rp,
      attr(lp, leftUser), attr(lp, leftTs), attr(rp, rightUser), attr(rp, rightTs)))
  }
}
