package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.DatasetBridge

/** As-of join as a first-class operator through the full Catalyst stack
  * (SURVEY §3 path (c)): logical node → planner strategy → physical
  * sort-merge exec. Spark plans the key exchange + (key, ts) sort from
  * the exec's required distribution/ordering; `doExecute` is a single
  * forward merge per partition — the textbook as-of algorithm, no range
  * blow-up, O(|L|+|R|) per partition after the one shuffle.
  *
  * v1 contract: key and ts are non-null LongType on both sides (the
  * events use case); right columns come back null when no right row is
  * at-or-before the left timestamp. The composable union+window
  * formulation in `operators.AsOfJoin` is the differential oracle.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTs: Attribute, rightTs: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTs: Attribute, rightTs: Attribute) extends BinaryExecNode {
  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lKeyOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTsOrd = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rKeyOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTsOrd = right.output.indexWhere(_.exprId == rightTs.exprId)
    val nRight = right.output.size
    val schema = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = InternalRow.fromSeq(Seq.fill[Any](nRight)(null))
      val toUnsafe = UnsafeProjection.create(schema, schema)
      var cand: InternalRow = null  // last right row with candKey, ts <= current left ts
      var candKey = 0L
      var ahead: InternalRow = null // buffered right row not yet eligible
      lIter.map { l =>
        val lk = l.getLong(lKeyOrd)
        val lt = l.getLong(lTsOrd)
        // consume right side while eligible (key behind, or same key and ts <= lt)
        var continue = true
        while (continue) {
          if (ahead == null && rIter.hasNext) ahead = rIter.next().copy()
          if (ahead == null) continue = false
          else {
            val rk = ahead.getLong(rKeyOrd)
            val rt = ahead.getLong(rTsOrd)
            if (rk < lk) { ahead = null } // dead right row: its key already passed
            else if (rk == lk && rt <= lt) { cand = ahead; candKey = rk; ahead = null }
            else continue = false
          }
        }
        val r = if (cand != null && candKey == lk) cand else nullRight
        toUnsafe(joined(l, r))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

object AsOfJoinPlan {

  /** As-of join two DataFrames on long `key`/`ts` columns. Right columns
    * are re-aliased with `prefix` (fresh exprIds — safe for self-joins
    * over the same source). Registers the strategy on the session
    * (idempotent; cluster deployments use GraftExtensions instead). */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           prefix: String = "r_"): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    }
    val lp = left.queryExecution.analyzed
    val rAnalyzed = right.queryExecution.analyzed
    // fresh exprIds + prefixed names on the right side
    val aliases = rAnalyzed.output.map(a => Alias(a, prefix + a.name)())
    val rp = Project(aliases, rAnalyzed)
    val rOut = rp.output
    def attr(out: Seq[Attribute], name: String): Attribute =
      out.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    DatasetBridge.ofRows(spark,
      AsOfJoinNode(lp, rp,
        attr(lp.output, key), attr(rOut, prefix + key),
        attr(lp.output, ts), attr(rOut, prefix + ts)))
  }
}
