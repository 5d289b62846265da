package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** The full custom-operator stack (SURVEY.md §2 preference (c)): a logical
  * node + planner strategy + physical operator for gap-based session
  * numbering, registered through [[GraftExtensions]] (or imperatively via
  * [[Sessionize.withSessionNo]], which also covers driver-built sessions).
  *
  * WHY a custom operator: the compositional form (q_sessionize) needs TWO
  * window passes over the same (user, ts) sort — a lag() pass to flag
  * boundaries, then a running-sum pass to number them. The sessionize
  * semantics are a single forward sweep with O(1) state; [[SessionizeExec]]
  * does exactly that — one hash exchange on the user key, one sort, one
  * pass — and Catalyst plans it like any built-in: requiredChildDistribution
  * /-Ordering drive the exchange+sort, so if the child is already
  * partitioned/sorted (e.g. bucketed-sorted storage at 100 TB) both are
  * elided and sessionization runs at scan speed with zero shuffles.
  *
  * Semantics (identical to q_sessionize's lag formulation, same DuckDB
  * oracle): rows are grouped by `user`, ordered by (`tsUs`, `tie`);
  * session_no starts at 1 per user and increments when the gap to the
  * previous row exceeds `gapUs` microseconds STRICTLY. */
case class SessionizeNode(
    user: Attribute,
    tsUs: Attribute,
    tie: Attribute,
    gapUs: Long,
    child: LogicalPlan,
    sessionAttr: AttributeReference =
      AttributeReference("session_no", LongType, nullable = false)())
  extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ sessionAttr

  // session_no is produced here, not read from the child
  override def producedAttributes: AttributeSet = AttributeSet(sessionAttr)

  override protected def withNewChildInternal(newChild: LogicalPlan): SessionizeNode =
    copy(child = newChild)
}

/** Plans [[SessionizeNode]] as [[SessionizeExec]]. */
object SessionizeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case s: SessionizeNode =>
      SessionizeExec(s.user, s.tsUs, s.tie, s.gapUs, s.sessionAttr,
        planLater(s.child)) :: Nil
    case _ => Nil
  }
}

/** One-pass session numbering over a clustered+sorted child: the required
  * distribution/ordering make Catalyst insert (or elide) the exchange and
  * sort; the operator itself is a stateful map with O(1) state per
  * partition — the same sweep the MapReduce reference would hand-roll in a
  * reducer, expressed as a first-class physical operator. */
case class SessionizeExec(
    user: Attribute,
    tsUs: Attribute,
    tie: Attribute,
    gapUs: Long,
    sessionAttr: Attribute,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ sessionAttr

  override def producedAttributes: AttributeSet = AttributeSet(sessionAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(user)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(user, Ascending), SortOrder(tsUs, Ascending),
      SortOrder(tie, Ascending)))

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val userIdx = childOutput.indexWhere(_.exprId == user.exprId)
    val tsIdx = childOutput.indexWhere(_.exprId == tsUs.exprId)
    require(userIdx >= 0 && tsIdx >= 0,
      s"sessionize inputs not found in child output: $childOutput")
    val userType = user.dataType
    val gap = gapUs
    val out = output
    child.execute().mapPartitions({ iter =>
      val proj = UnsafeProjection.create(out, childOutput :+ sessionAttr)
      val joined = new JoinedRow
      val sessRow = new GenericInternalRow(1)
      var curUser: Any = null
      var started = false
      var prevTs = 0L
      var sess = 0L
      iter.map { row =>
        val u = row.get(userIdx, userType)
        val t = row.getLong(tsIdx)
        if (!started || u != curUser) {
          started = true; curUser = u; sess = 1L
        } else if (t - prevTs > gap) {
          sess += 1
        }
        prevTs = t
        sessRow.setLong(0, sess)
        proj(joined(row, sessRow))
      }
    }, preservesPartitioning = true)
  }

  protected def withNewChildInternal(newChild: SparkPlan): SessionizeExec =
    copy(child = newChild)
}

/** DataFrame-level entry point. */
object Sessionize {

  /** Append a `session_no` column: sessions per `user` column, ordered by
    * the BIGINT epoch-microsecond column `tsUs` (ties broken by `tie`),
    * with a new session when the gap exceeds `gapUs` strictly. Injects the
    * planner strategy idempotently, so it works on sessions built without
    * [[GraftExtensions]] (e.g. the grading driver's). */
  def withSessionNo(df: DataFrame, user: String, tsUs: String, tie: String,
      gapUs: Long): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!spark.experimental.extraStrategies.contains(SessionizeStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ SessionizeStrategy
    val lp = df.queryExecution.analyzed
    def attr(n: String): Attribute = lp.output
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${lp.output.map(_.name)}"))
    org.apache.spark.sql.graftbridge.GraftPlanBridge.ofRows(spark,
      SessionizeNode(attr(user), attr(tsUs), attr(tie), gapUs, lp))
  }
}
