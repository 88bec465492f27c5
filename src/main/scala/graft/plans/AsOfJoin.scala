package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join: for every left row, the latest right row with the
  * same key and time <= the left row's time (ASOF LEFT JOIN; backward
  * direction), or with `forward = true` the EARLIEST right row with
  * time >= the left row's time. An optional `tolerance` (same units as
  * the time columns; negative = unlimited) bounds the match gap — the
  * full pandas merge_asof surface (direction + tolerance).
  *
  * The full custom-operator tier (SURVEY.md §7.2 / guide tier c):
  * logical node → planner strategy → physical exec, registered through
  * SparkSessionExtensions (graft.functions.GraftExtensions). The
  * physical plan declares hash distribution on the key and (key, time)
  * ordering, so Catalyst plans exactly one shuffle + sort per side and
  * the join itself is a streaming two-pointer merge per partition —
  * no window state, no per-row buffering beyond one build row (the
  * forward direction buffers NOTHING: its match is the lookahead row
  * itself, never consumed past).
  *
  * Keys and times must evaluate to Long (covers the id/epoch shapes;
  * the composed window formulation in Relational2 stays the generic
  * fallback). Left and right must not share attribute ids (alias the
  * right side of a self-join).
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    forward: Boolean = false, tolerance: Long = -1L) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Column pruning through the custom node: Catalyst's ColumnPruning
  * doesn't know AsOfJoin, so without this rule a Project above it
  * still scans every column of both sides. Pushes per-side Projects
  * keeping only referenced attributes + the key/time columns —
  * CollapseProject then folds them into the scans (ReadSchema
  * shrinks, which is the whole game on a wide 100 TB fact table). */
object PruneAsOfJoinColumns
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projectList,
        aj @ AsOfJoin(l, r, lk, rk, lt, rt, _, _)) =>
      val used = AttributeSet(projectList.flatMap(_.references)) ++
        AttributeSet(Seq(lk, rk, lt, rt).flatMap(_.references))
      val keepL = l.output.filter(used.contains)
      val keepR = r.output.filter(used.contains)
      if (keepL.length < l.output.length || keepR.length < r.output.length)
        Project(projectList,
          aj.copy(left = Project(keepL, l), right = Project(keepR, r)))
      else p
  }
}

object AsOfStrategy extends SparkStrategy {
  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, fwd, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, fwd, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    forward: Boolean = false, tolerance: Long = -1L) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val rightWidth = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        private val nullRight = new GenericInternalRow(rightWidth)
        // NOTE declaration order: the key/time fields must initialize
        // BEFORE rNext, whose initializer (advanceRight) assigns them —
        // later field initializers would overwrite the captured values
        private var rNextKey: Long = 0L
        private var rNextTime: Long = 0L
        // latest right row at-or-before the probe cursor, per key
        // (backward direction only; forward matches the lookahead)
        private var matchRow: InternalRow = _
        private var matchKey: Long = 0L
        private var matchTime: Long = 0L
        // one-row lookahead on the build side
        private var rNext: InternalRow = advanceRight()

        private def advanceRight(): InternalRow = {
          while (rIter.hasNext) {
            val r = rIter.next()
            val k = rk.eval(r); val t = rt.eval(r)
            if (k != null && t != null) {
              rNextKey = k.asInstanceOf[Long]
              rNextTime = t.asInstanceOf[Long]
              return r
            }
          }
          null
        }

        def hasNext: Boolean = lIter.hasNext

        def next(): InternalRow = {
          val l = lIter.next()
          val kAny = lk.eval(l)
          val tAny = lt.eval(l)
          // null key or null time never matches (ASOF SQL semantics) —
          // an unboxed null would otherwise read as 0 and match t<=0 rows
          if (kAny == null || tAny == null) return joined(l, nullRight)
          val k = kAny.asInstanceOf[Long]
          val t = tAny.asInstanceOf[Long]
          if (forward) {
            // consume build rows strictly before (k, t); the match is
            // then the lookahead itself — earliest time >= t. It is
            // NEVER consumed here: a later probe with the same (k, t)
            // (or a larger t that it still satisfies) reuses it.
            while (rNext != null &&
                (rNextKey < k || (rNextKey == k && rNextTime < t))) {
              rNext = advanceRight()
            }
            if (rNext != null && rNextKey == k &&
                (tolerance < 0L || rNextTime - t <= tolerance))
              joined(l, rNext)
            else joined(l, nullRight)
          } else {
            // consume build rows up to (k, t]
            while (rNext != null &&
                (rNextKey < k || (rNextKey == k && rNextTime <= t))) {
              matchRow = rNext.copy() // buffer outlives the iterator's row reuse
              matchKey = rNextKey
              matchTime = rNextTime
              rNext = advanceRight()
            }
            if (matchRow != null && matchKey == k &&
                (tolerance < 0L || t - matchTime <= tolerance))
              joined(l, matchRow)
            else joined(l, nullRight)
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOf {
  /** ASOF LEFT JOIN left/right on key columns with time columns; all
    * four must be Long-typed (ids / epoch seconds).
    *
    * `direction`: "backward" (latest right time <= left time, the
    * default) or "forward" (earliest right time >= left time).
    * `tolerance`: max |gap| in the time columns' own units; negative =
    * unlimited. The pandas merge_asof parameter surface.
    *
    * Determinism contract: the build (right) side must be UNIQUE on
    * (key, time). The exec sorts the build side on (key, time) only,
    * so with duplicates the match is whichever duplicate that sort
    * happens to emit first (forward) / last (backward) — unpinned
    * across runs and partitionings, same as DuckDB ASOF's arbitrary
    * tie choice. Dedup upstream (one hash-agg picking a deterministic
    * survivor, as Relational2.uniquePurchases does) rather than paying
    * a tertiary sort key on every build row here. */
  def join(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      direction: String = "backward", tolerance: Long = -1L): DataFrame = {
    val fwd = direction match {
      case "backward" => false
      case "forward"  => true
      case other => throw new IllegalArgumentException(
        s"as-of direction must be 'backward' or 'forward', got '$other'")
    }
    val lp = GraftShims.analyzed(leftDf)
    val rp = GraftShims.analyzed(rightDf)
    def a(p: LogicalPlan, n: String): Attribute = {
      val attr = p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column '$n' not in [${p.output.map(_.name).mkString(", ")}]"))
      require(attr.dataType == org.apache.spark.sql.types.LongType,
        s"as-of join column '$n' must be LONG (ids/epoch), got ${attr.dataType}")
      attr
    }
    require(lp.outputSet.intersect(rp.outputSet).isEmpty,
      "as-of join sides must not share attributes — alias the right side")
    GraftShims.ofRows(leftDf.sparkSession,
      AsOfJoin(lp, rp, a(lp, leftKey), a(rp, rightKey),
        a(lp, leftTime), a(rp, rightTime), fwd, tolerance))
  }
}
