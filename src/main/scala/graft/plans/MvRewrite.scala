package graft.plans

import java.util.concurrent.ConcurrentHashMap
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}
import org.apache.spark.sql.types.DataType

/** B69: materialized-view auto-rewrite.
  *
  * A20 already MAINTAINS pre-aggregated tables incrementally; this is
  * the missing consumption half: a Catalyst rule that recognizes an
  * aggregate over the BASE table whose answer is derivable from a
  * registered MV and silently re-points the plan at the MV — the
  * query text keeps naming the base table, the plan reads the rollup.
  * At 100 TB the rewrite turns a full fact-table scan into a scan of
  * a table ~|distinct group keys| rows long.
  *
  * Soundness model: the rewrite is algebraic, not temporal — it is
  * correct exactly when the MV's contents equal `build(...)` over the
  * CURRENT base data, which is the registrant's contract to maintain
  * (via A20's incremental maintenance or full rebuild). Derivations
  * used, all exact:
  *   SUM(x)   = SUM(mv.sum_x)        (decimal/long partials re-add
  *                                    associatively; the builder is
  *                                    the same expression, so double
  *                                    bases should register a
  *                                    DECIMAL-cast sum — dsum style)
  *   COUNT(*) = SUM(mv.cnt)          (coalesced to 0 for empty MV)
  *   COUNT(x) = SUM(mv.cnt_x)
  *   MIN(x)   = MIN(mv.min_x),  MAX(x) = MAX(mv.max_x)
  * Grouping may be any SUBSET of the MV's group columns (roll-up), and
  * one Filter is allowed when it references grouping columns only.
  * Anything else — residual measures, DISTINCT, agg-level FILTER
  * clauses, non-group predicates — declines and the base plan runs
  * unchanged.
  */
object GraftMv {

  sealed trait Measure extends Serializable
  /** sum over `col`, optionally pre-cast (register DECIMAL casts for
    * double money columns so partial re-addition stays order-exact). */
  case class MvSum(col: String, castTo: Option[DataType] = None) extends Measure
  case object MvCount extends Measure
  case class MvCountCol(col: String) extends Measure
  case class MvMin(col: String) extends Measure
  case class MvMax(col: String) extends Measure

  case class MvDef(basePath: String, mvPath: String,
      groupCols: Seq[String], measures: Seq[(String, Measure)])

  /** normalized base path → MV definition. Only the DEFINITION is
    * cached: the MV's relation is re-resolved at rewrite time, so a
    * maintenance swap that overwrites the MV path (mergeRollups
    * rebuild, G17's applyMvBatch) is picked up by the very next
    * rewritten query — a registration-time relation would pin the
    * file listing of the registration instant and serve
    * FileNotFoundException (or stale data) after the swap.
    */
  private val registry = new ConcurrentHashMap[String, MvDef]()

  def normalize(p: String): String = new Path(p).toUri.getPath

  def isEmpty: Boolean = registry.isEmpty

  def clear(): Unit = registry.clear()

  /** Rewrite suppression for MAINTENANCE: a full rebuild aggregates
    * the registered base in exactly the registered shape, so the rule
    * would rewrite the rebuild onto the MV itself — the refresh would
    * copy the stale rollup instead of re-reading the base. Every
    * maintenance execution runs inside `withoutRewrite` (thread-local:
    * plan optimization happens on the action's calling thread).
    */
  private val suppressed = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }
  private[plans] def isSuppressed: Boolean = suppressed.get()
  def withoutRewrite[T](f: => T): T = {
    val prev = suppressed.get()
    suppressed.set(true)
    try f finally suppressed.set(prev)
  }

  /** The MV contents over an arbitrary input frame — build, register
    * and incremental maintenance all share this, so the stored rollup
    * can never drift from what the rule assumes.
    */
  def mvFrameOf(input: DataFrame, d: MvDef): DataFrame = {
    val aggs = d.measures.map {
      case (name, MvSum(c, castTo)) =>
        sum(castTo.map(t => col(c).cast(t)).getOrElse(col(c))).as(name)
      case (name, MvCount) => count(lit(1)).as(name)
      case (name, MvCountCol(c)) => count(col(c)).as(name)
      case (name, MvMin(c)) => min(col(c)).as(name)
      case (name, MvMax(c)) => max(col(c)).as(name)
    }
    input.groupBy(d.groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  def mvFrame(spark: SparkSession, d: MvDef): DataFrame =
    mvFrameOf(graft.sources.GraftIO.readParquet(spark, d.basePath), d)

  /** Maintain a rollup from an A30 CHANGE FEED (delete+insert rows
    * tagged `change_type`): inserts contribute +1-signed measures,
    * deletes −1-signed, the signed delta rollup merges into the old
    * MV, and groups whose row count reaches zero drop out — so a
    * COW merge's feed keeps the MV exact without ever rescanning the
    * base (feed cost ∝ churn; the spec proves applyFeed ≡ rebuild
    * across updates, cross-group moves and inserts). Only ADDITIVE
    * measures qualify: sums and counts invert under deletes; MIN/MAX
    * do not (a deleted extremum needs a group rescan), so feed-based
    * maintenance refuses definitions carrying them — use the
    * diff-based `mergeRollups` path (append-only) or rebuild.
    * Requires an MvCount measure: it is the group-liveness witness.
    */
  def applyFeed(mv: DataFrame, feed: DataFrame, d: MvDef): DataFrame = {
    require(d.measures.forall {
      case (_, _: MvMin) | (_, _: MvMax) => false
      case _ => true
    }, "[GRAFT] MIN/MAX measures are not maintainable from a change feed")
    val countCol = d.measures.collectFirst { case (n, MvCount) => n }.getOrElse(
      throw new IllegalArgumentException(
        "[GRAFT] feed maintenance needs an MvCount measure as the liveness witness"))
    val sign = org.apache.spark.sql.functions
      .when(col("change_type") === "insert", 1L).otherwise(-1L)
    val aggs = d.measures.map {
      // decimal(p,s) * integral sign keeps scale s and lands on the
      // MV sum column's own capped type — the union in mergeRollups
      // needs the types to line up exactly
      case (name, MvSum(c, castTo)) =>
        sum(castTo.map(t => col(c).cast(t)).getOrElse(col(c)) * sign).as(name)
      case (name, MvCount) => sum(sign).as(name)
      case (name, MvCountCol(c)) =>
        sum(org.apache.spark.sql.functions
          .when(col(c).isNotNull, sign).otherwise(0L)).as(name)
      case (name, m) => throw new IllegalStateException(s"unreachable: $name $m")
    }
    val delta = feed.groupBy(d.groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    mergeRollups(mv, delta, d).where(col(countCol) > 0L)
  }

  /** Merge two rollups of the same definition (the A20 incremental
    * refresh shape: old MV ⊎ rollup-of-diff): sums and counts re-add,
    * min/max re-extremize — every measure here is a commutative
    * monoid, so merge-of-partials ≡ rebuild, exactly (decimal/long
    * adds are associative; the spec proves the identity).
    */
  def mergeRollups(a: DataFrame, b: DataFrame, d: MvDef): DataFrame = {
    val aggs = d.measures.map {
      case (name, _: MvSum) => sum(col(name)).as(name)
      case (name, MvCount) => sum(col(name)).as(name)
      case (name, _: MvCountCol) => sum(col(name)).as(name)
      case (name, _: MvMin) => min(col(name)).as(name)
      case (name, _: MvMax) => max(col(name)).as(name)
    }
    a.unionByName(b).groupBy(d.groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Materialize the MV to its path and register it for rewrite.
    * The build write is rewrite-suppressed: on a re-build of an
    * ALREADY-registered definition the rule would otherwise rewrite
    * the build query onto the stale MV.
    */
  def buildAndRegister(spark: SparkSession, d: MvDef): Unit = {
    withoutRewrite {
      mvFrame(spark, d).write.mode("overwrite").parquet(d.mvPath)
    }
    register(spark, d)
  }

  /** Full refresh of a registered MV in place — the maintenance swap:
    * rebuild from the CURRENT base (rewrite-suppressed) and overwrite
    * the MV files. Rewrites resolve the relation per query, so the
    * next rewritten query serves the new content with no re-register.
    */
  def refresh(spark: SparkSession, d: MvDef): Unit = withoutRewrite {
    mvFrame(spark, d).write.mode("overwrite").parquet(d.mvPath)
  }

  /** Resolve the MV's CURRENT relation — called at registration (to
    * validate the layout eagerly) and again at every rewrite (to track
    * maintenance swaps of the MV files).
    */
  private[plans] def resolveRelation(spark: SparkSession, d: MvDef): LogicalRelation = {
    val analyzed = graft.sources.GraftIO.readParquet(spark, d.mvPath).queryExecution.analyzed
    analyzed.collectFirst { case l: LogicalRelation => l }.getOrElse(
      throw new IllegalStateException(s"[GRAFT] MV at ${d.mvPath} did not analyze to a relation"))
  }

  /** Register an already-materialized MV (e.g. one A20 maintains). */
  def register(spark: SparkSession, d: MvDef): Unit = {
    val lr = resolveRelation(spark, d)
    val missing = (d.groupCols ++ d.measures.map(_._1))
      .filterNot(c => lr.output.exists(_.name == c))
    require(missing.isEmpty,
      s"[GRAFT] MV at ${d.mvPath} lacks columns: ${missing.mkString(",")}")
    registry.put(normalize(d.basePath), d)
  }

  def lookup(basePath: String): Option[MvDef] =
    Option(registry.get(normalize(basePath)))
}

/** The rewrite rule, injected pre-CBO (after the main operator batch,
  * so the plan shape is settled: Aggregate over Project/Filter over
  * the relation).
  */
case class MvRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (GraftMv.isEmpty || GraftMv.isSuppressed) return plan
    plan.transformDown {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }
  }

  /** Aggregate's child stripped to (optional filter, relation),
    * tolerating a pruning Project of bare attributes on either side
    * of the Filter. Anything else declines.
    */
  private def decompose(p: LogicalPlan): Option[(Option[Expression], LogicalRelation)] =
    p match {
      case Project(projList, c) if projList.forall(_.isInstanceOf[AttributeReference]) =>
        decompose(c)
      case Filter(cond, c) => decompose(c) match {
        case Some((None, lr)) => Some((Some(cond), lr))
        case _ => None // at most one filter layer
      }
      case lr: LogicalRelation => Some((None, lr))
      case _ => None
    }

  private def rootOf(lr: LogicalRelation): Option[String] = lr.relation match {
    case fs: HadoopFsRelation => fs.location.rootPaths match {
      case Seq(single) => Some(GraftMv.normalize(single.toString))
      case _ => None
    }
    case _ => None
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (condOpt, baseLr) = decompose(agg.child) match {
      case Some(x) => x
      case None => return None
    }
    val d = rootOf(baseLr).flatMap(GraftMv.lookup) match {
      case Some(x) => x
      case None => return None
    }
    // grouping: bare attributes, a subset of the MV's group columns
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference if d.groupCols.contains(a.name) => a
      case _ => return None
    }
    // the one allowed filter touches grouping columns only, must be
    // DETERMINISTIC (rand()/input_file_name() have no/benign refs but
    // evaluate per-ROW — re-evaluating them per MV group row silently
    // changes results), and must carry no subquery
    condOpt.foreach { cond =>
      if (!cond.deterministic) return None
      if (org.apache.spark.sql.catalyst.expressions.SubqueryExpression
          .hasSubquery(cond)) return None
      if (cond.references.exists(a => !d.groupCols.contains(a.name))) return None
    }
    // the MV relation is resolved NOW, not at registration: a
    // maintenance swap of the MV files must be visible to the next
    // query; an unreadable MV declines rather than failing the query
    val mv = (try GraftMv.resolveRelation(spark, d) catch {
      case scala.util.control.NonFatal(_) => return None
    }).newInstance()
    def mvAttr(name: String): Attribute = mv.output.find(_.name == name).get
    def measureCol(pred: GraftMv.Measure => Boolean): Option[Attribute] =
      d.measures.collectFirst { case (n, m) if pred(m) => mvAttr(n) }

    /** Base-side aggregate call → equivalent expression over the MV. */
    def remap(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      def sumOf(a: Attribute, asType: DataType, zeroForEmpty: Boolean): Expression = {
        val s = Sum(a).toAggregateExpression()
        val typed = if (s.dataType == asType) s else Cast(s, asType)
        if (zeroForEmpty) Coalesce(Seq(typed, Literal.default(asType))) else typed
      }
      ae.aggregateFunction match {
        case s: Sum => s.child match {
          case a: AttributeReference =>
            measureCol { case GraftMv.MvSum(c, None) => c == a.name; case _ => false }
              .map(m => sumOf(m, ae.dataType, zeroForEmpty = false))
          case Cast(a: AttributeReference, t, _, _) =>
            measureCol { case GraftMv.MvSum(c, Some(ct)) => c == a.name && ct == t; case _ => false }
              .map(m => sumOf(m, ae.dataType, zeroForEmpty = false))
          case _ => None
        }
        case c: Count => c.children match {
          case Seq(Literal(_, _)) =>
            measureCol { case GraftMv.MvCount => true; case _ => false }
              .map(m => sumOf(m, ae.dataType, zeroForEmpty = true))
          case Seq(a: AttributeReference) =>
            measureCol { case GraftMv.MvCountCol(cc) => cc == a.name; case _ => false }
              .map(m => sumOf(m, ae.dataType, zeroForEmpty = true))
          case _ => None
        }
        case m: Min => m.child match {
          case a: AttributeReference =>
            measureCol { case GraftMv.MvMin(c) => c == a.name; case _ => false }
              .map(mc => Min(mc).toAggregateExpression())
          case _ => None
        }
        case m: Max => m.child match {
          case a: AttributeReference =>
            measureCol { case GraftMv.MvMax(c) => c == a.name; case _ => false }
              .map(mc => Max(mc).toAggregateExpression())
          case _ => None
        }
        case _ => None
      }
    }

    // Rewrite ONE result expression: aggregate calls anywhere inside
    // it (they sit under round()/cast() wrappers in optimized plans)
    // are remapped onto MV measures; the surviving attribute
    // references must then all be grouping columns, re-pointed at the
    // MV's attributes. Declines (None) on any unmappable piece.
    val baseAttrs = baseLr.outputSet
    def rewriteExpr(e: Expression): Option[Expression] = {
      var ok = true
      val aggsMapped = e.transformUp {
        case ae: AggregateExpression => remap(ae) match {
          case Some(m) => m
          case None => ok = false; ae
        }
      }
      if (!ok) return None
      if (aggsMapped.references.exists(a =>
          baseAttrs.contains(a) && !d.groupCols.contains(a.name))) return None
      Some(aggsMapped.transformUp {
        case a: AttributeReference if baseAttrs.contains(a) => mvAttr(a.name)
      })
    }

    // output expressions, exprIds preserved so everything above the
    // Aggregate keeps resolving untouched
    val newResult: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if d.groupCols.contains(a.name) =>
        Alias(mvAttr(a.name), a.name)(exprId = a.exprId)
      case al: Alias =>
        rewriteExpr(al.child) match {
          case Some(e) => Alias(e, al.name)(exprId = al.exprId)
          case None => return None
        }
      case _ => return None
    }
    val newGroup = groupAttrs.map(a => mvAttr(a.name): Expression)
    val newChild: LogicalPlan = condOpt match {
      case Some(cond) =>
        Filter(cond.transform { case a: AttributeReference => mvAttr(a.name) }, mv)
      case None => mv
    }
    Some(Aggregate(newGroup, newResult, newChild))
  }
}
