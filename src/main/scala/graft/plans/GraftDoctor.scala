package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** B73: plan lint — the 100 TB design-review checklist as code. The
  * same audits a human runs over `.explain` before shipping a job
  * (and the ones this repo's own VERDICTs graded): does anything
  * funnel the data through one task, one pair-product, or one
  * interpreted UDF? `lint` walks the PHYSICAL plan (pre-AQE input
  * plan, so the static shape is judged, not a runtime lucky-save)
  * and returns findings; an empty list is the plan you'd want.
  *
  * Rules:
  *  - cartesian-product / nested-loop-join: a pair-product operator
  *    in the plan. O(n·m) compares at scale; broadcast-NLJ of a
  *    one-row side is excused (that is the planted-scalar pattern
  *    B61/D-family use deliberately).
  *  - single-partition-window: Window (or a non-terminal sort) fed by
  *    an `Exchange SinglePartition` — the whole input through ONE
  *    task (the B58→B58b / PageRank-ranking lesson). A global
  *    aggregate's single-row exchange and a final limit are fine and
  *    excluded.
  *  - interpreted-udf: a ScalaUDF in the plan — opaque to Catalyst
  *    (no pushdown through it) and outside whole-stage codegen; the
  *    engine's native-Expression rule (SURVEY §4) exists to avoid
  *    exactly this.
  *  - per-row-literal-sort: a per-row sort over a >=256-element
  *    literal array (the r10 HNSW scaling-bench lesson).
  *  - repeated-uncached-subtree: the same source file-scanned (same
  *    pushed filters) by 2+ distinct consumers with tokenize-class
  *    work recomputed map-side above each scan — the corpus is read
  *    and re-derived once per consumer; cache the grain (the
  *    E14/E17/H5/F7 bug class, made permanent after its third
  *    recurrence). Branches sharing an IDENTICAL exchange are
  *    excused (runtime exchange reuse materializes them once), as
  *    are differently-filtered scans (query-slice vs corpus).
  *  - unmasked-mor-scan (r12): a file scan of a table carrying live
  *    merge-on-read mutation sidecars (`_dv`/`_eq`) in a plan that
  *    reads NO sidecar — raw `spark.read.parquet` of a mutated table,
  *    the one read surface the A51 serving work cannot intercept;
  *    the plan will serve deleted (including GDPR-erased) rows.
  *    morRead/catalog plans are excused automatically: their mask
  *    anti-joins scan the sidecars in the same plan.
  */
object GraftDoctor {

  case class Finding(rule: String, severity: String, node: String, advice: String)

  /** Literal arrays at or past this size make a per-row sort a scaling
    * hazard (see the per-row-literal-sort rule).
    */
  val LargeLiteralElems = 256

  def physical(df: DataFrame): SparkPlan = df.queryExecution.executedPlan match {
    case a: AdaptiveSparkPlanExec => a.inputPlan
    case p => p
  }

  /** Is this subtree's row count bounded by a LIMIT below, reached
    * only through row-preserving-or-reducing unary operators? Joins /
    * generates / unions decline (they can re-inflate a limited input).
    */
  private def boundedByLimit(p: SparkPlan): Boolean = p match {
    case _: org.apache.spark.sql.execution.GlobalLimitExec |
         _: org.apache.spark.sql.execution.LocalLimitExec |
         _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec |
         _: org.apache.spark.sql.execution.CollectLimitExec => true
    case _: org.apache.spark.sql.execution.ProjectExec |
         _: org.apache.spark.sql.execution.FilterExec |
         _: SortExec |
         _: org.apache.spark.sql.execution.CoalesceExec |
         _: ShuffleExchangeExec |
         _: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
      p.children.forall(boundedByLimit)
    case _ => false
  }

  /** Tokenize-class per-row work: a generate (explode), a regex /
    * split expression, a higher-order function, or one of the
    * engine's own native text expressions — the derivations whose
    * recompute-per-consumer doubles a corpus pass (the E14/E17/H5/F7
    * bug class).
    */
  private def expensiveNode(p: SparkPlan): Boolean = p match {
    case _: org.apache.spark.sql.execution.GenerateExec => true
    case _ => p.expressions.exists(_.exists {
      case _: org.apache.spark.sql.catalyst.expressions.RegExpExtractAll |
           _: org.apache.spark.sql.catalyst.expressions.RegExpExtract |
           _: org.apache.spark.sql.catalyst.expressions.RegExpReplace |
           _: org.apache.spark.sql.catalyst.expressions.StringSplit => true
      case _: org.apache.spark.sql.catalyst.expressions.HigherOrderFunction => true
      case e if e.getClass.getName.startsWith("graft.") => true
      case _ => false
    })
  }

  def lint(df: DataFrame): Seq[Finding] = {
    val out = Seq.newBuilder[Finding]
    // unmasked-mor-scan prepass: which paths does this plan read? A
    // scan of a merge-on-read table's files is fine when the SAME plan
    // also reads the table's mask sidecars (morRead / catalog serving
    // compose them as anti-joins); a plan reading the data files with
    // NO sidecar scan serves deleted — including GDPR-erased — rows.
    val allRoots: Seq[String] = physical(df).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten
    // segment-boundary matching: the sidecar dir is a path SEGMENT
    // exactly "_dv"/"_eq" — substring matching would let a sibling
    // table's sidecar (`/wh/t2/_dv` vs table `/wh/t`) or an
    // unrelated `_dvx` dir excuse a raw unmasked scan
    def sidecarTableRoot(p: String): Option[String] = {
      val segs = p.split('/')
      val i = segs.indexWhere(s => s == "_dv" || s == "_eq")
      if (i < 0) None else Some(segs.take(i).mkString("/"))
    }
    val maskedTables: Set[String] =
      allRoots.flatMap(sidecarTableRoot).toSet
    val hadoopConf = df.sparkSession.sessionState.newHadoopConf()
    val sidecarMemo = scala.collection.mutable.Map.empty[String, Boolean]
    def hasLiveSidecar(dir: String): Boolean =
      sidecarMemo.getOrElseUpdate(dir, {
        try {
          val p = new org.apache.hadoop.fs.Path(dir)
          val fs = p.getFileSystem(hadoopConf)
          fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_dv")) ||
            fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_eq"))
        } catch { case _: Exception => false }
      })
    def morTableOf(rootPath: String): Option[String] = {
      if (sidecarTableRoot(rootPath).nonEmpty) return None
      val p = new org.apache.hadoop.fs.Path(rootPath)
      // a root path is either the table dir itself or (pinned reads)
      // a data file under it — probe both
      Seq(p.toString, Option(p.getParent).map(_.toString).getOrElse(""))
        .filter(_.nonEmpty)
        .find(hasLiveSidecar)
    }
    // Sites for the repeated-uncached-subtree rule: file scans with
    // tokenize-class work recomputed MAP-SIDE above them (below the
    // first exchange/union). Grouped by (source location, normalized
    // pushed filters) — differently-filtered scans of one table (the
    // tiny query-side slice vs the corpus) are complementary, not
    // redundant — and counted by DISTINCT nearest-enclosing-exchange
    // subtree: branches that share an identical exchange are deduped
    // by exchange reuse at runtime (one materialization), while
    // distinct exchanges over the same derivation genuinely recompute
    // it once per consumer. Scans served from a cache never appear
    // (the walk doesn't descend into InMemoryTableScan).
    val tokenizedScans = scala.collection.mutable.Map.empty[(String, String), Set[String]]
      .withDefaultValue(Set.empty)

    def walk(p: SparkPlan, ancestors: List[SparkPlan]): Unit = {
      p match {
        case c: CartesianProductExec =>
          out += Finding("cartesian-product", "high", c.nodeName,
            "O(n*m) pair product: add a join key, pre-block candidates, or broadcast a bounded side")
        case b: BroadcastNestedLoopJoinExec =>
          // a deliberately-broadcast single-row/tiny aggregate (the
          // planted-scalar crossJoin pattern) has a plan-time max row
          // count of 1 on the broadcast side when it is a global agg —
          // detect the common benign shape: broadcast side is a
          // single-row aggregate (keys=[]).
          val broadcastSide = b.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
            case _ => b.right
          }
          val singleRow = broadcastSide.collectFirst {
            case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
                if a.groupingExpressions.isEmpty => a
          }.isDefined
          // a broadcast NLJ is the legitimate shape for scoring a
          // corpus against a DELIBERATELY tiny broadcast side (probe
          // queries, centroids) — the planner can't prove the size,
          // so flag it for review at medium, not as a blocker
          if (!singleRow)
            out += Finding("nested-loop-join", "medium", b.nodeName,
              "non-equi broadcast join: acceptable iff the broadcast side is provably small (probe sets, codebooks); otherwise add an equi key or pre-block candidates")
        // under AQE the input plan carries no Exchange yet
        // (EnsureRequirements runs at stage prep), so the smell is
        // read off the REQUIREMENT: an empty partitionSpec demands
        // SinglePartition of its child. A window whose input is
        // BOUNDED BY A LIMIT (cumulative sums over a top-k result) is
        // constant-size by construction and excused.
        case w: WindowExec if w.partitionSpec.isEmpty && !boundedByLimit(w.child) =>
          out += Finding("single-partition-window", "high", "Window",
            "unpartitioned window funnels every row through one task: partitionBy a key or use the two-level/GlobalOrder rank pattern")
        case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
            if w.partitionSpec.isEmpty && !boundedByLimit(w.child) =>
          out += Finding("single-partition-window", "high", "WindowGroupLimit",
            "unpartitioned window funnels every row through one task: partitionBy a key or use the two-level/GlobalOrder rank pattern")
        // belt-and-braces for non-AQE plans where the exchange is
        // already materialized
        case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
          val beyondSorts = ancestors.dropWhile(_.isInstanceOf[SortExec])
          beyondSorts.headOption match {
            case Some(_: WindowExec) |
                 Some(_: org.apache.spark.sql.execution.window.WindowGroupLimitExec) =>
              out += Finding("single-partition-window", "high", "Window",
                "unpartitioned window funnels every row through one task: partitionBy a key or use the two-level/GlobalOrder rank pattern")
            case _ => // global aggregate / final limit: legitimate single-row funnels
          }
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          // unmasked-mor-scan (r12): this scan reads a table carrying
          // live _dv/_eq mutation sidecars, and NOTHING in the plan
          // reads those sidecars — the plan will serve tombstoned rows
          f.relation.location.rootPaths.map(_.toString)
            .flatMap(morTableOf).distinct
            // equality, not prefix: only THIS table's own sidecar scan
            // excuses (a sibling /wh/t2's sidecar must not cover /wh/t)
            .filterNot(maskedTables.contains)
            .foreach { t =>
              out += Finding("unmasked-mor-scan", "high", f.nodeName,
                s"reads $t, a merge-on-read table with live _dv/_eq " +
                  "mutation sidecars, without composing their masks - " +
                  "deleted/GDPR-erased rows will serve; read via " +
                  "GraftCatalog.table / GraftMor.morRead, or fold with " +
                  "morCompact first")
            }
          // AQE's input plan carries no Exchange nodes yet, so the
          // would-be exchange boundary is read off the REQUIREMENT:
          // the subtree below the first ancestor demanding a
          // distribution is what stage prep materializes — and what
          // AQE's stage cache REUSES when two branches share it
          // canonically. That subtree's canonical form is the site
          // key (identical keys = one runtime materialization), and
          // only expensive work INSIDE that segment counts — work
          // above the boundary runs on the materialized/joined rows,
          // not on a re-derivation of this scan.
          var prev: SparkPlan = f
          var key: String = null
          var rest = ancestors
          val segment = scala.collection.mutable.ArrayBuffer[SparkPlan](f)
          while (key == null && rest.nonEmpty) {
            val a = rest.head
            val idx = a.children.indexWhere(_ eq prev)
            val dist =
              if (idx >= 0 && a.requiredChildDistribution.length > idx)
                a.requiredChildDistribution(idx)
              else org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution
            if (dist != org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution)
              key = prev.canonicalized.toString
            else { segment += a; prev = a; rest = rest.tail }
          }
          if (key == null) key = s"unexchanged-site-${System.identityHashCode(f)}"
          if (segment.exists(expensiveNode)) {
            val loc = f.relation.location.rootPaths.map(_.toString).sorted.mkString(",")
            val filters = (f.dataFilters ++ f.partitionFilters)
              .map(_.toString.replaceAll("#\\d+", "")).sorted.mkString(";")
            tokenizedScans((loc, filters)) = tokenizedScans((loc, filters)) + key
          }
        case _ =>
      }
      p.expressions.foreach(_.foreach {
        case u: ScalaUDF =>
          out += Finding("interpreted-udf", "medium",
            u.udfName.getOrElse("udf"),
            "ScalaUDF blocks pushdown and codegen: prefer org.apache.spark.sql.functions or a native Catalyst Expression")
        // the r10 scaling-bench lesson as a permanent check: sorting a
        // LARGE LITERAL array per row (the shipped-as-typedlit routing/
        // centroid table pattern) is O(m log m) allocate+sort per row
        // where a top-M selection over a broadcast array is O(m·M) —
        // it cost HNSW 46x at 10x data before the fix
        case sa @ (_: org.apache.spark.sql.catalyst.expressions.SortArray |
                   _: org.apache.spark.sql.catalyst.expressions.ArraySort) =>
          val bigLit = sa.exists {
            case l: org.apache.spark.sql.catalyst.expressions.Literal
                if l.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]
                  && l.value != null =>
              l.value.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
                .numElements() >= LargeLiteralElems
            case _ => false
          }
          if (bigLit)
            out += Finding("per-row-literal-sort", "medium", sa.prettyName,
              s"per-row sort over a literal array of >= $LargeLiteralElems elements: " +
                "select top-M with a broadcast array + insertion buffer instead " +
                "(the HNSW shard-assignment lesson)")
        case _ =>
      })
      p.children.foreach(walk(_, p :: ancestors))
    }
    walk(physical(df), Nil)
    tokenizedScans.toSeq.filter(_._2.size >= 2).sortBy(_._1).foreach {
      case ((loc, _), keys) =>
        val name = loc.substring(loc.lastIndexOf('/') + 1)
        out += Finding("repeated-uncached-subtree", "medium", name,
          s"$name is file-scanned ${keys.size}x (same pushed filters, " +
            "distinct consumers) with tokenize-class work (regex/split/" +
            "higher-order/generate) recomputed map-side above each scan: " +
            "cache the derived grain so every consumer reads it once " +
            "(the E14/H5/F7 double-tokenize lesson)")
    }
    out.result().distinct
  }

  /** The findings as a small DataFrame (driver-local), for display. */
  def lintReport(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import scala.jdk.CollectionConverters._
    val rows = lint(df).map(f =>
      org.apache.spark.sql.Row(f.rule, f.severity, f.node, f.advice)).asJava
    s.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("rule", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("severity", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("node", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("advice", org.apache.spark.sql.types.StringType))))
  }
}
