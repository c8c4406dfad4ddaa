package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Metadata-only aggregate REWRITE — the automatic form of
  * [[graft.olist.Warehouse.statsAggregate]]: a plain-SQL
  * `SELECT min(k), max(k), count(*) FROM dw_t [WHERE <partition pred>]
  * [GROUP BY <partition cols>]` over a bound warehouse view becomes a
  * [[LocalRelation]] of values folded from the manifest — the query
  * never touches a data file. The same move Spark's own
  * `OptimizeMetadataOnlyQuery` makes for partition keys and Delta
  * makes for its stats, here driven by the graft manifest.
  *
  * Fires ONLY when the rewrite is provably the same answer:
  *  - the child is the `dw_<t>` view (optionally under ONE Filter),
  *    and the leaf FileIndexes of the registered plan — the bare
  *    relation for a clean table, the DV anti-join's two scans for a
  *    DV-carrying one — together list EXACTLY the current snapshot's
  *    data + sidecar files (a stale registration from another
  *    process's commit, or any other plan transformation between view
  *    and aggregate, disqualifies); tables under a column mapping
  *    (rename / drop-and-re-add) refuse at the snapshot step — their
  *    stats key physical names;
  *  - a WHERE clause references ONLY partition columns, is
  *    deterministic, and carries no subquery — then it is evaluated
  *    DRIVER-SIDE per file against the file's typed partition values
  *    with Catalyst's own `eval` (every row of a file shares its
  *    partition values, so file-level selection is exact, and reusing
  *    eval means the rewrite cannot disagree with the scan on
  *    predicate semantics — no re-implementation to drift);
  *  - MIN/MAX require the selected files to carry NO deletion vectors
  *    (a deleted row may be the extreme; an analysis rule must not run
  *    jobs) and stats for every referenced column. COUNT(*) alone
  *    stays exact THROUGH DVs — the manifest knows each sidecar's
  *    cardinality, so n = Σ file rows − Σ dv rows
  *    ([[graft.olist.Warehouse.metadataAggFold]]);
  *  - every aggregate is a bare `min`/`max`/`count`/`sum`/`avg` over a
  *    column or `count(*)`/`count(1)` — no DISTINCT, no FILTER,
  *    nothing else. `count(col)` folds from the per-file NON-NULL
  *    counts (`"__nn_<col>"` stats) when every selected file carries
  *    them — a pre-stats file disqualifies (min/max stats alone cannot
  *    see nulls). `sum(col)` folds from the per-file exact sums
  *    (`"__sum_<col>"`, integral AND decimal stat columns — both add
  *    exactly) under the same no-DV rule, and only when the exact
  *    total fits the scan's own Sum result type (LongType for
  *    integrals, decimal(p+10, s) for decimals) — the token-budget
  *    ledger lane ([[graft.olist.Warehouse.metadataSumFold]]).
  *    `avg(col)` = exact-sum / non-null-count, INTEGRAL columns only,
  *    under the sum lane's disqualifiers plus an exactness bound
  *    (n·max|value| ≤ 2^53 from the same stats, so every partial sum
  *    the scan's double accumulator could form is exact in any order —
  *    the fold can never disagree with the scan it replaces; a decimal
  *    avg's plan type is decimal with its own division rounding, so it
  *    keeps the scan — the `intAbs` guard below disqualifies it);
  *  - grouping, when present, is on attribute references over
  *    partition columns — the manifest groups those exactly.
  *
  * `graft.metadataAgg.enabled=false` turns the rewrite off. The
  * replacement keeps the Aggregate's own output attributes (same
  * exprIds), so parents re-resolve nothing. */
case class MetadataAggRewrite(session: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!session.conf.get("graft.metadataAgg.enabled", "true").toBoolean)
      return plan
    // Rewrite only once the WHOLE plan is resolved. An Aggregate under
    // a not-yet-resolved HAVING / ORDER-BY-aggregate still changes
    // shape: ResolveAggregateFunctions pushes the outer condition's
    // aggregates INTO it before turning the wrapper into a plain
    // Filter/Sort — rewriting first would strand `Filter(count(1) > …)`
    // over a LocalRelation and fail analysis. The analyzer's
    // fixed-point loop re-runs every resolution rule after the plan
    // settles, so the fold still happens — one pass later, on the
    // final Aggregate (asserted: HAVING + ORDER BY queries plan with
    // zero file scans).
    if (!plan.resolved) return plan
    plan.transformUp {
      case agg @ Aggregate(_, _, child, _) if agg.resolved =>
        val (cond, src) = child match {
          case Filter(c, s) => (Some(c), s)
          case s => (None, s)
        }
        (src match {
          case SubqueryAlias(ident, body)
              if ident.name.startsWith("dw_") =>
            // temp-view resolution wraps the registered plan in a View
            // node; the registered plan is the warehouse's own read —
            // a bare relation for a clean table, the DV anti-join plan
            // for a table carrying deletion vectors
            val bare = body match {
              case v: View => v.child
              case b => b
            }
            rewrite(agg, cond, ident.name.stripPrefix("dw_"), bare)
          case _ => None
        }).getOrElse(agg)
    }
  }

  // one classified output column of the Aggregate
  private sealed trait Out
  private case class GroupVal(idx: Int) extends Out
  private case class MinOf(c: String) extends Out
  private case class MaxOf(c: String) extends Out
  private case object Cnt extends Out
  private case class CntOf(c: String) extends Out
  private case class SumOf(c: String) extends Out
  private case class AvgOf(c: String) extends Out

  // avg folds as exact-sum / non-null-count only while n·max|value|
  // ≤ 2^53 (n and the extremes from the same stats the fold reads):
  // then EVERY partial sum the scan's double accumulator could form —
  // in any order, any sign mix — is an integer within 2^53, so every
  // addition is exact and the fold, the scan, and DuckDB all land on
  // the identical double. Bounding only the TOTAL would not do it
  // (two huge opposite values cancel to a small total while their
  // running partial already rounded). Beyond the bound the scan is
  // the only honest answer.
  private val MaxExactDouble = 1L << 53

  private def intAbs(v: Any): Option[BigInt] = v match {
    case b: Byte => Some(BigInt(b).abs)
    case s: Short => Some(BigInt(s).abs)
    case i: Int => Some(BigInt(i).abs)
    case l: Long => Some(BigInt(l).abs)
    case _ => None
  }

  private def rewrite(agg: Aggregate, cond: Option[Expression],
      table: String, body: LogicalPlan): Option[LogicalPlan] = {
    val groupAttrs: Option[Seq[AttributeReference]] = {
      val as = agg.groupingExpressions.map {
        case a: AttributeReference => Some(a)
        case _ => None
      }
      if (as.forall(_.isDefined)) Some(as.flatten) else None
    }
    def classify(gs: Seq[AttributeReference]): Option[Seq[Out]] = {
      val outs = agg.aggregateExpressions.map {
        case a: AttributeReference =>
          val i = gs.indexWhere(_.exprId == a.exprId)
          if (i >= 0) Some(GroupVal(i)) else None
        case Alias(AggregateExpression(f, _, false, None, _), _) =>
          f match {
            case Min(c: AttributeReference) => Some(MinOf(c.name))
            case Max(c: AttributeReference) => Some(MaxOf(c.name))
            case Count(Seq(Literal(1, _))) => Some(Cnt)
            // count(col) = the column's non-null count — folds from
            // the per-file "__nn_" stats when every file carries them
            case Count(Seq(c: AttributeReference)) => Some(CntOf(c.name))
            // sum(col) folds from the per-file exact "__sum_" stats —
            // integral stat columns only; metadataSumFold disqualifies
            // everything else (doubles, missing stats, DVs, overflow).
            // Any eval mode is fine: the fold only ever answers when
            // the exact total fits LongType, where ANSI, LEGACY and
            // TRY sums all agree.
            case Sum(c: AttributeReference, _) => Some(SumOf(c.name))
            // avg(col) = sum/cnt — both ingredients fold exactly (the
            // "__sum_"/"__nn_" stats), under the sum lane's
            // disqualifiers plus the ≤2^53 exactness bound
            case Average(c: AttributeReference, _) => Some(AvgOf(c.name))
            case _ => None
          }
        case _ => None
      }
      if (outs.forall(_.isDefined)) Some(outs.flatten) else None
    }
    // every leaf of the registered view's plan must be a file
    // relation, and together they must list EXACTLY the current
    // snapshot's files — data AND dv sidecars (both sides through
    // Hadoop Path so file:/// and file:/ agree). A stale registration
    // from another process's commit, or any shape the warehouse never
    // registers, fails the set equality and keeps the scan.
    val leafFiles: Option[Set[String]] = {
      val ls = body.collectLeaves().map {
        case lr: LogicalRelation => lr.relation match {
          case h: HadoopFsRelation => Some(h.location.inputFiles.toSeq)
          case _ => None
        }
        case _ => None
      }
      if (ls.isEmpty || !ls.forall(_.isDefined)) None
      else Some(ls.flatten.flatten.map(f =>
        new org.apache.hadoop.fs.Path(f).toString).toSet)
    }
    for {
      wh <- GraftSqlParser.boundFor(session)
      if wh.hasTable(table)
      lf <- leafFiles
      if lf == wh.currentDataPaths(table).map(f =>
        new org.apache.hadoop.fs.Path(f).toString)
      gs <- groupAttrs
      outs <- classify(gs)
      snap <- wh.metadataAggSnapshot(table)
      (files, types, pcols) = snap
      if gs.forall(g => pcols.contains(g.name))
      avgCols = outs.collect { case AvgOf(c) => c }.distinct
      // avg needs the exact sum, the non-null count, AND the extremes
      // (for the every-partial-is-exact bound): ride the existing
      // folds by requesting its columns in all three lanes
      cols = (outs.collect { case MinOf(c) => c; case MaxOf(c) => c }
        ++ avgCols).distinct
      cntCols = (outs.collect { case CntOf(c) => c } ++ avgCols).distinct
      sumCols = (outs.collect { case SumOf(c) => c } ++ avgCols).distinct
      kept <- selectFiles(wh, cond, files, types, pcols)
      avgExact = (folded: Seq[(String, Option[Any], Option[Any])],
          cnts: Map[String, Long], sums: Map[String, Any]) =>
        avgCols.forall(c => sums(c) == null ||
          folded.collectFirst { case (`c`, lo, hi) => (lo, hi) }.exists {
            case (Some(a), Some(b)) =>
              (intAbs(a), intAbs(b)) match {
                case (Some(x), Some(y)) =>
                  BigInt(cnts(c)) * x.max(y) <= MaxExactDouble
                case _ => false
              }
            case _ => false
          })
      rows <- if (gs.isEmpty) {
        for {
          (folded, cnts, n) <- wh.metadataAggFold(kept, types, cols, cntCols)
          sums <- wh.metadataSumFold(kept, types, sumCols)
          if avgExact(folded, cnts, sums)
        } yield Seq(values(outs, Nil, folded, cnts, sums, n))
      } else scala.util.Try {
        // Try: "disqualify, never fail" — a foreign-written partition
        // directory that trips value parsing must degrade to the scan,
        // not throw at analysis (unescape is total, but this lane must
        // stay safe against any future parse edge, like selectFiles).
        // Grouped emission leans on the writer's no-zero-row-files
        // invariant (EmptyFileCommitSpec): a group whose kept files
        // all had zero rows would emit a row a real scan would not —
        // such files never reach a manifest, so every group here has
        // at least one live row behind it.
        val gvs = kept.map(f =>
          wh.filePartitionValues(f, gs.map(_.name), types).map(_ -> f))
        if (!gvs.forall(_.isDefined)) None
        else {
          val grouped = gvs.flatten.groupBy(_._1).toSeq.map {
            case (gvals, gfs) =>
              for {
                (folded, cnts, n) <-
                  wh.metadataAggFold(gfs.map(_._2), types, cols, cntCols)
                sums <- wh.metadataSumFold(gfs.map(_._2), types, sumCols)
                if avgExact(folded, cnts, sums)
              } yield values(outs, gvals, folded, cnts, sums, n)
          }
          if (grouped.forall(_.isDefined)) Some(grouped.flatten) else None
        }
      }.toOption.flatten
    } yield {
      val out = agg.aggregateExpressions.map(_.toAttribute)
      val converters = out.map(a =>
        CatalystTypeConverters.createToCatalystConverter(a.dataType))
      LocalRelation(out, rows.map(r =>
        InternalRow.fromSeq(r.zip(converters).map {
          case (v, conv) => if (v == null) null else conv(v)
        })))
    }
  }

  /** The file subset a WHERE clause keeps — Some(all) with no clause;
    * None (no rewrite) unless the predicate is a deterministic,
    * subquery-free expression over partition columns only, evaluable
    * per file on its typed partition values. A null/false eval drops
    * the file, exactly Filter's row semantics lifted to the file grain
    * (sound because every row of the file shares those values). */
  private def selectFiles(wh: graft.olist.Warehouse,
      cond: Option[Expression], files: Seq[graft.olist.Warehouse.DataFile],
      types: Map[String, org.apache.spark.sql.types.DataType],
      pcols: Seq[String])
      : Option[Seq[graft.olist.Warehouse.DataFile]] = cond match {
    case None => Some(files)
    case Some(c) =>
      val refs: Seq[Attribute] = c.references.toSeq
      val ok = c.deterministic &&
        refs.forall(a => pcols.contains(a.name)) &&
        c.find(_.isInstanceOf[PlanExpression[_]]).isEmpty
      if (!ok) None
      else {
        val bound = BindReferences.bindReference(c, refs)
        val convs = refs.map(a =>
          CatalystTypeConverters.createToCatalystConverter(a.dataType))
        // an eval the interpreter cannot run (exotic expression, a
        // value that trips it) must fall back to the scan, not fail
        // the query at analysis
        scala.util.Try {
          val keep = files.map { f =>
            wh.filePartitionValues(f, refs.map(_.name), types).map { vs =>
              val row = InternalRow.fromSeq(vs.zip(convs).map {
                case (v, cv) => if (v == null) null else cv(v)
              })
              bound.eval(row) == true
            }
          }
          if (!keep.forall(_.isDefined)) None
          else Some(files.zip(keep).collect { case (f, Some(true)) => f })
        }.toOption.flatten
      }
  }

  private def values(outs: Seq[Out], gvals: Seq[Any],
      folded: Seq[(String, Option[Any], Option[Any])],
      cnts: Map[String, Long], sums: Map[String, Any], n: Long): Seq[Any] = {
    val lo = folded.map { case (c, l, _) => c -> l.orNull }.toMap
    val hi = folded.map { case (c, _, h) => c -> h.orNull }.toMap
    outs.map {
      case GroupVal(i) => gvals(i)
      case MinOf(c) => lo(c)
      case MaxOf(c) => hi(c)
      case Cnt => n
      case CntOf(c) => cnts(c)
      case SumOf(c) => sums(c)
      // SQL avg over an all-null (or empty) group is NULL — the sum
      // lane already renders that case as null
      case AvgOf(c) => sums(c) match {
        case null => null
        case v: Long => v.toDouble / cnts(c)
      }
    }
  }
}
