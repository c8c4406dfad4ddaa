package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst rule for SURVEY §7.3 candidate #2: the reference joins its
  * time dimension with
  *   CONVERT(DATE, CONVERT(VARCHAR(8), t.date_key, 112))
  *     = CONVERT(DATE, o.order_purchase_timestamp)
  * (Olist DW.sql:153) — i.e. per-row int→string→date parsing on the
  * date-key side. Users porting that SQL write
  *   to_date(cast(date_key as string), 'yyyyMMdd') = to_date(ts)
  * which makes the join key a parse expression: more per-row work and an
  * opaque key for partition pruning.
  *
  * This rule rewrites such equi-join conditions to
  *   date_key = cast(date_format(ts, 'yyyyMMdd') as int)
  * — equivalent whenever date_key holds a valid yyyymmdd int (both
  * forms then denote the same calendar day; invalid keys parse to null
  * on both sides and drop out of the inner join either way). The int
  * comparison keeps the raw `date_key` column as the join key, so
  * bucketing/partitioning on date_key stays usable and the probe side
  * does one format instead of cast+parse.
  *
  * Injected via GraftExtensions.injectResolutionRule (ParseToDate is
  * RuntimeReplaceable and already rewritten by optimizer time, so this
  * must run during resolution).
  */
object DateKeyJoinRewrite extends Rule[LogicalPlan] {
  private val FMT = "yyyyMMdd"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j: Join if j.resolved && j.condition.isDefined =>
      j.copy(condition = j.condition.map(_.transform {
        case eq @ EqualTo(a, b) =>
          rewrite(a, b).orElse(rewrite(b, a)).getOrElse(eq)
      }))
  }

  private def rewrite(keySide: Expression, tsSide: Expression): Option[Expression] =
    (keySide, tsSide) match {
      case (ParseToDate(Cast(k, _: StringType, _, _), Some(Literal(f: UTF8String, _: StringType)), _, _),
            ParseToDate(ts, None, _, _))
          if f.toString == FMT &&
            (k.dataType == IntegerType || k.dataType == LongType) &&
            (ts.dataType == TimestampType || ts.dataType == TimestampNTZType ||
              ts.dataType == DateType) =>
        Some(EqualTo(k, Cast(DateFormatClass(ts, Literal(FMT), None), k.dataType)))
      case _ => None
    }
}
