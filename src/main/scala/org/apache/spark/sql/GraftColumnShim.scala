package org.apache.spark.sql

/** Spark 4 made `Column` an opaque wrapper over a `ColumnNode` tree
  * whose types are `private[sql]`; extension libraries that need to
  * INSPECT an unresolved predicate (here: deriving provable
  * file-pruning ranges from a DELETE/UPDATE predicate without running
  * analysis) use a small shim in the sql package — the established
  * pattern for this API gap. Pure inspection, no behavior change.
  */
object GraftColumnShim {

  def expression(c: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** The inverse bridge — wrap a catalyst Expression as a Column.
    * Used by the fused native scoring expressions (DotExactDec /
    * CosineExactDec / AdcScore / GramDigests), whose Column wrappers
    * take plain Columns and so cannot go through the function-registry
    * + call_function route without a SparkSession in scope. */
  def column(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  // ----- catalyst-tree walkers (the `expr("…")` lane) ----------------
  //
  // functions.expr wraps the raw SQL text in a SqlExpression node, so
  // the ColumnNode walkers below see an opaque leaf — the whole SQL
  // DELETE/UPDATE surface (which builds its predicate via expr) would
  // derive nothing and probe every file. Parse the text with the
  // catalyst parser and walk the UNRESOLVED expression tree instead:
  // same conjunct shapes, same type-exactness deferral (literal values
  // convert to external Scala form; the warehouse-side type filter
  // stays the gate).

  private def extLit(l: catalyst.expressions.Literal): Option[Any] =
    Option(catalyst.CatalystTypeConverters.convertToScala(l.value, l.dataType))

  private def catName(e: catalyst.expressions.Expression): Option[String] =
    e match {
      case a: catalyst.analysis.UnresolvedAttribute => Some(a.nameParts.last)
      case _ => None
    }

  private def catRanges(e: catalyst.expressions.Expression)
      : Seq[(String, Option[Any], Option[Any])] = {
    import catalyst.expressions._
    def rng(a: Expression, l: Literal, lo: Boolean, hi: Boolean) =
      (catName(a), extLit(l)) match {
        case (Some(c), Some(v)) =>
          Seq((c, if (lo) Some(v) else None, if (hi) Some(v) else None))
        case _ => Nil
      }
    e match {
      case And(x, y) => catRanges(x) ++ catRanges(y)
      case StartsWith(a, l: Literal) =>
        catName(a).toSeq.flatMap(c =>
          extLit(l).toSeq.flatMap(v => prefixRange(c, v)))
      // the parser yields Like (the optimizer's LIKE→StartsWith
      // rewrite hasn't run on this unresolved tree): a pattern that is
      // literal-text-then-% — no other wildcard, no escape char — IS a
      // prefix match
      case Like(a, l: Literal, esc) =>
        extLit(l) match {
          case Some(p: String) if p.length > 1 && p.endsWith("%") &&
              !p.init.exists(ch => ch == '%' || ch == '_' || ch == esc) =>
            catName(a).toSeq.flatMap(c => prefixRange(c, p.init))
          case _ => Nil
        }
      case EqualTo(a, l: Literal) => rng(a, l, lo = true, hi = true)
      case EqualTo(l: Literal, a) => rng(a, l, lo = true, hi = true)
      case EqualNullSafe(a, l: Literal) if l.value != null =>
        rng(a, l, lo = true, hi = true)
      case EqualNullSafe(l: Literal, a) if l.value != null =>
        rng(a, l, lo = true, hi = true)
      case GreaterThan(a, l: Literal) => rng(a, l, lo = true, hi = false)
      case GreaterThanOrEqual(a, l: Literal) => rng(a, l, lo = true, hi = false)
      case LessThan(a, l: Literal) => rng(a, l, lo = false, hi = true)
      case LessThanOrEqual(a, l: Literal) => rng(a, l, lo = false, hi = true)
      case GreaterThan(l: Literal, a) => rng(a, l, lo = false, hi = true)
      case GreaterThanOrEqual(l: Literal, a) => rng(a, l, lo = false, hi = true)
      case LessThan(l: Literal, a) => rng(a, l, lo = true, hi = false)
      case LessThanOrEqual(l: Literal, a) => rng(a, l, lo = true, hi = false)
      case _ => Nil
    }
  }

  /** `LIKE 'p%'` as the prefix-successor range [p, p.init+(last+1)] —
    * see PruningFileIndex.impliedRanges for the soundness argument
    * (bound emitted only below the surrogate block, where UTF-16,
    * UTF-8 byte, and code-point orders agree; inclusive upper is
    * looser than the true strict bound). */
  private def prefixRange(c: String,
      v: Any): Seq[(String, Option[Any], Option[Any])] = v match {
    case p: String if p.nonEmpty =>
      val last = p.charAt(p.length - 1)
      val hi = if (last >= 0xD7FF.toChar) None
        else Some(p.substring(0, p.length - 1) + (last + 1).toChar)
      Seq((c, Some(p), hi))
    case _ => Nil
  }

  private def catNullness(e: catalyst.expressions.Expression)
      : Seq[(String, Boolean)] = {
    import catalyst.expressions._
    e match {
      case And(x, y) => catNullness(x) ++ catNullness(y)
      case IsNull(a) => catName(a).map(_ -> true).toSeq
      case IsNotNull(a) => catName(a).map(_ -> false).toSeq
      case EqualNullSafe(a, l: Literal) if l.value == null =>
        catName(a).map(_ -> true).toSeq
      case EqualNullSafe(l: Literal, a) if l.value == null =>
        catName(a).map(_ -> true).toSeq
      case _ => Nil
    }
  }

  private def catInSets(e: catalyst.expressions.Expression)
      : Seq[(String, Seq[Any])] = {
    import catalyst.expressions._
    def eqVals(x: Expression): Option[(String, Seq[Any])] = x match {
      case Or(l, r) =>
        for {
          (cl, vl) <- eqVals(l); (cr, vr) <- eqVals(r); if cl == cr
        } yield (cl, vl ++ vr)
      case EqualTo(a, l: Literal) =>
        for { c <- catName(a); v <- extLit(l) } yield (c, Seq(v))
      case EqualTo(l: Literal, a) =>
        for { c <- catName(a); v <- extLit(l) } yield (c, Seq(v))
      case _ => None
    }
    e match {
      case And(x, y) => catInSets(x) ++ catInSets(y)
      case In(a, list) if list.nonEmpty && list.forall {
        case _: Literal => true; case _ => false } =>
        catName(a).map { c =>
          (c, list.collect { case l: Literal if l.value != null => l }
            .flatMap(extLit))
        }.filter(_._2.nonEmpty).toSeq
      case o: Or => eqVals(o).filter(_._2.nonEmpty).toSeq
      case _ => Nil
    }
  }

  private def parsedSql(n: internal.ColumnNode)
      : Option[catalyst.expressions.Expression] = n match {
    case s: internal.SqlExpression =>
      scala.util.Try(catalyst.parser.CatalystSqlParser
        .parseExpression(s.expression)).toOption
    case _ => None
  }

  /** Range constraints provably implied by the predicate: top-level
    * conjuncts of the form `col <op> literal` (either operand order)
    * as (column, lowerBound, upperBound) triples. Disjunctions, casts,
    * and function-of-column forms contribute nothing — the safe
    * direction for a pruning hint. Strict comparisons use their
    * literal as an inclusive bound (looser, still sound). */
  def impliedRanges(c: Column): Seq[(String, Option[Any], Option[Any])] = {
    import org.apache.spark.sql.internal._
    def name(n: ColumnNode): Option[String] = n match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case _ => None
    }
    def litOf(n: ColumnNode): Option[Any] = n match {
      case l: Literal => Option(l.value)
      case _ => None
    }
    def bound(op: String, col: String, v: Any,
        flipped: Boolean): Seq[(String, Option[Any], Option[Any])] = {
      val effective = if (!flipped) op else op match {
        case ">" => "<" case ">=" => "<=" case "<" => ">"
        case "<=" => ">=" case other => other
      }
      effective match {
        case "=" | "==" => Seq((col, Some(v), Some(v)))
        case ">" | ">=" => Seq((col, Some(v), None))
        case "<" | "<=" => Seq((col, None, Some(v)))
        case _ => Nil
      }
    }
    def walk(n: ColumnNode): Seq[(String, Option[Any], Option[Any])] =
      n match {
        case f: UnresolvedFunction =>
          (f.functionName.toLowerCase(java.util.Locale.ROOT),
            f.arguments) match {
            case ("and", Seq(l, r)) => walk(l) ++ walk(r)
            case ("startswith", Seq(a, b)) =>
              (for { cn <- name(a); v <- litOf(b) }
                yield prefixRange(cn, v)).getOrElse(Nil)
            case (op, Seq(a, b)) =>
              (name(a), litOf(b), name(b), litOf(a)) match {
                case (Some(cn), Some(v), _, _) => bound(op, cn, v, flipped = false)
                case (_, _, Some(cn), Some(v)) => bound(op, cn, v, flipped = true)
                case _ => Nil
              }
            case _ => Nil
          }
        case other => parsedSql(other).toSeq.flatMap(catRanges)
      }
    walk(c.node)
  }

  /** Nullness constraints implied by the predicate: top-level
    * `col.isNull` / `col.isNotNull` conjuncts (and their SQL-text
    * forms) as (column, wantNull) pairs — the admission test consumes
    * the manifest's per-file non-null counts. Anything else
    * contributes nothing, the safe direction. */
  def impliedNullness(c: Column): Seq[(String, Boolean)] = {
    import org.apache.spark.sql.internal._
    def name(n: ColumnNode): Option[String] = n match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case _ => None
    }
    def walk(n: ColumnNode): Seq[(String, Boolean)] = n match {
      case f: UnresolvedFunction =>
        (f.functionName.toLowerCase(java.util.Locale.ROOT),
          f.arguments) match {
          case ("and", Seq(l, r)) => walk(l) ++ walk(r)
          case ("isnull", Seq(a)) => name(a).map(_ -> true).toSeq
          case ("isnotnull", Seq(a)) => name(a).map(_ -> false).toSeq
          case _ => Nil
        }
      case other => parsedSql(other).toSeq.flatMap(catNullness)
    }
    walk(c.node)
  }

  /** Point-value SET constraints implied by the predicate: top-level
    * conjuncts of the form `col.isin(v1, v2, …)` or an
    * OR-of-equalities over ONE column, as (column, values) pairs.
    * Each pair is one conjunct; a file matches when ANY value does
    * (union semantics — the caller's admission test). NULLs are
    * dropped (`k IN (3, NULL)` is only ever TRUE via 3); mixed
    * columns, casts, and non-literal elements contribute nothing. */
  def impliedInSets(c: Column): Seq[(String, Seq[Any])] = {
    import org.apache.spark.sql.internal._
    def name(n: ColumnNode): Option[String] = n match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case _ => None
    }
    def litOf(n: ColumnNode): Option[Any] = n match {
      case l: Literal => Option(l.value)
      case _ => None
    }
    def eqPair(n: ColumnNode): Option[(String, Any)] = n match {
      case f: UnresolvedFunction
        if Set("=", "==", "<=>")(f.functionName) && f.arguments.size == 2 =>
        val Seq(a, b) = f.arguments
        (name(a), litOf(b), name(b), litOf(a)) match {
          case (Some(cn), Some(v), _, _) => Some((cn, v))
          case (_, _, Some(cn), Some(v)) => Some((cn, v))
          case _ => None
        }
      case _ => None
    }
    def orValues(n: ColumnNode): Option[(String, Seq[Any])] = n match {
      case f: UnresolvedFunction
        if f.functionName.equalsIgnoreCase("or") && f.arguments.size == 2 =>
        for {
          (cl, vl) <- orValues(f.arguments(0))
          (cr, vr) <- orValues(f.arguments(1))
          if cl == cr
        } yield (cl, vl ++ vr)
      case other => eqPair(other).map { case (cn, v) => (cn, Seq(v)) }
    }
    def walk(n: ColumnNode): Seq[(String, Seq[Any])] = n match {
      case f: UnresolvedFunction =>
        (f.functionName.toLowerCase(java.util.Locale.ROOT),
          f.arguments) match {
          case ("and", Seq(l, r)) => walk(l) ++ walk(r)
          case ("in", colNode +: vals) if vals.nonEmpty =>
            name(colNode).flatMap { cn =>
              val allLit = vals.forall {
                case _: Literal => true
                case _ => false // a non-literal element defeats provability
              }
              if (!allLit) None
              else Some((cn, vals.collect {
                case l: Literal if l.value != null => l.value }))
            }.filter(_._2.nonEmpty).toSeq
          case ("or", _) => orValues(f).filter(_._2.nonEmpty).toSeq
          case _ => Nil
        }
      case other => parsedSql(other).toSeq.flatMap(catInSets)
    }
    walk(c.node)
  }
}
