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
            case (op, Seq(a, b)) =>
              (name(a), litOf(b), name(b), litOf(a)) match {
                case (Some(cn), Some(v), _, _) => bound(op, cn, v, flipped = false)
                case (_, _, Some(cn), Some(v)) => bound(op, cn, v, flipped = true)
                case _ => Nil
              }
            case _ => Nil
          }
        case _ => Nil
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
      case _ => Nil
    }
    walk(c.node)
  }
}
