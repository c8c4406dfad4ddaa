package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, NumericType}

/** Z-order (Morton) interleave for multi-column clustering.
  *
  * Linear `clusterBy(x, y)` gives files narrow `x` ranges but each file
  * still spans the full `y` range — a `y`-only predicate skips nothing.
  * Interleaving the bits of `x` and `y` into one sort key makes every
  * contiguous key range a small rectangle in (x, y) space, so files
  * (which cover contiguous key ranges after a range repartition) get
  * narrow min/max on BOTH columns and predicates on any subset of the
  * cluster columns skip files.
  *
  * The z-value is built purely from `org.apache.spark.sql.functions`
  * arithmetic — `floor`/`shiftright`/`bitwiseAND`/`shiftleft` — so the
  * whole computation stays inside whole-stage codegen; no UDF, no extra
  * serialization. Each column is scaled into a 16-bit lane using the
  * written batch's own min/max (one driver-side agg over just those
  * columns). Batch-relative scaling affects only cross-batch locality:
  * correctness of stats-based skipping never depends on z-values, which
  * are dropped before the rows hit disk.
  */
object ZOrder {

  /** Bits per column lane; 16 bits ≈ 65k distinct cells per dimension,
    * far finer than any realistic file count. */
  val Bits = 16

  /** The interleaved z-value column for `cols` (numeric or date — the
    * date axis is the most common cluster key; it enters its lane as
    * days-since-epoch), scaled by `df`'s min/max. Null values sort
    * with the minimum lane cell. */
  def zvalue(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.nonEmpty, "zvalue needs at least one column")
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt.isInstanceOf[NumericType] || dt == DateType,
        s"zorder column $c must be numeric or date, got $dt")
    }
    def lane(c: String): Column =
      if (df.schema(c).dataType == DateType) unix_date(col(c)).cast("double")
      else col(c).cast("double")
    val aggs = cols.flatMap(c => Seq(
      min(lane(c)).as(s"__mn_$c"), max(lane(c)).as(s"__mx_$c")))
    val bounds = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val maxCell = (1L << Bits) - 1
    val lanes: Seq[Column] = cols.zipWithIndex.map { case (c, _) =>
      val mn = Option(bounds.getAs[Any](s"__mn_$c"))
        .map(_.asInstanceOf[Double]).getOrElse(0d)
      val mx = Option(bounds.getAs[Any](s"__mx_$c"))
        .map(_.asInstanceOf[Double]).getOrElse(0d)
      val scaled =
        if (mx <= mn) lit(0L) // constant (or empty) column: one cell
        else least(greatest(
          floor((lane(c) - lit(mn)) / lit(mx - mn) * maxCell).cast("long"),
          lit(0L)), lit(maxCell))
      when(col(c).isNull, lit(0L)).otherwise(scaled)
    }
    val n = cols.size
    // bit i of lane j lands at position i*n + j; lanes are disjoint so
    // the sum is a bitwise-or, and the whole thing folds into one
    // codegen'd arithmetic expression
    val terms = for {
      i <- 0 until Bits
      j <- 0 until n
    } yield shiftleft(shiftright(lanes(j), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ + _)
  }
}
