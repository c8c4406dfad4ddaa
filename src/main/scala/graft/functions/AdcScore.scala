package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The PQ ADC (asymmetric distance computation) table-lookup sum in
  * ONE fused pass — the codes-scan inner loop of every IVF-PQ probe
  * (single-query [[graft.operators.Similarity.pqRankWith]] with the
  * table a folded literal; batched probes with the table a broadcast
  * per-row column).
  *
  * Parity contract (pinned by DecimalFoldParitySpec against the HOF
  * form it replaces): the result double is bit-identical to
  *
  * {{{
  *   aggregate(
  *     zip_with(codes, sequence(lit(0), lit(m - 1)),
  *       (c, s0) => element_at(tbl, s0 * k + c.cast("int") + 1)),
  *     lit(0.0), (acc, v) => acc + v)
  * }}}
  *
  * i.e. Σ_{s0 = 0..m-1} tbl[s0·k + codes[s0]] as a left-to-right IEEE
  * double fold from 0.0. NULL exactly when the HOF form is NULL: the
  * codes array's length differs from m (zip_with pads the shorter side
  * with nulls), or a code or table slot is null. A lookup index
  * outside the table yields NULL here, where the HOF's element_at
  * throws under Spark 4's default ANSI mode (nulls non-ANSI) — codes
  * are in [0, k-1] by construction (the encoder's argmin over cid) and
  * the table is exactly m·k slots, so the branch is unreachable at
  * every call site; likewise element_at's negative-index-from-the-end
  * arm is deliberately not replicated.
  *
  * vs the HOF form: no per-row zip_with array build, no interpreted
  * lambda dispatch per subspace, and — as important at serving time —
  * ONE expression node instead of the ~4·m·k-node tree the m·k
  * literal table unrolled into (Catalyst planning time on the serving
  * lanes was comparable to the jobs themselves).
  */
case class AdcScore(left: Expression, right: Expression, m: Int, k: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(m >= 1 && k >= 1, s"adc_score: bad geometry m=$m k=$k")

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(ByteType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_score"

  override def nullSafeEval(codes: Any, tbl: Any): Any =
    AdcScore.compute(codes.asInstanceOf[ArrayData],
      tbl.asInstanceOf[ArrayData], m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lg = left.genCode(ctx); val rg = right.genCode(ctx)
    val boxed = ctx.freshName("adc")
    ev.copy(code = code"""
      ${lg.code}
      ${rg.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${lg.isNull} && !${rg.isNull}) {
        java.lang.Double $boxed = graft.functions.AdcScore.compute(
          ${lg.value}, ${rg.value}, $m, $k);
        if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object AdcScore {
  def compute(codes: ArrayData, tbl: ArrayData, m: Int, k: Int): java.lang.Double = {
    if (codes.numElements() != m) return null // zip_with null-pads
    val len = tbl.numElements()
    var acc = 0.0
    var s0 = 0
    while (s0 < m) {
      if (codes.isNullAt(s0)) return null
      val idx = s0 * k + codes.getByte(s0).toInt // 0-based slot
      if (idx < 0 || idx >= len || tbl.isNullAt(idx)) return null
      acc += tbl.getDouble(idx)
      s0 += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
