package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The sorted DISTINCT md5 digests of a token array's word n-grams in
  * ONE fused pass — the [[SimHash32]] treatment applied to the
  * contamination family's per-row gram dedup
  * ([[graft.operators.Dedup.sortedGramDigests]] +
  * [[graft.operators.Dedup.adjacentDistinct]]), which r17 made
  * row-local (killing the corpus-wide digest Exchange) at the cost of
  * interpreted higher-order-function CPU: per gram, a `concat_ws` over
  * n `element_at` calls, an md5 over the built string, then an
  * interpreted `array_sort` comparator and a `filter` lambda with one
  * more `element_at` per element. This expression produces the
  * identical array with zero interpreted dispatch: token bytes are
  * read once per row, each gram is digested incrementally
  * (md.update(token); md.update(' ')— no gram string is ever built),
  * digests sort as raw 16-byte unsigned values (== lowercase-hex
  * lexicographic order, the [[MinHashSigs]] monotonicity argument),
  * adjacent duplicates drop, and the hex encode happens once per
  * SURVIVING gram.
  *
  * Parity contract (pinned by DecimalFoldParitySpec): equal to
  *
  * {{{
  *   filter(sorted, (x, i) => i === 0 || x =!= element_at(sorted, i))
  *   // over sorted = array_sort(transform(shingles(toks, n), md5))
  *   // where shingles = transform(sequence(1, size - (n-1)),
  *   //   i => concat_ws(" ", element_at(toks, i), …, element_at(toks, i + n-1)))
  * }}}
  *
  * for every array with size(toks) >= n and no null tokens — the only
  * shape the call sites feed it (each filters `size(ts) >= n` first,
  * and `split` never yields nulls). For size < n it returns an empty
  * array (the composed form's `sequence(1, size-(n-1))` would walk
  * BACKWARD into element_at(toks, 0) — an error the call-site filter
  * exists to preclude); null tokens are skipped within a gram exactly
  * like concat_ws skips them. A null array is null.
  */
case class GramDigests(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1 && n <= 64, s"gram_digests: width $n out of range")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "gram_digests"

  override def nullSafeEval(a: Any): Any =
    GramDigests.compute(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.GramDigests.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramDigests {
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
  private val SPACE = Array(' '.toByte)
  private val HEX = "0123456789abcdef".getBytes

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned 16-byte comparison — identical order to comparing the
    * lowercase-hex encodings as UTF8Strings (hex is monotonic in
    * unsigned byte order). */
  private val CMP: java.util.Comparator[Array[Byte]] =
    new java.util.Comparator[Array[Byte]] {
      override def compare(a: Array[Byte], b: Array[Byte]): Int = {
        var i = 0
        while (i < 16) {
          val d = (a(i) & 0xff) - (b(i) & 0xff)
          if (d != 0) return d
          i += 1
        }
        0
      }
    }

  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val t = tokens.numElements()
    val g = t - n + 1
    if (g <= 0) return new GenericArrayData(Array.empty[Any])
    // token bytes once per row (each token participates in up to n grams)
    val toks = new Array[Array[Byte]](t)
    var i = 0
    while (i < t) {
      toks(i) = if (tokens.isNullAt(i)) null
        else tokens.getUTF8String(i).getBytes
      i += 1
    }
    val md = md5.get()
    val digs = new Array[Array[Byte]](g)
    var s = 0
    while (s < g) {
      md.reset()
      var j = 0
      var first = true
      while (j < n) {
        val tok = toks(s + j)
        if (tok != null) { // concat_ws skips nulls (never fed by split)
          if (!first) md.update(SPACE)
          md.update(tok)
          first = false
        }
        j += 1
      }
      digs(s) = md.digest()
      s += 1
    }
    java.util.Arrays.sort(digs, CMP)
    val out = new Array[Any](g)
    var w = 0
    i = 0
    while (i < g) {
      if (i == 0 || CMP.compare(digs(i), digs(i - 1)) != 0) {
        out(w) = hex(digs(i))
        w += 1
      }
      i += 1
    }
    new GenericArrayData(if (w == g) out else java.util.Arrays.copyOf(
      out.asInstanceOf[Array[AnyRef]], w).asInstanceOf[Array[Any]])
  }
}
