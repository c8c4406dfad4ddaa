package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All K MinHash signature minima in ONE pass over the token array.
  *
  * Parity contract: element i equals `min(md5('i:' || token))` over the
  * array's non-null tokens — the exact aggregate the DuckDB oracle
  * renders (d3/d4) — because lowercase-hex encoding is monotonic in
  * digest byte order, so comparing raw 16-byte digests unsigned picks
  * the same minimum as comparing hex strings lexicographically. The hex
  * encode then happens K times per ROW instead of K times per token.
  *
  * vs the explode + K×`min(md5(concat))` aggregate form it replaces:
  * no explode inflation (a 1k-token doc became 1k rows), no grouped
  * aggregation (and at 100 TB no map-side hash table keyed by doc), no
  * per-token UTF8String concat/hex allocations — just K digests per
  * token folded into K running 16-byte minima. Stays inside
  * WholeStageCodegen (the generated code calls one static method).
  *
  * An empty or all-null token array yields an array of K nulls (the
  * aggregate form would yield no row / null mins; callers filter empty
  * docs first, as d3 does with `size(ts) >= 3`).
  */
case class MinHashSigs(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1 && k <= 1024, s"signature width $k out of range")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(a: Any): Any =
    MinHashSigs.compute(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashSigs.compute($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigs {
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Seed prefixes "0:", "1:", … as bytes, grown on demand (k is fixed
    * per query plan, so this settles immediately). */
  @volatile private var prefixes: Array[Array[Byte]] = Array.empty
  private def prefixesFor(k: Int): Array[Array[Byte]] = {
    val cur = prefixes
    if (cur.length >= k) cur
    else synchronized {
      if (prefixes.length < k)
        prefixes = Array.tabulate(k)(i => s"$i:".getBytes("UTF-8"))
      prefixes
    }
  }

  private val HEX = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HEX(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** dig < cur, comparing bytes as unsigned (== hex-string order). */
  private def less(dig: Array[Byte], cur: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val a = dig(i) & 0xff
      val b = cur(i) & 0xff
      if (a != b) return a < b
      i += 1
    }
    false
  }

  def compute(tokens: ArrayData, k: Int): ArrayData = {
    val pfx = prefixesFor(k)
    val md = md5.get()
    val mins = new Array[Array[Byte]](k)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val tok = tokens.getUTF8String(t).getBytes
        var i = 0
        while (i < k) {
          md.reset()
          md.update(pfx(i))
          md.update(tok)
          val dig = md.digest()
          if (mins(i) == null || less(dig, mins(i))) mins(i) = dig
          i += 1
        }
      }
      t += 1
    }
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      out(i) = if (mins(i) == null) null else hex(mins(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}
