package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** A minimal, self-describing bloom filter built as a typed
  * [[Aggregator]] over `xxhash64(col)` values — the per-file membership
  * sketch behind the warehouse's point-lookup file skipping.
  *
  * Spark's own `bloom_filter_agg` is not exposed in the public function
  * registry (it exists for the runtime-filter rewrite), so the sketch
  * format here is ours end to end: the executors build it through this
  * aggregator (map-side partial merge like any agg buffer), and the
  * driver probes the serialized bytes directly when pruning a manifest
  * — both sides share [[positions]], the Kirsch–Mitzenmacher double
  * hashing scheme (k bit positions derived from one 64-bit hash:
  * `pos_i = h1 + i·h2 mod m`), so no second hash of the data is needed.
  *
  * Serialized layout: [version: 1 byte][k: int][numBits: int][words:
  * numBits/64 longs], big-endian. A sketch has no false negatives by
  * construction; false positives only cost reading a file the residual
  * filter then empties.
  */
object BloomSketch {

  val Version: Byte = 1

  /** Optimal hash count for `numBits` bits and `items` expected keys. */
  def optimalK(numBits: Long, items: Long): Int =
    math.max(1, math.round(numBits.toDouble / math.max(items, 1) * math.log(2)).toInt)

  /** The k bit positions of `hash` in an m-bit filter. */
  def positions(hash: Long, k: Int, numBits: Int): Array[Int] = {
    val h1 = hash & 0xFFFFFFFFL
    val h2 = hash >>> 32
    Array.tabulate(k)(i =>
      java.lang.Math.floorMod(h1 + i.toLong * h2, numBits.toLong).toInt)
  }

  def serialize(k: Int, numBits: Int, words: Array[Long]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(1 + 4 + 4 + words.length * 8)
    buf.put(Version).putInt(k).putInt(numBits)
    words.foreach(buf.putLong)
    buf.array()
  }

  /** Probe a serialized sketch. Unparseable bytes → true (keep the
    * file — the safe direction). */
  def mightContain(sketch: Array[Byte], hash: Long): Boolean =
    try {
      val buf = java.nio.ByteBuffer.wrap(sketch)
      if (buf.get() != Version) true
      else {
        val k = buf.getInt
        val numBits = buf.getInt
        val base = buf.position()
        positions(hash, k, numBits).forall { p =>
          (buf.getLong(base + (p >>> 6) * 8) & (1L << (p & 63))) != 0
        }
      }
    } catch { case _: RuntimeException => true }

  /** One bloom filter per group over pre-hashed values. The buffer is a
    * plain long bitset: reduce sets k bits, merge ORs — associative and
    * commutative, so Spark's partial aggregation applies unchanged. */
  final class Agg(numBits: Int, k: Int)
      extends Aggregator[Long, Array[Long], Array[Byte]] {
    require(numBits % 64 == 0 && numBits > 0, s"numBits must be a positive multiple of 64: $numBits")

    def zero: Array[Long] = new Array[Long](numBits / 64)

    def reduce(b: Array[Long], hash: Long): Array[Long] = {
      positions(hash, k, numBits).foreach(p => b(p >>> 6) |= (1L << (p & 63)))
      b
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    def finish(b: Array[Long]): Array[Byte] = serialize(k, numBits, b)

    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }
}
