package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Membership test against a flat bloom-bit array, as a native
  * codegen'd expression.
  *
  * The filter exists for the broadcast-size problem: shipping a large
  * exact key set (benchmark n-grams, stop-lists, known-bad ids) to
  * every task costs GBs at corpus scale, while a bloom over the same
  * keys costs ~10 bits/key for a ~1% false-positive rate. A bloom hit
  * is then confirmed by an exact join over the (tiny) surviving stream,
  * so false positives cost only wasted verify work — never wrong
  * output — and false negatives are impossible by construction.
  *
  * Layout contract: bit `p` of the filter lives at byte `p >>> 3`, bit
  * `p & 7` — the little-endian flattening of the `Array[Long]` build
  * buffer ([[BloomAgg]] packs it with `ByteOrder.LITTLE_ENDIAN`). The
  * k probe positions derive from one 64-bit key hash by double hashing
  * (Kirsch–Mitzenmacher): `p_i = (h1 + i*h2) mod m` with `h2` forced
  * odd, so build and probe agree given the same (hash, k, m). */
case class BloomContains(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType && k > 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bloom_contains requires (binary bits, bigint hash) and k > 0, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString}), k=$k")

  override protected def nullSafeEval(bits: Any, hash: Any): Any =
    Bloom64.contains(bits.asInstanceOf[Array[Byte]], hash.asInstanceOf[Long], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) => s"graft.functions.Bloom64.contains($b, $h, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object Bloom64 {

  def of(bits: Column, hash: Column, k: Int): Column =
    ColumnBridge.column(BloomContains(
      ColumnBridge.expression(bits), ColumnBridge.expression(hash), k))

  /** Second hash for double hashing: an odd mix of the key hash so the
    * probe stride is coprime with the power-of-two bit count. */
  @inline private def h2(h: Long): Long =
    (java.lang.Long.rotateLeft(h, 31) ^ (h * Fnv64.Prime)) | 1L

  def contains(bits: Array[Byte], h: Long, k: Int): Boolean = {
    val m = bits.length.toLong << 3
    val step = h2(h)
    var i = 0
    while (i < k) {
      val p = java.lang.Long.remainderUnsigned(h + i * step, m)
      if ((bits((p >>> 3).toInt) & (1 << (p & 7).toInt)) == 0) return false
      i += 1
    }
    true
  }

  /** Set the k probe bits for hash `h` in a long-array build buffer
    * (same flat bit indexing as [[contains]] after little-endian
    * flattening). */
  def set(buf: Array[Long], h: Long, k: Int): Unit = {
    val m = buf.length.toLong << 6
    val step = h2(h)
    var i = 0
    while (i < k) {
      val p = java.lang.Long.remainderUnsigned(h + i * step, m)
      buf((p >>> 6).toInt) |= 1L << (p & 63).toInt
      i += 1
    }
  }

  def toBytes(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  /** Distributed bloom build over a `Dataset[Long]` of key hashes:
    * partial bit arrays OR-merge — one bounded `m/8`-byte value reaches
    * the driver regardless of key count. `mBits` must be a power of two
    * (cheap modulo in the probe loop is `remainderUnsigned`, so the
    * requirement is really just sizing hygiene) and is bounded to keep
    * the aggregation buffer executor-friendly. */
  final class BloomAgg(mBits: Int, k: Int)
      extends Aggregator[Long, Array[Long], Array[Byte]] {
    require(mBits >= 64 && mBits <= (1 << 30) && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two in [64, 2^30], got $mBits")
    def zero: Array[Long] = new Array[Long](mBits >>> 6)
    def reduce(b: Array[Long], h: Long): Array[Long] = { set(b, h, k); b }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Byte] = toBytes(b)
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build bloom bytes from a one-column DataFrame of long hashes. */
  def build(hashes: org.apache.spark.sql.DataFrame, mBits: Int, k: Int): Array[Byte] = {
    import org.apache.spark.sql.functions.col
    val ds = hashes.select(col(hashes.columns.head).cast("long").as("h"))
      .as[Long](Encoders.scalaLong)
    ds.select(new BloomAgg(mBits, k).toColumn).head()
  }
}
