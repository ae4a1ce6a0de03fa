package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash over a token array as a native expression — the
  * production fingerprint family (the md5-nibble 16-bit form drives the
  * oracle-checked queries; this one drives cluster-scale dedup).
  *
  * Semantics match `graft.ops.Dedup.simhash64`'s HOF formulation exactly:
  * bit j of the fingerprint is set iff Σ_tokens (±1 by bit j of
  * xxhash64(token, seed 42)) ≥ 0 — but that formulation folds the array
  * 64 times through interpreted lambda dispatch; this expression makes
  * ONE pass per row in a tight loop (hash each token once, update 64
  * vote counters), called as a single static method from both the
  * interpreted and the generated code path (the `VecDot` pattern). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** [[SimHash64]] with the md5 hash family: token j's vote for bit j is
  * bit j of the 64-bit value spelled by the FIRST 16 hex chars of
  * md5(token) — arithmetic a SQL oracle (DuckDB `md5` + per-nibble
  * shifts) replicates exactly, so the 64-bit band-blocking dedup path is
  * value-verifiable end to end. xxhash64 ([[SimHash64]]) remains the
  * production family (no digest allocation, ~4× cheaper); both run the
  * identical vote/threshold algebra. */
case class SimHash64Md5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64_md5"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64_md5 requires array<string>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    SimHash64Md5.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64Md5.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Md5 =
    copy(child = newChild)
}

object SimHash64Md5 {
  def of(toks: Column): Column =
    ColumnBridge.column(SimHash64Md5(ColumnBridge.expression(toks)))

  // MessageDigest is stateful and not thread-safe; one per executor thread.
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** One pass: md5 each token once, take the digest's first 8 bytes as a
    * big-endian 64-bit value (= the first 16 lowercase hex chars), vote
    * ±1 per bit, set result bits where the vote is non-negative. A
    * single-token document's fingerprint is therefore the token's hash
    * value itself. Null tokens abstain (as in [[SimHash64.compute]]). */
  def compute(arr: ArrayData): Long = {
    val md = md5Local.get()
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) >= 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

object SimHash64 {
  def of(toks: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(toks)))

  /** One pass: hash each token once (xxhash64, Spark's default seed 42 —
    * identical to the built-in `xxhash64(token)`), vote ±1 per bit, set
    * result bits where the vote is non-negative. Null tokens abstain
    * (match the HOF form, where hash of null propagates to 0 votes). */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) >= 0) out |= (1L << j)
      j += 1
    }
    out
  }
}
