package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** MinHash signature over a shingle array as a native expression — the
  * production family (the md5-string family drives the oracle-checked
  * queries; this one drives cluster-scale dedup signatures).
  *
  * Semantics match `graft.ops.Dedup.minhashFast`'s HOF formulation
  * EXACTLY: element i of the signature is min over shingles s of
  * `xxhash64(i, s)` (Spark's built-in, seed 42, hashing the int i then
  * the string — replicated here via the same `XxHash64Function` chain,
  * including the built-in's null-element behavior where a null shingle
  * contributes the int-only prefix hash). The HOF form pays k
  * interpreted `transform`/`array_min` passes with an array allocation
  * per (element, perm); this expression makes one tight loop per row —
  * one static method shared by the interpreted and generated paths
  * (the `VecDot` pattern). An empty shingle array yields an all-null
  * signature, as `array_min` of an empty array does. */
case class MinHash64(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if k > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash64 requires k > 0, got $k")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash64 requires array<string>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    MinHash64.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash64.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHash64 =
    copy(child = newChild)
}

object MinHash64 {
  def of(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHash64(ColumnBridge.expression(shingles), k))

  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k)) // all null
    // xxhash64(i, s) chains: seed 42 → int i → string s; the int prefix
    // depends only on the permutation index, so hash it once per perm
    val seeds = new Array[Long](k)
    var p = 0
    while (p < k) {
      seeds(p) = XxHash64Function.hash(p, IntegerType, 42L)
      p += 1
    }
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        // built-in xxhash64 skips null children: the element's hash is
        // the int-only prefix — mirror it so min sets are identical
        p = 0
        while (p < k) { if (seeds(p) < mins(p)) mins(p) = seeds(p); p += 1 }
      } else {
        val s = arr.getUTF8String(i)
        p = 0
        while (p < k) {
          val h = XxHash64Function.hash(s, StringType, seeds(p))
          if (h < mins(p)) mins(p) = h
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
