package graft

import org.apache.spark.sql.functions._
import graft.functions.Fnv64

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("fnv64 matches the FNV-1a 64 reference vectors") {
    // vectors from the standard FNV-1a parameters
    // (offset 0xcbf29ce484222325, prime 0x100000001b3)
    assert(Fnv64.hashBytes("".getBytes("UTF-8")) == -3750763034362895579L)
    assert(Fnv64.hashBytes("a".getBytes("UTF-8")) == -5808556873153909620L)
    assert(Fnv64.hashBytes("abc".getBytes("UTF-8")) == -1792535898324117685L)
    assert(Fnv64.hashBytes("srcdb.sbtest1|42".getBytes("UTF-8")) == 3292804045996147429L)
  }

  test("fnv64 runs as a registered SQL function under codegen") {
    Fnv64.register(spark)
    // the full SQL surface: fnv64, vec_dot, simhash64 all registered
    val sqlRow = spark.sql(
      "SELECT vec_dot(array(1d,2d,3d), array(4d,5d,6d)) AS d, " +
        "simhash64(array('a','b')) AS s").collect().head
    assert(sqlRow.getDouble(0) == 32.0)
    assert(sqlRow.getLong(1) ==
      graft.functions.SimHash64.compute(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          Array(org.apache.spark.unsafe.types.UTF8String.fromString("a"),
            org.apache.spark.unsafe.types.UTF8String.fromString("b")))))
    val got = spark.sql("SELECT fnv64('abc') AS h, fnv64('') AS e").collect().head
    assert(got.getLong(0) == -1792535898324117685L)
    assert(got.getLong(1) == -3750763034362895579L)
    // column-expression use over data: deterministic bucket routing
    val df = Seq("a", "abc", "a").toDF("s")
    val buckets = df.selectExpr("pmod(fnv64(s), 8) AS b").as[Long].collect()
    assert(buckets(0) == buckets(2)) // same key -> same bucket
    assert(df.selectExpr("fnv64(s)").as[Long].collect().toSet.size == 2)
    // null propagates
    assert(spark.sql("SELECT fnv64(CAST(NULL AS STRING))").collect().head.isNullAt(0))
  }

  test("vec_dot raises on vector length mismatch (no silent truncation)") {
    val ok = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(ok.select(graft.functions.VecDot.dot(col("a"), col("b"))).head.getDouble(0) == 32.0)
    val bad = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(graft.functions.VecDot.dot(col("a"), col("b"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("length mismatch")), s"got: $e")
  }

  test("simhash64 expression matches the per-bit HOF formulation") {
    // the HOF spelling the expression replaced: 64 aggregate folds,
    // vote ±1 on bit j of xxhash64(token), bit set where vote >= 0
    def hofSimhash(toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (0 until 64).map { j =>
        val vote = aggregate(toks, lit(0), (acc, t) =>
          acc + when(shiftright(xxhash64(t), j).bitwiseAND(1) === 1, 1).otherwise(-1))
        when(vote >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
      }.reduce(_ + _)
    val docs = Seq(
      Array("the", "quick", "brown", "fox"),
      Array("the", "quick", "brown", "fax"),
      Array("completely", "different", "tokens", "here"),
      Array("x"),
      Array.empty[String]
    ).toDF("toks")
    val got = docs.select(
      graft.functions.SimHash64.of(col("toks")).as("e"),
      hofSimhash(col("toks")).as("h")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"expression ${r.getLong(0)} != HOF ${r.getLong(1)}"))
    // empty token array: all votes 0 (>= 0) -> all bits set, both forms
    assert(got.last.getLong(0) == -1L)
  }

  test("minhash64 expression matches the transform/array_min HOF formulation") {
    // the HOF spelling the expression replaced: per permutation i, the
    // min over shingles of the built-in xxhash64(i, s)
    def hofMinhash(sh: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
      transform(sequence(lit(0), lit(k - 1)),
        i => array_min(transform(sh, s => xxhash64(i, s))))
    val docs = Seq(
      Array("the quick brown", "quick brown fox", "brown fox jumps"),
      Array("one shingle"),
      Array.empty[String]
    ).toDF("sh")
    val got = docs.select(
      graft.functions.MinHash64.of(col("sh"), 8).as("e"),
      hofMinhash(col("sh"), 8).as("h")).collect()
    got.foreach(r => assert(r.getSeq[Any](0) == r.getSeq[Any](1),
      s"expression ${r.getSeq[Any](0)} != HOF ${r.getSeq[Any](1)}"))
    // empty shingle array: array_min(empty) is null per perm — both forms
    assert(got.last.getSeq[Any](0) == Seq.fill(8)(null))
    // null elements: the built-in skips null children, so a null shingle
    // contributes the int-only prefix hash — both forms must agree
    val withNull = spark.sql("SELECT array('a', CAST(NULL AS STRING), 'b') AS sh")
    val gn = withNull.select(
      graft.functions.MinHash64.of(col("sh"), 4).as("e"),
      hofMinhash(col("sh"), 4).as("h")).collect().head
    assert(gn.getSeq[Any](0) == gn.getSeq[Any](1))
    // SQL registration round-trip
    graft.functions.Fnv64.register(spark)
    val viaSql = spark.sql(
      "SELECT minhash64(array('x','y'), 4) AS s").collect().head.getSeq[Any](0)
    val viaCol = Seq(Array("x", "y")).toDF("sh")
      .select(graft.functions.MinHash64.of(col("sh"), 4)).collect().head.getSeq[Any](0)
    assert(viaSql == viaCol)
  }

  test("simhash64_md5 expression matches the per-bit HOF formulation") {
    // HOF spelling of the md5 family: bit j votes on bit j of the 64-bit
    // value spelled by the first 16 hex chars of md5(token) — decoded in
    // two conv() halves because the full 16-hex value can exceed Long
    def hofMd5Simhash(toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (0 until 64).map { j =>
        val half = if (j < 32) 9 else 1 // hex chars 9..16 = bits 31..0
        val vote = aggregate(toks, lit(0), (acc, t) =>
          acc + when(shiftright(conv(substring(md5(t), half, 8), 16, 10).cast("long"), j % 32)
            .bitwiseAND(1) === 1, 1).otherwise(-1))
        when(vote >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
      }.reduce(_ + _)
    val docs = Seq(
      Array("the", "quick", "brown", "fox"),
      Array("the", "quick", "brown", "fax"),
      Array("completely", "different", "tokens", "here"),
      Array("a"),
      Array.empty[String]
    ).toDF("toks")
    val got = docs.select(
      graft.functions.SimHash64Md5.of(col("toks")).as("e"),
      hofMd5Simhash(col("toks")).as("h")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"expression ${r.getLong(0)} != HOF ${r.getLong(1)}"))
    // single-token doc: fingerprint IS the token's 64-bit hash value —
    // md5('a') = 0cc175b9c0f1b6a8 31c399e269772661
    assert(got(3).getLong(0) == 0x0cc175b9c0f1b6a8L)
    // empty token array: all votes 0 (>= 0) -> all bits set
    assert(got.last.getLong(0) == -1L)
    // and via the registered SQL surface
    Fnv64.register(spark)
    assert(spark.sql("SELECT simhash64_md5(array('a')) AS s").collect().head.getLong(0)
      == 0x0cc175b9c0f1b6a8L)
  }

  test("GraftExtensions injects fnv64 via the extension point") {
    val ext = new graft.functions.GraftExtensions
    val builder = new org.apache.spark.sql.SparkSessionExtensions
    ext.apply(builder) // wiring is exercised; full-session injection needs
    // spark.sql.extensions at session build (spark-submit path)
  }
}
