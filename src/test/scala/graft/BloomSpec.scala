package graft

import org.apache.spark.sql.functions._
import graft.functions.{Bloom64, Fnv64}
import graft.ops.Decontaminate

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("bloom admits every inserted key (no false negatives) and rejects most others") {
    val keys = (0 until 2000).map(i => s"member-$i")
    val bits = Bloom64.build(
      keys.toDF("s").select(Fnv64.of(col("s")).as("h")), mBits = 1 << 15, k = 4)
    assert(bits.length == (1 << 15) / 8)
    val members = keys.toDF("s")
      .filter(Bloom64.of(lit(bits), Fnv64.of(col("s")), 4)).count()
    assert(members === 2000L, "a false negative breaks exactness — forbidden")
    // ~2000 keys in 32768 bits ≈ 0.49 bits load; k=4 → fpp well under 10%
    val strangers = (0 until 2000).map(i => s"stranger-$i").toDF("s")
      .filter(Bloom64.of(lit(bits), Fnv64.of(col("s")), 4)).count()
    assert(strangers < 200L, s"fpp implausibly high: $strangers/2000 admitted")
  }

  test("bloom_contains agrees between codegen, interpreted eval and SQL registration") {
    Fnv64.register(spark)
    val keys = (0 until 500).map(i => s"k$i")
    val bits = Bloom64.build(
      keys.toDF("s").select(Fnv64.of(col("s")).as("h")), mBits = 1 << 12, k = 3)
    val probe = ((0 until 500).map(i => s"k$i") ++
      (0 until 500).map(i => s"x$i")).toDF("s")
    val viaCol = probe
      .select(col("s"), Bloom64.of(lit(bits), Fnv64.of(col("s")), 3).as("m"))
      .orderBy("s").collect().map(r => (r.getString(0), r.getBoolean(1)))
    val viaSql = probe.createOrReplaceTempView("probe_t")
    val sqlRows = spark.sql(
      s"SELECT s, bloom_contains(${bitsLiteral(bits)}, fnv64(s), 3) AS m " +
        "FROM probe_t ORDER BY s").collect()
      .map(r => (r.getString(0), r.getBoolean(1)))
    assert(viaCol.toSeq === sqlRows.toSeq)
    // interpreted path (no codegen): direct static-method evaluation
    viaCol.foreach { case (s, m) =>
      assert(m === Bloom64.contains(bits,
        Fnv64.hashBytes(s.getBytes("UTF-8")), 3))
    }
  }

  private def bitsLiteral(bits: Array[Byte]): String =
    "X'" + bits.map(b => f"$b%02X").mkString + "'"

  test("contaminatedBloom output is identical to the exact contaminated()") {
    val corpus = docs.filter(col("doc_id") >= 50)
    val bench = docs.filter(col("doc_id") < 50)
    val exact = Decontaminate.contaminated(corpus, bench, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // deliberately small filter: heavy false-positive load must still
    // verify away to the exact answer
    val bloom = Decontaminate.contaminatedBloom(
      corpus, bench, "doc_id", "text", n = 5, mBits = 1 << 12, k = 2)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(exact.nonEmpty, "fixture must actually contain contamination")
    assert(bloom.toSeq === exact.toSeq)
  }

  test("empty benchmark: zero bits, zero hits, no crash") {
    val bench = docs.filter(lit(false))
    val bits = Bloom64.build(
      bench.select(Fnv64.of(col("text")).as("h")), mBits = 1 << 10, k = 3)
    assert(bits.length === (1 << 10) / 8 && bits.forall(_ == 0))
    val out = Decontaminate.contaminatedBloom(
      docs, bench, "doc_id", "text", n = 5, mBits = 1 << 10, k = 3)
    assert(out.count() === 0L)
  }

  test("corpus side of the bloom prefilter is map-only: no shuffle below the probe") {
    val corpus = docs.filter(col("doc_id") >= 50)
    val bench = docs.filter(col("doc_id") < 50)
    val plan = Decontaminate.contaminatedBloom(
      corpus, bench, "doc_id", "text", n = 5, mBits = 1 << 14, k = 4)
      .queryExecution.executedPlan.toString
    // the corpus branch prints Filter(bloom_contains) → Generate →
    // … → FileScan(doc_id >= 50): walk up from the corpus scan to its
    // probe and require no Exchange in between — the gram explode +
    // bit probe must not repartition the corpus
    val lines = plan.linesIterator.toVector
    val scanIdx = lines.indexWhere(_.contains("GreaterThanOrEqual(doc_id,50)"))
    assert(scanIdx >= 0, s"corpus scan missing from plan:\n$plan")
    val probeIdx = lines.lastIndexWhere(_.contains("bloom_contains"), scanIdx)
    assert(probeIdx >= 0, s"bloom probe missing above the corpus scan:\n$plan")
    val between = lines.slice(probeIdx + 1, scanIdx)
    assert(!between.exists(_.contains("Exchange")),
      s"corpus stream below the bloom probe must stay map-only:\n$plan")
  }
}
