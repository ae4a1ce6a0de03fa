package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.op.Compactor

/** P8 semantics: property-check the compactor against a naive
  * event-by-event replay (the reference's integrity loop in miniature —
  * `batchmessage.go:25-105` incl. inDB inference, insert-then-delete
  * cancellation, delete-then-insert ⇒ update). */
class CompactorSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("seq", LongType), StructField("pk", LongType),
    StructField("tbl", StringType), StructField("op", StringType),
    StructField("r_id", LongType, nullable = true),
    StructField("r_k", IntegerType, nullable = true),
    StructField("r_v", DoubleType, nullable = true)))

  private case class Ev(seq: Long, pk: Long, op: String, k: Int)

  /** Naive replay: fold events per key in order; derive the net effect. */
  private def replay(events: Seq[Ev]): Map[Long, (String, Option[Int], Long)] = {
    events.groupBy(_.pk).flatMap { case (pk, evs) =>
      val sorted = evs.sortBy(_.seq)
      val firstOp = sorted.head.op
      val lastOp = sorted.last.op
      val inDb = firstOp != "insert"
      val lastUpsert = sorted.filter(_.op != "delete").lastOption
      val netOp =
        if (lastOp == "delete") { if (inDb) Some("delete") else None }
        else if (inDb) Some("update")
        else Some("insert")
      netOp.map { op =>
        val k = if (op == "delete") None else lastUpsert.map(_.k)
        pk -> (op, k, sorted.last.seq)
      }
    }
  }

  private val opGen = Gen.oneOf("insert", "update", "delete")
  private val eventsGen: Gen[List[Ev]] = for {
    n <- Gen.choose(1, 60)
    evs <- Gen.listOfN(n, for {
      pk <- Gen.choose(0L, 7L)
      op <- opGen
      k <- Gen.choose(0, 99)
    } yield Ev(0, pk, op, k))
  } yield evs.zipWithIndex.map { case (e, i) => e.copy(seq = i.toLong) }

  test("compact equals naive replay on random op sequences") {
    val prop = Prop.forAll(eventsGen) { evs =>
      val rows = evs.map(e => Row(e.seq, e.pk, "t", e.op,
        if (e.op == "delete") null else e.pk,
        if (e.op == "delete") null else e.k,
        if (e.op == "delete") null else e.k.toDouble))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      val got = Compactor.compact(df).collect()
        .map(r => r.getLong(1) -> (r.getString(2),
          Option(r.get(4)).map(_.asInstanceOf[Int]), r.getLong(6))).toMap
      got == replay(evs)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("typed Aggregator equals the SQL compaction on the events changelog") {
    import spark.implicits._
    import graft.model.{FlatEvent, NetRow}
    val flat = graft.source.Changelog.fromEvents(spark, sf)
      .selectExpr("seq", "pk", "tbl", "op", "r_id", "r_k", "r_v")
      .as[FlatEvent]
    val typed = Compactor.compactTyped(flat).collect()
      .map(n => (n.tbl, n.pk) -> ((n.net_op, n.last_seq, n.r_k))).toMap
    val sql = Compactor.compact(flat.toDF()).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(6), Option(r.get(4)).map(_.asInstanceOf[Int])))).toMap
    assert(typed == sql)
    assert(typed.nonEmpty)
  }

  test("insert-then-delete cancels; delete-then-insert is update") {
    val evs = Seq(
      Ev(0, 1, "insert", 10), Ev(1, 1, "delete", 0), // born+killed -> no row
      Ev(2, 2, "delete", 0), Ev(3, 2, "insert", 20), // existed -> net update
      Ev(4, 3, "insert", 30), Ev(5, 3, "update", 31)) // new -> net insert
    val rows = evs.map(e => Row(e.seq, e.pk, "t", e.op,
      if (e.op == "delete") null else e.pk,
      if (e.op == "delete") null else e.k,
      if (e.op == "delete") null else e.k.toDouble))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val got = Compactor.compact(df).collect()
      .map(r => r.getLong(1) -> (r.getString(2), Option(r.get(4)))).toMap
    assert(!got.contains(1L))
    assert(got(2L)._1 == "update" && got(2L)._2.contains(20))
    assert(got(3L)._1 == "insert" && got(3L)._2.contains(31))
  }
}
