package graft

import org.apache.spark.sql.functions._
import graft.ops.Validate
import graft.ops.Validate._

/** One-pass corpus validation: report values against a hand model,
  * fail-loud gating with constraint names, null handling. */
class ValidateSpec extends SparkSpec {
  import spark.implicits._

  // 3 violations planted: one null name, one dup id, one out-of-range v
  private def corpus = Seq(
    (1L, "alice", 10L), (2L, "bob", 20L), (2L, "carol", 30L),
    (4L, null, 40L), (5L, "erin", 999L)
  ).toDF("id", "name", "v")

  test("report counts each violation class exactly") {
    val got = Validate.report(corpus, Seq(
      NotNull("name"), Unique("id"), InRange("v", 0L, 100L),
      MinRows(10L), DistinctAtLeast("name", 4L), Matches("name", "^[a-z]+$")))
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("distinct_at_least(name,4)", 4L, 4L, true),
      ("in_range(v,0,100)", 1L, 0L, false),
      ("matches(name)", 0L, 0L, true),
      ("min_rows(10)", 5L, 10L, false),
      ("not_null(name)", 1L, 0L, false),
      ("unique(id)", 1L, 0L, false)), got.mkString("\n"))
  }

  test("expect raises naming every violated constraint; passes clean data") {
    val e = intercept[IllegalArgumentException] {
      Validate.expect(corpus, Seq(Unique("id"), NotNull("name")))
    }
    assert(e.getMessage.contains("unique(id)") &&
      e.getMessage.contains("not_null(name)") &&
      e.getMessage.contains("observed=1"))
    val clean = Validate.expect(corpus.filter(col("id") < 2L),
      Seq(Unique("id"), NotNull("name"), MinRows(1L)))
    assert(clean.count() == 1)
  }

  test("all-null column and unique over nulls don't miscount") {
    val df = Seq((1L, Option.empty[String]), (2L, None), (3L, None))
      .toDF("id", "s")
    val got = Validate.report(df, Seq(NotNull("s"), Unique("s"), Unique("id")))
      .as[(String, Long, Long, Boolean)].collect().toSeq
    // unique(s): 3 rows - 0 distinct - 3 nulls = 0 dup violations
    assert(got == Seq(
      ("not_null(s)", 3L, 0L, false),
      ("unique(id)", 0L, 0L, true),
      ("unique(s)", 0L, 0L, true)), got.mkString("\n"))
  }
}
