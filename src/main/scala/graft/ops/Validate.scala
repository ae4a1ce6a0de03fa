package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass data-quality validation: declared expectations over a
  * corpus → a constraint report, with a fail-loud form for task
  * pipelines (the release gate a 100-TB pipeline runs before
  * publishing a corpus, and the K3-check ethos — verify, don't
  * assume — applied to corpus shape instead of replication).
  *
  * Scale shape: every expectation compiles to an aggregate over the
  * SAME single scan — counts are `sum(when(...))` lanes fused into one
  * HashAggregate; only `Unique`/`DistinctAtLeast` add count_distinct
  * legs (Catalyst expands them in the same pass). No joins, no
  * windows, no second read of the corpus. The report is |expectations|
  * rows regardless of corpus size.
  */
object Validate {

  sealed trait Expectation { def name: String }
  /** Column has no NULLs. */
  final case class NotNull(col: String) extends Expectation {
    val name = s"not_null($col)"
  }
  /** Column values are unique (a primary key). */
  final case class Unique(col: String) extends Expectation {
    val name = s"unique($col)"
  }
  /** Every non-null value in [lo, hi]. */
  final case class InRange(col: String, lo: Long, hi: Long) extends Expectation {
    val name = s"in_range($col,$lo,$hi)"
  }
  /** At least n rows. */
  final case class MinRows(n: Long) extends Expectation {
    val name = s"min_rows($n)"
  }
  /** At least n distinct values. */
  final case class DistinctAtLeast(col: String, n: Long) extends Expectation {
    val name = s"distinct_at_least($col,$n)"
  }
  /** Every non-null value matches the (engine-portable) regex. */
  final case class Matches(col: String, regex: String) extends Expectation {
    val name = s"matches($col)"
  }

  /** The report: one row per expectation — (constraint, observed,
    * bound, ok), ordered by constraint name. `observed` is the measured
    * count the constraint judges (violations for row-local constraints,
    * totals for cardinality ones); `bound` is the declared limit. */
  def report(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "no expectations declared")
    val aggs: Seq[Column] = expectations.map {
      case e: NotNull =>
        sum(when(col(e.col).isNull, 1L).otherwise(0L)).as(e.name)
      case e: Unique =>
        (count(lit(1)) - countDistinct(col(e.col)) -
          sum(when(col(e.col).isNull, 1L).otherwise(0L))).as(e.name)
      case e: InRange =>
        sum(when(col(e.col) < e.lo || col(e.col) > e.hi, 1L)
          .otherwise(0L)).as(e.name)
      case e: MinRows => count(lit(1)).as(e.name)
      case e: DistinctAtLeast => countDistinct(col(e.col)).as(e.name)
      case e: Matches =>
        sum(when(col(e.col).isNotNull && !col(e.col).rlike(e.regex), 1L)
          .otherwise(0L)).as(e.name)
    }
    // ONE action over the single agg row (bounded), then a local
    // relation — selecting per-expectation off the agg frame would
    // re-run the corpus scan once per constraint
    val needed = expectations.flatMap(cols).distinct
    val scan = if (needed.isEmpty) df else df.select(needed.map(col): _*)
    val one = scan.agg(aggs.head, aggs.tail: _*).collect().head
    val rows = expectations.zipWithIndex.map { case (e, i) =>
      val observed = if (one.isNullAt(i)) 0L
        else one.get(i) match {
          case l: Long => l
          case n: Number => n.longValue()
        }
      val (bound, ok) = e match {
        case _: NotNull | _: Unique | _: InRange | _: Matches =>
          (0L, observed <= 0L) // violation count must be zero
        case MinRows(n) => (n, observed >= n)
        case DistinctAtLeast(_, n) => (n, observed >= n)
      }
      org.apache.spark.sql.Row(e.name, observed, bound, ok)
    }
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows.sortBy(_.getString(0)): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("constraint",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("observed",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("bound",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("ok",
          org.apache.spark.sql.types.BooleanType, nullable = false))))
  }

  /** The columns an expectation reads — the validation scan projects
    * to exactly these, so column pruning reaches the parquet footer. */
  private def cols(e: Expectation): Seq[String] = e match {
    case NotNull(c) => Seq(c)
    case Unique(c) => Seq(c)
    case InRange(c, _, _) => Seq(c)
    case MinRows(_) => Seq.empty
    case DistinctAtLeast(c, _) => Seq(c)
    case Matches(c, _) => Seq(c)
  }

  /** Fail-loud gate: returns `df` untouched when every expectation
    * holds; raises with the violated constraint names and observed
    * counts otherwise. The task-pipeline form — a release config puts
    * this between scrub and write so a malformed corpus can never
    * reach the sink. */
  def expect(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    val bad = report(df, expectations).filter(!col("ok"))
      .collect().map(r => s"${r.getString(0)} observed=${r.getLong(1)} " +
        s"bound=${r.getLong(2)}")
    require(bad.isEmpty,
      s"corpus failed ${bad.length} expectation(s): ${bad.mkString("; ")}")
    df
  }
}
