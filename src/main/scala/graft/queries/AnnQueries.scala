package graft.queries

import org.apache.spark.sql.functions._
import graft.source.Changelog.table
import graft.ops.Similarity

/** Similarity-search queries over `embeddings` (array<float>, 64-dim).
  * Outputs are id/rank only — the cosine itself stays internal so the
  * comparison never depends on float formatting; both engines compute
  * the same IEEE doubles via sequential folds. */
object AnnQueries {

  private def vecs(s: org.apache.spark.sql.SparkSession, dir: String) =
    table(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  val defs: Map[String, QueryDef] = Map(

    // Exact brute-force cosine top-k (query set broadcast; corpus streams).
    "ann_topk" -> QueryDef(
      (s, dir) => {
        val e = vecs(s, dir)
        Similarity.bruteTopK(e, e.filter(col("vec_id") < 32), k = 5)
          .select("qid", "rank", "nid")
          .orderBy("qid", "rank")
      },
      Some("""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 32),
        |p AS (
        |  SELECT qid, e.vec_id AS nid,
        |    list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * v[i])) /
        |    (sqrt(list_sum(list_transform(qv, x -> x * x))) *
        |     sqrt(list_sum(list_transform(v,  x -> x * x)))) AS cos
        |  FROM q CROSS JOIN e WHERE e.vec_id <> qid)
        |SELECT qid,
        |       CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS BIGINT) AS rank,
        |       nid
        |FROM p QUALIFY rank <= 5 ORDER BY qid, rank""".stripMargin),
      bench = true),

    // Embedding near-dup pairs over a bounded id range (the library's
    // scale path buckets by Similarity.signSketch instead of n²).
    "dedup_embed" -> QueryDef(
      (s, dir) => {
        Similarity.nearDupPairs(vecs(s, dir).filter(col("vec_id") < 512), threshold = 0.4)
          .select("a_id", "b_id")
          .orderBy("a_id", "b_id")
      },
      Some("""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings WHERE vec_id < 512),
        |p AS (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |    list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) /
        |    (sqrt(list_sum(list_transform(a.v, x -> x * x))) *
        |     sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS cos
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT a_id, b_id FROM p WHERE cos >= 0.4
        |ORDER BY a_id, b_id""".stripMargin))
  )
}
