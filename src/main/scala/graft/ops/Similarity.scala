package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *   - [[bruteTopK]]: exact cosine top-k — broadcast the (small) query
  *     set against the corpus; one map-only pass over the corpus, a
  *     per-query top-k via window. Correct at any scale where the QUERY
  *     set is small; the corpus side streams.
  *   - [[lshTopK]]: random-hyperplane LSH — corpus and queries are
  *     bucketed by a deterministic sign-bit sketch, candidates meet on
  *     the bucket key (shuffle fan-in ∝ bucket size, never n²), then
  *     exact cosine re-ranks within buckets. The sketch hyperplanes are
  *     derived from xxhash64 (no RNG state, reproducible cluster-wide).
  *
  * Dot products use `zip_with` + `aggregate` — a sequential left fold,
  * so the summation order (hence the IEEE result) is deterministic and
  * matches the DuckDB oracle's list fold.
  */
object Similarity {

  /** Σ a·b — codegen'd native expression ([[graft.functions.VecDot]]);
    * sequential left fold, bit-identical to the lambda/oracle form. */
  def dot(a: Column, b: Column): Column = graft.functions.VecDot.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query vector (queries broadcast).
    * Norms are materialized per side BEFORE the join — computed once per
    * vector, not once per pair. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn")))
    val scored = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"),
      norm(col(vecCol)).as("nn"))
      .join(q, col("nid") =!= col("qid"))
      .withColumn("cos", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cos")
  }

  /** Sign-bit sketch: bit i = sign(v · h_i) where hyperplane h_i's
    * components are ±1 from xxhash64(seed, i, dim). Cheap, deterministic,
    * and component weights need no stored model. */
  def signSketch(vecCol: Column, bits: Int, seed: Int = 0): Column = {
    val planes = (0 until bits).map { i =>
      val proj = aggregate(
        zip_with(vecCol, sequence(lit(0), size(vecCol) - 1),
          (x, d) => when(pmod(xxhash64(lit(seed), lit(i), d), lit(2)) === 0, x).otherwise(-x)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    planes.reduce(_ + _)
  }

  /** [[signSketch]] with the hyperplane signs drawn from a multiply-shift
    * hash (`((x·2654435761) >> 16) & 1` over x = (seed·1009+i)·769+d)
    * instead of xxhash64 — arithmetic a SQL oracle can replicate exactly,
    * so the bucket assignment itself is driver-verifiable. Same fold
    * structure (sequential left fold) as the xxhash64 form. */
  def portableSignSketch(vecCol: Column, bits: Int, seed: Int = 0): Column = {
    val planes = (0 until bits).map { i =>
      val proj = aggregate(
        zip_with(vecCol, sequence(lit(0), size(vecCol) - 1),
          (x, d) => {
            val mixed = shiftright(
              (lit((seed.toLong * 1009 + i) * 769) + d.cast("long")) * lit(2654435761L), 16)
            when(mixed.bitwiseAND(lit(1L)) === 0, x).otherwise(-x)
          }),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    planes.reduce(_ + _)
  }

  /** Per-row array of `tables` independent sketches (posexplode to get
    * (table_id, bucket) pairs — the OR-amplified LSH key). */
  private def sketches(vecCol: Column, bits: Int, tables: Int,
      sketchFn: (Column, Int, Int) => Column): Column =
    array((0 until tables).map(t => sketchFn(vecCol, bits, t)): _*)

  /** Bucketed ANN with OR-amplification: `tables` independent sign
    * sketches of `bits` hyperplanes each; a candidate pair meets if it
    * collides in ANY table (recall ≈ 1-(1-p^bits)^tables), then exact
    * cosine re-ranks the candidate set. The join key (table_id, bucket)
    * is the shuffle key — fan-in per bucket ∝ corpus/2^bits, never n². */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int = 3,
      tables: Int = 8, idCol: String = "vec_id", vecCol: String = "v",
      sketchFn: (Column, Int, Int) => Column = signSketch(_, _, _)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def keyed(df: DataFrame, id: String, vec: String) =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        posexplode(sketches(col(vecCol), bits, tables, sketchFn)).as(Seq("tbl_id", "bucket")))
        .select(id, vec, "tbl_id", "bucket")
    val cand = keyed(corpus, "nid", "nv")
      .join(keyed(queries, "qid", "qv"), Seq("tbl_id", "bucket"))
      .filter(col("nid") =!= col("qid"))
      .dropDuplicates("qid", "nid")
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    cand.withColumn("cos", dot(col("qv"), col("nv")) / (norm(col("qv")) * norm(col("nv"))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cos")
  }

  /** K-means (Lloyd) refinement of IVF centroids, DataFrame-only: assign
    * every vector to its nearest centroid, recompute each cell's
    * element-wise mean (posexplode → per-dimension avg → re-assemble),
    * repeat. Tighter cells raise recall at the same nprobe. Empty cells
    * drop out naturally. */
  def trainCentroids(corpus: DataFrame, cells: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // deterministic seed + cell ids (row_number over the hash order on a
    // `cells`-row frame; monotonically_increasing_id after orderBy was not)
    var cent = broadcast(corpus
      .withColumn("_r", xxhash64(col(idCol)))
      .orderBy(col("_r"), col(idCol)).limit(cells)
      .withColumn("cell",
        row_number().over(Window.orderBy(col("_r"), col(idCol))).cast("long") - 1)
      .select(col("cell"), col(vecCol).as("cv")))
    for (_ <- 0 until iters) {
      val wa = Window.partitionBy(idCol).orderBy(col("_d").desc, col("cell"))
      val assigned = corpus.select(col(idCol), col(vecCol))
        .join(cent, lit(true))
        .withColumn("_d", cosine(col(vecCol), col("cv")))
        .withColumn("_rk", row_number().over(wa))
        .filter(col("_rk") === 1)
        .select(col("cell"), col(vecCol))
      cent = broadcast(assigned
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg("x").as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), expr("transform(pm, e -> e.m)").as("cv")))
    }
    cent
  }

  /** IVF-style bucketed ANN: `cells` centroid vectors are drawn
    * deterministically from the corpus itself (hash-ranked sample — no
    * trained model to ship); every corpus vector is assigned to its
    * nearest centroid (one broadcast pass), queries probe their `nprobe`
    * nearest cells, and exact cosine re-ranks inside the probed cells.
    * Shuffle key = cell id; per-cell fan-in ≈ corpus/cells. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, cells: Int = 16,
      nprobe: Int = 4, trainIters: Int = 0,
      idCol: String = "vec_id", vecCol: String = "v",
      portableSeeding: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // hash-ranked deterministic sample; `portableSeeding` swaps xxhash64
    // for multiply-mod arithmetic a SQL oracle can reproduce. Cell ids
    // come from a row_number over the (hash, id) order — a 16-row window,
    // deterministic (monotonically_increasing_id after orderBy was not).
    val seedHash =
      if (portableSeeding) pmod(col(idCol) * lit(2654435761L), lit(4294967296L))
      else xxhash64(col(idCol))
    val cent =
      if (trainIters > 0) trainCentroids(corpus, cells, trainIters, idCol, vecCol)
      else broadcast(corpus
        .withColumn("_r", seedHash)
        .orderBy(col("_r"), col(idCol)).limit(cells)
        .withColumn("cell",
          row_number().over(Window.orderBy(col("_r"), col(idCol))).cast("long") - 1)
        .select(col("cell"), col(vecCol).as("cv")))
    def assign(df: DataFrame, id: String, vec: String, probes: Int) = {
      val wa = Window.partitionBy(id).orderBy(col("_d").desc, col("cell"))
      df.select(col(idCol).as(id), col(vecCol).as(vec))
        .join(cent, lit(true))
        .withColumn("_d", cosine(col(vec), col("cv")))
        .withColumn("_rk", row_number().over(wa))
        .filter(col("_rk") <= probes)
        .drop("cv", "_d", "_rk")
    }
    val c = assign(corpus, "nid", "nv", 1)
    val q = assign(queries, "qid", "qv", nprobe)
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    c.join(q, Seq("cell")).filter(col("nid") =!= col("qid"))
      .dropDuplicates("qid", "nid")
      .withColumn("cos", cosine(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cos")
  }

  /** Embedding near-dup pairs above a cosine threshold (a < b). Exact
    * form; at scale run it over [[signSketch]] buckets instead of the
    * full cross join. */
  /** Sketch-bucketed near-dup pairs — the scale path: pairs are only
    * formed inside (table, bucket) LSH cells, so the shuffle fan-in is
    * bucket-sized; exact cosine then applies the threshold. OR-amplified
    * tables keep recall high (misses only pairs colliding in no table). */
  def sketchNearDupPairs(vecs: DataFrame, threshold: Double, bits: Int = 3,
      tables: Int = 8, idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    def keyed(id: String, vec: String) =
      vecs.select(col(idCol).as(id), col(vecCol).as(vec),
        posexplode(array((0 until tables).map(t =>
          signSketch(col(vecCol), bits, seed = t)): _*)).as(Seq("tbl_id", "bucket")))
        .select(id, vec, "tbl_id", "bucket")
    keyed("a_id", "av").join(keyed("b_id", "bv"), Seq("tbl_id", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("cos", dot(col("av"), col("bv")) / (norm(col("av")) * norm(col("bv"))))
      .filter(col("cos") >= threshold)
      .select("a_id", "b_id", "cos")
  }

  def nearDupPairs(vecs: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    val a = vecs.select(col(idCol).as("a_id"), col(vecCol).as("av"), norm(col(vecCol)).as("an"))
    val b = vecs.select(col(idCol).as("b_id"), col(vecCol).as("bv"), norm(col(vecCol)).as("bn"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos", dot(col("av"), col("bv")) / (col("an") * col("bn")))
      .filter(col("cos") >= threshold)
      .select("a_id", "b_id", "cos")
  }
}
