package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<double>` — the
  * codegen'd [[graft.functions.VecDot]] used throughout rejects float
  * arrays, so callers with `array<float>` storage cast first, as
  * `graft.queries.AnnQueries.vecs` does).
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
  * Dot products use the codegen'd [[graft.functions.VecDot]] — a
  * sequential left fold, so the summation order (hence the IEEE result)
  * is deterministic and matches the DuckDB oracle's list fold.
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

  /** ±1.0 sign vector for hyperplane (seed, i) over `dim` components —
    * the sign for a (table, plane, dimension) triple is DATA-INDEPENDENT,
    * so it is computed once on the driver and shipped as a literal array.
    * Each sketch bit then costs one codegen'd [[graft.functions.VecDot]]
    * against that literal (a tight primitive loop) instead of a per-row
    * interpreted `aggregate`+`zip_with` fold that re-evaluated the hash
    * for every (row, plane, dimension). x·(+1.0)/x·(−1.0) are exact in
    * IEEE and the fold order is unchanged, so projections — hence bucket
    * assignments and every downstream oracle — are bit-identical to the
    * interpreted form this replaces. */
  private def xxSigns(bits: Int, seed: Int, dim: Int): IndexedSeq[Array[Double]] = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    (0 until bits).map { i =>
      Array.tabulate(dim) { d =>
        // same hash, same argument types (int, int, int) as the column
        // form xxhash64(lit(seed), lit(i), d) with Spark's default seed 42
        val h = XxHash64(Seq(Literal(seed), Literal(i), Literal(d)), 42L)
          .eval(InternalRow.empty).asInstanceOf[Long]
        if (((h % 2) + 2) % 2 == 0) 1.0 else -1.0
      }
    }
  }

  /** ±1.0 signs from the portable multiply-shift hash
    * (`((x·2654435761) >> 16) & 1` over x = (seed·1009+i)·769+d) — the
    * arithmetic a SQL oracle replicates exactly. */
  private def portableSigns(bits: Int, seed: Int, dim: Int): IndexedSeq[Array[Double]] =
    (0 until bits).map { i =>
      Array.tabulate(dim) { d =>
        val mixed = (((seed.toLong * 1009 + i) * 769 + d) * 2654435761L) >> 16
        if ((mixed & 1L) == 0L) 1.0 else -1.0
      }
    }

  /** OR the sign bits of the `bits` hyperplane projections into a bucket
    * id. `VecDot` raises on any row whose vector length ≠ `dim`, so a
    * wrong width fails loudly instead of mis-bucketing. */
  private def sketchFromSigns(vecCol: Column, signs: IndexedSeq[Array[Double]]): Column =
    signs.zipWithIndex.map { case (s, i) =>
      when(dot(vecCol, typedLit(s.toSeq)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Sign-bit sketch: bit i = sign(v · h_i) where hyperplane h_i's
    * components are ±1 from xxhash64(seed, i, dim). Cheap, deterministic,
    * and component weights need no stored model. */
  def signSketch(vecCol: Column, bits: Int, seed: Int = 0, dim: Int = 64): Column =
    sketchFromSigns(vecCol, xxSigns(bits, seed, dim))

  /** [[signSketch]] with the hyperplane signs drawn from a multiply-shift
    * hash instead of xxhash64 — arithmetic a SQL oracle can replicate
    * exactly, so the bucket assignment itself is driver-verifiable. */
  def portableSignSketch(vecCol: Column, bits: Int, seed: Int = 0, dim: Int = 64): Column =
    sketchFromSigns(vecCol, portableSigns(bits, seed, dim))

  /** Per-row array of `tables` independent sketches (posexplode to get
    * (table_id, bucket) pairs — the OR-amplified LSH key). */
  private def sketches(vecCol: Column, bits: Int, tables: Int, dim: Int,
      sketchFn: (Column, Int, Int, Int) => Column): Column =
    array((0 until tables).map(t => sketchFn(vecCol, bits, t, dim)): _*)

  /** Bucketed ANN with OR-amplification: `tables` independent sign
    * sketches of `bits` hyperplanes each; a candidate pair meets if it
    * collides in ANY table (recall ≈ 1-(1-p^bits)^tables), then exact
    * cosine re-ranks the candidate set. The join key (table_id, bucket)
    * is the shuffle key — fan-in per bucket ∝ corpus/2^bits, never n².
    * `dim` is the embedding width (hyperplane signs are precomputed
    * driver-side at exactly that width — a mismatched vector fails
    * loudly in VecDot); norms are materialized per keyed row BEFORE the
    * bucket join, once per vector instead of once per candidate pair. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int = 3,
      tables: Int = 8, idCol: String = "vec_id", vecCol: String = "v",
      dim: Int = 64,
      sketchFn: (Column, Int, Int, Int) => Column = signSketch(_, _, _, _)): DataFrame = {
    def keyed(df: DataFrame, id: String, vec: String, nrm: String) =
      df.select(col(idCol).as(id), col(vecCol).as(vec), norm(col(vecCol)).as(nrm),
        posexplode(sketches(col(vecCol), bits, tables, dim, sketchFn)).as(Seq("tbl_id", "bucket")))
        .select(id, vec, nrm, "tbl_id", "bucket")
    // pair dedup across colliding tables is a FULL-ROW distinct after
    // dropping the collision key: duplicate (qid, nid) rows are
    // bit-identical in the carried vectors/norms, and array-typed
    // grouping KEYS hash-aggregate fine — dropDuplicates(subset) would
    // instead put the arrays in first() aggregation BUFFERS, silently
    // demoting the dedup to SortAggregate (per-partition sort)
    val cand = keyed(corpus, "nid", "nv", "nn")
      .join(keyed(queries, "qid", "qv", "qn"), Seq("tbl_id", "bucket"))
      .filter(col("nid") =!= col("qid"))
      .drop("tbl_id", "bucket").distinct()
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    cand.withColumn("cos", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cos")
  }

  /** Deterministic centroid seeds: the `cells` corpus vectors ranked
    * lowest by `seedHash` (ties by id). The frame is ≤`cells` rows —
    * bounded metadata — so it is collected and re-shipped as a literal
    * relation with driver-assigned cell ids, instead of a global
    * `row_number` window (which warned "No Partition Defined" on every
    * run and read as a scale hazard despite the `limit`). `orderBy +
    * limit + collect` is a TakeOrdered — rows arrive already in (hash,
    * id) order. */
  private[graft] def seedCentroids(corpus: DataFrame, cells: Int, seedHash: Column,
      idCol: String, vecCol: String): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val rows = corpus.select(seedHash.as("_r"), col(idCol), col(vecCol))
      .orderBy(col("_r"), col(idCol)).limit(cells)
      .collect() // ≤cells rows: bounded by construction
    val cents = rows.toSeq.zipWithIndex.map { case (r, i) =>
      (i.toLong, r.getSeq[Double](2))
    }
    broadcast(cents.toDF("cell", "cv"))
  }

  /** Nearest-centroid assignment against a broadcast centroid frame.
    * The probes=1 side (the CORPUS — the big one) aggregates with
    * `max_by`, which gets map-side partial aggregation: the shuffle
    * carries |df| rows, not |df|×cells exploded scores. Only the small
    * query side (nprobe>1) keeps the per-id window. Tie-break matches
    * the window form and the oracle: best score, then lowest cell.
    * Edge case (out of contract): a vector whose cosine is null against
    * EVERY centroid (null elements) is dropped by the probes=1 `max_by`
    * branch but retained by the probes>1 window branch; inputs are
    * element-null-free by the embeddings contract, so both branches
    * agree on real data. */
  private[graft] def assignCells(df: DataFrame, cent: DataFrame, id: String,
      vec: String, probes: Int, idCol: String, vecCol: String): DataFrame = {
    val scored = df.select(col(idCol).as(id), col(vecCol).as(vec))
      .join(cent, lit(true))
      .withColumn("_d", cosine(col(vec), col("cv")))
    if (probes == 1)
      scored.groupBy(col(id))
        .agg(max_by(struct(col("cell"), col(vec)),
          struct(col("_d"), (-col("cell")).as("_nc"))).as("_best"))
        .select(col(id), col("_best").getField(vec).as(vec),
          col("_best").getField("cell").as("cell"))
    else {
      val wa = Window.partitionBy(id).orderBy(col("_d").desc, col("cell"))
      scored.withColumn("_rk", row_number().over(wa))
        .filter(col("_rk") <= probes)
        .drop("cv", "_d", "_rk")
    }
  }

  /** ANN-assisted nearest-centroid assignment (r19 verdict item 3 —
    * the paper regime runs ~100k cells, where brute per-vector scoring
    * of EVERY centroid is the dominant cost and the only superlinear
    * law left in the repo): group the `cells` centroids under
    * `superCells` coarse-over-coarse super-centroids (2 Lloyd passes
    * over the ≤cells-row centroid frame — bounded metadata), route each
    * vector to its nearest NON-EMPTY super-group (one broadcast
    * max_by pass over `superCells` scores), then score that group's
    * centroids exactly (second broadcast max_by pass). Per-vector work
    * drops from `cells` scores to ~(superCells + cells/superCells),
    * minimized at superCells ≈ √cells — under semDedup's cells ∝ √N
    * contract the assignment law bends from O(N^1.5) to O(N^1.25).
    *
    * Approximation contract: scoring INSIDE the probed group is exact
    * cosine, so the result differs from brute assignment only when a
    * vector's true nearest centroid lives in a different super-group
    * than the vector's own nearest super-centroid — the standard IVF
    * probe trade, exact on separated clusters (spec-pinned) and exactly
    * equal to brute at superCells = 1 (one group = all centroids
    * scored; also spec-pinned). Both max_by sides get map-side partial
    * aggregation: two narrow |df|-row exchanges replace brute's one. */
  private[graft] def assignCellsHier(df: DataFrame, cent: DataFrame,
      superCells: Int, id: String, vec: String, idCol: String,
      vecCol: String, portableSeeding: Boolean = false): DataFrame = {
    require(superCells > 0, s"superCells must be positive (got $superCells)")
    // the centroid frame re-keyed off (cell, cv): those names collide
    // with the centroid-frame side INSIDE assignCells/trainCentroids
    val centR = cent.select(col("cell").as("_cid"), col("cv").as("_cv"))
    // group the centroids: sampled Lloyd over the centroid frame itself
    // (≤cells rows; trainSample bounds never bind here)
    val superCent = trainCentroids(centR, superCells, iters = 2,
      idCol = "_cid", vecCol = "_cv", portableSeeding = portableSeeding)
    // each centroid's super-group (bounded cells × superCells scoring)
    val centWithG = broadcast(
      assignCells(centR, superCent, "_cid", "_cv", probes = 1, "_cid", "_cv")
        .withColumnRenamed("cell", "gid")
        .withColumnRenamed("_cid", "cell")
        .withColumnRenamed("_cv", "cv"))
    // route vectors through super-groups that HAVE members — an empty
    // group would silently drop every vector routed to it at the
    // stage-2 join
    val liveSuper = broadcast(
      superCent.join(centWithG.select(col("gid").as("cell")).distinct(),
        Seq("cell")))
    val routed = assignCells(df, liveSuper, id, vec, probes = 1,
      idCol, vecCol).withColumnRenamed("cell", "gid")
    routed.join(centWithG.withColumnRenamed("cv", "_ccv"), Seq("gid"))
      .withColumn("_d", cosine(col(vec), col("_ccv")))
      .groupBy(col(id))
      .agg(max_by(struct(col("cell"), col(vec)),
        struct(col("_d"), (-col("cell")).as("_nc"))).as("_best"))
      .select(col(id), col("_best").getField(vec).as(vec),
        col("_best").getField("cell").as("cell"))
  }

  /** Default k-means training-set bound: comfortably more than enough
    * members per cell at any realistic `cells`, still bounded driver-
    * and executor-side metadata. */
  val defaultTrainSample = 4096

  /** The deterministic hash that ranks corpus vectors for centroid
    * seeding and training-set selection. `portableSeeding` swaps
    * xxhash64 for multiply-mod arithmetic a SQL oracle can reproduce. */
  private[graft] def seedHashFor(idCol: String, portableSeeding: Boolean): Column =
    if (portableSeeding) pmod(col(idCol) * lit(2654435761L), lit(4294967296L))
    else xxhash64(col(idCol))

  /** K-means (Lloyd) refinement of IVF centroids over a BOUNDED training
    * set — the standard sampled k-means: the `trainSample` lowest
    * hash-ranked corpus vectors (a deterministic uniform draw; the
    * centroid seeds are this ranking's prefix, so seeding is unchanged)
    * are cached once and re-assigned each iteration. Per-iteration cost
    * is O(trainSample × cells), INDEPENDENT of corpus size — the
    * previous formulation re-read the full corpus every Lloyd pass,
    * which at 100 TB is `iters` complete scans; the full corpus is
    * assigned exactly once, by the caller, after training. Tighter cells
    * raise recall at the same nprobe. Empty cells drop out naturally.
    *
    * Each cell's new centroid is the element-wise mean of its members
    * summed by a SEQUENTIAL fold in (id-sorted) member order — a
    * distributed `avg()` would sum in partition order, making the
    * centroids non-portable across engines and not even stable across
    * runs; the sorted fold is bit-identical everywhere, so a SQL oracle
    * can replay the whole training loop. The per-cell collect_list is
    * bounded by trainSample. */
  def trainCentroids(corpus: DataFrame, cells: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "v",
      portableSeeding: Boolean = false,
      trainSample: Int = defaultTrainSample): DataFrame = {
    val spark = corpus.sparkSession
    val seedHash = seedHashFor(idCol, portableSeeding)
    val sample = corpus.select(col(idCol), col(vecCol))
      .orderBy(seedHash, col(idCol)).limit(trainSample).cache()
    try {
      var cent = seedCentroids(sample, cells, seedHash, idCol, vecCol)
      for (_ <- 0 until iters) {
        val assigned = assignCells(sample, cent, idCol, vecCol, probes = 1, idCol, vecCol)
        val next = assigned
          .groupBy("cell")
          .agg(array_sort(collect_list(struct(col(idCol), col(vecCol)))).as("ms"))
          .select(col("cell"), transform(
            sequence(lit(1), size(element_at(col("ms"), 1).getField(vecCol))),
            p => aggregate(col("ms"), lit(0.0),
              (acc, m) => acc + element_at(m.getField(vecCol), p))
              / size(col("ms"))).as("cv"))
        // ≤cells rows of bounded metadata: materialize each iteration's
        // centroids so pass i+1's plan reads the sample cache once
        // instead of replaying every prior pass's assignment (the
        // growing lineage also re-cached identical RDD blocks — the
        // bench-tail "Block rdd_N already exists" warnings)
        cent = broadcast(spark.createDataFrame(
          java.util.Arrays.asList(next.collect(): _*), next.schema))
      }
      cent
    } finally { sample.unpersist(); () }
  }

  /** IVF-style bucketed ANN: `cells` centroid vectors are drawn
    * deterministically from the corpus itself (hash-ranked sample — no
    * trained model to ship); every corpus vector is assigned to its
    * nearest centroid (one broadcast pass + map-side-combined `max_by`),
    * queries probe their `nprobe` nearest cells, and exact cosine
    * re-ranks inside the probed cells. Shuffle key = cell id; per-cell
    * fan-in ≈ corpus/cells. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, cells: Int = 16,
      nprobe: Int = 4, trainIters: Int = 0,
      idCol: String = "vec_id", vecCol: String = "v",
      portableSeeding: Boolean = false,
      trainSample: Int = defaultTrainSample,
      superCells: Int = 0): DataFrame = {
    val cent =
      if (trainIters > 0) trainCentroids(corpus, cells, trainIters, idCol,
        vecCol, portableSeeding, trainSample)
      else seedCentroids(corpus, cells, seedHashFor(idCol, portableSeeding),
        idCol, vecCol)
    // superCells > 0 = ANN-assisted CORPUS assignment (assignCellsHier
    // — the same O(N·cells) → O(N·√cells) bend semDedup takes at
    // paper-scale cell counts). Queries stay on the brute nprobe
    // window: the query side is small by contract, and the probed-cell
    // list must not lose recall to group routing.
    val c =
      if (superCells > 0)
        assignCellsHier(corpus, cent, superCells, "nid", "nv", idCol,
          vecCol, portableSeeding)
      else assignCells(corpus, cent, "nid", "nv", probes = 1, idCol, vecCol)
    val q = assignCells(queries, cent, "qid", "qv", probes = nprobe, idCol, vecCol)
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    c.join(q, Seq("cell")).filter(col("nid") =!= col("qid"))
      // full-row distinct, not dropDuplicates(subset): see lshTopK
      .drop("cell").distinct()
      .withColumn("cos", cosine(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cos")
  }

  /** [[ivfTopK]] serving through an int8-quantized corpus: the corpus
    * vector never enters a shuffle at full width — both the
    * nearest-cell aggregation and the cell join (the ANN family's
    * largest-volume shuffles) carry `(q8: array<tinyint>, scale, qs)`
    * ≈ dim + 16 bytes per row instead of the dim × 8-byte double
    * vector (~6× narrower at dim = 64). Cell assignment still scores
    * the FULL-precision vector, map-side against broadcast centroids,
    * BEFORE any shuffle; only the candidate re-rank runs on the
    * dequantized form, so ranks can differ from [[ivfTopK]] within the
    * quantization error ([[int8Audit]]: ≤ scale/2 per component). The
    * scoring algebra is plain sequential-fold IEEE, so a SQL oracle
    * replays it exactly: cos = (scale·Σ qv_i·q_i) / (|qv| ·
    * scale·√(Σ q_i²)), with Σ q_i² precomputed map-side (8 bytes) so
    * no per-pair pass over the int array is needed for the norm. */
  def ivfTopKQ8(corpus: DataFrame, queries: DataFrame, k: Int, cells: Int = 16,
      nprobe: Int = 4, trainIters: Int = 0,
      idCol: String = "vec_id", vecCol: String = "v",
      portableSeeding: Boolean = false,
      trainSample: Int = defaultTrainSample): DataFrame = {
    val cent =
      if (trainIters > 0) trainCentroids(corpus, cells, trainIters, idCol,
        vecCol, portableSeeding, trainSample)
      else seedCentroids(corpus, cells, seedHashFor(idCol, portableSeeding),
        idCol, vecCol)
    val qz = int8Quantize(corpus.select(col(idCol).as("nid"), col(vecCol)), vecCol)
      .withColumn("q8", col("q").cast("array<tinyint>"))
      .withColumn("qs", dot(col("q"), col("q"))) // Σ q_i², integral double
    val c = qz.join(cent, lit(true))
      .withColumn("_d", cosine(col(vecCol), col("cv")))
      .groupBy("nid")
      .agg(max_by(struct(col("q8"), col("scale"), col("qs"), col("cell")),
        struct(col("_d"), (-col("cell")).as("_nc"))).as("_best"))
      .select(col("nid"), col("_best").getField("q8").as("nq"),
        col("_best").getField("scale").as("nscale"),
        col("_best").getField("qs").as("nqs"),
        col("_best").getField("cell").as("cell"))
    val q = assignCells(queries, cent, "qid", "qv", probes = nprobe, idCol, vecCol)
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    c.join(q, Seq("cell")).filter(col("nid") =!= col("qid"))
      // full-row distinct, not dropDuplicates(subset): see lshTopK
      .drop("cell").distinct()
      .withColumn("cos",
        (col("nscale") * dot(col("qv"), transform(col("nq"), x => x.cast("double")))) /
          (norm(col("qv")) * (col("nscale") * sqrt(col("nqs")))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cos")
  }

  /** Σ (a−b)² — squared L2 as a sequential left fold (zip_with the
    * difference squares, then fold in array order), so the IEEE result
    * is deterministic and a SQL oracle's list fold replays it exactly. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, e) => acc + e)

  /** Product-quantization codebooks — the memory-side ANN compression
    * layer (the PQ scheme of Jégou/Douze/Schmid, TPAMI 2011 — public
    * literature): the D-dim space splits into `m` subspaces of D/m dims
    * and each subspace trains its OWN `k`-centroid codebook, so a
    * vector stores as m small codes (m·log₂k bits) instead of 8·D
    * bytes — 32-64× compression at typical settings, which is what
    * lets a 100 TB embedding corpus serve from executor memory.
    *
    * Training is the same bounded machinery as [[trainCentroids]]: the
    * `trainSample` lowest hash-ranked vectors (portable multiply-mod
    * ranking under `portableSeeding`), seeds = the first k sample rows'
    * subvectors (the SAME rows seed every subspace), Lloyd refinement
    * with squared-L2 assignment (ties to the lowest cell) and
    * centroid means computed by the id-sorted sequential fold — every
    * float op replays bit-identically in a SQL oracle. All m subspaces
    * train in ONE DataFrame pass per iteration (grouped on (sub,cell)),
    * not m sequential jobs. Empty cells drop out naturally.
    *
    * Returns (sub, cell, cv): ≤ m·k rows of bounded metadata,
    * broadcast-wrapped. */
  def pqTrain(corpus: DataFrame, m: Int, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "v",
      portableSeeding: Boolean = false,
      trainSample: Int = defaultTrainSample): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val dim = corpus.select(size(col(vecCol))).head().getInt(0) // 1 row
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val d = dim / m
    val seedHash = seedHashFor(idCol, portableSeeding)
    val sample = corpus.select(seedHash.as("_r"), col(idCol), col(vecCol))
      .orderBy(col("_r"), col(idCol)).limit(trainSample).cache()
    val subs = sample.select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(m - 1)),
          s => slice(col(vecCol), s * d + 1, lit(d)))))
      .toDF(idCol, "sub", "sv").cache()
    try {
      val seedRows = sample.orderBy(col("_r"), col(idCol)).limit(k)
        .collect() // ≤k rows: bounded by construction
      var cent = broadcast(seedRows.toSeq.zipWithIndex.flatMap { case (r, i) =>
        val v = r.getSeq[Double](2)
        (0 until m).map(s => (s, i.toLong, v.slice(s * d, s * d + d)))
      }.toDF("sub", "cell", "cv"))
      for (_ <- 0 until iters) {
        val assigned = subs.join(cent, "sub")
          .withColumn("_d", l2sq(col("sv"), col("cv")))
          .groupBy(col(idCol), col("sub"))
          .agg(min_by(struct(col("cell"), col("sv")),
            struct(col("_d"), col("cell"))).as("_b"))
          .select(col(idCol), col("sub"), col("_b.cell").as("cell"),
            col("_b.sv").as("sv"))
        val next = assigned.groupBy(col("sub"), col("cell"))
          .agg(array_sort(collect_list(struct(col(idCol), col("sv")))).as("ms"))
          .select(col("sub"), col("cell"), transform(
            sequence(lit(1), size(element_at(col("ms"), 1).getField("sv"))),
            p => aggregate(col("ms"), lit(0.0),
              (acc, mm) => acc + element_at(mm.getField("sv"), p))
              / size(col("ms"))).as("cv"))
        // ≤ m·k rows: materialize per iteration (see trainCentroids)
        cent = broadcast(spark.createDataFrame(
          java.util.Arrays.asList(next.collect(): _*), next.schema))
      }
      cent
    } finally { sample.unpersist(); subs.unpersist(); () }
  }

  /** Encode a corpus against trained PQ codebooks: one map-side
    * broadcast pass (subvector explode → codebook join → argmin per
    * subspace), then the m codes collect into one sub-ordered array per
    * vector. Codes are composite keys `sub·k + cell`, so they address a
    * non-dense codebook (Lloyd may drop empty cells) unambiguously.
    * Returns (idCol, codes: array<long>) — the persisted form of a PQ
    * index: ~m·8 bytes parquet-encoded per vector instead of dim·8,
    * built ONCE and reused across every serve. The only shuffles carry
    * (id, sub, cell) triples and partial code arrays — never vectors. */
  def pqEncode(corpus: DataFrame, cent: DataFrame, m: Int, k: Int,
      idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0) // 1 row
    val d = dim / m
    corpus.select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(m - 1)),
          s => slice(col(vecCol), s * d + 1, lit(d)))))
      .toDF(idCol, "sub", "sv")
      .join(broadcast(cent), "sub")
      .withColumn("_d", l2sq(col("sv"), col("cv")))
      .groupBy(col(idCol), col("sub"))
      .agg(min_by(col("cell"), struct(col("_d"), col("cell"))).as("cell"))
      .groupBy(idCol)
      .agg(array_sort(collect_list(
        col("sub").cast("long") * k + col("cell"))).as("codes"))
  }

  /** PQ-compressed top-k via ADC (asymmetric distance computation):
    * candidates are scored WITHOUT decompression. Per query, an m×k
    * lookup table holds the exact squared-L2 from each query subvector
    * to every codebook entry; a candidate's approximate distance is the
    * sum of the m table entries its codes select — a sequential fold
    * over a bounded array, bit-replayable by a SQL oracle.
    *
    * Scale shape: the codebook (≤ m·k rows) and the per-query LUTs
    * (|queries|·m·k entries — queries are the small side by contract,
    * as in [[bruteTopK]]) broadcast; encoding is one map-side pass over
    * the corpus (subvector explode → broadcast-join → min_by — the
    * shuffle carries (id, sub, cell) triples, never vectors); scoring
    * is map-only against the broadcast LUTs. The corpus vector itself
    * appears in NO shuffle at all — only its m-byte code does, the
    * whole point of PQ at 100 TB. Codes address LUT slots through the
    * composite key sub·k+cell looked up by position (array_position),
    * which stays correct when Lloyd drops an empty cell and the LUT
    * isn't dense; at gate sizes that scan is ≤ m·k = 32 steps.
    *
    * Ranks can differ from exact search within quantization error —
    * the oracle replays training+encoding+ADC, it does not assert
    * PQ ≈ brute (recall is [[OpsSpec]]'s job on exactly-representable
    * fixtures). */
  def pqTopK(corpus: DataFrame, queries: DataFrame, topK: Int, m: Int = 4,
      k: Int = 8, iters: Int = 1,
      idCol: String = "vec_id", vecCol: String = "v",
      portableSeeding: Boolean = false,
      trainSample: Int = defaultTrainSample): DataFrame = {
    val cent = pqTrain(corpus, m, k, iters, idCol, vecCol, portableSeeding,
      trainSample)
    val codes = pqEncode(corpus, cent, m, k, idCol, vecCol)
      .withColumnRenamed(idCol, "nid")
    val luts = pqLuts(queries, cent, m, k, idCol, vecCol)
    val w = Window.partitionBy("qid").orderBy(col("dist").asc, col("nid"))
    codes.join(broadcast(luts), col("nid") =!= col("qid"))
      .withColumn("dist", adcDist)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select("qid", "rank", "nid", "dist")
  }

  /** Per-query ADC lookup tables: for every (sub, cell) codebook entry,
    * the exact squared-L2 from the query's subvector — flattened into
    * parallel arrays sorted by composite key (`lidx` keys, `lut`
    * distances), so a code addresses its slot by position even when the
    * codebook is non-dense. ≤ |queries|·m·k entries; callers broadcast. */
  private def pqLuts(queries: DataFrame, cent: DataFrame, m: Int, k: Int,
      idCol: String, vecCol: String): DataFrame = {
    val dim = queries.select(size(col(vecCol))).head().getInt(0) // 1 row
    val d = dim / m
    queries.select(col(idCol).as("qid"), posexplode(
        transform(sequence(lit(0), lit(m - 1)),
          s => slice(col(vecCol), s * d + 1, lit(d)))))
      .toDF("qid", "sub", "qsv")
      .join(cent, "sub")
      .withColumn("_d", l2sq(col("qsv"), col("cv")))
      .groupBy("qid")
      .agg(array_sort(collect_list(struct(
        (col("sub").cast("long") * k + col("cell")).as("cid"),
        col("_d").as("dd")))).as("t"))
      .select(col("qid"),
        transform(col("t"), x => x.getField("cid")).as("lidx"),
        transform(col("t"), x => x.getField("dd")).as("lut"))
  }

  /** ADC distance: the sub-ordered fixed-order fold over the row's
    * `codes`, each code fetching its LUT slot through the `lidx`
    * position scan (≤ m·k steps — pack denser for big codebooks). */
  private def adcDist: Column =
    aggregate(col("codes"), lit(0.0), (acc, c) =>
      acc + element_at(col("lut"), array_position(col("lidx"), c).cast("int")))

  /** The composed serving shape — IVF coarse pruning + PQ/ADC scoring
    * (IVFADC without residual encoding: codes quantize the RAW vector,
    * keeping the codebook independent of the coarse quantizer and the
    * oracle compositional; classic residual PQ is a drop-in
    * refinement). This is the plan a 100-TB corpus actually serves:
    * queries probe `nprobe` of `cells` inverted lists, and the
    * candidate join's corpus side carries (nid, cell, codes[m]) — tens
    * of bytes per row — instead of the dim×8-byte vector, with scoring
    * by broadcast LUT lookups, no decompression. Recall compounds the
    * two approximations; raise `nprobe`/`k` to trade cost back. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, topK: Int,
      cells: Int = 16, nprobe: Int = 4, m: Int = 4, k: Int = 8,
      pqIters: Int = 1,
      idCol: String = "vec_id", vecCol: String = "v",
      portableSeeding: Boolean = false,
      trainSample: Int = defaultTrainSample): DataFrame = {
    val coarse = seedCentroids(corpus, cells,
      seedHashFor(idCol, portableSeeding), idCol, vecCol)
    val pqCent = pqTrain(corpus, m, k, pqIters, idCol, vecCol,
      portableSeeding, trainSample)
    val index = assignCells(corpus, coarse, "nid", "nv", probes = 1,
        idCol, vecCol)
      .select("nid", "cell")
      .join(pqEncode(corpus, pqCent, m, k, idCol, vecCol)
        .withColumnRenamed(idCol, "nid"), "nid")
    ivfPqServe(index, queries, coarse, pqCent, topK, nprobe, m, k,
      idCol, vecCol)
  }

  /** Serve top-k from a PERSISTED IVF+PQ index — `index` is
    * (nid, cell, codes) rows as [[ivfPqTopK]] builds them, typically a
    * parquet table: the deployment shape, where the one-time
    * assign+encode never re-runs and a serve touches only the index's
    * code columns, the two (bounded) quantizer frames and the query
    * set. */
  def ivfPqServe(index: DataFrame, queries: DataFrame, coarse: DataFrame,
      pqCent: DataFrame, topK: Int, nprobe: Int = 4, m: Int = 4, k: Int = 8,
      idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    val q = assignCells(queries, broadcast(coarse), "qid", "qv",
      probes = nprobe, idCol, vecCol)
    val luts = pqLuts(queries, pqCent, m, k, idCol, vecCol)
    val w = Window.partitionBy("qid").orderBy(col("dist").asc, col("nid"))
    index
      .join(q.select("qid", "cell"), Seq("cell"))
      .filter(col("nid") =!= col("qid"))
      // full-row distinct, not dropDuplicates(subset): see lshTopK
      .drop("cell").distinct()
      .join(broadcast(luts), "qid")
      .withColumn("dist", adcDist)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select("qid", "rank", "nid", "dist")
  }

  /** Sketch-bucketed near-dup pairs — the scale path: pairs are only
    * formed inside (table, bucket) LSH cells, so the shuffle fan-in is
    * bucket-sized; exact cosine then applies the threshold. OR-amplified
    * tables keep recall high (misses only pairs colliding in no table). */
  def sketchNearDupPairs(vecs: DataFrame, threshold: Double, bits: Int = 3,
      tables: Int = 8, idCol: String = "vec_id", vecCol: String = "v",
      dim: Int = 64,
      sketchFn: (Column, Int, Int, Int) => Column = signSketch(_, _, _, _)): DataFrame = {
    def keyed(id: String, vec: String) =
      vecs.select(col(idCol).as(id), col(vecCol).as(vec),
        posexplode(sketches(col(vecCol), bits, tables, dim, sketchFn))
          .as(Seq("tbl_id", "bucket")))
        .select(id, vec, "tbl_id", "bucket")
    keyed("a_id", "av").join(keyed("b_id", "bv"), Seq("tbl_id", "bucket"))
      .filter(col("a_id") < col("b_id"))
      // full-row distinct, not dropDuplicates(subset): see lshTopK
      .drop("tbl_id", "bucket").distinct()
      .withColumn("cos", dot(col("av"), col("bv")) / (norm(col("av")) * norm(col("bv"))))
      .filter(col("cos") >= threshold)
      .select("a_id", "b_id", "cos")
  }

  /** Incremental embedding near-dup: NEW batch × corpus only — the
    * admission path for vetting an arriving embedding increment against
    * a persisted corpus (the vector-side analog of
    * [[graft.ops.Dedup.lshCandidatesAgainst]]). The corpus side's
    * sketches are computed once in production (a checkpointed table);
    * candidates still meet on the (tbl_id, bucket) equi-join key,
    * corpus×corpus pairs never form, and per-side norms are hoisted
    * ahead of the join. Returns (new_id, corpus_id, cos ≥ threshold). */
  def sketchNearDupAgainst(newVecs: DataFrame, corpusVecs: DataFrame,
      threshold: Double, bits: Int = 3, tables: Int = 8,
      idCol: String = "vec_id", vecCol: String = "v", dim: Int = 64,
      sketchFn: (Column, Int, Int, Int) => Column = signSketch(_, _, _, _)): DataFrame = {
    def keyed(df: DataFrame, id: String, vec: String, nrm: String) =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        norm(col(vecCol)).as(nrm),
        posexplode(sketches(col(vecCol), bits, tables, dim, sketchFn))
          .as(Seq("tbl_id", "bucket")))
        .select(id, vec, nrm, "tbl_id", "bucket")
    keyed(newVecs, "new_id", "nv", "nn")
      .join(keyed(corpusVecs, "corpus_id", "cv", "cn"), Seq("tbl_id", "bucket"))
      .filter(col("new_id") =!= col("corpus_id"))
      // full-row distinct, not dropDuplicates(subset): see lshTopK
      .drop("tbl_id", "bucket").distinct()
      .withColumn("cos", dot(col("nv"), col("cv")) / (col("nn") * col("cn")))
      .filter(col("cos") >= threshold)
      .select("new_id", "corpus_id", "cos")
  }

  /** Embedding near-dup pairs above a cosine threshold (a < b). Exact
    * quadratic form — the bounded oracle baseline for
    * [[sketchNearDupPairs]]; the caller bounds the input. */
  def nearDupPairs(vecs: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    val a = vecs.select(col(idCol).as("a_id"), col(vecCol).as("av"), norm(col(vecCol)).as("an"))
    val b = vecs.select(col(idCol).as("b_id"), col(vecCol).as("bv"), norm(col(vecCol)).as("bn"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos", dot(col("av"), col("bv")) / (col("an") * col("bn")))
      .filter(col("cos") >= threshold)
      .select("a_id", "b_id", "cos")
  }

  /** Semantic deduplication — SemDeDup (Abbas et al. 2023,
    * arXiv:2303.09540): k-means-partition the embedding space with the
    * frozen coarse quantizer (the IVF machinery above), then inside
    * each cluster drop every vector that has an EARLIER (lower-id)
    * cluster-mate with cosine ≥ `tau`. This catches the paraphrase/
    * re-encode duplicates the lexical family (MinHash/SimHash) cannot
    * see, at a cost the cluster structure bounds: the pair join is
    * keyed on the cell id, so per-cell work is O(cellSize²) and total
    * work O(N · N/cells) — `cells` grows with the corpus (the paper
    * uses ~100k clusters at web scale) to keep cell size constant,
    * making the pass O(N · const), never the all-pairs N². Like the
    * paper's method, cross-CLUSTER near-dups are invisible by design —
    * that is the approximation that buys the bound.
    *
    * Returns every input vector with its cluster and verdict:
    * (idCol, cell, dup_of, keep) — `dup_of` = the lowest earlier
    * cluster-mate within `tau` (-1 if none), `keep` = 1/0. The default
    * keep rule "earlier id wins" makes the decision deterministic,
    * stable under re-runs, and — under a FROZEN quantizer (the
    * IvfIndex store's regime; this op re-seeds from its input) —
    * incremental-friendly: appending higher ids never un-keeps.
    * `keepFarthest` switches to the paper's preferred keeper — the
    * vector FARTHEST from its centroid wins (lowest centroid cosine,
    * id tie-break; the paper found it preserves slightly more
    * diversity than random/earliest) — at the cost of one extra
    * broadcast-centroid scoring pass and a per-cell rank window, and
    * of append-stability (a new vector can out-rank an old keeper).
    * `trainIters` > 0 refines the quantizer with sampled Lloyd passes
    * ([[trainCentroids]] — bounded training set, corpus assigned
    * once). `superCells` > 0 switches centroid assignment to the
    * ANN-assisted hierarchical route ([[assignCellsHier]]) — at the
    * paper's ~100k-cell regime brute assignment is the dominant cost
    * and the op's only superlinear law (O(N^1.5) under cells ∝ √N);
    * the two-level route bends it to O(N^1.25) at the standard IVF
    * probe trade (a vector whose true nearest centroid lives outside
    * its nearest super-group lands in the second-best cell — scoring
    * inside the probed group stays exact). The GATED default (0) keeps
    * brute assignment: bit-stable against the SQL oracle. */
  def semDedup(vecs: DataFrame, tau: Double, cells: Int = 16,
      trainIters: Int = 0, idCol: String = "vec_id", vecCol: String = "v",
      portableSeeding: Boolean = false,
      trainSample: Int = defaultTrainSample,
      keepFarthest: Boolean = false,
      superCells: Int = 0): DataFrame = {
    require(tau >= -1.0 && tau <= 1.0, s"tau must be a cosine in [-1, 1] (got $tau)")
    require(cells > 0, s"cells must be positive (got $cells)")
    val cent =
      if (trainIters > 0) trainCentroids(vecs, cells, trainIters, idCol,
        vecCol, portableSeeding, trainSample)
      else seedCentroids(vecs, cells, seedHashFor(idCol, portableSeeding),
        idCol, vecCol)
    // the assigned+ranked frame feeds BOTH pair-join sides and the
    // final verdict join — cache it or the centroid-assignment pass (a
    // full corpus scan + scoring) runs three times. The returned frame
    // reads through this barrier, so it is registered for
    // GraphBlocks.release (the contaminatedNear pattern); a cluster
    // deployment would persist the one-column-wider assigned corpus
    // instead.
    val a0 =
      if (superCells > 0)
        assignCellsHier(vecs, cent, superCells, "_id", "_v", idCol, vecCol,
          portableSeeding)
      else assignCells(vecs, cent, "_id", "_v", probes = 1, idCol, vecCol)
    // _rk: the keeper priority (smaller wins). Earliest mode uses the
    // id itself — no window, no extra pass. Farthest mode re-scores
    // against the broadcast centroids (assignCells' max_by discards
    // its internal score; ANN consumers of that frame join on `cell`
    // and an extra column would collide) and ranks per cell.
    val a = (if (!keepFarthest) a0.withColumn("_rk", col("_id"))
      else {
        val wr = Window.partitionBy("cell")
          .orderBy(col("_cd").asc, col("_id").asc)
        a0.join(cent, Seq("cell"))
          .withColumn("_cd", cosine(col("_v"), col("cv"))).drop("cv")
          .withColumn("_rk", row_number().over(wr).cast("long"))
          .drop("_cd")
      }).cache()
    val x = a.select(col("_id").as("x_id"), col("_v").as("xv"),
      norm(col("_v")).as("xn"), col("cell"), col("_rk").as("x_rk"))
    val y = a.select(col("_id").as("y_id"), col("_v").as("yv"),
      norm(col("_v")).as("yn"), col("cell"), col("_rk").as("y_rk"))
    // cell-keyed equi-join; map-side-combined best-ranked dominator.
    // The min_by key is the SINGLE _rk column, not a struct: _rk is
    // unique inside a cell (row_number in farthest mode, the id itself
    // in earliest mode) so no tie-break is needed, and a struct-keyed
    // min_by is not hash-aggregable — Spark silently falls back to
    // SortAggregate over the FULL pair frame (the keepBest lesson;
    // PlanSpec pins the hash form here too).
    val dom = x.join(y, Seq("cell"))
      .filter(col("y_rk") < col("x_rk") &&
        dot(col("xv"), col("yv")) / (col("xn") * col("yn")) >= tau)
      .groupBy(col("x_id").as("_id"))
      .agg(min_by(col("y_id"), col("y_rk")).as("_dup"))
    val out = a.join(dom, Seq("_id"), "left")
      .select(col("_id").as(idCol), col("cell"),
        coalesce(col("_dup"), lit(-1L)).as("dup_of"),
        when(col("_dup").isNull, 1L).otherwise(0L).as("keep"))
    GraphBlocks.registerCached(out, Seq(a))
  }

  /** The per-row symmetric int8 scale: `max(|v_i|) / 127`. */
  def int8Scale(vecCol: Column): Column =
    array_max(transform(vecCol, x => abs(x))) / 127.0

  /** Symmetric int8 embedding quantization — the storage/serving trade
    * every large corpus makes (4 bytes/dim → 1): `q_i = round(v_i /
    * scale)` ∈ [-127, 127], dequantize = `q_i · scale`. Adds `scale`
    * and `q`. The scale is LET-BOUND through a one-element lambda
    * inside the quantize transform (interpreted HOFs get no
    * common-subexpression elimination — an inlined scale expression
    * would re-scan the vector once per ELEMENT), so no barrier is
    * needed before this call. Materialize the OUTPUT behind a barrier
    * (cache) before [[int8Audit]], which references `q` three times. */
  def int8Quantize(df: DataFrame, vecCol: String = "v"): DataFrame = {
    val q = element_at(transform(array(int8Scale(col(vecCol))), s =>
      transform(col(vecCol), x =>
        when(s === 0.0, lit(0.0)).otherwise(round(x / s)))), 1)
    df.withColumn("scale", int8Scale(col(vecCol))).withColumn("q", q)
  }

  /** Audit columns over a MATERIALIZED [[int8Quantize]] output (cache it
    * first — `q` is referenced per column, and only an attribute
    * reference is free): an order-weighted integer checksum (exact — a
    * permuted or truncated vector cannot pass) and the max absolute
    * reconstruction error (≤ scale/2 by construction — the bound a
    * caller should assert). */
  def int8Audit(qdf: DataFrame, vecCol: String = "v"): DataFrame =
    qdf
      .withColumn("q_checksum",
        aggregate(zip_with(col("q"), sequence(lit(1), size(col("q"))),
          (qi, i) => qi.cast("long") * i.cast("long")),
          lit(0L), (acc, x) => acc + x))
      .withColumn("max_err",
        array_max(zip_with(col("q"), col(vecCol),
          (qi, vi) => abs(qi * col("scale") - vi))))
}
