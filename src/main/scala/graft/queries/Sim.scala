package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.ColFns._
import graft.functions.VectorExprs.{cosineFast, vecDot, vecNorm}
import graft.queries.Registry.t

/** Similarity search over the `embeddings` table (64-dim float vectors)
  * plus the multimodal-column plumbing demo — the remaining north-star
  * operator families.
  *
  * Vector math: elements are widened to double BEFORE accumulation and
  * dot products use a sequential left fold (`aggregate` over `zip_with`)
  * so the result is deterministic; cross-engine drift is absorbed by
  * round(..., 4) — selection/ordering gaps in random embeddings are far
  * larger than 1 ulp.
  */
object Sim {

  private val dDot = (a: String, b: String) =>
    s"list_inner_product($a::DOUBLE[], $b::DOUBLE[])"

  /** Bucket CTEs for the PRODUCTION density-scaled geometry twins
    * (e11/e12): the oracle SQL is a static string and can't know the
    * corpus size, so it recomputes [[planesFor]] itself —
    * cells = max(1, n // 64), p = clamp(8, 62, bits(cells − 1)) — and
    * derives each vector's bucket from per-(vec_id, plane) sign bits
    * (one `psums` row per plane, instead of e04's static s0..s7
    * columns, so the plane count can be a runtime value). `bits(m)` =
    * `length(bin(m))` equals `64 − numberOfLeadingZeros(m)` for m ≥ 1,
    * so both engines pick the SAME plane count for the same corpus. */
  private val dynBkt =
    """unnested AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
      |         unnest(embedding::DOUBLE[]) AS v
      |  FROM embeddings),
      |par AS (SELECT LEAST(62, GREATEST(8,
      |          CASE WHEN cells <= 1 THEN 0 ELSE length(bin(cells - 1)) END)) AS p
      |        FROM (SELECT GREATEST(1, COUNT(*) // 64) AS cells FROM embeddings)),
      |planes AS (SELECT unnest(range((SELECT p FROM par))) AS j),
      |psums AS (SELECT u.vec_id, pl.j,
      |            SUM(u.v * ((((u.pos - 1) * 37 + pl.j * 101) % 19) - 9)) AS s
      |          FROM unnested u CROSS JOIN planes pl
      |          GROUP BY u.vec_id, pl.j),
      |bkt AS (SELECT vec_id,
      |          CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS bkt
      |        FROM psums GROUP BY vec_id),
      |e AS (SELECT embeddings.vec_id, embedding, bkt
      |      FROM embeddings JOIN bkt ON embeddings.vec_id = bkt.vec_id)""".stripMargin

  /** Micro-unit (1e-6) quantization of a float-derived value:
    * round-half-away built from explicit IEEE primitives (double
    * multiply, +0.5, floor) that Spark and DuckDB evaluate
    * bit-identically — unlike engine `CAST(double AS DECIMAL)`, whose
    * half-way handling on arbitrary floats is engine-defined. The long
    * outputs then sum EXACTLY, in any order, on any partition layout. */
  private[queries] def microQ(vf: Column): Column = {
    val d = vf.cast("double") * lit(1000000.0)
    when(d >= 0, floor(d + lit(0.5))).otherwise(-floor(-d + lit(0.5))).cast("long")
  }

  /** DuckDB twin of [[microQ]] over a double column named `v`. */
  private[queries] val microQSql: String =
    "CAST(CASE WHEN v * 1000000.0 >= 0 THEN FLOOR(v * 1000000.0 + 0.5) " +
      "ELSE -FLOOR(-(v * 1000000.0) + 0.5) END AS BIGINT)"

  /** Round-half-away-from-zero of the rational num/den (den > 0) in pure
    * long arithmetic — the order-independent replacement for
    * `round(avg, k)` once values are micro-quantized: every operand is
    * exact, so the result is identical across engines and runs. */
  private[queries] def halfAwayDiv(num: Column, den: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    def ldiv(a: Column, b: Column): Column =
      org.apache.spark.sql.GraftShim.column(new IntegralDivide(
        org.apache.spark.sql.GraftShim.expression(a),
        org.apache.spark.sql.GraftShim.expression(b)))
    // both branches divide non-negative by positive, so truncation==floor
    when(num >= 0, ldiv(num * 2 + den, den * 2))
      .otherwise(-ldiv((-num) * 2 + den, den * 2))
  }

  /** DuckDB twin of [[halfAwayDiv]] (`//` truncates; operands kept
    * non-negative per branch so truncation==floor there too). */
  private[queries] def halfAwayDivSql(num: String, den: String): String =
    s"(CASE WHEN $num >= 0 THEN (2*($num) + ($den)) // (2*($den)) " +
      s"ELSE -((2*(-($num)) + ($den)) // (2*($den))) END)"

  /** Truncating long divide num div den for NON-NEGATIVE num, positive
    * den (truncation == floor there, matching DuckDB `//`) — the exact
    * integer-rate primitive the d33/d36 scoring formulas are built on.
    * Codegen'd Catalyst IntegralDivide, not a double round-trip: a
    * double division is inexact past 2⁵³ and would drift cross-engine. */
  private[queries] def floorDiv(num: Column, den: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    org.apache.spark.sql.GraftShim.column(new IntegralDivide(
      org.apache.spark.sql.GraftShim.expression(num),
      org.apache.spark.sql.GraftShim.expression(den)))
  }

  /** Seed model for the k-means step: per-(label,pos) centroid at 6-dp
    * resolution, computed with order-independent integer arithmetic
    * end-to-end (quantize → exact long sum → integer half-away divide).
    * The only floating-point steps are the final /1e6 and the float
    * narrowing — single IEEE roundings of exact operands, bit-identical
    * across engines AND across shuffle layouts (the `round(avg(),6)`
    * this replaces flipped its last digit with partial-agg order:
    * CORRECTNESS_r06 e08 `hash_match: false`). Public so ClusteringSpec
    * can pin the query against an independent long-format formulation
    * of the same model. */
  def kmeansSeedModel(s: org.apache.spark.sql.SparkSession, dir: String): Seq[(Int, Array[Float])] =
    kmeansSeedModelDf(t(s, dir, "embeddings"))

  /** DataFrame-in variant of [[kmeansSeedModel]] (shared with
    * CurationPipeline's cluster-balanced selection). */
  def kmeansSeedModelDf(e0: org.apache.spark.sql.DataFrame): Seq[(Int, Array[Float])] = {
    val centRows = e0.filter(col("embedding").isNotNull)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "vf")))
      .filter(col("vf").isNotNull)
      .select(col("label"), col("pos"), microQ(col("vf")).as("m"))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("m")).as("sm"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"),
        (halfAwayDiv(col("sm"), col("n")).cast("double") / 1000000.0).as("c"))
      .collect()
    centRows.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (l, rs) =>
        l -> rs.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat).toArray }
  }

  /** Full Lloyd's k-means over the embeddings table: iterate the e08
    * step (codegen'd argmin assignment scan + exact-integer centroid
    * update) until the model stops moving or `maxIters` is hit; returns
    * the final label → centroid model and the iterations used. Every
    * iteration is one scan + one map-side-combinable aggregation; the
    * model (K×dim floats) is the only thing collected, so the loop is
    * driver-cheap at any corpus size. Quantized 6-dp centroids make
    * convergence EXACT (float equality is well-defined — no epsilon),
    * deterministic across partition layouts, and guarantee termination
    * detection is stable: the same property that fixed e08's oracle.
    * A cluster that loses all members keeps its previous centroid (the
    * standard empty-cluster fallback, and the deterministic one). */
  def kmeansIterate(
      s: org.apache.spark.sql.SparkSession,
      dir: String,
      maxIters: Int = 10): (Seq[(Int, Array[Float])], Int) = {
    val e = t(s, dir, "embeddings").filter(col("embedding").isNotNull)
    var model = kmeansSeedModel(s, dir)
    var iters = 0
    var converged = false
    while (iters < maxIters && !converged) {
      // element-wise aggregate, no corpus explode: argmin runs once per
      // vector (the e08 shape — the exploded formulation re-evaluated
      // it per element above the Generate)
      val rows = e
        .select(graft.functions.KMeansExprs.assignCluster(col("embedding"), model).as("cluster"),
          col("embedding"))
        .filter(col("cluster").isNotNull) // unscoreable vectors contribute to no centroid
        .groupBy(col("cluster"))
        .agg(graft.functions.VectorExprs.vecMicroSum(col("embedding")).as("vs"))
        .select(col("cluster"),
          posexplode(arrays_zip(col("vs.sm").as("sm"), col("vs.n").as("n")))
            .as(Seq("pos", "z")))
        .filter(col("z.n") > 0)
        .select(col("cluster"), col("pos"),
          (halfAwayDiv(col("z.sm"), col("z.n")).cast("double") / 1000000.0).as("c"))
        .collect()
      val updated = rows.groupBy(_.getInt(0)).map { case (l, rs) =>
        l -> rs.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat).toArray }
      val next = model.map { case (l, old) => l -> updated.getOrElse(l, old) }
      converged = next.zip(model).forall { case ((_, a), (_, b)) => a.sameElements(b) }
      model = next
      iters += 1
    }
    (model, iters)
  }

  /** Plane count for a target in-bucket population: the in-bucket
    * self-join does O(bucket²) cosine work, so bucket size must stay
    * ~constant as the corpus grows — planes ≈ log2(n / targetBucket).
    * Measured at sf10 (200k vectors): the oracle-pinned 8 planes leave
    * ~780 vectors/bucket and e06 pays 252 s; planesFor(200000) = 12
    * gives ~49/bucket and the same join is ~25× less pair work. Clamped
    * to [8, 62] so small corpora keep the oracle geometry. */
  def planesFor(n: Long, targetBucket: Int = 64): Int = {
    val cells = math.max(1L, n / targetBucket)
    // ceil(log2(cells)) so targetBucket is an upper bound on mean size
    math.min(62, math.max(8, (64 - java.lang.Long.numberOfLeadingZeros(cells - 1)).toInt))
  }

  /** PRODUCTION KNN join: e06's shape with a density-chosen plane count
    * (no DuckDB twin — the oracle pins 8 planes; bucket refinement vs
    * the 8-plane code is exact and spec-checked, see PlaneBucketSpec).
    * Recall note: finer buckets trade recall for bounded work exactly
    * like coarser LSH bands; multi-probe (flipping low-margin bits)
    * is the standard recall-recovery knob and composes here by
    * unioning probe codes.
    */
  def knnJoinFast(s: org.apache.spark.sql.SparkSession, dir: String,
      planes: Int, k: Int = 3): org.apache.spark.sql.DataFrame = {
    // Norms once per ROW, before the self-join: the per-pair hot path
    // pays ONE array dot instead of three (see [[VectorExprs.vecNorm]] —
    // bit-identical cosine; pairs grow quadratically with bucket
    // density, rows don't, and the norm is 8 bytes of shuffle payload).
    val e = t(s, dir, "embeddings")
      .withColumn("bkt",
        graft.functions.PlaneBucketExpr.planeBucketCode(col("embedding"), planes))
      .withColumn("nrm", vecNorm(col("embedding")))
      .repartition(col("bkt"))
    val a = e.select(col("bkt"), col("vec_id"), col("embedding"), col("nrm"))
    val b = e.select(col("bkt"), col("vec_id").as("nbr_id"),
      col("embedding").as("ne"), col("nrm").as("nnrm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cos_sim").desc, col("nbr_id").asc)
    a.join(b, Seq("bkt"))
      .filter(col("vec_id") =!= col("nbr_id"))
      .withColumn("cos_sim",
        round(vecDot(col("embedding"), col("ne")) / (col("nrm") * col("nnrm")), 4))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("vec_id"), col("nbr_id"), col("cos_sim"), col("rk"))
  }

  /** OR-amplified KNN join — the recall knob. Single-probe bucketing
    * (knnJoinFast) has gap-dependent recall: on organic uniform
    * embeddings, measured recall@3 at sf0.1 is only ~7% with one
    * 8-plane family (true neighbors are barely closer than random, so
    * they rarely share all 8 sign bits). The standard LSH AND-OR
    * construction fixes this: L independent 8-plane families (computed
    * as ONE 8L-plane pass, bit-sliced — planes are independent by
    * construction), candidates = union over families of same-bucket
    * pairs, then exact-cosine rank. Measured recall@3 at sf0.1 (300
    * query sample vs brute-force truth, RecallProbe): 0.07/0.11/0.18/
    * 0.23 for L=1/2/4/7 — families correlate through the shared
    * embedding, so gains are sub-independent but monotone. Work stays
    * linear in L (one explode + one (family, code) shuffle), never
    * all-pairs.
    */
  def knnJoinOr(s: org.apache.spark.sql.SparkSession, dir: String,
      families: Int = 4, planesPerFamily: Int = 8, k: Int = 3): org.apache.spark.sql.DataFrame = {
    val total = families * planesPerFamily
    require(total <= 62, s"families*planesPerFamily must be <= 62, got $total")
    val mask = (1L << planesPerFamily) - 1
    val e = t(s, dir, "embeddings").withColumn("code",
      graft.functions.PlaneBucketExpr.planeBucketCode(col("embedding"), total))
    // per-row norms before the self-join — see knnJoinFast
    val withFam = e.select(col("vec_id"), col("embedding"),
      vecNorm(col("embedding")).as("nrm"),
      explode(array((0 until families).map(f =>
        concat_ws(":", lit(f),
          shiftrightunsigned(col("code"), f * planesPerFamily)
            .bitwiseAND(lit(mask)))): _*)).as("fc"))
      .repartition(col("fc"))
    val a = withFam.select(col("fc"), col("vec_id"), col("embedding"), col("nrm"))
    val b = withFam.select(col("fc"), col("vec_id").as("nbr_id"),
      col("embedding").as("ne"), col("nrm").as("nnrm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cos_sim").desc, col("nbr_id").asc)
    a.join(b, Seq("fc"))
      .filter(col("vec_id") =!= col("nbr_id"))
      .select(col("vec_id"), col("nbr_id"), col("embedding"), col("ne"),
        col("nrm"), col("nnrm"))
      .dropDuplicates("vec_id", "nbr_id")
      .withColumn("cos_sim",
        round(vecDot(col("embedding"), col("ne")) / (col("nrm") * col("nnrm")), 4))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("vec_id"), col("nbr_id"), col("cos_sim"), col("rk"))
  }

  /** PRODUCTION near-dup pairs: e05's shape with a density-chosen plane
    * count — the same geometry rule as [[knnJoinFast]] (planes ≈
    * log2(n/targetBucket) keeps the in-bucket pair work constant as the
    * corpus grows; the oracle-pinned 8-plane gate query is the
    * planes=8 special case, spec-asserted equal). Feed the pairs to
    * [[graft.operators.ConnectedComponents]] for SemDeDup clustering
    * (e10's shape) at any scale. */
  def nearDupPairs(s: org.apache.spark.sql.SparkSession, dir: String,
      planes: Int, threshold: Double = 0.2): org.apache.spark.sql.DataFrame = {
    // per-row norms before the self-join — see knnJoinFast
    val e = t(s, dir, "embeddings")
      .withColumn("bkt",
        graft.functions.PlaneBucketExpr.planeBucketCode(col("embedding"), planes))
      .withColumn("nrm", vecNorm(col("embedding")))
      .repartition(col("bkt"))
    val a = e.select(col("bkt"), col("vec_id").as("vec_id_a"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = e.select(col("bkt"), col("vec_id").as("vec_id_b"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("bkt"))
      .filter(col("vec_id_a") < col("vec_id_b"))
      .withColumn("cos_sim",
        round(vecDot(col("ea"), col("eb")) / (col("na") * col("nb")), 4))
      .filter(col("cos_sim") >= threshold)
      .select(col("vec_id_a"), col("vec_id_b"), col("cos_sim"))
  }

  /** IVF ANN with a TRAINED coarse quantizer: cells come from
    * [[kmeansIterate]] (instead of e03/e07's label-seeded means), rows
    * are assigned by the codegen'd [[graft.functions.KMeansArgMin]],
    * and the query probes its `nprobe` nearest cells exactly like a
    * production IVF index. The model is driver-resident (K×dim) at any
    * corpus size; the scan stays scan-parallel; only the probed cells'
    * rows pay the exact cosine. Spec (RecallSpec) pins equivalence to
    * brute force restricted to the probed cells — the IVF contract —
    * plus a recall floor vs global truth. */
  def ivfSearchTrained(
      s: org.apache.spark.sql.SparkSession,
      dir: String,
      queryVecId: Long = 0L,
      k: Int = 5,
      nprobe: Int = 2,
      trainIters: Int = 3): org.apache.spark.sql.DataFrame = {
    val (model, _) = kmeansIterate(s, dir, trainIters)
    val e = t(s, dir, "embeddings").filter(col("embedding").isNotNull)
    val cells = e.withColumn("cell",
      graft.functions.KMeansExprs.assignCluster(col("embedding"), model))
    val qRows = cells.filter(col("vec_id") === queryVecId)
      .select(col("embedding")).collect()
    require(qRows.nonEmpty,
      s"ivfSearchTrained: query vec_id=$queryVecId not present (or null embedding) in $dir/embeddings")
    val qv = qRows.head.getSeq[Float](0).toArray
    // nprobe nearest cells, scored on the driver: same c·c − 2·q·c
    // ordering and tie rule as the assignment expression
    val probes = model.map { case (l, c) =>
      val cc = c.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
      val dot = c.zip(qv).foldLeft(0.0) { case (a, (x, y)) => a + x.toDouble * y.toDouble }
      (l, cc - 2.0 * dot)
    }.sortBy { case (l, sc) => (sc, l) }.take(nprobe).map(_._1)
    val q = cells.filter(col("vec_id") === queryVecId).select(col("embedding").as("qe"))
    cells.filter(col("cell").isin(probes: _*))
      .filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .withColumn("cos_sim", round(cosineFast(col("embedding"), col("qe")), 4))
      .orderBy(col("cos_sim").desc, col("vec_id").asc).limit(k)
      .select(col("cell"), col("vec_id"), col("cos_sim"))
  }

  /** Exact micro-unit PQ codebook (label, pos, cm): the e08 seed model
    * BEFORE its /1e6 narrowing, so every downstream subspace distance
    * is pure long arithmetic. Shared by the e15 gate and
    * [[ivfPqSearch]]. */
  private[queries] def pqCodebookDf(e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    e.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "vf")))
      .filter(col("vf").isNotNull)
      .select(col("label"), col("pos"), microQ(col("vf")).as("m"))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("m")).as("sm"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"), halfAwayDiv(col("sm"), col("n")).as("cm"))

  /** Integer subspace distances (vec_id, sub, label, d2) of every
    * vector in `vecs` to every codebook centroid: ONE vec_id spread
    * (whole arrays, pre-explode), broadcast codebook join, map-side
    * partial agg — every downstream aggregation is keyed on a vec_id
    * prefix, so nothing re-shuffles after the spread. */
  private[queries] def pqD2Df(vecs: org.apache.spark.sql.DataFrame,
      cent: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    vecs.repartition(col("vec_id"))
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "vf")))
      .filter(col("vf").isNotNull)
      .select(col("vec_id"), col("pos"), expr("pos DIV 8").as("sub"),
        microQ(col("vf")).as("m"))
      .join(broadcast(cent), Seq("pos"))
      .groupBy(col("vec_id"), col("sub"), col("label"))
      .agg(sum((col("m") - col("cm")) * (col("m") - col("cm"))).as("d2"))

  /** PQ codes: argmin centroid per (vector, subspace), ties → smaller
    * label; exact integer comparison, map-side-combinable min(struct). */
  private[queries] def pqCodesDf(d2: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    d2.groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("d2"), col("label"))).as("best"))
      .select(col("vec_id"), col("sub"), col("best").getField("label").as("code"))

  /** PRODUCTION IVF-PQ search — the composition the e15 Scaladoc
    * promises: a trained coarse quantizer ([[kmeansIterate]] cells,
    * codegen'd [[graft.functions.KMeansArgMin]] assignment) prunes the
    * scan to the query's `nprobe` nearest cells, and ONLY those cells'
    * vectors pay the PQ pipeline (integer subspace distances → codes →
    * additive distance-table ranking) before the exact-cosine re-rank
    * of the top-20. Codebooks are global (trained on the full corpus,
    * as a real index trains them); the cell filter is the scan-pruning
    * lever. With nprobe = K this is spec-pinned EQUAL to the
    * oracle-checked e15 gate (ClusteringSpec), so the production path
    * inherits the gate's cross-engine signal. */
  def ivfPqSearch(
      s: org.apache.spark.sql.SparkSession,
      dir: String,
      queryVecId: Long = 0L,
      k: Int = 5,
      nprobe: Int = 2,
      trainIters: Int = 3): org.apache.spark.sql.DataFrame = {
    val (model, _) = kmeansIterate(s, dir, trainIters)
    val e = t(s, dir, "embeddings").filter(col("embedding").isNotNull)
    val cells = e.withColumn("cell",
      graft.functions.KMeansExprs.assignCluster(col("embedding"), model))
    val qRows = cells.filter(col("vec_id") === queryVecId)
      .select(col("embedding")).collect()
    require(qRows.nonEmpty,
      s"ivfPqSearch: query vec_id=$queryVecId not present (or null embedding) in $dir/embeddings")
    val qv = qRows.head.getSeq[Float](0).toArray
    // nprobe nearest cells, scored on the driver: same c·c − 2·q·c
    // ordering and tie rule as the assignment expression
    val probes = model.map { case (l, c) =>
      val cc = c.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
      val dot = c.zip(qv).foldLeft(0.0) { case (a, (x, y)) => a + x.toDouble * y.toDouble }
      (l, cc - 2.0 * dot)
    }.sortBy { case (l, sc) => (sc, l) }.take(nprobe).map(_._1)
    val probed = cells
      .filter(col("cell").isin(probes: _*) || col("vec_id") === queryVecId)
      .select(col("vec_id"), col("embedding"))
    val d2 = pqD2Df(probed, pqCodebookDf(e))
    val codes = pqCodesDf(d2)
    val qdt = d2.filter(col("vec_id") === queryVecId)
      .select(col("sub"), col("label").as("code"), col("d2").as("qd2"))
    val cand = codes.filter(col("vec_id") =!= queryVecId)
      .join(broadcast(qdt), Seq("sub", "code"))
      .groupBy(col("vec_id")).agg(sum(col("qd2")).as("adc"))
      .orderBy(col("adc").asc, col("vec_id").asc).limit(20)
    val q = e.filter(col("vec_id") === queryVecId).select(col("embedding").as("qe"))
    cand.join(e, Seq("vec_id")).crossJoin(broadcast(q))
      .withColumn("cos_sim", round(cosineFast(col("embedding"), col("qe")), 4))
      .orderBy(col("cos_sim").desc, col("vec_id").asc).limit(k)
      .select(col("vec_id"), col("adc"), col("cos_sim"))
  }

  /** Shared batch≡stream body of e14 semantic decontamination: keep the
    * rows of `tgt` that have NO `ref` vector in the same hyperplane
    * bucket at rounded cosine ≥ `threshold`. The reference side is an
    * eval suite — broadcast-sized at any corpus scale — so this is ONE
    * stateless left-anti broadcast join: the target side never
    * shuffles, and because a stream-static anti join needs no state or
    * watermark, the SAME body runs over an unbounded target stream
    * ([[graft.streaming.StreamingBuckets.semanticDecontamStream]]) —
    * batch backfill and stream keep the identical set by construction.
    * The equi-bucket conjunct keys the broadcast hash join; the cosine
    * test rides as the join filter, paid only on bucket collisions. */
  def semanticDecontamKeepDf(
      tgt: org.apache.spark.sql.DataFrame,
      ref: org.apache.spark.sql.DataFrame,
      threshold: Double = 0.2,
      planes: Int = 8): org.apache.spark.sql.DataFrame = {
    // planes = 8 is the oracle-pinned gate geometry; a deployment scales
    // it with planesFor(n) (the e11 density rule) — more planes → fewer
    // bucket collisions → monotonically FEWER drops (kept-set refinement,
    // spec-pinned), keeping the per-row probe cost constant as the
    // corpus grows while the drop set converges on true semantic matches
    val bucket = (c: Column) => graft.functions.PlaneBucketExpr.planeBucketCode(c, planes)
    // per-row norms on BOTH sides before the join: the collision filter
    // pays one array dot per colliding pair instead of three
    // (bit-identical — see VectorExprs.vecNorm)
    val refB = broadcast(ref
      .select(bucket(col("embedding")).as("_rbkt"), col("embedding").as("_re"),
        vecNorm(col("embedding")).as("_rnrm")))
    tgt.withColumn("_bkt", bucket(col("embedding")))
      .withColumn("_tnrm", vecNorm(col("embedding")))
      .join(refB,
        col("_bkt") === col("_rbkt") &&
          round(vecDot(col("embedding"), col("_re")) /
            (col("_tnrm") * col("_rnrm")), 4) >= threshold,
        "left_anti")
      .drop("_bkt", "_tnrm")
  }

  /** Cluster-balanced quota sample (e09's exact body, DataFrame-in so
    * CurationPipeline can use it as a selection strategy): assign every
    * vector to its nearest seed centroid, keep each cluster's `quota`
    * most-central vectors. Output (cluster, vec_id, score, rk) — the
    * shape the e09 oracle pins. */
  def clusterSampleDf(e0: org.apache.spark.sql.DataFrame, quota: Int = 20): org.apache.spark.sql.DataFrame = {
    val e = e0.filter(col("embedding").isNotNull)
    val model = kmeansSeedModelDf(e0)
    // ONE fused model loop emits (cluster, score) together
    // (KMeansAssign): the former shape ran the argmin expression and
    // then re-derived the score via a per-label conditional — a second
    // dot product per row. The fused score IS the argmin's own bestS
    // (cc − 2·e·c, same fold), so the double stays bit-identical to
    // the oracle's `s`; null struct = unscoreable, excluded as before.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(col("score").asc, col("vec_id").asc)
    e.select(col("vec_id"),
        graft.functions.KMeansExprs.assignWithScore(col("embedding"), model).as("as"))
      .filter(col("as").isNotNull) // unscoreable vectors are excluded (twin: s IS NOT NULL)
      .select(col("vec_id"), col("as.cluster").as("cluster"), col("as.score").as("score"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= quota)
      .select(col("cluster").cast("long").as("cluster"), col("vec_id"),
        col("score"), col("rk"))
  }

  /** Per-dim micro-unit (lo, hi) stats for scalar quantization — the
    * e13 gate's stats pass, collected (dim-sized, like a k-means model).
    * One map-side-combinable aggregation; a real deployment trains this
    * once on a sample and stores it beside the codes table. */
  def sqStats(e0: org.apache.spark.sql.DataFrame): (Array[Long], Array[Long]) = {
    val rows = e0.filter(col("embedding").isNotNull)
      .select(posexplode(col("embedding")).as(Seq("pos", "vf")))
      .filter(col("vf").isNotNull)
      .select(col("pos"), microQ(col("vf")).as("m"))
      .groupBy(col("pos")).agg(min(col("m")).as("lo"), max(col("m")).as("hi"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    (rows.map(_._2), rows.map(_._3))
  }

  /** The PRODUCTION codes table: vec_id + one packed byte per dimension
    * ([[graft.functions.SqExprs.sqEncode]], whole-stage codegen) — 4×
    * smaller than float32, computed in one scan-parallel pass. This is
    * what an SQ deployment scans; the e13 gate keeps the long format
    * because the DuckDB oracle has no byte-array kernel. */
  def sqCodesDf(e0: org.apache.spark.sql.DataFrame,
      lo: Array[Long], hi: Array[Long]): org.apache.spark.sql.DataFrame =
    e0.filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        graft.functions.SqExprs.sqEncode(col("embedding"), lo, hi).as("codes"))

  /** PRODUCTION SQ ANN search over the packed codes: integer ADC scan
    * (codegen'd [[graft.functions.SqAdc]]) → top-`overfetch` candidates
    * → exact cosine re-rank → top-`k`. Identical tie rules to e13
    * (integer adc desc / vec_id asc, then rounded cosine desc / vec_id
    * asc), so SqSpec pins full output equality with the oracle-checked
    * gate. Only the dim-sized stats and the one query row ever reach
    * the driver. */
  def sqSearch(s: org.apache.spark.sql.SparkSession, dir: String,
      queryVecId: Long = 0L, k: Int = 5, overfetch: Int = 20): org.apache.spark.sql.DataFrame = {
    val e = t(s, dir, "embeddings").filter(col("embedding").isNotNull)
    val (lo, hi) = sqStats(e)
    val codes = sqCodesDf(e, lo, hi)
    val qRows = codes.filter(col("vec_id") === queryVecId).select(col("codes")).collect()
    require(qRows.nonEmpty,
      s"sqSearch: query vec_id=$queryVecId not present (or null embedding) in $dir/embeddings")
    val qCodes = qRows.head.getAs[Array[Byte]](0)
    val cand = codes.filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"),
        graft.functions.SqExprs.sqAdc(col("codes"), qCodes).as("adc"))
      .orderBy(col("adc").desc, col("vec_id").asc).limit(overfetch)
    val q = e.filter(col("vec_id") === queryVecId).select(col("embedding").as("qe"))
    cand.join(e, Seq("vec_id")).crossJoin(broadcast(q))
      .withColumn("cos_sim", round(cosineFast(col("embedding"), col("qe")), 4))
      .orderBy(col("cos_sim").desc, col("vec_id").asc).limit(k)
      .select(col("vec_id"), col("adc"), col("cos_sim"))
  }

  /** e02's exact brute-force ranking: top-k by rounded cosine against
    * the vec_id-0 anchor, vec_id tie-break (the rounded-ordering
    * discipline — see the e02 gate note). Shared by e02 and the e18
    * recall report. */
  private[graft] def exactTopKDf(e: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    // query self-norm once in the broadcast row, not once per scanned
    // row: 3 array dots/row → 2 (bit-identical — VectorExprs.vecNorm)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"), vecNorm(col("embedding")).as("qn"))
    e.filter(col("vec_id") > 0).crossJoin(broadcast(q))
      .withColumn("cos_sim", round(
        vecDot(col("embedding"), col("qe")) /
          (vecNorm(col("embedding")) * col("qn")), 4))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"), col("cos_sim"))
  }

  /** e04's hyperplane-LSH ranking: exact cosine top-k INSIDE the
    * anchor's bucket (8 static planes, codegen'd PlaneBucketCode).
    * Shared by e04 and the e18 recall report. */
  private[graft] def lshTopKDf(e: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    val b = e.withColumn("bkt",
      graft.functions.PlaneBucketExpr.planeBucketCode(col("embedding")))
    // query self-norm once in the broadcast row — see exactTopKDf
    val q = b.filter(col("vec_id") === 0)
      .select(col("bkt").as("qbkt"), col("embedding").as("qe"),
        vecNorm(col("embedding")).as("qn"))
    b.filter(col("vec_id") > 0).crossJoin(broadcast(q))
      .filter(col("bkt") === col("qbkt"))
      .withColumn("cos_sim", round(
        vecDot(col("embedding"), col("qe")) /
          (vecNorm(col("embedding")) * col("qn")), 4))
      .orderBy(col("cos_sim").desc, col("vec_id").asc).limit(k)
      .select(col("vec_id"), col("cos_sim"))
  }

  /** e03's IVF ranking: per-label centroid coarse quantizer, probe the
    * best cell, exact cosine top-k inside it. Shared by e03 and the
    * e18 recall report. */
  private[graft] def ivfTopKDf(e: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    val qd = e.filter(col("vec_id") === 0)
      .select(posexplode(asDoubles(col("embedding")))).toDF("pos", "qv")
    val cent = e.select(col("label"), posexplode(asDoubles(col("embedding"))))
      .toDF("label", "pos", "v")
      .groupBy(col("label"), col("pos")).agg(avg(col("v")).as("c"))
    val best = cent.join(broadcast(qd), Seq("pos"))
      .groupBy(col("label")).agg(sum(col("c") * col("qv")).as("dot"))
      .orderBy(col("dot").desc, col("label").asc).limit(1)
      .select(col("label"))
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    e.join(broadcast(best), Seq("label")).filter(col("vec_id") > 0)
      .crossJoin(broadcast(q))
      .withColumn("cos_sim", round(cosineFast(col("embedding"), col("qe")), 4))
      .orderBy(col("cos_sim").desc, col("vec_id").asc).limit(k)
      .select(col("label"), col("vec_id"), col("cos_sim"))
  }

  /** Session-scoped trained-index cache for the PLAIN PQ chain: the
    * codebook literal + the corpus code table (the PQ index a
    * production deployment stores and serves). Same key/invalidation
    * discipline as [[residualModel]]: [[invalidateIndexCaches]] clears
    * BOTH caches and releases their checkpoint blocks. */
  private val pqModelCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan),
    (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]()

  /** Session-scoped SEMANTIC-DEDUP cluster index (e10): the connected-
    * components (id, rep) table over the bucketed-cosine edge graph.
    * Like d13's narrow dedup index and the PQ code tables, this is a
    * trained artifact — at 100 TB it builds once per corpus snapshot
    * (edge generation + the CC loop, the expensive eager part) and
    * every consumer (dedup keep-lists, cluster stats, the e10 gate's
    * rep join) serves from the checkpointed narrow leaf. Same
    * key/invalidation discipline as the PQ caches. */
  private val semDedupCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan),
    org.apache.spark.sql.DataFrame]()

  /** Train (or fetch) the semantic-dedup cluster index for corpus `e0`:
    * hyperplane-bucketed cosine edges (pair-bounded, never all-pairs) →
    * connected components → the checkpointed (id, rep) table. Eager on
    * first call (the CC loop materializes its rounds), a cache hit
    * afterwards — serving a dedup lookup must not re-cluster the
    * corpus, exactly as serving a PQ lookup must not retrain the
    * codebook. */
  private[graft] def semDedupIndex(e0: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame = {
    semDedupCache.keySet.removeIf(_._1.sparkContext.isStopped)
    semDedupCache.computeIfAbsent(
      (e0.sparkSession, e0.queryExecution.analyzed.canonicalized), _ => {
        // per-row norms before the self-join — see knnJoinFast
        val e = e0.withColumn("bkt",
          graft.functions.PlaneBucketExpr.planeBucketCode(col("embedding")))
          .withColumn("nrm", vecNorm(col("embedding")))
        val a = e.select(col("bkt"), col("vec_id").as("u"),
          col("embedding").as("ea"), col("nrm").as("na"))
        val b = e.select(col("bkt"), col("vec_id").as("v"),
          col("embedding").as("eb"), col("nrm").as("nb"))
        val edges = a.join(b, Seq("bkt"))
          .filter(col("u") < col("v"))
          .filter(round(vecDot(col("ea"), col("eb")) / (col("na") * col("nb")), 4) >= 0.2)
          .select(col("u"), col("v"))
        // components() returns a localCheckpoint-backed frame (both the
        // local-fast-path and distributed-loop branches) — cacheable
        // as-is, released by releaseCheckpoint on invalidation
        graft.operators.ConnectedComponents.components(edges, dedupeEdges = false)
      })
  }

  /** Release the checkpoint RDD blocks behind a localCheckpoint'ed
    * DataFrame when its cache entry is dropped in a LIVE session —
    * otherwise a session that retrains the same corpus repeatedly
    * accumulates orphaned MEMORY_AND_DISK blocks until the
    * ContextCleaner's GC-driven sweep gets to them. The checkpointed
    * RDD sits behind the LogicalRDD leaf the checkpoint returned;
    * stopped sessions are skipped (their block manager is gone). */
  private def releaseCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    try {
      if (!df.sparkSession.sparkContext.isStopped)
        df.queryExecution.analyzed.collectLeaves().foreach {
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            lr.rdd.unpersist(blocking = false)
          case _ => ()
        }
    } catch {
      // best-effort release: a block manager mid-shutdown may throw and
      // that must not fail invalidation — but ONLY non-fatal errors are
      // tolerated (an OOM/VM error propagates), and an interrupt is
      // re-flagged so the caller's cancellation still lands
      case _: InterruptedException => Thread.currentThread().interrupt()
      case scala.util.control.NonFatal(_) => ()
    }

  private def pqModel(e: org.apache.spark.sql.DataFrame):
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    pqModelCache.keySet.removeIf(_._1.sparkContext.isStopped)
    pqModelCache.computeIfAbsent(
      (e.sparkSession, e.queryExecution.analyzed.canonicalized), _ => {
        val cent = localModel(pqCodebookDf(e))
        // the code table is THE index: corpus-sized but 3 narrow longs
        // per (vector, subspace); checkpointed so queries consume a
        // leaf instead of re-running the K-way distance fan-out
        val codes = pqCodesDf(pqD2Df(e, cent)).localCheckpoint()
        (cent, codes)
      })
  }

  /** e15's ADC candidate chain as a shared body (gate + e18 report):
    * global micro-unit PQ codebooks, integer subspace distances, argmin
    * codes, the query's additive distance table, top-20 by ADC. The
    * index (codebook + code table) comes from the session cache; only
    * the query's own distance table (one vector × codebook — a
    * broadcast-sized row set) is computed per call, exactly how a
    * served PQ index answers a lookup. */
  private[graft] def pqAdcCandidates(e: org.apache.spark.sql.DataFrame,
      queryVecId: Long = 0L): org.apache.spark.sql.DataFrame = {
    val (cent, codes) = pqModel(e)
    // the query's distance table from its single row — integer-identical
    // to filtering the full d2 at vec_id = query (same per-row math)
    val qdt = pqD2Df(e.filter(col("vec_id") === queryVecId), cent)
      .select(col("sub"), col("label").as("code"), col("d2").as("qd2"))
    codes.filter(col("vec_id") =!= queryVecId)
      .join(broadcast(qdt), Seq("sub", "code"))
      .groupBy(col("vec_id")).agg(sum(col("qd2")).as("adc"))
      .orderBy(col("adc").asc, col("vec_id").asc).limit(20)
  }

  /** The corpus micro-unit subspace stream (vec_id, pos, sub, m) —
    * shared by the 4-bit chain's train/encode/serve steps. */
  private def microSubs(vecs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    vecs.repartition(col("vec_id"))
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "vf")))
      .filter(col("vf").isNotNull)
      .select(col("vec_id"), col("pos"), expr("pos DIV 8").as("sub"),
        microQ(col("vf")).as("m"))

  /** e20's 4-BIT PQ model: K = 16 codewords PER SUBSPACE (codes fit a
    * nibble — half of e15's byte-per-sub storage), trained with one
    * exact-integer k-means refinement per subspace from deterministic
    * seeds (the 16 lowest non-null vec_ids' subvectors; ties and
    * argmins break on the smaller codeword id everywhere, so both
    * engines learn bit-identical codebooks). Unlike e15/e19 the
    * codewords are NOT the data's label means: at 4 bits the codebook
    * must adapt to each subspace's distribution or the nibble budget
    * is wasted — this is the standard low-bit PQ training step, kept
    * in pure long arithmetic end-to-end.
    *
    * Returns (codebook literal (c, sub, pos, w), PACKED code table
    * (vec_id, b, packed, mask)): two nibble codes per byte b
    * (packed = code(2b) + 16·code(2b+1)) with a 2-bit validity mask,
    * so a vector whose null components erase a whole subspace
    * round-trips exactly — the storage format a served 4-bit index
    * keeps (4 packed bytes + mask for 64 dims vs e15's 8 code bytes).
    * Scale shape: one vec_id spread feeds train + encode, every
    * aggregation downstream is keyed on a vec_id prefix, codebooks and
    * the query distance table are 16×dims broadcasts. */
  private val pq4ModelCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan),
    (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]()

  /** Session-scoped (see [[pqModel]] — same key/invalidation
    * discipline, cleared by [[invalidateIndexCaches]]): the 4-bit
    * index trains once per (session, corpus plan) and serves many
    * lookups; the packed code table is checkpointed so a serve
    * consumes a leaf. Bench surfaces the one-off training cost in its
    * `train` field via the cache-hit signature. */
  private[graft] def pq4Model(e: org.apache.spark.sql.DataFrame):
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    pq4ModelCache.keySet.removeIf(_._1.sparkContext.isStopped)
    pq4ModelCache.computeIfAbsent(
      (e.sparkSession, e.queryExecution.analyzed.canonicalized), _ => {
        val (cw, packed) = pq4Train(e)
        (cw, packed.localCheckpoint())
      })
  }

  private def pq4Train(e: org.apache.spark.sql.DataFrame):
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
    pq4TrainOn(microSubs(e), e)

  /** The 4-bit train body over an ARBITRARY micro-unit subspace stream
    * `m` (vec_id, pos, sub, m) — shared by e20 (raw components) and e21
    * (OPQ-rotated components); `eligible` supplies the seed id universe
    * (must match the stream's vector set, or the 16 lowest seeds could
    * name vectors the stream doesn't carry). */
  private def pq4TrainOn(m: org.apache.spark.sql.DataFrame,
      eligible: org.apache.spark.sql.DataFrame):
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    // deterministic seeds: the 16 lowest eligible vec_ids, c = rank-1
    val seeds = localModel(eligible.select(col("vec_id")).orderBy(col("vec_id").asc).limit(16)
      .select(col("vec_id"),
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("vec_id").asc)) - 1).cast("long").as("c")))
    val cw0 = localModel(m.join(broadcast(seeds), Seq("vec_id"))
      .select(col("c"), col("sub"), col("pos"), col("m").as("w")))
    // one refinement round: per-(vec, sub) argmin over the seed
    // codewords, then per-(c, sub, pos) rounded mean of the members
    val a2 = m.join(broadcast(cw0), Seq("sub", "pos"))
      .groupBy(col("vec_id"), col("sub"), col("c"))
      .agg(sum((col("m") - col("w")) * (col("m") - col("w"))).as("d2"))
    val asn = a2.groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("d2"), col("c"))).as("best"))
      .select(col("vec_id"), col("sub"), col("best").getField("c").as("c"))
    val cw = localModel(m.join(asn, Seq("vec_id", "sub"))
      .groupBy(col("c"), col("sub"), col("pos"))
      .agg(sum(col("m")).as("sm"), count(lit(1)).as("n"))
      .select(col("c"), col("sub"), col("pos"), halfAwayDiv(col("sm"), col("n")).as("w")))
    (cw, pq4EncodeOn(m, cw))
  }

  /** The 4-bit ENCODE body: per-(vec, sub) argmin over the codebook,
    * nibble-packed with the validity mask — the train tail, and ALSO
    * the index-APPEND path ([[pq4EncodeWith]]): new corpus vectors are
    * encoded against a stored codebook without retraining. */
  private def pq4EncodeOn(m: org.apache.spark.sql.DataFrame,
      cw: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val d24 = m.join(broadcast(cw), Seq("sub", "pos"))
      .groupBy(col("vec_id"), col("sub"), col("c"))
      .agg(sum((col("m") - col("w")) * (col("m") - col("w"))).as("d2"))
    val codes4 = d24.groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("d2"), col("c"))).as("best"))
      .select(col("vec_id"), col("sub"), col("best").getField("c").as("code"))
    codes4
      .groupBy(col("vec_id"), expr("sub DIV 2").as("b"))
      .agg(sum(col("code") * when(col("sub") % 2 === 1, 16L).otherwise(1L)).as("packed"),
        sum(when(col("sub") % 2 === 1, 2L).otherwise(1L)).as("mask"))
  }

  /** e20's ADC candidates: UNPACK the nibble code table (mask-guarded,
    * so missing subspaces never fabricate a code), join the query's
    * 8×16 distance table, additive rank, top-20. */
  private[graft] def pq4AdcCandidates(e: org.apache.spark.sql.DataFrame,
      queryVecId: Long = 0L): org.apache.spark.sql.DataFrame = {
    val (cw, packed) = pq4Model(e)
    pq4Serve(cw, packed, microSubs(e.filter(col("vec_id") === queryVecId)), queryVecId)
  }

  // ---------- stored-index lifecycle: persist / reload / append ----------
  // The session caches above model "train once, serve many WITHIN a
  // session"; a real deployment also stores the trained index BESIDE the
  // corpus and serves it across sessions/processes. The stored format is
  // exactly the model pair the caches hold: the 16×sub×pos codebook and
  // the packed nibble code table (4 bytes + mask per 64-dim vector).

  /** Persist the trained 4-bit PQ index for corpus `e` under `indexDir`
    * (training it first if this session hasn't): `codebook.parquet`
    * (c, sub, pos, w) + `codes.parquet` (vec_id, b, packed, mask). */
  def savePq4Index(e: org.apache.spark.sql.DataFrame, indexDir: String): Unit = {
    val (cw, packed) = pq4Model(e)
    cw.write.mode("overwrite").parquet(s"$indexDir/codebook.parquet")
    packed.write.mode("overwrite").parquet(s"$indexDir/codes.parquet")
  }

  /** Load a stored 4-bit index as its (codebook, packed codes) pair —
    * both plain parquet scans; nothing retrains or re-encodes. */
  def loadPq4Index(spark: org.apache.spark.sql.SparkSession, indexDir: String):
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
    (spark.read.parquet(s"$indexDir/codebook.parquet"),
     spark.read.parquet(s"$indexDir/codes.parquet"))

  /** ADC candidates served from a STORED index: `query` carries the
    * query vector(s) as (vec_id, embedding) rows; only the query side
    * touches the codebook (an 8×16 distance-table broadcast), the code
    * table is a parquet scan — the cross-session serve path. Emits the
    * same (vec_id, adc) frame as [[pq4AdcCandidates]]. */
  def pq4CandidatesFromIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, query: org.apache.spark.sql.DataFrame,
      queryVecId: Long = 0L): org.apache.spark.sql.DataFrame = {
    val (cw, packed) = loadPq4Index(spark, indexDir)
    pq4Serve(cw, packed, microSubs(query.filter(col("vec_id") === queryVecId)), queryVecId)
  }

  /** Index APPEND: encode `newVecs` against the STORED codebook (no
    * retrain — the standard PQ ingest path; codebook drift is handled
    * by periodic retrains, not per-batch ones) and add their packed
    * rows to `codes.parquet`. The caller owns id-uniqueness. */
  def appendPq4Index(spark: org.apache.spark.sql.SparkSession, indexDir: String,
      newVecs: org.apache.spark.sql.DataFrame): Unit = {
    val cw = spark.read.parquet(s"$indexDir/codebook.parquet")
    pq4EncodeOn(microSubs(newVecs), cw)
      .write.mode("append").parquet(s"$indexDir/codes.parquet")
  }

  /** The 4-bit SERVE body over a trained (codebook, packed-code-table)
    * pair and the QUERY's own micro-unit subspace stream — shared by
    * e20 and e21 (whose query stream is OPQ-rotated like its index). */
  private def pq4Serve(cw: org.apache.spark.sql.DataFrame,
      packed: org.apache.spark.sql.DataFrame,
      qsubs: org.apache.spark.sql.DataFrame,
      queryVecId: Long): org.apache.spark.sql.DataFrame = {
    val unp = packed.select(col("vec_id"), explode(array(
        struct((col("b") * 2).as("sub"), (col("packed") % 16).as("code"),
          (col("mask") % 2 === 1).as("ok")),
        struct((col("b") * 2 + 1).as("sub"), expr("packed DIV 16").as("code"),
          (col("mask") >= 2).as("ok")))).as("u"))
      .filter(col("u.ok"))
      .select(col("vec_id"), col("u.sub").as("sub"), col("u.code").as("code"))
    val qdt = qsubs
      .join(broadcast(cw), Seq("sub", "pos"))
      .groupBy(col("sub"), col("c"))
      .agg(sum((col("m") - col("w")) * (col("m") - col("w"))).as("qd2"))
      .select(col("sub"), col("c").as("code"), col("qd2"))
    unp.filter(col("vec_id") =!= queryVecId)
      .join(broadcast(qdt), Seq("sub", "code"))
      .groupBy(col("vec_id")).agg(sum(col("qd2")).as("adc"))
      .orderBy(col("adc").asc, col("vec_id").asc).limit(20)
  }

  /** e21's rotation-eligible frame: (vec_id, rm) where rm is the
    * OPQ-rotated micro-unit vector ([[graft.functions.OpqRotateMicro]]);
    * vectors with a null embedding OR any null component are excluded
    * (a rotation mixes every dimension, so one missing component
    * poisons the whole rotated vector — the null-vector gate's
    * "unscoreable vectors are excluded" rule). The vec_id spread is the
    * family's ONE corpus repartition. */
  private def opq4Frame(vecs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    vecs.repartition(col("vec_id"))
      .select(col("vec_id"),
        graft.functions.OpqExprs.opqRotateMicro(col("embedding")).as("rm"))
      .filter(col("rm").isNotNull)

  /** The rotated micro-unit subspace stream (vec_id, pos, sub, m) —
    * e21's analogue of [[microSubs]]; positions are 0-based like
    * posexplode's, matching the twin's 0-based rotated prelude. */
  private def opq4Subs(rf: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    rf.select(col("vec_id"), posexplode(col("rm")).as(Seq("pos", "m")))
      .select(col("vec_id"), col("pos"), expr("pos DIV 8").as("sub"), col("m"))

  /** e21's trained model: the pq4 chain over OPQ-rotated components.
    * Cached in [[pq4ModelCache]] under the ROTATED frame's canonical
    * plan — structurally distinct from e20's raw-corpus key (it
    * contains the rotation expression), so the two indexes of the same
    * corpus coexist; [[invalidateIndexCaches]] drops both. */
  private[graft] def opq4Model(e: org.apache.spark.sql.DataFrame):
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val rf = opq4Frame(e)
    pq4ModelCache.keySet.removeIf(_._1.sparkContext.isStopped)
    pq4ModelCache.computeIfAbsent(
      (rf.sparkSession, rf.queryExecution.analyzed.canonicalized), _ => {
        val (cw, packed) = pq4TrainOn(opq4Subs(rf), rf)
        (cw, packed.localCheckpoint())
      })
  }

  /** e21's ADC candidates: the e20 serve body over the rotated index,
    * with the query's distance table built from its ROTATED subspace
    * stream (index and query must live in the same rotated space). */
  private[graft] def opq4AdcCandidates(e: org.apache.spark.sql.DataFrame,
      queryVecId: Long = 0L): org.apache.spark.sql.DataFrame = {
    val (cw, packed) = opq4Model(e)
    pq4Serve(cw, packed,
      opq4Subs(opq4Frame(e.filter(col("vec_id") === queryVecId))), queryVecId)
  }

  /** Exact-cosine re-rank of a bounded (vec_id, adc) candidate set —
    * the final stage every PQ variant shares. */
  private[graft] def pqRerank(e: org.apache.spark.sql.DataFrame,
      cand: org.apache.spark.sql.DataFrame, queryVecId: Long,
      k: Int): org.apache.spark.sql.DataFrame = {
    val q = e.filter(col("vec_id") === queryVecId).select(col("embedding").as("qe"))
    cand.join(e, Seq("vec_id")).crossJoin(broadcast(q))
      .withColumn("cos_sim", round(cosineFast(col("embedding"), col("qe")), 4))
      .orderBy(col("cos_sim").desc, col("vec_id").asc).limit(k)
      .select(col("vec_id"), col("adc"), col("cos_sim"))
  }

  /** Materialize a BOUNDED model table (K×dims rows — codebooks,
    * centroids) into a literal LocalRelation. This is the DataFrame
    * twin of the kmeansSeedModel collect: referencing a model DataFrame
    * from several downstream branches duplicates its whole logical
    * subtree per reference, and on a diamond-shaped chain like
    * residual PQ that multiplied the tree until the OPTIMIZER (not the
    * executors) was the query's hot loop — measured 1.5 s of driver
    * planning per action at sf0.1. A literal cuts the lineage at the
    * model boundary; the collect is bounded by the model size at any
    * corpus scale. */
  private def localModel(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(df.collect(): _*), df.schema)

  /** e19's RESIDUAL-encoded ADC candidates — the standard production
    * refinement over e15's plain PQ: each vector is coarse-assigned to
    * its nearest codebook cell (exact-integer argmin over the full
    * vector — the e08 step), the PQ codebooks are trained on RESIDUALS
    * (vector − cell centroid, still exact micro-units), and the query
    * gets one distance table PER CELL (its residual differs per probed
    * cell), so a candidate is scored against the query's residual in
    * the candidate's own cell. Residuals concentrate near zero, so the
    * same code budget quantizes a much tighter distribution — recall
    * at equal bytes goes up (asserted ≥ plain PQ in RecallSpec / the
    * e18 report).
    *
    * Scale shape: everything after the one vec_id spread is keyed on a
    * vec_id prefix (no re-shuffle); the codebooks, cell table join-back,
    * and ALL query distance tables are K×dims-bounded broadcasts. The
    * gate scores all cells (oracle coverage); the production path
    * composes the same chain under an nprobe cell filter exactly as
    * [[ivfPqSearch]] does for plain PQ. */
  /** Session-scoped trained-index cache for the residual-PQ chain: the
    * coarse codebook, the per-vector cell map, and the residual
    * codebooks are a trained MODEL — a production index trains once
    * and serves many queries, it does not retrain per lookup. Keyed by
    * (session, canonicalized input plan) so two references to the same
    * corpus share one training pass; structural plan equality makes a
    * collision impossible. Same caveats as Registry's table catalog:
    * entries pin the training-time data snapshot (rewriting the
    * corpus files mid-session requires [[invalidateResidualModels]]),
    * and stopped sessions are purged opportunistically. */
  private val residualModelCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan),
    (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]()

  /** Drop every cached trained index — the plain-PQ, residual-PQ,
    * 4-bit-PQ, and semantic-dedup cluster caches, all sessions —
    * releasing their checkpointed RDD blocks. This is the documented invalidation step after
    * rewriting corpus files mid-session: clearing only one cache
    * would leave the other serving a stale codebook/code table. */
  def invalidateIndexCaches(): Unit = {
    // atomic per-entry drain (remove-then-release), not iterate+clear():
    // an entry inserted concurrently between a values() walk and clear()
    // would be dropped without its checkpoint blocks ever being freed.
    // remove() hands each value to exactly one releaser; entries that
    // land after the iterator passes simply survive this invalidation
    // (the caller re-invokes if it must win that race). NOTE the
    // documented contract (see the cache scaladocs): invalidation must
    // not race IN-FLIGHT serves — unpersisting a localCheckpoint'ed RDD
    // under a running job can fail that job non-recoverably, because
    // the truncated lineage cannot be recomputed.
    def drain[K, V](m: java.util.concurrent.ConcurrentHashMap[K, V])(release: V => Unit): Unit = {
      val it = m.keySet().iterator()
      while (it.hasNext) {
        val v = m.remove(it.next())
        if (v != null) release(v)
      }
    }
    drain(pqModelCache) { case (_, codes) => releaseCheckpoint(codes) }
    drain(residualModelCache) { case (_, _, cells) => releaseCheckpoint(cells) }
    drain(pq4ModelCache) { case (_, packed) => releaseCheckpoint(packed) }
    drain(semDedupCache)(releaseCheckpoint)
  }

  /** Total live trained-index cache entries across the three model
    * caches — the EXPLICIT cache-populating signal Bench uses to report
    * one-off training cost (a size delta around a query's first build),
    * replacing the former timing-signature heuristic. */
  private[graft] def indexCacheSize: Int =
    pqModelCache.size + residualModelCache.size + pq4ModelCache.size +
      semDedupCache.size

  /** Former name of [[invalidateIndexCaches]]; kept as an alias so the
    * documented invalidation API keeps working. */
  def invalidateResidualModels(): Unit = invalidateIndexCaches()

  /** Train (or fetch) the residual-PQ model triple for corpus `e`:
    * (coarse codebook literal, residual codebook literal, checkpointed
    * per-vector (cell, sub, code) CODE TABLE). The code table is part
    * of the stored index — a deployment encodes the corpus once at
    * build time and serves lookups against the codes; recomputing the
    * residual encode per query (the pre-round-12 shape) made every
    * e19 serve re-run the corpus explode + two joins + a K-way argmin
    * (~0.9 s/lookup at sf0.1 vs ~0.4 for plain PQ, whose codes were
    * already cached). See [[pqResidualAdcCandidates]] for the shapes. */
  private def residualModel(e: org.apache.spark.sql.DataFrame):
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    residualModelCache.keySet.removeIf(_._1.sparkContext.isStopped)
    residualModelCache.computeIfAbsent(
      (e.sparkSession, e.queryExecution.analyzed.canonicalized), _ => {
        // the codebook literal (see localModel): cent feeds three
        // branches and rcm two — as live subtrees they made driver
        // planning the dominant per-action cost
        val cent = localModel(pqCodebookDf(e))
        val d2 = pqD2Df(e, cent)
        // coarse cell per vector: argmin over the summed subspace
        // distances (= the full-vector integer distance), ties →
        // smaller label. localCheckpoint (the ConnectedComponents
        // pattern): the cell map feeds BOTH the residual computation
        // and the final candidate join — as a live subtree each
        // reference re-plans and re-runs the d2 aggregation;
        // checkpointed, it is computed once and the optimizer sees a
        // leaf. Corpus-sized but narrow (two longs per vector).
        val cells = d2.groupBy(col("vec_id"), col("label"))
          .agg(sum(col("d2")).as("cd2"))
          .groupBy(col("vec_id"))
          .agg(min(struct(col("cd2"), col("label"))).as("best"))
          .select(col("vec_id"), col("best").getField("label").as("cell"))
          .localCheckpoint()
        val mt = e.repartition(col("vec_id"))
          .select(col("vec_id"), col("label").as("vlabel"),
            posexplode(col("embedding")).as(Seq("pos", "vf")))
          .filter(col("vf").isNotNull)
          .select(col("vec_id"), col("vlabel"), col("pos"),
            expr("pos DIV 8").as("sub"), microQ(col("vf")).as("m"))
        val resT = mt.join(cells, Seq("vec_id"))
          .join(broadcast(cent.select(col("label").as("cell"), col("pos"), col("cm"))),
            Seq("cell", "pos"))
          .select(col("vec_id"), col("vlabel"), col("cell"), col("pos"), col("sub"),
            (col("m") - col("cm")).as("rm"))
        // residual codebooks, trained per (label, pos) over the residuals
        val rcm = localModel(resT.groupBy(col("vlabel"), col("pos"))
          .agg(sum(col("rm")).as("sr"), count(lit(1)).as("n"))
          .select(col("vlabel").as("label"), col("pos"),
            halfAwayDiv(col("sr"), col("n")).as("rcm")))
        // corpus ENCODE at train time: residual subspace distances vs
        // rcm → argmin codes, tagged with the owner's cell — the code
        // table the index stores (3 narrow longs + cell per (vector,
        // subspace)), checkpointed so a serve consumes a leaf
        val rd2 = resT.join(broadcast(rcm), Seq("pos"))
          .groupBy(col("vec_id"), col("sub"), col("label"))
          .agg(sum((col("rm") - col("rcm")) * (col("rm") - col("rcm"))).as("d2"))
        val codes = pqCodesDf(rd2).join(cells, Seq("vec_id")).localCheckpoint()
        // cells only feeds training; its blocks are dead once codes is
        // materialized
        releaseCheckpoint(cells)
        (cent, rcm, codes)
      })
  }

  private[graft] def pqResidualAdcCandidates(e: org.apache.spark.sql.DataFrame,
      queryVecId: Long = 0L): org.apache.spark.sql.DataFrame = {
    val (cent, rcm, codes) = residualModel(e)
    // SERVING path: only the query's own residual work happens per
    // lookup — one row explodes to its micro-units, gets a residual
    // per cell, and one additive distance table per cell (K · subs · K
    // rows — broadcast-bounded); the corpus side is the model's
    // checkpointed code-table leaf, exactly how a served residual-PQ
    // index answers a lookup.
    val qm = e.filter(col("vec_id") === queryVecId)
      .select(posexplode(col("embedding")).as(Seq("pos", "vf")))
      .filter(col("vf").isNotNull)
      .select(col("pos"), expr("pos DIV 8").as("sub"), microQ(col("vf")).as("m"))
    val qres = qm
      .join(broadcast(cent.select(col("label").as("cell"), col("pos"), col("cm"))),
        Seq("pos"))
      .select(col("cell"), col("pos"), col("sub"), (col("m") - col("cm")).as("qrm"))
    val qdt = qres.join(broadcast(rcm), Seq("pos"))
      .groupBy(col("cell"), col("sub"), col("label"))
      .agg(sum((col("qrm") - col("rcm")) * (col("qrm") - col("rcm"))).as("qd2"))
      .select(col("cell"), col("sub"), col("label").as("code"), col("qd2"))
    codes.filter(col("vec_id") =!= queryVecId)
      .join(broadcast(qdt), Seq("cell", "sub", "code"))
      .groupBy(col("vec_id")).agg(sum(col("qd2")).as("adc"))
      .orderBy(col("adc").asc, col("vec_id").asc).limit(20)
  }

  /** Shared oracle-CTE text of the PQ family twins (e15/e18/e19): micro-
    * unit vectors (with the owner's label for residual-codebook
    * training), the codebook, and integer subspace distances. */
  private val pqPreludeSql: String =
    s"""u AS (
       |  SELECT vec_id, label AS vlabel, generate_subscripts(embedding, 1) AS pos,
       |         unnest(embedding::DOUBLE[]) AS v
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |m AS MATERIALIZED (SELECT vec_id, vlabel, pos, (pos - 1) // 8 AS sub, $microQSql AS m
       |  FROM u WHERE v IS NOT NULL),
       |cu AS (SELECT e.label, generate_subscripts(e.embedding, 1) AS pos,
       |         unnest(e.embedding::DOUBLE[]) AS v
       |  FROM embeddings e WHERE e.embedding IS NOT NULL),
       |cm AS MATERIALIZED (SELECT label, pos, ${halfAwayDivSql("SUM(m)", "COUNT(*)")} AS cm
       |  FROM (SELECT label, pos, $microQSql AS m FROM cu WHERE v IS NOT NULL)
       |  GROUP BY label, pos),
       |d2 AS MATERIALIZED (SELECT m.vec_id, m.sub, c.label,
       |    SUM((m.m - c.cm) * (m.m - c.cm)) AS d2
       |  FROM m JOIN cm c ON m.pos = c.pos
       |  GROUP BY m.vec_id, m.sub, c.label)""".stripMargin

  /** e15's plain-PQ candidate CTEs (consumes [[pqPreludeSql]]'s d2). */
  private val pqPlainCandSql: String =
    s"""codes AS (SELECT vec_id, sub,
       |    (min(struct_pack(d := d2, l := label))).l AS code
       |  FROM d2 GROUP BY vec_id, sub),
       |qdt AS (SELECT sub, label AS code, d2 AS qd2 FROM d2 WHERE vec_id = 0),
       |cand AS (
       |  SELECT c.vec_id, CAST(SUM(q.qd2) AS BIGINT) AS adc
       |  FROM codes c JOIN qdt q USING (sub, code)
       |  WHERE c.vec_id <> 0 GROUP BY c.vec_id
       |  ORDER BY adc ASC, c.vec_id ASC LIMIT 20)""".stripMargin

  /** e19's residual-PQ candidate CTEs (consumes [[pqPreludeSql]]). */
  private val pqResidualCandSql: String =
    s"""cd2 AS (SELECT vec_id, label, SUM(d2) AS cd2 FROM d2 GROUP BY vec_id, label),
       |cell AS (SELECT vec_id,
       |    (min(struct_pack(d := cd2, l := label))).l AS cell
       |  FROM cd2 GROUP BY vec_id),
       |res AS MATERIALIZED (SELECT m.vec_id, m.vlabel, ce.cell, m.pos, m.sub, m.m - c.cm AS rm
       |  FROM m JOIN cell ce USING (vec_id)
       |  JOIN cm c ON c.label = ce.cell AND c.pos = m.pos),
       |rcm AS MATERIALIZED (SELECT vlabel AS label, pos, ${halfAwayDivSql("SUM(rm)", "COUNT(*)")} AS rcm
       |  FROM res GROUP BY vlabel, pos),
       |rd2 AS (SELECT r.vec_id, r.sub, rc.label,
       |    SUM((r.rm - rc.rcm) * (r.rm - rc.rcm)) AS d2
       |  FROM res r JOIN rcm rc ON r.pos = rc.pos
       |  GROUP BY r.vec_id, r.sub, rc.label),
       |rcodes AS (SELECT vec_id, sub,
       |    (min(struct_pack(d := d2, l := label))).l AS code
       |  FROM rd2 GROUP BY vec_id, sub),
       |qres AS (SELECT c.label AS cell, m.pos, m.sub, m.m - c.cm AS qrm
       |  FROM m JOIN cm c ON m.pos = c.pos WHERE m.vec_id = 0),
       |rqdt AS (SELECT q.cell, q.sub, rc.label AS code,
       |    SUM((q.qrm - rc.rcm) * (q.qrm - rc.rcm)) AS qd2
       |  FROM qres q JOIN rcm rc ON q.pos = rc.pos
       |  GROUP BY q.cell, q.sub, rc.label),
       |rcand AS (
       |  SELECT co.vec_id, CAST(SUM(q.qd2) AS BIGINT) AS adc
       |  FROM rcodes co JOIN cell ce USING (vec_id)
       |  JOIN rqdt q ON q.cell = ce.cell AND q.sub = co.sub AND q.code = co.code
       |  WHERE co.vec_id <> 0 GROUP BY co.vec_id
       |  ORDER BY adc ASC, co.vec_id ASC LIMIT 20)""".stripMargin

  /** e20's 4-bit PQ candidate CTEs (consumes [[pqPreludeSql]]'s `m`):
    * 16 per-subspace codewords from one exact-integer k-means
    * refinement (seeds = 16 lowest non-null vec_ids), nibble codes
    * PACKED two-per-byte with a validity mask, mask-guarded unpack,
    * integer ADC. Mirrors [[pq4Model]]/[[pq4AdcCandidates]] step for
    * step. `cw`/`d24` are AS MATERIALIZED: d24 has two consumers
    * (codes4, qdt4) and cw feeds it — under DuckDB's default inlining
    * the whole k-means chain re-expands per reference (the CcSql
    * mechanism; a constant-factor recompute for the twin, cost only). */
  private def pq4CandSqlOn(x: String, mSrc: String, elig: String): String =
    s"""s0$x AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id ASC) - 1 AS c
       |  FROM embeddings WHERE $elig),
       |seeds$x AS (SELECT vec_id, c FROM s0$x WHERE c < 16),
       |cw0$x AS (SELECT s.c, m.sub, m.pos, m.m AS w
       |  FROM $mSrc m JOIN seeds$x s USING (vec_id)),
       |a2$x AS (SELECT m.vec_id, m.sub, w.c,
       |    SUM((m.m - w.w) * (m.m - w.w)) AS d2
       |  FROM $mSrc m JOIN cw0$x w ON m.sub = w.sub AND m.pos = w.pos
       |  GROUP BY m.vec_id, m.sub, w.c),
       |asn$x AS (SELECT vec_id, sub,
       |    (min(struct_pack(d := d2, c := c))).c AS c
       |  FROM a2$x GROUP BY vec_id, sub),
       |cw$x AS MATERIALIZED (SELECT a.c, m.sub, m.pos, ${halfAwayDivSql("SUM(m.m)", "COUNT(*)")} AS w
       |  FROM $mSrc m JOIN asn$x a ON m.vec_id = a.vec_id AND m.sub = a.sub
       |  GROUP BY a.c, m.sub, m.pos),
       |d24$x AS MATERIALIZED (SELECT m.vec_id, m.sub, w.c,
       |    SUM((m.m - w.w) * (m.m - w.w)) AS d2
       |  FROM $mSrc m JOIN cw$x w ON m.sub = w.sub AND m.pos = w.pos
       |  GROUP BY m.vec_id, m.sub, w.c),
       |codes4$x AS (SELECT vec_id, sub,
       |    (min(struct_pack(d := d2, c := c))).c AS code
       |  FROM d24$x GROUP BY vec_id, sub),
       |pk$x AS MATERIALIZED (SELECT vec_id, sub // 2 AS b,
       |    SUM(code * CASE WHEN sub % 2 = 1 THEN 16 ELSE 1 END) AS packed,
       |    SUM(CASE WHEN sub % 2 = 1 THEN 2 ELSE 1 END) AS mask
       |  FROM codes4$x GROUP BY vec_id, sub // 2),
       |unp$x AS (
       |  SELECT vec_id, b * 2 AS sub, packed % 16 AS code FROM pk$x WHERE mask % 2 = 1
       |  UNION ALL
       |  SELECT vec_id, b * 2 + 1 AS sub, packed // 16 AS code FROM pk$x WHERE mask >= 2),
       |qdt4$x AS (SELECT sub, c AS code, d2 AS qd2 FROM d24$x WHERE vec_id = 0),
       |cand4$x AS (
       |  SELECT u.vec_id, CAST(SUM(q.qd2) AS BIGINT) AS adc
       |  FROM unp$x u JOIN qdt4$x q ON u.sub = q.sub AND u.code = q.code
       |  WHERE u.vec_id <> 0 GROUP BY u.vec_id
       |  ORDER BY adc ASC, u.vec_id ASC LIMIT 20)""".stripMargin

  private val pq4CandSql: String = pq4CandSqlOn("", "m", "embedding IS NOT NULL")

  /** e21's rotation-eligibility predicate: vectors with a null
    * embedding or any null component are excluded (see
    * [[graft.functions.OpqRotateMicro]]'s null semantics). */
  private val opqEligSql: String =
    "embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL)) = 0"

  /** The rotated micro-unit prelude (e21's twin of [[pqPreludeSql]]'s
    * `m`, 0-based positions like posexplode): sign-flip each
    * micro-quantized component by popcount((j+1)*2654435769), then the
    * Walsh-Hadamard mix r_i = SUM_j (-1)^popcount(i AND j) * x_j —
    * the [[graft.functions.OpqRotateMicro]] formula, exact in BIGINT.
    * Computed as the FAST Walsh-Hadamard transform: 6 butterfly stages
    * (one per bit of the 64-dim span), each an exact integer
    * add/subtract over bit-partner rows — O(d·log d) rows per vector
    * where the dense i×j mix the twin previously ran is O(d²) (64×64 =
    * 819 M join rows at sf10, the measured spill monster that DNF'd
    * e18's sf10 oracle on a 46 GiB temp cap; the butterflies stream
    * 12.8 M rows per stage). The identity is the standard FWT
    * factorization of H_{2^k}; stage outputs are MATERIALIZED because
    * each stage reads its predecessor TWICE (a/b sides) — inlined, the
    * chain re-expands 2^6-fold (the CcSql mechanism). `f0` zero-pads
    * each vector to the 64 grid (padding contributes 0 to every sum)
    * and the final `rdim` join keeps only the vector's own positions,
    * so a short vector never fabricates rotated components — exactly
    * the dense formula's semantics for any dim ≤ 64. */
  private val opqPreludeSql: String = {
    val stages = (0 until 6).map { k =>
      val bit = 1 << k
      s"""f${k + 1} AS MATERIALIZED (SELECT a.vec_id, a.j,
         |    CASE WHEN a.j & $bit = 0 THEN a.x + b.x ELSE b.x - a.x END AS x
         |  FROM f$k a JOIN f$k b ON a.vec_id = b.vec_id AND b.j = xor(a.j, $bit))""".stripMargin
    }.mkString(",\n")
    s"""ru AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS j,
       |         unnest(embedding::DOUBLE[]) AS v
       |  FROM embeddings WHERE $opqEligSql),
       |rx AS (SELECT vec_id, j,
       |    (CASE WHEN bit_count(CAST((j + 1) * 2654435769 AS BIGINT)) % 2 = 0
       |      THEN 1 ELSE -1 END) * ($microQSql) AS x
       |  FROM ru),
       |rdim AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i
       |  FROM embeddings WHERE $opqEligSql),
       |f0 AS MATERIALIZED (SELECT d.vec_id, g.j, COALESCE(rx.x, 0) AS x
       |  FROM (SELECT DISTINCT vec_id FROM rdim) d
       |  CROSS JOIN (SELECT unnest(range(64)) AS j) g
       |  LEFT JOIN rx ON rx.vec_id = d.vec_id AND rx.j = g.j),
       |$stages,
       |m21 AS MATERIALIZED (SELECT f.vec_id, i.i AS pos, i.i // 8 AS sub,
       |    CAST(f.x AS BIGINT) AS m
       |  FROM f6 f JOIN rdim i ON f.vec_id = i.vec_id AND f.j = i.i)""".stripMargin
  }

  val qs: Seq[Q] = Seq(

    // Pairwise cosine on consecutive ids: the embedding near-dup primitive.
    Q("e01_cos_pairs",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val a = e.select(col("vec_id").as("vec_id_a"), col("embedding").as("ea"))
        val b = e.select((col("vec_id") - 1).as("vec_id_a"),
          col("vec_id").as("vec_id_b"), col("embedding").as("eb"))
        a.join(b, Seq("vec_id_a"))
          .select(col("vec_id_a"), col("vec_id_b"),
            round(cosineFast(col("ea"), col("eb")), 4).as("cos_sim"))
      },
      Some(s"""SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
              |  ROUND(${dDot("a.embedding", "b.embedding")} /
              |    (sqrt(${dDot("a.embedding", "a.embedding")}) * sqrt(${dDot("b.embedding", "b.embedding")})), 4) AS cos_sim
              |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1""".stripMargin),
      "embedding cosine near-dup pairs (north-star: similarity)"),

    // Brute-force cosine top-k for a query vector (vec_id 0) — the ANN
    // baseline. Query side is a broadcast of one row.
    Q("e02_ann_topk",
      // Ordered by the ROUNDED cosine so the vec_id tie-break governs
      // every pair that compares equal after rounding — sub-ulp
      // accumulation drift between engines can no longer flip top-k
      // membership (shared [[exactTopKDf]] body, reused by e18).
      (s, dir) => exactTopKDf(t(s, dir, "embeddings"), 10),
      Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
              |SELECT vec_id,
              |  ROUND(${dDot("e.embedding", "q.qe")} /
              |    (sqrt(${dDot("e.embedding", "e.embedding")}) * sqrt(${dDot("q.qe", "q.qe")})), 4) AS cos_sim
              |FROM embeddings e, q WHERE vec_id > 0
              |ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin),
      "brute-force cosine top-k ANN baseline (north-star: similarity)"),

    // IVF-style ANN: coarse quantizer = per-label centroid (avg per dim);
    // probe the best cell, exact top-5 inside it. The scale path: centroids
    // are a tiny broadcast table; only one cell is scanned.
    Q("e03_ann_ivf",
      (s, dir) => ivfTopKDf(t(s, dir, "embeddings"), 5),
      Some(s"""WITH qd AS (
              |  SELECT generate_subscripts(embedding, 1) AS pos, unnest(embedding::DOUBLE[]) AS qv
              |  FROM embeddings WHERE vec_id = 0),
              |cent AS (
              |  SELECT label, pos, AVG(v) AS c FROM (
              |    SELECT label, generate_subscripts(embedding, 1) AS pos,
              |           unnest(embedding::DOUBLE[]) AS v
              |    FROM embeddings) GROUP BY label, pos),
              |best AS (
              |  SELECT label FROM (
              |    SELECT cent.label, SUM(c * qv) AS dot
              |    FROM cent JOIN qd USING (pos) GROUP BY cent.label)
              |  ORDER BY dot DESC, label ASC LIMIT 1),
              |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
              |SELECT e.label, e.vec_id,
              |  ROUND(${dDot("e.embedding", "q.qe")} /
              |    (sqrt(${dDot("e.embedding", "e.embedding")}) * sqrt(${dDot("q.qe", "q.qe")})), 4) AS cos_sim
              |FROM embeddings e JOIN best ON e.label = best.label, q
              |WHERE e.vec_id > 0
              |ORDER BY cos_sim DESC, e.vec_id ASC LIMIT 5""".stripMargin),
      "IVF-bucketed ANN: centroid probe then exact in-cell (north-star)"),

    // Multi-probe IVF (nprobe=2): the standard recall lever for IVF —
    // scan the TWO nearest cells, exact top-5 across their union. Same
    // tiny-broadcast centroid table as e03; work scales with nprobe,
    // never with corpus size. Cell ranking uses the ROUNDED centroid
    // dot (6 dp) so the 2nd/3rd-cell boundary is cross-engine stable.
    Q("e07_ann_ivf_probe2",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val qd = e.filter(col("vec_id") === 0)
          .select(posexplode(asDoubles(col("embedding")))).toDF("pos", "qv")
        val cent = e.select(col("label"), posexplode(asDoubles(col("embedding"))))
          .toDF("label", "pos", "v")
          .groupBy(col("label"), col("pos")).agg(avg(col("v")).as("c"))
        val best = cent.join(broadcast(qd), Seq("pos"))
          .groupBy(col("label")).agg(round(sum(col("c") * col("qv")), 6).as("dot"))
          .orderBy(col("dot").desc, col("label").asc).limit(2)
          .select(col("label"))
        val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
        e.join(broadcast(best), Seq("label")).filter(col("vec_id") > 0)
          .crossJoin(broadcast(q))
          .withColumn("cos_sim", round(cosineFast(col("embedding"), col("qe")), 4))
          .orderBy(col("cos_sim").desc, col("vec_id").asc).limit(5)
          .select(col("label"), col("vec_id"), col("cos_sim"))
      },
      Some(s"""WITH qd AS (
              |  SELECT generate_subscripts(embedding, 1) AS pos, unnest(embedding::DOUBLE[]) AS qv
              |  FROM embeddings WHERE vec_id = 0),
              |cent AS (
              |  SELECT label, pos, AVG(v) AS c FROM (
              |    SELECT label, generate_subscripts(embedding, 1) AS pos,
              |           unnest(embedding::DOUBLE[]) AS v
              |    FROM embeddings) GROUP BY label, pos),
              |best AS (
              |  SELECT label FROM (
              |    SELECT cent.label, ROUND(SUM(c * qv), 6) AS dot
              |    FROM cent JOIN qd USING (pos) GROUP BY cent.label)
              |  ORDER BY dot DESC, label ASC LIMIT 2),
              |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
              |SELECT e.label, e.vec_id,
              |  ROUND(${dDot("e.embedding", "q.qe")} /
              |    (sqrt(${dDot("e.embedding", "e.embedding")}) * sqrt(${dDot("q.qe", "q.qe")})), 4) AS cos_sim
              |FROM embeddings e JOIN best ON e.label = best.label, q
              |WHERE e.vec_id > 0
              |ORDER BY cos_sim DESC, e.vec_id ASC LIMIT 5""".stripMargin),
      "multi-probe IVF ANN (nprobe=2): recall lever, work scales with nprobe (north-star)"),

    // Random-hyperplane LSH ANN: 8 deterministic pseudo-hyperplanes give a
    // sign-bit bucket per vector; search only the query's bucket, exact
    // cosine inside. Unlike IVF (e03) this needs NO training pass — the
    // bucket is a pure per-row map function, so at 100 TB it's a single
    // scan + one tiny-bucket shuffle.
    Q("e04_lsh_ann",
      // W(i,j) = ((i*37 + j*101) mod 19) - 9 — deterministic integer
      // hyperplane weights, identical in the DuckDB oracle. All 8
      // plane sums in one codegen'd pass (PlaneBucketCode); the
      // interpreted 16-array-walk HOF formulation it replaced is
      // spec-checked bit-identical in PlaneBucketSpec. Shared
      // [[lshTopKDf]] body, reused by e18.
      (s, dir) => lshTopKDf(t(s, dir, "embeddings"), 5),
      Some {
        val sums = (0 until 8).map(j =>
          s"  SUM(v * ((((pos - 1) * 37 + $j * 101) % 19) - 9)) AS s$j").mkString(",\n")
        val code = (0 until 8).map(j => s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
        s"""WITH unnested AS (
           |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
           |         unnest(embedding::DOUBLE[]) AS v
           |  FROM embeddings),
           |sums AS (SELECT vec_id,
           |$sums
           |FROM unnested GROUP BY vec_id),
           |bkt AS (SELECT vec_id, CAST($code AS BIGINT) AS bkt FROM sums),
           |q AS (SELECT bkt.bkt AS qbkt, embedding AS qe
           |      FROM embeddings JOIN bkt USING (vec_id) WHERE vec_id = 0)
           |SELECT e.vec_id,
           |  ROUND(${dDot("e.embedding", "q.qe")} /
           |    (sqrt(${dDot("e.embedding", "e.embedding")}) * sqrt(${dDot("q.qe", "q.qe")})), 4) AS cos_sim
           |FROM embeddings e JOIN bkt ON e.vec_id = bkt.vec_id, q
           |WHERE e.vec_id > 0 AND bkt.bkt = q.qbkt
           |ORDER BY cos_sim DESC, e.vec_id ASC LIMIT 5""".stripMargin
      },
      "random-hyperplane LSH-bucketed ANN (north-star: similarity)"),

    // Embedding near-dup pairs (threshold form): hyperplane buckets from
    // e04, then exact cosine only WITHIN buckets — all-pairs similarity
    // without the quadratic cross join (candidate set is per-bucket).
    // Threshold compares the ROUNDED cosine so the cut is cross-engine
    // stable. The 8-plane geometry is oracle-pinned; at scale the same
    // density rule as the KNN join applies — rebuild with
    // planeBucketCode(embedding, planesFor(n)) to keep in-bucket work
    // constant (BENCH_NOTES sf10 section).
    Q("e05_embed_neardup",
      (s, dir) => {
        // per-row norms before the self-join (one array dot per pair
        // instead of three, bit-identical — see VectorExprs.vecNorm)
        val e = t(s, dir, "embeddings")
          .withColumn("bkt", graft.functions.PlaneBucketExpr.planeBucketCode(col("embedding")))
          .withColumn("nrm", vecNorm(col("embedding")))
        val a = e.select(col("bkt"), col("vec_id").as("vec_id_a"),
          col("embedding").as("ea"), col("nrm").as("na"))
        val b = e.select(col("bkt"), col("vec_id").as("vec_id_b"),
          col("embedding").as("eb"), col("nrm").as("nb"))
        a.join(b, Seq("bkt"))
          .filter(col("vec_id_a") < col("vec_id_b"))
          .withColumn("cos_sim",
            round(vecDot(col("ea"), col("eb")) / (col("na") * col("nb")), 4))
          .filter(col("cos_sim") >= 0.2)
          .select(col("vec_id_a"), col("vec_id_b"), col("cos_sim"))
      },
      Some {
        val sums = (0 until 8).map(j =>
          s"  SUM(v * ((((pos - 1) * 37 + $j * 101) % 19) - 9)) AS s$j").mkString(",\n")
        val code = (0 until 8).map(j => s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
        s"""WITH unnested AS (
           |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
           |         unnest(embedding::DOUBLE[]) AS v
           |  FROM embeddings),
           |sums AS (SELECT vec_id,
           |$sums
           |FROM unnested GROUP BY vec_id),
           |bkt AS (SELECT vec_id, CAST($code AS BIGINT) AS bkt FROM sums),
           |e AS (SELECT embeddings.vec_id, embedding, bkt
           |      FROM embeddings JOIN bkt ON embeddings.vec_id = bkt.vec_id)
           |SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
           |  ROUND(${dDot("a.embedding", "b.embedding")} /
           |    (sqrt(${dDot("a.embedding", "a.embedding")}) * sqrt(${dDot("b.embedding", "b.embedding")})), 4) AS cos_sim
           |FROM e a JOIN e b ON a.bkt = b.bkt AND a.vec_id < b.vec_id
           |WHERE ROUND(${dDot("a.embedding", "b.embedding")} /
           |    (sqrt(${dDot("a.embedding", "a.embedding")}) * sqrt(${dDot("b.embedding", "b.embedding")})), 4) >= 0.2""".stripMargin
      },
      "embedding near-dup pairs via hyperplane buckets (north-star: dedup)"),

    // KNN JOIN: top-3 nearest neighbors for EVERY vector — the
    // batch-similarity workload behind "find near neighbors for the
    // whole corpus" (semantic dedup, retrieval eval). Candidates come
    // from the hyperplane bucket (e04's per-row map code), so the join
    // is per-bucket, never all-pairs; one exchange on bkt feeds the
    // self-join, one on vec_id feeds the rank. Ranking uses the ROUNDED
    // cosine (with nbr_id tiebreak) so ordering is cross-engine stable.
    Q("e06_knn_join",
      (s, dir) => {
        // per-row norms before the self-join — see knnJoinFast
        val e = t(s, dir, "embeddings")
          .withColumn("bkt", graft.functions.PlaneBucketExpr.planeBucketCode(col("embedding")))
          .withColumn("nrm", vecNorm(col("embedding")))
          .repartition(col("bkt"))
        val a = e.select(col("bkt"), col("vec_id"), col("embedding"), col("nrm"))
        val b = e.select(col("bkt"), col("vec_id").as("nbr_id"),
          col("embedding").as("ne"), col("nrm").as("nnrm"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("vec_id")).orderBy(col("cos_sim").desc, col("nbr_id").asc)
        a.join(b, Seq("bkt"))
          .filter(col("vec_id") =!= col("nbr_id"))
          .withColumn("cos_sim",
            round(vecDot(col("embedding"), col("ne")) / (col("nrm") * col("nnrm")), 4))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select(col("vec_id"), col("nbr_id"), col("cos_sim"), col("rk"))
      },
      Some {
        val sums = (0 until 8).map(j =>
          s"  SUM(v * ((((pos - 1) * 37 + $j * 101) % 19) - 9)) AS s$j").mkString(",\n")
        val code = (0 until 8).map(j => s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
        s"""WITH unnested AS (
           |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
           |         unnest(embedding::DOUBLE[]) AS v
           |  FROM embeddings),
           |sums AS (SELECT vec_id,
           |$sums
           |FROM unnested GROUP BY vec_id),
           |bkt AS (SELECT vec_id, CAST($code AS BIGINT) AS bkt FROM sums),
           |e AS (SELECT embeddings.vec_id, embedding, bkt
           |      FROM embeddings JOIN bkt ON embeddings.vec_id = bkt.vec_id),
           |pairs AS (
           |  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
           |    ROUND(${dDot("a.embedding", "b.embedding")} /
           |      (sqrt(${dDot("a.embedding", "a.embedding")}) * sqrt(${dDot("b.embedding", "b.embedding")})), 4) AS cos_sim
           |  FROM e a JOIN e b ON a.bkt = b.bkt AND a.vec_id <> b.vec_id)
           |SELECT vec_id, nbr_id, cos_sim, CAST(rk AS BIGINT) AS rk FROM (
           |  SELECT vec_id, nbr_id, cos_sim,
           |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, nbr_id ASC) AS rk
           |  FROM pairs) WHERE rk <= 3""".stripMargin
      },
      "bucketed KNN join: top-3 neighbors per vector (north-star: similarity)"),

    // K-means Lloyd step (north-star: embedding clustering/curation).
    // The model (per-label-seeded mean centroids, K×dim values) is
    // COLLECTED to the driver and re-emitted as codegen reference
    // objects: at any scale the model is tiny while the corpus is not,
    // so ASSIGNMENT is a scan-parallel codegen'd argmin (KMeansArgMin —
    // one fused expression, no interpreted HOF lambdas in the 100 TB hot
    // scan) — no explode, no per-vector shuffle; the only shuffles are
    // the two aggregations (centroid seed + centroid update), both
    // map-side combinable.
    //
    // DETERMINISM (CORRECTNESS_r06 regression): round(avg(double)) sums
    // in partition order, so a sum 1 ulp from a rounding boundary flips
    // the last digit between engines/runs. Both averages now go through
    // [[kmeansRoundedAvg]] — micro-unit quantization with explicit IEEE
    // ops, exact long sums, integer half-away division — so every value
    // is bit-identical across engines and partition layouts. Scores are
    // raw doubles (bit-identical by VecDot ≡ list_inner_product order);
    // exact ties go to the smaller label in both engines.
    Q("e08_kmeans_step",
      (s, dir) => {
        val e = t(s, dir, "embeddings").filter(col("embedding").isNotNull)
        val model = kmeansSeedModel(s, dir)
        // NO corpus explode: the centroid update aggregates the vector
        // column element-wise (VecMicroSumAgg — exact long sums per
        // position), so the argmin grouping key is evaluated ONCE per
        // vector. The previous explode-then-groupBy shape put
        // kmeans_argmin in the Project ABOVE the Generate, where it
        // re-ran once per ELEMENT — 64x per vector, ~0.9 s of pure
        // re-evaluation at sf1 (ExecPlan-verified). The posexplode
        // below runs over K model rows, not the corpus. Positions with
        // n = 0 drop, exactly as the exploded shape never produced
        // those (cluster, pos) rows.
        e.select(
            graft.functions.KMeansExprs.assignCluster(col("embedding"), model)
              .cast("long").as("cluster"),
            col("embedding"))
          .filter(col("cluster").isNotNull) // unscoreable vectors are excluded (twin: s IS NOT NULL)
          .groupBy(col("cluster"))
          .agg(graft.functions.VectorExprs.vecMicroSum(col("embedding")).as("vs"))
          .select(col("cluster"),
            posexplode(arrays_zip(col("vs.sm").as("sm"), col("vs.n").as("n")))
              .as(Seq("pos0", "z")))
          .filter(col("z.n") > 0)
          .select(col("cluster"), (col("pos0") + 1).cast("long").as("pos"),
            (halfAwayDiv(col("z.sm"), col("z.n") * 100).cast("double") / 10000.0).as("c_new"),
            col("z.n").as("n_members"))
      },
      Some(s"""WITH micro AS (
             |  SELECT vec_id, label, pos, $microQSql AS m FROM (
             |    SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
             |           unnest(embedding::DOUBLE[]) AS v
             |    FROM embeddings WHERE embedding IS NOT NULL)
             |  WHERE v IS NOT NULL),
             |centl AS (SELECT label, pos, SUM(m) AS sm, COUNT(*) AS n
             |  FROM micro GROUP BY label, pos),
             |centv AS (SELECT label, pos,
             |    CAST(${halfAwayDivSql("sm", "n")} AS DOUBLE) / 1000000.0 AS cd
             |  FROM centl),
             |cent AS (SELECT label, list(CAST(cd AS FLOAT) ORDER BY pos) AS cvec
             |  FROM centv GROUP BY label),
             |scored AS (SELECT e.vec_id, c.label,
             |    list_inner_product(c.cvec::DOUBLE[], c.cvec::DOUBLE[])
             |      - 2 * list_inner_product(e.embedding::DOUBLE[], c.cvec::DOUBLE[]) AS s
             |  FROM embeddings e, cent c WHERE e.embedding IS NOT NULL
             |    AND len(list_filter(e.embedding, x -> x IS NULL)) = 0),
             |assign AS (SELECT vec_id, label AS cluster FROM (
             |  SELECT vec_id, label,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY s ASC, label ASC) AS rn
             |  FROM scored WHERE s IS NOT NULL) WHERE rn = 1)
             |SELECT CAST(a.cluster AS BIGINT) AS cluster, CAST(m.pos AS BIGINT) AS pos,
             |  CAST(${halfAwayDivSql("SUM(m.m)", "COUNT(*) * 100")} AS DOUBLE) / 10000.0 AS c_new,
             |  CAST(COUNT(*) AS BIGINT) AS n_members
             |FROM assign a JOIN micro m ON a.vec_id = m.vec_id
             |GROUP BY a.cluster, m.pos""".stripMargin),
      "k-means Lloyd step: broadcast-model assignment + centroid update (north-star: clustering)"),


    // Cluster-balanced curation sampling (north-star: diversity-aware
    // training-data selection, the cluster-then-sample pattern): assign
    // every vector to its nearest seed centroid (the e08 machinery —
    // codegen'd argmin over the broadcast model, bit-deterministic
    // centroids), then keep each cluster's 20 most-central vectors.
    // A per-cluster quota beats global top-N at corpus scale for the
    // same reason d16's strata do: it preserves coverage of small
    // clusters instead of letting dense regions crowd them out. Shape:
    // scan-parallel assignment (no join) + ONE cluster exchange whose
    // rank cut runs as WindowGroupLimit — a K-heap per partition, never
    // a full per-cluster sort (plan-guarded).
    Q("e09_cluster_sample",
      (s, dir) => clusterSampleDf(t(s, dir, "embeddings")),
      Some(s"""WITH micro AS (
             |  SELECT vec_id, label, pos, $microQSql AS m FROM (
             |    SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
             |           unnest(embedding::DOUBLE[]) AS v
             |    FROM embeddings WHERE embedding IS NOT NULL)
             |  WHERE v IS NOT NULL),
             |centl AS (SELECT label, pos, SUM(m) AS sm, COUNT(*) AS n
             |  FROM micro GROUP BY label, pos),
             |centv AS (SELECT label, pos,
             |    CAST(${halfAwayDivSql("sm", "n")} AS DOUBLE) / 1000000.0 AS cd
             |  FROM centl),
             |cent AS (SELECT label, list(CAST(cd AS FLOAT) ORDER BY pos) AS cvec
             |  FROM centv GROUP BY label),
             |scored AS (SELECT e.vec_id, c.label,
             |    list_inner_product(c.cvec::DOUBLE[], c.cvec::DOUBLE[])
             |      - 2 * list_inner_product(e.embedding::DOUBLE[], c.cvec::DOUBLE[]) AS s
             |  FROM embeddings e, cent c WHERE e.embedding IS NOT NULL
             |    AND len(list_filter(e.embedding, x -> x IS NULL)) = 0),
             |assign AS (SELECT vec_id, label AS cluster, s FROM (
             |  SELECT vec_id, label, s,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY s ASC, label ASC) AS rn
             |  FROM scored WHERE s IS NOT NULL) WHERE rn = 1)
             |SELECT CAST(cluster AS BIGINT) AS cluster, vec_id, s AS score,
             |  CAST(rk AS BIGINT) AS rk
             |FROM (SELECT cluster, vec_id, s,
             |    row_number() OVER (PARTITION BY cluster ORDER BY s ASC, vec_id ASC) AS rk
             |  FROM assign) WHERE rk <= 20""".stripMargin),
      "cluster-balanced quota sample: nearest-centroid assignment + per-cluster top-20 (curation)"),

    // SemDeDup-style embedding near-dup DEDUP: e05's bucketed cosine
    // pairs become edges, connected components collapse each semantic
    // cluster to its min-id representative — the embedding-space twin
    // of d12's MinHash dedup clustering, closing the dedup family
    // (exact / MinHash / SimHash / n-gram / embedding-cosine). Edge
    // generation is pair-bounded by the hyperplane buckets (never
    // all-pairs; at scale the planesFor density rule keeps buckets
    // constant-size), CC is the same pointer-jumping O(log d) machinery
    // as d12. Threshold pinned LOW (0.2) because the synthetic vectors
    // are uniform (no tight clusters exist) — production SemDeDup runs
    // the same plan at ~0.95.
    Q("e10_semdedup",
      (s, dir) => {
        val e0 = t(s, dir, "embeddings")
        e0.select(col("vec_id"))
          .join(semDedupIndex(e0), col("vec_id") === col("id"), "left")
          .select(col("vec_id"),
            coalesce(col("rep"), col("vec_id")).as("cluster_rep"))
      },
      Some {
        val sums = (0 until 8).map(j =>
          s"  SUM(v * ((((pos - 1) * 37 + $j * 101) % 19) - 9)) AS s$j").mkString(",\n")
        val code = (0 until 8).map(j => s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
        // bounded-iteration CC twin (CcSql) — same replacement as d12:
        // the recursive closure DNF'd the sf10 oracle cap; the unrolled
        // pointer-jumping levels mirror the Spark operator round-for-round
        val (cc, lk) = CcSql.unrolled()
        s"""WITH unnested AS (
           |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
           |         unnest(embedding::DOUBLE[]) AS v
           |  FROM embeddings),
           |sums AS (SELECT vec_id,
           |$sums
           |FROM unnested GROUP BY vec_id),
           |bkt AS (SELECT vec_id, CAST($code AS BIGINT) AS bkt FROM sums),
           |ee AS (SELECT embeddings.vec_id, embedding, bkt
           |      FROM embeddings JOIN bkt ON embeddings.vec_id = bkt.vec_id),
           |pairs AS MATERIALIZED (
           |  SELECT a.vec_id AS u, b.vec_id AS v
           |  FROM ee a JOIN ee b ON a.bkt = b.bkt AND a.vec_id < b.vec_id
           |  WHERE ROUND(${dDot("a.embedding", "b.embedding")} /
           |    (sqrt(${dDot("a.embedding", "a.embedding")}) * sqrt(${dDot("b.embedding", "b.embedding")})), 4) >= 0.2),
           |edges AS MATERIALIZED (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
           |$cc
           |SELECT em.vec_id, COALESCE($lk.rep, em.vec_id) AS cluster_rep
           |FROM embeddings em LEFT JOIN $lk ON em.vec_id = $lk.id""".stripMargin
      },
      "SemDeDup: embedding near-dup clusters -> min-id representative (north-star: dedup)"),

    // PRODUCTION-geometry gates (round-8): e05/e06 pin the 8-plane
    // oracle geometry, but the paths a user runs at scale —
    // nearDupPairs / knnJoinFast at planesFor(n) — were verified only
    // hash-agnostically (PlaneBucketSpec, RecallSpec). These twins give
    // the density-scaled geometry its own cross-engine signal: the
    // oracle recomputes planesFor(n) from COUNT(*) (see [[dynBkt]]), so
    // at sf0.01 (p=8) they coincide with the pinned gates and at
    // sf0.1/1/10 (p=9/12/13+) they check the exact geometry the sf10
    // headline runs.
    Q("e11_neardup_dense",
      (s, dir) => {
        val n = t(s, dir, "embeddings").count()
        nearDupPairs(s, dir, planesFor(n))
      },
      Some(s"""WITH $dynBkt
              |SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
              |  ROUND(${dDot("a.embedding", "b.embedding")} /
              |    (sqrt(${dDot("a.embedding", "a.embedding")}) * sqrt(${dDot("b.embedding", "b.embedding")})), 4) AS cos_sim
              |FROM e a JOIN e b ON a.bkt = b.bkt AND a.vec_id < b.vec_id
              |WHERE ROUND(${dDot("a.embedding", "b.embedding")} /
              |    (sqrt(${dDot("a.embedding", "a.embedding")}) * sqrt(${dDot("b.embedding", "b.embedding")})), 4) >= 0.2""".stripMargin),
      "near-dup pairs at the PRODUCTION planesFor(n) geometry (oracle recomputes the plane count)"),

    Q("e12_knn_dense",
      (s, dir) => {
        val n = t(s, dir, "embeddings").count()
        knnJoinFast(s, dir, planesFor(n))
      },
      Some(s"""WITH $dynBkt,
              |pairs AS (
              |  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
              |    ROUND(${dDot("a.embedding", "b.embedding")} /
              |      (sqrt(${dDot("a.embedding", "a.embedding")}) * sqrt(${dDot("b.embedding", "b.embedding")})), 4) AS cos_sim
              |  FROM e a JOIN e b ON a.bkt = b.bkt AND a.vec_id <> b.vec_id)
              |SELECT vec_id, nbr_id, cos_sim, CAST(rk AS BIGINT) AS rk FROM (
              |  SELECT vec_id, nbr_id, cos_sim,
              |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, nbr_id ASC) AS rk
              |  FROM pairs) WHERE rk <= 3""".stripMargin),
      "KNN join at the PRODUCTION planesFor(n) geometry (oracle recomputes the plane count)"),

    // Scalar-quantization (int8) ANN — the embedding-COMPRESSION member
    // of the ANN family (IVF e03/e07 prunes cells, LSH e04/e12 prunes
    // buckets; SQ shrinks every vector 4×: float32 → one byte/dim).
    // At 100 TB of embeddings the codes table is what you scan — 1/4 the
    // bytes, integer SIMD dot products — and the exact re-rank touches
    // only the top candidates. Arithmetic is exact end-to-end
    // (micro-quantize → per-dim long min/max → integer affine code →
    // integer ADC dot), so both engines pick bit-identical codes and an
    // identical candidate set; only the final re-rank cosine is float,
    // rounded like e02. Per-dim stats: one map-side-combinable agg whose
    // output is dim rows (broadcast back — a real deployment trains
    // min/max once on a sample and stores codes). Null components drop
    // out of the per-pos join in BOTH engines (contribute nothing), the
    // e08-pinned semantics for partially-null vectors.
    Q("e13_sq_ann",
      (s, dir) => {
        val e = t(s, dir, "embeddings").filter(col("embedding").isNotNull)
        val comps = e
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "vf")))
          .filter(col("vf").isNotNull)
          .select(col("vec_id"), col("pos"), microQ(col("vf")).as("m"))
        val stats = comps.groupBy(col("pos"))
          .agg(min(col("m")).as("lo"), max(col("m")).as("hi"))
        val coded = comps.join(broadcast(stats), Seq("pos"))
          .select(col("vec_id"), col("pos"),
            when(col("hi") === col("lo"), lit(0L))
              .otherwise(halfAwayDiv((col("m") - col("lo")) * 255, col("hi") - col("lo")))
              .as("q"))
        val qv = coded.filter(col("vec_id") === 0)
          .select(col("pos"), col("q").as("qq"))
        val cand = coded.filter(col("vec_id") =!= 0)
          .join(broadcast(qv), Seq("pos"))
          .groupBy(col("vec_id")).agg(sum(col("q") * col("qq")).as("adc"))
          .orderBy(col("adc").desc, col("vec_id").asc).limit(20)
        val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
        cand.join(e, Seq("vec_id")).crossJoin(broadcast(q))
          .withColumn("cos_sim", round(cosineFast(col("embedding"), col("qe")), 4))
          .orderBy(col("cos_sim").desc, col("vec_id").asc).limit(5)
          .select(col("vec_id"), col("adc"), col("cos_sim"))
      },
      Some(s"""WITH u AS (
              |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
              |         unnest(embedding::DOUBLE[]) AS v
              |  FROM embeddings WHERE embedding IS NOT NULL),
              |m AS (SELECT vec_id, pos, $microQSql AS m FROM u WHERE v IS NOT NULL),
              |st AS (SELECT pos, MIN(m) AS lo, MAX(m) AS hi FROM m GROUP BY pos),
              |coded AS (SELECT vec_id, m.pos,
              |    CASE WHEN hi = lo THEN 0
              |      ELSE ${halfAwayDivSql("(m - lo) * 255", "hi - lo")} END AS q
              |  FROM m JOIN st ON m.pos = st.pos),
              |qv AS (SELECT pos, q AS qq FROM coded WHERE vec_id = 0),
              |cand AS (
              |  SELECT c.vec_id, CAST(SUM(c.q * qv.qq) AS BIGINT) AS adc
              |  FROM coded c JOIN qv ON c.pos = qv.pos
              |  WHERE c.vec_id <> 0 GROUP BY c.vec_id
              |  ORDER BY adc DESC, c.vec_id ASC LIMIT 20),
              |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
              |SELECT cand.vec_id, adc,
              |  ROUND(${dDot("e.embedding", "q.qe")} /
              |    (sqrt(${dDot("e.embedding", "e.embedding")}) * sqrt(${dDot("q.qe", "q.qe")})), 4) AS cos_sim
              |FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id, q
              |ORDER BY cos_sim DESC, cand.vec_id ASC LIMIT 5""".stripMargin),
      "int8 scalar-quantization ANN: exact-integer codes + ADC candidates + exact re-rank (north-star)"),

    // Product-quantization ANN — the CODEBOOK member of the ANN family
    // (IVF-PQ is the de-facto production shape for billion-vector
    // search; e13 covers per-dim scalar compression, this covers
    // subspace codebooks): the 64-dim space splits into 8 contiguous
    // 8-dim subspaces, each vector's subvector is replaced by the id of
    // its nearest per-subspace centroid (8 bytes/vector at K ≤ 256 —
    // 32× smaller than the floats), and the query scans CODES ONLY via
    // an additive distance table. Codebooks are the e08 seed model kept
    // in EXACT micro-units (label × pos rounded means BEFORE the /1e6
    // narrowing), so centroids, micro components, subspace distances,
    // PQ codes, the query's distance table, and every ADC sum are pure
    // long arithmetic — bit-identical across engines and partition
    // layouts; the only floating point is the final exact-cosine
    // re-rank of the top-20 (e02's rounded-rank discipline).
    //
    // Scale shape: ONE vec_id spread (whole arrays, pre-explode)
    // feeds micro components; every aggregation downstream —
    // (vec_id, sub, label) distances, per-(vec_id, sub) argmin codes,
    // per-vec ADC — is keyed on a vec_id prefix, so nothing re-shuffles
    // after the spread. The codebook (K × 64 longs) and the query's
    // 8 × K distance table are broadcast; the K-way distance fan-out is
    // map-side (broadcast join + partial agg collapses it back to
    // K × 8 rows per vector before any exchange could see it).
    Q("e15_pq_ann",
      (s, dir) => {
        val e = t(s, dir, "embeddings").filter(col("embedding").isNotNull)
        // exact-micro-unit codebook, integer subspace distances, argmin
        // codes, ADC over codes only (shared with the ivfPqSearch
        // production composition and the e18 recall report)
        pqRerank(e, pqAdcCandidates(e), 0L, 5)
      },
      Some(s"""WITH $pqPreludeSql,
              |$pqPlainCandSql,
              |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
              |SELECT cand.vec_id, adc,
              |  ROUND(${dDot("e.embedding", "q.qe")} /
              |    (sqrt(${dDot("e.embedding", "e.embedding")}) * sqrt(${dDot("q.qe", "q.qe")})), 4) AS cos_sim
              |FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id, q
              |ORDER BY cos_sim DESC, cand.vec_id ASC LIMIT 5""".stripMargin),
      "product-quantization ANN: per-subspace codebooks, integer ADC over codes, exact re-rank (north-star)"),

    // Residual-encoded IVF-PQ — the standard production refinement over
    // e15: vectors coarse-assign to their nearest codebook cell (exact
    // integer argmin over the full vector), PQ codebooks train on the
    // RESIDUAL (vector − cell centroid), and the query carries one
    // distance table per cell so every candidate is scored against the
    // query's residual in the candidate's own cell. Residuals
    // concentrate near zero → the same code budget quantizes a tighter
    // distribution → recall at equal bytes goes up (RecallSpec asserts
    // ≥ e15's recall@10; the e18 report carries both). Same scale
    // shape as e15: one vec_id spread, everything downstream keyed on a
    // vec_id prefix, codebooks/cell-maps/query tables all K×dims
    // broadcasts.
    Q("e19_pq_residual_ann",
      (s, dir) => {
        val e = t(s, dir, "embeddings").filter(col("embedding").isNotNull)
        pqRerank(e, pqResidualAdcCandidates(e), 0L, 5)
      },
      Some(s"""WITH $pqPreludeSql,
              |$pqResidualCandSql,
              |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
              |SELECT rcand.vec_id, adc,
              |  ROUND(${dDot("e.embedding", "q.qe")} /
              |    (sqrt(${dDot("e.embedding", "e.embedding")}) * sqrt(${dDot("q.qe", "q.qe")})), 4) AS cos_sim
              |FROM rcand JOIN embeddings e ON e.vec_id = rcand.vec_id, q
              |ORDER BY cos_sim DESC, rcand.vec_id ASC LIMIT 5""".stripMargin),
      "residual-encoded IVF-PQ ANN: codebooks on vector minus cell centroid, per-cell query tables, integer ADC (north-star)"),

    // 4-bit PQ — the compression family's low-memory point (e13 is
    // 8 bits/dim scalar, e15/e19 are byte-coded subspaces; THIS packs
    // two 4-bit subspace codes per byte, the production format for
    // >10⁹-vector indexes where code bytes dominate RAM). K = 16
    // codewords per subspace are TRAINED (one exact-integer k-means
    // refinement from deterministic seeds) rather than label means —
    // at 4 bits the codebook must adapt per subspace or the nibble
    // budget is wasted. The stored index is the packed nibble table
    // (4 bytes + validity mask per 64-dim vector — HALF of e15's
    // 8 code bytes); serving mask-unpacks the codes, joins the query's
    // broadcast 8×16 distance table, ranks by integer ADC, and
    // exact-re-ranks the top-20 (e02's rounded discipline). All
    // arithmetic before the re-rank is pure long — both engines train
    // bit-identical codebooks and pick identical candidates. Recall
    // vs the byte-coded variants rides in the e18 report (RecallSpec
    // asserts ≥ plain PQ at half the code bytes).
    Q("e20_pq4_ann",
      (s, dir) => {
        val e = t(s, dir, "embeddings").filter(col("embedding").isNotNull)
        pqRerank(e, pq4AdcCandidates(e), 0L, 5)
      },
      Some(s"""WITH $pqPreludeSql,
              |$pq4CandSql,
              |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
              |SELECT cand4.vec_id, adc,
              |  ROUND(${dDot("e.embedding", "q.qe")} /
              |    (sqrt(${dDot("e.embedding", "e.embedding")}) * sqrt(${dDot("q.qe", "q.qe")})), 4) AS cos_sim
              |FROM cand4 JOIN embeddings e ON e.vec_id = cand4.vec_id, q
              |ORDER BY cos_sim DESC, cand4.vec_id ASC LIMIT 5""".stripMargin),
      "4-bit PQ ANN: 16 trained codewords per subspace, packed nibble codes at half the byte-PQ footprint, integer ADC (north-star)"),

    // OPQ-lite 4-bit PQ — e20 with a seeded Walsh-Hadamard rotation of
    // the micro-quantized vectors BEFORE the subspace split (the
    // standard OPQ trick: mix correlated energy across subspaces so the
    // per-subspace nibble codebooks see isotropic residuals). The
    // rotation is exact long arithmetic (see OpqRotateMicro), so the
    // rotated index, codes, and ADC ranks stay bit-deterministic
    // cross-engine; for the power-of-two dims of this corpus H is
    // orthogonal, so rotated squared distances are exactly dim x the
    // originals. Train/encode/serve reuse e20's chain verbatim over the
    // rotated stream; vectors with any null component are excluded (a
    // rotation mixes every dimension — one hole poisons the vector).
    // Recall rides in the e18 report as 'opq4' (RecallSpec gates it
    // >= e20's pq4).
    Q("e21_opq4_ann",
      (s, dir) => {
        val e = t(s, dir, "embeddings").filter(col("embedding").isNotNull)
        pqRerank(e, opq4AdcCandidates(e), 0L, 5)
      },
      Some(s"""WITH $opqPreludeSql,
              |${pq4CandSqlOn("r", "m21", opqEligSql)},
              |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
              |SELECT cand4r.vec_id, adc,
              |  ROUND(${dDot("e.embedding", "q.qe")} /
              |    (sqrt(${dDot("e.embedding", "e.embedding")}) * sqrt(${dDot("q.qe", "q.qe")})), 4) AS cos_sim
              |FROM cand4r JOIN embeddings e ON e.vec_id = cand4r.vec_id, q
              |ORDER BY cos_sim DESC, cand4r.vec_id ASC LIMIT 5""".stripMargin),
      "OPQ-lite 4-bit PQ ANN: seeded exact-integer Walsh-Hadamard rotation before the nibble codebooks (north-star)"),

    // Predicate-FILTERED ANN — the production retrieval shape the rest
    // of the e-battery omits: top-k cosine restricted to vectors whose
    // companion document passes a metadata predicate (here lang = 'en',
    // joined on vec_id = doc_id). PRE-filter semantics: the predicate
    // prunes the candidate set BEFORE ranking, so the top-k always
    // holds k allowed survivors — post-filtering an unfiltered top-k
    // starves whenever the allowed fraction of the neighborhood is
    // below k/overfetch. The index (per-label centroids, e03's coarse
    // quantizer) is built ONCE over the FULL corpus and reused across
    // predicates — filters change per query, so they can never be
    // baked into the index; multi-probe (nprobe=2, e07's lever)
    // compensates for allowed-density variance across cells. Scale
    // shape: centroids and the query vector are tiny broadcasts; the
    // predicate side is corpus-scale in general (lang = 'en' is ~40%
    // of a web corpus), so it is a plain SEMI-join, deliberately
    // UNhinted — AQE demotes it to broadcast only when runtime stats
    // prove the filtered keys bounded. The join ships only the probed
    // cells (nprobe/L of the corpus), not the corpus, and with
    // doc_id-co-bucketed storage it is exchange-free. Rounding
    // discipline: cell ranking on round(dot, 6) tie-break label; final
    // rank on round(cos, 4) tie-break vec_id (cross-engine stable).
    Q("e22_filtered_ann",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val qd = e.filter(col("vec_id") === 0)
          .select(posexplode(asDoubles(col("embedding")))).toDF("pos", "qv")
        val cent = e.select(col("label"), posexplode(asDoubles(col("embedding"))))
          .toDF("label", "pos", "v")
          .groupBy(col("label"), col("pos")).agg(avg(col("v")).as("c"))
        val best = cent.join(broadcast(qd), Seq("pos"))
          .groupBy(col("label")).agg(round(sum(col("c") * col("qv")), 6).as("dot"))
          .orderBy(col("dot").desc, col("label").asc).limit(2)
          .select(col("label"))
        val allowed = t(s, dir, "documents")
          .filter(col("lang") === "en").select(col("doc_id").as("vec_id"))
        val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
        e.join(broadcast(best), Seq("label")).filter(col("vec_id") > 0)
          .join(allowed, Seq("vec_id"), "left_semi")
          .crossJoin(broadcast(q))
          .withColumn("cos_sim", round(cosineFast(col("embedding"), col("qe")), 4))
          .orderBy(col("cos_sim").desc, col("vec_id").asc).limit(5)
          .select(col("label"), col("vec_id"), col("cos_sim"))
      },
      Some(s"""WITH qd AS (
              |  SELECT generate_subscripts(embedding, 1) AS pos, unnest(embedding::DOUBLE[]) AS qv
              |  FROM embeddings WHERE vec_id = 0),
              |cent AS (
              |  SELECT label, pos, AVG(v) AS c FROM (
              |    SELECT label, generate_subscripts(embedding, 1) AS pos,
              |           unnest(embedding::DOUBLE[]) AS v
              |    FROM embeddings) GROUP BY label, pos),
              |best AS (
              |  SELECT label FROM (
              |    SELECT cent.label, ROUND(SUM(c * qv), 6) AS dot
              |    FROM cent JOIN qd USING (pos) GROUP BY cent.label)
              |  ORDER BY dot DESC, label ASC LIMIT 2),
              |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
              |SELECT e.label, e.vec_id,
              |  ROUND(${dDot("e.embedding", "q.qe")} /
              |    (sqrt(${dDot("e.embedding", "e.embedding")}) * sqrt(${dDot("q.qe", "q.qe")})), 4) AS cos_sim
              |FROM embeddings e JOIN best ON e.label = best.label, q
              |WHERE e.vec_id > 0
              |  AND e.vec_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
              |ORDER BY cos_sim DESC, e.vec_id ASC LIMIT 5""".stripMargin),
      "predicate-filtered ANN: metadata pre-filter + multi-probe IVF, index reused across predicates (north-star)"),

    // Radius (range) search — the similarity query where the RESULT SET
    // scales with the data, not with k: every vector whose cosine to
    // the query clears a threshold. The missing sibling of top-k (e02):
    // dedup-candidate harvesting, "find everything like this spam
    // template", recall-floor audits. The threshold compares the
    // ROUNDED cosine (the e02 doctrine) so sub-ulp accumulation drift
    // between engines cannot flip boundary membership. Scale shape:
    // ONE scan-parallel pass — broadcast query row, codegen'd cosine,
    // map-side filter; ZERO exchanges at any corpus size (the dump's
    // coalesce is the driver's). The approximate scale path (probe
    // only IVF cells whose centroid dot clears threshold − cell
    // radius) trades recall like e03 vs e02; this gate pins the EXACT
    // semantics both are judged against.
    Q("e23_radius_search",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
        e.filter(col("vec_id") > 0).crossJoin(broadcast(q))
          .withColumn("cos_sim", round(cosineFast(col("embedding"), col("qe")), 4))
          .filter(col("cos_sim") >= 0.25)
          .select(col("vec_id"), col("label"), col("cos_sim"))
      },
      Some {
        val cos = s"""ROUND(${dDot("e.embedding", "q.qe")} /
          |    (sqrt(${dDot("e.embedding", "e.embedding")}) * sqrt(${dDot("q.qe", "q.qe")})), 4)""".stripMargin
        s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
           |SELECT vec_id, label, $cos AS cos_sim
           |FROM embeddings e, q
           |WHERE vec_id > 0 AND $cos >= 0.25""".stripMargin
      },
      "radius search: all vectors within a cosine threshold of the query, one scan-parallel pass (north-star: similarity)"),

    // Cross-corpus SEMANTIC decontamination — the embedding-space
    // complement of d29's shingle near-dup: drop every TARGET vector
    // (vec_id % 10 ≠ 0) whose rounded cosine with any REFERENCE vector
    // (vec_id % 10 = 0 — the held-out eval snapshot, d15/d29's benchMod
    // convention) reaches 0.2, catching a REWRITTEN eval document whose
    // embedding still sits next to the original even though no shingle
    // survives. Scale shape: the reference corpus is an eval suite —
    // broadcast-sized at ANY corpus scale — so the per-bucket reference
    // side is BROADCAST and the 100 TB target corpus never shuffles:
    // one scan computes each target's bucket (codegen'd per-row map),
    // hash-probes the broadcast reference buckets, and only bucket
    // collisions pay a cosine. The contaminated-id set (bounded by the
    // match count, not the corpus) then prunes via left_anti, which AQE
    // turns into a broadcast join at runtime. Gate uses the
    // oracle-pinned static 8-plane geometry (e04); a deployment scales
    // recall/bucket-occupancy with planesFor + OR-amplification exactly
    // as e06/e11 document.
    Q("e14_semantic_decontam",
      (s, dir) => {
        val isRef = (c: Column) => c % 10 === 0
        val e = t(s, dir, "embeddings")
        semanticDecontamKeepDf(
          e.filter(!isRef(col("vec_id"))),
          e.filter(isRef(col("vec_id"))))
          .select(col("vec_id"), col("label").cast("long").as("label"))
      },
      Some {
        val sums = (0 until 8).map(j =>
          s"  SUM(v * ((((pos - 1) * 37 + $j * 101) % 19) - 9)) AS s$j").mkString(",\n")
        val code = (0 until 8).map(j => s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
        s"""WITH unnested AS (
           |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
           |         unnest(embedding::DOUBLE[]) AS v
           |  FROM embeddings),
           |sums AS (SELECT vec_id,
           |$sums
           |FROM unnested GROUP BY vec_id),
           |bkt AS (SELECT vec_id, CAST($code AS BIGINT) AS bkt FROM sums),
           |e AS (SELECT embeddings.vec_id, embedding, bkt
           |      FROM embeddings JOIN bkt ON embeddings.vec_id = bkt.vec_id),
           |contaminated AS (
           |  SELECT DISTINCT tg.vec_id
           |  FROM e tg JOIN e r ON tg.bkt = r.bkt
           |    AND tg.vec_id % 10 <> 0 AND r.vec_id % 10 = 0
           |  WHERE ROUND(${dDot("tg.embedding", "r.embedding")} /
           |    (sqrt(${dDot("tg.embedding", "tg.embedding")}) * sqrt(${dDot("r.embedding", "r.embedding")})), 4) >= 0.2)
           |SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings
           |WHERE vec_id % 10 <> 0
           |  AND vec_id NOT IN (SELECT vec_id FROM contaminated)""".stripMargin
      },
      "semantic decontamination: fuzzy-drop targets near the eval snapshot in embedding space (north-star: curation)"),

    // Multimodal-column metadata gate: opaque bytes + byte-level
    // metadata, plus a deterministic fake-dimension pair kept ONLY
    // because DuckDB has no image codec to oracle a real decode
    // against. The real decoders (image pixels, PCM audio, container
    // metadata, bilinear resize) live in graft.mm.Multimodal with
    // golden-byte specs; this gate pins the columnar metadata path
    // cross-engine.
    Q("m01_multimodal_meta",
      (s, dir) => {
        val bytes = col("text").cast("binary")
        t(s, dir, "documents").select(
          col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          sha2(bytes, 256).as("content_sha"),
          (octet_length(col("text")) % 320 + 32).cast("long").as("fake_width"),
          (octet_length(col("text")) % 240 + 32).cast("long").as("fake_height"))
      },
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |  sha256(text) AS content_sha,
             |  CAST(octet_length(encode(text)) % 320 + 32 AS BIGINT) AS fake_width,
             |  CAST(octet_length(encode(text)) % 240 + 32 AS BIGINT) AS fake_height
             |FROM documents""".stripMargin),
      "multimodal binary column + fake-decode metadata (north-star)"),

    // REAL video frame decode, oracle-checked end to end: each doc gets
    // a deterministic raw-RGB AVI (real RIFF container, real DIB stride/
    // BGR/bottom-up byte layout — Multimodal.syntheticRgbAvi), Spark
    // decodes the BYTES with decodeFrames, and the DuckDB twin
    // recomputes the expected per-frame means from the construction
    // FORMULA alone — it never sees the container, so builder and
    // decoder are cross-checked against an independent derivation. Any
    // stride/channel-order/row-order defect in either side breaks the
    // hash. Scale shape: scan-parallel map (payload synthesis) +
    // per-row decode — ZERO exchanges at any corpus size.
    Q("m02_video_frames",
      (s, dir) => {
        import s.implicits._
        val payloads = t(s, dir, "documents")
          .filter(col("doc_id").isNotNull)
          .select(col("doc_id")).as[Long]
          .mapPartitions(_.map(id => (id, graft.mm.Multimodal.syntheticRgbAvi(id))))
          .toDF("doc_id", "payload")
        graft.mm.Multimodal.decodeFrames(payloads)
          .select(col("doc_id"),
            col("frame_no").cast("long").as("frame_no"),
            col("codec"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("mean_r"), col("mean_g"), col("mean_b"))
      },
      Some("""SELECT doc_id, CAST(f AS BIGINT) AS frame_no, 'rgb24' AS codec,
             |  CAST(4 AS BIGINT) AS width, CAST(2 AS BIGINT) AS height,
             |  CAST((doc_id * 7 + f * 13) % 256 AS DOUBLE) AS mean_r,
             |  CAST((doc_id * 11 + f * 17) % 256 AS DOUBLE) AS mean_g,
             |  CAST((doc_id * 3 + f * 29) % 256 AS DOUBLE) AS mean_b
             |FROM (SELECT doc_id, unnest(range(doc_id % 3 + 1)) AS f
             |      FROM documents WHERE doc_id IS NOT NULL)""".stripMargin),
      "REAL video frame decode: synthetic raw-RGB AVI -> per-frame means, formula-oracle (north-star: multimodal)"),

    // REAL image perceptual-hash dedup, oracle-checked end to end: each
    // doc gets a deterministic grayscale PNG (real ImageIO encode —
    // Multimodal.syntheticGrayPng), Spark DECODES the bytes and hashes
    // the decoded pixels (perceptualHash: javax.imageio decode → 9x8
    // dHash64), groups on the hash halves, and the DuckDB twin
    // recomputes the expected bits from the construction FORMULA alone
    // (pixel value v=(base*31+x*29+y*13)%256 ⇒ gradient bit = v+29 not
    // wrapping ⇒ v%256 < 227) — encoder, decoder, and hash are
    // cross-checked against a derivation that never touches the bytes.
    // doc_id%16 bases ⇒ 16 dup groups: the image twin of d09's exact
    // text dedup, with keeper_id = min doc_id per group, the d13 keeper
    // rule. Scale shape: scan-parallel encode+decode+hash (zero
    // exchanges), then ONE exchange of 2 longs per image for the group
    // — pixels never shuffle at any corpus size.
    Q("m03_image_phash",
      (s, dir) => {
        import s.implicits._
        val payloads = t(s, dir, "documents")
          .filter(col("doc_id").isNotNull)
          .select(col("doc_id")).as[Long]
          .mapPartitions(_.map(id => (id, graft.mm.Multimodal.syntheticGrayPng(id))))
          .toDF("doc_id", "payload")
        graft.mm.Multimodal.perceptualHash(payloads)
          .filter(col("ok"))
          .groupBy(col("phash_hi"), col("phash_lo"))
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper_id"))
      },
      Some {
        def bit(x: Int, y: Int) = s"(base * 31 + ${x * 29 + y * 13}) % 256 < 227"
        def half(lo: Int, hi: Int) = (for {
          y <- 0 until 8; x <- 0 until 8; idx = y * 8 + x
          if idx >= lo && idx < hi
        } yield s"(CASE WHEN ${bit(x, y)} THEN ${1L << (idx - lo)} ELSE 0 END)")
          .mkString(" + ")
        s"""WITH b AS (SELECT doc_id, doc_id % 16 AS base FROM documents
           |  WHERE doc_id IS NOT NULL),
           |h AS (SELECT doc_id,
           |  CAST(${half(32, 64)} AS BIGINT) AS phash_hi,
           |  CAST(${half(0, 32)} AS BIGINT) AS phash_lo
           |FROM b)
           |SELECT phash_hi, phash_lo, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  MIN(doc_id) AS keeper_id
           |FROM h GROUP BY phash_hi, phash_lo""".stripMargin
      },
      "REAL image perceptual-hash dedup: PNG decode -> dHash64 -> dup groups, formula-oracle (north-star: multimodal dedup)"),

    // REAL audio feature extraction, oracle-checked end to end: each
    // doc gets a deterministic 16-bit mono PCM WAV (real RIFF container
    // — Multimodal.syntheticPcmWav), Spark decodes the STREAM with
    // audioFingerprint (javax.sound.sampled) and emits the per-window
    // Σ|amplitude| energy envelope in exact integer raw-PCM units; the
    // DuckDB twin recomputes the expected windows from the construction
    // FORMULA alone — container, decoder, and fingerprint cross-checked
    // against a derivation that never touches the bytes. Frame counts
    // are non-multiples of the window, so partial trailing windows are
    // gated too. Scale shape: scan-parallel synth+decode+window (zero
    // exchanges at any corpus size — the dump's exchange is the
    // driver's coalesce(1), not the operator's).
    Q("m04_audio_fp",
      (s, dir) => {
        import s.implicits._
        val payloads = t(s, dir, "documents")
          .filter(col("doc_id").isNotNull)
          .select(col("doc_id")).as[Long]
          .mapPartitions(_.map(id => (id, graft.mm.Multimodal.syntheticPcmWav(id))))
          .toDF("doc_id", "payload")
        graft.mm.Multimodal.audioFingerprint(payloads, window = 16)
          .filter(col("ok"))
          .select(col("doc_id"), col("win_no"), col("n_samples"), col("energy"))
      },
      Some("""SELECT doc_id, CAST(i // 16 AS BIGINT) AS win_no,
             |  CAST(COUNT(*) AS BIGINT) AS n_samples,
             |  CAST(SUM(ABS(((doc_id % 8) * 37 + i * 11) % 256 - 128) * 256) AS BIGINT) AS energy
             |FROM (SELECT doc_id, unnest(range(40 + (doc_id % 5) * 10)) AS i
             |      FROM documents WHERE doc_id IS NOT NULL)
             |GROUP BY doc_id, i // 16""".stripMargin),
      "REAL audio feature extraction: PCM WAV decode -> windowed energy envelope, formula-oracle (north-star: multimodal features)"),

    // REAL video fingerprint dedup — the m02×m03 composite that closes
    // the multimodal dedup matrix: every doc gets a deterministic
    // raw-RGB AVI whose CONTENT is keyed by doc_id % 24 (24 dup groups,
    // mixed frame counts since frames = base % 3 + 1), Spark DECODES
    // the container (real RIFF walk + pixel decode, not the synthesis
    // formula), rolls the per-frame means into an ORDER-SENSITIVE
    // video fingerprint (frame order matters — two videos with the
    // same frames shuffled must NOT collide), and groups into dup
    // clusters with the d13 min-keeper rule. The DuckDB twin
    // recomputes expected fingerprints from the construction formula
    // alone — container writer, decoder, and fingerprint are
    // cross-checked against a derivation that never touches the bytes.
    // Scale shape: scan-parallel synth+decode+frame-sig (pixels never
    // leave the map task), then two NARROW exchanges — (doc_id, ≤3
    // tiny sig strings) for the per-video rollup and (fp string) for
    // the dup grouping.
    Q("m05_video_fp_dedup",
      (s, dir) => {
        import s.implicits._
        val payloads = t(s, dir, "documents")
          .filter(col("doc_id").isNotNull)
          .select(col("doc_id")).as[Long]
          .mapPartitions(_.map(id =>
            (id, graft.mm.Multimodal.syntheticRgbAvi(id % 24))))
          .toDF("doc_id", "payload")
        val frames = graft.mm.Multimodal.decodeFrames(payloads)
          .filter(col("ok"))
          .select(col("doc_id"), col("frame_no"),
            concat_ws(":", col("mean_r").cast("long"),
              col("mean_g").cast("long"),
              col("mean_b").cast("long")).as("fsig"))
        val fp = frames.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_frames"),
            array_join(
              transform(
                array_sort(collect_list(struct(col("frame_no"), col("fsig")))),
                x => x.getField("fsig")),
              "|").as("video_fp"))
        fp.groupBy(col("video_fp"), col("n_frames"))
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper_id"))
      },
      Some("""WITH f AS (SELECT doc_id, doc_id % 24 AS base,
             |    unnest(range((doc_id % 24) % 3 + 1)) AS fr
             |  FROM documents WHERE doc_id IS NOT NULL),
             |sig AS (SELECT doc_id, fr,
             |    CAST((base * 7 + fr * 13) % 256 AS VARCHAR) || ':' ||
             |    CAST((base * 11 + fr * 17) % 256 AS VARCHAR) || ':' ||
             |    CAST((base * 3 + fr * 29) % 256 AS VARCHAR) AS fsig
             |  FROM f),
             |fp AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
             |    string_agg(fsig, '|' ORDER BY fr) AS video_fp
             |  FROM sig GROUP BY doc_id)
             |SELECT video_fp, n_frames, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  MIN(doc_id) AS keeper_id
             |FROM fp GROUP BY video_fp, n_frames""".stripMargin),
      "REAL video fingerprint dedup: AVI decode -> ordered frame-sig fingerprint -> dup groups, formula-oracle (north-star: multimodal dedup)"),

    // Topic-mix report — the corpus-composition view a data-curation
    // owner reads before setting d36 mixture weights: every vector
    // assigned to its nearest centroid (e08's codegen'd broadcast-model
    // argmin — scan-parallel, no join), then per cluster: member count,
    // majority true label, and purity in exact ppm. Together with e09
    // this closes the clustering family's reporting loop (e08 trains,
    // e09 samples, e16 audits). Shuffle shape: ONE (cluster,label)
    // partial agg (≤ K·L rows leave every map task), then the top-1 cut
    // and the totals join both run on the tiny aggregated side —
    // nothing corpus-sized moves after the scan.
    Q("e16_topic_mix",
      (s, dir) => {
        val model = kmeansSeedModel(s, dir)
        val cl = t(s, dir, "embeddings").filter(col("embedding").isNotNull)
          .select(col("label"),
            graft.functions.KMeansExprs.assignCluster(col("embedding"), model)
              .cast("long").as("cluster"))
          .filter(col("cluster").isNotNull)
          .groupBy(col("cluster"), col("label"))
          .agg(count(lit(1)).as("n"))
        val tot = cl.groupBy(col("cluster")).agg(sum(col("n")).as("n_members"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("cluster")).orderBy(col("n").desc, col("label").asc)
        cl.withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .join(tot, Seq("cluster"))
          .select(col("cluster"), col("n_members"),
            col("label").cast("long").as("top_label"),
            floorDiv(col("n") * lit(1000000L), col("n_members")).as("purity_ppm"))
      },
      Some(s"""WITH micro AS (
             |  SELECT vec_id, label, pos, $microQSql AS m FROM (
             |    SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
             |           unnest(embedding::DOUBLE[]) AS v
             |    FROM embeddings WHERE embedding IS NOT NULL)
             |  WHERE v IS NOT NULL),
             |centl AS (SELECT label, pos, SUM(m) AS sm, COUNT(*) AS n
             |  FROM micro GROUP BY label, pos),
             |centv AS (SELECT label, pos,
             |    CAST(${halfAwayDivSql("sm", "n")} AS DOUBLE) / 1000000.0 AS cd
             |  FROM centl),
             |cent AS (SELECT label, list(CAST(cd AS FLOAT) ORDER BY pos) AS cvec
             |  FROM centv GROUP BY label),
             |scored AS (SELECT e.vec_id, e.label AS tl, c.label,
             |    list_inner_product(c.cvec::DOUBLE[], c.cvec::DOUBLE[])
             |      - 2 * list_inner_product(e.embedding::DOUBLE[], c.cvec::DOUBLE[]) AS s
             |  FROM embeddings e, cent c WHERE e.embedding IS NOT NULL
             |    AND len(list_filter(e.embedding, x -> x IS NULL)) = 0),
             |assign AS (SELECT vec_id, tl, label AS cluster FROM (
             |  SELECT vec_id, tl, label,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY s ASC, label ASC) AS rn
             |  FROM scored WHERE s IS NOT NULL) WHERE rn = 1),
             |cl AS (SELECT cluster, tl, CAST(COUNT(*) AS BIGINT) AS n
             |  FROM assign GROUP BY cluster, tl),
             |tot AS (SELECT cluster, CAST(SUM(n) AS BIGINT) AS n_members FROM cl GROUP BY cluster),
             |top1 AS (SELECT cluster, tl, n FROM (
             |  SELECT cluster, tl, n,
             |    row_number() OVER (PARTITION BY cluster ORDER BY n DESC, tl ASC) AS rk
             |  FROM cl) WHERE rk = 1)
             |SELECT CAST(t1.cluster AS BIGINT) AS cluster, t.n_members,
             |  CAST(t1.tl AS BIGINT) AS top_label,
             |  (t1.n * 1000000) // t.n_members AS purity_ppm
             |FROM top1 t1 JOIN tot t USING (cluster)""".stripMargin),
      "topic-mix report: nearest-centroid assignment + per-cluster majority-label purity (north-star: clustering)"),

    // Hard-negative mining — the contrastive-training data op: for an
    // anchor vector, the top-k most similar vectors with a DIFFERENT
    // label ("looks like the anchor, isn't the anchor's class" — the
    // negatives an embedding-model trainer actually wants). Same
    // rounded-cosine + vec_id tie discipline as e02, with the label
    // exclusion riding the broadcast join filter. Scale shape: the
    // anchor set is training-batch-sized → broadcast; the corpus side
    // stays a scan (at 100 TB you'd compose this with the IVF cell
    // pruning of e03/e07 — probe the anchor's nprobe cells, exclude
    // same-label rows in-cell, exactly this expression tree on the
    // pruned scan).
    Q("e17_hard_negatives",
      (s, dir) => {
        // unscoreable vectors (null / null-element) are EXCLUDED, the
        // kmeans-family convention — a null cosine can't rank
        val e = t(s, dir, "embeddings").filter(col("embedding").isNotNull &&
          !exists(col("embedding"), _.isNull))
        val q = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("qe"), col("label").as("ql"))
        e.filter(col("vec_id") > 0).crossJoin(broadcast(q))
          .filter(col("label") =!= col("ql"))
          .withColumn("cos_sim", round(cosineFast(col("embedding"), col("qe")), 4))
          .orderBy(col("cos_sim").desc, col("vec_id").asc)
          .limit(10)
          .select(col("vec_id"), col("label").cast("long").as("label"), col("cos_sim"))
      },
      Some(s"""WITH sc AS (SELECT vec_id, label, embedding FROM embeddings
              |  WHERE embedding IS NOT NULL
              |    AND len(list_filter(embedding, x -> x IS NULL)) = 0),
              |q AS (SELECT embedding AS qe, label AS ql FROM sc WHERE vec_id = 0)
              |SELECT vec_id, CAST(label AS BIGINT) AS label,
              |  ROUND(${dDot("e.embedding", "q.qe")} /
              |    (sqrt(${dDot("e.embedding", "e.embedding")}) * sqrt(${dDot("q.qe", "q.qe")})), 4) AS cos_sim
              |FROM sc e, q WHERE vec_id > 0 AND e.label <> q.ql
              |ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin),
      "hard-negative mining: top-k cross-label cosine neighbors of an anchor (north-star: contrastive training data)"),

    // ANN recall report — the index-quality EVALUATION op a pipeline
    // runs before trusting an approximate index for dedup or retrieval:
    // recall@10 of the IVF (e03) and hyperplane-LSH (e04) rankings
    // against the exact brute-force top-10 (e02), all three via the
    // gates' shared bodies so the report is pinned to the same oracles.
    // The rankings are the heavy part and carry the gates' scale shapes
    // (broadcast anchors, cell/bucket-pruned scans); the report itself
    // is two joins of 10-row frames. RecallProbe (tools) runs the same
    // comparison interactively; THIS is the oracle-checked version.
    //
    // Plan shape: every top-k frame here is BOUNDED (k = 10 rows), so
    // each ranking chain is materialized ONCE into a literal
    // LocalRelation (the localModel pattern) and the report unions
    // four literal-vs-literal joins. As live subtrees the exact
    // baseline was embedded in all four method branches — one action
    // re-executed the full brute-force scan 4x plus each ANN chain
    // (measured 3.3-4.6x the twin, which CTE-shares everything).
    // The five rankings are INDEPENDENT actions, so they collect
    // concurrently — multi-threaded job submission on one session is
    // the standard Spark pattern for fan-out evaluation reports; the
    // DAGScheduler interleaves the jobs' stages across the executors,
    // so wall time is the slowest chain, not the sum of five. The
    // collects are 10 rows each at any corpus scale.
    Q("e18_recall_report",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        def lit10(top: org.apache.spark.sql.DataFrame) =
          localModel(top.select(col("vec_id")))
        val e2 = e.filter(col("embedding").isNotNull)
        import scala.concurrent.{blocking, Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        // each collect is wrapped in blocking{} so the shared fork-join
        // pool spawns compensation threads instead of degrading the
        // six-way fan-out to near-sequential on a low-core driver
        val collected = Await.result(Future.sequence(Seq(
          Future(blocking(lit10(exactTopKDf(e, 10)))),
          Future(blocking(lit10(ivfTopKDf(e, 10)))),
          Future(blocking(lit10(lshTopKDf(e, 10)))),
          Future(blocking(lit10(pqRerank(e2, pqAdcCandidates(e2), 0L, 10)))),
          Future(blocking(lit10(pqRerank(e2, pqResidualAdcCandidates(e2), 0L, 10)))),
          Future(blocking(lit10(pqRerank(e2, pq4AdcCandidates(e2), 0L, 10)))),
          Future(blocking(lit10(pqRerank(e2, opq4AdcCandidates(e2), 0L, 10)))))),
          scala.concurrent.duration.Duration.Inf)
        val Seq(exact, ivf, lsh, pq, pqres, pq4, opq4) = collected
        def row(method: String, top: org.apache.spark.sql.DataFrame) =
          top.join(exact, Seq("vec_id"))
            .agg(count(lit(1)).as("hits"))
            .select(lit(method).as("method"), col("hits"),
              floorDiv(col("hits") * lit(1000000L), lit(10L)).as("recall_ppm"))
        row("ivf", ivf)
          .unionByName(row("lsh", lsh))
          .unionByName(row("pq", pq))
          .unionByName(row("pq_res", pqres))
          .unionByName(row("pq4", pq4))
          .unionByName(row("opq4", opq4))
      },
      Some {
        val sums = (0 until 8).map(j =>
          s"  SUM(v * ((((pos - 1) * 37 + $j * 101) % 19) - 9)) AS s$j").mkString(",\n")
        val code = (0 until 8).map(j => s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
        val cos = (a: String) => s"ROUND(${dDot(a, "q0.qe")} /" +
          s" (sqrt(${dDot(a, a)}) * sqrt(${dDot("q0.qe", "q0.qe")})), 4)"
        // Report tail shape matters for the sf10 capacity protocol: a
        // UNION ALL of six UNGROUPED aggregates never prunes under an
        // outer `WHERE method=...` in DuckDB 1.0 (filter(false) over an
        // aggregate is not folded to empty), so check.py's --qsplit ran
        // every method's pipeline per part. Tagging the hit rows first
        // and grouping ONCE by method (zero-filled via the 6-row methods
        // dimension) makes the method filter push through the left join
        // and the group-by into the tagged union, where constant folding
        // drops the other five branches — each split part then plans only
        // its own method's CTE chain. Identical results either way.
        s"""WITH q0 AS MATERIALIZED (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
           |exact10 AS MATERIALIZED (
           |  SELECT vec_id FROM embeddings e, q0 WHERE vec_id > 0
           |  ORDER BY ${cos("e.embedding")} DESC, vec_id ASC LIMIT 10),
           |unnested AS (
           |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
           |         unnest(embedding::DOUBLE[]) AS v
           |  FROM embeddings),
           |sums AS (SELECT vec_id,
           |$sums
           |FROM unnested GROUP BY vec_id),
           |bkt AS MATERIALIZED (SELECT vec_id, CAST($code AS BIGINT) AS bkt FROM sums),
           |qb AS (SELECT bkt FROM bkt WHERE vec_id = 0),
           |lsh10 AS (
           |  SELECT e.vec_id FROM embeddings e JOIN bkt ON e.vec_id = bkt.vec_id, qb, q0
           |  WHERE e.vec_id > 0 AND bkt.bkt = qb.bkt
           |  ORDER BY ${cos("e.embedding")} DESC, e.vec_id ASC LIMIT 10),
           |qd AS (
           |  SELECT generate_subscripts(embedding, 1) AS pos, unnest(embedding::DOUBLE[]) AS qv
           |  FROM embeddings WHERE vec_id = 0),
           |cent AS (
           |  SELECT label, pos, AVG(v) AS c FROM (
           |    SELECT label, generate_subscripts(embedding, 1) AS pos,
           |           unnest(embedding::DOUBLE[]) AS v
           |    FROM embeddings) GROUP BY label, pos),
           |best AS (
           |  SELECT label FROM (
           |    SELECT cent.label, SUM(c * qv) AS dot
           |    FROM cent JOIN qd USING (pos) GROUP BY cent.label)
           |  ORDER BY dot DESC, label ASC LIMIT 1),
           |ivf10 AS (
           |  SELECT e.vec_id FROM embeddings e JOIN best ON e.label = best.label, q0
           |  WHERE e.vec_id > 0
           |  ORDER BY ${cos("e.embedding")} DESC, e.vec_id ASC LIMIT 10),
           |$pqPreludeSql,
           |$pqPlainCandSql,
           |$pqResidualCandSql,
           |$pq4CandSql,
           |$opqPreludeSql,
           |${pq4CandSqlOn("r", "m21", opqEligSql)},
           |pq10 AS (
           |  SELECT cand.vec_id FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id, q0
           |  ORDER BY ${cos("e.embedding")} DESC, cand.vec_id ASC LIMIT 10),
           |pqres10 AS (
           |  SELECT rcand.vec_id FROM rcand JOIN embeddings e ON e.vec_id = rcand.vec_id, q0
           |  ORDER BY ${cos("e.embedding")} DESC, rcand.vec_id ASC LIMIT 10),
           |pq410 AS (
           |  SELECT cand4.vec_id FROM cand4 JOIN embeddings e ON e.vec_id = cand4.vec_id, q0
           |  ORDER BY ${cos("e.embedding")} DESC, cand4.vec_id ASC LIMIT 10),
           |opq410 AS (
           |  SELECT cand4r.vec_id FROM cand4r JOIN embeddings e ON e.vec_id = cand4r.vec_id, q0
           |  ORDER BY ${cos("e.embedding")} DESC, cand4r.vec_id ASC LIMIT 10),
           |hitrows AS (
           |  SELECT 'ivf' AS method, vec_id FROM ivf10 JOIN exact10 USING (vec_id)
           |  UNION ALL
           |  SELECT 'lsh' AS method, vec_id FROM lsh10 JOIN exact10 USING (vec_id)
           |  UNION ALL
           |  SELECT 'pq' AS method, vec_id FROM pq10 JOIN exact10 USING (vec_id)
           |  UNION ALL
           |  SELECT 'pq_res' AS method, vec_id FROM pqres10 JOIN exact10 USING (vec_id)
           |  UNION ALL
           |  SELECT 'pq4' AS method, vec_id FROM pq410 JOIN exact10 USING (vec_id)
           |  UNION ALL
           |  SELECT 'opq4' AS method, vec_id FROM opq410 JOIN exact10 USING (vec_id)),
           |counts AS (SELECT method, CAST(COUNT(*) AS BIGINT) AS hits
           |  FROM hitrows GROUP BY method),
           |methods AS (
           |  SELECT 'ivf' AS method UNION ALL SELECT 'lsh' UNION ALL SELECT 'pq'
           |  UNION ALL SELECT 'pq_res' UNION ALL SELECT 'pq4' UNION ALL SELECT 'opq4'),
           |r AS (SELECT m.method, COALESCE(c.hits, CAST(0 AS BIGINT)) AS hits
           |  FROM methods m LEFT JOIN counts c USING (method))
           |SELECT method, hits, (hits * 1000000) // 10 AS recall_ppm FROM r""".stripMargin
      },
      "ANN recall report: recall@10 of IVF and LSH rankings vs the exact baseline (north-star: index evaluation)")
  )
}
