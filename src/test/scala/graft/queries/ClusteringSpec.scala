package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantic checks for d18 (TF-IDF) and e08 (k-means Lloyd step) on
  * crafted inputs with hand-computed expectations. */
class ClusteringSpec extends SparkSpec {

  test("d18: tf-idf values and top-3 ranks match hand computation") {
    val dir = Files.createTempDirectory("graft-tfidf").toString
    import spark.implicits._
    Seq(
      (1L, "apple apple banana", "en", "s", 18L),
      (2L, "banana cherry", "en", "s", 13L),
      (3L, "cherry apple dates", "en", "s", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = Registry.queries("d18_tfidf")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    // N=3; df: apple 2, banana 2, cherry 2, dates 1
    val ln15 = math.log(3.0 / 2.0)
    val ln3 = math.log(3.0)
    assert(out((1L, "apple")) === ((BigDecimal(2 * ln15).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, 1L)))
    assert(out((1L, "banana"))._2 === 2L)
    // doc 3: dates (ln 3 ~ 1.0986) outranks apple/cherry (ln 1.5 ~ 0.4055)
    assert(out((3L, "dates")) === ((BigDecimal(ln3).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, 1L)))
    assert(out.keys.count(_._1 == 1L) === 2) // doc 1 has only 2 distinct terms
  }

  test("e08: reassignment, membership counts, and centroid update match hand computation") {
    val dir = Files.createTempDirectory("graft-kmeans").toString
    import spark.implicits._
    // label-0 seeds near the origin, label-1 seeds near (1,1); vec 5 is
    // LABELED 0 but sits next to cluster 1 and must flip.
    Seq(
      (1L, Seq(0.0f, 0.0f), 0),
      (2L, Seq(0.2f, 0.0f), 0),
      (3L, Seq(1.0f, 1.0f), 1),
      (4L, Seq(0.8f, 1.0f), 1),
      (5L, Seq(0.9f, 1.1f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val rows = Registry.queries("e08_kmeans_step")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    // cluster 0 keeps vecs 1,2; cluster 1 gains vec 5
    assert(rows((0L, 1L))._2 === 2L && rows((1L, 1L))._2 === 3L)
    assert(rows((0L, 1L))._1 === 0.1)        // (0 + 0.2) / 2
    assert(rows((0L, 2L))._1 === 0.0)
    assert(rows((1L, 1L))._1 === 0.9)        // (1 + 0.8 + 0.9) / 3
    assert(rows((1L, 2L))._1 === BigDecimal((1.0 + 1.0 + 1.1f.toDouble) / 3)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("e13: int8 codes, ADC ranking, and exact re-rank match hand computation") {
    val dir = Files.createTempDirectory("graft-sq").toString
    import spark.implicits._
    // per-dim micro ranges: pos0 lo=0 hi=1e6, pos1 lo=0 hi=1e6
    // codes (0..255): q=[255,0]; v1=[255,0]; v2=[0,255]; v3=[128,128]
    // (0.5 → 127.5 rounds HALF-AWAY to 128 — the boundary the spec pins)
    Seq(
      (0L, Seq(1.0f, 0.0f), 0),
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(0.0f, 1.0f), 0),
      (3L, Seq(0.5f, 0.5f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val rows = Registry.queries("e13_sq_ann")(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 3L, 2L)) // cos order
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(1) === 255L * 255L)
    assert(byId(3L).getLong(1) === 128L * 255L)
    assert(byId(2L).getLong(1) === 0L)
    assert(byId(1L).getDouble(2) === 1.0)
    assert(byId(3L).getDouble(2) === 0.7071)
    assert(byId(2L).getDouble(2) === 0.0)
  }

  test("e08: broadcast-model argmin assignment equals the long-format argmin") {
    val dir = "/root/testdata/sf0.001"
    val e = Registry.t(spark, dir, "embeddings")
    // reference: long-format explode + join + window argmin on the SAME
    // seed model (squared euclidean distance — argmin-equivalent to the
    // query's c·c − 2·e·c score)
    import spark.implicits._
    val model = Sim.kmeansSeedModel(spark, dir)
    val cent = model.flatMap { case (l, arr) =>
      arr.zipWithIndex.map { case (c, pos) => (l, pos, c.toDouble) }
    }.toDF("label", "pos", "c")
    val ev = e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "vf")))
      .withColumn("v", col("vf").cast("double"))
    val dist = ev.join(cent, Seq("pos"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum((col("v") - col("c")) * (col("v") - col("c"))).as("d"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("d").asc, col("label").asc)
    val ref = dist.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(col("label")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    val got = Registry.queries("e08_kmeans_step")(spark, dir)
      .filter(col("pos") === 1)
      .select(col("cluster"), col("n_members"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === ref, s"argmin assignment diverges from long-format argmin: $got vs $ref")
  }

  test("e08: codegen'd KMeansArgMin is bit-identical to the builtin HOF fold") {
    val dir = "/root/testdata/sf0.001"
    val e = Registry.t(spark, dir, "embeddings").filter(col("embedding").isNotNull)
    val model = Sim.kmeansSeedModel(spark, dir)
    // the pre-round-7 formulation: interpreted aggregate() fold over a
    // model literal, same visit order / score / strict-< tie rule
    val centLit = array(model.map { case (l, arr) =>
      val cc = arr.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
      struct(lit(l).as("cl"), array(arr.map(lit(_)): _*).as("c"), lit(cc).as("cc")) }: _*)
    val init = struct(lit(Double.PositiveInfinity).as("s"), lit(Int.MaxValue).as("cl"))
    val hof = aggregate(centLit, init, (acc, ct) => {
      val sc = ct.getField("cc") - lit(2.0) *
        graft.functions.VectorExprs.vecDot(col("embedding"), ct.getField("c"))
      when(sc < acc.getField("s"),
        struct(sc.as("s"), ct.getField("cl").as("cl"))).otherwise(acc)
    })
    val diff = e.select(col("vec_id"),
        graft.functions.KMeansExprs.assignCluster(col("embedding"), model).as("fast"),
        hof.getField("cl").as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() === 0, "codegen argmin diverges from HOF fold")
  }

  test("e09: fused KMeansAssign (cluster, score) is bit-identical to argmin + per-label score") {
    val dir = "/root/testdata/sf0.001"
    val e = Registry.t(spark, dir, "embeddings").filter(col("embedding").isNotNull)
    val model = Sim.kmeansSeedModel(spark, dir)
    // the pre-round-13 e09 shape: argmin expression, then the score
    // re-derived via a per-label conditional over the model literal
    val score = model.foldLeft(lit(Double.PositiveInfinity)) { case (acc, (l, arr)) =>
      val cc = arr.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
      when(col("cluster") === l, lit(cc) - lit(2.0) *
        graft.functions.VectorExprs.vecDot(col("embedding"), array(arr.map(lit(_)): _*)))
        .otherwise(acc)
    }
    val ref = e.select(col("vec_id"),
        graft.functions.KMeansExprs.assignCluster(col("embedding"), model).as("cluster"),
        col("embedding"))
      .filter(col("cluster").isNotNull)
      .withColumn("score", score)
      .select(col("vec_id"), col("cluster"), col("score"))
    val fused = e.select(col("vec_id"),
        graft.functions.KMeansExprs.assignWithScore(col("embedding"), model).as("as"))
      .filter(col("as").isNotNull)
      .select(col("vec_id"), col("as.cluster").as("cluster"), col("as.score").as("score"))
    assert(ref.exceptAll(fused).count() === 0 && fused.exceptAll(ref).count() === 0,
      "fused assign+score diverges from the two-expression shape")
  }

  test("e09: per-cluster quota keeps the most-central vectors, score-ordered") {
    val dir = Files.createTempDirectory("graft-clsample").toString
    import spark.implicits._
    Seq(
      (1L, Seq(0.0f, 0.0f), 0),
      (2L, Seq(0.2f, 0.0f), 0),
      (3L, Seq(1.0f, 1.0f), 1),
      (4L, Seq(0.8f, 1.0f), 1),
      (5L, Seq(0.9f, 1.1f), 0))  // joins cluster 1 despite its label
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val rows = Registry.queries("e09_cluster_sample")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap
    // cluster 0 = {1,2}: v2 is nearer its centroid (0.1, 0.18) than v1
    assert(rows((0L, 1L)) === 2L && rows((0L, 2L)) === 1L)
    // cluster 1 = {3,4,5}: v5 sits closest to the (0.9, 1.0) seed
    assert(rows((1L, 1L)) === 5L && rows((1L, 2L)) === 3L && rows((1L, 3L)) === 4L)
    assert(rows.size === 5)
  }

  test("kmeansIterate: converges exactly on separated clusters; model is the fixed point") {
    val dir = Files.createTempDirectory("graft-kfit").toString
    import spark.implicits._
    Seq(
      (1L, Seq(0.0f, 0.0f), 0),
      (2L, Seq(0.2f, 0.0f), 0),
      (3L, Seq(1.0f, 1.0f), 1),
      (4L, Seq(0.8f, 1.0f), 1),
      (5L, Seq(0.9f, 1.1f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val (model, iters) = Sim.kmeansIterate(spark, dir, maxIters = 10)
    // 6-dp quantization makes convergence exact, so the detector stops
    // early: one moving iteration + one fixed-point confirmation
    assert(iters === 2, s"expected exact convergence in 2 iterations, took $iters")
    val m = model.toMap
    assert(m(0).toSeq === Seq(0.1f, 0.0f))
    assert(m(1).toSeq === Seq(0.9f, 1.033333f))
  }

  test("e10: semantic dup groups collapse to min-id reps; singletons and null vectors survive") {
    val dir = Files.createTempDirectory("graft-semdedup").toString
    import spark.implicits._
    Seq(
      (1L, Option(Seq(1.0f, 0.0f)), 0),   // dup pair A
      (2L, Option(Seq(1.0f, 0.0f)), 0),
      (3L, Option(Seq(0.0f, 1.0f)), 1),   // dup pair B (orthogonal to A)
      (4L, Option(Seq(0.0f, 1.0f)), 1),
      (5L, Option(Seq(-1.0f, 0.0f)), 0),  // anti-parallel: cos -1 to A, 0 to B
      (6L, Option.empty[Seq[Float]], 0))  // null embedding: own cluster
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val reps = Registry.queries("e10_semdedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 5L, 6L -> 6L))
  }

  test("e08: result is invariant to shuffle-partition layout") {
    val dir = "/root/testdata/sf0.001"
    def run(): Map[(Long, Long), (Double, Long)] =
      Registry.queries("e08_kmeans_step")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    // restore the ACTUAL session value, not an assumed one — the shared
    // session runs specs at whatever SparkSpec configured, and leaking a
    // different parallelism changes every test that runs after
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    val base = run()
    for (parts <- Seq(3, 7)) {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try assert(run() === base, s"e08 output changed at shuffle.partitions=$parts")
      finally spark.conf.set("spark.sql.shuffle.partitions", saved)
    }
  }

  test("unscoreable vectors (null element / null embedding) are excluded from assignment") {
    val dir = Files.createTempDirectory("graft-nullvec").toString
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true), nullable = true),
      StructField("label", IntegerType, nullable = false)))
    val rows = Seq(
      Row(1L, Seq(0.0f, 0.0f), 0),
      Row(2L, Seq(1.0f, 1.0f), 1),
      Row(3L, Seq(0.5f, null), 0), // null ELEMENT: no centroid can score it
      Row(4L, null, 1))            // null embedding
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val model = Sim.kmeansSeedModel(spark, dir)
    // direct expression semantics: NULL, not a sentinel label
    val assigned = Registry.t(spark, dir, "embeddings")
      .select(col("vec_id"),
        graft.functions.KMeansExprs.assignCluster(col("embedding"), model).as("cl"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(assigned(1L).isDefined && assigned(2L).isDefined)
    assert(assigned(3L).isEmpty, "null-element vector must assign NULL")
    assert(assigned(4L).isEmpty, "null-embedding vector must assign NULL")
    // e08: vec 3's non-null element (0.5) must reach NO cluster's update
    // (the seed model still sees it — seeds skip null elements only)
    val e08 = Registry.queries("e08_kmeans_step")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(e08((0L, 1L)) === ((0.0, 1L)), "cluster 0 update must contain only vec 1")
    assert(e08((0L, 2L)) === ((0.0, 1L)))
    assert(e08((1L, 1L)) === ((1.0, 1L)), "cluster 1 update must contain only vec 2")
    // e09: unscoreable vectors never appear in the sample
    val e09ids = Registry.queries("e09_cluster_sample")(spark, dir)
      .collect().map(_.getLong(1)).toSet
    assert(e09ids === Set(1L, 2L))
  }

  test("e15: PQ codes, integer ADC, and re-rank match hand computation") {
    val dir = Files.createTempDirectory("graft-pq").toString
    import spark.implicits._
    // dim 2 < 8 → one subspace: PQ degenerates to plain vector
    // quantization, small enough to hand-compute exactly.
    Seq(
      (0L, Seq(1.0f, 0.0f), 0),   // query
      (1L, Seq(1.0f, 0.2f), 0),
      (2L, Seq(0.0f, 1.0f), 1),
      (3L, Seq(0.2f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    // codebook: c0 = mean(v0, v1) = (1.0, 0.1); c1 = mean(v2, v3) = (0.1, 1.0)
    // codes: v1 → c0 (d2 = 1e10), v2/v3 → c1 (d2 = 1e10 each)
    // query distance table: d(q, c0) = 0 + (1e5)² = 1e10
    //                       d(q, c1) = (9e5)² + (1e6)² = 1.81e12
    val out = Registry.queries("e15_pq_ann")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSeq === Seq(1L, 3L, 2L)) // cosine re-rank order
    val adc = out.toMap
    assert(adc(1L)._1 === 10000000000L)
    assert(adc(2L)._1 === 1810000000000L && adc(3L)._1 === 1810000000000L)
    assert(adc(1L)._2 === BigDecimal(1.0 / math.sqrt(1.04))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(adc(2L)._2 === 0.0)
  }

  test("ivfPqSearch: nprobe=K equals the e15 gate; nprobe=1 candidates stay in probed cells") {
    val dir = "/root/testdata/sf0.001"
    // all cells probed -> no pruning -> the production path must equal
    // the oracle-checked gate row for row
    val full = Sim.ivfPqSearch(spark, dir, nprobe = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val gate = Registry.queries("e15_pq_ann")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(full === gate, "ivfPqSearch(nprobe=K) must equal the e15 gate")
    // nprobe=1: every result must live in the query's own cell
    val (model, _) = Sim.kmeansIterate(spark, dir, 3)
    val cells = Registry.t(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        graft.functions.KMeansExprs.assignCluster(col("embedding"), model).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val one = Sim.ivfPqSearch(spark, dir, nprobe = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(one.nonEmpty)
    one.foreach { id =>
      assert(cells(id) === cells(0L),
        s"nprobe=1 returned vec $id from cell ${cells(id)}, query cell is ${cells(0L)}")
    }
  }

  test("semanticDecontamKeepDf: more planes refine the kept set monotonically; exact copies die at any geometry") {
    val e = Registry.t(spark, "/root/testdata/sf0.001", "embeddings")
    val tgt = e.filter(col("vec_id") % 10 =!= 0)
    val ref = e.filter(col("vec_id") % 10 === 0)
    def kept(p: Int) = Sim.semanticDecontamKeepDf(tgt, ref, planes = p)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val k8 = kept(8); val k12 = kept(12); val k16 = kept(16)
    // finer buckets -> fewer collisions -> fewer drops: kept sets refine upward
    assert(k8.subsetOf(k12), s"planes=12 dropped ${k8.diff(k12).size} docs planes=8 kept")
    assert(k12.subsetOf(k16))
    // an exact copy of a reference vector shares EVERY plane sign, so it
    // dies at any plane count: check via a crafted duplicate
    import spark.implicits._
    val refRow = ref.select("embedding").limit(1)
      .collect().head.getSeq[Float](0)
    val copy = Seq((999999L, refRow)).toDF("vec_id", "embedding")
    Seq(8, 16).foreach { p =>
      assert(Sim.semanticDecontamKeepDf(copy, ref, planes = p).count() === 0L,
        s"exact reference copy survived at planes=$p")
    }
  }

  test("e14: exact copies of reference vectors are dropped; orthogonal/opposite targets survive") {
    val dir = Files.createTempDirectory("graft-semdecon").toString
    import spark.implicits._
    Seq(
      (0L, Seq(1.0f, 0.0f), 0),   // reference (vec_id % 10 == 0)
      (10L, Seq(0.0f, 1.0f), 0),  // reference
      (1L, Seq(1.0f, 0.0f), 1),   // identical to ref 0: same bucket, cos 1.0 → dropped
      (2L, Seq(0.0f, 1.0f), 1),   // identical to ref 10 → dropped
      (3L, Seq(-1.0f, 0.0f), 1),  // cos -1 / 0 vs refs → kept
      (4L, Seq(0.0f, -1.0f), 1))  // cos 0 / -1 vs refs → kept
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val out = Registry.queries("e14_semantic_decontam")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet === Set(3L, 4L), s"kept set wrong: ${out.keySet}")
    assert(out(3L) === 1L && out(4L) === 1L) // labels ride through
    // determinism: a second run selects the identical set
    val again = Registry.queries("e14_semantic_decontam")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(again === Set(3L, 4L))
  }
  test("e18 recall report: hits bounded by k, members of the exact top-10") {
    val dir = "/root/testdata/sf0.001"
    val rows = Registry.queries("e18_recall_report")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet === Set("ivf", "lsh", "pq", "pq_res", "pq4", "opq4"))
    rows.foreach { case (m, (hits, ppm)) =>
      assert(hits >= 0L && hits <= 10L, s"$m hits out of range: $hits")
      assert(ppm === hits * 100000L, s"$m recall_ppm must be hits/10 in ppm")
    }
    // hits really are intersections with the exact ranking: recompute
    // from the shared bodies the report is built on
    val e = Registry.t(spark, dir, "embeddings")
    val exact = Sim.exactTopKDf(e, 10).collect().map(_.getLong(0)).toSet
    val lsh = Sim.lshTopKDf(e, 10).collect().map(_.getLong(0)).toSet
    assert(rows("lsh")._1 === (lsh & exact).size.toLong)
  }

  test("e19 residual PQ: recall@10 at least plain PQ's (both SFs), candidates ADC-consistent") {
    // residuals concentrate near zero, so the same code budget
    // quantizes a tighter distribution — the refinement must not LOSE
    // recall vs e15's global-codebook PQ on either fixture
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = Registry.queries("e18_recall_report")(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows("pq_res") >= rows("pq"),
        s"$dir: residual PQ recall ${rows("pq_res")} < plain PQ ${rows("pq")}")
    }
    // candidate contract: ADC is nonnegative and the top-20 cut is
    // (adc asc, vec_id asc)-sorted — the index's ranking invariant
    val e = Registry.t(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(org.apache.spark.sql.functions.col("embedding").isNotNull)
    val cand = Sim.pqResidualAdcCandidates(e)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cand.nonEmpty && cand.length <= 20)
    assert(cand.forall(_._2 >= 0L), "squared integer ADC must be nonnegative")
    assert(cand.sortBy { case (id, adc) => (adc, id) }.toSeq === cand.toSeq,
      "candidates must come out (adc, vec_id)-ordered")
  }

  test("e20 4-bit PQ: recall@10 at least plain PQ's at HALF the code bytes (both SFs)") {
    // 16 TRAINED codewords per subspace must beat ~10 label-mean
    // codewords even though the stored code table is half the size
    // (two nibble codes per byte vs e15's byte per subspace) — the
    // whole point of the low-bit training step
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = Registry.queries("e18_recall_report")(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows("pq4") >= rows("pq"),
        s"$dir: 4-bit PQ recall ${rows("pq4")} < plain PQ ${rows("pq")}")
    }
    val e = Registry.t(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(org.apache.spark.sql.functions.col("embedding").isNotNull)
    // the packed table IS half the footprint: 4 bytes (+1 mask) per
    // 64-dim vector vs e15's 8 code rows — and the mask-guarded unpack
    // must reproduce the pre-pack codes exactly
    val (_, packed) = Sim.pq4Model(e)
    val pk = packed.collect()
    assert(pk.nonEmpty && pk.forall(_.getLong(1) < 4),
      "64 dims -> 8 subspaces -> 4 packed bytes per full vector")
    assert(pk.forall { r =>
      val p = r.getLong(2); p >= 0 && p <= 255
    }, "each packed value must fit one byte")
    val cand = Sim.pq4AdcCandidates(e)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cand.nonEmpty && cand.length <= 20)
    assert(cand.forall(_._2 >= 0L))
    assert(cand.sortBy { case (id, adc) => (adc, id) }.toSeq === cand.toSeq)
  }

  test("e21 OPQ-lite 4-bit PQ: recall@10 at least pq4's (both SFs), candidates ADC-consistent") {
    // the seeded Walsh-Hadamard rotation must not LOSE recall vs the
    // unrotated 4-bit chain on the pinned fixtures (the e18 report
    // carries both; measured opq4/pq4 = 4/3 at sf0.001, 7/5 at sf0.01
    // with the 0x9E3779B9 sign seed — thresholds are the e20 values,
    // not slack)
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = Registry.queries("e18_recall_report")(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows("opq4") >= rows("pq4"),
        s"$dir: OPQ-lite recall ${rows("opq4")} < plain 4-bit ${rows("pq4")}")
    }
    val e = Registry.t(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(org.apache.spark.sql.functions.col("embedding").isNotNull)
    val cand = Sim.opq4AdcCandidates(e)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cand.nonEmpty && cand.length <= 20)
    assert(cand.forall(_._2 >= 0L))
    assert(cand.sortBy { case (id, adc) => (adc, id) }.toSeq === cand.toSeq)
  }
}
