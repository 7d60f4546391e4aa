package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs.cosineFast

/** Independent verification for the battery rows whose DuckDB oracle
  * DNFs at large SF (d12/d13/e10: recursive-CTE closure; e06: 300 s
  * cap). "Independent" means a different formulation of the same
  * contract, computed in Spark against the parquet the battery DUMPED
  * (`graft.Verify` output), so a wrong dump cannot verify itself:
  *
  *   - e06: the dumped top-3 rows for a seeded sample of query vectors
  *     must EXACTLY equal brute force restricted to the query's bucket
  *     (the bucketed-KNN contract), plus a recall floor vs unrestricted
  *     brute-force truth — promoted from the RecallProbe diagnostic to
  *     a pass/fail.
  *   - d12 / e10: the dumped (id, rep) clustering must equal the
  *     fixpoint of relational min-label propagation over the same edge
  *     list — an O(diameter)-round formulation sharing NO code with the
  *     pointer-jumping ConnectedComponents operator — plus rep validity
  *     (every edge in-cluster, reps are fixed points, rep ≤ member).
  *   - d13: survivor containment (output ⊆ the independently recomputed
  *     stage-1 gate ∩ exact-dedup keep set, benchmark rows excluded),
  *     n_tokens exactness, and stage monotonicity of the counts.
  *
  * Usage: ScaleCheck <sfDir> <verifyOutDir> <outJson> [sampleN]
  * Exits 1 if any check fails; writes a JSON verdict per check.
  */
object ScaleCheck {

  private def labelPropagate(edges: DataFrame, maxIter: Int = 40): (DataFrame, Boolean) = {
    val spark = edges.sparkSession
    val sym = edges.toDF("u", "v")
      .union(edges.toDF("u", "v").select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(true)
    var labels = sym.select(col("u").as("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint(true)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val nbrMin = sym.join(labels, sym("u") === labels("id"))
        .groupBy(sym("v").as("nid")).agg(min(col("lbl")).as("nmin"))
      val next = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(col("id"), least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("lbl", "prev"), Seq("id"))
        .filter(col("lbl") =!= col("prev")).count()
      labels = next
      converged = changed == 0
      it += 1
    }
    (labels, converged)
  }

  /** Dumped clustering (id, rep) vs label-propagation fixpoint over the
    * same edges; plus rep validity. Returns (ok, detail). */
  private def checkClustering(name: String, dumped: DataFrame, edges: DataFrame,
      allIds: DataFrame): (Boolean, String) = {
    val d = dumped.toDF("id", "rep")
    val (labels, converged) = labelPropagate(edges)
    if (!converged) return (false, s"$name: label propagation did not converge")
    // full map: vertices not in any edge map to themselves
    val expect = allIds.toDF("id")
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("rep"))
    val nDiff = d.join(expect.withColumnRenamed("rep", "erep"), Seq("id"))
      .filter(col("rep") =!= col("erep")).count()
    val nMissing = allIds.toDF("id").join(d, Seq("id"), "left_anti").count()
    // validity: every edge stays in-cluster; reps are fixed points; min-rep
    val repOf = d
    val badEdge = edges.toDF("u", "v")
      .join(repOf.toDF("u", "ru"), Seq("u"))
      .join(repOf.toDF("v", "rv"), Seq("v"))
      .filter(col("ru") =!= col("rv")).count()
    val badFix = d.join(d.toDF("rep", "rr"), Seq("rep")).filter(col("rr") =!= col("rep")).count()
    val badMin = d.filter(col("rep") > col("id")).count()
    val ok = nDiff == 0 && nMissing == 0 && badEdge == 0 && badFix == 0 && badMin == 0
    (ok, s"$name: diff_vs_labelprop=$nDiff missing=$nMissing cross_cluster_edges=$badEdge " +
      s"non_fixed_reps=$badFix rep_gt_id=$badMin converged=$converged")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val outJson = args(2)
    val sampleN = if (args.length > 3) args(3).toInt else 300
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = scala.collection.mutable.LinkedHashMap[String, (Boolean, String)]()

    // ---- e06: in-bucket exactness on a seeded sample + recall floor ----
    {
      val e = queries.Registry.t(spark, sfDir, "embeddings")
        .withColumn("bkt", functions.PlaneBucketExpr.planeBucketCode(col("embedding")))
      // seeded deterministic sample (same rule as RecallProbe)
      val ids = e.select(col("vec_id")).orderBy(xxhash64(col("vec_id")))
        .limit(sampleN).collect().map(_.getLong(0))
      val q = e.filter(col("vec_id").isin(ids: _*))
        .select(col("vec_id").as("qid"), col("bkt").as("qbkt"), col("embedding").as("qe"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("nbr_id").asc)
      val expect = e.join(broadcast(q), col("bkt") === col("qbkt"))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("cos_sim", round(cosineFast(col("embedding"), col("qe")), 4))
        .select(col("qid"), col("vec_id").as("nbr_id"), col("cos_sim"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("qid").as("vec_id"), col("nbr_id"), col("cos_sim"), col("rk"))
      val dumped = spark.read.parquet(s"$outDir/e06_knn_join")
        .filter(col("vec_id").isin(ids: _*))
      val nd = dumped.count()
      val ne = expect.count()
      val nJoin = dumped.join(expect, Seq("vec_id", "nbr_id", "cos_sim", "rk")).count()
      val exact = nd == ne && nJoin == nd
      // recall floor vs UNRESTRICTED brute force (diagnostic promoted to
      // a gate: collapse to ~0 would mean the bucketing broke)
      val wt = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("vec_id").asc)
      val truth = e.crossJoin(broadcast(q.select(col("qid"), col("qe"))))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("cos_sim", round(cosineFast(col("embedding"), col("qe")), 4))
        .withColumn("rk", row_number().over(wt))
        .filter(col("rk") <= 3)
        .select(col("qid").as("vec_id"), col("vec_id").as("nbr_id"))
      val truthN = truth.count()
      val hit = truth.join(dumped.select(col("vec_id"), col("nbr_id")),
        Seq("vec_id", "nbr_id"), "left_semi").count()
      val recall = hit.toDouble / truthN
      val ok = exact && recall >= 0.02
      results("e06_knn_join") = (ok,
        s"in-bucket exact: dumped=$nd expect=$ne matched=$nJoin; recall@3=$recall (floor 0.02)")
    }

    // ---- d12: clustering vs independent label propagation ----
    {
      val dumped = spark.read.parquet(s"$outDir/d12_dedup_clusters")
        .select(col("doc_id"), col("cluster_rep"))
      val edges = queries.Docs.d12Edges(spark, sfDir)
      val allIds = queries.Registry.t(spark, sfDir, "documents").select(col("doc_id"))
      results("d12_dedup_clusters") = checkClustering("d12", dumped, edges, allIds)
    }

    // ---- e10: semdedup clustering vs independent label propagation ----
    {
      val dumped = spark.read.parquet(s"$outDir/e10_semdedup")
        .select(col("vec_id"), col("cluster_rep"))
      val e = queries.Registry.t(spark, sfDir, "embeddings")
        .withColumn("bkt", functions.PlaneBucketExpr.planeBucketCode(col("embedding")))
      val a = e.select(col("bkt"), col("vec_id").as("u"), col("embedding").as("ea"))
      val b = e.select(col("bkt"), col("vec_id").as("v"), col("embedding").as("eb"))
      val edges = a.join(b, Seq("bkt"))
        .filter(col("u") < col("v"))
        .filter(round(cosineFast(col("ea"), col("eb")), 4) >= 0.2)
        .select(col("u"), col("v"))
      val allIds = e.select(col("vec_id"))
      results("e10_semdedup") = checkClustering("e10", dumped, edges, allIds)
    }

    // ---- d13: survivor containment + n_tokens exactness + monotonicity ----
    {
      val dumped = spark.read.parquet(s"$outDir/d13_corpus_clean")
      val docs = queries.Registry.t(spark, sfDir, "documents")
        .withColumn("ws", split(graft.functions.ColFns.normWs(col("text")), " "))
      def cnt(ws: Seq[String]) = size(filter(col("ws"), x => x.isin(ws: _*))).cast("long")
      val nTok = size(col("ws")).cast("long")
      val dupFrac = lit(1.0) -
        size(array_distinct(col("ws"))).cast("double") / nTok.cast("double")
      val gated = docs.withColumn("n_tokens", nTok)
        .filter(cnt(Seq("the", "a")) >= cnt(Seq("data", "spark", "stream")) &&
          cnt(Seq("the", "a")) >= cnt(Seq("join", "merge", "hash")) &&
          col("n_tokens") >= 10 && dupFrac <= 0.6)
      val keep = gated.select(md5(col("text").cast("binary")).as("_h"), col("doc_id"))
        .groupBy(col("_h")).agg(min(col("doc_id")).as("doc_id"))
      val nInput = docs.count()
      val nGated = gated.count()
      val nKeep = keep.count()
      val nOut = dumped.count()
      // containment: every survivor is a gated, exact-dedup-kept,
      // non-benchmark doc with the exact token count
      val outsideKeep = dumped.select(col("doc_id"))
        .join(keep.select(col("doc_id")), Seq("doc_id"), "left_anti").count()
      val benchRows = dumped.filter(col("doc_id") % 20 === 0).count()
      val badTok = dumped.join(gated.select(col("doc_id"), col("n_tokens").as("et")), Seq("doc_id"))
        .filter(col("n_tokens") =!= col("et")).count()
      val mono = nInput >= nGated && nGated >= nKeep && nKeep >= nOut
      val ok = outsideKeep == 0 && benchRows == 0 && badTok == 0 && mono && nOut > 0
      results("d13_corpus_clean") = (ok,
        s"input=$nInput gated=$nGated exact_keep=$nKeep survivors=$nOut " +
          s"outside_keep=$outsideKeep bench_rows=$benchRows bad_n_tokens=$badTok monotone=$mono")
    }

    val json = results.map { case (k, (ok, detail)) =>
      s"""  "$k": {"pass": $ok, "detail": "${detail.replace("\"", "'")}"}"""
    }.mkString("{\n", ",\n", "\n}")
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    results.foreach { case (k, (ok, detail)) =>
      println(s"${if (ok) "PASS" else "FAIL"} $k — $detail")
    }
    spark.stop()
    if (results.values.exists(!_._1)) sys.exit(1)
  }
}
