package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation with
  * pointer jumping — the step that turns near-dup CANDIDATE PAIRS (LSH
  * output) into dedup GROUPS (keep min doc_id per component).
  *
  * Each round: (1) every node adopts the min label among itself and its
  * neighbors (one shuffle on the edge key); (2) pointer jumping
  * (`rep := rep(rep)`) halves label-chain depth, giving O(log diameter)
  * rounds instead of O(diameter) — a 30-node path converges in ~6
  * rounds, not 29. The driver only coordinates the loop and reads a
  * scalar convergence count; all data movement is distributed (the
  * GraphX/Pregel CC shape).
  *
  * `localCheckpoint(eager)` after every round is REQUIRED, not an
  * optimization: an iterative DataFrame loop otherwise nests each
  * round's plan inside the next and the logical plan grows
  * exponentially (observed: OOM in plan stringification around round
  * 25). On a cluster with a checkpoint dir configured, prefer
  * `checkpoint()` for fault tolerance at 100 TB.
  */
object ConnectedComponents {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** @param edges two-column DataFrame (u, v), undirected interpretation.
    * @param strict throw on non-convergence instead of returning possibly
    *               wrong labels; when false, non-convergence is logged at
    *               WARN (a silent wrong answer is never acceptable —
    *               dedup on unconverged labels under-merges clusters).
    * @return (id, rep) — rep = min node id in id's component.
    */
  def components(edges: DataFrame, maxIter: Int = 25,
      strict: Boolean = false): DataFrame = {
    val e = edges.toDF("u", "v")
    val sym = e.union(e.select(col("v"), col("u"))).distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("u").as("id")).distinct()
      .withColumn("rep", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      // (1) min over self + neighbor labels — one shuffle
      val neigh = sym.alias("s")
        .join(labels.alias("l"), col("s.v") === col("l.id"))
        .groupBy(col("s.u").as("id")).agg(min(col("l.rep")).as("nrep"))
      val stepped = labels.alias("l")
        .join(neigh.alias("n"), Seq("id"), "left")
        .select(col("id"), col("l.rep").as("old"),
          least(col("l.rep"), coalesce(col("n.nrep"), col("l.rep"))).as("rep"))
      // (2) pointer jumping: rep := rep's rep
      val obs = org.apache.spark.sql.Observation()
      val jumped = stepped.alias("a")
        .join(stepped.select(col("id").as("rid"), col("rep").as("rrep")).alias("b"),
          col("a.rep") === col("b.rid"), "left")
        .select(col("a.id").as("id"), col("a.old").as("old"),
          coalesce(col("b.rrep"), col("a.rep")).as("rep"))
        // convergence count rides the checkpoint job as an observed
        // metric — one job per round, not two (the separate count()
        // re-launched a job per round; at cluster scale that is a full
        // extra scheduling round-trip per iteration)
        .observe(obs, coalesce(sum(when(col("rep") =!= col("old"), 1L)
          .otherwise(0L)), lit(0L)).as("changed"))
        .localCheckpoint(true)
      changed = obs.get("changed").asInstanceOf[Number].longValue
      labels = jumped.select(col("id"), col("rep"))
      i += 1
    }
    if (changed > 0) {
      val msg = s"ConnectedComponents did NOT converge after $maxIter " +
        s"rounds ($changed labels still changing) — returned components " +
        "may be under-merged. Raise maxIter (rounds needed ~ log2(graph " +
        "diameter))."
      if (strict) throw new IllegalStateException(msg)
      log.warn(msg)
    }
    labels
  }
}
