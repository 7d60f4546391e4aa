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
  /** @param dedupeEdges skip the symmetrize-distinct when the caller
    *        guarantees distinct input edges (e.g. LSH star edges, which
    *        end in their own distinct): every downstream use is a
    *        min-aggregation, so duplicate edges are harmless to the
    *        RESULT — the flag only trades one up-front shuffle of the
    *        biggest intermediate against re-joining duplicates each
    *        round. Keep true for edge lists of unknown provenance.
    * @param localThreshold when the symmetrized edge list has at most
    *        this many rows (and Long node ids), run a linear-time
    *        union-find in ONE executor task instead of the iterative
    *        loop. After LSH star reduction the edge count is bounded by
    *        the number of near-duplicate docs, which is often orders of
    *        magnitude below the corpus size — and each distributed round
    *        costs several shuffles plus a driver barrier, so below the
    *        threshold one task is strictly faster. Default 4M edges:
    *        ~64 MB for the edge pairs in flight plus ≤256 MB for the
    *        primitive open-addressing parent map at the worst-case 8M
    *        distinct nodes (16 B/slot at ≤50% load, flat long arrays —
    *        no boxed-entry overhead); pass 0 to force the distributed
    *        loop. The 100 TB path (billions of edges) still takes the
    *        O(log diameter) pointer-jumping loop.
    */
  def components(edges: DataFrame, maxIter: Int = 25,
      strict: Boolean = false, dedupeEdges: Boolean = true,
      localThreshold: Long = 4L << 20): DataFrame = {
    // Symmetrize in ONE pass: each edge row explodes to both
    // directions, so the upstream pipeline (for LSH star edges:
    // signatures + banding + bucket join) evaluates exactly once and
    // straight into the symmetrized checkpoint — a union of two
    // references to the edge frame would either evaluate that pipeline
    // per branch (measured ~2x the d12 construction cost) or need its
    // own eager checkpoint first (one extra materialization job per CC
    // call, the pre-round-12 shape).
    val sym = (if (dedupeEdges) symmetrize(edges).distinct()
               else symmetrize(edges))
      .localCheckpoint(true)
    // Leaked intermediates are not hygiene at scale: at sf10, e10's
    // edge list alone is ~10⁸ symmetrized rows, and a 75-query battery
    // that never frees superseded checkpoint blocks starved hash
    // aggregation of execution memory (AGGREGATE_OUT_OF_MEMORY) three
    // queries later — every round below frees its predecessor.
    val allLong = sym.schema.fields
      .forall(_.dataType == org.apache.spark.sql.types.LongType)
    // count() on the eager checkpoint is a cached-metadata scan, not a
    // recompute — cheap enough to gate on.
    if (allLong && sym.count() <= localThreshold) {
      // materialize the union-find ONCE, then the edges are dead weight
      val r = componentsLocal(sym).localCheckpoint(true)
      freeBlocks(sym)
      return r
    }
    // Fused round 0: initializing rep to min(id, min neighbor) is
    // exactly the first propagation step, for ONE shuffle (groupBy) and
    // no join — one fewer full loop round on typical LSH star graphs.
    var labels = sym.groupBy(col("u").as("id"))
      .agg(least(min(col("v")), col("u")).as("rep"))
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
      // the new round's eager checkpoint supersedes the previous one
      freeBlocks(labels)
      labels = jumped.select(col("id"), col("rep"))
      i += 1
    }
    freeBlocks(sym)
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

  /** Both directions of every edge from one scan of the edge frame —
    * a generator, not a self-union, so the (possibly expensive)
    * upstream plan appears exactly once in the logical tree. */
  private def symmetrize(edges: DataFrame): DataFrame =
    edges.toDF("u", "v")
      .select(explode(array(
        struct(col("u"), col("v")),
        struct(col("v").as("u"), col("u").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))

  /** Unpersist every persisted ancestor in `df`'s RDD lineage — the
    * eager-checkpoint blocks a later stage has superseded. Public Spark
    * API only; post-checkpoint lineages are shallow so the walk is
    * O(few nodes). Blocks belonging to the RETURNED frame are never
    * passed here, so consumers stay valid. */
  private def freeBlocks(df: DataFrame): Unit = {
    def walk(r: org.apache.spark.rdd.RDD[_]): Unit = {
      if (r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
        r.unpersist(blocking = false)
      r.dependencies.foreach(d => walk(d.rdd))
    }
    walk(df.rdd)
  }

  /** Single-task union-find over a symmetrized edge list that fits one
    * executor task. Path-compressed, union-by-min (the root of every
    * tree is the min id of its set by induction, so `rep` matches the
    * distributed loop's min-label semantics exactly). Runs on an
    * executor via mapPartitions — the driver never sees the edges.
    */
  private def componentsLocal(sym: DataFrame): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    sym.as[(Long, Long)].coalesce(1).mapPartitions { it =>
      // Primitive open-addressing long→long map, not a boxed HashMap:
      // at the 4M-edge threshold (up to ~8M nodes) boxed entries cost
      // several hundred MB in one task; two flat long arrays cost
      // 16 B/slot (~256 MB only at full 8M nodes ×50% load, typically
      // far less) with zero per-entry object headers or GC pressure.
      val parent = new LongLongMap(1 << 16)
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent.put(c, r); c = n }
        r
      }
      it.foreach { case (u, v) =>
        parent.putIfAbsent(u, u)
        parent.putIfAbsent(v, v)
        val ru = find(u); val rv = find(v)
        if (ru != rv) { if (ru < rv) parent.put(rv, ru) else parent.put(ru, rv) }
      }
      // materialize keys first: find() mutates values mid-iteration
      parent.keysArray.iterator.map(x => (x, find(x)))
    }.toDF("id", "rep")
  }

  /** Minimal open-addressing long→long hash map (linear probing,
    * power-of-two capacity, ≤50% load). Long.MinValue is the empty-slot
    * sentinel; the one key equal to the sentinel is carried in a
    * dedicated side slot so arbitrary 64-bit ids remain valid.
    * Serializable: constructed inside the task closure.
    */
  private[graft] final class LongLongMap(initialCapacity: Int) extends Serializable {
    private var hasMin = false
    private var minVal = 0L
    private var cap = Integer.highestOneBit(math.max(initialCapacity, 16) * 2 - 1)
    private var mask = cap - 1
    private var keys = Array.fill[Long](cap)(Long.MinValue)
    private var vals = new Array[Long](cap)
    private var n = 0

    private def slot(k: Long): Int = {
      // finalizer-style mix so sequential ids spread across slots
      var h = k * -7046029254386353131L
      h ^= h >>> 32
      var i = h.toInt & mask
      while (keys(i) != Long.MinValue && keys(i) != k) i = (i + 1) & mask
      i
    }

    def apply(k: Long): Long =
      if (k == Long.MinValue) minVal else vals(slot(k))

    def put(k: Long, v: Long): Unit =
      if (k == Long.MinValue) { hasMin = true; minVal = v }
      else {
        val i = slot(k)
        // write the value BEFORE any growth: growIfNeeded swaps the
        // arrays, so index i is stale afterwards (found by
        // LongLongMapSpec's reference-map property test)
        if (keys(i) == Long.MinValue) { keys(i) = k; vals(i) = v; n += 1; growIfNeeded() }
        else vals(i) = v
      }

    def putIfAbsent(k: Long, v: Long): Unit =
      if (k == Long.MinValue) { if (!hasMin) { hasMin = true; minVal = v } }
      else {
        val i = slot(k)
        if (keys(i) == Long.MinValue) { keys(i) = k; vals(i) = v; n += 1; growIfNeeded() }
      }

    private def growIfNeeded(): Unit = if (n * 2 > cap) {
      val ok = keys; val ov = vals
      cap <<= 1; mask = cap - 1; n = 0
      keys = Array.fill[Long](cap)(Long.MinValue)
      vals = new Array[Long](cap)
      var i = 0
      while (i < ok.length) {
        if (ok(i) != Long.MinValue) { put(ok(i), ov(i)) }
        i += 1
      }
    }

    def keysArray: Array[Long] = {
      val out = new Array[Long](n + (if (hasMin) 1 else 0))
      var i = 0; var j = 0
      while (i < keys.length) {
        if (keys(i) != Long.MinValue) { out(j) = keys(i); j += 1 }
        i += 1
      }
      if (hasMin) out(j) = Long.MinValue
      out
    }
  }
}
