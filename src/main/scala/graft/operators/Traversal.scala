package graft.operators

import org.apache.spark.sql.GraftLineage._
import graft.graph.{Edge, GraphIO}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Frontier-based graph traversal (Pregel-style BFS) — the unweighted
  * shortest-path operator a link-graph engine owes its users alongside
  * CC/PageRank/LPA/triangles. No reference counterpart (the reference is
  * CC-only); semantics are the textbook level-synchronous BFS.
  *
  * Scale design: one shuffle equi-join per hop (frontier ⋈ adjacency),
  * a left-anti join against the visited set to keep the frontier
  * minimal, and a lineage barrier per hop (same iterative-join rules as
  * the CC loop: without the barrier the plan and its statistics double
  * every hop). The visited set accumulates as a union of per-hop
  * barriers and is compacted into one barrier every `compactEvery` hops
  * so the anti-join probe side stays a short union. Frontier and
  * adjacency joins are both key-partitioned — no broadcast inside the
  * loop (pins blocks until convergence), no driver-side state.
  */
object Traversal {

  /** Hop distance from `source` to every reachable vertex (undirected),
    * as (id, dist). `maxHops` bounds the loop (diameter guard); vertices
    * beyond it are omitted, like unreachable ones. */
  def hopDistances(edges: Dataset[Edge], source: Long,
                   maxHops: Int = 64, compactEvery: Int = 8): DataFrame =
    multiSourceHopDistances(edges, Seq(source), maxHops, compactEvery)
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("dist"))

  /** Hop distances from EVERY vertex of `sources` simultaneously, as
    * (source, id, dist) — the level-synchronous multi-source BFS that
    * backs sampled centralities ([[Centrality.harmonic]]/[[Centrality.closeness]]).
    * One shuffle join per hop regardless of |sources|: the frontier
    * carries a source column, so k sources cost one traversal whose
    * frontier is at most k× wider — not k traversals. The visited set is
    * keyed by (source, id); everything else follows the single-source
    * plan (per-hop lineage barriers, periodic visited-set compaction,
    * no broadcast or driver state in the loop). */
  def multiSourceHopDistances(edges: Dataset[Edge], sources: Seq[Long],
                              maxHops: Int = 64, compactEvery: Int = 8): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    require(sources.nonEmpty, "multiSourceHopDistances: empty source set")
    scopedBlocks(spark) {
      // Small graphs: key the adjacency by the join side (v) ONCE at the
      // adaptive partition count (graft.plans.Adaptive) so every hop's
      // join and barrier run data-proportional task counts — on the
      // sparse betweenness-class fixtures this removed the per-level
      // session-partition task overhead. Large graphs keep the original
      // shape (unkeyed barrier; AQE coalesces the per-hop shuffles),
      // because pinning the adjacency at the session count would force
      // every hop's frontier exchange to that width.
      val (adj1, aObs) = barrierObserved(
        GraphIO.bidirectional(GraphIO.canonical(edges)).toDF("v", "nbr"),
        count(lit(1)).as("n"))
      val aRows = Option(aObs("n")).map(_.asInstanceOf[Long]).getOrElse(0L)
      val pA = graft.plans.Adaptive.forRows(spark, aRows)
      val adj =
        if (pA * 4 <= spark.sessionState.conf.numShufflePartitions) {
          val keyed = barrier(adj1.repartition(pA, $"v"))
          release(adj1)
          keyed
        } else adj1
      var frontier = spark.createDataset(sources.distinct).toDF("source")
        .select($"source", $"source".as("id"), lit(0L).as("dist"))
      var visitedParts = List[DataFrame](frontier)
      var hop = 0
      var frontierSize = 1L
      while (frontierSize > 0 && hop < maxHops) {
        hop += 1
        val visited = visitedParts.reduce(_ union _)
        val (next, m) = barrierObserved(
          frontier.join(adj, $"id" === $"v")
            .select($"source", $"nbr".as("id"), lit(hop.toLong).as("dist"))
            .distinct()
            .join(visited.select($"source", $"id"), Seq("source", "id"), "left_anti"),
          count(lit(1)).as("n"))
        frontierSize = Option(m("n")).map(_.asInstanceOf[Long]).getOrElse(0L)
        frontier = next
        visitedParts ::= next
        if (hop % compactEvery == 0) {
          // compact the visited union into ONE barrier (it contains the
          // live frontier's rows too, but `next` itself stays untouched
          // and remains the frontier); free the superseded hop barriers
          val merged = barrier(visitedParts.reduce(_ union _))
          visitedParts.foreach(d => if (!(d eq next)) release(d))
          visitedParts = List(merged)
        }
      }
      val out = barrier(visitedParts.reduce(_ union _))
      adj.releaseLineage()
      out
    }
  }

  /** DeepWalk-style walk corpus: `nWalks` walks of `steps` steps from
    * EVERY vertex, as (seed, walk, step, vertex) — the sentence
    * generator for skip-gram graph embeddings (Perozzi et al., KDD'14).
    * The step rule is deterministic pseudo-random: from vertex v the
    * walk moves to the neighbor u minimizing
    * `((u % P)·A + (v % P)·B + walk·C + step·D) % P` (P prime, ids
    * reduced mod P first so the arithmetic never overflows ANSI longs
    * at any vertex-id scale, ties to the smaller u) — replayable
    * epoch-to-epoch, diversified across walks/steps by the hash, and
    * expressible in plain SQL, so the whole corpus is oracle-checkable.
    * Undirected graphs have no dead ends (the walk arrived over an
    * incident edge), so every walk has exactly `steps`+1 rows.
    *
    * Scale: one equi-join (state ⋈ adjacency, both key-partitioned) +
    * one min-by hash agg per step — state is |V|·nWalks rows regardless
    * of step count; per-step lineage barriers, superseded state
    * released eagerly; the output is the union of per-step barriers. */
  def deterministicWalks(edges: Dataset[Edge], nWalks: Int = 2,
                         steps: Int = 8): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    require(nWalks >= 1 && steps >= 0, "deterministicWalks: bad shape")
    val (pP, a, b, c, d0) = (1000003L, 48271L, 16807L, 69621L, 40503L)
    scopedBlocks(spark) {
      // adaptive loop partitioning — same rule as multiSourceHopDistances
      val (adj1, aObs) = barrierObserved(
        GraphIO.bidirectional(GraphIO.canonical(edges))
          .toDF("v", "nbr")
          .repartition(spark.sessionState.conf.numShufflePartitions, $"v"),
        count(lit(1)).as("n"))
      val (adj, p) = graft.plans.Adaptive.rekey(adj1,
        Option(aObs("n")).map(_.asInstanceOf[Long]).getOrElse(0L), Seq($"v"))
      var state = barrier(
        adj.select($"v".as("seed")).distinct()
          .crossJoin(spark.createDataset(0L until nWalks.toLong).toDF("walk"))
          .select($"seed", $"walk", $"seed".as("vertex"), lit(0L).as("step"))
          .repartition(p, $"seed", $"walk"))
      var parts = List[DataFrame](state)
      var t = 0
      // Chunked unrolling (guide §1.2; the Centrality.iterChunk rule):
      // `chunk` walk steps compose into ONE barrier job holding the
      // UNION of the chunk's per-step rows — the continuing state is the
      // last step's slice (a filter of the barrier, no recompute). Each
      // step's subtree feeds both the next step and the union, but the
      // steps end in an aggregation exchange, so ReuseExchange dedups
      // the double-consumed shuffle.
      val chunk = math.max(1, graft.Env.int("SPARK_GRAFT_ITER_CHUNK", 4))
      while (t < steps) {
        val nSteps = math.min(chunk, steps - t)
        var cur: DataFrame = state
        var stepOut: DataFrame = null
        var s = 0
        while (s < nSteps) {
          val ti = t + s + 1
          cur = cur.join(adj, $"vertex" === $"v")
            .select($"seed", $"walk",
              struct(
                pmod(($"nbr" % pP) * a + ($"vertex" % pP) * b +
                  $"walk" * c + lit(ti.toLong) * d0, lit(pP)).as("score"),
                $"nbr".as("vertex")).as("sv"))
            .groupBy($"seed", $"walk")
            .agg(min($"sv").as("m"))
            .select($"seed", $"walk", $"m.vertex".as("vertex"),
              lit(ti.toLong).as("step"))
          stepOut = if (stepOut == null) cur else stepOut.union(cur)
          s += 1
        }
        t += nSteps
        val next = barrier(stepOut)
        state = next.filter($"step" === t)
        parts ::= next
      }
      val out = barrier(parts.reverse.reduce(_ union _)
        .select($"seed", $"walk", $"step", $"vertex"))
      parts.foreach(release(_))
      adj.releaseLineage()
      out
    }
  }

  /** Vertices of the k-core: the maximal subgraph in which every vertex
    * has degree ≥ k, by iterative peeling — recompute degrees, drop
    * vertices under k, drop their edges, repeat to fixpoint. One degree
    * aggregation + two semi-joins per iteration, fixpoint detected from
    * the edge count observed inside the same materialization job. The
    * iteration count is data-dependent (≤ peel depth, NOT diameter);
    * each round is a full parallel pass, nothing driver-side. */
  def kCoreVertices(edges: Dataset[Edge], k: Int, maxIter: Int = 100): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    scopedBlocks(spark) {
      var e = GraphIO.canonical(edges).toDF().cutLineage()
      var m = e.count()
      var changed = m > 0
      var iter = 0
      while (changed && iter < maxIter) {
        iter += 1
        val keep = e.select(explode(array($"src", $"dst")).as("id"))
          .groupBy($"id").agg(count(lit(1)).as("dg"))
          .filter($"dg" >= k).select($"id")
        val (next, obs) = barrierObserved(
          e.join(keep.as("ks"), $"src" === $"ks.id", "left_semi")
            .join(keep.as("kd"), $"dst" === $"kd.id", "left_semi"),
          count(lit(1)).as("n"))
        val m2 = Option(obs("n")).map(_.asInstanceOf[Long]).getOrElse(0L)
        release(e)
        e = next
        changed = m2 != m
        m = m2
      }
      require(!changed, s"k-core did not converge in $maxIter iterations")
      barrier(GraphIO.vertices(e.as[Edge]).toDF("id"))
    }
  }

  /** Skip-gram (center, context) pair counts from the deterministic walk
    * corpus — the table a DeepWalk/node2vec pipeline actually feeds to
    * word2vec training (Perozzi et al., KDD'14 §4.2): for every walk,
    * all vertex pairs within `window` steps of each other (both
    * directions), self-pairs dropped, aggregated to pair multiplicities.
    *
    * Scale: the walk table is materialized ONCE (inside
    * [[deterministicWalks]]) and self-joined on its (seed, walk) key —
    * each walk contributes ≤ 2·window·(steps+1) pairs, and the count
    * agg is map-side combinable. */
  def walkSkipGramPairs(edges: Dataset[Edge], nWalks: Int = 2,
                        steps: Int = 8, window: Int = 2): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    require(window >= 1, "walkSkipGramPairs: window >= 1")
    val walks = deterministicWalks(edges, nWalks, steps)
    val a = walks.select($"seed", $"walk", $"step".as("si"), $"vertex".as("center"))
    val b = walks.select($"seed", $"walk", $"step".as("sj"), $"vertex".as("context"))
    val out = a.join(b, Seq("seed", "walk"))
      .filter(abs($"si" - $"sj").between(1, window) && $"center" =!= $"context")
      .groupBy($"center", $"context")
      .agg(count(lit(1)).as("n"))
    val res = barrier(out)
    release(walks)
    res
  }

  /** Full core decomposition by h-index iteration (Lü, Zhou, Zhang,
    * Stanley, "The H-index of a network node", Nature Comm. 2016):
    * c⁰(v) = deg(v); cᵗ⁺¹(v) = H({cᵗ(u) : u ∈ N(v)}), where H is the
    * h-index of the neighbor multiset. The sequence is pointwise
    * non-increasing and converges to the coreness (max k such that v is
    * in the k-core) — the fully-distributed alternative to sequential
    * peeling, which is why it is the 100 TB-shape choice here.
    *
    * Per iteration: one key-partitioned join (adjacency ⋈ state) + a
    * map-side-combinable (v, value) histogram + a per-vertex running
    * sum over DISTINCT values only. The h-index is
    * max over present values c of min(c, #{neighbors with value ≥ c}) —
    * computing it over the value histogram instead of raw neighbor rows
    * keeps hub tasks bounded by their distinct-value count, not their
    * degree (the skew-safe form). Convergence is observed from Σc in
    * the round's own materialization job (values only decrease, so an
    * unchanged sum ⟺ fixpoint) — no extra comparison join. */
  def coreness(edges: Dataset[Edge], maxIter: Int = 64): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    scopedBlocks(spark) {
      val e = GraphIO.canonical(edges).toDF()
      // hash-partition the adjacency by the JOIN key (dst) once — the
      // per-iteration state join then reuses this partitioning (zero
      // exchanges on the edge side; the barrier claims the partitioning,
      // same rule as the PageRank/LPA iteration cores). Partition count
      // adaptive from the observed row count (graft.plans.Adaptive).
      val (bidir1, bObs) = barrierObserved(
        e.select($"src", $"dst").union(e.select($"dst".as("src"), $"src".as("dst")))
          .repartition(spark.sessionState.conf.numShufflePartitions, $"dst"),
        count(lit(1)).as("n"))
      val (bidir, _) = graft.plans.Adaptive.rekey(bidir1,
        Option(bObs("n")).map(_.asInstanceOf[Long]).getOrElse(0L), Seq($"dst"))
      val sumMetric = sum($"c").as("csum")
      val (deg, obs0) = barrierObserved(
        bidir.groupBy($"src".as("id")).agg(count(lit(1)).as("c")), sumMetric)
      var state = deg
      var prevSum = Option(obs0("csum")).map(_.asInstanceOf[Long]).getOrElse(0L)
      var changed = prevSum > 0
      var iter = 0
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"v").orderBy($"c".desc)
      while (changed && iter < maxIter) {
        iter += 1
        val hist = bidir
          .join(state.select($"id".as("dst"), $"c"), Seq("dst"))
          .groupBy($"src".as("v"), $"c").agg(count(lit(1)).as("n"))
        val (next, obs) = barrierObserved(
          hist.withColumn("cum", sum($"n").over(w))
            .groupBy($"v".as("id"))
            .agg(max(least($"c", $"cum")).as("c")),
          sumMetric)
        val s2 = Option(obs("csum")).map(_.asInstanceOf[Long]).getOrElse(0L)
        release(state)
        state = next
        changed = s2 != prevSum
        prevSum = s2
      }
      require(!changed, s"coreness did not converge in $maxIter iterations")
      state.select($"id", $"c".cast("long").as("coreness"))
    }
  }

  /** Multi-source WEIGHTED shortest-path distances (level-synchronous
    * Bellman–Ford — the textbook distributed choice for nonnegative
    * integer weights without a priority queue), as (source, id, dist)
    * over the undirected weighted edge table (src, dst, weight). All
    * arithmetic is exact longs, so the oracle gate is hash-exact. The
    * fixpoint is detected WITHOUT an extra join: distances only ever
    * decrease and rows only ever appear, so an unchanged
    * (row count, Σdist) pair observed in the round's own
    * materialization job ⟺ no relaxation fired.
    *
    * Scale: one key-partitioned join (state ⋈ adjacency) + one
    * map-side-combined min agg per round; state is |seeds|·|reached|
    * rows; superseded state released eagerly. Rounds ≤ the longest
    * hop-count of any optimal path (≪ V in real link graphs). */
  def weightedDistances(wedges: DataFrame, seeds: Seq[Long],
                        maxIter: Int = 64,
                        checkpointDir: Option[String] = None,
                        checkpointEvery: Int = 5,
                        runId: String = "sssp"): DataFrame = {
    val spark = wedges.sparkSession
    import spark.implicits._
    if (seeds.isEmpty) // empty seed rule ⇒ empty table
      return spark.emptyDataFrame
        .select(lit(0L).as("source"), lit(0L).as("id"), lit(0L).as("dist"))
        .limit(0)
    // weights must be nonnegative (no up-front scan — a negative cycle
    // cannot reach the (count, Σ) fixpoint, so the maxIter guard fires)
    val dir = wedges.select($"src".cast("long"), $"dst".cast("long"),
      $"weight".cast("long"))
    // adaptive loop partitioning (guide §2; graft.plans.Adaptive)
    val (adj1, aObs) = barrierObserved(
      dir.union(dir.select($"dst".as("src"), $"src".as("dst"), $"weight"))
        .repartition(spark.sessionState.conf.numShufflePartitions, $"src"),
      count(lit(1)).as("n"))
    val (adj, p) = graft.plans.Adaptive.rekey(adj1,
      Option(aObs("n")).map(_.asInstanceOf[Long]).getOrElse(0L), Seq($"src"))
    val state0 = barrier(
      spark.createDataset(seeds.distinct).toDF("source")
        .select($"source", $"source".as("id"), lit(0L).as("dist"))
        .repartition(p, $"source", $"id"))
    ssspLoop(spark, adj, state0, rows0 = -1L, total0 = -1L, startIter = 0,
      maxIter, checkpointDir.map(new graft.plans.CheckpointManager(spark, _)),
      checkpointEvery, adjStep0 = None, runId)
  }

  /** Continue a [[weightedDistances]] run from durable state written via
    * its `checkpointDir` (same contract as the CC/PageRank/LPA resumes:
    * `maxIter` counts TOTAL rounds across both runs). The state is all
    * longs, so the resumed trajectory is EXACTLY the uninterrupted one. */
  def resumeWeightedDistances(spark: org.apache.spark.sql.SparkSession,
                              checkpointDir: String,
                              maxIter: Int = 64,
                              checkpointEvery: Int = 5,
                              runId: String = "sssp-resume"): DataFrame = {
    import spark.implicits._
    val ck = new graft.plans.CheckpointManager(spark, checkpointDir)
    val step = ck.latestStep().getOrElse(
      throw new IllegalStateException(s"no checkpoint under $checkpointDir"))
    val meta = ck.meta(step)
    val algo = meta.getOrElse("algo", "")
    if (algo != "sssp")
      throw new IllegalStateException(
        s"not an sssp checkpoint under $checkpointDir (algo='$algo')")
    val p = spark.sessionState.conf.numShufflePartitions
    val adjStep = meta("adjStep").toInt
    val adj = ck.load(adjStep, "adj").repartition(p, $"src").cutLineage()
    val state = barrier(
      ck.load(step, "state").repartition(p, $"source", $"id"))
    ssspLoop(spark, adj, state, meta("rows").toLong, meta("total").toLong,
      meta("iter").toInt, maxIter, Some(ck), checkpointEvery, Some(adjStep),
      runId)
  }

  private def ssspLoop(spark: org.apache.spark.sql.SparkSession,
                       adj: DataFrame, state0: DataFrame,
                       rows0: Long, total0: Long, startIter: Int,
                       maxIter: Int,
                       ck: Option[graft.plans.CheckpointManager],
                       checkpointEvery: Int,
                       adjStep0: Option[Int],
                       runId: String): DataFrame = {
    import spark.implicits._
    var state = state0
    var (rows, total) = (rows0, total0)
    var adjStep = adjStep0
    var converged = false
    var it = startIter
    // Chunked relaxation (guide §1.2): `chunk` Bellman–Ford rounds
    // compose into one barrier job. Valid because the state is MONOTONE
    // (rows only appear, per-pair dists only decrease): an unchanged
    // (count, Σdist) pair across a CHUNK boundary still ⟺ no relaxation
    // fired anywhere in the chunk, and extra rounds past the fixpoint
    // are no-ops. Chunking is skipped on checkpointed runs (resume
    // wants per-round state). Each intermediate round's subtree is
    // consumed twice (union + join) but ends in an aggregation
    // exchange, so ReuseExchange dedups the double-read shuffle.
    // chunk = 2, not the katz/eigen 4: the round count is DATA-DEPENDENT
    // here and fixpoint detection lags a chunk — on fast-converging
    // graphs (dense co-occurrence: 2-3 rounds) a 4-chunk runs nearly 2×
    // the needed rounds (measured slower than per-round barriers), while
    // 2 still halves the job count on deep graphs.
    val chunk =
      if (ck.isDefined) 1
      else math.max(1, graft.Env.int("SPARK_GRAFT_SSSP_CHUNK", 2))
    while (!converged && it < maxIter) {
      val t0 = System.nanoTime()
      val rounds = math.min(chunk, maxIter - it)
      it += rounds
      var cur: DataFrame = state
      var r = 0
      while (r < rounds) {
        cur = cur
          .union(cur.join(adj, $"id" === $"src")
            .select($"source", $"dst".as("id"), ($"dist" + $"weight").as("dist")))
          .groupBy($"source", $"id")
          .agg(min($"dist").as("dist"))
        r += 1
      }
      val (next, m) = barrierObserved(cur,
        count(lit(1)).as("n"), sum($"dist").as("s"))
      val n = m("n").asInstanceOf[Long]
      val s = Option(m("s")).map(_.asInstanceOf[Long]).getOrElse(0L)
      release(state)
      state = next
      converged = n == rows && s == total
      rows = n; total = s
      ck.foreach { c =>
        c.appendMetrics(Seq(graft.graph.SuperstepMetrics(runId, "sssp", it,
          rows, 0L, -1L, 0, (System.nanoTime() - t0) / 1000000)))
        if (it % checkpointEvery == 0 && !converged && it < maxIter) {
          // static weighted adjacency written once, at the first snapshot
          val tables = Map("state" -> state) ++
            (if (adjStep.isEmpty) Map("adj" -> adj) else Map.empty)
          if (adjStep.isEmpty) adjStep = Some(it)
          c.save(it, tables, Map(
            "algo" -> "sssp", "iter" -> it.toString,
            "rows" -> rows.toString, "total" -> total.toString,
            "adjStep" -> adjStep.get.toString))
        }
      }
    }
    if (!converged) { // release before throwing — a failed query must
      release(state) //  not pin checkpoint blocks for the rest of the JVM
      adj.releaseLineage()
      throw new IllegalStateException(
        s"weightedDistances: no fixpoint in $maxIter rounds " +
          "(negative weights, or raise maxIter)")
    }
    adj.releaseLineage()
    state
  }

  /** Seed-restricted distance statistics over seeds × reachable vertices
    * (dist > 0 pairs), one row: `pairs` (reached pairs), `diameter`
    * (max observed distance — the standard sampled-BFS diameter lower
    * bound), and `eff_d90` (exact integer 90th-percentile effective
    * diameter: smallest d with ≥90% of pairs at distance ≤ d; the
    * percentile compare stays in integers, cum·10 ≥ pairs·9, so the
    * gate is hash-exact — no float quantile interpolation to disagree
    * on across engines). Scale: one multi-source BFS + a hash agg to a
    * ≤`maxHops`-row histogram; the single-partition window over that
    * histogram is bounded by construction. */
  def distanceStats(edges: Dataset[Edge], seeds: Seq[Long],
                    maxHops: Int = 64): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    if (seeds.isEmpty) // empty graph ⇒ empty seed rule ⇒ empty table
      return spark.emptyDataFrame
        .select(lit(0L).as("pairs"), lit(0L).as("diameter"),
          lit(0L).as("eff_d90")).limit(0)
    val d = multiSourceHopDistances(edges, seeds, maxHops)
    val byd = barrier(
      d.filter($"dist" > 0).groupBy($"dist").agg(count(lit(1)).as("n")))
    release(d)
    val w = Window.orderBy($"dist")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = barrier(
      byd.withColumn("cum", sum($"n").over(w))
        .crossJoin(broadcast(byd.agg(sum($"n").as("t"))))
        .agg(coalesce(max($"t"), lit(0L)).as("pairs"),
          coalesce(max($"dist"), lit(0L)).as("diameter"),
          coalesce(min(when($"cum" * 10 >= $"t" * 9, $"dist")), lit(0L))
            .as("eff_d90")))
    release(byd)
    out
  }
}
