package graft.operators

import org.apache.spark.sql.GraftLineage._
import org.apache.spark.sql.GraftLineage
import graft.graph.{Edge, GraphIO}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Vertex-centrality operators beyond degree and PageRank — the
  * closeness/harmonic/eigenvector family a link-graph engine owes its
  * users (no reference counterpart; the reference is CC-only; semantics
  * are the textbook definitions, e.g. Newman, "Networks", ch. 7).
  *
  * Harmonic and closeness are exact all-pairs quantities (O(V·E) — not
  * computable at link-graph scale); the standard scale substitute, and
  * what these implement, is the SEED-RESTRICTED estimate over a small
  * deterministic source set: distances come from ONE multi-source BFS
  * ([[Traversal.multiSourceHopDistances]]), so k seeds cost one
  * traversal with a k×-wider frontier, not k traversals.
  */
object Centrality {

  /** Iterations composed into one plan between lineage barriers for the
    * PINNED-iteration loops (katz/eigenvector/hits — loops with no
    * data-dependent exit): each barrier job then executes `iterChunk`
    * join+agg stages back-to-back inside Spark's scheduler instead of
    * paying one driver action + one localCheckpoint materialization per
    * iteration (guide §1.2: fix the distributed algorithm's pass count
    * first — measured ~0.4-0.6 s of fixed cost per action on the bench
    * host, and at scale each skipped barrier is one fewer full
    * materialization of the score table). Chunks stay bounded so plan
    * size, size-estimation BigInts and (for the L∞-normalized loops)
    * unnormalized value growth all stay small; the env knob mirrors the
    * other scale-dependent settings. */
  private val iterChunkDefault: Int =
    math.max(1, graft.Env.int("SPARK_GRAFT_ITER_CHUNK", 4))
  /** One-JVM A/B override (graft.tools.ProfileChunk); None = env/default. */
  @volatile var iterChunkOverride: Option[Int] = None
  private[operators] def iterChunk: Int =
    iterChunkOverride.getOrElse(iterChunkDefault)

  /** Seed-restricted harmonic centrality: h(v) = Σ_{s ∈ seeds, s ≠ v,
    * d(s,v) < ∞} 1 / d(s,v), rounded to 6 dp. Unreachable seed pairs
    * contribute 0 (the reason harmonic, not closeness, is the textbook
    * choice on disconnected graphs). Vertices reached by no seed are
    * omitted. Scale: one multi-source BFS + one hash agg keyed by id;
    * the per-term 1/d is exact IEEE on small integer d, and the ≤|seeds|
    * -term sum is order-noisy only below the 6 dp round. */
  def harmonic(edges: Dataset[Edge], seeds: Seq[Long],
               maxHops: Int = 64): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    if (seeds.isEmpty) // empty graph ⇒ empty seed rule ⇒ empty table
      return spark.emptyDataFrame
        .select(lit(0L).as("id"), lit(0.0).as("harmonic")).limit(0)
    val d = Traversal.multiSourceHopDistances(edges, seeds, maxHops)
    val out = d.filter($"dist" > 0)
      .groupBy($"id")
      .agg(round(sum(lit(1.0) / $"dist".cast("double")), 6).as("harmonic"))
    val res = barrier(out)
    GraftLineage.release(d)
    res
  }

  /** Seed-restricted closeness: c(v) = r(v) / Σ d(s,v) over the seeds
    * that reach v (r = how many do), both exact integers — the quotient
    * is a single IEEE division, bit-reproducible across engines with no
    * rounding contract. Standard caveat applies: on disconnected graphs
    * closeness only counts reachable seeds (use [[harmonic]] when that
    * matters). Same one-BFS + one-agg plan as [[harmonic]]. */
  def closeness(edges: Dataset[Edge], seeds: Seq[Long],
                maxHops: Int = 64): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    if (seeds.isEmpty) // empty graph ⇒ empty seed rule ⇒ empty table
      return spark.emptyDataFrame
        .select(lit(0L).as("id"), lit(0.0).as("closeness")).limit(0)
    val d = Traversal.multiSourceHopDistances(edges, seeds, maxHops)
    val out = d.filter($"dist" > 0)
      .groupBy($"id")
      .agg((count(lit(1)).cast("double") /
        sum($"dist").cast("double")).as("closeness"))
    val res = barrier(out)
    GraftLineage.release(d)
    res
  }

  /** Eigenvector centrality by power iteration with L∞ (max)
    * normalization, pinned to `maxIter` iterations: z_t(v) =
    * Σ_{u ~ v} z_{t-1}(u) / m_{t-1}, m_t = max_v z_t(v), output
    * round(z_T / m_T, 6). Max-normalization is the load-bearing choice:
    * max over doubles is ORDER-INDEPENDENT, so the only cross-engine
    * float noise is per-vertex neighbor-sum order (~1e-16/iter, absorbed
    * by the 6 dp round) — an L1/L2 norm would add a global
    * order-dependent reduction per iteration. Division happens per TERM
    * inside the sum (not on the sum) so an unrolled SQL oracle can
    * mirror the arithmetic exactly.
    *
    * Scale: the plan is PageRank's (one join + one partial-agg'd hash
    * agg per iteration, adjacency hash-partitioned by src once, rank
    * side partitioned by id from its own groupBy); m_t is OBSERVED in
    * iteration t's materialization job and enters iteration t+1 as a
    * one-row broadcast, so there is one job per iteration and one
    * compiled plan for all of them. Isolated vertices don't occur in an
    * edge-derived vertex set (every vertex has degree ≥ 1). */
  def eigenvector(edges: Dataset[Edge], maxIter: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    require(maxIter >= 1, "eigenvector: need at least one iteration")
    // Loop-table partition count derived from the OBSERVED adjacency row
    // count (guide §2: scale-adaptive partitioning; see
    // [[graft.plans.Adaptive]]) — at scale this keeps the session
    // setting and adds no extra pass; small graphs re-key once so every
    // iteration's stages carry data-proportional task counts.
    val (adj1, aObs) = barrierObserved(
      GraphIO.bidirectional(GraphIO.canonical(edges))
        .toDF("src", "dst")
        .repartition(spark.sessionState.conf.numShufflePartitions, $"src"),
      count(lit(1)).as("n"))
    val (adj, p) = graft.plans.Adaptive.rekey(adj1,
      Option(aObs("n")).map(_.asInstanceOf[Long]).getOrElse(0L), Seq($"src"))
    var z = barrier(
      adj.select($"src".as("id")).distinct()
        .select($"id", lit(1.0).as("v"))
        .repartition(p, $"id"))
    if (z.isEmpty) { // empty edge set → empty score table, not an NPE
      GraftLineage.release(adj)
      return z.select($"id", $"v".as("score")).limit(0)
    }
    var m = 1.0
    var iter = 0
    // Chunked unrolling: `iterChunk` update stages per barrier job. L∞
    // normalization commutes with the linear update (z/m is a pure
    // rescale), so dividing per term by the PREVIOUS CHUNK's observed max
    // — instead of every iteration's — leaves the final normalized output
    // z_T / max(z_T) mathematically unchanged; within a chunk values grow
    // by at most λ_max^iterChunk, far inside double range. Oracle-gated
    // equality re-verified after this change (the only float drift is the
    // removed per-iteration divisions, ~1e-13 relative, absorbed by the
    // 6 dp output round).
    while (iter < maxIter) {
      val steps = math.min(iterChunk, maxIter - iter)
      var cur: DataFrame = adj.as("e")
        .join(z.as("x"), $"e.src" === $"x.id")
        .crossJoin(broadcast(Seq(m).toDF("m")))
        .groupBy($"e.dst".as("id"))
        .agg(sum($"x.v" / $"m").as("v"))
      var s = 1
      while (s < steps) {
        cur = adj.as("e")
          .join(cur.as("x"), $"e.src" === $"x.id")
          .groupBy($"e.dst".as("id"))
          .agg(sum($"x.v").as("v"))
        s += 1
      }
      val (next, obs) = barrierObserved(cur, max($"v").as("mx"))
      m = obs("mx").asInstanceOf[Double]
      GraftLineage.release(z)
      z = next
      iter += steps
    }
    val out = barrier(
      z.crossJoin(broadcast(Seq(m).toDF("m")))
        .select($"id", round($"v" / $"m", 6).as("score")))
    GraftLineage.release(z); GraftLineage.release(adj)
    out
  }

  /** Seed-restricted betweenness centrality (Brandes '01, restricted to
    * a deterministic source set — the standard scale substitute for the
    * O(V·E) exact quantity, same seed rule as [[harmonic]]):
    * bc(v) = Σ_{s ∈ seeds} δ_s(v) with δ_s from Brandes' backward
    * accumulation δ_s(v) = Σ_{w : succ} σ_s(v)/σ_s(w) · (1 + δ_s(w))
    * over the BFS dag of s, output round(bc, 6), all vertices (0.0 when
    * never interior). Path counts σ stay exact integers; the division
    * happens per TERM (so an unrolled SQL oracle mirrors the arithmetic
    * bit-for-bit) and only the final per-vertex sum rounds.
    *
    * Scale: the forward pass is ONE level-synchronous multi-source BFS
    * (k seeds = one traversal with a k×-wide frontier) that also
    * accumulates σ as a per-level hash agg; the backward pass walks the
    * ≤diameter per-level barriers once, two key-partitioned joins + one
    * hash agg per level. Nothing driver-side; levels are released as
    * consumed. */
  def betweenness(edges: Dataset[Edge], seeds: Seq[Long],
                  maxHops: Int = 32): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    if (seeds.isEmpty) // empty graph ⇒ empty seed rule ⇒ empty table
      return spark.emptyDataFrame
        .select(lit(0L).as("id"), lit(0.0).as("betweenness")).limit(0)
    // adaptive loop partitioning — same rule as [[eigenvector]]; on the
    // sparse fixtures this operator targets, the per-level jobs were
    // dominated by session-partition-count task overhead
    val (adj1, aObs) = barrierObserved(
      GraphIO.bidirectional(GraphIO.canonical(edges))
        .toDF("v", "nbr")
        .repartition(spark.sessionState.conf.numShufflePartitions, $"v"),
      count(lit(1)).as("n"))
    val (adj, p) = graft.plans.Adaptive.rekey(adj1,
      Option(aObs("n")).map(_.asInstanceOf[Long]).getOrElse(0L), Seq($"v"))
    // ---- forward: per-level (source, id, sigma), sigma exact longs ----
    var frontier = barrier(
      spark.createDataset(seeds.distinct).toDF("source")
        .select($"source", $"source".as("id"), lit(1L).as("sigma"))
        .repartition(p, $"source", $"id"))
    var levels = Vector(frontier)
    var visitedParts = List[DataFrame](frontier.select($"source", $"id"))
    var t = 0
    var frontierSize = 1L
    while (frontierSize > 0 && t < maxHops) {
      t += 1
      val visited = visitedParts.reduce(_ union _)
      val (next, m) = barrierObserved(
        frontier.join(adj, $"id" === $"v")
          .select($"source", $"nbr".as("id"), $"sigma")
          .join(visited, Seq("source", "id"), "left_anti")
          .groupBy($"source", $"id")
          .agg(sum($"sigma").as("sigma")),
        count(lit(1)).as("n"))
      frontierSize = Option(m("n")).map(_.asInstanceOf[Long]).getOrElse(0L)
      if (frontierSize > 0) {
        levels :+= next
        visitedParts ::= next.select($"source", $"id")
        frontier = next
        if (t % 8 == 0) {
          // compact the visited union into ONE barrier so the anti-join
          // probe side stays a short union (same rule as the BFS loop)
          val merged = barrier(visitedParts.reduce(_ union _))
          visitedParts = List(merged)
        }
      } else release(next)
    }
    if (frontierSize > 0) { // truncated BFS = silently wrong deltas
      (levels ++ visitedParts).foreach(release(_))
      adj.releaseLineage()
      throw new IllegalStateException(
        s"betweenness: BFS not converged within maxHops=$maxHops")
    }
    // ---- backward: δ per level, deepest first ----
    // Unlike the forward pass (whose per-level job IS the loop-control
    // read of the frontier size), the backward recurrence has a KNOWN
    // level count — so no level needs its own driver action. Each δ_t is
    // a LAZY persist (two consumers: δ_{t-1}'s wSide and the final sum;
    // the cache makes the single final job compute each level once), and
    // the ONE materialization is the output barrier. Round 5 paid one
    // full barrier-job round-trip per level — the measured floor of the
    // 29.7 s driver-bench betweenness on a 924-vertex fixture. The δ_0
    // frame (Brandes' excluded endpoint terms) is never built at all;
    // round 5 materialized it and then discarded it unread. Nested-plan
    // stats stay bounded: ≤ maxHops join products is a short BigInt,
    // nothing like the unbounded iterative-self-join explosion barrier
    // exists to prevent.
    val maxT = levels.size - 1
    var delta = levels(maxT).select($"source", $"id", lit(0.0).as("delta"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var lazyDeltas = List(delta) // δ_maxT .. δ_1; all-zero δ_maxT sums to 0
    var lvl = maxT - 1
    while (lvl >= 1) {
      val wSide = levels(lvl + 1).as("sw")
        .join(delta.as("dw"), Seq("source", "id"))
        .select($"source".as("wsource"), $"id".as("w"),
          $"sw.sigma".as("sigw"), $"dw.delta".as("deltaw"))
      val agg = levels(lvl).as("lv")
        .join(adj, $"lv.id" === $"v")
        .select($"lv.source".as("source"), $"lv.id".as("id"),
          $"lv.sigma".as("sigv"), $"nbr")
        .join(wSide, $"nbr" === $"w" && $"source" === $"wsource")
        .groupBy($"source", $"id")
        .agg(sum($"sigv".cast("double") / $"sigw".cast("double") *
          (lit(1.0) + $"deltaw")).as("c"))
      val deltaT = levels(lvl).select($"source", $"id")
        .join(agg, Seq("source", "id"), "left")
        .select($"source", $"id", coalesce($"c", lit(0.0)).as("delta"))
        .repartition(p, $"source", $"id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      lazyDeltas ::= deltaT
      delta = deltaT
      lvl -= 1
    }
    // bc(v) = Σ over sources and dag levels ≥ 1 (a source's own dist-0
    // row never contributes — Brandes excludes the endpoint s itself)
    val verts = adj.select($"v".as("id")).distinct()
    // release in a finally: if the output barrier throws, the per-level
    // cached δ blocks (and the level/visited barriers) must not leak for
    // the session lifetime (ADVICE r06)
    try {
      barrier(
        if (maxT == 0)
          verts.select($"id", lit(0.0).as("betweenness"))
        else
          verts.join(
              lazyDeltas.reduce(_ union _).groupBy($"id")
                .agg(sum($"delta").as("b")),
              Seq("id"), "left")
            .select($"id", round(coalesce($"b", lit(0.0)), 6).as("betweenness")))
    } finally {
      levels.foreach(release(_))
      lazyDeltas.foreach(_.unpersist())
      visitedParts.foreach(release(_))
      adj.releaseLineage()
    }
  }

  /** Katz centrality (Katz '53), pinned to `maxIter` fixed-point steps:
    * z_0 = 1, z_t(v) = 1 + α · Σ_{u ~ v} z_{t-1}(u), output round(z_T, 6)
    * — the textbook attenuated-paths score (β = 1). No per-iteration
    * normalization is needed: the caller picks α < 1/λ_max (the default
    * 0.05 is safe for the sparse co-occurrence graphs this engine
    * derives; values stay O(1), so the 6 dp round absorbs the only
    * cross-engine float noise, per-vertex neighbor-sum order). α is the
    * SAME literal every iteration, so unlike PageRank's dangling mass it
    * never forces a plan recompile.
    *
    * Scale: identical loop plan to [[eigenvector]] — adjacency
    * hash-partitioned by src once, one co-partitioned join + one
    * partial-agg'd hash agg per iteration, previous state released
    * eagerly. */
  def katz(edges: Dataset[Edge], alpha: Double = 0.05,
           maxIter: Int = 12): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    require(maxIter >= 1, "katz: need at least one iteration")
    require(alpha > 0 && alpha < 1, s"katz: alpha out of (0,1): $alpha")
    // adaptive loop partitioning — same rule as [[eigenvector]]
    val (adj1, aObs) = barrierObserved(
      GraphIO.bidirectional(GraphIO.canonical(edges))
        .toDF("src", "dst")
        .repartition(spark.sessionState.conf.numShufflePartitions, $"src"),
      count(lit(1)).as("n"))
    val (adj, p) = graft.plans.Adaptive.rekey(adj1,
      Option(aObs("n")).map(_.asInstanceOf[Long]).getOrElse(0L), Seq($"src"))
    var z = barrier(
      adj.select($"src".as("id")).distinct()
        .select($"id", lit(1.0).as("v"))
        .repartition(p, $"id"))
    if (z.isEmpty) { // empty edge set → empty score table, not an NPE
      GraftLineage.release(adj)
      return z.select($"id", $"v".as("katz")).limit(0)
    }
    var iter = 0
    // Chunked unrolling (see [[iterChunk]]): the affine update needs no
    // per-iteration scalar, so `steps` join+agg stages compose into ONE
    // barrier job — identical arithmetic per stage, 12 jobs → 2.
    while (iter < maxIter) {
      val steps = math.min(iterChunk, maxIter - iter)
      var cur: DataFrame = z
      var s = 0
      while (s < steps) {
        // every vertex in an edge-derived set has degree ≥ 1, so the
        // inner join reaches all of them — no left-join fallback needed
        cur = adj.as("e")
          .join(cur.as("x"), $"e.src" === $"x.id")
          .groupBy($"e.dst".as("id"))
          .agg((lit(1.0) + lit(alpha) * sum($"x.v")).as("v"))
        s += 1
      }
      val next = barrier(cur)
      GraftLineage.release(z)
      z = next
      iter += steps
    }
    val out = barrier(z.select($"id", round($"v", 6).as("katz")))
    GraftLineage.release(z); GraftLineage.release(adj)
    out
  }

  /** HITS hubs & authorities (Kleinberg '99) over a DIRECTED edge table
    * (src, dst), pinned to `maxIter` alternating updates with the same
    * L∞-per-side normalization trick as [[eigenvector]]:
    * a_t(d) = Σ_{s→d} h_{t-1}(s)/mh_{t-1}, then
    * h_t(s) = Σ_{s→d} a_t(d)/ma_t — division per TERM, max observed in
    * the update's own materialization job, carried into the next update
    * as a one-row broadcast. Output is (id, kind, score) with kind ∈
    * {hub, auth}, each side scaled to max 1 and rounded to 6 dp.
    * Vertices with no out-edges have no hub row (resp. in/auth) — on a
    * bipartite order graph that is exactly the two natural sides.
    *
    * Scale: the edge table is materialized twice, hash-partitioned by
    * src and by dst, so BOTH alternating joins are co-partitioned with
    * the score table the previous aggregation produced — two
    * shuffle-free joins + two partial-agg'd hash aggs per iteration,
    * one job per update, one compiled plan for all iterations. */
  def hits(directed: DataFrame, maxIter: Int = 12): DataFrame = {
    val spark = directed.sparkSession
    import spark.implicits._
    require(maxIter >= 1, "hits: need at least one iteration")
    // One materialization of the deduplicated edge table (the old code
    // evaluated the upstream distinct TWICE — once per keyed copy), with
    // the row count observed for adaptive loop partitioning; the two
    // keyed copies are then cheap re-shuffles of the barrier.
    val (dedup0, dObs) = barrierObserved(
      directed.select($"src", $"dst").distinct(), count(lit(1)).as("n"))
    val p = graft.plans.Adaptive.forRows(spark,
      Option(dObs("n")).map(_.asInstanceOf[Long]).getOrElse(0L))
    val eBySrc = barrier(dedup0.repartition(p, $"src"))
    val eByDst = barrier(dedup0.repartition(p, $"dst"))
    GraftLineage.release(dedup0)
    var hub = barrier(
      eBySrc.select($"src".as("id")).distinct()
        .select($"id", lit(1.0).as("v"))
        .repartition(p, $"id"))
    if (hub.isEmpty) { // empty edge set → empty score table
      GraftLineage.release(eBySrc); GraftLineage.release(eByDst)
      return hub.select($"id", lit("hub").as("kind"), $"v".as("score")).limit(0)
    }
    var mh = 1.0
    var iter = 0
    // Chunked unrolling (see [[iterChunk]]): the alternating updates are
    // linear, so the per-side L∞ normalizations are pure rescales that
    // commute with them — dividing the chunk's FIRST auth update per term
    // by the previous chunk's observed hub max (instead of normalizing
    // every half-step) leaves the final per-side normalized outputs
    // mathematically unchanged, and values grow by at most
    // (λ_max²)^iterChunk within a chunk, far inside double range.
    // Iterations 1..maxIter-1 run `steps` full (auth, hub) updates per
    // barrier job; the LAST iteration materializes auth and hub
    // separately because both are outputs. Unlike katz/eigenvector,
    // chunking PAST one full iteration measured slower here (ProfileChunk
    // one-JVM A/B: 9.0 s at 1 vs 10.6 s at 4 — the two-agg update chain
    // replans worse under AQE), so the chunk is the fused (auth, hub)
    // pair: 2 jobs/iteration → 1.
    val hitsChunk = 1
    while (iter < maxIter - 1) {
      val steps = math.min(hitsChunk, maxIter - 1 - iter)
      var curH: DataFrame = null
      var s = 0
      while (s < steps) {
        val aPlan =
          if (s == 0)
            eBySrc.as("e")
              .join(hub.as("h"), $"e.src" === $"h.id")
              .crossJoin(broadcast(Seq(mh).toDF("m")))
              .groupBy($"e.dst".as("id"))
              .agg(sum($"h.v" / $"m").as("v"))
          else
            eBySrc.as("e")
              .join(curH.as("h"), $"e.src" === $"h.id")
              .groupBy($"e.dst".as("id"))
              .agg(sum($"h.v").as("v"))
        curH = eByDst.as("e")
          .join(aPlan.as("a"), $"e.dst" === $"a.id")
          .groupBy($"e.src".as("id"))
          .agg(sum($"a.v").as("v"))
        s += 1
      }
      val (h2, obsH) = barrierObserved(curH, max($"v").as("mx"))
      GraftLineage.release(hub)
      hub = h2
      mh = obsH("mx").asInstanceOf[Double]
      iter += steps
    }
    val (auth, obsA) = barrierObserved(
      eBySrc.as("e")
        .join(hub.as("h"), $"e.src" === $"h.id")
        .crossJoin(broadcast(Seq(mh).toDF("m")))
        .groupBy($"e.dst".as("id"))
        .agg(sum($"h.v" / $"m").as("v")),
      max($"v").as("mx"))
    val ma = obsA("mx").asInstanceOf[Double]
    val (hubT, obsH) = barrierObserved(
      eByDst.as("e")
        .join(auth.as("a"), $"e.dst" === $"a.id")
        .groupBy($"e.src".as("id"))
        .agg(sum($"a.v").as("v")),
      max($"v").as("mx"))
    GraftLineage.release(hub)
    val mhT = obsH("mx").asInstanceOf[Double]
    val out = barrier(
      hubT.crossJoin(broadcast(Seq(mhT).toDF("m")))
        .select($"id", lit("hub").as("kind"), round($"v" / $"m", 6).as("score"))
        .union(auth.crossJoin(broadcast(Seq(ma).toDF("m")))
          .select($"id", lit("auth").as("kind"), round($"v" / $"m", 6).as("score"))))
    GraftLineage.release(hubT); GraftLineage.release(auth)
    GraftLineage.release(eBySrc); GraftLineage.release(eByDst)
    out
  }
}
